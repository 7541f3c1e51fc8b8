"""Argmax-with-ties — the tie-preserving "top by measure" operator.

Reference semantics: queries (a) and (c) select rows whose measure
equals the global maximum via a scalar subquery
(``/root/reference/sql/blog_post_queries.sql:9-17`` and ``:35-38``) —
ALL tied rows are returned, never ``LIMIT 1`` (SURVEY.md §2.4 Q2/Q3,
Q9/Q10).

Spark-first implementation: an empty-partition window with ``max(...)``
keeps the plan a single pass (no self-join, no scalar-subquery
materialization), then a filter selects the ties. At scale the window
over an empty ``partitionBy`` would funnel everything to one partition
— so for the global case we instead compute the 1-row global max and
let Catalyst broadcast it (a BroadcastNestedLoopJoin over a 1-row build
side is effectively free); for the per-group case the window partitions
by the group key and parallelizes naturally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["argmax_with_ties"]


def argmax_with_ties(
    df: DataFrame,
    measure: Column | str,
    group_by: Sequence[Column | str] = (),
) -> DataFrame:
    """Rows where ``measure`` equals its maximum (global or per group).

    Ties preserved — faithful to the reference's HAVING-=-scalar-max
    shape. Returns the input columns unchanged.
    """
    measure_col = F.col(measure) if isinstance(measure, str) else measure
    if group_by:
        w = Window.partitionBy(*group_by)
        return (
            df.withColumn("__max", F.max(measure_col).over(w))
            .filter(measure_col == F.col("__max"))
            .drop("__max")
        )
    # Global case: 1-row aggregate, broadcast-joined back (scales better
    # than an all-to-one window at 100 TB).
    global_max = df.agg(F.max(measure_col).alias("__max"))
    return (
        df.join(F.broadcast(global_max))
        .filter(measure_col == F.col("__max"))
        .drop("__max")
    )
