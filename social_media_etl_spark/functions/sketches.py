"""Sketch aggregates for approximate analytics at 100 TB scale.

Exact distinct counts shuffle every distinct value; sketches shuffle a
fixed-size binary per group and merge associatively — the only
workable plan when key cardinality approaches row count. Spark ships
two relevant families as NATIVE aggregates (no UDAF needed):

- HyperLogLog++: ``approx_count_distinct`` (in-plan estimate)
- Apache DataSketches HLL: ``hll_sketch_agg`` / ``hll_union_agg`` /
  ``hll_sketch_estimate`` — these expose the SKETCH ITSELF, so
  per-partition sketches can be stored and re-merged across days /
  tables without rescanning (the warehouse rollup pattern).

KLL/quantile needs: ``approx_percentile`` (native). All of these are
estimates — they get rows-only driver checks, with error-bound
assertions against exact counts in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_sketch",
    "hll_estimate",
    "hll_merge",
    "distinct_sketch_rollup",
    "approx_quantiles",
]


def hll_sketch(col: Column | str, lg_k: int = 12) -> Column:
    """Aggregate: DataSketches HLL sketch of distinct values (binary,
    mergeable, ~2^lg_k bytes regardless of cardinality)."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_estimate(sketch: Column | str) -> Column:
    return F.hll_sketch_estimate(sketch)


def hll_merge(sketch: Column | str, allow_different_lg_k: bool = False) -> Column:
    """Aggregate: union previously materialized sketches (re-aggregation
    without the raw data)."""
    return F.hll_union_agg(sketch, F.lit(allow_different_lg_k))


def distinct_sketch_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rollup_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """The two-level sketch pattern: sketch distinct ``value_col`` per
    (group, rollup) cell, then MERGE sketches up to the group level —
    the second level never touches raw data. Returns per-group
    estimated distinct + the number of merged cells.

    This is how daily-partition sketches roll up to monthly/all-time
    distinct counts in a real warehouse."""
    cells = df.groupBy(*group_cols, rollup_col).agg(
        hll_sketch(value_col, lg_k).alias("sketch")
    )
    return (
        cells.groupBy(*group_cols)
        .agg(
            hll_merge("sketch").alias("merged"),
            F.count(F.lit(1)).alias("n_cells"),
        )
        .select(
            *group_cols,
            hll_estimate("merged").alias("approx_distinct"),
            "n_cells",
        )
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate percentiles as a 1-row frame (native
    ``approx_percentile`` — mergeable quantile sketch under the hood)."""
    return df.agg(
        *[
            F.percentile_approx(col, p, accuracy).alias(f"p{int(p * 100)}")
            for p in probabilities
        ]
    )
