"""Temporal join operators Spark lacks natively: as-of join and
range/interval join (SURVEY.md §2.6 "joins other than right-outer
equi" row; north-star custom-operator surface).

As-of join — the scalable formulation is NOT a per-row lookup but the
**union + ordered window** pattern: tag both inputs, union them,
sort within each key by (time, tag), and carry the right side's values
forward with ``last(..., ignorenulls)``. One shuffle on the key, one
sort — linear; no per-key explosion, no correlated subquery. This is
the same plan shape ``merge_asof`` engines lower to, expressed in
pure DataFrame ops (windows), so Catalyst/Tungsten run it codegen'd.

Range join — a plain non-equi join; with an equality key alongside the
range predicate Spark executes hash/SMJ on the key and filters the
range; without one the small side must broadcast (bands, calendars —
dimension-sized by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    direction: str = "backward",
    strict: bool = False,
    dedup_right: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` per key (``backward``; ``forward`` =
    smallest ≥). Unmatched left rows keep NULLs (left-join semantics).

    ``strict`` excludes equal timestamps (< instead of ≤).
    ``dedup_right`` keeps one right row per (key, ts) — the one with
    the greatest first value column — making results deterministic
    under timestamp ties (required for engine-vs-oracle comparison).
    Output: every left column, plus ``{prefix}{right_ts}`` and
    ``{prefix}{v}`` for each value column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = list(on)
    vals = list(right_values)

    r = right.select(
        *keys, F.col(right_ts).alias("__ts"), *[F.col(v) for v in vals]
    )
    if dedup_right:
        if vals:
            wded = Window.partitionBy(*keys, "__ts").orderBy(F.desc(vals[0]))
            r = (
                r.withColumn("__rn", F.row_number().over(wded))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            # no value columns → same-(key, ts) right rows are
            # indistinguishable; plain distinct dedups without the
            # vals[0] ordering (r8 review: IndexError before)
            r = r.distinct()
    # tag order decides inclusivity at equal ts: right-before-left (0<1)
    # means an equal-ts right row IS visible to the left row (≤); strict
    # flips the tags so the left row sorts first and can't see it.
    left_tag, right_tag = (0, 1) if strict else (1, 0)
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        *[F.lit(None).cast(r.schema[v].dataType).alias(f"__r_{v}") for v in vals],
        F.lit(None).cast(r.schema["__ts"].dataType).alias("__r_ts"),
    )
    left_null_cols = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left.columns
        if c not in keys
    ]
    r2 = r.select(
        *keys,
        *left_null_cols,
        F.col("__ts"),
        F.lit(right_tag).alias("__tag"),
        *[F.col(v).alias(f"__r_{v}") for v in vals],
        F.col("__ts").alias("__r_ts"),
    ).select(*l2.columns)  # align column order for the union

    asc = direction == "backward"
    order = [F.col("__ts").asc(), F.col("__tag").asc()] if asc else [
        F.col("__ts").desc(),
        F.col("__tag").asc(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).select(
        *[c for c in left.columns],
        F.col("__tag"),
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{prefix}{right_ts}"),
        *[
            F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"{prefix}{v}")
            for v in vals
        ],
    )
    is_left = F.col("__tag") == left_tag
    return carried.filter(is_left).drop("__tag")


def range_join(
    left: DataFrame,
    right: DataFrame,
    conditions: Sequence[Column],
    equi_keys: Sequence[str] = (),
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Interval/range join: equality keys (hash-joinable) plus range
    predicates. ``broadcast_right=True`` for dimension-sized right
    sides (bands, calendars) — without an equi key a range join is a
    nested-loop and the small side MUST broadcast to avoid shuffling
    the fact table."""
    cond = None
    for k in equi_keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    for c in conditions:
        cond = c if cond is None else cond & c
    if cond is None:
        # a dynamically-built empty condition list would silently run
        # join(None) = a full cartesian product (r8 review) — at fact-
        # table scale that never finishes; demand an explicit predicate
        raise ValueError(
            "range_join: no join condition — pass at least one range "
            "condition or equi key (an unconditioned join would be a "
            "cartesian product; use crossJoin explicitly if intended)"
        )
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond, how)
