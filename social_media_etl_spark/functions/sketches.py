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
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "cms_error_bound",
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
    def _name(p: float) -> str:
        # int(p*100) truncates float error (0.29*100 -> 28.999... ->
        # "p28") and collides 0.99/0.999 on "p99" (r8 review): keep
        # enough digits to stay faithful and unique
        scaled = p * 100
        r = round(scaled)
        return f"p{r}" if abs(scaled - r) < 1e-9 else (
            "p" + f"{scaled:.6f}".rstrip("0").rstrip(".").replace(".", "_")
        )

    names = [_name(p) for p in probabilities]
    if len(set(names)) != len(names):
        raise ValueError(
            f"approx_quantiles: probability aliases collide: {names}"
        )
    return df.agg(
        *[
            F.percentile_approx(col, p, accuracy).alias(n)
            for p, n in zip(probabilities, names)
        ]
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan '05): point-frequency
# estimation in fixed space. Spark has no native CMS aggregate, so the
# sketch is represented RELATIONALLY as a (row, bucket, cnt) frame of
# ≤ depth × width cells — which makes it mergeable with a plain
# union + sum (cell-wise addition is exactly CMS merge), storable as a
# tiny parquet table, and estimable with a broadcast join. All hashing
# is xxhash64 seeded per sketch row: deterministic, executor-local, no
# Python. Guarantees (per item): estimate ≥ true count always, and
# estimate ≤ true + e/width · N with probability 1 − e^(−depth).
# ---------------------------------------------------------------------------


def _cms_bucket(item: Column, row: Column, width: int, seed: int) -> Column:
    return F.pmod(F.xxhash64(item, F.lit(seed), row), F.lit(width))


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Build a count-min sketch over every row of ``col``.

    One explode (×depth) and one hash aggregate; output is at most
    depth × width rows no matter the input size — the fixed-space
    contract that makes frequency tracking workable at 100 TB.

    The sketch frame CARRIES its (depth, width, seed) as constant
    columns (ADVICE r6): the hash parameters are part of the sketch's
    identity, and merge/estimate validate them instead of trusting the
    caller to re-supply the right ones — a silently mismatched width
    or seed would still return plausible minima while voiding the
    "estimate ≥ true" guarantee. Three constant int columns on a
    ≤ depth×width-row frame are free (RLE'd to nothing in parquet).
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    return (
        df.select(F.col(col).alias("__item"))
        .select("__item", rows)
        .groupBy(
            "row",
            _cms_bucket(F.col("__item"), F.col("row"), width, seed).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "row",
            "bucket",
            "cnt",
            F.lit(depth).alias("depth"),
            F.lit(width).alias("width"),
            F.lit(seed).alias("seed"),
        )
    )


def _cms_params(df: DataFrame) -> Column:
    return F.struct(F.col("depth"), F.col("width"), F.col("seed"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, seed):
    cell-wise addition via union + re-aggregate — never touches raw
    data, so shards/days/tables combine for free.

    Parameter safety (ADVICE r6/r7): a GLOBAL min/max of the carried
    (depth, width, seed) struct across the whole union — a bounded
    aggregate over ≤ Σ depth×width rows, broadcast onto the merged
    cells — RAISES on any disagreement. Global (not per-cell)
    validation is the airtight form: two sparse sketches with
    different seeds can occupy disjoint cells and would never collide
    on one, and the global fold strictly subsumes what a per-cell fold
    could see (r8 review removed the then-dead per-cell aggregates).
    Validation still never touches raw data.
    """
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    glob = out.agg(
        F.min(_cms_params(out)).alias("__plo"),
        F.max(_cms_params(out)).alias("__phi"),
    )
    merged = (
        out.groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .crossJoin(F.broadcast(glob))
    )
    keep = lambda c: F.when(  # noqa: E731
        F.col("__plo") == F.col("__phi"), F.col(f"__plo.{c}")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "cms_merge: sketches built with different "
                    "(depth, width, seed) — the union mixes "
                ),
                F.col("__plo").cast("string"),
                F.lit(" and "),
                F.col("__phi").cast("string"),
            )
        ).cast("int")
    )
    return merged.select(
        "row",
        "bucket",
        "cnt",
        keep("depth").alias("depth"),
        keep("width").alias("width"),
        keep("seed").alias("seed"),
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Point-frequency estimates for ``items[col]``: min over the
    item's depth cells (an absent cell reads 0). The sketch side is
    bounded (≤ depth × width rows) and broadcast.

    The probe buckets are hashed with the CALLER's (depth, width,
    seed) — those must be concrete at plan time — but every joined
    sketch cell carries the BUILDER's triple, and the plan raises on
    the first cell whose carried parameters disagree with the
    caller's (ADVICE r6). Per-cell alone is not airtight for SPARSE
    sketches (r8 review, the same hole cms_merge closed): a wrong-seed
    probe can hash every item onto UNOCCUPIED cells, pass the
    NULL-cell check, and return silent 0 under-estimates — so the
    builder's triple is also folded GLOBALLY from the sketch (a
    bounded one-row aggregate, broadcast) and validated once against
    the caller's. A mismatch can no longer return plausible wrong
    minima; it fails loudly.
    """
    glob = sketch.agg(
        F.min(_cms_params(sketch)).alias("__blo"),
        F.max(_cms_params(sketch)).alias("__bhi"),
    )
    want = F.struct(
        F.lit(depth).alias("depth"),
        F.lit(width).alias("width"),
        F.lit(seed).alias("seed"),
    )
    glob_gate = F.when(
        F.col("__blo").isNull()  # empty sketch: nothing to disagree with
        | ((F.col("__blo") == want) & (F.col("__bhi") == want)),
        F.lit(1),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cms_estimate: sketch carries (depth, width, seed) "),
                F.col("__blo").cast("string"),
                F.lit(".."),
                F.col("__bhi").cast("string"),
                F.lit(f" but the caller passed ({depth}, {width}, {seed})"),
            )
        ).cast("int")
    )
    probes = items.select(F.col(col).alias("item")).distinct()
    # the gate column must stay LOAD-BEARING (filtered on, not
    # dropped) or column pruning eliminates the raise_error entirely
    probes = (
        probes.crossJoin(
            F.broadcast(glob.select(glob_gate.alias("__params_checked")))
        )
        .filter(F.col("__params_checked") == 1)
        .drop("__params_checked")
    )
    probes = probes.select(
        "item",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    ).select(
        "item",
        "row",
        _cms_bucket(F.col("item"), F.col("row"), width, seed).alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    params_ok = F.col("depth").isNull() | (
        (F.col("depth") == F.lit(depth))
        & (F.col("width") == F.lit(width))
        & (F.col("seed") == F.lit(seed))
    )
    checked_cnt = F.when(params_ok, F.coalesce(F.col("cnt"), F.lit(0))).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cms_estimate: sketch was built with (depth, width, seed)=("),
                F.col("depth"),
                F.lit(", "),
                F.col("width"),
                F.lit(", "),
                F.col("seed"),
                F.lit(f") but the caller passed ({depth}, {width}, {seed})"),
            )
        ).cast("bigint")
    )
    return joined.groupBy("item").agg(F.min(checked_cnt).alias("estimate"))


def cms_error_bound(width: int) -> float:
    """ε such that overestimation ≤ ε·N w.h.p. (ε = e / width)."""
    import math

    return math.e / width
