"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but two cases still need
explicit salting at 100 TB:

- **skewed aggregation** — AQE cannot split a hash-aggregate group;
  one hot key = one straggler task. Salted two-phase aggregation
  spreads the hot key over ``n_salts`` partial groups, then combines.
- **skewed join against a small-ish build side** that exceeds the
  broadcast threshold: replicate the build side per salt so the
  probe side's hot key spreads across ``n_salts`` tasks.

Both are pure DataFrame rewrites — deterministic results, same
semantics, different physical distribution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_agg", "salted_join"]


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform deterministic salt derived from the row (spark_partition_id
    + monotonic id hashed) — no RNG state, stable under retries."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
    )


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max} (the re-combinable aggregates; avg = sum
    pair downstream). ``count`` follows SQL semantics: count(col)
    skips NULLs in the named column; pass ``"*"`` as the input column
    for count(*) (r8 review: 'count' used to ignore the named column
    and always count rows). Phase 1 groups by (key, salt) — the hot
    key becomes ``n_salts`` partial groups computed in parallel; phase
    2 combines partials per key (sum/sum/min/max of partials).
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        if fn not in recombine:
            raise ValueError(f"unsupported salted agg fn: {fn}")
        if fn == "count":
            first = F.count(F.lit(1)) if col == "*" else F.count(F.col(col))
        else:
            first = getattr(F, fn)(col)
        phase1_aggs.append(first.alias(f"__p_{out}"))
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*group_cols, "__salt").agg(*phase1_aggs)
    phase2 = [
        recombine[fn](f"__p_{out}").alias(out) for out, (col, fn) in aggs.items()
    ]
    return partial.groupBy(*group_cols).agg(*phase2)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt the (skewed) probe side, REPLICATE
    the build side once per salt value, join on (key, salt).

    The hot probe key spreads over ``n_salts`` tasks instead of one
    straggler; cost is build-side duplication — use when the build side
    is small-ish but above the broadcast threshold. Row multiplicity is
    unchanged (each probe row joins exactly the one replica matching
    its salt) — but ONLY for probe-preserving join types: a right or
    full outer join would surface every unmatched build REPLICA as a
    spurious null-probe row (n_salts of them per unmatched key), so
    those types are refused (r8 review)."""
    probe_preserving = {
        "inner", "cross", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how not in probe_preserving:
        raise ValueError(
            f"salted_join: how='{how}' is not probe-preserving — the "
            "replicated build side would emit spurious null-probe rows "
            "for every unmatched replica. Swap the sides (salt the "
            "other table) or use a plain join for right/full outer."
        )
    keys = list(on)
    probe_s = with_salt(probe, n_salts)
    build_r = build.crossJoin(
        F.broadcast(
            probe.sparkSession.range(n_salts).select(
                F.col("id").cast("long").alias("__salt")
            )
        )
    )
    out = probe_s.join(build_r, [*keys, "__salt"], how)
    return out.drop("__salt")
