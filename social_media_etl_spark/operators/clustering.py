"""Distributed k-means (Lloyd's) over embedding columns.

Complements the IVF quantizer training in ``operators/similarity.py``
(which fits on a bounded driver-side SAMPLE): here every step —
assignment, centroid update, iteration — is a DataFrame operation, so
the FULL corpus participates in training no matter its size. This is
the 100 TB clustering path (semantic bucketing for dedup, curriculum
binning, corpus cartography):

- **centroids live in a k×dim DataFrame**, broadcast into the
  assignment join — never a driver-side matrix;
- **assignment** is one hash aggregate keyed on the vector id:
  ``min(struct(dist2, cluster, vec))`` gives the argmin cluster with a
  deterministic tie-break (lowest cluster id) and map-side partial
  combine — no window sort;
- **update** is posexplode → per-(cluster, dim) average (map-side
  partials) → array reassembly, i.e. one shuffle keyed on (cluster,
  pos) per iteration;
- per-iteration centroid frames are persisted and materialized (k×dim
  rows — bounded) so iteration i+1 does not recompute the whole
  lineage of iteration i.

Determinism: distances accumulate left-to-right over double-cast
elements (same sequential order as a SQL list comprehension), the
argmin tie-breaks on cluster id, and initial centroids are the k rows
with the smallest ids — every step is engine-comparable, which is what
lets the driver's DuckDB oracle replay the whole fit.

Reference parity: the reference pipeline has no clustering operator;
this extends the §2.6 extension-family surface (SURVEY.md) the same
way the ANN/dedup operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from social_media_etl_spark.functions.vectors import as_double

__all__ = ["init_centroids", "kmeans_assign", "kmeans_update", "kmeans_fit_df"]


def _dist2(vec_col, cent_col):
    """Squared L2 distance, summed left-to-right (engine-comparable)."""
    diffs = F.zip_with(vec_col, cent_col, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def init_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Deterministic seeding: the ``k`` vectors with the smallest ids
    become clusters ``0..k-1`` (TakeOrdered — top-k per partition, no
    global sort materialization). Returns (cluster, centroid)."""
    first_k = (
        df.select(F.col(id_col).alias("__id"), as_double(vec_col).alias("centroid"))
        .orderBy("__id")
        .limit(k)
    )
    w = Window.orderBy("__id")
    return first_k.select(
        (F.row_number().over(w) - 1).cast("int").alias("cluster"), "centroid"
    )


def kmeans_assign(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign every vector to its nearest centroid.

    One broadcast nested-loop join (centroids are k rows — tiny) and
    one hash aggregate on the vector id. Ties break to the lowest
    cluster id via struct ordering. Returns (id, cluster, dist2, vec).
    """
    # one F.expr parse instead of the py4j lambda DSL: building the
    # zip_with/aggregate tree column-by-column cost ~60 ms of driver
    # round trips per iteration (r16; same resolved plan, verified
    # result-identical) — the SQL text is _dist2 verbatim
    scored = (
        df.select(F.col(id_col).alias("__id"), as_double(vec_col).alias("__v"))
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "__d2",
            F.expr(
                "aggregate(zip_with(__v, centroid,"
                " (a, b) -> (a - b) * (a - b)),"
                " 0.0D, (acc, x) -> acc + x)"
            ),
        )
    )
    best = scored.groupBy("__id").agg(
        F.min(F.struct("__d2", "cluster", "__v")).alias("__best")
    )
    return best.select(
        F.col("__id").alias(id_col),
        F.col("__best.cluster").alias("cluster"),
        F.col("__best.__d2").alias("dist2"),
        F.col("__best.__v").alias("vec"),
    )


def kmeans_update(assigned: DataFrame, round_to: int | None = None) -> DataFrame:
    """New centroid per non-empty cluster: dimension-wise mean via
    posexplode → (cluster, pos) hash aggregate → array reassembly
    (array_sort on (pos, v) structs orders by pos). Empty clusters
    drop out — identical semantics to the SQL replay.

    ``round_to`` rounds each mean to that many decimals BEFORE it
    feeds the next iteration: double summation order differs between
    engines (Spark's shuffled partials vs a sequential replay), so
    unrounded means diverge at ~1e-15 and the drift compounds across
    iterations. Re-quantizing each update (9 dp ≈ 1e6× the float
    noise) makes both engines enter every iteration with bit-identical
    centroids — distances, argmins and all later iterations then agree
    exactly."""
    m = F.avg("v")
    if round_to is not None:
        m = F.round(m, round_to)
    dims = assigned.select(
        "cluster", F.posexplode("vec").alias("pos", "v")
    ).groupBy("cluster", "pos").agg(m.alias("m"))
    return dims.groupBy("cluster").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
        ).alias("centroid")
    )


def kmeans_fit_df(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    materialize: bool = True,
    round_to: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations fully distributed.

    Returns ``(assigned, centroids)`` where ``assigned`` is the
    assignment under the final centroids' PREDECESSOR (the assignment
    that produced them) — i.e. iteration i does assign(c_{i-1}) then
    update → c_i.

    ``materialize=True`` persists + counts each intermediate centroid
    frame (bounded: k×dim values) so the final plan does not recompute
    every earlier iteration's full-corpus pass; pass False to keep the
    plan fully lazy (the oracle-replica mode).
    """
    if iters < 1:
        raise ValueError(
            f"kmeans_fit_df: iters must be >= 1, got {iters} — zero "
            "iterations would return no assignment"
        )
    cent = init_centroids(df, id_col, vec_col, k)
    assigned = None
    for _ in range(iters):
        assigned = kmeans_assign(df, cent, id_col, vec_col)
        cent = kmeans_update(assigned, round_to=round_to)
        if materialize:
            from social_media_etl_spark.cache import persist_tracked

            cent = persist_tracked(cent)
            cent.count()
    return assigned, cent
