"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute-force top-k** — the exact baseline: query×corpus join with a
  per-query ranking window. Exact, oracle-checkable; cost O(|Q|·|C|),
  fine when the query set is small or as the rerank stage.
- **hyperplane-LSH ANN** — random-hyperplane signatures (Charikar'02
  SRP): sign-bit signature per vector, bucket equi-join on signature
  band, exact-cosine rerank within candidates. Sub-quadratic scale
  path; hyperplanes are derived deterministically from xxhash64 so
  executors need no shared random state (seeded, reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from social_media_etl_spark.functions.vectors import (
    cosine,
    dot_fixed,
    norm_fixed,
    vector_dim,
)

__all__ = ["cosine_topk", "srp_signature", "ann_lsh_topk"]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Deterministic: ranking orders by (rounded cosine desc, neighbor id)
    so ties never flap across runs/engines. Norms precomputed per
    vector; per-pair dot is the codegen'd fixed-dim sum.
    """
    d = dim or vector_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_fixed(vec_col, d).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_fixed(vec_col, d).alias("cn"),
    )
    pairs = q.crossJoin(c)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    denom = F.col("qn") * F.col("cn")
    scored = pairs.withColumn(
        "cosine", F.round(F.when(denom > 0, dot_fixed("qv", "cv", d) / denom), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _hyperplane_component(plane: int, dim_idx, seed: int = 7):
    """Deterministic pseudo-random ±1 hyperplane component from
    xxhash64(seed, plane, dim). Rademacher planes preserve angles in
    expectation just like Gaussian ones (and cost no RNG state)."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), dim_idx)
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def srp_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Signed-random-projection signature: bit j = sign(v · h_j)."""
    v = F.col(vec_col).cast("array<double>")
    def bit(j: int):
        prod = F.zip_with(
            v,
            F.transform(
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda i: _hyperplane_component(j, i, seed),
            ),
            lambda x, w: x * w,
        )
        s = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )

    sig = None
    for j in range(bits):
        sig = bit(j) if sig is None else sig + bit(j)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("sig"))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 16,
    band_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any signature
    band with the query, reranked by exact cosine. Recall < 1 by
    design; tune (bits, band_bits) per corpus."""
    assert bits % band_bits == 0
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1

    def banded(df_sig: DataFrame, role: str) -> DataFrame:
        return df_sig.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band"),
                            F.shiftright(F.col("sig"), j * band_bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("bucket"),
                        )
                        for j in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select(f"{role}_id", f"{role}_v", "bb.band", "bb.bucket")

    qb = banded(srp_signature(queries, id_col, vec_col, bits, seed), "query")
    cb = banded(srp_signature(corpus, id_col, vec_col, bits, seed), "neighbor")
    cands = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_v", "neighbor_id", "neighbor_v")
        .distinct()
    )
    scored = cands.withColumn(
        "cosine", F.round(cosine("query_v", "neighbor_v"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
