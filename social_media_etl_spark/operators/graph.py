"""Distributed iterative graph ranking (PageRank) as DataFrame ops.

The repo already does one-shot distributed graph work (connected
components via min-label propagation, ``operators/dedup.py``); this
adds the ITERATIVE fixed-point family — PageRank-style influence
scoring over an edge list — with the canonical Pregel-as-join shape:

- ranks live in a (node, rank) frame; each iteration is ONE join of
  the edge list against current ranks (shuffle keyed on src) and ONE
  aggregation of contributions (shuffle keyed on dst);
- out-degrees are computed once and joined alongside ranks, never
  recomputed per iteration;
- per-iteration rank frames are persisted and materialized (|V| rows,
  node + one double — small relative to edges) so iteration i+1 does
  not replay iteration i's full lineage;
- ranks are re-quantized (``round_to`` dp, default 12) every
  iteration: double summation order differs between engines/runs, so
  unrounded ranks drift at ~1e-16 and compound; re-quantizing makes
  every iteration enter with identical ranks — the DuckDB oracle can
  then replay the exact trajectory.

At 100 TB the edges frame dominates: both per-iteration shuffles key
on its endpoints, so pre-partitioning edges by src (and AQE skew
splitting for celebrity nodes) carries the whole loop. Dangling nodes
(no out-edges) simply leak their mass — the standard simplification;
symmetrize the edge list if the input may contain sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    round_to: int | None = 12,
    materialize: bool = True,
) -> DataFrame:
    """Rank nodes of a directed edge list; returns (node, rank, n_nodes).

    rank_0 = 1/N for every node appearing as src or dst;
    rank_{i+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_i(u)/outdeg(u).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    total = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = F.lit(1.0 - damping) / F.col("n_nodes")
    ranks = nodes.crossJoin(F.broadcast(total)).select(
        "node", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    if materialize:
        from social_media_etl_spark.cache import persist_tracked

        ranks = persist_tracked(ranks)
        ranks.count()
    for _ in range(iters):
        contrib = (
            e.join(ranks.select("node", "rank"), e["src"] == F.col("node"))
            .join(outdeg, "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        new_rank = base + F.lit(damping) * F.coalesce(F.col("inc"), F.lit(0.0))
        if round_to is not None:
            new_rank = F.round(new_rank, round_to)
        ranks = (
            nodes.crossJoin(F.broadcast(total))
            .join(incoming, F.col("node") == F.col("dst"), "left")
            .select("node", "n_nodes", new_rank.alias("rank"))
        )
        if materialize:
            from social_media_etl_spark.cache import persist_tracked

            ranks = persist_tracked(ranks)
            ranks.count()
    return ranks
