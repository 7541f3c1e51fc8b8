"""Distributed k-means (operators/clustering.py) and PageRank
(operators/graph.py) — the iterative fixed-point operator family."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from social_media_etl_spark.operators.clustering import (
    init_centroids,
    kmeans_assign,
    kmeans_fit_df,
    kmeans_update,
)
from social_media_etl_spark.operators.graph import pagerank


def _blobs(spark):
    """Two well-separated 2-D blobs. The two SMALLEST ids (the k=2
    seeds) land one in each blob — Lloyd's guarantees nothing under a
    both-seeds-in-one-blob init, so the test seeds sanely."""
    rows = [
        (0, [0.0, 0.1]),
        (1, [10.0, 10.1]),
        (2, [0.1, 0.0]),
        (3, [10.1, 10.0]),
        (4, [0.2, 0.2]),
        (5, [9.9, 9.9]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    df = _blobs(spark)
    assigned, cent = kmeans_fit_df(df, k=2, iters=3, materialize=False)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got[1] == got[3] == got[5]
    assert got[0] == got[2] == got[4]
    assert got[0] != got[1]
    assert cent.count() == 2


def test_kmeans_centroid_is_cluster_mean(spark):
    df = _blobs(spark)
    assigned, cent = kmeans_fit_df(df, k=2, iters=3, materialize=False)
    blob_b = cent.join(
        assigned.filter(F.col("vec_id") == 1).select("cluster"), "cluster"
    ).collect()[0]["centroid"]
    assert blob_b[0] == pytest.approx((10.0 + 10.1 + 9.9) / 3)
    assert blob_b[1] == pytest.approx((10.1 + 10.0 + 9.9) / 3)


def test_kmeans_assign_tie_breaks_to_lowest_cluster(spark):
    df = spark.createDataFrame(
        [(1, [5.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [4.0]), (1, [6.0])], "cluster int, centroid array<double>"
    )
    out = kmeans_assign(df, cents, "vec_id", "embedding").collect()[0]
    assert out["cluster"] == 0 and out["dist2"] == 1.0


def test_kmeans_update_drops_empty_cluster_and_rounds(spark):
    assigned = spark.createDataFrame(
        [(1, 0, [1.0 / 3.0]), (2, 0, [2.0 / 3.0])],
        "vec_id long, cluster int, vec array<double>",
    )
    out = kmeans_update(assigned, round_to=3).collect()
    assert len(out) == 1
    assert out[0]["centroid"] == [0.5]


def test_init_centroids_takes_k_smallest_ids(spark):
    df = _blobs(spark)
    cents = {r["cluster"]: r["centroid"] for r in
             init_centroids(df, "vec_id", "embedding", 2).collect()}
    assert cents[0] == [0.0, 0.1] and cents[1] == [10.0, 10.1]


def test_kmeans_deterministic_rerun(spark):
    df = _blobs(spark)
    a1, c1 = kmeans_fit_df(df, k=2, iters=2, materialize=False, round_to=9)
    a2, c2 = kmeans_fit_df(df, k=2, iters=2, materialize=False, round_to=9)
    assert sorted(map(tuple, a1.select("vec_id", "cluster").collect())) == \
        sorted(map(tuple, a2.select("vec_id", "cluster").collect()))
    assert sorted(map(str, c1.collect())) == sorted(map(str, c2.collect()))


def _star_edges(spark):
    """Undirected star: hub h connected to leaves l1..l4."""
    pairs = [("h", f"l{i}") for i in range(1, 5)]
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src string, dst string")


def test_pagerank_star_hub_dominates_and_sums_to_one(spark):
    ranks = pagerank(_star_edges(spark), iters=5, materialize=False)
    rows = {r["node"]: r["rank"] for r in ranks.collect()}
    assert rows["h"] > max(v for k, v in rows.items() if k != "h")
    # symmetric graph has no sinks → total mass is conserved
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    # leaves are symmetric → identical ranks
    leaf_ranks = {v for k, v in rows.items() if k != "h"}
    assert len(leaf_ranks) == 1


def test_pagerank_uniform_on_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    rows = pagerank(edges, iters=4, materialize=False).collect()
    for r in rows:
        assert r["rank"] == pytest.approx(1.0 / 3.0, abs=1e-9)
        assert r["n_nodes"] == 3


def test_pagerank_dangling_mass_leaks(spark):
    # directed chain a→b: b is a sink, so total mass decays below 1
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    rows = {r["node"]: r["rank"] for r in
            pagerank(edges, iters=3, materialize=False).collect()}
    assert rows["b"] > rows["a"]
    assert sum(rows.values()) < 1.0


# -- KS drift (plans/analytics.py:ks_drift) ---------------------------------


def _ks_brute(sample_a, sample_b):
    pts = sorted(set(sample_a) | set(sample_b))
    na, nb = len(sample_a), len(sample_b)
    return max(
        abs(
            sum(1 for x in sample_a if x <= p) / na
            - sum(1 for x in sample_b if x <= p) / nb
        )
        for p in pts
    )


def test_ks_drift_matches_bruteforce(spark):
    from social_media_etl_spark.plans.analytics import ks_drift

    a = [1.0, 2.0, 2.0, 3.5, 9.0, 4.4, 0.2, 7.7]
    b = [2.0, 2.5, 6.0, 6.0, 8.1, 3.3]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_drift(df, "g", "v", "a", "b", n_buckets=4).collect()[0]
    assert got["ks_stat"] == round(_ks_brute(a, b), 6)
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))


def test_ks_drift_identical_distributions_is_zero(spark):
    from social_media_etl_spark.plans.analytics import ks_drift

    rows = [(g, float(v)) for g in ("a", "b") for v in range(20)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert ks_drift(df, "g", "v", "a", "b").collect()[0]["ks_stat"] == 0.0


def test_ks_drift_disjoint_supports_is_one(spark):
    from social_media_etl_spark.plans.analytics import ks_drift

    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v + 100)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    assert ks_drift(df, "g", "v", "a", "b").collect()[0]["ks_stat"] == 1.0


def test_ks_drift_bucket_count_invariant(spark):
    """The bucketing is an execution detail: any n_buckets gives the
    same exact statistic."""
    from social_media_etl_spark.plans.analytics import ks_drift

    rows = [("a", float(v % 13)) for v in range(50)] + [
        ("b", float(v % 7)) for v in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r1 = ks_drift(df, "g", "v", "a", "b", n_buckets=1).collect()[0]
    r256 = ks_drift(df, "g", "v", "a", "b", n_buckets=256).collect()[0]
    assert r1["ks_stat"] == r256["ks_stat"]


def test_connected_components_stats_hook(spark):
    """The stats dict records edge count, dispatch path, and (on the
    distributed branch) the round count — the probe introspection
    hook (VERDICT r12 #3). A 9-node chain needs ~log2(8)+1 rounds via
    pointer jumping, well under a diameter-linear count."""
    from social_media_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    st: dict = {}
    out = connected_components(pairs, driver_threshold=0, stats=st)
    assert st["path"] == "distributed" and st["edges"] == 16
    assert 1 <= st["rounds"] <= 6
    assert all(r["component"] == 0 for r in out.collect())
    st2: dict = {}
    connected_components(pairs, driver_threshold=10**6, stats=st2)
    assert st2["path"] == "driver" and "rounds" not in st2
