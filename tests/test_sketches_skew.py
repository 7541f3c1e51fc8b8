"""Sketch aggregates (error-bounded vs exact) and skew-salting
operators (result-equivalence vs unsalted plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.catalog import load_table
from social_media_etl_spark.functions import sketches
from social_media_etl_spark.operators import skew

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_error_bound(spark):
    li = load_table(spark, SF, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    est = li.agg(
        sketches.hll_estimate(sketches.hll_sketch("l_partkey")).alias("e")
    ).first()["e"]
    assert abs(est - exact) / exact < 0.05  # lg_k=12 → ~1.6% std error


def test_hll_sketch_rollup_merges_without_raw_data(spark):
    li = load_table(spark, SF, "lineitem")
    out = sketches.distinct_sketch_rollup(
        li, ["l_returnflag"], "l_partkey", rollup_col="l_linestatus"
    )
    got = {r["l_returnflag"]: r for r in out.collect()}
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, row in got.items():
        assert abs(row["approx_distinct"] - exact[flag]) / exact[flag] < 0.05
        assert row["n_cells"] >= 1


def test_approx_quantiles_ordered_and_bounded(spark):
    orders = load_table(spark, SF, "orders")
    row = sketches.approx_quantiles(orders, "o_totalprice").first()
    lo, hi = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    assert lo <= row["p50"] <= row["p90"] <= row["p99"] <= hi


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key."""
    hot = spark.range(9000).select(
        F.lit(1).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionAll(cold)


def test_salted_agg_matches_plain_agg(skewed):
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in skew.salted_agg(
            skewed,
            ["k"],
            {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(skewed):
    """Phase-1 output must contain multiple partial groups for the hot
    key — the whole point of the salt."""
    salted = skew.with_salt(skewed, 8)
    partials = (
        salted.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert partials > 1


def test_salted_join_matches_plain_join(spark, skewed):
    build = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 52)], "k long, name string"
    )
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in skewed.join(build, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in skew.salted_join(skewed, build, ["k"], n_salts=8).collect()
    )
    assert salted == plain and len(plain) == 10000


# -- count-min sketch -------------------------------------------------------


def test_cms_exact_when_no_collisions(spark):
    """Far fewer distinct items than width → every estimate is exact."""
    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame(
        [(f"item{i % 5}",) for i in range(100)], "token string"
    )
    sk = sketches.cms_build(df, "token", depth=4, width=1024)
    est = {
        r["item"]: r["estimate"]
        for r in sketches.cms_estimate(
            sk, df.select("token").distinct(), "token", depth=4, width=1024
        ).collect()
    }
    assert est == {f"item{i}": 20 for i in range(5)}


def test_cms_never_undercounts_under_collision_pressure(spark):
    """width=4 forces collisions: estimates must only OVERcount."""
    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame(
        [(f"t{i % 50}",) for i in range(500)], "token string"
    )
    sk = sketches.cms_build(df, "token", depth=2, width=4)
    est = sketches.cms_estimate(
        sk, df.select("token").distinct(), "token", depth=2, width=4
    )
    assert est.count() == 50
    assert est.filter(F.col("estimate") < 10).count() == 0


def test_cms_merge_equals_direct_build(spark):
    """Cell-wise merge of shard sketches == sketch of the whole stream."""
    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame(
        [(i, f"w{i % 7}") for i in range(200)], "id long, token string"
    )
    direct = sketches.cms_build(df, "token")
    merged = sketches.cms_merge(
        sketches.cms_build(df.filter(F.col("id") % 2 == 0), "token"),
        sketches.cms_build(df.filter(F.col("id") % 2 == 1), "token"),
    )
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_cms_rejects_mismatched_parameters(spark):
    """ADVICE r6: the sketch frame carries its (depth, width, seed);
    estimating or merging with different parameters must FAIL loudly
    instead of returning plausible wrong minima."""
    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame(
        [(f"t{i % 20}",) for i in range(200)], "token string"
    )
    sk = sketches.cms_build(df, "token", depth=4, width=1024, seed=7)
    # wrong width at estimate time
    with pytest.raises(Exception, match="cms_estimate"):
        sketches.cms_estimate(
            sk, df.select("token").distinct(), "token",
            depth=4, width=512, seed=7,
        ).collect()
    # wrong seed at estimate time
    with pytest.raises(Exception, match="cms_estimate"):
        sketches.cms_estimate(
            sk, df.select("token").distinct(), "token",
            depth=4, width=1024, seed=8,
        ).collect()
    # merging two sketches built with different widths
    other = sketches.cms_build(df, "token", depth=4, width=512, seed=7)
    with pytest.raises(Exception, match="cms_merge"):
        sketches.cms_merge(sk, other).collect()


def test_cms_sketch_size_is_bounded(spark):
    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(5000)], "token string"
    )
    sk = sketches.cms_build(df, "token", depth=3, width=64)
    assert sk.count() <= 3 * 64


def test_cms_merge_rejects_disjoint_cell_seed_mismatch(spark):
    """ADVICE r7: two SPARSE sketches with the same width but
    different seeds can occupy disjoint (row, bucket) cells, so the
    per-cell min/max fold alone never sees both triples on one cell.
    The global params fold must still raise."""
    from social_media_etl_spark.functions import sketches

    schema = (
        "row int, bucket int, cnt long, depth int, width int, seed int"
    )
    sk_a = spark.createDataFrame([(0, 5, 10, 1, 1024, 7)], schema)
    sk_b = spark.createDataFrame([(0, 6, 3, 1, 1024, 8)], schema)
    with pytest.raises(Exception, match="cms_merge"):
        sketches.cms_merge(sk_a, sk_b).collect()
    # same-parameter disjoint cells still merge fine
    sk_c = spark.createDataFrame([(0, 6, 3, 1, 1024, 7)], schema)
    rows = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketches.cms_merge(sk_a, sk_c).collect()
    }
    assert rows == {(0, 5): 10, (0, 6): 3}
