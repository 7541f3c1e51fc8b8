"""Bucketed-table co-located join: the shuffle-elimination strategy
for repeated large-fact joins (SURVEY §2.6 / 100 TB design point).

Writing both join sides bucketed by the join key means every
subsequent join on that key reads co-partitioned data — ZERO exchange
on either side, at any scale. The test materializes bucketed copies of
orders/lineitem and asserts the join plan is exchange-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    names = ("b_orders", "b_lineitem")
    for name, (src, key) in zip(
        names, [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, SF, src)
            .write.mode("overwrite")
            .option("path", f"{wh}/{name}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders, lineitem = (spark.table(t) for t in bucketed_tables)
    # force the SMJ path (broadcast would mask the bucketing effect)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderpriority").count()
        assert joined.count() == 5  # execute → AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        join_subtree = plan.split("SortMergeJoin", 1)[1]
        # both inputs arrive bucket-partitioned: no shuffle below the join
        assert "Exchange" not in join_subtree
        assert "SelectedBucketsCount: 8 out of 8" in join_subtree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    orders_b, lineitem_b = (spark.table(t) for t in bucketed_tables)
    got = {
        r["o_orderpriority"]: r["count"]
        for r in lineitem_b.join(
            orders_b, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    want = {
        r["o_orderpriority"]: r["count"]
        for r in load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert got == want


# -- bucket spec in the VERSIONED layer (VERDICT r9 #5) ----------------------


def _final_plan(df) -> str:
    """The AQE final-plan section (the Initial Plan duplicate would
    false-positive any textual exchange check)."""
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_versioned_bucketed_join_zero_exchange_survives_append(
    spark, tmp_path
):
    from social_media_etl_spark.operators.manifest import VersionedTable

    left = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 6000).select(
        F.col("id").alias("k"), F.concat(F.lit("t"), F.col("id") % 3).alias("tag")
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left.where("k < 2000"), bucket_by=("k", 8)
    )
    tl.append(left.where("k >= 2000"))  # the append the plan must survive
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, bucket_by=("k", 8)
    )
    l_df = tl.register_bucketed("vbkt_l")
    r_df = tr.register_bucketed("vbkt_r")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            l_df.join(r_df, "k")
            .groupBy("tag")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("a").alias("sum_a"))
        )
        got = {r["tag"]: (r["n"], r["sum_a"]) for r in j.collect()}
        plan = _final_plan(j)
        assert "SortMergeJoin" in plan
        # both scans arrive bucket-partitioned: the join key never
        # shuffles on either side
        assert "Exchange hashpartitioning(k" not in plan
        assert plan.count("SelectedBucketsCount: 8 out of 8") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS vbkt_l")
        spark.sql("DROP TABLE IF EXISTS vbkt_r")
    want = {
        r["tag"]: (r["n"], r["sum_a"])
        for r in left.join(right, "k")
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("a").alias("sum_a"))
        .collect()
    }
    assert got == want


def test_versioned_bucketed_refusals_and_dml_compaction(spark, tmp_path):
    from social_media_etl_spark.operators.manifest import VersionedTable

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    with pytest.raises(ValueError, match="does not compose"):
        VersionedTable.create(
            spark,
            str(tmp_path / "bad"),
            df,
            partition_by="v",
            bucket_by=("k", 4),
        )
    plain = VersionedTable.create(spark, str(tmp_path / "plain"), df)
    with pytest.raises(ValueError, match="no bucket spec"):
        plain.register_bucketed("vbkt_nospec")
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), df, bucket_by=("k", 4)
    )
    # a MoR delete leaves vectors → registration refuses, OPTIMIZE
    # compacts them away and the refusal lifts; the COW rewrite path
    # (delete/upsert) keeps the bucket layout
    t.delete("k = 5", mode="mor")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.register_bucketed("vbkt_dv")
    t.optimize(target_files=4)
    out = t.register_bucketed("vbkt_ok")
    try:
        assert out.count() == 99
        assert sorted(r["k"] for r in out.where("k < 8").collect()) == [
            0, 1, 2, 3, 4, 6, 7,
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS vbkt_ok")
    t.delete("k >= 90")  # COW rewrite inherits the bucket layout
    out2 = t.register_bucketed("vbkt_after_cow")
    try:
        assert out2.count() == 89
    finally:
        spark.sql("DROP TABLE IF EXISTS vbkt_after_cow")


def test_vacuum_sweeps_stale_bucketed_view_dirs(spark, tmp_path):
    """View dirs are hard links — left in place they keep vacuumed
    bytes alive through their inodes. Vacuum sweeps views of
    non-retained versions (age-guarded); the head's view survives."""
    import os

    from social_media_etl_spark.operators.manifest import VersionedTable

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), df, bucket_by=("k", 4)
    )
    t.register_bucketed("vbkt_v0")
    spark.sql("DROP TABLE vbkt_v0")  # catalog entry gone, view dir stays
    t.append(df.withColumn("k", F.col("k") + 100))
    t.append(df.withColumn("k", F.col("k") + 200))
    t.register_bucketed("vbkt_head")
    spark.sql("DROP TABLE vbkt_head")
    vroot = str(tmp_path / "t" / "_bucketed_views")
    assert len(os.listdir(vroot)) == 2
    # age guard: young view dirs survive even when stale
    assert t.vacuum(keep_last=2, min_age_seconds=3600) == 0
    assert len(os.listdir(vroot)) == 2
    # waived guard: the v0 view (version not retained) is swept, the
    # head-version view stays
    t.vacuum(keep_last=2, min_age_seconds=0)
    left = os.listdir(vroot)
    assert len(left) == 1 and left[0].startswith("v00000002-")


def test_vacuum_drops_catalog_tables_over_swept_view_dirs(spark, tmp_path):
    """A registered table whose view dir vacuum sweeps must not
    outlive its backing hard links as a silently-empty catalog entry
    (ADVICE r10): vacuum DROPs it. A name RE-registered over a newer
    snapshot's dir is untouched when the old dir sweeps."""
    import os

    from social_media_etl_spark.operators.manifest import VersionedTable

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), df, bucket_by=("k", 4)
    )
    t.register_bucketed("vbkt_stale")  # points at the v0 view dir
    t.register_bucketed("vbkt_moved")  # v0 now; re-registered below
    t.append(df.withColumn("k", F.col("k") + 100))
    t.append(df.withColumn("k", F.col("k") + 200))
    t.register_bucketed("vbkt_moved")  # now points at the HEAD view dir
    names = {x.name for x in spark.catalog.listTables()}
    assert {"vbkt_stale", "vbkt_moved"} <= names
    t.vacuum(keep_last=2, min_age_seconds=0)
    names = {x.name for x in spark.catalog.listTables()}
    # the table over the swept v0 dir is dropped with it...
    assert "vbkt_stale" not in names
    # ...the re-registered name survives and still reads the head
    assert "vbkt_moved" in names
    assert spark.table("vbkt_moved").count() == 150
    vroot = str(tmp_path / "t" / "_bucketed_views")
    assert sum(n.startswith("v00000002-") for n in os.listdir(vroot)) == 1
    spark.sql("DROP TABLE vbkt_moved")


def test_register_bucketed_ctas_mode_accepts_what_link_refuses(
    spark, tmp_path
):
    """mode='ctas' (r11, the remote-table materialization): one
    distributed bucketed rewrite of the LOGICAL snapshot — works for
    DV'd and renamed/mixed snapshots link mode must refuse, and the
    result joins with zero exchange exactly like a linked view."""
    from social_media_etl_spark.operators.manifest import VersionedTable

    left = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left, bucket_by=("k", 4)
    )
    tl.delete("k >= 2000", mode="mor")  # live DV: link mode refuses
    tl.rename_column("a", "amount")  # mixed layout: link refuses too
    with pytest.raises(ValueError, match="deletion vectors"):
        tl.register_bucketed("vbkt_ctas_l")
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, bucket_by=("k", 4)
    )
    l_df = tl.register_bucketed("vbkt_ctas_l", mode="ctas")
    r_df = tr.register_bucketed("vbkt_ctas_r", mode="ctas")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            l_df.join(r_df, "k")
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        )
        got = {r["g"]: (r["n"], r["s"]) for r in j.collect()}
        plan = _final_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(k" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # rows are the LOGICAL snapshot: DV applied, rename resolved
    want = {
        r["g"]: (r["n"], r["s"])
        for r in left.where("k < 2000")
        .withColumnRenamed("a", "amount")
        .join(right, "k")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="unknown mode"):
        tl.register_bucketed("vbkt_ctas_x", mode="bogus")
    spark.sql("DROP TABLE IF EXISTS vbkt_ctas_l")
    spark.sql("DROP TABLE IF EXISTS vbkt_ctas_r")
