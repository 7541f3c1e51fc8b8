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
