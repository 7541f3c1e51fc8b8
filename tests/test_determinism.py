"""Parallelism-invariance: results must be identical under different
shuffle partitioning — the property that makes answers reproducible on
a 1000-executor cluster vs local[32]. Rounding at output boundaries
(not mid-plan) is what makes the float aggregates hold this."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# queries with float aggregation, shuffles, and windows — the shapes
# most likely to drift under repartitioning
PROBE = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "blog_a_most_active",
    "events_sessionize",
    "asof_purchase_last_click",
    "text_stats",
    "dedup_ngram_jaccard",
]


@pytest.mark.parametrize("name", PROBE)
def test_results_invariant_to_shuffle_partitions(spark, name):
    fn = entry.queries()[name]
    base = sorted(map(str, fn(spark, SF).collect()))
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert alt == base
