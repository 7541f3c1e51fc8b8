"""Physical-plan shape tests — the 100 TB design contract, enforced.

Correctness tests prove the answers right at small SF; these prove the
PLANS stay right at any SF: filters reach the parquet scan, projections
prune the read schema, small dimensions broadcast instead of shuffling
the fact table, aggregates partial-aggregate before the exchange, and
the hot path never drops into row-at-a-time Python.
"""

from __future__ import annotations


import __spark_entry__ as entry
from social_media_etl_spark.catalog import load_table
from social_media_etl_spark.plans import analytics

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q1_filter_pushed_to_scan_and_schema_pruned(spark):
    p = plan(analytics.pricing_summary(load_table(spark, SF, "lineitem")))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # 16-column table pruned to the 7 referenced columns
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read_schema.count(":") <= 8
    assert "l_orderkey" not in read_schema


def test_q1_partial_aggregation_before_shuffle(spark):
    p = plan(analytics.pricing_summary(load_table(spark, SF, "lineitem")))
    # map-side combine: partial_sum appears under a HashAggregate that
    # precedes the Exchange in the plan tree
    assert "partial_sum" in p
    assert p.index("partial_sum") < p.index("ENSURE_REQUIREMENTS")


def test_q3_dimension_broadcasts(spark):
    df = analytics.top_revenue_orders(
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "lineitem"),
    )
    p = plan(df)
    assert "BroadcastHashJoin" in p
    # the filtered customer scan pushes the segment predicate down
    assert "EqualTo(c_mktsegment,BUILDING)" in p


def test_blog_a_no_sort_merge_join(spark):
    """Query (a)'s right join decomposes into broadcast joins — the
    parent (users analog) must never shuffle on the join attribute."""
    df = entry.queries()["blog_a_most_active"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_text_stats_no_python_udf(spark):
    """Text metrics are pure column expressions: no BatchEvalPython /
    ArrowEvalPython stage may appear — the scan feeds codegen directly."""
    df = entry.queries()["text_stats"](spark, SF)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "WholeStageCodegen" in plan(df, "codegen")


def test_range_join_broadcasts_not_cartesian(spark):
    df = entry.queries()["range_join_quantity_bands"](spark, SF)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_asof_join_single_key_shuffle(spark):
    """The as-of join must be union+window: key-partitioned exchanges
    only — never a join of left×right rows."""
    df = entry.queries()["asof_purchase_last_click"](spark, SF)
    p = plan(df)
    assert "Window" in p
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in p


def test_minhash_partial_aggregates_signature(spark):
    """MinHash signatures must come from one hash aggregate with
    map-side partial mins (shuffle carries signatures, not shingles)."""
    from social_media_etl_spark.operators import dedup

    docs = load_table(spark, SF, "documents")
    sigs = dedup.minhash_signature(docs, "doc_id", "text", 3, 16)
    p = plan(sigs)
    assert "partial_min" in p
    assert p.index("partial_min") < p.index("ENSURE_REQUIREMENTS")


def test_events_windowed_agg_prunes_props(spark):
    """The windowed agg reads 3 of events' 6 columns — props (the wide
    JSON payload) must not be scanned."""
    p = plan(analytics.events_windowed_agg(load_table(spark, SF, "events")))
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema
    assert "user_id" not in read_schema


def test_q4_semi_join_no_row_multiplication(spark):
    p = plan(
        analytics.late_shipment_priority(
            load_table(spark, SF, "orders"), load_table(spark, SF, "lineitem")
        )
    )
    assert "LeftSemi" in p
    # lineitem contributes only its join/filter columns to the semi join
    read = [l for l in p.splitlines() if "ReadSchema" in l and "l_orderkey" in l]
    assert read and all("l_extendedprice" not in l for l in read)


def test_q19_disjunction_reaches_part_scan(spark):
    p = plan(
        analytics.banded_disjunctive_revenue(
            load_table(spark, SF, "part"), load_table(spark, SF, "lineitem")
        )
    )
    # the brand/size disjunction is pushed to the part scan as Or(...)
    assert "PushedFilters" in p and "Or(And(" in p
    # part side broadcasts — the lineitem fact never shuffles for the join
    assert "BroadcastHashJoin" in p


def test_q22_anti_join_price_filter_pushed(spark):
    p = plan(
        analytics.idle_rich_customers(
            load_table(spark, SF, "customer"), load_table(spark, SF, "orders")
        )
    )
    assert "LeftAnti" in p
    assert "GreaterThan(o_totalprice,300000.0)" in p


def test_q7_both_nation_copies_broadcast(spark):
    """Q7's double-dimension pattern: every dimension (supplier,
    customer, both nation aliases) broadcasts; the only sort-merge or
    shuffled-hash join allowed is lineitem⨝orders on orderkey."""
    df = analytics.nation_trade_volume(
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "supplier"),
        load_table(spark, SF, "nation"),
    )
    p = plan(df)
    assert p.count("BroadcastHashJoin") >= 4
    # nation-name pair filter applied before the broadcast, pushed to scan
    assert "In(n_name, [NATION_1,NATION_2])" in p


def test_q11_global_threshold_is_broadcast_scalar(spark):
    """Q11's HAVING-subquery threshold must arrive as a broadcast
    one-row relation (nested-loop/cross of 1 row), never a shuffle."""
    df = analytics.important_parts(load_table(spark, SF, "lineitem"))
    p = plan(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # both branches partial-aggregate before their exchanges
    assert "partial_sum" in p


def test_q13_left_join_keeps_zero_customers(spark):
    """Q13 must keep zero-order customers: the join may flip build side
    but must stay an outer join (no inner-join rewrite)."""
    df = analytics.order_count_distribution(
        load_table(spark, SF, "customer"), load_table(spark, SF, "orders")
    )
    p = plan(df)
    assert "Outer" in p or "LeftOuter" in p or "RightOuter" in p


def test_fuzzy_match_blocks_then_broadcasts(spark):
    """The fuzzy matcher must equi-join on the blocking key with the
    small side broadcast — the Levenshtein predicate is a post-join
    filter, never the join condition (which would force a cartesian)."""
    df = analytics.fuzzy_name_match(
        load_table(spark, SF, "customer"), load_table(spark, SF, "supplier")
    )
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p


def test_unigram_logprob_freq_broadcast_and_partial_agg(spark):
    """The corpus-wide unigram table joins back onto the token stream
    as a broadcast; both groupBys partial-aggregate before shuffling."""
    df = entry.queries()["unigram_logprob_quality"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "partial_count" in p or "partial_sum" in p


def test_full_outer_join_over_preaggregated_sides(spark):
    """Both sides must aggregate BEFORE the full outer join: the
    exchange feeding the join carries grouped rows, not raw tables."""
    df = analytics.full_outer_balance_bands(
        load_table(spark, SF, "customer"), load_table(spark, SF, "supplier")
    )
    p = plan(df)
    assert "FullOuter" in p
    # aggregation happens below the join: partial_count appears in plan
    assert "partial_count" in p


def test_bpe_pairs_single_shuffle_partial_agg(spark):
    """BPE pair counting: pairs built array-side (no window, no
    position self-join) → exactly one aggregate exchange with map-side
    partial counts; only the text column is read; the top-100 is a
    distributed TakeOrdered, NOT a single-partition sort of every
    distinct pair."""
    p = plan(entry.queries()["bpe_pair_counts"](spark, SF))
    assert "partial_count" in p
    assert p.index("partial_count") < p.index("ENSURE_REQUIREMENTS")
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "text" in read_schema and "doc_id" not in read_schema
    # rank window over the tiny count table, not a join of positions
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p
    # the global rank window must sit ABOVE the limit (sorts ≤100 rows)
    assert p.index("TakeOrderedAndProject") > p.index("Window")


def test_top_words_distributed_topk(spark):
    """corpus_top_words: same TakeOrdered-before-rank shape."""
    p = plan(entry.queries()["corpus_top_words"](spark, SF))
    assert "TakeOrderedAndProject" in p
    assert p.index("TakeOrderedAndProject") > p.index("Window")


def test_label_centroids_partial_avg_and_pruned_scan(spark):
    """Centroids: posexplode then ONE exchange keyed (label, pos) with
    map-side partial avg; scan reads only label + embedding."""
    p = plan(entry.queries()["embedding_label_centroids"](spark, SF))
    assert "partial_avg" in p
    assert p.index("partial_avg") < p.index("ENSURE_REQUIREMENTS")
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "vec_id" not in read_schema


def test_mixing_weights_broadcasts_scalars(spark):
    """Mixing weights: the two scalar normalizers broadcast back onto
    the per-source counts — no sort-merge join anywhere."""
    p = plan(entry.queries()["source_mixing_weights"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_funnel_single_user_shuffle(spark):
    """The whole funnel (3 chained window mins + per-user collapse)
    must ride ONE user_id exchange — extra hashpartitioning exchanges
    on user_id mean the window chain broke partition reuse."""
    df = analytics.funnel_conversion(load_table(spark, SF, "events"))
    p = plan(df)
    assert p.count("hashpartitioning(user_id") == 1, p


def test_importance_sample_no_shuffle_and_pruned_scan(spark):
    """Weighted sampling is a pure filter: zero exchanges (the final
    tiny sort aside), and the filter stays off the doc text."""
    from pyspark.sql import functions as F

    from social_media_etl_spark.operators.sampling import importance_sample

    docs = load_table(spark, SF, "documents")
    out = importance_sample(
        docs.withColumn("w", F.least(F.lit(1.0), F.col("n_chars") / 400.0)),
        "doc_id",
        "w",
    ).select("doc_id", "source")
    p = plan(out)
    assert "Exchange" not in p, p
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "text" not in read_schema


def test_budget_quota_single_stratum_shuffle(spark):
    """Token-budget curation = one window shuffle keyed on the stratum;
    the running sum must not add a second exchange."""
    from pyspark.sql import functions as F

    from social_media_etl_spark.operators.sampling import budget_quota

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = budget_quota(
        docs, "source", "n_chars", 10_000, [F.desc("n_chars"), F.col("doc_id")]
    )
    p = plan(out)
    assert p.count("hashpartitioning(source") == 1, p


def test_retention_cohorts_partial_aggs_and_broadcast(spark):
    """Both event collapses partial-aggregate before their user_id
    exchange, and the per-user cohort frame broadcasts (at this SF)
    rather than shuffling the activity side again."""
    df = entry.queries()["user_retention_cohorts"](spark, SF)
    p = plan(df)
    assert "partial_min" in p or "partial_first" in p or "HashAggregate" in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    # no more than the three key exchanges: two user_id collapses + the
    # final (cohort_week, offset) agg (plus the output sort)
    assert p.count("hashpartitioning(user_id") <= 2, p


def test_formats_roundtrip_certification_joins_are_equi(spark):
    """The ORC/CSV certification joins key on null-safe EQUALITY of
    every column — Catalyst must plan hash-based equi-joins, never the
    nested-loop/cartesian fallback (all-pairs at scale)."""
    df = entry._formats_roundtrip(spark, SF)
    p = plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    # the final rollup partial-aggregates before its exchange
    assert "HashAggregate" in p


def test_compaction_roundtrip_certification_join_is_equi(spark):
    """The compaction certification join keys on null-safe EQUALITY of
    every column — hash-based equi-join, never the nested-loop/cartesian
    fallback (all-pairs at scale); the rollup partial-aggregates."""
    df = entry._compaction_roundtrip(spark, SF)
    p = plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "HashAggregate" in p


def test_upsert_events_latest_no_cartesian_single_key_window(spark):
    """The merged latest-wins state rides the upsert's per-key window
    (one event_id shuffle inside upsert_parquet, already materialized);
    the returned plan is a plain partial-aggregated rollup of the
    parquet state — no joins, no window replays."""
    df = entry._upsert_events_latest(spark, SF)
    p = plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "HashAggregate" in p
    assert "Window" not in p, p  # state is pre-materialized, not re-ranked


def test_corpus_shuffle_is_distributed_sort(spark):
    """The seeded shuffle's total order is a RANGE exchange on the hash
    key (distributed sort) — never a single-partition collapse or a
    global rank window."""
    df = entry._corpus_shuffle(spark, SF)
    p = plan(df)
    assert "rangepartitioning(shuffle_key" in p, p
    assert "Exchange SinglePartition" not in p, p
    assert "Window" not in p, p


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Centroids must enter the assignment as a broadcast (k rows) —
    never a shuffled cartesian — and the argmin must partial-combine
    before the vec_id exchange."""
    p = plan(entry.queries()["kmeans_embeddings"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p
    assert "partial_min" in p


def test_pagerank_no_cartesian_and_partial_sums(spark):
    p = plan(entry.queries()["pagerank_trade_graph"](spark, SF))
    assert "CartesianProduct" not in p
    # contribution aggregate combines map-side before the dst exchange
    assert "partial_sum" in p
    # the |V|-row rank frames broadcast into every edge join — the
    # |E|-row edge list must NEVER be shuffle-sorted per iteration
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_ks_drift_windows_are_bucket_partitioned(spark):
    """The heavy per-value cumulation must run partitioned by bucket;
    the only global-order window is over the bucket-totals frame."""
    p = plan(entry.queries()["ks_drift_events"](spark, SF))
    assert "CartesianProduct" not in p
    # per-value running window carries the bucket in its partition spec
    assert "partitionBy=[__b" in p.replace(" ", "") or "__b#" in p
    # pushed scan: only the two compared groups are read
    assert "In(event_type" in p or "EqualTo(event_type" in p


def test_duplicate_span_join_is_hash_not_nested(spark):
    p = plan(entry.queries()["duplicate_span_fraction"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "partial_count" in p or "partial_sum" in p


def test_cms_sketch_join_broadcasts_sketch_side(spark):
    """The depth x width sketch is bounded — it must broadcast into the
    estimation join, never shuffle the probe stream."""
    p = plan(entry.queries()["cms_heavy_hitters"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_bigram_unigram_table_broadcasts(spark):
    p = plan(entry.queries()["bigram_logprob_quality"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "partial_count" in p


def test_regression_trend_single_pass_partial_aggs(spark):
    p = plan(entry.queries()["regression_value_trend"](spark, SF))
    # one hash aggregate pass with map-side combine; no joins at all
    assert "partial_regr_slope" in p or "partial_" in p
    assert "Join" not in p


def test_winsorize_bounds_broadcast(spark):
    p = plan(entry.queries()["winsorized_stats_events"](spark, SF))
    assert "CartesianProduct" not in p
    # per-group percentile bounds (5 rows) broadcast onto the stream
    assert "BroadcastHashJoin" in p


def test_ohlc_single_aggregate_no_window(spark):
    p = plan(entry.queries()["events_ohlc_bars"](spark, SF))
    # the whole OHLC bar is ONE hash aggregate — no window sort pass
    assert "Window" not in p
    assert "partial_min_by" in p or "partial_" in p
    assert "Join" not in p


def test_transition_matrix_single_user_shuffle(spark):
    p = plan(entry.queries()["event_transition_matrix"](spark, SF))
    assert "CartesianProduct" not in p
    # the lag window partitions by user — never a global-order window
    assert "partitionBy=[user_id" in p.replace(" ", "").replace("#", "#") or "user_id#" in p
    # marginals broadcast back onto the |types|^2 count table
    assert "BroadcastHashJoin" in p


def test_weighted_sample_is_distributed_takeordered(spark):
    p = plan(entry.queries()["weighted_sample_aes"](spark, SF))
    # top-k by jitter must be TakeOrdered (per-partition heads), not a
    # global sort materialization
    assert "TakeOrderedAndProject" in p


def test_hashed_features_two_hash_aggregates_no_join(spark):
    p = plan(entry.queries()["hashed_feature_vectors"](spark, SF))
    assert "Join" not in p and "Window" not in p
    assert p.count("HashAggregate") >= 2
