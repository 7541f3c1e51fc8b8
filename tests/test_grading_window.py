"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-9
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r07/r08, sits inside
this round's graded window, or is explicitly queued for round 10 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The 41-key R9_QUEUE from the r8 verdict (ask #1): r6-greens whose
# record turned 2 rounds old at r8 close. They MUST lead the window.
R9_QUEUE = [
    "smoothed_mixture_sample",
    "streaming_upsert_latest",
    "pack_training_sequences",
    "clean_corpus_pipeline",
    "streaming_session_windows",
    "streaming_interval_join",
    "table_profile_orders_approx",
    "user_retention_cohorts",
    "blog_a_most_active",
    "blog_b_counts_per_key",
    "blog_c_longest_text",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q14_promo_share",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q4_late_shipment_priority",
    "q10_returned_revenue_top",
    "q16_brand_supplier_counts",
    "q19_banded_revenue",
    "q22_idle_rich_customers",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_order_distribution",
    "q15_top_supplier",
    "customer_value_deciles",
    "full_outer_balance_bands",
    "events_value_histogram",
    "approx_quantiles_gated",
    "fuzzy_name_match",
    "customer_priority_profile",
    "priority_share_by_year",
    "topk_orders_per_customer",
    "distinct_parts_per_flag",
    "events_json_extract",
    "events_pivot_counts",
    "events_unpivot_counts",
]

# New r9 keys (never graded): the r8 verdict's asks — inserted between
# the queue and the fills, each displacing one fill into the R10_QUEUE.
# Updated as features land this round.
R9_NEW = [
    "versioned_manifest_segments",  # ask #3: O(appended) commit metadata
    "versioned_mor_delete",  # ask #5: deletion vectors, zero rewrites
    "versioned_merge_into",  # ask #6: 3-batch MERGE, one COW commit each
    "sql_time_travel",  # ask #8: VERSION/TIMESTAMP AS OF via spark.sql
]

# Window fill: the oldest r7-greens (their green is 2 rounds old at r9
# close), in r7-window order. Shrinks from the END as R9_NEW grows.
R9_FILL = [
    "sql_min_price_supplier",
    "approx_distinct_sketch_rollup",
    "anti_join_customers_no_orders",
    "semi_join_urgent_suppliers",
    "range_join_quantity_bands",
    "rollup_revenue",
    "grouping_sets_revenue",
    "udtf_ngrams_count",
    "cube_revenue",
][: 9 - len(R9_NEW)]

R9_WINDOW = R9_QUEUE + R9_NEW + R9_FILL


def test_first_50_is_the_intended_r9_window():
    assert len(R9_WINDOW) == 50
    assert list(entry.queries())[:50] == R9_WINDOW


# Deferred keys that MUST lead the r10 window: the r7-greens that did
# not fit the r9 window — their last green is 2 rounds old at r9
# close. The displaced fills (if any) rejoin at the FRONT in r7 order.
R10_QUEUE = [
    "sql_min_price_supplier",
    "approx_distinct_sketch_rollup",
    "anti_join_customers_no_orders",
    "semi_join_urgent_suppliers",
    "range_join_quantity_bands",
    "rollup_revenue",
    "grouping_sets_revenue",
    "udtf_ngrams_count",
    "cube_revenue",
    "price_quantiles_exact",
    "set_ops_priority_custs",
    "kmeans_embeddings",
    "pagerank_trade_graph",
    "cms_heavy_hitters",
    "bigram_logprob_quality",
    "ks_drift_events",
    "duplicate_span_fraction",
    "regression_value_trend",
    "streaming_cms_topk",
    "source_token_kl",
    "winsorized_stats_events",
    "events_ohlc_bars",
    "chi2_type_value_band",
    "weighted_sample_aes",
    "hashed_feature_vectors",
    "event_transition_matrix",
    "hourly_corr_click_purchase",
    "versioned_table_history",
    "image_phash_neardup",
    "versioned_pruned_read",
    "audio_fingerprint_neardup",
    "embedding_int8_quantize",
    "versioned_schema_evolution",
    "versioned_string_pruned_read",
    "versioned_vacuum_retention",
    "versioned_incremental_read",
    "versioned_overwrite_refresh",
    "importance_sampling",
    "token_budget_curation",
    "funnel_conversion",
    "streaming_stateful_totals_rocksdb",
    "streaming_full_outer_join",
    "formats_roundtrip",
    "skew_salted_agg_events",
    "skew_salted_join_events",
    "bucketed_join_priority_revenue",
    "streaming_dedup_events",
    "streaming_stateful_totals",
    "streaming_sliding_windows",
    "streaming_static_join",
]


def _r10_tail():
    """The r7-greens outside this round's window, in r7-window order —
    the tail the r10 rotation will consume."""
    in_window = set(R9_WINDOW)
    return [k for k in R10_QUEUE if k not in in_window]


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r07 or r08, is
    in this round's graded window, or is explicitly queued for the r10
    window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r07.json", "CORRECTNESS_r08.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R9_WINDOW) | set(R10_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r9 window (tail position)
    tail = _r10_tail()
    assert not set(tail) & set(list(entry.queries())[:50])
    # and the queue sits at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(tail):] == tail


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
