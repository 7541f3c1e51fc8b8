"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-6
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r04/r05, sits inside
this round's graded window, or is explicitly queued for round 7 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The intended round-6 grading window, in order: the 7-key R6_QUEUE from
# the r5 verdict (2 never-driver-graded r5 additions, then the 5 keys
# whose last green is CORRECTNESS_r03), the 4 new r6 keys, then the
# first 39 of the 50 keys whose last green is CORRECTNESS_r04.
R6_WINDOW = [
    "zorder_layout_roundtrip",
    "corpus_shuffle",
    "gopher_quality_flags",
    "semantic_dedup_representatives",
    "bpe_pair_counts",
    "embedding_label_centroids",
    "source_mixing_weights",
    "compaction_roundtrip",
    "upsert_events_latest",
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


def test_first_50_is_the_intended_r6_window():
    assert list(entry.queries())[:50] == R6_WINDOW


# Deferred keys that MUST lead the r7 window: the r04-green keys that
# did not fit the r6 window (50-slot budget), then the late-r6
# additions that have never been driver-graded.
R7_QUEUE = [
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
]


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r04 or r05, is
    in this round's graded window, or is explicitly queued for the r7
    window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r04.json", "CORRECTNESS_r05.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R6_WINDOW) | set(R7_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r6 window (tail position)
    assert not set(R7_QUEUE) & set(list(entry.queries())[:50])
    # and the queue sits at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R7_QUEUE):] == R7_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
