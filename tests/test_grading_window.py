"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-12
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r10/r11, sits inside
this round's graded window, or is explicitly queued for round 13 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The r12 window head (VERDICT r11 asks #1/#3/#5/#6): the 7 keys
# ADDED in r11 after its window was pinned lead — they have NO driver
# record at all (the certification debt the r11 verdict names) — then
# versioned_mor_merge, NEW this round (ask #3: MoR MERGE via deletion
# vectors, carrying the keyed find-scan gate of ask #6).
R12_HEAD = [
    "versioned_overwrite_change_feed",
    "versioned_restore",
    "versioned_shallow_clone",
    "versioned_bloom_lookup",
    "versioned_null_skipping",
    "versioned_type_widening",
    "versioned_merge_by_source",
    "versioned_mor_merge",  # new in r12 — graded immediately
]

# Then the 4 r8-greens the r11 head displaced (their record is 4
# rounds old at r12 close), the stateful v1 pair (ask #5 — graded
# regardless of their r10 green), and the 36 oldest r9-greens led by
# the blog/TPC-H block (3 rounds old).
R12_QUEUE = [
    "embedding_label_centroids",
    "source_mixing_weights",
    "compaction_roundtrip",
    "upsert_events_latest",
    "streaming_stateful_totals",
    "streaming_stateful_totals_rocksdb",
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
    "sql_time_travel",
    "sql_min_price_supplier",
    "versioned_manifest_segments",
    "versioned_mor_delete",
    "versioned_merge_into",
    "anti_join_customers_no_orders",
    "semi_join_urgent_suppliers",
    "range_join_quantity_bands",
    "approx_distinct_sketch_rollup",
    "customer_value_deciles",
    "full_outer_balance_bands",
    "events_value_histogram",
    "approx_quantiles_gated",
    "fuzzy_name_match",
    "customer_priority_profile",
]

R12_WINDOW = R12_HEAD + R12_QUEUE
assert len(R12_WINDOW) == 50

# The 14 r9-greens that did not fit the r12 window: their record
# turns 4 rounds old at r12 close, so they MUST lead the r13 window.
# Kept at the very end of the dict, ready to rotate.
R13_QUEUE = [
    "priority_share_by_year",
    "topk_orders_per_customer",
    "distinct_parts_per_flag",
    "events_json_extract",
    "events_pivot_counts",
    "events_unpivot_counts",
    "smoothed_mixture_sample",
    "streaming_upsert_latest",
    "pack_training_sequences",
    "clean_corpus_pipeline",
    "streaming_session_windows",
    "streaming_interval_join",
    "table_profile_orders_approx",
    "user_retention_cohorts",
]


def test_first_50_is_the_intended_r12_window():
    assert list(entry.queries())[:50] == R12_WINDOW


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r10 or r11,
    is in this round's graded window, or is explicitly queued for the
    r13 window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r10.json", "CORRECTNESS_r11.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R12_WINDOW) | set(R13_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r12 window...
    assert not set(R13_QUEUE) & set(list(entry.queries())[:50])
    # ...and sit at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R13_QUEUE):] == R13_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
