"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-15
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r13/r14, sits inside
this round's graded window, or is explicitly queued for round 16 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The r15 window head (VERDICT r14 ask #1): the 16 R15_QUEUE keys —
# last driver-graded at r11, 4 rounds old at r15 open, the staleness
# the rotation exists to cap.
R15_HEAD = [
    "dedup_lines_c4",
    "doc_repetition",
    "embedding_neardup",
    "ann_cosine_topk",
    "doc_chunks",
    "quota_per_source",
    "corpus_top_words",
    "versioned_delete_where",
    "versioned_cdc_stream",
    "versioned_partitioned_read",
    "multimodal_decode_jpeg",
    "zorder_layout_roundtrip",
    "corpus_shuffle",
    "gopher_quality_flags",
    "semantic_dedup_representatives",
    "bpe_pair_counts",
]

# Then the keys NEW in r15 (graded immediately — the vbkt-r11 /
# mor-r12 / sqldml-r13 / ddl-r14 precedent): SQL partition-spec
# evolution, DEEP CLONE, and IDENTITY columns, VERDICT r14 asks
# #3/#6/#7. (Grows as r15 keys land; the r12 block below shrinks in
# lockstep so the window stays exactly 50.)
R15_NEW: list[str] = [
    "sql_partition_evolution",
    "sql_deep_clone",
    "sql_identity_columns",
    "sql_replace_where",
]

# Then the oldest r12-greens in their standing dict order (their
# driver record turns 3 rounds old at r15 close).
R15_R12_BLOCK = [
    "versioned_overwrite_change_feed",
    "versioned_restore",
    "versioned_shallow_clone",
    "versioned_bloom_lookup",
    "versioned_null_skipping",
    "versioned_type_widening",
    "versioned_merge_by_source",
    "versioned_mor_merge",
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
]

R15_WINDOW = R15_HEAD + R15_NEW + R15_R12_BLOCK
assert len(R15_WINDOW) == 50

# The r12-greens that did not fit the r15 window: their record
# turns 4 rounds old at r15 close, so they MUST lead the r16 window.
# Kept at the very end of the dict, ready to rotate.
R16_QUEUE = [
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


def test_first_50_is_the_intended_r15_window():
    assert list(entry.queries())[:50] == R15_WINDOW


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r13 or r14,
    is in this round's graded window, or is explicitly queued for the
    r16 window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r13.json", "CORRECTNESS_r14.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R15_WINDOW) | set(R16_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r15 window...
    assert not set(R16_QUEUE) & set(list(entry.queries())[:50])
    # ...and sit at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R16_QUEUE):] == R16_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
