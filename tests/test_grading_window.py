"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-4
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r03 or sits inside
this round's graded window — so a driver-side sampling change or an
accidental reorder is caught by CI instead of inferred from stale
comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The intended round-4 grading window, in order: the 4 keys with no
# current-era green row, the 2 new r4 keys, then the 44 keys whose
# last green is CORRECTNESS_r02.
R4_WINDOW = [
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
]


def test_first_50_is_the_intended_r4_window():
    assert list(entry.queries())[:50] == R4_WINDOW


# Keys added in r4 AFTER the window filled: deliberately ungraded this
# round; they MUST lead the r5 window.
R5_QUEUE = [
    "importance_sampling",
    "token_budget_curation",
    "funnel_conversion",
]


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r03, is in
    this round's graded window, or is explicitly queued for the r5
    window — no key can be SILENTLY stranded ungraded."""
    r03 = json.loads((REPO / "CORRECTNESS_r03.json").read_text())
    green_r03 = {k for k, v in r03.items() if v.get("hash_match") is True}
    covered = green_r03 | set(R4_WINDOW) | set(R5_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r4 window (tail position)
    assert not set(R5_QUEUE) & set(list(entry.queries())[:50])


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
