"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-8
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r06/r07, sits inside
this round's graded window, or is explicitly queued for round 9 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The intended round-8 grading window, in order: the 37-key R8_QUEUE
# from the r7 verdict (r5-greens whose record turned 2 rounds old at
# r7 close), then the 4 new r8 keys (the r7 verdict's asks #3-#6),
# then the 9 oldest r6-greens filling the window to 50.
R8_WINDOW = [
    # R8_QUEUE: r5-greens, pinned by the r7 verdict ask #1
    "streaming_incremental_rollup",
    "streaming_left_outer_join",
    "pack_sequences_greedy",
    "pii_redaction",
    "tfidf_top_terms",
    "unigram_logprob_quality",
    "train_val_test_split",
    "table_profile_orders",
    "text_stats",
    "text_lang_id",
    "doc_fingerprint",
    "multimodal_metadata",
    "multimodal_decode_images",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "decontaminate_benchmark",
    "events_windowed_agg",
    "events_sessionize",
    "events_rolling_avg",
    "scd2_user_event_history",
    "asof_purchase_last_click",
    "asof_signup_next_purchase",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "streaming_windowed_agg",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_lines_c4",
    "doc_repetition",
    "embedding_neardup",
    "ann_cosine_topk",
    "doc_chunks",
    "quota_per_source",
    "corpus_top_words",
    # new r8 keys (never graded): the r7 verdict's asks #3-#6 —
    # copy-on-write DELETE, streaming CDC consumption, partition-
    # spec'd VersionedTable, JPEG-certified corpus
    "versioned_delete_where",
    "versioned_cdc_stream",
    "versioned_partitioned_read",
    "multimodal_decode_jpeg",
    # window fill: the 9 oldest r6-greens (green turns 2 rounds old)
    "zorder_layout_roundtrip",
    "corpus_shuffle",
    "gopher_quality_flags",
    "semantic_dedup_representatives",
    "bpe_pair_counts",
    "embedding_label_centroids",
    "source_mixing_weights",
    "compaction_roundtrip",
    "upsert_events_latest",
]


def test_first_50_is_the_intended_r8_window():
    assert list(entry.queries())[:50] == R8_WINDOW


# Deferred keys that MUST lead the r9 window: the r6-greens that did
# not fit the r8 window — their last green is 2 rounds old at r8
# close. 41 keys: with the 50-slot window that leaves 9 fill slots
# for r9, so r9 must add at most 9 new keys (prefer 0 — the
# steady-state arithmetic in the r7 verdict: at 141 keys the rotation
# cycle is already 2.8 rounds).
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


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r06 or r07, is
    in this round's graded window, or is explicitly queued for the r9
    window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r06.json", "CORRECTNESS_r07.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R8_WINDOW) | set(R9_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r8 window (tail position)
    assert not set(R9_QUEUE) & set(list(entry.queries())[:50])
    # and the queue sits at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R9_QUEUE):] == R9_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
