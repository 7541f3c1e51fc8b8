"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-7
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r05/r06, sits inside
this round's graded window, or is explicitly queued for round 8 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The intended round-7 grading window, in order: the 32-key R7_QUEUE
# from the r6 verdict (11 r04-greens that did not fit the r6 window,
# then the 21 late-r6 keys never driver-graded), then the 5 new r7
# keys, then the 13 oldest r5-greens filling the window to 50.
R7_WINDOW = [
    # R7_QUEUE part 1: r04-greens that did not fit the r6 window
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
    # R7_QUEUE part 2: late-r6 keys, never driver-graded
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
    # new r7 keys (never graded): the r6 verdict's asks #3-#5 + CDC
    # read + transactional overwrite
    "versioned_schema_evolution",
    "versioned_string_pruned_read",
    "versioned_vacuum_retention",
    "versioned_incremental_read",
    "versioned_overwrite_refresh",
    # window fill: the 13 oldest r5-greens (green turns 2 rounds old)
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


def test_first_50_is_the_intended_r7_window():
    assert list(entry.queries())[:50] == R7_WINDOW


# Deferred keys that MUST lead the r8 window: the r5-greens that did
# not fit the r7 window — their last green is 2 rounds old at r7 close.
R8_QUEUE = [
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
]


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r05 or r06, is
    in this round's graded window, or is explicitly queued for the r8
    window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r05.json", "CORRECTNESS_r06.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R7_WINDOW) | set(R8_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r7 window (tail position)
    assert not set(R8_QUEUE) & set(list(entry.queries())[:50])
    # and the queue sits at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R8_QUEUE):] == R8_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
