"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-10
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r08/r09, sits inside
this round's graded window, or is explicitly queued for round 11 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The 45-key R10_QUEUE from the r9 verdict (ask #1): r7-greens whose
# record turned 2 rounds old at r9 close. They MUST lead the window.
R10_QUEUE = [
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

# New r10 keys (never graded): the r9 verdict's asks — inserted between
# the queue and the fills, each displacing one fill into the R11_QUEUE.
# Updated as features land this round.
R10_NEW = [
    "versioned_multipart_read",  # ask #3: (date, region)-style tuple specs
    "versioned_column_rename",  # ask #4: column-mapping RENAME
    "versioned_bucketed_join",  # ask #5: bucket spec in the versioned layer
    "versioned_change_feed",  # r10 extra: Delta-CDF typed insert/delete feed
    "streaming_change_feed",  # r10 extra: the CDF's streaming twin
]

# Window fill: the oldest r8-greens (their green is 2 rounds old at
# r10 close), in r8-window order. Shrinks from the END as R10_NEW
# grows.
R10_FILL = [
    "streaming_incremental_rollup",
    "streaming_left_outer_join",
    "pack_sequences_greedy",
    "pii_redaction",
    "tfidf_top_terms",
][: 5 - len(R10_NEW)]

R10_WINDOW = R10_QUEUE + R10_NEW + R10_FILL


def test_first_50_is_the_intended_r10_window():
    assert len(R10_WINDOW) == 50
    assert list(entry.queries())[:50] == R10_WINDOW


# Deferred keys that MUST lead the r11 window: the r8-greens that did
# not fit the r10 window — their last green is 2 rounds old at r10
# close. The displaced fills (if any) rejoin at the FRONT in r8 order.
R11_QUEUE = [
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
    "versioned_delete_where",
    "versioned_cdc_stream",
    "versioned_partitioned_read",
    "multimodal_decode_jpeg",
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


def _r11_tail():
    """The r8-greens outside this round's window, in r8-window order —
    the tail the r11 rotation will consume."""
    in_window = set(R10_WINDOW)
    return [k for k in R11_QUEUE if k not in in_window]


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r08 or r09, is
    in this round's graded window, or is explicitly queued for the r11
    window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r08.json", "CORRECTNESS_r09.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R10_WINDOW) | set(R11_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r10 window (tail position)
    tail = _r11_tail()
    assert not set(tail) & set(list(entry.queries())[:50])
    # and the queue sits at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(tail):] == tail


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
