"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-5
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r03/r04, sits inside
this round's graded window, or is explicitly queued for round 6 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The intended round-5 grading window, in order: the 3 keys added after
# the r4 window filled (never driver-graded), the 3 new r5 keys, then
# the first 44 of the 49 keys whose last green is CORRECTNESS_r03.
R5_WINDOW = [
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


def test_first_50_is_the_intended_r5_window():
    assert list(entry.queries())[:50] == R5_WINDOW


# Deferred keys that MUST lead the r6 window: the never-graded r5
# addition first, then the r03-green keys that did not fit the r5
# window (50-slot budget).
R6_QUEUE = [
    "zorder_layout_roundtrip",
    "corpus_shuffle",
    "gopher_quality_flags",
    "semantic_dedup_representatives",
    "bpe_pair_counts",
    "embedding_label_centroids",
    "source_mixing_weights",
]


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r03 or r04, is
    in this round's graded window, or is explicitly queued for the r6
    window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r03.json", "CORRECTNESS_r04.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R5_WINDOW) | set(R6_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r5 window (tail position)
    assert not set(R6_QUEUE) & set(list(entry.queries())[:50])
    # and the queue sits at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R6_QUEUE):] == R6_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
