"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-14
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r12/r13, sits inside
this round's graded window, or is explicitly queued for round 15 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The r14 window head (VERDICT r13 ask #1): the 14 R14_QUEUE keys —
# last driver-graded at r10, 4 rounds old at r14 open, the staleness
# the rotation exists to cap.
R14_HEAD = [
    "token_budget_curation",
    "funnel_conversion",
    "streaming_full_outer_join",
    "formats_roundtrip",
    "skew_salted_agg_events",
    "skew_salted_join_events",
    "bucketed_join_priority_revenue",
    "streaming_dedup_events",
    "streaming_sliding_windows",
    "streaming_static_join",
    "versioned_multipart_read",
    "versioned_column_rename",
    "versioned_change_feed",
    "streaming_change_feed",
]

# Then the keys NEW in r14 (graded immediately — the vbkt-r11 /
# mor-r12 / sqldml-r13 precedent): SQL CREATE TABLE/CTAS and the
# INSERT/ALTER DDL chain, VERDICT r13 asks #2-#3.
R14_NEW = [
    "sql_create_table_pipeline",
    "sql_insert_alter",
]

# Then the 34 oldest r11-greens in their standing dict order (their
# driver record turns 3 rounds old at r14 close).
R14_R11_BLOCK = [
    "versioned_bucketed_join",
    "versioned_column_drop",
    "versioned_upsert_change_feed",
    "streaming_upsert_change_feed",
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
]

R14_WINDOW = R14_HEAD + R14_NEW + R14_R11_BLOCK
assert len(R14_WINDOW) == 50

# The 16 r11-greens that did not fit the r14 window: their record
# turns 4 rounds old at r14 close, so they MUST lead the r15 window.
# Kept at the very end of the dict, ready to rotate.
R15_QUEUE = [
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


def test_first_50_is_the_intended_r14_window():
    assert list(entry.queries())[:50] == R14_WINDOW


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r12 or r13,
    is in this round's graded window, or is explicitly queued for the
    r15 window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r12.json", "CORRECTNESS_r13.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R14_WINDOW) | set(R15_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r14 window...
    assert not set(R15_QUEUE) & set(list(entry.queries())[:50])
    # ...and sit at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R15_QUEUE):] == R15_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
