"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-11
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r09/r10, sits inside
this round's graded window, or is explicitly queued for round 12 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The r11 window head (VERDICT r10 asks #1/#2): versioned_bucketed_join
# MUST lead — it is the only key never driver-green (the r10 red row,
# re-certified this round with exact decimal sums on both engines) —
# followed by the keys NEW in r11 (asks #7/#8).
R11_HEAD = [
    "versioned_bucketed_join",
    "versioned_column_drop",  # ask #7: DROP on the mapping layer
    "versioned_upsert_change_feed",  # ask #8: CDC across an upsert
    "streaming_upsert_change_feed",  # ask #8: its streaming twin
]

# The 50-key R11_QUEUE pinned by the r10 round (r8-greens whose record
# turned 2 rounds old at r10 close). With 4 head keys only the first
# 46 fit; the displaced tail slips to the R12_QUEUE below.
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
]

R11_WINDOW = R11_HEAD + R11_QUEUE
assert len(R11_WINDOW) == 50

# Deferred keys that MUST lead the r12 window: the r8-greens the 4
# head keys displaced — their last green turns 3 rounds old at r11
# close. Kept in r8-window order.
R12_QUEUE = [
    "embedding_label_centroids",
    "source_mixing_weights",
    "compaction_roundtrip",
    "upsert_events_latest",
]

# Keys ADDED in r11 after the window was pinned — never graded, so
# they must ALSO lead the r12 window (before the stale greens above,
# the vbkt-r11 precedent). Kept at the very end of the dict for now.
R12_NEW = [
    "versioned_overwrite_change_feed",
    "versioned_restore",
    "versioned_shallow_clone",
    "versioned_bloom_lookup",
    "versioned_null_skipping",
    "versioned_type_widening",
    "versioned_merge_by_source",
]


def test_first_50_is_the_intended_r11_window():
    assert list(entry.queries())[:50] == R11_WINDOW


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r09 or r10,
    is in this round's graded window, or is explicitly queued for the
    r12 window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r09.json", "CORRECTNESS_r10.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R11_WINDOW) | set(R12_QUEUE) | set(R12_NEW)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r11 window...
    tail = R12_QUEUE + R12_NEW
    assert not set(tail) & set(list(entry.queries())[:50])
    # ...and sit at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(tail):] == tail


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
