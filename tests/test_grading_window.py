"""Pins the driver-grading contract of ``queries()``.

The driver grades only the FIRST 50 dict entries per round, so order
is load-bearing (round-2 postmortem: a mid-dict insertion silently
ejected keys from the window). These tests pin the intended round-13
window as a LITERAL list and assert the round-coverage union — every
declared key either hash-matched in CORRECTNESS_r11/r12, sits inside
this round's graded window, or is explicitly queued for round 14 — so
a driver-side sampling change or an accidental reorder is caught by
CI instead of inferred from stale comments (ADVICE r3).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# The r13 window head (VERDICT r12 ask #1): the 14 R13_QUEUE keys —
# last driver-graded at r9, 4 rounds old at r13 open, the staleness
# the r12 verdict names as the top structural item.
R13_HEAD = [
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

# Then the keys NEW in r13 (graded immediately — the vbkt-r11 /
# mor-r12 precedent): the SQL DML surface, VERDICT r12 ask #2.
R13_NEW = [
    "sql_merge_into",
    "sql_update_delete",
    "sql_copy_into_generated",
]

# Then the 33 oldest r10-greens in their standing dict order (their
# driver record turns 3 rounds old at r13 close).
R13_R10_BLOCK = [
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
]

R13_WINDOW = R13_HEAD + R13_NEW + R13_R10_BLOCK
assert len(R13_WINDOW) == 50

# The 14 r10-greens that did not fit the r13 window: their record
# turns 4 rounds old at r13 close, so they MUST lead the r14 window.
# Kept at the very end of the dict, ready to rotate.
R14_QUEUE = [
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


def test_first_50_is_the_intended_r13_window():
    assert list(entry.queries())[:50] == R13_WINDOW


def test_round_union_covers_every_key():
    """Every declared key has a green row in CORRECTNESS_r11 or r12,
    is in this round's graded window, or is explicitly queued for the
    r14 window — no key can be SILENTLY stranded ungraded."""
    green = set()
    for rec in ("CORRECTNESS_r11.json", "CORRECTNESS_r12.json"):
        data = json.loads((REPO / rec).read_text())
        green |= {k for k, v in data.items() if v.get("hash_match") is True}
    covered = green | set(R13_WINDOW) | set(R14_QUEUE)
    missing = set(entry.queries()) - covered
    assert not missing, f"keys stranded outside the grading union: {missing}"
    # the queued keys really are outside the r13 window...
    assert not set(R14_QUEUE) & set(list(entry.queries())[:50])
    # ...and sit at the very end of the dict, ready to rotate
    assert list(entry.queries())[-len(R14_QUEUE):] == R14_QUEUE


def test_every_key_has_an_oracle():
    """Zero no_oracle rows: every queries() key carries oracle SQL
    (pack_training_sequences was the last holdout, closed in r4)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, f"keys without oracle SQL: {missing}"
