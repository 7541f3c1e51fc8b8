"""Whole-surface plan invariants: every declared query, one sweep.

The per-query tests in test_plans.py pin specific shapes; this sweep
asserts the two things that must hold EVERYWHERE at 100 TB:
no unbounded cartesian product, and no row-at-a-time SCALAR Python UDF
(Arrow-batched mapInPandas/applyInPandas plus the one deliberate
lateral Python UDTF are the only Python nodes the engine permits)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from scripts.audit_plans import audit

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_no_cartesian_or_row_udf_anywhere(spark):
    results = audit(spark, SF)
    assert len(results) == len(entry.queries())
    offenders = {
        name: v
        for name, v in results.items()
        if v["cartesian"] or v["row_udf"]
    }
    assert not offenders, offenders
    # the lateral Python UDTF appears exactly where declared, nowhere else
    assert {k for k, v in results.items() if v["udtf"]} == {"udtf_ngrams_count"}


@pytest.mark.slow
def test_single_partition_exchanges_are_known(spark):
    """Single-partition exchanges only where a scalar/gate/deliberate
    global window justifies them — a new one appearing in a query that
    had none is a plan regression to explain, not silently accept."""
    results = audit(spark, SF)
    with_sp = {k for k, v in results.items() if v["single_partition"]}
    allowed = {
        # scalar aggregates / scalar-threshold subqueries
        "blog_c_longest_text", "q6_forecast_revenue", "q11_important_parts",
        "q14_promo_share", "q15_top_supplier", "q17_small_qty_revenue",
        "q19_banded_revenue", "q22_idle_rich_customers",
        "approx_distinct_sketch_rollup", "table_profile_orders",
        "tfidf_top_terms", "unigram_logprob_quality", "set_ops_priority_custs",
        "source_mixing_weights", "blog_a_most_active", "funnel_conversion",
        # n_min: one-row global min over the tiny per-source count agg,
        # broadcast back — the rate anchor, not a data-path collapse
        "smoothed_mixture_sample",
        # codec-corpus width is DATA-DERIVED (r16: one task per ~512
        # docs, capped at cluster parallelism) — below 512 docs the
        # right width IS 1 (per-task Python-worker startup outweighs
        # the codec compute; measured inverted 8-vs-32-core scaling
        # before the change). At real scale the cap binds and the
        # exchange is never single-partition.
        "multimodal_audio_features", "multimodal_decode_images",
        "multimodal_frame_sample",
        # one-row verification gates (_approx_gate / HLL profile gate)
        "approx_quantiles_gated", "dedup_minhash_lsh", "dedup_simhash",
        "ann_lsh_topk", "ann_ivf_topk", "table_profile_orders_approx",
        # documented deliberate global-order window / tiny repartition(1)
        "customer_value_deciles", "embedding_neardup",
        # scalar N = |V| aggregate, broadcast back as the rank base —
        # one row, not a data-path collapse (operators/graph.py)
        "pagerank_trade_graph",
        # scalar token-count + one-row CMS accuracy gate / vocab-size
        # scalar / 256-row bucket-offset cumsum + scalar KS max — all
        # bounded, never corpus-sized frames
        "cms_heavy_hitters", "bigram_logprob_quality", "ks_drift_events",
        # scalar event-count + one-row CMS gate over the streamed sketch
        "streaming_cms_topk",
        # scalar corpus-token-count broadcast as the KL's q denominator
        "source_token_kl",
        # scalar N + one-row chi-square output over the 20-cell grid
        "chi2_type_value_band",
        # one-row Pearson-r scalar aggregate over the aligned series
        "hourly_corr_click_purchase",
        # one-row time-travel certification gate (cert count vs base
        # count) over the versioned table's v0 snapshot
        "versioned_table_history",
        # same one-row v0 byte-identity gate over the pre-evolution /
        # pre-overwrite snapshot (the head aggregate stays distributed)
        "versioned_schema_evolution", "versioned_overwrite_refresh",
        # three one-row count scalars feeding the split-exactness gate
        # (|Δ01|+|Δ12|=|Δ02|); the incremental read itself is
        # distributed over the appended files
        "versioned_incremental_read",
        # one-row planted-pair recall gate over the phash/audio-fp
        # pipelines
        "image_phash_neardup", "audio_fingerprint_neardup",
        # one-row reconstruction-error gate over the int8 grid
        "embedding_int8_quantize",
        # one-row v0 byte-identity gate after the copy-on-write delete
        # (the head aggregate stays distributed)
        "versioned_delete_where",
        # two one-row gates: drained-equals-head certification counts
        # and the batch-count/replay check over the CDC sink
        "versioned_cdc_stream",
        # one-row ±2 roundtrip-tolerance gate over the JPEG corpus
        "multimodal_decode_jpeg",
        # one-row v0 byte-identity gate after the MoR delete / the
        # 3-batch MERGE replay / the MoR MERGE (head aggregates stay
        # distributed)
        "versioned_mor_delete", "versioned_merge_into",
        "versioned_mor_merge",
        # one-row CDF replay-invariant gate (max|Σweights| over the
        # per-key multiset check; the head aggregate stays distributed)
        "versioned_restore",
        # two one-row census aggregates (IS NULL / IS NOT NULL scan
        # counts) unioned — bounded output, never a data-path collapse
        "versioned_null_skipping",
        # one-row pre-rename v0 byte-identity gate (the head aggregate
        # over the alias-resolving read stays distributed)
        "versioned_column_rename",
        # one-row commit-coverage gate (countDistinct == 3) over the
        # change feed (the feed scan + aggregate stay distributed)
        "versioned_change_feed", "streaming_change_feed",
        # one-row pre-drop v0 byte-identity gate (the head aggregate
        # over the tombstone-hiding read stays distributed)
        "versioned_column_drop",
        # one-row commit-coverage gate (countDistinct == 1) over the
        # upsert's CDC feed (scan + aggregate stay distributed)
        "versioned_upsert_change_feed", "streaming_upsert_change_feed",
        # same gate over the overwrite's recorded images
        "versioned_overwrite_change_feed",
    }
    assert with_sp <= allowed, with_sp - allowed
