"""Dedup + similarity operator tests with planted near-duplicates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.operators import dedup, similarity

BASE = (
    "spark query engine reads parquet partitions and shuffles data across "
    "executors while catalyst optimizes the logical plan into physical stages"
)
NEAR = BASE.replace("shuffles", "moves")  # 1 word of ~20 changed
FAR = "cooking pasta requires boiling water salt and patience in the kitchen"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, BASE), (5, "tiny")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_keeps_first(docs):
    out = dedup.dedup_exact(docs, ["text"], ["doc_id"])
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 5]


def test_jaccard_pairs_finds_planted_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs  # planted near-dup
    assert all(3 not in p for p in pairs)  # unrelated doc absent


def test_jaccard_max_df_drops_hot_shingles(spark):
    # every doc shares the same hot shingle; max_df excludes it
    rows = [(i, f"common shingle here unique{i} a b") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    all_pairs = dedup.jaccard_pairs(df, "doc_id", "text", 3, 0.01)
    capped = dedup.jaccard_pairs(df, "doc_id", "text", 3, 0.01, max_df=2)
    assert all_pairs.count() > 0
    assert capped.count() == 0


def test_minhash_lsh_agrees_with_exact_on_planted(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", 3, num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    # verified-LSH returns no false positives, and catches the exact dup
    assert lsh <= exact
    assert (1, 4) in lsh


def test_simhash_pairs_candidate_quality(docs):
    out = dedup.simhash_pairs(docs, "doc_id", "text", bits=32, band_bits=8)
    cands = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert cands.get((1, 4)) == 0  # identical text → identical simhash


def test_simhash_table_matches_column_expression(spark, docs):
    from social_media_etl_spark.functions import text as TXT

    agg = {
        r["doc_id"]: r["sh"]
        for r in dedup.simhash_table(docs, "doc_id", "text", 32).collect()
    }
    expr = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", TXT.simhash("text", 32).alias("sh")
        ).collect()
    }
    assert agg == expr
    # token-less doc → fingerprint 0 on both paths
    empty = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
    assert dedup.simhash_table(empty, "doc_id", "text", 32).first()["sh"] == 0


def test_dedup_lines_global_first_occurrence_wins(spark):
    docs_df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),        # 'beta' seen in doc 1 → removed
            (3, "alpha\ngamma"),        # fully duplicate → empty text
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_kept_lines"], r["n_removed_lines"])
        for r in dedup.dedup_lines_global(docs_df).collect()
    }
    assert out[1] == ("alpha\nbeta\ngamma", 3, 0)  # first doc intact, order kept
    assert out[2] == ("delta", 1, 1)
    assert out[3] == ("", 0, 2)  # reassembled empty, row preserved


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 3)], "id_a long, id_b long"
    )
    want = {1: 1, 2: 1, 3: 1, 8: 1, 5: 5, 6: 5}
    # chain 1-2-3-8 collapses to min id 1 (transitive, not just direct
    # neighbors); driver union-find and distributed label propagation
    # (driver_threshold=0) must agree exactly
    for threshold in (1_000_000, 0):
        out = {
            r["node"]: r["component"]
            for r in dedup.connected_components(
                pairs, driver_threshold=threshold
            ).collect()
        }
        assert out == want, f"threshold={threshold}"


def test_component_threshold_conf_knob_and_memory_default(spark):
    """VERDICT r8 #7: driver_threshold=None resolves the session conf
    spark.smetl.dedup.driverComponentThreshold; without the conf the
    default derives from driver memory (capped at the old 1M constant,
    floored at 10k) instead of being a constant."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    want = {1: 1, 2: 1, 3: 1}
    key = "spark.smetl.dedup.driverComponentThreshold"
    spark.conf.set(key, "0")  # force the DISTRIBUTED path on 4 edges
    try:
        out = dedup.connected_components(pairs)
        # the distributed loop's output is a joined/propagated frame,
        # not a driver-side LocalTableScan
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LocalRelation" not in plan.splitlines()[0]
        assert {r["node"]: r["component"] for r in out.collect()} == want
    finally:
        spark.conf.unset(key)
    derived = dedup._driver_component_threshold(spark)
    assert 10_000 <= derived <= 1_000_000
    out2 = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert out2 == want


def test_dedup_by_components_keeps_representative(spark, docs):
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
    kept = dedup.dedup_by_components(docs, pairs, "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1,2,4 form one near-dup cluster → only 1 survives; 3 and 5 untouched
    assert ids == [1, 3, 5]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite
        (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector → NULL cosine
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.slow
def test_embedding_cosine_pairs(vecs):
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_cosine_pairs(vecs, "vec_id", "embedding", 0.95).collect()
    }
    assert list(out) == [(1, 2)]
    assert out[(1, 2)] > 0.99


@pytest.mark.slow
def test_embedding_cosine_pairs_refuses_large_all_pairs(vecs):
    """Same discipline as cosine_topk: the exact all-pairs baseline
    points the caller at the blocked/LSH scale paths above max_pairs."""
    with pytest.raises(ValueError, match="cosine_pairs_blocked"):
        dedup.embedding_cosine_pairs(
            vecs, "vec_id", "embedding", 0.5, max_pairs=3
        )
    assert (
        dedup.embedding_cosine_pairs(
            vecs, "vec_id", "embedding", 0.5, max_pairs=3, force=True
        ).count()
        >= 0
    )


@pytest.mark.slow
def test_cosine_topk_refuses_large_cross_join(vecs):
    """VERDICT r6: the exact baseline must not silently run an
    unbounded all-pairs join — above max_pairs it points the caller at
    the blocked/LSH/IVF scale paths unless force=True."""
    with pytest.raises(ValueError, match="cosine_topk_blocked"):
        similarity.cosine_topk(vecs, vecs, "vec_id", "embedding", max_pairs=3)
    # force opts back in; tiny input still computes fine
    assert (
        similarity.cosine_topk(
            vecs, vecs, "vec_id", "embedding", k=1, max_pairs=3, force=True
        ).count()
        > 0
    )


@pytest.mark.slow
def test_cosine_topk_exact(vecs):
    out = similarity.cosine_topk(
        vecs, vecs.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=3
    ).collect()
    ranked = [(r["neighbor_id"], r["rk"]) for r in out]
    assert ranked[0] == (2, 1)   # nearest
    assert ranked[1] == (3, 2)   # orthogonal beats opposite
    assert ranked[2] == (4, 3)
    # zero vector (NULL cosine) sorts last and is cut by k
    assert all(r["neighbor_id"] != 5 for r in out)


@pytest.mark.slow
def test_cosine_pairs_blocked_matches_expression_path(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(200)
    ] + [(999, [0.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expr = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_cosine_pairs(df, "vec_id", "embedding", 0.5).collect()
    }
    # block_size=64 forces multiple blocks incl. cross- and diagonal-block pairs
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.cosine_pairs_blocked(
            df, "vec_id", "embedding", 0.5, block_size=64
        ).collect()
    }
    assert expr.keys() == blocked.keys() and len(expr) > 0
    for k in expr:
        assert math.isclose(expr[k], blocked[k], abs_tol=1e-6)


@pytest.mark.slow
def test_cosine_topk_blocked_matches_exact(spark):
    import random

    rnd = random.Random(11)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 7)
    exact = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk(df, q, "vec_id", "embedding", k=4).collect()
    )
    blocked = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_blocked(
            df, q, "vec_id", "embedding", k=4, block_size=64
        ).collect()
    )
    assert exact == blocked


@pytest.mark.slow
def test_ann_ivf_recall_and_exactness_at_full_probe(spark):
    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in similarity.cosine_topk(df, q, "vec_id", "embedding", k=3).collect()
    }
    # full probe == exact search
    full = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in similarity.ann_ivf_topk(
            df, q, "vec_id", "embedding", k=3, n_cells=8, n_probe=8
        ).collect()
    }
    assert full == exact
    # partial probe: top-1 recall stays high (nearest cell usually holds it)
    part = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.ann_ivf_topk(
            df, q, "vec_id", "embedding", k=1, n_cells=8, n_probe=3
        ).collect()
    }
    top1 = {q_: n for (q_, rk), n in exact.items() if rk == 1}
    hits = sum(1 for q_, n in top1.items() if part.get(q_) == n)
    assert hits >= 5  # ≥5/8 top-1 recall at 3/8 probe


def test_ann_lsh_subset_of_bruteforce_quality(spark):
    import random

    rnd = random.Random(42)
    rows = []
    for i in range(100):
        v = [rnd.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
        if i < 5:  # plant a near-dup for each of the first 5
            rows.append((1000 + i, [x + rnd.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ann_lsh_topk(
        df,
        df.filter(F.col("vec_id") < 5),
        "vec_id",
        "embedding",
        k=1,
        bits=16,
        band_bits=4,
    ).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in out}
    hits = sum(1 for q, n in got.items() if n == 1000 + q)
    assert hits >= 4  # high recall on planted near-dups


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 60-node chain needs ~60 propagate-only rounds; pointer jumping
    must finish it in far fewer (O(log n)) — and an impossibly low
    max_iter must RAISE, never return wrong labels silently."""
    import pytest

    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            pairs, driver_threshold=0, max_iter=10
        ).collect()
    }
    assert out == {i: 0 for i in range(n + 1)}
    with pytest.raises(RuntimeError, match="no fixed point"):
        dedup.connected_components(pairs, driver_threshold=0, max_iter=1)


def test_benchmark_overlap_flags_contaminated_doc(spark):
    """A corpus doc that contains a benchmark passage verbatim gets a
    high overlap fraction and the contaminated flag; unrelated docs
    keep overlap 0 and STAY in the output (left-join semantics)."""
    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text the quick brown fox jumps over the lazy dog tonight and more"),
            (2, "completely unrelated words about spark physical plans here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.benchmark_overlap(
            corpus, bench, n=5, flag_fraction=0.5
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["overlap_frac"] > 0.5
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
    assert out[2]["overlap_frac"] == 0.0


def test_benchmark_overlap_broadcasts_benchmark_side(spark):
    """The benchmark gram set must broadcast — a shuffle join against
    the corpus gram index would add a corpus-wide exchange."""
    bench = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    plan = dedup.benchmark_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_duplicate_span_stats_flags_shared_boilerplate(spark):
    from social_media_etl_spark.operators.dedup import duplicate_span_stats

    boiler = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [
        (1, boiler + " unique tail alpha beta gamma delta epsilon zeta"),
        (2, boiler + " different ending words here now for doc two"),
        (3, "totally fresh text with eight plus distinct tokens only once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicate_span_stats(df).collect()}
    # docs 1 and 2 share exactly the one boilerplate window
    assert got[1]["n_dup_spans"] == 1 and got[2]["n_dup_spans"] == 1
    assert got[3]["n_dup_spans"] == 0 and got[3]["dup_frac"] == 0.0
    # window arithmetic: n_tokens - 7 spans per doc (doc 1 has 16 tokens)
    assert got[1]["n_spans"] == 16 - 7


def test_duplicate_span_stats_counts_intra_doc_repeats(spark):
    from social_media_etl_spark.operators.dedup import duplicate_span_stats

    text = " ".join(["a b c d e f g h"] * 2)  # the 8-gram repeats inside
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = duplicate_span_stats(df).collect()[0]
    assert got["n_dup_spans"] >= 2  # both occurrences count as duplicated


def test_duplicate_span_stats_skips_short_docs(spark):
    from social_media_etl_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [(1, "only seven tokens in this doc here")], "doc_id long, text string"
    )
    assert duplicate_span_stats(df).count() == 0


@pytest.mark.slow
def test_ivf_distributed_trainer_full_probe_is_exact(spark):
    """trainer='distributed' (full-corpus Lloyd via
    operators/clustering.py) must give the same exactness guarantee:
    probing every cell == brute-force search, regardless of which
    quantizer trained the cells."""
    import random

    rnd = random.Random(5)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 6)
    exact = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in similarity.cosine_topk(df, q, "vec_id", "embedding", k=3).collect()
    }
    idx = similarity.ivf_build(
        df, "vec_id", "embedding", n_cells=6, trainer="distributed"
    )
    got = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in similarity.ivf_search(
            idx, q, k=3, n_probe=6
        ).collect()
    }
    idx.unpersist()
    assert got == exact


def test_int8_quantization_roundtrip_error_bound(spark):
    from social_media_etl_spark.functions import vectors as V

    rows = [
        (1, [0.0, 1.0, 0.5, -1.0]),
        (2, [3.0, 3.0, 3.0, 3.0]),  # constant vector → scale 0, codes 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = F.col("embedding")
    out = df.select(
        "vec_id",
        V.int8_scale(v).alias("scale"),
        V.uint8_codes(v).alias("codes"),
        F.array_min(v).alias("lo"),
        v.alias("v"),
    )
    recon = V.int8_dequantize(F.col("codes"), F.col("lo"), F.col("scale"))
    got = {
        r["vec_id"]: r
        for r in out.select(
            "vec_id",
            "scale",
            "codes",
            F.array_max(
                F.zip_with(F.col("v"), recon, lambda a, b: F.abs(a - b))
            ).alias("max_err"),
        ).collect()
    }
    # range [-1, 1]: min→code 0, max→code 255, error ≤ scale/2
    assert got[1]["codes"][3] == 0 and got[1]["codes"][1] == 255
    assert got[1]["max_err"] <= got[1]["scale"] / 2 + 1e-12
    # constant vector: zero scale, all-zero codes, exact reconstruction
    assert got[2]["scale"] == 0.0
    assert got[2]["codes"] == [0, 0, 0, 0]
    assert got[2]["max_err"] == 0.0


# -- r8 review fixes ----------------------------------------------------------


def test_jaccard_max_df_sizes_use_filtered_universe(spark):
    """With the hot-shingle cap active, sizes AND intersection come
    from the same filtered index — a pair sharing hot shingles scores
    exact Jaccard over the rare universe instead of being silently
    underestimated (r8 review)."""
    # 4 docs share the hot shingle source ('x0 x1 x2' appears in all);
    # docs 1 and 2 additionally share all their rare shingles
    rows = [
        (1, "x0 x1 x2 a b c d"),
        (2, "x0 x1 x2 a b c d"),
        (3, "x0 x1 x2 p q r s"),
        (4, "x0 x1 x2 t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.99, max_df=3
        ).collect()
    }
    # docs 1,2 are identical: over the filtered (rare) universe their
    # jaccard is exactly 1.0; the old unfiltered-size denominator gave
    # 4/(5+5-4) = 0.667 and dropped the pair
    assert got == {(1, 2): 1.0}


def test_connected_components_string_ids_small_graph(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    comp = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dedup_lines_global_regex_metachar_separator(spark):
    df = spark.createDataFrame(
        [(1, "keep.me"), (2, "keep.me")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["text"], r["n_kept_lines"])
        for r in dedup.dedup_lines_global(df, sep=".").collect()
    }
    # '.' splits on the literal dot, not on every character
    assert out[1] == ("keep.me", 2)
    assert out[2] == ("", 0)  # both its lines were seen in doc 1


def test_minhash_lsh_accepts_public_signature_frame(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again"),
            (3, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signature(docs, "doc_id", "text", num_hashes=32)
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, signatures=sigs
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_benchmark_overlap_keeps_short_documents(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "too short"),  # < n tokens -> zero grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
        for r in dedup.benchmark_overlap(corpus, bench, n=5).collect()
    }
    assert out[1][0] > 0 and out[1][2] is True
    assert out[2] == (0, 0, False)  # short doc present, clean


@pytest.mark.slow
def test_cosine_topk_excludes_zero_norm_pairs(spark):
    from social_media_etl_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero vector: undefined cosine
        ],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.cosine_topk(emb, emb.filter("vec_id = 0"), k=5).collect()
    assert all(r["cosine"] is not None for r in rows)
    assert sorted(r["neighbor_id"] for r in rows) == [1]  # no filler row


def test_component_threshold_parses_suffixless_memory_as_mib():
    """ADVICE r9: Spark reads a suffix-less ``spark.driver.memory``
    value as MiB; parsing '2048' as BYTES hit the 10k floor and
    flipped medium edge sets onto the distributed loop the repo's own
    bench records as 3.6x slower. '2048' must equal '2g'."""

    class _Conf:
        def __init__(self, mem):
            self._m = mem

        def get(self, key, default=None):
            if key == "spark.driver.memory":
                return self._m
            return default

    class _S:
        def __init__(self, mem):
            self.conf = _Conf(mem)

    assert dedup._driver_component_threshold(
        _S("2048")
    ) == dedup._driver_component_threshold(_S("2g"))
    assert dedup._driver_component_threshold(_S("2048")) > 10_000
