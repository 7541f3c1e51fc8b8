"""Text-analysis function tests on crafted multilingual fixtures
(the testdata `lang` column is a synthetic label, so language ID is
validated here on real-ish sentences)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from social_media_etl_spark.functions import text as TXT


def _one(spark, text, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokens_and_count(spark):
    df = spark.createDataFrame(
        [("Hello  World foo",), ("",), ("   ",), ("one",)], "text string"
    )
    out = df.select(TXT.token_count("text").alias("n")).collect()
    assert [r["n"] for r in out] == [3, 0, 0, 1]


def test_ngrams_udtf_lateral_matches_expression_path(spark):
    """The Python UDTF in LATERAL position returns the same n-grams as
    the pure-expression word_shingles (minus the distinct)."""
    from social_media_etl_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["pos"]): r["ngram"]
        for r in spark.sql(
            "SELECT d.doc_id, g.pos, g.ngram "
            "FROM udtf_docs d, LATERAL ngrams(d.text, 2) g"
        ).collect()
    }
    assert got == {
        (1, 0): "a b",
        (1, 1): "b c",
        (1, 2): "c d",
        (2, 0): "x y",
    }
    # expression path agrees on the distinct gram set
    expr = {
        (r["doc_id"], tuple(r["s"]))
        for r in df.select("doc_id", TXT.word_shingles("text", 2).alias("s")).collect()
    }
    assert {(1, ("a b", "b c", "c d")), (2, ("x y",)), (3, ())} == expr


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [
            ("Hello, world!",),   # Hello | , | _world | !
            ("it's 2024 now",),   # it | 's | _2024 | _now  (+1 space run? no: ' ?\\p{N}+' eats the space)
            ("",),
        ],
        "text string",
    )
    out = [r["n"] for r in df.select(TXT.bpe_ish_token_count("text").alias("n")).collect()]
    assert out[0] == 4
    assert out[1] == 4
    assert out[2] == 0
    # always at least the whitespace-token count for word-y text
    df2 = spark.createDataFrame([("plain words only here",)], "text string")
    n_ws = df2.select(TXT.token_count("text").alias("n")).first()["n"]
    n_bpe = df2.select(TXT.bpe_ish_token_count("text").alias("n")).first()["n"]
    assert n_bpe >= n_ws


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    out = df.select(TXT.word_shingles("text", 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []


def test_lang_id_heuristic(spark):
    rows = [
        ("the cat is on the mat and it is happy", "en"),
        ("le chat est sur la table et il est content", "fr"),
        ("el gato es feliz y los perros en la casa", "es"),
        ("der Hund ist nicht auf die Katze und das Haus", "de"),
        ("zzz qqq xxx", "unknown"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    out = [r["l"] for r in df.select(TXT.lang_id("text").alias("l")).collect()]
    assert out == [want for _, want in rows]


def test_quality_score_orders_sensibly(spark):
    good = "this is a reasonably long document with varied words " * 3
    bad = "!!! ??? ... 123 456 789 ,,, ;;;"
    df = spark.createDataFrame([(good,), (bad,)], "text string")
    q = [r["q"] for r in df.select(TXT.quality_score("text").alias("q")).collect()]
    assert q[0] > q[1]
    assert 0 <= q[1] <= q[0] <= 1


def test_fingerprint_deterministic_and_discriminative(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a b c",), ("a b d",)], "text string"
    )
    fps = [r["f"] for r in df.select(TXT.fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_simhash_near_dup_close_hamming(spark):
    base = "spark window batch agg join filter scan shuffle sort merge " * 4
    near = base.replace("sort", "order", 1)
    far = "completely different content about cooking pasta recipes tonight"
    df = spark.createDataFrame([(base,), (near,), (far,)], "text string")
    hs = [r["h"] for r in df.select(TXT.simhash("text", 32).alias("h")).collect()]

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(hs[0], hs[1]) < ham(hs[0], hs[2])
    assert ham(hs[0], hs[1]) <= 6


def test_pii_redaction_counts_and_output(spark):
    from social_media_etl_spark.functions import text as TXT

    df = spark.createDataFrame(
        [
            (1, "reach me at bob.smith+x@mail.co or https://ex.io/a?b=1"),
            (2, "call 555-123-4567 or +1 555-123-4567, server 10.0.0.1"),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    counts = TXT.pii_counts("text")
    out = {
        r["id"]: (r["e"], r["u"], r["p"], r["i"], r["red"])
        for r in df.select(
            "id",
            counts["email"].alias("e"),
            counts["url"].alias("u"),
            counts["phone"].alias("p"),
            counts["ipv4"].alias("i"),
            TXT.redact_pii("text").alias("red"),
        ).collect()
    }
    assert out[1][:4] == (1, 1, 0, 0)
    assert out[2][:4] == (0, 0, 2, 1)
    assert out[3][:4] == (0, 0, 0, 0)
    assert "bob.smith" not in out[1][4] and "ex.io" not in out[1][4]
    assert out[2][4].count("<PII>") == 3
    assert out[3][4] == "nothing sensitive here"


@pytest.mark.slow
def test_simhash_64_bit_and_explicit_empty_stopwords(spark):
    """r8 review: bits=64 used to overflow LongType on the sign-bit
    weight; an explicitly empty stopword tuple used to silently swap
    in the English list."""
    from social_media_etl_spark.functions import text as TXT

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog",)], "id long, text string"
    )
    row = df.select(
        TXT.simhash("text", 64).alias("h64"),
        TXT.simhash("text", 32).alias("h32"),
        TXT.stopword_ratio(F.col("text"), stopwords=()).alias("r_none"),
        TXT.stopword_ratio(F.col("text")).alias("r_en"),
    ).collect()[0]
    assert isinstance(row["h64"], int)
    assert row["h64"] != row["h32"]
    assert row["r_none"] == 0.0
    assert row["r_en"] > 0.0


def test_simhash_bits_validation(spark):
    import pytest

    from social_media_etl_spark.functions import text as TXT

    with pytest.raises(ValueError, match="bits"):
        TXT.simhash("text", 65)
