"""Chunking, corpus stats, and Gopher-style quality gate tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.operators import chunking


def _doc(n: int) -> str:
    return " ".join(f"w{i}" for i in range(n))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, _doc(100)), (2, _doc(64)), (3, _doc(10)), (4, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_counts_and_overlap(docs):
    out = chunking.chunk_documents(docs, chunk_tokens=64, overlap=16)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 tokens → starts 0, 48 (chunk2 = tokens 48..99, 52 tokens)
    assert [r["n_chunk_tokens"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])] == [64, 52]
    # exactly window-sized → one chunk
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [64]
    # short doc → one partial chunk
    assert [r["n_chunk_tokens"] for r in by_doc[3]] == [10]
    # empty doc → no chunks
    assert 4 not in by_doc
    # consecutive chunks overlap by exactly 16 tokens
    c0, c1 = (
        r["chunk_text"].split() for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    )
    assert c0[-16:] == c1[:16]


def test_chunks_cover_document_exactly(docs):
    """De-overlapped chunk concatenation reconstructs the token stream."""
    out = chunking.chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = sorted(
        (r for r in out.collect() if r["doc_id"] == 1),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = rows[0]["chunk_text"].split()
    for r in rows[1:]:
        rebuilt += r["chunk_text"].split()[16:]
    assert rebuilt == _doc(100).split()


def test_top_words_deterministic_ranks(spark):
    df = spark.createDataFrame(
        [("b a a",), ("c b a",), ("",)], "text string"
    )
    out = [(r["rank"], r["word"], r["n"]) for r in chunking.top_words(df, k=3).collect()]
    assert out == [(1, "a", 3), (2, "b", 2), (3, "c", 1)]


def test_gopher_quality_gates(spark):
    good = "this corpus sentence has reasonable words and enough tokens here"
    short = "too short"
    symbols = "ok tokens here but ###### @@@@@@ %%%%%% $$$$$$ ambient noise"
    dups = "\n".join(["same line"] * 8 + ["unique one", "unique two"])
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, dups)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunking.gopher_quality(df).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_token_count"] and not out[2]["keep"]
    assert not out[3]["ok_symbol_ratio"] and not out[3]["keep"]
    assert not out[4]["ok_dup_lines"] and not out[4]["keep"]
