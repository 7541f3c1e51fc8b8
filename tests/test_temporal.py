"""As-of join and range join operator tests."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.operators.temporal import asof_join, range_join


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(5), 100.0),
            (2, "A", _ts(10), 101.0),
            (3, "B", _ts(7), 50.0),
            (4, "B", _ts(1), 49.0),  # before any quote → no match
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(4), 99.5),
            ("A", _ts(5), 99.9),   # equal-ts to trade 1
            ("A", _ts(9), 100.5),
            ("B", _ts(6), 48.0),
            ("B", _ts(6), 48.5),   # tie at same ts → dedup keeps max bid
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        right_values=["bid"],
    )
    got = {r["trade_id"]: (r["asof_ts"], r["asof_bid"]) for r in out.collect()}
    assert got[1] == (_ts(5), 99.9)    # equal ts matches (inclusive)
    assert got[2] == (_ts(9), 100.5)
    assert got[3] == (_ts(6), 48.5)    # tie deduped to max first value col
    assert got[4] == (None, None)      # nothing at-or-before → NULLs


def test_asof_backward_strict(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        right_values=["bid"], strict=True,
    )
    got = {r["trade_id"]: r["asof_bid"] for r in out.collect()}
    assert got[1] == 99.5              # equal ts excluded → previous quote


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        right_values=["bid"], direction="forward",
    )
    got = {r["trade_id"]: (r["asof_ts"], r["asof_bid"]) for r in out.collect()}
    assert got[1] == (_ts(5), 99.9)    # inclusive equal ts
    assert got[2] == (None, None)      # no quote at-or-after minute 10
    assert got[4] == (_ts(6), 48.5)    # next quote ahead


def test_asof_preserves_all_left_rows_and_columns(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        right_values=["bid"],
    )
    assert out.count() == trades.count()
    assert set(trades.columns) <= set(out.columns)


def test_range_join_bands(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 10.0), (4, 45.0)], "id long, qty double"
    )
    bands = spark.createDataFrame(
        [(0, 0, 10), (1, 10, 20), (2, 20, 50)], "band long, lo long, hi long"
    )
    out = range_join(
        facts,
        bands,
        conditions=[facts["qty"] > bands["lo"], facts["qty"] <= bands["hi"]],
        broadcast_right=True,
    ).select("id", "band")
    got = dict((r["id"], r["band"]) for r in out.collect())
    assert got == {1: 0, 2: 1, 3: 0, 4: 2}  # boundary 10.0 → lower band


def test_asof_join_empty_right_values(spark):
    """dedup_right with no value columns must not crash; the matched
    asof timestamp alone comes back (r8 review: IndexError before)."""
    from social_media_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 90), (1, 90), (1, 95)], "k long, qts long"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="qts", right_values=[]
    ).collect()
    assert len(out) == 1 and out[0]["asof_qts"] == 95


def test_range_join_refuses_empty_conditions(spark):
    from social_media_etl_spark.operators.temporal import range_join

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="cartesian"):
        range_join(df, df, conditions=[])
