"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["l_orderkey", "n_items"]


def test_queries_and_oracles_aligned(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name  # builds a plan with a real schema


def test_events_ts_matches_parquet_footer(spark, sf_dir):
    """Drift guard: the engine's loaded min/max(ts) must equal pyarrow's
    read of the same file. The driver regenerated events.parquet from
    TIMESTAMP(NANOS) to timestamp[us] between rounds 1 and 2, which
    silently compressed the timeline 1000x under the then-hardcoded
    div-1000 conversion (VERDICT r2 root cause of 6 red queries). This
    fails if catalog.load_table's footer-sniffed conversion ever drifts
    from the physical unit again."""
    import os

    import pyarrow.parquet as pq

    from social_media_etl_spark.catalog import load_table

    path = os.path.join(sf_dir, "events.parquet")
    tbl = pq.read_table(path, columns=["ts"])
    # pyarrow min/max over the raw column, normalized to epoch micros
    import pyarrow.compute as pc

    ts = tbl.column("ts")
    unit = ts.type.unit
    scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1 / 1000}[unit]
    raw_min = pc.min(ts).cast("int64").as_py()
    raw_max = pc.max(ts).cast("int64").as_py()
    exp_min = int(raw_min * scale)
    exp_max = int(raw_max * scale)

    from pyspark.sql import functions as F

    row = (
        load_table(spark, sf_dir, "events")
        .agg(
            F.min(F.unix_micros("ts")).alias("mn"),
            F.max(F.unix_micros("ts")).alias("mx"),
        )
        .collect()[0]
    )
    assert row["mn"] == exp_min, (row["mn"], exp_min, unit)
    assert row["mx"] == exp_max, (row["mx"], exp_max, unit)
