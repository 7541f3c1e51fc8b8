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
