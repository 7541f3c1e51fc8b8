"""Focused pins for the r16 optimization internals.

- the read-plan memo serves the SAME lazy plan for an unchanged
  (path, version), rebuilds after a new commit, and never skips the
  protocol feature gate;
- the light-committer write path produces no ``_SUCCESS`` markers in
  engine-owned directories while the manifest still lists every part
  file (the explicit-listing discovery the options rely on);
- ``_dir_num_rows`` counts real rows from footers and treats a missing
  dir as empty.
"""

from __future__ import annotations

import os

import pytest

from social_media_etl_spark.operators import manifest as m
from social_media_etl_spark.operators.manifest import (
    UnsupportedTableFeatureError,
    VersionedTable,
)


def _frame(spark, n=6):
    return spark.range(n).selectExpr("id", "id * 2 AS v")


def test_read_plan_memo_hits_same_version_and_misses_new_commit(
    spark, tmp_path
):
    t = VersionedTable.create(spark, str(tmp_path / "t"), _frame(spark))
    r1 = t.read()
    r2 = t.read()
    assert r1 is r2, "unchanged (path, version) must serve the memoized plan"
    t.append(_frame(spark, 3))
    r3 = t.read()
    assert r3 is not r1, "a new commit must build a new head plan"
    assert r3.count() == 9 and r1.count() == 6  # plans, never stale data


def test_read_plan_memo_does_not_bypass_feature_gate(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _frame(spark), generated={"g": "v + 1"}
    )
    t.read()  # populate the memo
    old = m.SUPPORTED_FEATURES
    m.SUPPORTED_FEATURES = frozenset(old - {"generated"})
    try:
        with pytest.raises(UnsupportedTableFeatureError, match="generated"):
            t.read()
    finally:
        m.SUPPORTED_FEATURES = old


def test_light_committer_writes_no_success_marker(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), _frame(spark))
    t.append(_frame(spark, 4))
    markers = [
        os.path.join(root, n)
        for root, _d, names in os.walk(str(tmp_path / "t"))
        for n in names
        if n == "_SUCCESS"
    ]
    assert markers == []
    manifest = t._read_manifest(1)
    assert len(manifest["files"]) > 0
    assert all(os.path.exists(f) for f in manifest["files"])
    assert t.read().count() == 10


def test_light_committer_conf_gate_restores_default(spark, tmp_path):
    spark.conf.set("spark.smetl.write.lightCommitter", "false")
    try:
        t = VersionedTable.create(spark, str(tmp_path / "t"), _frame(spark))
        markers = [
            n
            for root, _d, names in os.walk(str(tmp_path / "t"))
            for n in names
            if n == "_SUCCESS"
        ]
        assert markers, "default committer writes the _SUCCESS marker"
        assert t.read().count() == 6
    finally:
        spark.conf.unset("spark.smetl.write.lightCommitter")


def test_dir_num_rows_counts_footers_and_missing_dir_is_empty(
    spark, tmp_path
):
    t = VersionedTable.create(spark, str(tmp_path / "t"), _frame(spark, 7))
    ddir = os.path.dirname(t._read_manifest(0)["files"][0])
    assert t._dir_num_rows(ddir) == 7
    assert t._dir_num_rows(str(tmp_path / "nope")) == 0
