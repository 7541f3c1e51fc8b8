"""ALTER TABLE surface (r12): ADD COLUMN as a metadata-only commit
(completing the evolution family add/rename/drop/widen — 'add' was
previously only implicit via additive appends) and ADD/DROP
CONSTRAINT (the Delta CHECK-constraint commands: add validates the
existing head first; both are metadata-only)."""

from __future__ import annotations

import pytest

from social_media_etl_spark.operators.manifest import (
    ConcurrentWriteError,
    VersionedTable,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _files(t, v=None):
    return set(t._read_manifest(t.head_version() if v is None else v)["files"])


# ------------------------------------------------------------ add_column


def test_add_column_is_metadata_only_and_null_fills(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a"), (2, "b")])
    )
    v = t.add_column("score", "double")
    assert v == 1
    assert _files(t, 1) == _files(t, 0)  # zero files moved
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: None, 2: None}
    # time travel below the commit has no such column
    assert "score" not in t.read(0).columns
    # the new field minted a fresh id
    ids = t._read_pointer(1)["field_ids"]
    assert ids["score"] == max(ids.values())


def test_add_column_then_update_and_append(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a"), (2, "b")])
    )
    t.add_column("score", "double")
    t.update("k = 1", {"score": "9.5"})
    t.append(
        spark.createDataFrame([(3, "c", 1.0)], "k long, v string, score double")
    )
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 9.5, 2: None, 3: 1.0}


def test_add_column_refusals(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a")])
    )
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "string")
    with pytest.raises(ValueError, match="cannot parse type"):
        t.add_column("x", "not_a_type")
    t.rename_column("v", "w")
    with pytest.raises(ValueError, match="collides with a physical name"):
        t.add_column("v", "string")  # pre-rename alias still in footers
    t2 = VersionedTable.create(
        spark, str(tmp_path / "t2"), _df(spark, [(1, "a")])
    )
    t2.drop_column("v")
    with pytest.raises(ValueError, match="collides with a physical name"):
        t2.add_column("v", "string")  # tombstoned physical name


def test_add_column_skipped_by_change_feed(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a")])
    )
    t.add_column("score", "double")
    v = t.append(
        spark.createDataFrame([(2, "b", 3.0)], "k long, v string, score double")
    )
    feed = t.read_change_feed(0, v).collect()
    assert [(r["_change_type"], r["k"]) for r in feed] == [("insert", 2)]
    # read_changes' append-only diff also survives the metadata commit
    assert sorted(
        r["k"] for r in t.read_changes(0, v).collect()
    ) == [2]


# --------------------------------------------------------- constraints


def test_add_constraint_validates_existing_head(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a"), (-5, "b")])
    )
    with pytest.raises(Exception, match="k_pos"):
        t.add_constraint("k_pos", "k > 0")
    assert t.head_version() == 0  # nothing committed
    t.delete("k < 0")
    v = t.add_constraint("k_pos", "k > 0")
    assert t.constraints() == {"k_pos": "k > 0"}
    assert _files(t, v) == _files(t, v - 1)  # metadata-only


def test_added_constraint_enforced_by_later_commits(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a")])
    )
    t.add_constraint("k_pos", "k > 0")
    with pytest.raises(VersionedTable.ConstraintViolation):
        t.append(_df(spark, [(-1, "x")]))
    with pytest.raises(VersionedTable.ConstraintViolation):
        t.update("k = 1", {"k": "-9"})
    # NULL passes, SQL CHECK semantics
    t.append(_df(spark, [(None, "n")]))
    assert t.read().count() == 2


def test_add_constraint_records_feature_and_dv_applied(spark, tmp_path):
    """Vector-hidden rows must not count as violations — the check
    reads DV-applied."""
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a"), (-5, "b")])
    )
    t.delete("k < 0", mode="mor")  # -5 hidden by a vector, not gone
    v = t.add_constraint("k_pos", "k > 0")
    assert "constraints" in (t._read_pointer(v).get("features") or [])


def test_drop_constraint_stops_enforcement(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), _df(spark, [(1, "a")])
    )
    t.add_constraint("k_pos", "k > 0")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("typo")
    t.drop_constraint("k_pos")
    assert t.constraints() == {}
    t.append(_df(spark, [(-1, "x")]))  # no longer refused
    assert t.read().count() == 2


def test_alter_ops_stale_racing_dml(spark, tmp_path):
    """A predicate DML racing an add_constraint must raise, not
    rebase — the new CHECK changes what a valid commit means."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _df(spark, [(i, "x") for i in range(8)]),
    )
    t2 = VersionedTable(spark, t.path)
    real_commit = t._try_commit

    def racing(m, v):
        if m.get("op") == "delete" and not getattr(racing, "raced", False):
            racing.raced = True
            t2.add_constraint("k_small", "k < 1000")
        return real_commit(m, v)

    t._try_commit = racing
    try:
        with pytest.raises(ConcurrentWriteError):
            t.delete("k = 3")
    finally:
        t._try_commit = real_commit


def test_reserved_internal_names_refused_everywhere(spark, tmp_path):
    """ADVICE r12: '__smetl_dv_file', '__smetl_dv_pos', 'smetl_pt*'
    and '__s_hit' used to commit fine via add_column/rename and only
    fail confusingly on a LATER MoR read / partitioned write / merge.
    The guard now refuses at DDL time, shared by create too."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t = VersionedTable.create(spark, str(tmp_path / "t"), df)
    for bad in ("__smetl_dv_file", "__smetl_dv_pos", "smetl_pt",
                "smetl_pt3", "__s_hit"):
        with pytest.raises(ValueError, match="reserved"):
            t.add_column(bad, "string")
        with pytest.raises(ValueError, match="reserved"):
            t.rename_column("v", bad)
    # create refuses the same names up front
    bad_df = spark.createDataFrame(
        [(1, "x")], "k long, __smetl_dv_pos string"
    )
    with pytest.raises(ValueError, match="reserved"):
        VersionedTable.create(spark, str(tmp_path / "t2"), bad_df)
    # table unchanged: head still commits normally after the refusals
    assert t.add_column("fresh", "string") == 1
