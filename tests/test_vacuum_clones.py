"""Source-vacuum clone safety (VERDICT r11 #4): ``clone()`` registers
a back-pointer at the source, and the source's ``vacuum`` treats every
live clone's snapshot as a liveness root — shared data files survive
until the clone itself is deleted. ``vacuum(dry_run=True)`` lists what
a real run would sweep without deleting."""

from __future__ import annotations

import shutil

from social_media_etl_spark.operators.manifest import VersionedTable


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "k long, v string"
    )


def test_clone_registers_back_pointer(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    t.clone(str(tmp_path / "c1"))
    reg = list((tmp_path / "src" / "_clones").glob("c-*.json"))
    assert len(reg) == 1


def test_source_vacuum_keeps_clone_shared_files(spark, tmp_path):
    """The exact footgun: overwrite the source past the clone point,
    vacuum aggressively — the clone must still read."""
    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    c = t.clone(str(tmp_path / "c1"))
    # source moves on: the clone's snapshot is no longer in keep_last
    t.overwrite(_df(spark, 100, 110))
    t.overwrite(_df(spark, 200, 210))
    removed = t.vacuum(keep_last=1, min_age_seconds=0)
    assert isinstance(removed, int)
    # the clone still reads its full snapshot through shared files
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))
    # and the source head is untouched
    assert sorted(r["k"] for r in t.read().collect()) == list(range(200, 210))


def test_vacuum_sweeps_after_clone_deleted(spark, tmp_path):
    """A vanished clone's registration auto-expires, releasing the
    shared snapshot for the next sweep."""
    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    t.clone(str(tmp_path / "c1"))
    t.overwrite(_df(spark, 100, 110))
    assert t.vacuum(keep_last=1, min_age_seconds=0) == 0  # clone roots v0
    shutil.rmtree(tmp_path / "c1")
    removed = t.vacuum(keep_last=1, min_age_seconds=0)
    assert removed >= 1  # v0's data dir finally swept
    assert not list((tmp_path / "src" / "_clones").glob("c-*.json"))
    assert sorted(r["k"] for r in t.read().collect()) == list(
        range(100, 110)
    )


def test_vacuum_dry_run_lists_without_deleting(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    t.overwrite(_df(spark, 100, 110))
    t.overwrite(_df(spark, 200, 210))
    would = t.vacuum(keep_last=1, min_age_seconds=0, dry_run=True)
    assert isinstance(would, list) and len(would) >= 1
    # nothing was deleted: every version still reads
    assert t.read(0).count() == 10
    assert t.read(1).count() == 10
    # the real run removes exactly what the dry run named
    removed = t.vacuum(keep_last=1, min_age_seconds=0)
    assert removed == len(would)


def test_dry_run_shows_clone_protection(spark, tmp_path):
    """With a live clone the dry run must NOT list the shared dirs;
    after the clone dies they appear."""
    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    t.clone(str(tmp_path / "c1"))
    t.overwrite(_df(spark, 100, 110))
    assert t.vacuum(keep_last=1, min_age_seconds=0, dry_run=True) == []
    shutil.rmtree(tmp_path / "c1")
    would = t.vacuum(keep_last=1, min_age_seconds=0, dry_run=True)
    assert len(would) >= 1
    # dry_run must not have expired the registration destructively
    # (it reports, the real run cleans)
    assert list((tmp_path / "src" / "_clones").glob("c-*.json"))


def test_clone_of_mor_table_roots_shared_vectors(spark, tmp_path):
    """A clone of a DV-carrying snapshot shares the source's vector
    dirs too — source vacuum must keep them while the clone lives."""
    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    t.delete("k < 3", mode="mor")
    c = t.clone(str(tmp_path / "c1"))
    t.overwrite(_df(spark, 100, 110))
    t.overwrite(_df(spark, 200, 210))
    t.vacuum(keep_last=1, min_age_seconds=0)
    assert sorted(r["k"] for r in c.read().collect()) == list(range(3, 10))


def test_vacuum_hard_stops_on_torn_clone_registration(spark, tmp_path):
    """ADVICE r12 (medium): an unreadable c-*.json used to count as
    'alive' while contributing NO liveness root — the clone's shared
    dirs were swept anyway. Now it is a hard stop: unsafe sweeps need
    proof of death, and a torn record is reachable only via external
    damage (clone() writes registrations temp+rename)."""
    import pytest

    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    c = t.clone(str(tmp_path / "c1"))
    t.overwrite(_df(spark, 100, 110))
    # tear the registration in place (drop the Hadoop checksum sidecar
    # so the read reaches the torn JSON itself, not a CRC mismatch —
    # both surface the same hard stop, but the JSON path is the one
    # the ADVICE scenario describes)
    reg = list((tmp_path / "src" / "_clones").glob("c-*.json"))[0]
    crc = reg.parent / f".{reg.name}.crc"
    if crc.exists():
        crc.unlink()
    reg.write_text('{"dest": "/nowhere", "ver')
    with pytest.raises(Exception, match="unreadable"):
        t.vacuum(keep_last=1, min_age_seconds=0)
    with pytest.raises(Exception, match="unreadable"):
        t.vacuum(keep_last=1, min_age_seconds=0, dry_run=True)
    # nothing was swept: the clone still reads through shared files
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))
    # repairing the registration unblocks the sweep and keeps roots
    reg.write_text(
        '{"dest": "%s", "version": 0}' % str(tmp_path / "c1")
    )
    if crc.exists():
        crc.unlink()
    assert t.vacuum(keep_last=1, min_age_seconds=0) == 0
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))


def test_clone_registration_written_atomically(spark, tmp_path):
    """No .tmp- residue after a successful clone, and the final record
    parses — the temp+rename contract."""
    import json as _json

    t = VersionedTable.create(spark, str(tmp_path / "src"), _df(spark, 0, 10))
    t.clone(str(tmp_path / "c1"))
    cdir = tmp_path / "src" / "_clones"
    assert not list(cdir.glob(".tmp-*"))
    (reg,) = list(cdir.glob("c-*.json"))
    rec = _json.loads(reg.read_text())
    assert rec["dest"].endswith("c1") and rec["version"] == 0


# -- r15: DEEP CLONE ------------------------------------------------------


def test_deep_clone_is_independent_of_source(spark, tmp_path):
    """VERDICT r14 #6: a deep clone owns every byte — the source can
    be overwritten, vacuumed with zero retention, even deleted
    outright, and the clone still reads its snapshot."""
    import pytest

    t = VersionedTable.create(
        spark, str(tmp_path / "src"), _df(spark, 0, 10)
    )
    c = t.deep_clone(str(tmp_path / "d1"))
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))
    # no back-registry: independence, not protection
    assert not list((tmp_path / "src" / "_clones").glob("c-*.json"))
    # source moves on and vacuums everything pre-head
    t.overwrite(_df(spark, 100, 110))
    t.vacuum(keep_last=1, min_age_seconds=0)
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))
    # even deleting the source entirely leaves the clone whole
    shutil.rmtree(tmp_path / "src")
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))
    # and the clone has its own fresh history
    assert c.versions() == [0]
    assert c._read_pointer(0)["cloned_from"]["deep"] is True
    # initialized destination refuses, like clone
    with pytest.raises(IOError, match="already initialized"):
        t2 = VersionedTable.create(
            spark, str(tmp_path / "src2"), _df(spark, 0, 3)
        )
        t2.deep_clone(str(tmp_path / "d1"))


def test_deep_clone_pinned_version_and_writability(spark, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "src"), _df(spark, 0, 10)
    )
    t.append(_df(spark, 10, 20))
    c = t.deep_clone(str(tmp_path / "d1"), version=0)
    assert sorted(r["k"] for r in c.read().collect()) == list(range(10))
    # the clone is a full table: appends/DML land under its own root
    c.append(_df(spark, 50, 55))
    assert c.read().count() == 15
    assert t.read().count() == 20  # source untouched


def test_deep_clone_carries_mor_vectors_remapped(spark, tmp_path):
    """Deletion vectors survive the copy with their (file, pos) keys
    remapped to the CLONE's files — MoR state is portable."""
    t = VersionedTable.create(
        spark, str(tmp_path / "src"), _df(spark, 0, 20)
    )
    t.delete("k < 5", mode="mor")
    assert t._read_pointer(t.head_version()).get("delete_vectors")
    c = t.deep_clone(str(tmp_path / "d1"))
    assert sorted(r["k"] for r in c.read().collect()) == list(range(5, 20))
    # the clone's vectors reference the clone's own files
    dv_dirs = c._read_pointer(0)["delete_vectors"]
    assert all(d.startswith(c.path) for d in dv_dirs)
    dv = spark.read.parquet(*dv_dirs)
    paths = [r[0] for r in dv.select(dv.columns[0]).collect()]
    assert paths and all(c.path in p for p in paths)
    # and survive source deletion
    shutil.rmtree(tmp_path / "src")
    assert c.read().count() == 15


def test_deep_clone_preserves_stats_partitions_and_layout(
    spark, tmp_path
):
    """Per-file stats/partition metadata carries 1:1 (paths
    rewritten) — the clone prunes exactly like the source without
    any footer re-read."""
    df = spark.createDataFrame(
        [(i, ["x", "y"][i % 2], float(i)) for i in range(40)],
        "k long, typ string, val double",
    )
    t = VersionedTable.create(
        spark,
        str(tmp_path / "src"),
        df,
        partition_by="typ",
        stats_cols=["k"],
    )
    c = t.deep_clone(str(tmp_path / "d1"))
    kept, total = c.pruned_file_count("typ", "x", "x")
    assert kept < total
    assert sorted(
        r["k"] for r in c.read_where("typ", "x", "x").collect()
    ) == [i for i in range(40) if i % 2 == 0]
    ks, _ = c.pruned_file_count("k", 0, 1)
    assert ks <= total


def test_deep_clone_of_shallow_clone(spark, tmp_path):
    """Deep-cloning a shallow clone copies the SOURCE-rooted shared
    files into the new table — the standard promote-a-branch move."""
    t = VersionedTable.create(
        spark, str(tmp_path / "src"), _df(spark, 0, 10)
    )
    sc = t.clone(str(tmp_path / "s1"))
    dc = sc.deep_clone(str(tmp_path / "d1"))
    shutil.rmtree(tmp_path / "src")
    shutil.rmtree(tmp_path / "s1")
    assert sorted(r["k"] for r in dc.read().collect()) == list(range(10))
