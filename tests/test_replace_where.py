"""overwrite_where — Delta's replaceWhere (r15): predicate-scoped
transactional overwrite in ONE commit, file-granular (untouched files
carry byte-identical), replacement-conformance enforced, CDC
recorded, SQL form INSERT INTO ... REPLACE WHERE."""

from __future__ import annotations

import pytest

from social_media_etl_spark.operators import timetravel as tt
from social_media_etl_spark.operators.manifest import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, g string, v double")


def _mk(spark, tmp_path, name="rw_t"):
    # two partitions worth of data, clustered by g so files are
    # g-homogeneous (file-granularity assertions need that)
    t = VersionedTable.create(
        spark,
        str(tmp_path / name),
        _df(
            spark,
            [(i, "a" if i < 10 else "b", float(i)) for i in range(20)],
        ).repartition(2, "g"),
    )
    return t


def test_replace_where_replaces_exactly_the_predicate_rows(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    v = t.overwrite_where(
        _df(spark, [(100, "a", 100.0), (101, "a", 101.0)]),
        "g = 'a'",
    )
    assert v == 1
    got = sorted((r["k"], r["g"]) for r in t.read().collect())
    assert got == [(i, "b") for i in range(10, 20)] + [
        (100, "a"),
        (101, "a"),
    ]
    assert t._read_pointer(1)["op"] == "replace_where"
    # one commit; time travel sees the pre-replace state
    assert sorted(r["k"] for r in t.read(0).collect()) == list(range(20))


def test_replace_where_keeps_untouched_files_byte_identical(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    files0 = set(t._read_manifest(0)["files"])
    t.overwrite_where(
        _df(spark, [(100, "a", 1.0)]), "g = 'a'",
        prune=[("g", "a", "a")],
    )
    files1 = set(t._read_manifest(1)["files"])
    # the b-file(s) survive by reference; a-files are gone
    carried = files0 & files1
    assert carried  # untouched files carried
    b_rows = t._read_files(
        t._read_manifest(1), sorted(carried)
    ).collect()
    assert all(r["g"] == "b" for r in b_rows)


def test_replace_where_conformance_refusal(spark, tmp_path):
    t = _mk(spark, tmp_path)
    head0 = t.head_version()
    with pytest.raises(ValueError, match="satisfy the predicate"):
        t.overwrite_where(
            _df(spark, [(100, "b", 1.0)]), "g = 'a'"
        )
    assert t.head_version() == head0


def test_replace_where_empty_cases(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # nothing matches, nothing new -> no commit
    empty = _df(spark, []).limit(0)
    assert t.overwrite_where(empty, "g = 'zzz'") == 0
    # nothing matches but new rows land (predicate-scoped append)
    v = t.overwrite_where(
        _df(spark, [(200, "c", 2.0)]), "g = 'c'"
    )
    assert v == 1 and t.read().count() == 21
    # matches but empty replacement == predicate delete
    v = t.overwrite_where(empty, "g = 'c'")
    assert v == 2 and t.read().count() == 20


def test_replace_where_records_cdc(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        change_data_feed=True,
    )
    t.overwrite_where(_df(spark, [(9, "a", 9.0)]), "g = 'a'")
    feed = t.read_change_feed(0, 1)
    ch = sorted(
        (r["k"], r["_change_type"]) for r in feed.collect()
    )
    assert ch == [(1, "delete"), (9, "insert")]


def test_replace_where_constraints_validate_replacements(
    spark, tmp_path
):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        _df(spark, [(1, "a", 1.0)]),
        constraints={"v_pos": "v >= 0"},
    )
    with pytest.raises(ValueError, match="v_pos"):
        t.overwrite_where(
            _df(spark, [(2, "a", -5.0)]), "g = 'a'"
        )


def test_replace_where_identity_allocates(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("g", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([], schema),
        identity={"id": {"start": 1, "step": 1}},
    )
    t.append(
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "g string, v double"
        )
    )
    wm = t.identity_columns()["id"]["high"]
    t.overwrite_where(
        spark.createDataFrame([("a", 10.0)], "g string, v double"),
        "g = 'a'",
    )
    rows = {r["g"]: r["id"] for r in t.read().collect()}
    assert rows["a"] > wm  # replacement row got a fresh id
    assert len(set(rows.values())) == 2


def test_sql_replace_where(spark, tmp_path):
    t = _mk(spark, tmp_path, "sdml_rw")
    tt.register_table(spark, "sdml_rw", t.path)
    out = tt.sql(
        spark,
        "INSERT INTO sdml_rw REPLACE WHERE g = 'a' VALUES "
        "(100, 'a', 100.0)",
    ).collect()
    assert out[0]["op"] == "replace_where" and out[0]["version"] == 1
    got = sorted(r["k"] for r in t.read().collect())
    assert got == list(range(10, 20)) + [100]
    # conformance refusal surfaces through SQL too
    with pytest.raises(ValueError, match="satisfy the predicate"):
        tt.sql(
            spark,
            "INSERT INTO sdml_rw REPLACE WHERE g = 'a' VALUES "
            "(7, 'b', 7.0)",
        )
    # predicates with string literals never split the parse
    tt.sql(
        spark,
        "INSERT INTO sdml_rw REPLACE WHERE g = 'a' AND v >= 0.0 "
        "SELECT 200, 'a', 0.5",
    )
    assert 200 in [r["k"] for r in t.read().collect()]
