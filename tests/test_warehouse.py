"""Warehouse layout operators: partition pruning, upsert, SCD2."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from social_media_etl_spark.catalog import load_table
from social_media_etl_spark.operators import warehouse

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    events = load_table(spark, SF, "events")
    warehouse.write_partitioned(
        events, path, ["event_type"], target_file_rows=10000
    )
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    assert back.count() == events.filter(F.col("event_type") == "click").count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter became directory pruning, not a data filter
    assert "PartitionFilters: [isnotnull(event_type" in plan
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("event_type=")]
    assert len(dirs) == 5  # one directory per type


def test_partitioned_write_bytes_sizing_is_one_pass(spark, tmp_path):
    """target_file_bytes sizes files from Catalyst's plan-stats estimate
    — no count() job — and still writes every row (VERDICT r5 #6)."""
    path = str(tmp_path / "events_bytes_sized")
    events = load_table(spark, SF, "events")
    warehouse.write_partitioned(
        events, path, ["event_type"], target_file_bytes=64 << 20
    )
    assert spark.read.parquet(path).count() == events.count()


def test_partitioned_write_rejects_both_sizing_modes(spark, tmp_path):
    import pytest

    events = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="at most one"):
        warehouse.write_partitioned(
            events,
            str(tmp_path / "x"),
            ["event_type"],
            target_file_rows=1000,
            target_file_bytes=1 << 20,
        )


def test_partitioned_write_rejects_blown_up_size_estimate(spark, tmp_path):
    """Without CBO Catalyst sizes a join as the product of its children
    — bytes-based sizing must refuse such an estimate instead of
    silently degenerating to one-file-per-task (review r6)."""
    import pytest

    big = spark.range(0, 1 << 22).selectExpr("id", "id % 5 AS k")
    joined = big.join(big.selectExpr("id AS id2", "id % 5 AS k"), "k")
    est = int(
        str(
            joined._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    )
    assert est > warehouse._SANE_SIZE_BYTES  # the blowup this guards
    with pytest.raises(ValueError, match="not credible"):
        warehouse.write_partitioned(
            joined, str(tmp_path / "y"), ["k"], target_file_bytes=128 << 20
        )


def test_partitioned_write_dynamic_overwrite_spares_other_partitions(
    spark, tmp_path
):
    """dynamic_overwrite replaces ONLY the partitions present in the
    batch — the incremental backfill; static overwrite would truncate
    the whole table root first. The mode rides the WRITER option, so
    the session conf is never touched (review r6)."""
    import pytest

    path = str(tmp_path / "days")
    full = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3), ("d3", 4)], "day string, v int"
    )
    warehouse.write_partitioned(full, path, ["day"])
    backfill = spark.createDataFrame([("d2", 30), ("d2", 31)], "day string, v int")
    warehouse.write_partitioned(
        backfill, path, ["day"], dynamic_overwrite=True
    )
    got = {
        (r["day"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    # d2 replaced wholesale; d1/d3 untouched
    assert got == {("d1", 1), ("d1", 2), ("d2", 30), ("d2", 31), ("d3", 4)}
    # write-scoped conf did not leak into the session
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        in (None, "STATIC", "static")
    )
    with pytest.raises(ValueError, match="dynamic_overwrite requires"):
        warehouse.write_partitioned(
            backfill, path, ["day"], mode="append", dynamic_overwrite=True
        )


def test_upsert_parquet_latest_wins(spark, tmp_path):
    path = str(tmp_path / "state")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k long, v string, ver long"
    )
    warehouse.upsert_parquet(spark, v1, path, ["k"], "ver")
    v2 = spark.createDataFrame(
        [(2, "b2", 20), (3, "c", 20)], "k long, v string, ver long"
    )
    warehouse.upsert_parquet(spark, v2, path, ["k"], "ver")
    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 20)}
    # crash-safe commit leaves no sibling temp/backup dirs behind, and
    # a STALE temp dir from an interrupted run does not poison the next
    import os

    assert not os.path.exists(path + "__upserting")
    assert not os.path.exists(path + "__prereplace")
    os.makedirs(path + "__upserting/junk")
    warehouse.upsert_parquet(spark, v2, path, ["k"], "ver")
    assert not os.path.exists(path + "__upserting")
    got2 = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_upsert_parquet_multi_order_cols_break_ties(spark, tmp_path):
    """A list order_col: later columns deterministically break ties on
    earlier ones (same ver → higher seq wins)."""
    path = str(tmp_path / "state_multi")
    v = spark.createDataFrame(
        [(1, "old", 10, 1), (1, "new", 10, 2), (2, "only", 5, 1)],
        "k long, v string, ver long, seq long",
    )
    warehouse.upsert_parquet(spark, v, path, ["k"], ["ver", "seq"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "new", 2: "only"}


def test_scd2_versions_and_validity(spark):
    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    updates = spark.createDataFrame(
        [
            (1, "NY", t(1)),
            (1, "NY", t(5)),   # no-op update → no new version
            (1, "LA", t(10)),  # real change
            (2, "SF", t(3)),
        ],
        "user_id long, city string, effective timestamp",
    )
    hist = warehouse.scd2_apply(
        None, updates, ["user_id"], ["city"], "effective"
    )
    rows = sorted(
        (r["user_id"], r["city"], r["effective"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    )
    assert rows == [
        (1, "NY", t(1), t(10), False),
        (1, "LA", t(10), None, True),
        (2, "SF", t(3), None, True),
    ] or rows == [
        (1, "LA", t(10), None, True),
        (1, "NY", t(1), t(10), False),
        (2, "SF", t(3), None, True),
    ]


def test_scd2_incremental_fold_equals_full_rebuild(spark):
    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    batch1 = spark.createDataFrame(
        [(1, "NY", t(1)), (2, "SF", t(2))],
        "user_id long, city string, effective timestamp",
    )
    batch2 = spark.createDataFrame(
        [(1, "LA", t(8)), (2, "SF", t(9))],  # user 2 unchanged
        "user_id long, city string, effective timestamp",
    )
    d1 = warehouse.scd2_apply(None, batch1, ["user_id"], ["city"], "effective")
    incr = warehouse.scd2_apply(
        d1.select("user_id", "city", "effective"),
        batch2,
        ["user_id"],
        ["city"],
        "effective",
    )
    full = warehouse.scd2_apply(
        None, batch1.unionByName(batch2), ["user_id"], ["city"], "effective"
    )
    key = lambda df: sorted(  # noqa: E731
        (r["user_id"], r["city"], r["effective"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )
    assert key(incr) == key(full)
    cur = {r["user_id"]: r["city"] for r in incr.filter("is_current").collect()}
    assert cur == {1: "LA", 2: "SF"}


def test_jdbc_options_shape():
    opts = warehouse.jdbc_options(
        "jdbc:postgresql://host/db",
        "users",
        driver="org.postgresql.Driver",
        batch_size=500,
        extra={"stringtype": "unspecified"},
    )
    assert opts == {
        "url": "jdbc:postgresql://host/db",
        "dbtable": "users",
        "batchsize": "500",
        "isolationLevel": "READ_COMMITTED",
        "driver": "org.postgresql.Driver",
        "stringtype": "unspecified",
    }


@pytest.mark.slow
def test_jdbc_roundtrip_append_and_truncate_load(spark, tmp_path):
    """Real JDBC round-trip against embedded Derby (ships with Spark):
    append, truncate-and-load full refresh (the reference's load
    semantics, dags/users_etl.py:142-157), and parallel read-back."""
    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id bigint, name string, score double"
    )
    warehouse.write_jdbc(v1, url, "users", mode="append", num_partitions=1)
    back = warehouse.read_jdbc(spark, url, "users")
    assert {(r["id"], r["name"], r["score"]) for r in back.collect()} == {
        (1, "a", 10.0),
        (2, "b", 20.0),
    }
    # full refresh: truncate keeps the table, replaces every row
    v2 = spark.createDataFrame(
        [(3, "c", 30.0)], "id bigint, name string, score double"
    )
    warehouse.write_jdbc(
        v2, url, "users", mode="overwrite", truncate=True, num_partitions=1
    )
    back2 = warehouse.read_jdbc(
        spark,
        url,
        "users",
        partition_column="id",
        lower_bound=0,
        upper_bound=10,
        num_partitions=2,
    )
    assert back2.rdd.getNumPartitions() == 2
    assert {(r["id"], r["name"], r["score"]) for r in back2.collect()} == {
        (3, "c", 30.0)
    }


def test_upsert_parquet_raises_on_non_missing_read_error(spark, tmp_path):
    """A corrupt existing table must ABORT the upsert, not silently
    become a 'first load' that overwrites the table with one batch."""
    import os

    import pytest

    path = str(tmp_path / "corrupt")
    os.makedirs(path)
    with open(os.path.join(path, "part-000.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    updates = spark.createDataFrame([(1, "a", 1)], "k long, v string, ver long")
    with pytest.raises(Exception) as exc:
        warehouse.upsert_parquet(spark, updates, path, ["k"], "ver")
    assert "PATH_NOT_FOUND" not in str(exc.value)
    # the corrupt file is still there — nothing overwrote the table
    with open(os.path.join(path, "part-000.parquet"), "rb") as f:
        assert f.read() == b"this is not parquet"


def test_compact_parquet_dir_shrinks_files_preserves_rows(spark, tmp_path):
    """Compaction collapses a many-small-files dir to ~target-sized
    files with identical content (the streaming-sink maintenance op)."""
    import glob
    import os

    from social_media_etl_spark.operators.warehouse import compact_parquet_dir

    path = str(tmp_path / "small_files")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 40

    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n == 1 and after == 1
    got = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert got == [(i, 2 * i) for i in range(10_000)]
    # temp/backup dirs cleaned up
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__prereplace")


def test_write_sorted_files_have_disjoint_ranges(spark, tmp_path):
    """Range-clustered layout: every output file owns a disjoint range
    of the sort key (verified from the parquet footers), which is what
    makes reader-side min/max skipping effective."""
    import glob
    import os

    import pyarrow.parquet as pq

    from social_media_etl_spark.operators.warehouse import write_sorted

    path = str(tmp_path / "sorted_layout")
    df = spark.range(50_000).withColumn("k", (F.col("id") * 7919) % 50_021)
    write_sorted(df, path, ["k"], num_files=8)

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "k"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1  # actually range-partitioned
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1,hi1)} vs {(lo2,hi2)}"
    # content round-trips
    assert spark.read.parquet(path).count() == 50_000


def test_write_zordered_bounds_every_dimension(spark, tmp_path):
    """Z-order layout: with two independent uniform dimensions, every
    output file's footer min/max covers a SMALL range of BOTH columns
    (file skipping works on either predicate), whereas a single-column
    range sort bounds only its own column and leaves the other
    spanning ~the full domain per file."""
    import glob
    import os

    import pyarrow.parquet as pq

    from social_media_etl_spark.operators.warehouse import (
        write_sorted,
        write_zordered,
    )

    n = 100_000
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 7919) % 100_003)
        .withColumn("y", (F.col("id") * 104_729) % 99_991)
    )

    def mean_span(path: str, col: str) -> float:
        spans, glo, ghi = [], None, None
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            if mins:
                spans.append((min(mins), max(maxs)))
        glo = min(s[0] for s in spans)
        ghi = max(s[1] for s in spans)
        return sum((hi - lo) / (ghi - glo) for lo, hi in spans) / len(spans)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], bits=8, num_files=16)
    spath = str(tmp_path / "xsorted")
    write_sorted(df, spath, ["x"], num_files=16)

    # single-column sort: x tight, y spans ~everything per file
    assert mean_span(spath, "x") < 0.15
    assert mean_span(spath, "y") > 0.9
    # z-order: BOTH dimensions bounded well below the full domain
    assert mean_span(zpath, "x") < 0.5
    assert mean_span(zpath, "y") < 0.5
    # lossless
    assert spark.read.parquet(zpath).count() == n


def test_zorder_value_handles_nulls_and_constants(spark):
    """Null cells and zero-span (constant) dimensions bucket to 0
    instead of poisoning the Z-value."""
    from social_media_etl_spark.operators.warehouse import zorder_value

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 10.0)], "k long, v double"
    ).withColumn("const", F.lit(5))
    out = zorder_value(df, ["v", "const"], bits=4)
    rows = {r["k"]: r["__z"] for r in out.collect()}
    assert rows[2] is not None  # null v still gets a Z-value
    assert len(rows) == 3


def test_zorder_quantile_strategy_spreads_skewed_dimension(spark):
    """On a long-tailed column, linear bucketing collapses nearly all
    rows into the lowest cells (the curve's resolution is wasted on
    empty value space); quantile bucketing spreads rows across the full
    cell range, which is what keeps per-file ranges selective on
    skewed data."""
    from social_media_etl_spark.operators.warehouse import zorder_value

    # exponential value spread: 2^0 .. 2^19, uniform in the exponent
    df = spark.range(20_000).withColumn(
        "x", F.pow(F.lit(2.0), (F.col("id") % 20).cast("double"))
    ).withColumn("y", (F.col("id") * 7919) % 9973)

    def distinct_cells(strategy: str) -> int:
        out = zorder_value(df, ["x", "y"], bits=6, strategy=strategy)
        # dim 0's cell occupies the even interleave bits; project it out
        cell = sum(
            (F.shiftright(F.col("__z"), 2 * b).bitwiseAND(F.lit(1)) * (1 << b))
            for b in range(6)
        )
        return out.select(cell.alias("c")).distinct().count()

    lin, qnt = distinct_cells("linear"), distinct_cells("quantile")
    # 20 distinct values: linear crams them into a handful of low cells,
    # quantile gives each its own cell
    assert lin <= 8, lin
    assert qnt >= 16, qnt


def test_zorder_rejects_sign_bit_overflow(spark):
    """bits*ndims above 63 would interleave into the long sign bit and
    silently corrupt the clustering — must raise instead."""
    import pytest

    from social_media_etl_spark.operators.warehouse import zorder_value

    df = spark.range(10).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(ValueError, match="signed long"):
        zorder_value(df, ["a", "b", "c", "d"], bits=16)
    # bits<1 gets its own accurate message, not the overflow one (ADVICE r5)
    with pytest.raises(ValueError, match="bits must be >= 1"):
        zorder_value(df, ["a"], bits=0)


# -- r8 review fixes ----------------------------------------------------------


def test_upsert_recovers_interrupted_swap(spark, tmp_path):
    """A crash between _swap_into_place's two renames leaves the table
    only at the __prereplace backup; a checkpointed replay must
    RESTORE it before merging instead of re-initializing from one
    batch and letting the swap delete the only copy (r8 review)."""
    import shutil

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, v string, ts long"
    )
    warehouse.upsert_parquet(spark, base, path, ["k"], "ts")
    # simulate the crash window: table dir moved to the backup name
    shutil.move(path, path + "__prereplace")
    replay = spark.createDataFrame([(3, "c", 2)], "k long, v string, ts long")
    warehouse.upsert_parquet(spark, replay, path, ["k"], "ts")
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # prior keys survived


def test_write_partitioned_sizes_files_per_directory(spark, tmp_path):
    """The file-count budget is table-wide; the sub-bucket modulus must
    be divided by the partition-directory count or every directory
    gets the full budget of undersized shards (r8 review)."""
    import glob

    df = spark.createDataFrame(
        [(i, "abcde"[i % 5], float(i)) for i in range(5000)],
        "k long, part string, val double",
    )
    path = str(tmp_path / "t")
    warehouse.write_partitioned(
        df, path, ["part"], target_file_rows=1000
    )
    files = glob.glob(f"{path}/part=*/part-*.parquet")
    # budget = ceil(5000/1000) = 5 files table-wide over 5 dirs → ~1
    # file per dir (the old code wrote 5 per dir = 25)
    assert len(files) <= 10
    assert spark.read.parquet(path).count() == 5000


def test_scd2_same_instant_updates_are_deterministic(spark):
    """Two updates for one key at the SAME effective instant must
    produce the same history on every run (tracked columns break the
    tie)."""
    upd = spark.createDataFrame(
        [(1, "A", 10), (1, "B", 10)], "k long, v string, eff long"
    )
    outs = {
        tuple(
            sorted(
                map(
                    tuple,
                    warehouse.scd2_apply(
                        None, upd, ["k"], ["v"], "eff"
                    ).collect(),
                )
            )
        )
        for _ in range(3)
    }
    assert len(outs) == 1  # identical across repeated runs
    rows = sorted(next(iter(outs)))
    # deterministic: 'A' sorts first → closed by 'B' at the same instant
    assert rows[0][1] == "A" and rows[0][4] is False
    assert rows[1][1] == "B" and rows[1][4] is True


def test_read_jdbc_requires_bounds_with_partition_column(spark):
    import pytest

    with pytest.raises(ValueError, match="lower_bound AND upper_bound"):
        warehouse.read_jdbc(
            spark, "jdbc:derby:memory:x", "t", partition_column="id"
        )
