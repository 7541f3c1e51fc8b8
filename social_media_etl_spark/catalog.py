"""Testdata catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

Every table is read with an explicit :class:`StructType` (DDL as the
source of truth — SURVEY §1.3, mirroring the reference's CREATE TABLE
DDL in ``/root/reference/sql/blog_post_definitions.sql``).

``events.ts`` is physical ``timestamp[us]`` — Spark's native timestamp
precision — and is read directly as :class:`TimestampType`. Because the
driver has regenerated the testdata with a different physical type
before (round 1 shipped TIMESTAMP(NANOS), round 2+ ships micros), the
loader sniffs the parquet footer with pyarrow: only if the physical
unit is ever nanos again does it fall back to reading the column as
:class:`LongType` and converting in-plan (``timestamp_micros(ts div
1000)`` — the same truncation DuckDB applies casting TIMESTAMP_NS →
TIMESTAMP). That fallback path needs no session conf either (an
explicit LongType read of TIMESTAMP(NANOS) bypasses the vectorized
reader's ``PARQUET_TYPE_ILLEGAL``).

At 100 TB these would be partitioned/bucketed warehouse tables; the
loader keeps the scan declarative (``spark.read.schema(...).parquet``)
so Catalyst gets predicate pushdown + column pruning on every
downstream query.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "TABLES",
    "SCHEMAS",
    "load_table",
    "load_tables",
    "register_views",
    "parquet_ts_unit",
]


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


#: Explicit read schemas, one per testdata table. ``events.ts`` is
#: TimestampType (physical micros); :func:`load_table` sniffs the
#: parquet footer and falls back to a long read + in-plan conversion
#: only if the file is ever physically nanos again (module docstring).
SCHEMAS: dict[str, T.StructType] = {
    "region": _s(
        ("r_regionkey", T.IntegerType()),
        ("r_name", T.StringType()),
    ),
    "nation": _s(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _s(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _s(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

#: Timestamp columns whose parquet footer is sniffed for nano-precision
#: drift (the driver regenerated events.ts from nanos to micros once —
#: every timestamp column gets the same insurance).
_SNIFF_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def parquet_ts_unit(path: str, col: str) -> str | None:
    """Physical timestamp unit ('ns'/'us'/'ms'/'s') of ``col`` at ``path``.

    Reads only the parquet footer (pyarrow); returns None if the column
    is missing, not a timestamp, or the footer can't be read. Accepts a
    single file or a directory of part files. The memo key folds in the
    (name, size, mtime) of EVERY part file: this sniff exists precisely
    because the driver regenerates testdata in place, so a path-only
    cache — or one keyed on the first part file only, which a rewrite
    of the other parts would not invalidate (ADVICE r4) — would serve
    the stale unit across a regeneration and silently reapply or skip
    the div-1000 conversion (ADVICE r3).

    A directory is assumed UNIT-HOMOGENEOUS (all parts written by one
    job — true of every Spark/driver-written table); the first AND last
    part are both sniffed, and a disagreement warns and reports the
    first part's unit rather than guessing (ADVICE r5) — a mixed-unit
    directory needs a per-file rewrite, not a silent single answer.
    """
    try:
        import pyarrow  # noqa: F401 — fail fast before any stat calls
    except Exception:
        return None
    try:
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                return None
            target = parts[0]
            tail = parts[-1]
            fingerprint: tuple = tuple(
                (os.path.basename(p), st.st_size, st.st_mtime_ns)
                for p, st in ((p, os.stat(p)) for p in parts)
            )
        else:
            target = path
            tail = path
            st = os.stat(target)
            fingerprint = (st.st_mtime_ns, st.st_size)
    except OSError:
        return None
    unit = _parquet_ts_unit_cached(target, col, fingerprint)
    if tail != target:
        tail_unit = _parquet_ts_unit_cached(tail, col, fingerprint)
        if tail_unit != unit:
            import warnings

            warnings.warn(
                f"parquet_ts_unit: mixed timestamp units in {path!r} for "
                f"{col!r}: first part {unit!r} vs last part {tail_unit!r}; "
                "reporting the first — rewrite the directory to one unit",
                stacklevel=2,
            )
    return unit


@functools.lru_cache(maxsize=64)
def _parquet_ts_unit_cached(
    target: str, col: str, fingerprint: tuple[int, int]
) -> str | None:
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        field_type = pq.ParquetFile(target).schema_arrow.field(col).type
        return field_type.unit if pa.types.is_timestamp(field_type) else None
    except Exception:
        return None

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Per-session memo of the LAZY reader plans, keyed by the file's
#: identity (path, mtime_ns, size) — r15 optimization: building the
#: reader costs ~20-30 ms of py4j round trips per call and a bench
#: run builds ~900 of them over the same ten immutable files. The
#: memo holds PLANS, never data: every action still scans the parquet
#: (DataFrames are immutable, so sharing one across queries is safe),
#: and a regenerated file (different mtime/size) misses the memo and
#: re-sniffs. WeakKey on the session: a stopped/replaced session's
#: plans are dropped with it.
import weakref as _weakref

_READER_MEMO: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its explicit schema.

    Works in any SparkSession (no legacy confs required). Timestamp
    columns listed in ``_SNIFF_TS_COLS`` get their physical unit checked
    in the parquet footer; a nanos file is read as long and converted
    in-plan, anything else reads natively as TimestampType.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # NOTE: testdata tables are single FILES, so (mtime_ns, size) is a
    # faithful content identity. If ``{name}.parquet`` is ever a
    # DIRECTORY, a part file rewritten in place would leave the dir
    # stat unchanged (ADVICE r15) — fold the newest contained file's
    # stat into the key in that case.
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            newest = max(
                (os.stat(os.path.join(path, p)) for p in os.listdir(path)),
                key=lambda s: s.st_mtime_ns,
                default=st,
            )
            memo_key = (
                path,
                st.st_mtime_ns,
                st.st_size,
                newest.st_mtime_ns,
                newest.st_size,
            )
        else:
            memo_key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        memo_key = None
    if memo_key is not None:
        try:
            per_session = _READER_MEMO.setdefault(spark, {})
        except TypeError:  # un-weakref-able session stub (tests)
            per_session = None
        if per_session is not None:
            df = per_session.get(memo_key)
            if df is not None:
                return df
    df = _build_table_reader(spark, path, name)
    if memo_key is not None and per_session is not None:
        if len(per_session) > 512:
            # bound the plan memo when files churn (regenerated
            # testdata mints new keys); a cleared entry just rebuilds
            per_session.clear()
        per_session[memo_key] = df
    return df


def _build_table_reader(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    schema = SCHEMAS.get(name)
    if schema is None:
        return spark.read.parquet(path)
    nano_cols = [
        col
        for col in _SNIFF_TS_COLS.get(name, ())
        if parquet_ts_unit(path, col) == "ns"
    ]
    if nano_cols:
        schema = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name in nano_cols else f.dataType)
                for f in schema.fields
            ]
        )
    df = spark.read.schema(schema).parquet(path)
    for col in nano_cols:
        # integer div: float division would round the microsecond
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a lazy DataFrame (no I/O until action)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
