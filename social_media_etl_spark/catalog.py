"""Testdata catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

Every table is read with an explicit :class:`StructType` (DDL as the
source of truth — SURVEY §1.3, mirroring the reference's CREATE TABLE
DDL in ``/root/reference/sql/create_tables.sql``). Explicit schemas
also make the loader self-sufficient in ANY SparkSession: the testdata
``events.ts`` column is physically ``TIMESTAMP(NANOS)``, which Spark's
schema inference rejects (``PARQUET_TYPE_ILLEGAL``) unless the session
happens to carry ``spark.sql.legacy.parquet.nanosAsLong``. Reading the
column as :class:`LongType` (nanos since epoch) needs no session conf;
we convert to microsecond TimestampType in-plan — the same truncation
DuckDB applies casting TIMESTAMP_NS → TIMESTAMP.

At 100 TB these would be partitioned/bucketed warehouse tables; the
loader keeps the scan declarative (``spark.read.schema(...).parquet``)
so Catalyst gets predicate pushdown + column pruning on every
downstream query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TABLES", "SCHEMAS", "load_table", "load_tables", "register_views"]


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


#: Explicit read schemas, one per testdata table. ``events.ts`` is read
#: as LongType (physical nanos) — see module docstring — and converted
#: to TimestampType by :func:`load_table`.
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
        ("ts", T.LongType()),  # physical TIMESTAMP(NANOS) → read as long
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

#: Columns read as long nanos that load_table converts to TimestampType.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its explicit schema.

    Works in any SparkSession (no legacy confs required); nano-precision
    timestamp columns are read as long and converted in-plan.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = SCHEMAS.get(name)
    if schema is None:
        df = spark.read.parquet(path)
    else:
        df = spark.read.schema(schema).parquet(path)
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
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
