"""Testdata catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

At 100 TB these would be partitioned/bucketed warehouse tables; the
loader keeps the scan declarative (``spark.read.parquet``) so Catalyst
gets predicate pushdown + column pruning on every downstream query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]

# Testdata parquet stores these as TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they scan as LongType nanos and
# are converted to microsecond TimestampType here (same truncation
# DuckDB applies casting TIMESTAMP_NS → TIMESTAMP).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
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
