"""Generic columnar/text table IO: one façade over Spark's format
zoo with the knobs that matter at scale (codec, partitioning counts,
explicit schemas for text formats).

Format guidance for the 100 TB design point, encoded as defaults:
parquet+zstd for warehouse tables (columnar, predicate pushdown,
row-group stats), ORC as the interchange alternative, NDJSON for
landing zones, CSV only at the edges (no types — schema required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["write_table", "read_table", "SUPPORTED_FORMATS"]

SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")

_DEFAULT_COMPRESSION = {
    "parquet": "zstd",
    "orc": "zlib",
    "json": None,
    "csv": None,
}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
    **options: str,
) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    writer = df.write.mode(mode).format(fmt)
    codec = compression or _DEFAULT_COMPRESSION[fmt]
    if codec:
        writer = writer.option("compression", codec)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            raise ValueError("csv requires an explicit schema (no type system)")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
