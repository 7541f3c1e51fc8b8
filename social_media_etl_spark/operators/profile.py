"""Table profiling: per-column statistics in ONE aggregate pass.

The warehouse data-quality primitive: null rates, cardinalities, and
value ranges for every column of a table, computed as a single
HashAggregate over one scan (every statistic is an aggregate
expression; no per-column jobs, no collect-per-column loop). Output is
long-form (column, metric, value) so downstream checks/dashboards are
schema-stable regardless of the profiled table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["table_profile"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-form profile: one row per (column, metric).

    Metrics: ``n_rows`` (table-level), per column ``n_null``,
    ``n_distinct`` (exact by default; ``exact_distinct=False`` switches
    to HLL ``approx_count_distinct`` — the 100 TB setting, where exact
    distinct per column would shuffle every value), and for numeric
    columns ``min``/``max`` (emitted as doubles).

    Values are doubles; non-numeric min/max are omitted (type-stable
    output beats stringly-typed stats).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null__{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist__{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__dist__{c}")
            )
        if isinstance(df.schema[c].dataType, _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min__{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max__{c}"))
    wide = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit("__table__").alias("column"),
            F.lit("n_rows").alias("metric"),
            F.col("__n_rows").cast("double").alias("value"),
        )
    ]
    for c in cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit("n_null").alias("metric"),
                F.col(f"__null__{c}").cast("double").alias("value"),
            )
        )
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit("n_distinct").alias("metric"),
                F.col(f"__dist__{c}").cast("double").alias("value"),
            )
        )
        if isinstance(df.schema[c].dataType, _NUMERIC):
            for m in ("min", "max"):
                entries.append(
                    F.struct(
                        F.lit(c).alias("column"),
                        F.lit(m).alias("metric"),
                        F.col(f"__{m}__{c}").alias("value"),
                    )
                )
    return (
        wide.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.column", "e.metric", "e.value")
        .orderBy("column", "metric")
    )
