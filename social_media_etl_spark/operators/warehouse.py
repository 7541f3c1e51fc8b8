"""Warehouse layout operators: partitioned writes, upsert, and SCD2
dimension history.

At 100 TB the table LAYOUT is the optimizer's strongest lever:
partition columns turn time/tenant filters into directory pruning
(zero I/O for excluded partitions — see the PartitionFilters plan
test), bucketing co-locates join keys (test_bucketing.py), and
file sizing keeps scan tasks balanced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "write_partitioned",
    "upsert_parquet",
    "scd2_apply",
]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Hive-style partitioned parquet write.

    ``target_file_rows`` repartitions by the partition columns first so
    each partition directory gets few, well-sized files instead of one
    shard per task (the small-files problem at high parallelism).
    """
    out = df
    if target_file_rows is not None:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: Sequence[str],
    order_col: str,
) -> None:
    """Keyed upsert into a parquet table WITHOUT a transaction log:
    read-merge-overwrite keeping the highest ``order_col`` row per key.

    This is the plain-parquet stand-in for Delta/Iceberg MERGE —
    correct (deterministic winner per key) but rewrite-the-table
    expensive; on partitioned tables pair it with partition pruning so
    only affected partitions rewrite. Requires the merged frame to be
    materialized before the overwrite (the write would otherwise read
    its own input mid-overwrite), hence the localCheckpoint.
    """
    try:
        current = spark.read.parquet(path)
        merged = current.unionByName(updates, allowMissingColumns=False)
    except Exception:  # first load — nothing to merge  # noqa: BLE001
        merged = updates
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    latest.write.mode("overwrite").parquet(path)


def scd2_apply(
    dim: DataFrame | None,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: fold a batch of updates into a
    history table — one row per (key, value-version) with
    [effective, end) validity and a current flag.

    Pure DataFrame formulation: union history + updates, then per key
    order by effective time and (a) drop consecutive rows whose tracked
    values are unchanged (no-op updates), (b) close each version with
    the next version's effective time via ``lead``. One shuffle on the
    key; no row-at-a-time merge loop.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    base_cols = keys + tracked + [effective_col]
    inputs = updates.select(*base_cols)
    if dim is not None:
        inputs = dim.select(*base_cols).unionByName(inputs)
    w = Window.partitionBy(*keys).orderBy(effective_col)
    change = None
    for c in tracked:
        prev = F.lag(c).over(w)
        d = ~prev.eqNullSafe(F.col(c))
        change = d if change is None else (change | d)
    versions = (
        inputs.withColumn("__is_first", F.lag(effective_col).over(w).isNull())
        .withColumn("__changed", F.coalesce(change, F.lit(True)))
        .filter(F.col("__is_first") | F.col("__changed"))
        .drop("__is_first", "__changed")
    )
    w2 = Window.partitionBy(*keys).orderBy(effective_col)
    return versions.withColumn(
        end_col, F.lead(effective_col).over(w2)
    ).withColumn(current_col, F.col(end_col).isNull())
