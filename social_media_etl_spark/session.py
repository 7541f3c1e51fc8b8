"""SparkSession factory.

Defaults are chosen for correctness-vs-oracle and 100 TB scale-readiness:

- AQE on (runtime coalescing, skew-join splitting, SMJ→BHJ conversion),
- UTC session timezone (oracle comparison: DuckDB timestamps are UTC-naive),
- shuffle partitions sized to local cores (on a real cluster this is
  overridden to ~2-3× total executor cores, or left to AQE's
  ``spark.sql.adaptive.coalescePartitions`` with a high initial value),
- Arrow enabled for any pandas interchange (vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CONF"]

DEFAULT_CONF: dict[str, str] = {
    # local mode: the driver JVM IS the executor — size its heap to the
    # machine, not Spark's 1g default (only applies at JVM launch; a
    # pre-existing session keeps its own setting)
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: the engine's cast policy is "invalid → NULL" (the reference
    # would raise in Python; our contract per SURVEY §5.2 is null-tolerant,
    # and try_cast is used where the distinction matters).
    "spark.sql.ansi.enabled": "false",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "social_media_etl_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` and let spark-submit supply the master.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
