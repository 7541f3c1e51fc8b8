"""Structured Streaming SOURCE over a VersionedTable's change feed.

``streaming/ingest.py:sync_table_changes`` is the batch-driven CDC
consumer (a poller that replicates a commit chain table-to-table).
This module is the ENGINE-NATIVE half of the same pattern — the Delta
streaming source re-expressed through Spark 4's Python DataSource API:

    spark.dataSource.register(VersionedCdcDataSource)
    stream = spark.readStream.format("versioned_cdc") \
        .option("path", table_path).load()

- The stream OFFSET is the table VERSION: offset v = "all rows visible
  at version v have been emitted". ``initialOffset`` is -1 (emit the
  whole table as the initial snapshot, Delta-source semantics) or the
  ``startingVersion`` option.
- ``latestOffset`` lists the manifest directory — O(versions) metadata,
  no data IO. Each micro-batch covers a committed version span.
- ``partitions(start, end)`` resolves the span to the FILE-LEVEL
  manifest diff (exactly ``read_changes``): one InputPartition per new
  data file, so the batch reads execute IN PARALLEL ON EXECUTORS
  (pyarrow per file), never through the driver. At 100 TB a batch
  plans a scan of just its commit's files.
- Offsets are checkpointed by the engine: restart resumes from the
  last committed version — exactly-once without any sink cooperation.
- A REWRITE commit (upsert/overwrite/delete/update/optimize) inside
  the span raises, like ``read_changes``: added-rows semantics only
  exist along append-only chains; a consumer of a rewritten range must
  re-snapshot.

The manifest is read with plain filesystem IO (the stream reader runs
outside a SparkSession); table paths must be locally reachable —
mount-style URIs would swap these two helpers for fsspec, the protocol
is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

__all__ = ["VersionedCdcDataSource", "register_versioned_cdc_source"]


def _versions(path: str) -> list[int]:
    mdir = os.path.join(path, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, "_manifests", f"v{version:08d}.json")) as f:
        return json.load(f)


def _span_files(path: str, start_v: int, end_v: int) -> list[str]:
    """New files committed over (start_v, end_v] — the read_changes
    file diff, with the same rewrite refusal. start_v == -1 means the
    INITIAL SNAPSHOT: every file of end_v, which is well-defined no
    matter what ops produced it, so historic rewrites are NOT checked
    there (a table that once saw a delete/upsert/optimize can still
    START a stream — Delta-source semantics; only rewrites arriving
    AFTER the stream's snapshot refuse)."""
    target = _manifest(path, end_v)
    if start_v < 0:
        return sorted(target["files"])
    for v in _versions(path):
        if start_v < v <= end_v:
            op = _manifest(path, v).get("op")
            if op not in ("append", "create"):
                raise ValueError(
                    f"versioned_cdc: version {v} is op '{op}' (rewrite) — "
                    "a change stream is only defined along append-only "
                    "chains; restart the stream from a fresh snapshot"
                )
    base = set(_manifest(path, start_v)["files"])
    return sorted(set(target["files"]) - base)


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(self, file: str | None):
            self.file = file

    class _VersionedCdcStreamReader(DataSourceStreamReader):
        def __init__(self, options, schema: T.StructType):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("versioned_cdc requires option 'path'")
            self._fields = [f.name for f in schema.fields]
            sv = options.get("startingversion", options.get("startingVersion"))
            self._start = int(sv) if sv is not None else -1

        def initialOffset(self) -> dict:
            return {"version": self._start}

        def latestOffset(self) -> dict:
            vs = _versions(self._path)
            return {"version": vs[-1] if vs else self._start}

        def partitions(self, start: dict, end: dict):
            s, e = start["version"], end["version"]
            if e <= s:
                return [_FilePartition(None)]
            files = _span_files(self._path, s, e)
            if not files:
                return [_FilePartition(None)]
            return [_FilePartition(f) for f in files]

        def read(self, partition):
            if partition.file is None:
                return
            import pyarrow.parquet as pq

            tbl = pq.read_table(partition.file)
            names = set(tbl.schema.names)
            for rec in tbl.to_pylist():
                # pre-evolution files NULL-fill manifest columns their
                # footer does not carry, as in snapshot reads
                yield tuple(
                    rec.get(name) if name in names else None
                    for name in self._fields
                )

        def commit(self, end: dict) -> None:
            pass  # offsets live in the engine checkpoint

    class VersionedCdcDataSource(DataSource):
        """``spark.readStream.format('versioned_cdc').option('path', p)``
        — a VersionedTable commit chain as a streaming source. The
        table schema is read from the head manifest (no inference, no
        user-declared schema to drift)."""

        @classmethod
        def name(cls) -> str:
            return "versioned_cdc"

        def schema(self) -> T.StructType:
            path = self.options.get("path")
            if not path:
                raise ValueError("versioned_cdc requires option 'path'")
            vs = _versions(path)
            if not vs:
                raise ValueError(f"versioned_cdc: no commits at {path}")
            m = _manifest(path, vs[-1])
            if "schema_json" not in m:
                raise ValueError(
                    "versioned_cdc: legacy manifest without schema_json"
                )
            return T.StructType.fromJson(json.loads(m["schema_json"]))

        def streamReader(self, schema: T.StructType):
            return _VersionedCdcStreamReader(self.options, schema)

    def register_versioned_cdc_source(spark: SparkSession) -> None:
        spark.dataSource.register(VersionedCdcDataSource)

except ImportError:  # pragma: no cover - pyspark < 4 fallback

    VersionedCdcDataSource = None  # type: ignore[assignment]

    def register_versioned_cdc_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "Python DataSource API requires pyspark >= 4"
        )
