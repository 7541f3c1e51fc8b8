"""REST-API JSON source + JSON/NDJSON landing formats (SURVEY.md §2.1
S1-S3, §2.2 K1-K2).

Reference: ``rest_api_json_to_gcs_operator.py:48-85`` GETs a JSON
array, re-serializes it (whole-array or NDJSON), and lands it in
object storage; the landing file is then re-read row-at-a-time.

Spark-first restatement, two ingestion paths:

- **Python DataSource** (Spark 4 ``spark.dataSource.register``):
  ``RestJsonDataSource`` makes the endpoint a first-class readable
  format — ``spark.read.format('rest_json').option('url', ...)`` —
  so the fetch participates in a real scan (schema projection, and
  per-partition reads when the API pages).
- **driver fetch → createDataFrame**: the small-payload path
  (reference's actual scale: 10-500 rows per endpoint).

URLs accept http(s) and file:// / plain paths — the transport is
stdlib ``urllib`` so offline runs (tests, air-gapped CI) exercise the
identical code path against local fixtures.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "fetch_json_records",
    "json_records_to_df",
    "read_json_landing",
    "write_json_array",
    "write_ndjson",
    "RestJsonDataSource",
    "register_rest_json_source",
]


def fetch_json_records(url: str, timeout: float = 30.0) -> list[dict]:
    """GET/read ``url`` and parse a JSON array (or NDJSON) into records.

    Mirrors the reference's extract step (S1): body must be a JSON
    array of objects; NDJSON bodies (one object per line) are accepted
    too (S3). Local paths / file:// URLs read from disk.
    """
    parsed = urlparse(url)
    if parsed.scheme in ("http", "https"):
        from urllib.request import urlopen  # stdlib; no extra deps

        with urlopen(url, timeout=timeout) as resp:  # noqa: S310
            body = resp.read().decode("utf-8")
    else:
        if parsed.scheme == "file":
            # RFC 8089: honor the netloc form (file://localhost/...)
            # and percent-encoding, instead of a raw prefix strip
            from urllib.request import url2pathname

            netloc = "" if parsed.netloc in ("", "localhost") else parsed.netloc
            path = url2pathname(f"//{netloc}{parsed.path}" if netloc else parsed.path)
        else:
            path = url
        with open(path, encoding="utf-8") as fh:
            body = fh.read()
    body = body.strip()
    if not body:
        return []
    if body.startswith("["):
        records = json.loads(body)
        if not isinstance(records, list):
            raise ValueError(f"expected JSON array at {url!r}")
    else:  # NDJSON
        records = [json.loads(line) for line in body.splitlines() if line.strip()]
    # both branches produce a LIST; the contract is records-of-objects,
    # so validate the elements (r8 review: a scalar/error body used to
    # pass silently and crash later inside an executor)
    bad = next((r for r in records if not isinstance(r, dict)), None)
    if bad is not None:
        raise ValueError(
            f"expected JSON array of objects (or NDJSON) at {url!r}; "
            f"got element of type {type(bad).__name__}"
        )
    return records


def json_records_to_df(
    spark: SparkSession, records: Sequence[dict], schema: T.StructType | str
) -> DataFrame:
    """Driver-fetched records → DataFrame under an EXPLICIT schema
    (DDL-as-source-of-truth, SURVEY §1.1 — no inference drift)."""
    return spark.createDataFrame(records, schema)


def read_json_landing(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a JSON landing zone (S2/S3). ``multiline=True`` for the
    whole-array object form (K1); default NDJSON — Spark's native,
    splittable JSON layout.

    Bad-record policy (the reference RAISES on any invalid payload,
    ``rest_api_json_to_gcs_operator.py:53-67``; at warehouse scale a
    poison record must not kill the load):
    - ``PERMISSIVE`` (default): malformed rows null-fill; pass
      ``corrupt_col`` to capture the raw text for quarantine.
    - ``DROPMALFORMED``: silently drop bad rows.
    - ``FAILFAST``: reference-parity strictness — raise on first bad row.
    """
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        schema = (
            T._parse_datatype_string(schema) if isinstance(schema, str) else schema
        )
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    if multiline:
        reader = reader.option("multiLine", True)
    return reader.json(path)


def write_json_array(df: DataFrame, path: str) -> None:
    """K1: single whole-array JSON object. DRIVER-SIDE collect — the
    reference's format choice, kept only for small dimension payloads;
    it is inherently single-file and unsplittable (anti-scale; prefer
    ``write_ndjson``).

    Paths with a scheme (``gs://``, ``s3a://``, ``hdfs://``,
    ``file://``) write through the Hadoop FileSystem API — the same
    object-store target the reference lands in
    (``dags/operators/rest_api_json_to_gcs_operator.py:69-76``);
    bare paths use the local filesystem directly."""
    records = [row.asDict(recursive=True) for row in df.collect()]
    payload = json.dumps(records, default=str)
    if "://" in path:
        sc = df.sparkSession.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        stream = fs.create(jpath, True)
        try:
            stream.write(bytearray(payload.encode("utf-8")))
        finally:
            stream.close()
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(payload)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: NDJSON directory write — Spark's default JSON writer IS
    NDJSON; one file per partition, parallel, splittable on re-read."""
    df.write.mode(mode).json(path)


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource
# ---------------------------------------------------------------------------

try:  # the DataSource API needs pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        SimpleDataSourceStreamReader,
    )

    class _RestJsonReader(DataSourceReader):
        def __init__(self, options, schema: T.StructType):
            self._url = options.get("url")
            if not self._url:
                raise ValueError("rest_json source requires option 'url'")
            self._schema = schema

        def read(self, partition) -> Iterator[tuple]:
            field_names = [f.name for f in self._schema.fields]
            for rec in fetch_json_records(self._url):
                yield tuple(rec.get(name) for name in field_names)

    class _RestJsonStreamReader(SimpleDataSourceStreamReader):
        """Incremental poller for an append-only JSON feed: the stream
        offset is the number of records already emitted; each
        micro-batch re-fetches the endpoint and emits only the tail.
        Offsets are checkpointed by the engine → exactly-once delivery
        across restarts (readBetweenOffsets replays a committed span).
        """

        def __init__(self, options, schema: T.StructType):
            self._url = options.get("url")
            if not self._url:
                raise ValueError("rest_json source requires option 'url'")
            self._fields = [f.name for f in schema.fields]

        def initialOffset(self) -> dict:
            return {"pos": 0}

        def _rows(self, lo: int, hi: int | None):
            recs = fetch_json_records(self._url)
            recs = recs[lo:hi] if hi is not None else recs[lo:]
            return [
                tuple(rec.get(name) for name in self._fields) for rec in recs
            ], lo + len(recs)

        def read(self, start: dict):
            rows, new_pos = self._rows(start["pos"], None)
            return iter(rows), {"pos": new_pos}

        def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
            rows, _ = self._rows(start["pos"], end["pos"])
            return iter(rows)

    class RestJsonDataSource(DataSource):
        """``spark.read.format('rest_json').schema(s).option('url', u)``
        — the reference's REST extract (S1) as a native scan node; the
        same format also works with ``spark.readStream`` as an
        incremental append-only feed poller.

        Batch: single partition per endpoint (a REST array is one
        object); paged APIs would override ``partitions()`` to fan out
        one partition per page read concurrently on executors.
        """

        @classmethod
        def name(cls) -> str:
            return "rest_json"

        def schema(self):
            raise NotImplementedError(
                "rest_json requires an explicit .schema(...) "
                "(DDL-as-source-of-truth; no inference)"
            )

        def reader(self, schema: T.StructType) -> DataSourceReader:
            return _RestJsonReader(self.options, schema)

        def simpleStreamReader(
            self, schema: T.StructType
        ) -> SimpleDataSourceStreamReader:
            return _RestJsonStreamReader(self.options, schema)

    def register_rest_json_source(spark: SparkSession) -> None:
        spark.dataSource.register(RestJsonDataSource)

except ImportError:  # pragma: no cover - pyspark < 4 fallback

    RestJsonDataSource = None  # type: ignore[assignment]

    def register_rest_json_source(spark: SparkSession) -> None:
        raise NotImplementedError("Python DataSource API requires pyspark >= 4")
