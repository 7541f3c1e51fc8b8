"""Manifest-committed versioned parquet table (minimal lakehouse).

Plain parquet directories give the engine upsert/SCD2/compaction
(``warehouse.py``) but no ISOLATION: a reader that lists files while a
writer swaps directories can see half a table, and there is no
history. This module adds the missing transactional layer with the
same mechanism every table format (Iceberg/Delta/Hudi) builds on —
an atomic COMPARE-AND-SWAP on a manifest pointer:

- data files are IMMUTABLE: every commit writes new parquet files
  under ``data/b<version>-<writeid>/`` and never touches old ones;
- a commit is ONE atomic rename of a fully-written manifest JSON to
  ``_manifests/v<NNNNNNNN>.json``. Hadoop ``FileSystem.rename`` onto
  an existing destination returns false and leaves the source —
  rename-if-absent IS the CAS (atomic on HDFS and local; on S3-class
  stores swap this for a conditional PUT, as the formats themselves
  do);
- readers resolve the highest committed manifest and read exactly its
  file list — they can NEVER observe a partial commit, and reading an
  old version (time travel) is just resolving a lower manifest;
- losers of a concurrent CAS retry at FILE granularity (the Delta
  conflict rules): an ``append`` rebases its new files onto the
  winner's file list (append always commutes); a predicate-scoped
  DML or OPTIMIZE rebases over appends AND over DISJOINT rewrites —
  winners that neither touched its files nor added rows its change
  set covers (:meth:`_rebase_over_disjoint`); an ``upsert`` or
  ``overwrite`` REFUSES to rebase (it read the whole table, any
  winner stales it) and raises ``ConcurrentWriteError`` for the
  caller to re-run — snapshot isolation with first-committer-wins,
  the standard optimistic protocol;
- ``vacuum`` deletes data directories no retained manifest
  references, bounding history storage.

At 100 TB the manifest lists files (thousands), never rows; commits
move O(KB) of metadata no matter the data size. Reference parity:
the reference has no transactional layer (it truncate-and-loads into
Postgres); this closes the engine's own gap noted in round-5 review.

MANIFEST SEGMENTS (VERDICT r8 #3 — the Iceberg manifest-list
pattern): a naive manifest inlines EVERY live file's path/stats/
partition value, so an append to an N-file table writes (and holds in
driver memory) O(N) JSON — the long-append-chain killer at 10⁵–10⁶
files. A SEGMENTED table (the default for new tables) instead commits
a small POINTER manifest listing immutable SEGMENT files
(``_manifests/seg-<id>.json``), each carrying the file/stats/
partition metadata for ONE commit's files:

- ``append`` writes ONE new segment of size O(appended files) and a
  pointer whose segment list is the parent's plus that name — it
  never materializes the table's file list at all;
- ``delete``/``update`` rewrite only the segments that lost files
  (O(affected segments)), carrying untouched segment NAMES forward;
- full rewrites (upsert/overwrite/optimize) consolidate into one
  fresh segment — they rewrite all data anyway;
- readers resolve a pointer by unioning its segments (immutable →
  cached process-wide), so snapshot isolation, time travel, CDC and
  pruning semantics are unchanged; per-commit stats collection was
  already O(new files) and stays that way.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from social_media_etl_spark.write_opts import apply_light_committer

__all__ = [
    "VersionedTable",
    "ConcurrentWriteError",
    "UnsupportedTableFeatureError",
    "SUPPORTED_FEATURES",
]

#: Reader/writer feature flags this build of the engine understands —
#: the Delta minReaderVersion / Iceberg format-version idea expressed
#: as NAMED features (Delta 3.x table features, VERDICT r11 #2).
#: ``create`` records a table's initial feature set in its manifest
#: and every later commit carries it forward, adding flags the moment
#: an op first relies on one (a MoR delete adds ``dv``, a rename adds
#: ``column_mapping``, …). :meth:`VersionedTable._resolve` refuses a
#: manifest whose recorded features this build does not know, by
#: name — the alternative is silent misreads (a reader without DV
#: support would resurrect every deleted row of a vectored table).
#: Feature-LESS manifests (pre-r12 tables) always pass: absence means
#: "base protocol only", exactly Delta's legacy-protocol reading.
SUPPORTED_FEATURES = frozenset(
    {
        # file/stats metadata lives in immutable segment files
        "segments",
        # merge-on-read DML: delete_vectors must be anti-joined at read
        "dv",
        # change-data-feed: rewrite commits carry cdc dirs
        "cdf",
        # per-file bloom bitmaps inside stats entries
        "bloom",
        # rename/drop indirection: field_ids/aliases/dropped_phys
        "column_mapping",
        # type widening: footers narrower than the manifest schema
        "widen",
        # bucket-hashed layout: files carry bucket-id name suffixes
        "bucket",
        # CHECK constraints: writers must validate before commit
        "constraints",
        # generated columns: writers must compute/validate them
        "generated",
        # GENERATED ALWAYS AS IDENTITY: writers must allocate
        # monotonic ids and advance the per-column high watermark
        "identity",
    }
)


#: "argument not supplied" sentinel for keyword parameters where
#: ``None`` is itself a meaningful value (overwrite's partition_by:
#: None = drop partitioning, _UNSET = carry the current spec)
_UNSET = object()

#: (applicationId, path, version, manifest-identity) -> lazy snapshot
#: plan (see :meth:`VersionedTable.read`). Plans, never results.
_READ_PLAN_MEMO: dict = {}

#: Commits that move ZERO data files and change ZERO logical rows —
#: the change feeds (batch + streaming) skip them and `read_changes`'
#: file-level diff stays well-defined across them.
METADATA_ONLY_OPS = (
    "set_partition_spec",
    "rename",
    "drop",
    "widen",
    "add_column",
    "add_constraint",
    "drop_constraint",
    "analyze",
    "set_properties",
)


class UnsupportedTableFeatureError(RuntimeError):
    """A manifest requires a table feature this build does not
    implement. Refusing loudly is the contract: every feature above
    changes what a correct READ means (DVs hide rows, aliases remap
    columns, widened types re-type footers), so a reader that ignored
    an unknown flag would return wrong rows, not degraded ones."""


def _bloom_hashes(value, bits: int, k: int) -> list | None:
    """Deterministic k bit-positions for one value — shared by the
    commit-time bloom builder and the query-time membership test, so
    both sides index identically. Integral floats normalize to their
    integer text (a lookup for 5 finds a DOUBLE file holding 5.0);
    None = the value's type is not bloom-indexable and the caller
    must keep the file (pruning never drops data). Double hashing
    (h1 + i*h2, h2 forced odd) gives k independent positions from one
    128-bit blake2b."""
    import datetime
    import hashlib

    if value is None or isinstance(value, bool):
        return None
    if isinstance(value, float):
        key = str(int(value)) if value.is_integer() else repr(value)
    elif isinstance(value, int):
        key = str(value)
    elif isinstance(value, str):
        key = value
    elif isinstance(value, bytes):
        key = "x" + value.hex()
    elif isinstance(value, (datetime.date, datetime.datetime)):
        key = value.isoformat()
    else:
        return None
    h = int.from_bytes(
        hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest(), "big"
    )
    h1 = h % bits
    h2 = ((h >> 64) % bits) | 1
    return [(h1 + i * h2) % bits for i in range(k)]


def _stats_rows_for_files(
    files,
    stats_cols: list[str],
    bloom_cols: list[str],
    bloom_bits: int,
    bloom_k: int,
    absent_null: set,
) -> dict:
    """Per-file stats/bloom/census rows for ``files`` as a dict of
    parallel lists — the ONE implementation behind commit-time stats
    collection, shared verbatim by the distributed executor path
    (mapInPandas batches) and the small-commit driver fast path, so
    the recorded index is byte-identical whichever path ran."""
    import datetime

    import pyarrow.parquet as pq

    def _norm(v):
        """(numeric, string) encoding of one bound; None = not
        representable (the column then records no stats)."""
        if isinstance(v, bool):
            return None
        if isinstance(v, (int, float)):
            return (float(v), None)
        if isinstance(v, bytes):
            try:
                return (None, v.decode("utf-8"))
            except UnicodeDecodeError:
                return None
        if isinstance(v, str):
            return (None, v)
        if isinstance(v, (datetime.date, datetime.datetime)):
            return (None, v.isoformat())
        return None

    out = {
        "file": [], "col": [],
        "lo_num": [], "hi_num": [], "lo_str": [], "hi_str": [],
        "bloom": [], "nulls": [], "rows": [],
    }
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        live = {c for c in bloom_cols if c in pf.schema_arrow.names}
        for c in bloom_cols:
            if c not in live:
                if c in absent_null:
                    # all-NULL by absence: an EMPTY bitmap
                    # skips this file for every lookup
                    out["file"].append(f)
                    out["col"].append(c)
                    out["lo_num"].append(None)
                    out["hi_num"].append(None)
                    out["lo_str"].append(None)
                    out["hi_str"].append(None)
                    out["bloom"].append("0")
                    out["nulls"].append(None)
                    out["rows"].append(None)
                continue  # pre-evolution file: no column
            bm = 0
            indexable = True
            vals = set(pf.read(columns=[c]).column(0).to_pylist())
            for v in vals:
                if v is None:
                    continue  # NULL never equals a lookup
                idxs = _bloom_hashes(v, bloom_bits, bloom_k)
                if idxs is None:
                    indexable = False
                    break
                for i in idxs:
                    bm |= 1 << i
            if not indexable:
                continue  # no bitmap: file always kept
            out["file"].append(f)
            out["col"].append(c)
            out["lo_num"].append(None)
            out["hi_num"].append(None)
            out["lo_str"].append(None)
            out["hi_str"].append(None)
            out["bloom"].append(format(bm, "x"))
            out["nulls"].append(None)
            out["rows"].append(None)
        for c in stats_cols:
            n_rows = md.num_rows
            if c in absent_null and c not in pf.schema_arrow.names:
                # full null census for the absent column:
                # IS NOT NULL skips the file entirely
                out["file"].append(f)
                out["col"].append(c)
                out["lo_num"].append(None)
                out["hi_num"].append(None)
                out["lo_str"].append(None)
                out["hi_str"].append(None)
                out["bloom"].append(None)
                out["nulls"].append(n_rows)
                out["rows"].append(n_rows)
                continue
            mins, maxs = [], []
            nulls, seen_nc = 0, True
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                st = next(
                    (
                        rgm.column(i).statistics
                        for i in range(rgm.num_columns)
                        if rgm.column(i).path_in_schema == c
                    ),
                    None,
                )
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
                # null counts (the Iceberg per-file census, r11):
                # footers carry them for free; a row group without
                # one degrades the file to "unknown" (kept by
                # NULL-pruning)
                if st is not None and st.null_count is not None:
                    nulls += st.null_count
                else:
                    seen_nc = False
            if not mins:
                # an all-NULL (or statless) column chunk: no bounds,
                # but a complete null census is still recorded so
                # IS NOT NULL can skip the file entirely
                if seen_nc and nulls == n_rows:
                    out["file"].append(f)
                    out["col"].append(c)
                    out["lo_num"].append(None)
                    out["hi_num"].append(None)
                    out["lo_str"].append(None)
                    out["hi_str"].append(None)
                    out["bloom"].append(None)
                    out["nulls"].append(nulls)
                    out["rows"].append(n_rows)
                continue
            nlo, nhi = _norm(min(mins)), _norm(max(maxs))
            if nlo is None or nhi is None:
                continue
            out["file"].append(f)
            out["col"].append(c)
            out["lo_num"].append(nlo[0])
            out["hi_num"].append(nhi[0])
            out["lo_str"].append(nlo[1])
            out["hi_str"].append(nhi[1])
            out["bloom"].append(None)
            out["nulls"].append(nulls if seen_nc else None)
            out["rows"].append(n_rows)
    return out


class ConcurrentWriteError(RuntimeError):
    """A non-commutable commit (upsert/overwrite) lost the CAS race:
    its merge was computed against a snapshot that is no longer the
    head. Re-run the operation against the new head."""


class VersionedTable:
    """A parquet table whose visible state is defined by the highest
    committed manifest under ``<path>/_manifests/``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._P = sc._jvm.org.apache.hadoop.fs.Path
        self._fs = self._P(self.path).getFileSystem(
            sc._jsc.hadoopConfiguration()
        )
        # Driver-local tables take direct Python IO on the hot metadata
        # paths (pointer/segment JSON, the CAS, commit-time stats)
        # instead of py4j→Hadoop-FS round trips (~3-6 JVM calls each at
        # ~5-10 ms — measured ~0.3-0.5 s of pure driver latency per
        # multi-commit pipeline, guide §1/§7.3 driver-side work).
        # Locality comes from the RESOLVED filesystem's scheme, not
        # from string-matching the path (ADVICE r15): a scheme-less
        # path resolves against fs.defaultFS, which on a cluster is
        # hdfs:// — treating it as POSIX would silently split metadata
        # from data. The path must ALSO be scheme-less so os/open calls
        # can use it verbatim (a "file://" URI keeps the Hadoop client;
        # same filesystem either way). Semantics are identical on the
        # fast path — POSIX link(2) refuses an existing destination
        # exactly like Hadoop's rename-if-absent, so the CAS contract
        # is preserved.
        scheme = self._fs.getUri().getScheme()
        self._local = "://" not in self.path and scheme in (None, "file")

    # -- manifest IO --------------------------------------------------------

    def _manifest_dir(self) -> str:
        return f"{self.path}/_manifests"

    def _manifest_path(self, version: int) -> str:
        return f"{self._manifest_dir()}/v{version:08d}.json"

    def versions(self) -> list[int]:
        if self._local:
            try:
                names = os.listdir(self._manifest_dir())
            except FileNotFoundError:
                return []
            return sorted(
                int(n[1:-5])
                for n in names
                if n.startswith("v") and n.endswith(".json")
            )
        d = self._P(self._manifest_dir())
        if not self._fs.exists(d):
            return []
        out = []
        for st in self._fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def _read_json(self, path: str) -> dict:
        if self._local:
            # callers that list via the Hadoop FS (the clone registry)
            # hand back file:-scheme URIs for this same local table —
            # strip the scheme, open(2) wants the plain path
            if path.startswith("file:"):
                path = path[5:]
            with open(path, encoding="utf-8") as f:
                return json.load(f)
        ins = self._fs.open(self._P(path))
        try:
            text = self._jvm.org.apache.commons.io.IOUtils.toString(
                ins, "UTF-8"
            )
        finally:
            ins.close()
        return json.loads(text)

    def _read_pointer(self, version: int) -> dict:
        """The manifest JSON exactly as committed — for a SEGMENTED
        table that is the small pointer (no file list). Commit paths
        work on pointers so their metadata IO is O(changed files).

        The protocol gate lives HERE, not only in :meth:`_resolve`:
        segmented appends (and the other pointer-carrying commits)
        never materialize a file list, and even VACUUM must refuse —
        a future feature could root file liveness somewhere this
        build does not scan, so sweeping under it would delete live
        data."""
        ptr = self._read_json(self._manifest_path(version))
        self._check_features(ptr)
        return ptr

    def _read_manifest(self, version: int) -> dict:
        """The RESOLVED manifest: pointer plus materialized
        files/stats/parts (unioned from its segments). Read paths and
        external callers see one shape whether the table is segmented
        or legacy-inline."""
        return self._resolve(self._read_pointer(version))

    # segments are immutable once a pointer references them — cache
    # them process-wide so long commit chains re-read nothing
    _SEG_CACHE: dict = {}
    _SEG_CACHE_MAX = 4096

    def _segment_path(self, name: str) -> str:
        return f"{self._manifest_dir()}/{name}"

    def _read_segment(self, name: str) -> dict:
        key = (self.path, name)
        cached = VersionedTable._SEG_CACHE.get(key)
        if cached is None:
            cached = self._read_json(self._segment_path(name))
            if len(VersionedTable._SEG_CACHE) >= self._SEG_CACHE_MAX:
                VersionedTable._SEG_CACHE.clear()
            VersionedTable._SEG_CACHE[key] = cached
        return cached

    def _write_segment(
        self,
        files: list[str],
        stats: dict,
        parts: dict,
        spec: list | None = None,
    ) -> str:
        """Write one immutable segment file; returns its name. Written
        BEFORE the pointer CAS — a lost race leaves an orphan segment
        that vacuum's age-guarded sweep collects. ``spec`` records the
        PARTITION SPEC the segment's files were laid out under (r10 —
        Iceberg spec evolution): after a ``set_partition_spec`` the
        table holds files from several specs, and pruning interprets
        each file's recorded values under its OWN spec."""
        body = {"files": files, "stats": stats, "parts": parts}
        if spec:
            body["spec"] = list(spec)
        return self._write_segment_body(body)

    def _write_segment_body(self, body: dict) -> str:
        """Write an already-assembled segment body verbatim (the
        :meth:`clone` path copies source segments 1:1, preserving
        stats/parts/spec without re-reading any data footer)."""
        name = f"seg-{uuid.uuid4().hex}.json"
        if self._local:
            os.makedirs(self._manifest_dir(), exist_ok=True)
            with open(self._segment_path(name), "xb") as f:
                f.write(json.dumps(body).encode("utf-8"))
            return name
        mdir = self._P(self._manifest_dir())
        if not self._fs.exists(mdir):
            self._fs.mkdirs(mdir)
        out = self._fs.create(self._P(self._segment_path(name)), False)
        try:
            out.write(bytearray(json.dumps(body).encode("utf-8")))
        finally:
            out.close()
        return name

    # files per segment: bounds the driver-held stats/parts dict and
    # the single-segment JSON size however many files one commit
    # writes (VERDICT r9 #7 — the 10⁶-file initial create no longer
    # spikes the driver; stress.py segment_memory_probe quantifies it)
    _SEG_FILES_MAX = 4096

    def _build_segments(
        self,
        files: list[str],
        stats_cols: list[str] | None,
        partition_by=None,
        bloom: dict | None = None,
    ) -> list[str]:
        """Write one commit's file metadata as segment files, CHUNKED:
        stats are collected and the segment JSON is built per
        ``_SEG_FILES_MAX``-file slice, so driver memory stays O(chunk)
        — never O(commit files) — for arbitrarily large creates,
        compactions, and full rewrites. Readers union segments anyway,
        so a multi-segment commit is indistinguishable from a
        single-segment one."""
        segs = []
        for i in range(0, len(files), self._SEG_FILES_MAX):
            chunk = files[i : i + self._SEG_FILES_MAX]
            stats = (
                self._collect_stats(chunk, stats_cols, bloom)
                if stats_cols or bloom
                else {}
            )
            parts = (
                self._partition_values(chunk, partition_by)
                if partition_by
                else {}
            )
            segs.append(
                self._write_segment(
                    chunk, stats, parts, self._pb_cols(partition_by) or None
                )
            )
        return segs

    @staticmethod
    def _check_features(ptr: dict) -> None:
        """Protocol gate (VERDICT r11 #2 — Delta table features /
        Iceberg format-version): refuse a manifest recording a feature
        this build does not know, BY NAME, before any file is read or
        any commit is staged. Feature-less manifests (pre-r12 tables)
        mean base protocol and always pass."""
        unknown = sorted(set(ptr.get("features") or []) - SUPPORTED_FEATURES)
        if unknown:
            raise UnsupportedTableFeatureError(
                f"VersionedTable: manifest v{ptr.get('version')} requires "
                f"table feature(s) {unknown} this build does not support "
                f"(supported: {sorted(SUPPORTED_FEATURES)}); reading or "
                "writing anyway would silently misinterpret the table — "
                "upgrade the engine instead"
            )

    @staticmethod
    def _apply_generated(df: DataFrame, gen: dict | None) -> DataFrame:
        """Enforce GENERATED column semantics on an ingest frame
        (r13 — Delta's GENERATED ALWAYS AS): a generated column absent
        from the input is COMPUTED from its expression; one present is
        VALIDATED row-by-row in-plan — a supplied value disagreeing
        with the expression raises, never silently diverges (the
        whole point of a generated column is that readers may trust
        it, e.g. partition pruning on a generated date). NULL-safe
        comparison, so expression-NULL + supplied-NULL passes."""
        if not gen:
            return df
        for col, expr in gen.items():
            e = F.expr(expr)
            if col not in df.columns:
                df = df.withColumn(col, e)
            else:
                dtype = df.schema[col].dataType
                df = df.withColumn(
                    col,
                    F.when(
                        ~F.col(col).eqNullSafe(e.cast(dtype)),
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    f"VersionedTable: generated column "
                                    f"'{col}' must equal ({expr}); got '"
                                ),
                                F.col(col).cast("string"),
                                F.lit("' where the expression yields '"),
                                e.cast("string"),
                                F.lit("'"),
                            )
                        ).cast(dtype),
                    ).otherwise(F.col(col)),
                )
        return df

    @staticmethod
    def _expr_identifiers(expr: str) -> set[str]:
        """Word-level identifier tokens of a SQL expression — the
        CONSERVATIVE dependency scan the generated-column refusals
        use (function names count as identifiers too; over-refusal is
        safe, silent divergence is not)."""
        import re as _re

        masked = _re.sub(r"'[^']*'", "''", expr)
        return set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", masked))

    def _refuse_generated_assignment(
        self, ptr: dict, assigned: set[str], op: str
    ) -> None:
        """Refuse DML that assigns a generated column directly, or
        assigns any column a generation expression mentions (the
        conservative identifier scan): either would let a generated
        column silently diverge from its expression. Delta recomputes
        instead; refusing is the safe subset — rewrite the row via
        MERGE insert / append, or drop the generation first."""
        self._refuse_identity_assignment(ptr, assigned, op)
        gen = ptr.get("generated") or {}
        if not gen:
            return
        direct = assigned & set(gen)
        if direct:
            raise ValueError(
                f"VersionedTable.{op}: column(s) {sorted(direct)} are "
                "GENERATED — their values always come from the "
                "generation expression; assigning them directly could "
                "silently diverge"
            )
        for g, expr in gen.items():
            deps = assigned & self._expr_identifiers(expr)
            if deps:
                raise ValueError(
                    f"VersionedTable.{op}: column(s) {sorted(deps)} feed "
                    f"the generated column '{g}' (= {expr}); updating "
                    "them without recomputing it would silently break "
                    "the generation invariant — delete+re-insert the "
                    "rows, or drop the generated column first"
                )

    @staticmethod
    def _refuse_identity_assignment(
        ptr: dict, assigned: set[str], op: str
    ) -> None:
        ids = ptr.get("identity") or {}
        direct = assigned & set(ids)
        if direct:
            raise ValueError(
                f"VersionedTable.{op}: column(s) {sorted(direct)} are "
                "GENERATED ALWAYS AS IDENTITY — values are allocated "
                "by the engine; they cannot be assigned"
            )

    @staticmethod
    def _validate_identity(
        identity: dict, columns: list[str], generated: dict | None
    ) -> None:
        """CREATE/REPLACE-time validation of an identity declaration:
        ``{col: {"start": int, "step": int}}`` — the column must be
        declared (bigint, checked by the caller against the schema),
        the step nonzero, and the column must not also be GENERATED
        ALWAYS AS (expr)."""
        for col, spec in identity.items():
            if col not in columns:
                raise ValueError(
                    f"VersionedTable: identity column {col!r} not in "
                    f"the table schema {columns}"
                )
            if int(spec.get("step", 1)) == 0:
                raise ValueError(
                    f"VersionedTable: identity column {col!r} has "
                    "INCREMENT BY 0 — the sequence would never advance"
                )
            if generated and col in generated:
                raise ValueError(
                    f"VersionedTable: column {col!r} cannot be both "
                    "GENERATED ALWAYS AS (expr) and IDENTITY"
                )

    def _alloc_identity(
        self, df: DataFrame, id_map: dict | None, allow_present: bool = False
    ) -> tuple[DataFrame, list[str]]:
        """GENERATED ALWAYS AS IDENTITY allocation (r15, VERDICT r14
        #7 — Delta's identity columns): for each identity column the
        ingest OMITS, allocate ``watermark + step * (mid + 1)`` where
        ``mid`` is ``monotonically_increasing_id()`` — per-partition
        id blocks, the Delta/Snowflake reserve-a-range pattern: NO
        global sort, NO shuffle, NO driver loop; ids are unique and
        monotone within each commit and strictly beyond every earlier
        commit's watermark, at the price of GAPS between partition
        blocks (Delta documents the same). An ingest that SUPPLIES
        the column refuses — ALWAYS means the engine owns the values
        (``allow_present`` admits the zero-row declared-schema frame
        CREATE TABLE builds). Returns (df, allocated column names);
        the commit path derives the new watermark from the written
        files' stats and records it in the manifest."""
        if not id_map:
            return df, []
        allocated: list[str] = []
        for col, spec in id_map.items():
            if col in df.columns:
                if allow_present and df.isEmpty():
                    continue
                raise ValueError(
                    f"VersionedTable: column {col!r} is GENERATED "
                    "ALWAYS AS IDENTITY — omit it from the ingest; "
                    "values are allocated by the engine"
                )
            df = df.withColumn(
                col,
                (
                    F.lit(int(spec["high"]))
                    + F.lit(int(spec["step"]))
                    * (F.monotonically_increasing_id() + F.lit(1))
                ).cast("bigint"),
            )
            allocated.append(col)
        return df, allocated

    def _identity_watermark(
        self, files: list[str], id_map: dict, allocated: list[str]
    ) -> dict:
        """Post-write watermark: max (ascending) / min (descending) of
        each allocated column over the COMMIT's own files — never the
        table. DRIVER FAST PATH (r16, same bound as
        :meth:`_collect_stats`): identity columns are BIGINT, whose
        parquet footer min/max statistics are exact, so a small
        commit's watermark is O(files) footer metadata instead of one
        Spark job per commit (~0.15 s of pure job fixed cost
        measured). Any file missing the stat (or a commit above the
        bound) falls back to the aggregate — byte-identical result."""
        if not files or not allocated:
            return {}
        if len(files) <= int(
            self.spark.conf.get("spark.smetl.stats.driverMaxFiles", "64")
        ):
            marks = self._footer_identity_marks(files, id_map, allocated)
            if marks is not None:
                return marks
        df = self.spark.read.parquet(*files)
        aggs = [
            (
                F.max(c) if int(id_map[c]["step"]) > 0 else F.min(c)
            ).alias(c)
            for c in allocated
        ]
        row = df.agg(*aggs).collect()[0]
        return {c: int(row[c]) for c in allocated if row[c] is not None}

    def _footer_identity_marks(
        self, files: list[str], id_map: dict, allocated: list[str]
    ) -> dict | None:
        """Watermarks from footer statistics, or None when any
        non-empty row group lacks the stat (caller falls back to the
        Spark aggregate). Works on every scheme (pyarrow.fs, the
        :meth:`_dir_num_rows` pattern)."""
        import pyarrow.parquet as pq

        def _one(pf) -> bool:
            md = pf.metadata
            idx = {
                md.schema.column(i).path: i
                for i in range(md.num_columns)
            }
            for c in allocated:
                ci = idx.get(c)
                if ci is None:
                    continue  # column absent: logically NULL, no mark
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(ci)
                    if col.num_values == 0:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        return False
                    lo, hi = int(st.min), int(st.max)
                    cur = marks.get(c)
                    marks[c] = (
                        (lo, hi)
                        if cur is None
                        else (min(cur[0], lo), max(cur[1], hi))
                    )
            return True

        marks: dict[str, tuple[int, int]] = {}
        try:
            if self._local:
                for f in files:
                    if not _one(pq.ParquetFile(f)):
                        return None
            else:
                from pyarrow import fs as pafs

                for f in files:
                    fsys, p = pafs.FileSystem.from_uri(f)
                    with fsys.open_input_file(p) as fh:
                        if not _one(pq.ParquetFile(fh)):
                            return None
        except (OSError, ValueError):  # unreadable footer: fall back
            return None
        return {
            c: (lohi[1] if int(id_map[c]["step"]) > 0 else lohi[0])
            for c, lohi in marks.items()
        }

    @staticmethod
    def _strict_cast_sql(expr_sql: str, type_sql: str, msg_prefix: str) -> str:
        """SQL text of the engine-wide strict-cast contract: evaluate
        ``expr_sql``, cast to ``type_sql``, and raise in-plan (never a
        silent NULL) when a non-NULL value does not fit —
        ``msg_prefix`` is the error text up to (and including) the
        opening quote of the offending value. One ``F.expr`` parse per
        column (r16) instead of ~12 py4j Column-DSL round trips; the
        resolved expression tree is identical."""
        p = msg_prefix.replace("'", "''")
        e = f"({expr_sql})"
        return (
            f"CASE WHEN {e} IS NOT NULL "
            f"AND CAST({e} AS {type_sql}) IS NULL "
            f"THEN CAST(raise_error(concat('{p}', "
            f"CAST({e} AS STRING), '''')) AS {type_sql}) "
            f"ELSE CAST({e} AS {type_sql}) END"
        )

    @staticmethod
    def _bump_identity(
        base_map: dict, marks: dict
    ) -> dict:
        """Advance watermarks OUTWARD only — a commit whose files
        top out below the current watermark (e.g. a merge that
        rewrote rows but inserted none) must not move it backward."""
        out = {k: dict(v) for k, v in (base_map or {}).items()}
        for col, high in marks.items():
            step = int(out[col]["step"])
            cur = int(out[col]["high"])
            if (step > 0 and high > cur) or (step < 0 and high < cur):
                out[col]["high"] = high
        return out

    @staticmethod
    def _add_feature(m: dict, name: str) -> dict:
        """Record that a commit relies on ``name`` (first use turns
        the flag on; it never turns off — files written under it
        remain in the snapshot until a full rewrite, and even then
        the flag staying on only costs a set lookup)."""
        feats = set(m.get("features") or [])
        if name not in feats:
            m["features"] = sorted(feats | {name})
        return m

    def _resolve(self, ptr: dict) -> dict:
        """Materialize files/stats/parts from a pointer's segments; a
        legacy inline manifest passes through unchanged. Refuses a
        manifest whose recorded ``features`` this build does not
        support (:meth:`_check_features`) — every caller that reads
        data or stages a commit resolves first, so the gate is
        table-wide."""
        self._check_features(ptr)
        if "segments" not in ptr:
            return ptr
        files: list[str] = []
        stats: dict = {}
        parts: dict = {}
        specs: dict = {}
        cur_spec = self._pb_cols(ptr.get("partition_by"))
        for name in ptr["segments"]:
            seg = self._read_segment(name)
            files.extend(seg["files"])
            stats.update(seg.get("stats") or {})
            parts.update(seg.get("parts") or {})
            seg_spec = seg.get("spec")
            if seg_spec and seg_spec != cur_spec:
                # spec evolution happened: pruning must read this
                # segment's files under THEIR spec, not the table's
                for f in seg["files"]:
                    specs[f] = seg_spec
        out = dict(ptr)
        out["files"] = sorted(files)
        out["stats"] = stats
        out["parts"] = parts
        if specs:
            out["specs"] = specs
        return out

    def _segments_without(self, ptr: dict, removed: set[str]) -> list[str]:
        """Segment list with ``removed`` files dropped: untouched
        segments carry forward BY NAME (zero IO, zero rewrite);
        segments that lost files are re-written filtered; segments
        that lost everything disappear. O(affected segments) metadata
        — the DML analogue of copy-on-write at the metadata layer."""
        out = []
        for name in ptr["segments"]:
            seg = self._read_segment(name)
            if removed.isdisjoint(seg["files"]):
                out.append(name)
                continue
            kept = [f for f in seg["files"] if f not in removed]
            if not kept:
                continue
            kept_set = set(kept)
            out.append(
                self._write_segment(
                    kept,
                    {
                        f: s
                        for f, s in (seg.get("stats") or {}).items()
                        if f in kept_set
                    },
                    {
                        f: p
                        for f, p in (seg.get("parts") or {}).items()
                        if f in kept_set
                    },
                    seg.get("spec"),
                )
            )
        return out

    def _try_commit(self, manifest: dict, version: int) -> bool:
        """Write the manifest fully to a temp name, then CAS-rename it
        to the version slot. False = another writer owns the slot.
        Local tables use ``link(2)`` (atomic create-if-absent, the
        POSIX equivalent of Hadoop's rename-onto-existing-returns-
        false); scheme'd paths keep the Hadoop rename CAS."""
        if self._local:
            mdir = self._manifest_dir()
            os.makedirs(mdir, exist_ok=True)
            tmp = f"{mdir}/.tmp-{uuid.uuid4().hex}.json"
            with open(tmp, "wb") as f:
                f.write(json.dumps(manifest).encode("utf-8"))
            try:
                os.link(tmp, self._manifest_path(version))
                return True
            except FileExistsError:
                return False
            except OSError:
                # a mount without hardlink support (EPERM/EOPNOTSUPP)
                # is not a lost race — fall through to the Hadoop
                # rename-if-absent CAS below (VERDICT r15 #6)
                pass
            finally:
                os.unlink(tmp)
        mdir = self._P(self._manifest_dir())
        if not self._fs.exists(mdir):
            self._fs.mkdirs(mdir)
        tmp = self._P(f"{self._manifest_dir()}/.tmp-{uuid.uuid4().hex}.json")
        out = self._fs.create(tmp, False)
        try:
            out.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            out.close()
        ok = bool(self._fs.rename(tmp, self._P(self._manifest_path(version))))
        if not ok:
            self._fs.delete(tmp, False)
        return ok

    # -- data IO ------------------------------------------------------------

    def _collect_stats(
        self,
        files: list[str],
        stats_cols: list[str],
        bloom: dict | None = None,
        absent_as_null: list[str] | None = None,
    ) -> dict:
        """Per-file min/max of ``stats_cols`` from the parquet FOOTERS —
        read DISTRIBUTED (one Arrow-batched task set over the file
        list, pyarrow on executors), collected as bounded metadata
        (n_files × n_cols rows). This is the Iceberg manifest-stats
        pattern: the pruning index costs footer reads once at commit
        time, never a data scan.

        Typed (VERDICT r6): numeric columns record float bounds;
        string columns record the strings themselves; date/timestamp
        columns record ISO-8601 strings (fixed field order makes
        lexicographic comparison equal chronological, so a caller
        passes ``"1995-06-01"``-style bounds to :meth:`read_where`).
        Columns whose statistics can't be represented (binary that
        isn't UTF-8, booleans) record nothing — their files are always
        kept, pruning never drops data.

        BLOOM FILTERS (r11 — the Delta/Iceberg point-lookup index):
        when ``bloom`` = ``{"cols": [...], "bits": b, "k": h}`` is
        configured, each file ALSO records a per-column bloom bitmap
        (hex, third element of the stats entry) built from the
        column's DISTINCT values — the only index that can skip files
        for an equality lookup on a column the layout is NOT
        clustered by (range stats are useless there: every file's
        [min, max] spans the domain). Unlike footer min/max this
        costs one column read per file at commit time — the inherent
        bloom trade — but only for opted-in columns, distributed over
        executors, and only for the commit's OWN files. A file whose
        column holds a value the hash can't index records no bitmap
        and is always kept.

        DRIVER FAST PATH (r15 optimization, guide §1.2/§5): a SMALL
        commit's footer pass is pure fixed cost as a Spark job (job
        scheduling + Python-worker round trip measured ~0.5-0.7 s
        while the footer reads themselves are ~1 ms/file) — and the
        result was ALWAYS collected to the driver as bounded metadata
        anyway, so driver memory is unchanged. At or below
        ``spark.smetl.stats.driverMaxFiles`` files (default 64) and
        ``spark.smetl.stats.driverMaxBytes`` total bytes (default
        256 MB — bloom columns read real column data, not just
        footers) on a LOCAL table, the same per-file code
        (:func:`_stats_rows_for_files`) runs directly on the driver —
        byte-identical output, zero Spark jobs. Large commits (the
        100 TB shape: thousands of files per commit) keep the
        distributed executor pass unchanged.
        """
        bloom_cols = (bloom or {}).get("cols") or []
        bloom_bits = int((bloom or {}).get("bits") or 2048)
        bloom_k = int((bloom or {}).get("k") or 3)
        stats_cols = stats_cols or []
        # ``absent_as_null`` (r12, the analyze backfill): columns the
        # CALLER asserts are alias-free and newer than some files — a
        # footer that lacks one physically is logically ALL NULL (the
        # mixed read NULL-fills), so record a full null census (and an
        # empty bloom bitmap: eq never matches NULL) instead of
        # nothing. Never set for renamed columns: their data lives
        # under the old physical name and "absent" would be a lie.
        absent_null = set(absent_as_null or [])

        rows_iter = None
        if self._local and len(files) <= int(
            self.spark.conf.get("spark.smetl.stats.driverMaxFiles", "64")
        ):
            try:
                total = sum(os.path.getsize(f) for f in files)
            except OSError:
                total = None
            if total is not None and total <= int(
                self.spark.conf.get(
                    "spark.smetl.stats.driverMaxBytes",
                    str(256 * 1024 * 1024),
                )
            ):
                cols_out = _stats_rows_for_files(
                    files, stats_cols, bloom_cols,
                    bloom_bits, bloom_k, absent_null,
                )
                names = list(cols_out)
                rows_iter = (
                    dict(zip(names, vals))
                    for vals in zip(*(cols_out[n] for n in names))
                )

        if rows_iter is None:

            def _read(batches):
                import pandas as pd

                from social_media_etl_spark.operators.manifest import (
                    _stats_rows_for_files,
                )

                for pdf in batches:
                    yield pd.DataFrame(
                        _stats_rows_for_files(
                            list(pdf["file"]), stats_cols, bloom_cols,
                            bloom_bits, bloom_k, absent_null,
                        )
                    )

            schema = (
                "file string, col string, lo_num double, hi_num double,"
                " lo_str string, hi_str string, bloom string, nulls long,"
                " rows long"
            )
            sdf = self.spark.createDataFrame(
                [(f,) for f in files], "file string"
            )
            rows_iter = sdf.mapInPandas(_read, schema).collect()

        stats: dict = {}
        for r in rows_iter:
            entry = stats.setdefault(r["file"], {}).setdefault(
                r["col"], [None, None]
            )
            if r["bloom"] is not None:
                while len(entry) < 3:
                    entry.append(None)
                entry[2] = r["bloom"]
            else:
                entry[0] = (
                    r["lo_num"] if r["lo_num"] is not None else r["lo_str"]
                )
                entry[1] = (
                    r["hi_num"] if r["hi_num"] is not None else r["hi_str"]
                )
                if r["nulls"] is not None:
                    while len(entry) < 5:
                        entry.append(None)
                    entry[3] = int(r["nulls"])
                    entry[4] = int(r["rows"])
        return stats

    def read_where(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Data-skipping read: open ONLY the files whose manifest
        metadata for ``col`` can overlap [lo, hi] — per-file footer
        [min, max] stats AND, on a partitioned table, the file's
        recorded partition value (files without recorded metadata are
        kept — pruning is never allowed to drop data) — then apply the
        exact filter. With a range-clustered layout (warehouse.
        write_sorted shape) a point/range query touches one file
        instead of all of them."""
        return self.read_where_all([(col, lo, hi)], version=version)

    def read_where_all(
        self, preds: list[tuple], version: int | None = None
    ) -> DataFrame:
        """Multi-predicate data-skipping read: ``preds`` is a list of
        ``(col, lo, hi)`` range conjuncts; a file is opened only if it
        can overlap EVERY conjunct, so partition pruning (on the
        table's partition column) and stats pruning (on any stats
        column) COMBINE — the date-partitioned + id-clustered layout
        every warehouse runs (VERDICT r7 #5). Exact filters are then
        applied on top, so pruning can only skip work, never rows."""
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        kept = self._kept_files_all(m, preds)
        if not kept:
            df = self._read_files(m, m["files"]).limit(0)
        else:
            df = self._read_files(m, kept)
        for col, lo, hi in preds:
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
        return df

    @staticmethod
    def _pv_excludes(pv: str, lo, hi, pt_is_string: bool) -> bool:
        """Does the recorded partition value (a STRING from the dir
        name) fall outside [lo, hi]? Compared in the BOUND's domain:
        numeric bounds parse the value as float (the dir string of an
        int/float column round-trips exactly); string bounds compare
        lexicographically ONLY when the partition column is genuinely
        string-typed — a numeric column's stringified values would
        order lexicographically ('10' < '2') and silently prune
        in-range files (r8 review). Anything incomparable keeps the
        file — never data loss."""

        def outside(bound, hi_side: bool) -> bool:
            if bound is None or isinstance(bound, bool):
                return False
            if isinstance(bound, (int, float)):
                try:
                    v = float(pv)
                except ValueError:
                    return False
                return v > bound if hi_side else v < bound
            if isinstance(bound, str) and pt_is_string:
                return pv > bound if hi_side else pv < bound
            return False

        return outside(hi, True) or outside(lo, False)

    @staticmethod
    def _file_overlaps(
        manifest: dict,
        f: str,
        col: str,
        lo,
        hi,
        pt_is_string: bool = False,
        use_bloom: bool = True,
    ) -> bool:
        """Can file ``f`` hold rows with ``col`` in [lo, hi]? Consults
        the file's recorded PARTITION VALUE (when ``col`` is the
        table's partition column; see :meth:`_pv_excludes` for the
        domain rules) and its footer [min, max] stats. Bounds are
        compared in the metadata's own domain; a predicate whose type
        can't be compared keeps the file — mis-typed bounds degrade to
        a full read, never to data loss."""
        # the file's OWN spec: after set_partition_spec the table spans
        # specs and each file's recorded values read under the spec it
        # was written with (r10 — Iceberg spec evolution); files from
        # the current spec use the manifest's. Specs record WRITE-TIME
        # physical names, so a RENAMED column matches through its
        # alias chain — same fallthrough as footer stats below.
        pbs = (manifest.get("specs") or {}).get(
            f
        ) or VersionedTable._pb_cols(manifest.get("partition_by"))
        spec_col = next(
            (
                n
                for n in [col, *(manifest.get("aliases") or {}).get(col, ())]
                if n in pbs
            ),
            None,
        )
        if spec_col is not None:
            entry = (manifest.get("parts") or {}).get(f)
            # legacy single-column manifests record a plain string;
            # multi-column specs record the per-file partition TUPLE —
            # take this column's position (None = NULL value: keep)
            pv = (
                entry
                if isinstance(entry, str) or entry is None
                else entry[pbs.index(spec_col)]
            )
            if pv is not None and VersionedTable._pv_excludes(
                pv, lo, hi, pt_is_string
            ):
                return False
        fstats = (manifest.get("stats") or {}).get(f, {})
        s = fstats.get(col)
        if s is None:
            # a renamed column's pre-rename files recorded stats under
            # the OLD physical name — fall through the alias chain so
            # data skipping keeps working across the rename (r9 #4)
            for a in (manifest.get("aliases") or {}).get(col, ()):
                s = fstats.get(a)
                if s is not None:
                    break
        if s is not None:
            try:
                if (hi is not None and s[0] > hi) or (
                    lo is not None and s[1] < lo
                ):
                    return False
            except TypeError:
                pass
        if use_bloom and lo is not None and lo == hi:
            # an EQUALITY bound also consults the file's bloom bitmap
            # (r11): point DML prune hints (delete "user_id = X" —
            # the GDPR case), scoped OPTIMIZE and read_where all skip
            # files range stats cannot. No false negatives by
            # construction, so verify_prune semantics are unchanged.
            return VersionedTable._bloom_may_contain(manifest, f, col, lo)
        return True

    @classmethod
    def _kept_files_all(
        cls, manifest: dict, preds: list[tuple], use_bloom: bool = True
    ) -> list[str]:
        """The files a conjunctive range read must open: everything
        that can overlap every (col, lo, hi), plus everything with NO
        recorded metadata (pruning may never drop data). The single
        skip predicate read_where* and pruned_file_count* report
        from."""
        pt_str: dict = {}
        # string-domain lookup for EVERY predicate column: historical
        # specs (set_partition_spec) may record values for columns
        # outside the current spec, and those files still prune
        pred_cols = {c for c, _, _ in preds}
        schema = cls._manifest_schema(manifest)
        if schema is not None:
            for x in schema.fields:
                if x.name in pred_cols:
                    pt_str[x.name] = isinstance(x.dataType, T.StringType)
        return [
            f
            for f in manifest["files"]
            if all(
                cls._file_overlaps(
                    manifest, f, c, lo, hi, pt_str.get(c, False), use_bloom
                )
                for c, lo, hi in preds
            )
        ]

    @classmethod
    def _kept_files(cls, manifest: dict, col: str, lo, hi) -> list[str]:
        return cls._kept_files_all(manifest, [(col, lo, hi)])

    @staticmethod
    def _bloom_may_contain(manifest: dict, f: str, col: str, value) -> bool:
        """Can file ``f`` hold rows where ``col`` equals ``value``,
        per its recorded bloom bitmap? Missing configuration, missing
        bitmap (pre-bloom or non-indexable file), an alias-chain miss,
        or an unindexable lookup value all KEEP the file — bloom
        skipping can have false positives, never false negatives."""
        cfg = manifest.get("bloom")
        if not cfg or col not in (cfg.get("cols") or []):
            # a renamed column's bloom config recorded the OLD name
            alias = next(
                (
                    a
                    for a in (manifest.get("aliases") or {}).get(col, ())
                    if cfg and a in (cfg.get("cols") or [])
                ),
                None,
            )
            if alias is None:
                return True
        fstats = (manifest.get("stats") or {}).get(f, {})
        s = fstats.get(col)
        if s is None:
            for a in (manifest.get("aliases") or {}).get(col, ()):
                s = fstats.get(a)
                if s is not None:
                    break
        if s is None or len(s) < 3 or not s[2]:
            return True
        idxs = _bloom_hashes(value, int(cfg["bits"]), int(cfg["k"]))
        if idxs is None:
            return True
        bm = int(s[2], 16)
        return all((bm >> i) & 1 for i in idxs)

    def read_where_eq(
        self, col: str, value, version: int | None = None
    ) -> DataFrame:
        """Point-lookup read with BLOOM-FILTER file skipping stacked
        on range-stats and partition pruning (r11 — Delta/Iceberg
        bloom indexes): open only the files whose [min, max]/partition
        metadata can overlap ``value`` AND whose bloom bitmap (when
        the table was created with ``bloom_cols``) has all k bits for
        it. Range stats cannot skip files for a column the layout is
        not clustered by — every file spans the domain — which at
        100 TB makes needle-in-haystack lookups (an event by user id,
        a document by hash) scan the table; the bloom answers those
        in O(matching files). False positives only ever cost extra
        reads; files without bitmaps are always kept."""
        if value is None:
            raise ValueError(
                "read_where_eq: NULL equals nothing — filter IS NULL "
                "on a plain read instead"
            )
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        # equality bounds consult blooms inside _file_overlaps, so the
        # same skipping serves read_where/point prune hints/scoped
        # OPTIMIZE — this is just the eq-shaped entry point
        kept = self._kept_files_all(m, [(col, value, value)])
        return self._read_files(m, kept).filter(F.col(col) == F.lit(value))

    def pruned_file_count_eq(
        self, col: str, value, version: int | None = None
    ) -> tuple[int, int, int]:
        """(kept_after_bloom, kept_by_range_stats_alone, total) for an
        equality lookup — the middle term shows what bloom skipping
        buys BEYOND range/partition pruning."""
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        by_range = self._kept_files_all(
            m, [(col, value, value)], use_bloom=False
        )
        by_bloom = self._kept_files_all(m, [(col, value, value)])
        return len(by_bloom), len(by_range), len(m["files"])

    @staticmethod
    def _null_census(manifest: dict, f: str, col: str):
        """(null_count, row_count) recorded for a stats column of file
        ``f`` — None when unrecorded (legacy entry, footer without the
        counts, alias miss). Falls through the rename alias chain like
        every other stats consumer."""
        fstats = (manifest.get("stats") or {}).get(f, {})
        s = fstats.get(col)
        if s is None:
            for a in (manifest.get("aliases") or {}).get(col, ()):
                s = fstats.get(a)
                if s is not None:
                    break
        if s is None or len(s) < 5 or s[3] is None or s[4] is None:
            return None
        return int(s[3]), int(s[4])

    def _kept_files_null(
        self, manifest: dict, col: str, want_null: bool
    ) -> list[str]:
        kept = []
        for f in manifest["files"]:
            c = self._null_census(manifest, f, col)
            if c is None:
                kept.append(f)  # unknown census: never drop data
            elif want_null and c[0] > 0:
                kept.append(f)  # has at least one NULL
            elif not want_null and c[0] < c[1]:
                kept.append(f)  # has at least one non-NULL
        return kept

    def read_where_null(
        self, col: str, version: int | None = None, want_null: bool = True
    ) -> DataFrame:
        """IS NULL (``want_null=False``: IS NOT NULL) read with
        NULL-CENSUS file skipping (r11 — Iceberg's per-file
        null_count/value_count): a stats column's footer null counts
        are recorded at commit time, so an IS NULL scan opens only
        files that contain a NULL and an IS NOT NULL scan skips
        all-NULL files. The missing-data sweep over a 100 TB mostly-
        dense table — find the rows a broken upstream left unfilled —
        reads O(defective files) instead of everything. Files without
        a recorded census are always kept."""
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        kept = self._kept_files_null(m, col, want_null)
        df = self._read_files(m, kept)
        return df.filter(
            F.col(col).isNull() if want_null else F.col(col).isNotNull()
        )

    def read_where_in(
        self, col: str, values: list, version: int | None = None
    ) -> DataFrame:
        """IN-list lookup: a file is opened iff it may hold ANY of the
        values (per-value range/partition/bloom skipping, unioned) —
        the batched needle fetch (an id list from a join, a blocklist
        sweep) opens O(Σ matching files) instead of |values| passes or
        a full scan. NULLs in the list are ignored (SQL IN never
        matches them)."""
        vals = [v for v in values if v is not None]
        if not vals:
            raise ValueError("read_where_in: no non-NULL values")
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        schema = self._manifest_schema(m)
        pt_str = False
        if schema is not None:
            for x in schema.fields:
                if x.name == col:
                    pt_str = isinstance(x.dataType, T.StringType)
        kept = [
            f
            for f in m["files"]
            if any(
                self._file_overlaps(m, f, col, val, val, pt_str)
                for val in vals
            )
        ]
        return self._read_files(m, kept).filter(F.col(col).isin(vals))

    # bounded driver-side key collect for merge/upsert find-scan
    # pruning: above this many distinct source keys the per-value
    # metadata walk stops paying and the scan falls back to the full
    # file list (the pruning is an optimization, never a semantic)
    _KEYED_SCAN_MAX_KEYS = 256

    def _keyed_candidate_files(
        self,
        base: dict,
        on: list[str],
        src_keys: DataFrame,
        max_keys: int | None = None,
    ) -> list[str]:
        """Files that MAY hold a target row whose ``on``-key equals
        some source key (VERDICT r11 #6 — bloom/stats coverage for
        merge's find-scan): pick the first key column with per-file
        metadata (bloom bitmap, footer stats, or the partition spec),
        collect the source's distinct values for it — BOUNDED at
        ``max_keys``, a metadata-plane collect — and keep a file iff
        it overlaps ANY value (:meth:`_file_overlaps`, which consults
        blooms on equality). Sound for every merge-side scan because
        each one equi-joins the target against the source keys: a
        pruned-out file provably holds none. Too many distinct keys,
        an un-metadata'd key set, or a collect past the cap all fall
        back to the full list — pruning degrades, never drops data."""
        files = base["files"]
        if not files:
            return files
        cap = self._KEYED_SCAN_MAX_KEYS if max_keys is None else max_keys
        stats_cols = set(base.get("stats_cols") or [])
        bloom_cols = set((base.get("bloom") or {}).get("cols") or [])
        pb_cols = set(self._pb_cols(base.get("partition_by")))
        col = next(
            (c for c in on if c in stats_cols | bloom_cols | pb_cols),
            None,
        )
        if col is None:
            return files
        rows = src_keys.select(col).distinct().limit(cap + 1).collect()
        if len(rows) > cap:
            return files
        vals = [r[0] for r in rows if r[0] is not None]
        if not vals:
            # NULL keys match nothing under MERGE's plain equality —
            # zero files can hold a match
            return []
        schema = self._manifest_schema(base)
        pt_str = False
        if schema is not None:
            for x in schema.fields:
                if x.name == col:
                    pt_str = isinstance(x.dataType, T.StringType)
        return [
            f
            for f in files
            if any(
                self._file_overlaps(base, f, col, v, v, pt_str)
                for v in vals
            )
        ]

    def merge_scan_file_count(
        self, source: DataFrame, on: list[str], version: int | None = None
    ) -> tuple[int, int]:
        """(files a merge's target-side find-scan would open, total
        files) for ``source``/``on`` — the observable gate for the
        keyed find-scan pruning (the merge analogue of
        :meth:`pruned_file_count_eq`)."""
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        kept = self._keyed_candidate_files(
            m, on, source.select(*on).distinct()
        )
        return len(kept), len(m["files"])

    def pruned_file_count_null(
        self, col: str, version: int | None = None, want_null: bool = True
    ) -> tuple[int, int]:
        """(kept, total) for an IS [NOT] NULL scan on a stats column."""
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        return (
            len(self._kept_files_null(m, col, want_null)),
            len(m["files"]),
        )

    def pruned_file_count(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> tuple[int, int]:
        """(files kept, files total) for a read_where — the skip ratio."""
        return self.pruned_file_count_all([(col, lo, hi)], version=version)

    def pruned_file_count_all(
        self, preds: list[tuple], version: int | None = None
    ) -> tuple[int, int]:
        """(files kept, files total) for a read_where_all."""
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        return len(self._kept_files_all(m, preds)), len(m["files"])

    _PT_DIR = "smetl_pt"  # partition directory prefix (no leading "_"
    # or "." — Spark's file listing treats those segments as hidden)

    @staticmethod
    def _pb_cols(spec) -> list[str]:
        """A partition spec as an ordered column list (VERDICT r9 #3):
        ``None`` → no partitioning, a legacy single-column STRING →
        ``[col]``, a LIST → itself (the (date, region)-style tuple
        spec real lakehouse tables run; Iceberg carries exactly this
        as a partition tuple per file)."""
        if not spec:
            return []
        return [spec] if isinstance(spec, str) else list(spec)

    @classmethod
    def _pt_dir_col(cls, i: int) -> str:
        """Synthetic directory-column name for spec position ``i``.
        Position 0 keeps the legacy un-suffixed name so single-column
        tables committed by earlier rounds parse unchanged."""
        return cls._PT_DIR if i == 0 else f"{cls._PT_DIR}{i}"

    @classmethod
    def _check_reserved_names(cls, names, ctx: str) -> None:
        """Reject column names the engine reserves internally (ADVICE
        r12): the deletion-vector keys (``__smetl_dv_file`` /
        ``__smetl_dv_pos`` — a user column by that name duplicates the
        MoR ``_metadata`` projection), the ``smetl_pt``/``smetl_pt<N>``
        partition directory columns (partitioned writes refuse them
        per-write, but an unpartitioned table could still commit one
        and break a later repartition-spec change), and merge's
        ``__s_hit`` match marker. Shared by create / add_column /
        rename_column so the refusal happens at DDL time with a clear
        message instead of a confusing failure on a later commit."""
        import re as _re

        bad = [
            n
            for n in names
            if n in (cls._DV_FILE, cls._DV_POS, "__s_hit")
            or _re.fullmatch(rf"{cls._PT_DIR}\d*", n)
        ]
        if bad:
            raise ValueError(
                f"VersionedTable.{ctx}: column name(s) {sorted(bad)} are "
                "reserved for the engine's internal layout (deletion-"
                "vector keys, partition directory columns, merge match "
                "marker). Pick different names."
            )

    def _write_data(
        self,
        df: DataFrame,
        version_hint: int,
        partition_by: str | list | None = None,
        bucket_by: dict | None = None,
        drop_if_empty: bool = False,
    ) -> list[str]:
        """Write immutable data files for one commit; returns their
        paths. On a partitioned table the files are laid out under
        ``<dir>/smetl_pt=<v0>/smetl_pt1=<v1>/…`` via a CLUSTERED write
        (one leaf dir per partition TUPLE), but — unlike Hive layout —
        the partition COLUMNS STAY IN THE DATA FILES (the synthetic
        ``smetl_pt*`` dir columns are cast copies), so snapshot reads
        keep reading plain leaf files with no basePath reconstruction;
        the dir values are parsed into the manifest as file-level
        metadata (the Iceberg partition-tuple-per-file pattern).

        ``drop_if_empty`` (r16, guide §1.2 — same shape as
        :meth:`_write_cdc_if_any`): the rewrite paths (COW merge /
        delete) used to gate this call on a ``limit(1).count()``
        probe, which executed the whole rewrite plan once for the
        probe and AGAIN for the write. With ``drop_if_empty=True``
        the caller writes FIRST and emptiness is read from the
        written footers (O(files) driver metadata); an all-empty dir
        is deleted and ``[]`` returned — a genuinely empty rewrite
        commits an empty file list, exactly as the probe produced."""
        ddir = f"{self.path}/data/b{version_hint:08d}-{uuid.uuid4().hex[:8]}"
        pb = self._pb_cols(partition_by)
        if pb:
            missing = [c for c in pb if c not in df.columns]
            if missing:
                raise ValueError(
                    f"VersionedTable: partition column(s) {missing} "
                    f"not in {df.columns}"
                )
            dir_cols = [self._pt_dir_col(i) for i in range(len(pb))]
            reserved = [c for c in dir_cols if c in df.columns]
            if reserved:
                raise ValueError(
                    f"VersionedTable: column name(s) {reserved} are "
                    "reserved for the partition layout"
                )
            out = df
            for dc, c in zip(dir_cols, pb):
                out = out.withColumn(dc, F.col(c).cast("string"))
            apply_light_committer(
                out.write.mode("error"), self.spark
            ).partitionBy(*dir_cols).parquet(ddir)
        elif bucket_by:
            # BUCKET-HASHED layout (VERDICT r9 #5): route the bucketed
            # write through a throwaway EXTERNAL catalog table — the
            # only Spark API that emits bucket-id-suffixed file names —
            # then drop the catalog entry (external ⇒ files stay). The
            # pre-repartition uses the SAME murmur3 pmod hash bucketing
            # uses, so each task holds exactly one bucket and writes
            # exactly one file; every commit's files join the same
            # bucket universe (the hash is stable), which is what lets
            # register_bucketed() expose ANY snapshot as a co-located
            # bucketed table with zero-exchange joins.
            bcol, nb = bucket_by["col"], int(bucket_by["n"])
            if bcol not in df.columns:
                raise ValueError(
                    f"VersionedTable: bucket column '{bcol}' not in "
                    f"{df.columns}"
                )
            tmp = f"smetl_vbkt_{uuid.uuid4().hex[:10]}"
            (
                apply_light_committer(
                    df.repartition(nb, bcol).write.mode("error"), self.spark
                )
                .option("path", ddir)
                .bucketBy(nb, bcol)
                .sortBy(bcol)
                .saveAsTable(tmp)
            )
            self.spark.sql(f"DROP TABLE `{tmp}`")
        else:
            apply_light_committer(
                df.write.mode("error"), self.spark
            ).parquet(ddir)
        files = []
        if self._local:
            for root, _dirs, names in os.walk(ddir):
                for name in names:
                    if name.endswith(".parquet") or name.startswith("part-"):
                        files.append(os.path.join(root, name))
        else:
            it = self._fs.listFiles(self._P(ddir), True)
            while it.hasNext():
                st = it.next()
                name = st.getPath().getName()
                if name.endswith(".parquet") or name.startswith("part-"):
                    files.append(str(st.getPath().toUri().getPath()))
        if not files:
            if drop_if_empty:
                # the caller expects (and handles) an empty rewrite;
                # the write job succeeded, so no-part-files means an
                # all-empty frame — no extra probe needed
                return []
            # a genuinely EMPTY frame legitimately writes no part
            # files (SQL CREATE TABLE declares schema-only tables,
            # r14); _read_files already serves 0-file manifests from
            # schema_json. A NON-empty frame with no files is still
            # the silent-write-failure this guard exists for.
            if df.isEmpty():
                return []
            raise IOError(f"VersionedTable: no part files written at {ddir}")
        if drop_if_empty and self._dir_num_rows(ddir) == 0:
            # every part file is schema-only (an empty rewrite under
            # SPARK-23271-style empty-frame writes): remove the dir so
            # the commit records an empty file list, as the old
            # pre-write probe produced
            if self._local:
                import shutil

                shutil.rmtree(ddir, ignore_errors=True)
            else:
                self._fs.delete(self._P(ddir), True)
            return []
        return sorted(files)

    def _write_cdc(self, df: DataFrame, version_hint: int) -> str:
        """Write one commit's row-level CDC records (rows already
        tagged ``_change_type``) as an immutable parquet dir — the
        Delta ``_change_data`` pattern. Written BEFORE the CAS; a lost
        race leaves an orphan dir that vacuum sweeps age-guarded.
        Bounded by the commit's own changed rows, distributed write."""
        cdir = f"{self.path}/cdc/b{version_hint:08d}-{uuid.uuid4().hex[:8]}"
        apply_light_committer(df.write.mode("error"), self.spark).parquet(cdir)
        return cdir

    def _write_cdc_if_any(self, df: DataFrame, version_hint: int) -> str | None:
        """Write one commit's CDC rows; return the dir, or None (dir
        removed) when the commit changed zero rows. Replaces the old
        probe-then-write shape (r15 optimization, guide §1.2): the
        ``limit(1).count()`` emptiness guard executed the entire CDC
        classification plan once and the write executed it AGAIN —
        the guard now reads the WRITTEN footers' row counts (O(files)
        driver metadata on local tables) after a single execution.
        Zero-change commits still record nothing, exactly as before
        (the feed's change-free contract is by ABSENCE of a cdc dir,
        so the empty dir is deleted, never recorded)."""
        cdir = self._write_cdc(df, version_hint)
        if self._dir_num_rows(cdir) > 0:
            return cdir
        if self._local:
            import shutil

            shutil.rmtree(cdir, ignore_errors=True)
        else:
            self._fs.delete(self._P(cdir), True)
        return None

    def _dir_num_rows(self, d: str) -> int:
        """Total rows across a just-written parquet dir — footer
        metadata ONLY, on every scheme (r16: the remote branch reads
        footers through pyarrow.fs like :meth:`_copy_files_distributed`
        does, instead of running a ``limit(1).count()`` Spark job per
        commit). A missing/empty directory is 0 rows (an all-empty
        write legitimately produces no part files); any OTHER failure
        propagates — the callers DELETE the directory on 0, so
        swallowing a transient read error here would silently discard
        a non-empty CDC feed or deletion vector (ADVICE r15)."""
        import pyarrow.parquet as pq

        if self._local:
            total = 0
            for root, _dirs, names in os.walk(d):
                for n in names:
                    if n.endswith(".parquet") or n.startswith("part-"):
                        total += pq.ParquetFile(
                            os.path.join(root, n)
                        ).metadata.num_rows
            return total
        from pyarrow import fs as pafs

        fsys, root = pafs.FileSystem.from_uri(d)
        sel = pafs.FileSelector(root, recursive=True, allow_not_found=True)
        total = 0
        for info in fsys.get_file_info(sel):
            name = info.base_name
            if info.type == pafs.FileType.File and (
                name.endswith(".parquet") or name.startswith("part-")
            ):
                with fsys.open_input_file(info.path) as f:
                    total += pq.ParquetFile(f).metadata.num_rows
        return total

    @classmethod
    def _partition_values(cls, files: list[str], partition_by=None) -> dict:
        """Per-file partition value(s) parsed from the ``smetl_pt*=``
        path segments (URL-unescaped, as partitioned writes encode
        them). A SINGLE-column spec records a plain string — or
        nothing for a NULL value — exactly as every earlier round's
        manifests did; a MULTI-column spec records a LIST aligned to
        the spec order with ``None`` at NULL positions (the Iceberg
        partition tuple), so pruning can skip on any prefix/conjunct
        while NULL positions are always kept. Pure path arithmetic,
        O(files) driver-side metadata."""
        from urllib.parse import unquote

        n = len(cls._pb_cols(partition_by)) if partition_by else 1
        out = {}
        for f in files:
            vals: list = [None] * n
            for seg in f.split("/"):
                name, eq, raw = seg.partition("=")
                if not eq or not name.startswith(cls._PT_DIR):
                    continue
                suffix = name[len(cls._PT_DIR):]
                if suffix == "":
                    idx = 0
                elif suffix.isdigit():
                    idx = int(suffix)
                else:
                    continue
                if idx < n:
                    v = unquote(raw)
                    if v != "__HIVE_DEFAULT_PARTITION__":
                        vals[idx] = v
            if n == 1:
                if vals[0] is not None:
                    out[f] = vals[0]
            else:
                out[f] = vals
        return out

    # -- public API ---------------------------------------------------------

    class ConstraintViolation(ValueError):
        """A data-adding commit carried rows that fail a table CHECK
        constraint; nothing was committed (the staged files are
        unreferenced and vacuum collects them)."""

    def _check_constraints(self, files: list[str], manifest_like: dict) -> None:
        """Enforce the table's CHECK constraints over the rows in
        ``files`` (a commit's NEW files — for rewrites that is the
        whole new snapshot, so enforcement is total). SQL CHECK
        semantics: a row violates only when the expression is FALSE;
        NULL/unknown passes. One aggregate over the staged files per
        commit (the Delta write-job constraint check); raises
        ConstraintViolation with per-constraint violation counts
        BEFORE the CAS, so a violating commit never becomes visible."""
        constraints = manifest_like.get("constraints") or {}
        if not constraints or not files:
            return
        df = self._read_files(manifest_like, files)
        row = df.agg(
            *[
                F.count(
                    F.when(~F.coalesce(F.expr(expr), F.lit(True)), 1)
                ).alias(name)
                for name, expr in constraints.items()
            ]
        ).collect()[0]
        violated = {n: row[n] for n in constraints if row[n] > 0}
        if violated:
            raise VersionedTable.ConstraintViolation(
                "VersionedTable: CHECK constraint(s) violated by this "
                f"commit — {violated} (constraint -> violating rows); "
                "nothing was committed"
            )

    def constraints(self) -> dict:
        """The table's CHECK constraints, name -> SQL expression."""
        return dict(self._read_pointer(self.head_version()).get("constraints") or {})

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        txn: str | None = None,
        stats_cols: list[str] | None = None,
        partition_by: str | list | None = None,
        constraints: dict | None = None,
        segmented: bool = True,
        bucket_by: tuple | None = None,
        change_data_feed: bool = False,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 2048,
        bloom_hashes: int = 3,
        generated: dict[str, str] | None = None,
        identity: dict[str, dict] | None = None,
    ) -> "VersionedTable":
        """``stats_cols`` records per-file min/max in the manifest for
        :meth:`read_where` data skipping — numeric, string, and
        date/timestamp columns all supported (see
        :meth:`_collect_stats`). ``partition_by`` names one column or
        an ORDERED LIST of columns to lay data out by (VERDICT r9 #3 —
        the (date, region)-style tuple spec; one leaf directory per
        partition tuple, the tuple recorded per-file in the manifest —
        see :meth:`_write_data`); every later commit inherits the
        spec, and :meth:`read_where_all` prunes on any prefix or
        conjunct of it, stacked with stats pruning.
        ``constraints`` maps constraint names to SQL CHECK expressions
        (Delta table-constraint semantics: FALSE rows are violations,
        NULL passes); every data-adding commit — this create, appends,
        upserts, overwrites, updates — validates its new rows against
        them and refuses to commit on violation. ``segmented`` (the
        default) stores file metadata in per-commit SEGMENT files so
        appends write O(appended files) of metadata (see module
        docstring); ``False`` keeps the legacy inline layout — the
        format is fixed per table at create time. ``generated`` maps
        column → SQL expression (Delta's GENERATED ALWAYS AS, r13):
        ingests that omit the column get it COMPUTED, ingests that
        supply it get it VALIDATED in-plan (a disagreeing value
        raises), UPDATE/MERGE refuse to assign it or any column its
        expression mentions, and MERGE inserts compute it — so
        readers (and partition pruning) may always trust the column.
        Recorded as the ``generated`` table feature; expressions may
        not reference other generated columns."""
        t = cls(spark, path)
        if t.versions():
            raise IOError(f"VersionedTable: {path} already initialized")
        if generated:
            # a generation expression may not reference another
            # generated column (Delta's rule — evaluation order would
            # otherwise matter) nor itself
            for g, expr in generated.items():
                circular = set(generated) & cls._expr_identifiers(expr)
                if circular:
                    raise ValueError(
                        f"VersionedTable.create: generated column "
                        f"'{g}' expression references generated "
                        f"column(s) {sorted(circular)} — generation "
                        "expressions may only use regular columns"
                    )
            df = cls._apply_generated(df, generated)
        id_map: dict[str, dict] = {}
        id_alloc: list[str] = []
        if identity:
            # GENERATED ALWAYS AS IDENTITY (r15 — Delta identity
            # columns): {col: {"start": s, "step": i}}; the column is
            # engine-owned BIGINT. "high" records the watermark the
            # next allocation continues from (start - step ⇒ the
            # first id is exactly start).
            cls._validate_identity(
                identity,
                sorted(set(df.columns) | set(identity)),
                generated,
            )
            for col, spec in identity.items():
                s, i = int(spec.get("start", 1)), int(spec.get("step", 1))
                id_map[col] = {"start": s, "step": i, "high": s - i}
                if col in df.columns and (
                    df.schema[col].dataType.simpleString() != "bigint"
                ):
                    raise ValueError(
                        f"VersionedTable.create: identity column "
                        f"{col!r} must be BIGINT, got "
                        f"{df.schema[col].dataType.simpleString()}"
                    )
            df, id_alloc = t._alloc_identity(
                df, id_map, allow_present=True
            )
        cls._check_reserved_names(df.columns, "create")
        bucket = None
        if bucket_by is not None:
            if partition_by:
                raise ValueError(
                    "VersionedTable: bucket_by does not compose with "
                    "partition_by yet — pick one layout"
                )
            bcol, nb = bucket_by
            bucket = {"col": bcol, "n": int(nb)}
        bloom = None
        if bloom_cols:
            missing = [c for c in bloom_cols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"VersionedTable: bloom_cols {missing} not in the "
                    "table schema"
                )
            if bloom_bits < 64 or bloom_hashes < 1:
                raise ValueError(
                    "VersionedTable: bloom_bits must be >= 64 and "
                    "bloom_hashes >= 1"
                )
            bloom = {
                "cols": list(bloom_cols),
                "bits": int(bloom_bits),
                "k": int(bloom_hashes),
            }
        files = t._write_data(df, 0, partition_by, bucket)
        m = {
            "version": 0,
            "parent": None,
            "op": "create",
            "schema": df.schema.simpleString(),
            "schema_json": df.schema.json(),
            "mixed": False,
            "txn": txn,
            "txns": [txn] if txn else [],
            "stats_cols": stats_cols or [],
            # per-file bloom bitmaps for point-lookup skipping (r11):
            # every data-adding commit inherits the config and records
            # bitmaps for its OWN files; read_where_eq consults them
            "bloom": bloom,
            "partition_by": partition_by,
            "bucket_by": bucket,
            # Delta's enableChangeDataFeed: COW DELETE/UPDATE commits
            # then write their row-level changes as CDC files, making
            # read_change_feed/readChangeFeed cover them (r10)
            "cdf": bool(change_data_feed),
            "constraints": constraints or {},
            # GENERATED ALWAYS AS expressions (r13): computed when an
            # ingest omits the column, validated in-plan when it
            # supplies one; carried by every commit (_carry_mapping)
            "generated": generated or {},
            # GENERATED ALWAYS AS IDENTITY specs + per-column high
            # watermark (r15): advanced by every allocating commit,
            # carried by the rest (_carry_mapping)
            "identity": cls._bump_identity(
                id_map,
                t._identity_watermark(files, id_map, id_alloc),
            )
            if id_map
            else {},
            # name→field-id indirection (VERDICT r9 #4, the Iceberg/
            # Delta column-mapping substrate): ids are assigned once
            # here, survive renames (the id keeps its identity, the
            # name key moves), and additive evolution mints new ids
            "field_ids": {
                f.name: i + 1 for i, f in enumerate(df.schema.fields)
            },
            # protocol gate (VERDICT r11 #2): the feature set a reader
            # must understand to interpret this table; ops that first
            # USE a feature later (MoR DML → dv, rename → column_
            # mapping, widen_column → widen) add their flag then
            "features": sorted(
                (["segments"] if segmented else [])
                + (["cdf"] if change_data_feed else [])
                + (["bloom"] if bloom else [])
                + (["bucket"] if bucket else [])
                + (["constraints"] if constraints else [])
                + (["generated"] if generated else [])
                + (["identity"] if id_map else [])
            ),
        }
        if segmented:
            m["segments"] = t._build_segments(
                files, stats_cols, partition_by, bloom
            )
            m["n_files"] = len(files)
        else:
            stats = (
                t._collect_stats(files, stats_cols, bloom)
                if stats_cols or bloom
                else {}
            )
            parts = (
                t._partition_values(files, partition_by)
                if partition_by
                else {}
            )
            m.update({"files": files, "stats": stats, "parts": parts})
        t._check_constraints(files, m)
        if not t._try_commit(m, 0):
            raise ConcurrentWriteError(
                f"VersionedTable: concurrent create at {path}"
            )
        return t

    def committed_txns(self) -> set[str]:
        """Application-level transaction ids recorded by past commits —
        the idempotent-replay check (Delta's txnAppId pattern): a
        streaming sink skips any batch whose txn already committed.
        The full set is CARRIED FORWARD in every manifest (the
        SetTransaction-in-checkpoint pattern), so this reads ONE
        manifest — the head — not the whole history; a per-batch check
        stays O(1) metadata reads no matter the stream's age. Falls
        back to the historical scan for pre-txns manifests."""
        head = self._read_pointer(self.head_version())
        if "txns" in head:
            return set(head["txns"])
        out = set()
        for v in self.versions():
            txn = self._read_manifest(v).get("txn")
            if txn is not None:
                out.add(txn)
        return out

    @staticmethod
    def _carry_mapping(m: dict, base: dict) -> dict:
        """Carry the column-mapping metadata (``field_ids``,
        ``aliases``) from a parent manifest into a fresh child — every
        commit op calls this so a RENAME's indirection survives any
        later DML. Full rewrites keep ``aliases`` too: once no live
        footer carries an old physical name the alias entries are
        inert (the read path only coalesces names actually present)."""
        for k in (
            "field_ids",
            "aliases",
            "bucket_by",
            "cdf",
            "dropped_phys",
            "features",
            "properties",
            "generated",
            "identity",
        ):
            if base.get(k):
                m[k] = base[k]
        return m

    @staticmethod
    def _txns_after(base: dict, txn: str | None) -> list[str]:
        prior = base.get("txns") or ([base["txn"]] if base.get("txn") else [])
        return sorted(set(prior) | {txn}) if txn else sorted(set(prior))

    @staticmethod
    def _manifest_schema(manifest: dict) -> T.StructType | None:
        """The table schema recorded in a manifest, or None for a
        legacy manifest that predates ``schema_json`` (those fall back
        to exact simpleString matching)."""
        if "schema_json" in manifest:
            return T.StructType.fromJson(json.loads(manifest["schema_json"]))
        return None

    def _check_schema(self, df: DataFrame, parent: int) -> dict:
        """Validate an append's schema against the parent manifest and
        return the child manifest's schema fields: ``{"schema",
        "schema_json", "mixed"}``.

        Evolution contract (VERDICT r6, the Delta/Iceberg add-column
        rule): an append may ADD new columns — they become nullable
        table columns, and rows from older files read as NULL — but it
        may never drop a column, change a column's type, or otherwise
        drift: that would corrupt snapshot reads. ``mixed`` marks a
        manifest whose file set spans more than one physical schema,
        switching reads to footer-merged mode."""
        base = self._read_pointer(parent)
        table = self._manifest_schema(base)
        if table is None:
            want = base["schema"]
            got = df.schema.simpleString()
            if got != want:
                raise ValueError(
                    "VersionedTable: schema mismatch — a drifted append "
                    f"would corrupt snapshot reads. table={want} df={got}"
                )
            return {
                "schema": want,
                "schema_json": df.schema.json(),
                "mixed": bool(base.get("mixed")),
            }
        got_fields = {f.name: f for f in df.schema.fields}
        table_names = {f.name for f in table.fields}
        for f in table.fields:
            if f.name not in got_fields:
                raise ValueError(
                    "VersionedTable: schema mismatch — append drops "
                    f"column '{f.name}'; only ADDITIVE evolution (new "
                    "nullable columns) is supported. "
                    f"table={table.simpleString()} "
                    f"df={df.schema.simpleString()}"
                )
            if got_fields[f.name].dataType != f.dataType:
                raise ValueError(
                    "VersionedTable: schema mismatch — column "
                    f"'{f.name}' type drift "
                    f"{f.dataType.simpleString()} → "
                    f"{got_fields[f.name].dataType.simpleString()}; only "
                    "ADDITIVE evolution (new nullable columns) is "
                    "supported."
                )
        new_fields = [
            T.StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name not in table_names
        ]
        # a new column may not take a name some live footer still
        # carries PHYSICALLY — a DROPPED column's name (or any of its
        # aliases) would resurrect the old bytes through the
        # name-mapped read, and a renamed column's pre-rename physical
        # name would feed TWO logical columns at once
        forbidden = set(base.get("dropped_phys") or [])
        for chain in (base.get("aliases") or {}).values():
            forbidden.update(chain)
        for f in new_fields:
            if f.name in forbidden:
                raise ValueError(
                    "VersionedTable: schema mismatch — new column "
                    f"'{f.name}' collides with a physical name live in "
                    "pre-drop/pre-rename files; a name-mapped read "
                    "would surface the OLD bytes. Pick a fresh name."
                )
        merged = T.StructType(list(table.fields) + new_fields)
        return {
            "schema": merged.simpleString(),
            "schema_json": merged.json(),
            "mixed": bool(base.get("mixed")) or bool(new_fields),
        }

    def head_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise IOError(f"VersionedTable: {self.path} has no commits")
        return vs[-1]

    def _commit_ts_ms(self, version: int) -> int:
        """Commit instant = the manifest file's mtime (the CAS rename
        IS the commit). Local tables stat directly; scheme'd paths ask
        the Hadoop FS."""
        if self._local:
            return int(os.stat(self._manifest_path(version)).st_mtime * 1000)
        return self._fs.getFileStatus(
            self._P(self._manifest_path(version))
        ).getModificationTime()

    def version_as_of(self, ts_ms: int) -> int:
        """Highest version committed at or before the epoch-millis
        timestamp — Delta's ``TIMESTAMP AS OF`` resolution. Commit time
        is the manifest file's modification time (the CAS rename IS
        the commit instant). O(versions) metadata stats, no data IO."""
        best = None
        for v in self.versions():
            mt = self._commit_ts_ms(v)
            if mt <= ts_ms:
                best = v
        if best is None:
            raise ValueError(
                f"VersionedTable: no version committed at or before "
                f"ts_ms={ts_ms} (earliest commit is after it)"
            )
        return best

    def history(self) -> DataFrame:
        """Commit log as a DataFrame (the DESCRIBE HISTORY surface):
        one row per version with op, parent, txn, file count, and
        commit time (epoch millis). O(versions) manifest reads —
        bounded metadata, never data."""
        rows = []
        for v in self.versions():
            m = self._read_pointer(v)
            mt = self._commit_ts_ms(v)
            if "segments" in m:
                # the pointer records its file count — history never
                # needs to open a segment
                n_files = m.get("n_files")
                if n_files is None:  # pragma: no cover - belt and braces
                    n_files = len(self._resolve(m)["files"])
            else:
                n_files = len(m.get("files") or [])
            rows.append(
                (
                    v,
                    m.get("parent"),
                    m.get("op"),
                    m.get("txn"),
                    n_files,
                    int(mt),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version int, parent int, op string, txn string,"
            " n_files int, commit_ts_ms long",
        )

    # the (file, row-position) key columns a DV-aware read threads
    # through its plan; reserved names, dropped before results surface
    _DV_FILE = "__smetl_dv_file"
    _DV_POS = "__smetl_dv_pos"

    #: (candidate files opened, total files) of the LAST merge()'s
    #: target-side find-scan on this handle — gate/dashboard
    #: introspection for the keyed pruning (r12); None before any merge
    last_merge_scan_files: tuple | None = None

    def _read_files(
        self,
        manifest: dict,
        files: list[str],
        apply_dvs: bool = True,
        with_pos: bool = False,
    ) -> DataFrame:
        """Read a manifest's files under the MANIFEST's schema. A
        ``mixed`` manifest (additive evolution happened) merges the
        physical footer schemas so pre-evolution files surface NULL
        for the added columns, then projects the manifest's column
        order — a snapshot always reads as exactly its recorded
        schema, whatever physical layouts it spans. An EMPTY file list
        (a delete removed every row) reads as zero rows under the
        manifest schema.

        DELETION VECTORS (merge-on-read DML, VERDICT r8 #5): when the
        manifest carries ``delete_vectors`` — parquet directories of
        (file, row-position) keys committed by ``delete(mode='mor')``
        — the scan LEFT-ANTI-JOINS them out on the parquet
        ``_metadata`` (file_path, row_index) hidden columns, so
        deleted rows vanish at read time without any file having been
        rewritten. The DV side is bounded by deleted rows; AQE picks a
        broadcast when it is small (the common case), and OPTIMIZE
        compacts vectors away entirely. ``apply_dvs=False`` is for
        internal find-scans that must see physical rows;
        ``with_pos=True`` keeps the (file, position) key columns on
        the result for writers OF new vectors."""
        if not files:
            schema = self._manifest_schema(manifest)
            empty = (
                self.spark.createDataFrame([], schema)
                if schema is not None
                else self.spark.createDataFrame([], manifest["schema"])
            )
            if with_pos:
                empty = empty.select(
                    "*",
                    F.lit(None).cast("string").alias(self._DV_FILE),
                    F.lit(None).cast("long").alias(self._DV_POS),
                )
            return empty
        dv_dirs = (manifest.get("delete_vectors") or []) if apply_dvs else []
        if manifest.get("mixed"):
            # REQUESTED-SCHEMA read over the physical generations
            # (r11, replacing mergeSchema): the manifest's own types
            # are requested for every current name AND every alias-
            # chain name, so (a) pre-evolution files NULL-fill missing
            # columns, (b) renamed columns surface under their old
            # physical names for the coalesce below, and (c) files
            # written before a type WIDENING read through Spark 4's
            # parquet type-promotion (int→long, float→double) — which
            # mergeSchema refuses to unify. No footer pre-pass either:
            # cheaper at many files.
            schema_req = self._manifest_schema(manifest)
            aliases_req = manifest.get("aliases") or {}
            fields = list(schema_req.fields)
            have = {f.name for f in fields}
            for f in schema_req.fields:
                for a in aliases_req.get(f.name, ()):
                    if a not in have:
                        fields.append(T.StructField(a, f.dataType, True))
                        have.add(a)
            raw = self.spark.read.schema(T.StructType(fields)).parquet(
                *files
            )
        else:
            # NON-mixed manifests: every footer matches the recorded
            # schema exactly, so pass it explicitly — schema INFERENCE
            # otherwise opens a footer on the driver per read call
            # (~30-60 ms here; a remote-FS round trip at scale). Delta/
            # Iceberg readers never infer either — the manifest owns
            # the schema. Legacy manifests without schema_json keep
            # the inference fallback.
            schema0 = self._manifest_schema(manifest)
            if schema0 is not None:
                raw = self.spark.read.schema(schema0).parquet(*files)
            else:
                raw = self.spark.read.parquet(*files)
        df = raw
        if dv_dirs or with_pos:
            df = raw.select(
                raw["*"],
                F.col("_metadata.file_path").alias(self._DV_FILE),
                F.col("_metadata.row_index").alias(self._DV_POS),
            )
        if dv_dirs:
            dv = self.spark.read.parquet(*dv_dirs)
            df = df.join(dv, [self._DV_FILE, self._DV_POS], "left_anti")
        if manifest.get("mixed"):
            schema = self._manifest_schema(manifest)
            # a SUBSET read (delete's touched files, a CDC range) may
            # span only pre-evolution files — columns the manifest
            # declares but no opened footer carries NULL-fill, exactly
            # as they would in a full-snapshot read. A RENAMED column
            # (VERDICT r9 #4) reads through its alias chain: files
            # written before the rename carry the OLD physical name,
            # so the projection coalesces current-name and alias
            # columns — per row exactly one of them comes from the
            # row's own file, the others are merge-schema NULLs.
            aliases = manifest.get("aliases") or {}
            present = set(raw.columns)
            cols = []
            for f in schema.fields:
                cands = [
                    n
                    for n in [f.name, *aliases.get(f.name, [])]
                    if n in present
                ]
                if not cands:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                elif len(cands) == 1:
                    cols.append(F.col(cands[0]).alias(f.name))
                else:
                    cols.append(
                        F.coalesce(*[F.col(n) for n in cands]).alias(f.name)
                    )
        else:
            cols = [F.col(c) for c in raw.columns]
        if with_pos:
            cols += [F.col(self._DV_FILE), F.col(self._DV_POS)]
        return df.select(*cols)

    def read(self, version: int | None = None) -> DataFrame:
        """Full-snapshot read of ``version`` (default: head).

        The LAZY plan is memoized per (application, path, version,
        manifest-file identity) — r16 optimization, same design as the
        r15 ``catalog.load_table`` memo: a committed manifest is
        immutable (the CAS creates, never rewrites), so the snapshot
        plan it pins never changes; DML pipelines and the SQL head-view
        refresh otherwise rebuild the identical plan several times per
        statement (~70 ms of driver/py4j work each). Plans only, never
        data: every action still scans the parquet, and a table
        directory deleted and recreated at the same path/version has a
        different manifest mtime (identity folded into the key) so it
        misses. A plan for a since-vacuumed old version fails at action
        time exactly like a freshly built one would."""
        v = self.head_version() if version is None else version
        ident = None
        if self._local:
            try:
                st = os.stat(self._manifest_path(v))
                ident = (st.st_mtime_ns, st.st_size)
            except OSError:
                ident = None
        key = (
            self.spark.sparkContext.applicationId,
            self.path,
            v,
            ident,
        )
        df = _READ_PLAN_MEMO.get(key)
        if df is not None:
            # the memo skips only the PLAN BUILD — the protocol gate
            # still runs per read (a build whose SUPPORTED_FEATURES
            # cannot interpret this table must refuse even on a hit;
            # _read_pointer applies _check_features)
            self._read_pointer(v)
            return df
        m = self._read_manifest(v)
        df = self._read_files(m, m["files"])
        if len(_READ_PLAN_MEMO) > 1024:
            _READ_PLAN_MEMO.clear()  # bounded; a miss just rebuilds
        _READ_PLAN_MEMO[key] = df
        return df

    def append(
        self,
        df: DataFrame,
        max_retries: int = 10,
        txn: str | None = None,
        _commit_extra: dict | None = None,
    ) -> int:
        """Commit new rows. Commutes with concurrent appends: a CAS
        loser rebases its (already-written) files onto the winner —
        including re-validating the schema against the winner's
        manifest, since the winner may itself have evolved the schema.
        ``txn`` records an application transaction id in the manifest
        (see :meth:`committed_txns`) for idempotent replay. Additive
        schema evolution (new nullable columns) is allowed; see
        :meth:`_check_schema`.

        METADATA COST: on a segmented table this writes ONE segment of
        size O(appended files) and a pointer listing segment names —
        the table's own file list is never materialized, so a commit
        to a 10⁶-file table moves the same few KB as a commit to a
        10-file one. Legacy inline tables keep the old O(all files)
        manifest write."""
        parent = self.head_version()
        _ptr0 = self._read_pointer(parent)
        id_map = _ptr0.get("identity") or {}
        df, id_alloc = self._alloc_identity(df, id_map)
        if id_alloc:
            # allocation appends the column; restore the table's
            # declared column order for the written files
            tbl = self._manifest_schema(_ptr0)
            if tbl is not None:
                order = [f.name for f in tbl.fields if f.name in df.columns]
                order += [c for c in df.columns if c not in order]
                df = df.select(*order)
        df = self._apply_generated(df, _ptr0.get("generated"))
        sch = self._check_schema(df, parent)
        partition_by = _ptr0.get("partition_by")
        bucket_by = _ptr0.get("bucket_by")
        files = self._write_data(df, parent + 1, partition_by, bucket_by)
        id_marks = (
            self._identity_watermark(files, id_map, id_alloc)
            if id_alloc
            else {}
        )
        new_parts = None
        new_stats = None
        new_segs = None
        new_checked = False
        for _ in range(max_retries):
            base = self._read_pointer(parent)
            if id_alloc and (base.get("identity") or {}) != id_map:
                # a raced commit advanced the identity watermark: the
                # staged files carry ids allocated from the STALE
                # watermark and could collide with the winner's —
                # refuse the rebase; a re-run reallocates from the
                # new head (uniqueness over convenience, the Delta
                # identity-conflict behavior)
                raise ConcurrentWriteError(
                    "VersionedTable: append raced a commit that "
                    "advanced the identity watermark; the staged ids "
                    "are stale — re-run"
                )
            # a raced writer may have changed the PARTITION SPEC (an
            # overwrite(replace_schema=True) can drop the partition
            # column); our files are already laid out under the stale
            # spec, so rebasing would commit a manifest whose
            # partition_by disagrees with its file layout (ADVICE r8)
            if (
                base.get("partition_by") != partition_by
                or base.get("bucket_by") != bucket_by
            ):
                raise ConcurrentWriteError(
                    "VersionedTable: append raced a commit that changed "
                    f"the partition/bucket spec ({partition_by!r}/"
                    f"{bucket_by!r} → {base.get('partition_by')!r}/"
                    f"{base.get('bucket_by')!r}); the staged files "
                    "follow the old layout — re-run"
                )
            v = parent + 1
            stats_cols = base.get("stats_cols") or []
            m = {
                "version": v,
                "parent": parent,
                "op": "append",
                "schema": sch["schema"],
                "schema_json": sch["schema_json"],
                "mixed": sch["mixed"],
                "txn": txn,
                "txns": self._txns_after(base, txn),
                "stats_cols": stats_cols,
                "bloom": base.get("bloom"),
                "partition_by": partition_by,
                "constraints": base.get("constraints") or {},
            }
            m = self._carry_mapping(m, base)
            if id_marks:
                m["identity"] = self._bump_identity(id_map, id_marks)
            if base.get("delete_vectors"):
                # new files carry no deleted rows; existing vectors
                # still apply to the files they were cut for
                m["delete_vectors"] = base["delete_vectors"]
            if "segments" in base:
                if new_segs is None:
                    new_segs = self._build_segments(
                        files, stats_cols, partition_by, base.get("bloom")
                    )
                m["segments"] = base["segments"] + new_segs
                m["n_files"] = base.get("n_files", 0) + len(files)
            else:
                if (stats_cols or base.get("bloom")) and new_stats is None:
                    new_stats = self._collect_stats(
                        files, stats_cols, base.get("bloom")
                    )
                if new_parts is None:
                    new_parts = (
                        self._partition_values(files, partition_by)
                        if partition_by
                        else {}
                    )
                m["files"] = sorted(base["files"] + files)
                m["stats"] = {
                    **(base.get("stats") or {}),
                    **(new_stats or {}),
                }
                m["parts"] = {**(base.get("parts") or {}), **new_parts}
            if _commit_extra:
                # op-specific metadata riders (copy_into's loaded-file
                # record) — never core manifest keys, so the rebase
                # loop can re-apply them verbatim each attempt
                m.update(_commit_extra)
            if new_checked is False:
                # new files carry no deletion vectors — skip the anti-join
                self._check_constraints(files, {**m, "delete_vectors": []})
                new_checked = True
            if self._try_commit(m, v):
                return v
            parent = self.head_version()
            sch = self._check_schema(df, parent)
        raise ConcurrentWriteError(
            f"VersionedTable: append lost {max_retries} CAS races"
        )

    def copy_into(
        self,
        src: str,
        file_format: str = "parquet",
        pattern: str | None = None,
        txn: str | None = None,
    ) -> int:
        """COPY INTO — Delta's idempotent file-ingestion statement
        (r13): load data files from ``src`` into the table, SKIPPING
        any file a previous ``copy_into`` already loaded — so retries,
        crash re-runs, and overlapping schedules are exactly-once per
        FILE with zero caller bookkeeping (the property that makes
        COPY INTO the standard landing-zone→table step: at 100 TB the
        loader WILL be re-run against a partially-loaded directory).

        File identity is the scheme-stripped path, recorded in the
        commit under ``copied_files``; the already-loaded set is the
        union over ALL commits' records — O(versions) pointer reads
        per call, the same bounded-metadata poll ``read_changes``
        does, with no per-commit carry-forward bloat. The commit
        itself IS an append (op ``append`` + the record), so schema
        checking, constraints, segments, the change feeds, and the
        append-chain streaming source all treat it natively —
        exactly how Delta's COPY INTO commits AddFiles.

        ``pattern`` is an fnmatch glob on file BASENAMES (Delta's
        PATTERN option); underscore/dot-prefixed files (_SUCCESS,
        checksums) are always skipped. Listing is one directory level
        — point at the leaf dir, like Delta. Returns the new version,
        or the current version unchanged if every listed file was
        already loaded (no empty commits)."""
        import fnmatch

        src_path = self._P(src)
        src_fs = src_path.getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not src_fs.exists(src_path):
            raise ValueError(f"copy_into: source {src!r} does not exist")
        listed: dict[str, str] = {}  # identity -> qualified path
        for st in src_fs.listStatus(src_path):
            if not st.isFile():
                continue
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if pattern is not None and not fnmatch.fnmatch(name, pattern):
                continue
            listed[st.getPath().toUri().getPath()] = str(st.getPath())
        already: set[str] = set()
        for v in self.versions():
            already.update(self._read_pointer(v).get("copied_files") or [])
        new = sorted(set(listed) - already)
        if not new:
            return self.head_version()
        df = self.spark.read.format(file_format).load(
            [listed[i] for i in new]
        )
        return self.append(
            df, txn=txn, _commit_extra={"copied_files": new}
        )

    def upsert(
        self,
        df: DataFrame,
        key_cols: list[str],
        order_cols: list[str],
    ) -> int:
        """Latest-wins MERGE as a new snapshot: read the head, merge,
        write a FULL new file set, commit. First-committer-wins — if
        the head moved while merging, the merge is stale and the
        caller must re-run (snapshot isolation).

        On a ``change_data_feed=True`` table the commit also records
        classified CDC rows (insert / update_preimage /
        update_postimage — VERDICT r10 #8), so ``read_change_feed``
        and the ``versioned_cdc`` stream cover upsert commits: the
        foreachBatch-MERGE serving pattern is the commonest rewrite a
        CDF consumer sits downstream of. Classification is bounded by
        the SOURCE's distinct keys, not the table."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        parent = self.head_version()
        if self._read_pointer(parent).get("identity"):
            raise ValueError(
                "VersionedTable.upsert: table has GENERATED ALWAYS "
                "AS IDENTITY column(s) — upsert cannot allocate ids; "
                "ingest via append/INSERT INTO, or create the table "
                "without IDENTITY"
            )
        current = self.read(parent)
        df = self._apply_generated(
            df, self._read_pointer(parent).get("generated")
        )
        merged = current.unionByName(df.select(*current.columns))
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.desc(c) for c in order_cols]
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        base = self._read_pointer(parent)
        partition_by = base.get("partition_by")
        files = self._write_data(
            latest, parent + 1, partition_by, base.get("bucket_by")
        )
        v = parent + 1
        cdc_dir = None
        if base.get("cdf"):
            # change-data-feed table (VERDICT r10 #8): classify the
            # upsert's row-level changes at commit time — the
            # foreachBatch-MERGE serving pattern is the commonest
            # rewrite a CDF consumer sits behind. Work is bounded by
            # the SOURCE: only its distinct keys can change, so both
            # snapshots semi-filter to O(touched keys) before the
            # compare (the small side broadcasts in the common
            # serving case). Null-SAFE key equality throughout,
            # matching the latest-wins window's null grouping. A key
            # whose winning row is unchanged (the incoming row lost,
            # or tied content) records nothing.
            val_cols = [c for c in current.columns if c not in key_cols]
            # read the new snapshot back from the files the write above
            # just materialized instead of re-executing the union +
            # latest-wins window plan (r16, guide §8 "move heavy bytes
            # once": the data write already materialized ``latest``;
            # without the read-back the CDC classification executed
            # the whole merge plan a second time). Leaf files carry
            # every logical column (partition dir columns are cast
            # COPIES), so an explicit-schema read is byte-equal to
            # ``latest``. An all-empty write (no part files) falls
            # back to the lazy frame — nothing to re-execute there.
            latest_w = (
                self.spark.read.schema(latest.schema).parquet(*files)
                if files
                else latest
            )
            skeys = df.select(
                F.struct(*key_cols).alias("__sk")
            ).distinct()

            def _packed(frame, tag):
                p = frame.select(
                    F.struct(*key_cols).alias("__k"),
                    F.struct(
                        F.lit(True).alias("__one"),
                        *[F.col(c) for c in val_cols],
                    ).alias(tag),
                )
                return p.join(
                    skeys, p["__k"].eqNullSafe(skeys["__sk"]), "left_semi"
                )

            cur_t = _packed(current, "__pre")
            new_t = _packed(latest_w, "__post")
            j = new_t.join(
                cur_t, new_t["__k"].eqNullSafe(cur_t["__k"]), "left"
            ).select(new_t["__k"], cur_t["__pre"], new_t["__post"])

            def _unpack(tag):
                return [
                    (
                        F.col(f"__k.{c}")
                        if c in key_cols
                        else F.col(f"{tag}.{c}")
                    ).alias(c)
                    for c in current.columns
                ]

            changed = j.where(
                F.col("__pre").isNull()
                | ~F.col("__pre").eqNullSafe(F.col("__post"))
            )
            inserts = changed.where(F.col("__pre").isNull()).select(
                *_unpack("__post"), F.lit("insert").alias("_change_type")
            )
            upd = changed.where(F.col("__pre").isNotNull())
            cdc = (
                inserts.unionByName(
                    upd.select(
                        *_unpack("__pre"),
                        F.lit("update_preimage").alias("_change_type"),
                    )
                ).unionByName(
                    upd.select(
                        *_unpack("__post"),
                        F.lit("update_postimage").alias("_change_type"),
                    )
                )
            )
            # same non-empty guard as merge/delete/update: a source
            # whose every row lost (or tied) changes nothing; the
            # guard reads the written footers (one plan execution)
            cdc_dir = self._write_cdc_if_any(cdc, v)
        stats_cols = base.get("stats_cols") or []
        m = {
            "version": v,
            "parent": parent,
            "op": "upsert",
            "schema": base["schema"],
            "schema_json": base.get("schema_json", latest.schema.json()),
            # a full rewrite lands every logical column in every file,
            # collapsing any earlier mixed layout back to uniform
            "mixed": False,
            "txns": self._txns_after(base, None),
            "stats_cols": stats_cols,
            "bloom": base.get("bloom"),
            "partition_by": partition_by,
            "constraints": base.get("constraints") or {},
        }
        m = self._carry_mapping(m, base)
        if cdc_dir:
            m["cdc"] = cdc_dir
        stats = parts = None
        if "segments" not in base:
            stats = (
                self._collect_stats(files, stats_cols, base.get("bloom"))
                if stats_cols or base.get("bloom")
                else {}
            )
            parts = (
                self._partition_values(files, partition_by)
                if partition_by
                else {}
            )
        if "segments" in base:
            # full rewrite → fresh consolidated segments (chunked)
            m["segments"] = self._build_segments(
                files, stats_cols, partition_by, base.get("bloom")
            )
            m["n_files"] = len(files)
        else:
            m.update({"files": files, "stats": stats, "parts": parts})
        self._check_constraints(files, m)
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: upsert merged against stale v{parent}; "
                f"head is now v{self.head_version()} — re-run"
            )
        return v

    def read_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Incremental read: the rows ADDED between two committed
        versions (exclusive of ``from_version``, inclusive of
        ``to_version``; default head) — the Delta/Iceberg
        incremental-consumption pattern that drives downstream
        backfills without rescanning the table.

        Resolution is FILE-LEVEL metadata only: along an append-only
        commit chain the delta is exactly the files present in the
        newer manifest but not the older one, so at 100 TB this plans
        a scan of just the new files and never touches existing data.
        A rewrite commit (upsert/overwrite) in the range makes
        "added rows" ill-defined at the file level — those manifests'
        ``op`` says so, and this raises rather than double-counting
        rewritten rows (consumers of a rewritten range re-read the
        snapshot instead)."""
        head = self.head_version()
        to_v = head if to_version is None else to_version
        if from_version > to_v:
            raise ValueError(
                f"read_changes: from_version {from_version} is newer "
                f"than to_version {to_v}"
            )
        vs = [v for v in self.versions() if from_version < v <= to_v]
        rewrites = [
            v
            for v in vs
            if self._read_pointer(v).get("op")
            # rename is metadata-only (zero files move), so the
            # file-level diff stays well-defined across it; optimize
            # is NOT allowed here — compaction rewrites files and the
            # diff would double-count their rows (ADVICE r10)
            not in ("append",) + METADATA_ONLY_OPS
        ]
        if rewrites:
            raise ValueError(
                "read_changes: version range contains rewrite commits "
                f"{rewrites} (upsert/overwrite) — added-rows semantics "
                "are only defined along append-only chains; re-read the "
                "snapshot instead"
            )
        base_ptr = self._read_pointer(from_version)
        target_ptr = self._read_pointer(to_v)
        if "segments" in base_ptr and "segments" in target_ptr:
            # segment-level diff: along an append-only span the target
            # only ADDED segments, so the delta never materializes the
            # base file list — O(new segments) metadata at any table
            # size
            base_segs = set(base_ptr["segments"])
            new_files = sorted(
                f
                for s in target_ptr["segments"]
                if s not in base_segs
                for f in self._read_segment(s)["files"]
            )
            target = target_ptr
        else:
            base = self._resolve(base_ptr)
            target = self._resolve(target_ptr)
            new_files = sorted(set(target["files"]) - set(base["files"]))
        if not new_files:
            return self._read_files(
                target, self._resolve(target_ptr)["files"]
            ).limit(0)
        return self._read_files(target, new_files)

    # CDF metadata column names (the Delta Change Data Feed surface)
    _CDF_TYPE = "_change_type"
    _CDF_VERSION = "_commit_version"

    def read_change_feed(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """TYPED change feed over (``from_version``, ``to_version``] —
        the Delta CDF surface (r10): each emitted row carries
        ``_change_type`` (``insert``/``delete``) and
        ``_commit_version``, so a downstream consumer can maintain a
        replica or an aggregate across commits that REMOVE rows — the
        case :meth:`read_changes` must refuse.

        Per-commit resolution, all file-level metadata:

        - ``append``/``create`` commits emit their new files' rows as
          ``insert`` (exactly the :meth:`read_changes` diff);
        - ``delete(mode='mor')`` commits emit the rows their NEW
          deletion vector hid as ``delete``: the vector's (file,
          row-position) keys name the touched files (bounded collect,
          ≤ one row per file), only those files are re-read, and the
          inner join on the scan's ``_metadata`` position recovers the
          deleted rows' full content. A position can only be deleted
          once (the MoR find-scan is DV-applied), so emissions never
          duplicate;
        - on a ``change_data_feed=True`` table, COW delete/update,
          MERGE, upsert, and overwrite commits recorded their
          row-level changes as CDC files at commit time (r10-r11, the
          Delta enableChangeDataFeed contract) and the feed reads
          them typed (insert / delete / update_preimage /
          update_postimage);
        - rename, drop, set_partition_spec (metadata-only) and
          optimize (content-identical rewrite) change zero logical
          rows and are skipped, as Delta CDF does;
        - a rewrite commit on a NON-cdf table still raises: its
          row-level diff is not recoverable from file metadata alone
          — enable the feed at create() or re-snapshot.

        Rows read under each commit's own manifest and union BY NAME
        with NULL-fill, so additive evolution mid-range is fine; the
        plan is O(commits in range) unions of O(changed files) scans —
        consumers poll bounded ranges, exactly like read_changes."""
        from urllib.parse import unquote, urlparse

        head = self.head_version()
        to_v = head if to_version is None else to_version
        if from_version > to_v:
            raise ValueError(
                f"read_change_feed: from_version {from_version} is newer "
                f"than to_version {to_v}"
            )
        span = [v for v in self.versions() if from_version < v <= to_v]
        frames = []
        for v in span:
            ptr = self._read_pointer(v)
            op = ptr.get("op")
            if op in METADATA_ONLY_OPS:
                continue  # metadata-only: no rows changed
            if op == "optimize":
                # content-identical rewrite (compaction / Z-order /
                # DV fold-in): zero logical row changes — Delta CDF
                # likewise emits nothing for OPTIMIZE (ADVICE r10)
                continue
            if op in ("append", "create"):
                base_ptr = self._read_pointer(ptr["parent"]) if ptr.get(
                    "parent"
                ) is not None else None
                if base_ptr is not None and "segments" in base_ptr and (
                    "segments" in ptr
                ):
                    base_segs = set(base_ptr["segments"])
                    new_files = sorted(
                        f
                        for s_ in ptr["segments"]
                        if s_ not in base_segs
                        for f in self._read_segment(s_)["files"]
                    )
                else:
                    m_v = self._resolve(ptr)
                    base_files = (
                        set(self._resolve(base_ptr)["files"])
                        if base_ptr is not None
                        else set()
                    )
                    new_files = sorted(set(m_v["files"]) - base_files)
                if not new_files:
                    continue
                df = self._read_files(
                    self._resolve(ptr), new_files, apply_dvs=False
                )
                frames.append(
                    df.select(
                        "*",
                        F.lit("insert").alias(self._CDF_TYPE),
                        F.lit(v).cast("int").alias(self._CDF_VERSION),
                    )
                )
                continue
            if op == "delete" and ptr.get("mode") == "mor":
                parent_dvs = set(
                    self._read_pointer(ptr["parent"]).get("delete_vectors")
                    or []
                )
                new_dvs = [
                    d
                    for d in (ptr.get("delete_vectors") or [])
                    if d not in parent_dvs
                ]
                if not new_dvs:
                    continue
                dv = self.spark.read.parquet(*new_dvs)
                touched = {
                    unquote(urlparse(r[0]).path)
                    for r in dv.select(self._DV_FILE).distinct().collect()
                }
                m_v = self._resolve(ptr)
                files = [f for f in m_v["files"] if f in touched]
                rows = self._read_files(
                    m_v, files, apply_dvs=False, with_pos=True
                )
                deleted = rows.join(
                    dv, [self._DV_FILE, self._DV_POS], "inner"
                ).drop(self._DV_FILE, self._DV_POS)
                frames.append(
                    deleted.select(
                        "*",
                        F.lit("delete").alias(self._CDF_TYPE),
                        F.lit(v).cast("int").alias(self._CDF_VERSION),
                    )
                )
                continue
            if ptr.get("cdc"):
                # a change-data-feed table's COW commit recorded its
                # row-level changes at commit time (_change_type rides
                # in the CDC parquet: insert / delete /
                # update_preimage / update_postimage)
                frames.append(
                    self.spark.read.parquet(ptr["cdc"]).select(
                        "*",
                        F.lit(v).cast("int").alias(self._CDF_VERSION),
                    )
                )
                continue
            if ptr.get("cdf") and op in (
                "delete", "update", "merge", "upsert", "overwrite",
                "restore", "replace_where",
            ):
                continue  # CDF-recorded commit that changed zero rows
            raise ValueError(
                f"read_change_feed: version {v} is op '{op}'"
                + (f"/mode '{ptr.get('mode')}'" if op == "delete" else "")
                + " — row-level changes are only recoverable for append,"
                " merge-on-read delete, and CDC-recorded commits"
                " (create(change_data_feed=True)); re-snapshot instead"
            )
        target_schema = self._manifest_schema(self._read_pointer(to_v))
        meta_cols = [self._CDF_TYPE, self._CDF_VERSION]
        if not frames:
            empty = self._read_files(self._read_manifest(to_v), [])
            return empty.select(
                "*",
                F.lit(None).cast("string").alias(self._CDF_TYPE),
                F.lit(None).cast("int").alias(self._CDF_VERSION),
            ).limit(0)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        if target_schema is not None:
            # emit the feed under the TARGET version's schema: a
            # column renamed mid-range coalesces through its alias
            # chain (earlier commits' frames carry the old logical
            # name), a column dropped by to_v is omitted entirely
            # (its tombstoned bytes must not resurface — r11), and a
            # column added after a frame's commit NULL-fills, exactly
            # like snapshot reads across evolution.
            aliases = self._read_pointer(to_v).get("aliases") or {}
            present = set(out.columns)
            cols = []
            for f in target_schema.fields:
                cands = [
                    n
                    for n in [f.name, *aliases.get(f.name, [])]
                    if n in present
                ]
                if not cands:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                elif len(cands) == 1:
                    cols.append(F.col(cands[0]).alias(f.name))
                else:
                    cols.append(
                        F.coalesce(*[F.col(n) for n in cands]).alias(f.name)
                    )
            out = out.select(*cols, *[F.col(c) for c in meta_cols])
        return out

    def overwrite(
        self,
        df: DataFrame,
        txn: str | None = None,
        replace_schema: bool = False,
        partition_by=_UNSET,
        generated: dict[str, str] | None = None,
        constraints: dict[str, str] | None = None,
        properties: dict[str, str] | None = None,
        identity: dict[str, dict] | None = None,
    ) -> int:
        """Transactional truncate-and-load (the reference's K4 on the
        versioned layer): replace the table contents as ONE atomic
        snapshot swap — readers see the old version or the new one,
        never a mix, and time travel to pre-overwrite versions still
        works. First-committer-wins like :meth:`upsert`: an overwrite
        races a concurrent commit only if the caller's intent ("replace
        what I last saw") is stale, so a lost CAS raises for a re-run.

        By default the replacement must carry the table's schema
        (additive widening allowed, same as append); pass
        ``replace_schema=True`` to swap in a new schema entirely — the
        full-rewrite analogue of Delta's ``overwriteSchema``.

        With ``replace_schema=True`` the call is the REPLACE TABLE
        primitive (r14 — SQL ``CREATE OR REPLACE TABLE`` rides it),
        so the table-defining maps may be redefined in the SAME
        commit: ``partition_by`` installs a new spec for the rewritten
        files (every old file is gone, so no mixed-spec reads — pass
        ``None`` explicitly to drop partitioning; omit to carry the
        old spec), ``generated`` declares a NEW generation map
        (computed-or-validated on the replacement frame, exactly the
        create contract; omitted = the old map drops, as before), and
        ``constraints`` REPLACES the constraint map (validated
        against the new rows; omitted = old constraints carry, with
        a crisp refusal if one references a dropped column), and
        ``properties`` REPLACES the table-property map in the same
        commit (r15, ADVICE r14 #1 — previously SQL REPLACE reset
        properties via follow-up set/unset commits, leaving a window
        where a crash or concurrent reader saw the new definition
        carrying the old table's behavior-affecting properties such
        as ``smetl.dml.mode``; pass ``{}`` to clear, omit to carry
        the old map). All four refuse without ``replace_schema`` —
        they redefine the table, which a schema-preserving overwrite
        must not."""
        parent = self.head_version()
        if not replace_schema and (
            partition_by is not _UNSET
            or generated is not None
            or constraints is not None
            or properties is not None
            or identity is not None
        ):
            raise ValueError(
                "VersionedTable.overwrite: partition_by / generated / "
                "constraints / properties / identity redefine the "
                "table — they require replace_schema=True"
            )
        if properties is not None:
            self._validate_properties(properties)
        id_map: dict[str, dict] = {}
        id_alloc: list[str] = []
        if replace_schema:
            if identity:
                # REPLACE declares a NEW identity contract (create's
                # semantics); omitted = the old map drops with the
                # rest of the old schema, like generated
                self._validate_identity(
                    identity,
                    sorted(set(df.columns) | set(identity)),
                    generated,
                )
                for col, spec in identity.items():
                    s = int(spec.get("start", 1))
                    i = int(spec.get("step", 1))
                    id_map[col] = {"start": s, "step": i, "high": s - i}
                df, id_alloc = self._alloc_identity(
                    df, id_map, allow_present=True
                )
        else:
            id_map = self._read_pointer(parent).get("identity") or {}
            # a truncate-and-load CONTINUES the sequence from the
            # watermark — ids are never reused (Delta's contract)
            df, id_alloc = self._alloc_identity(df, id_map)
            if id_alloc:
                tbl = self._manifest_schema(self._read_pointer(parent))
                if tbl is not None:
                    order = [
                        f.name for f in tbl.fields if f.name in df.columns
                    ]
                    order += [c for c in df.columns if c not in order]
                    df = df.select(*order)
        if not replace_schema:
            # replace_schema redefines the table, dropping the
            # generation contract with the rest of the old schema;
            # a plain overwrite keeps enforcing it on the new rows
            df = self._apply_generated(
                df, self._read_pointer(parent).get("generated")
            )
        elif generated:
            for g, gexpr in generated.items():
                circular = set(generated) & self._expr_identifiers(gexpr)
                if circular:
                    raise ValueError(
                        "VersionedTable.overwrite: generated column "
                        f"'{g}' expression references generated "
                        f"column(s) {sorted(circular)} — generation "
                        "expressions may only use regular columns"
                    )
            df = self._apply_generated(df, generated)
        if replace_schema:
            sch = {
                "schema": df.schema.simpleString(),
                "schema_json": df.schema.json(),
                "mixed": False,
            }
        else:
            sch = self._check_schema(df, parent)
            # a full rewrite lands every logical column in every file
            sch["mixed"] = False
        base = self._read_pointer(parent)
        new_pb = partition_by
        partition_by = base.get("partition_by")
        if replace_schema and new_pb is not _UNSET:
            partition_by = new_pb
            if partition_by:
                if base.get("bucket_by"):
                    raise ValueError(
                        "VersionedTable.overwrite: partition_by does "
                        "not compose with a bucket layout — the table "
                        "is bucket-spec'd"
                    )
                missing = [
                    c
                    for c in self._pb_cols(partition_by)
                    if c not in df.columns
                ]
                if missing:
                    raise ValueError(
                        "VersionedTable.overwrite: partition column(s) "
                        f"{missing} not in the replacement schema "
                        f"{df.columns}"
                    )
        elif replace_schema and partition_by and any(
            c not in df.columns for c in self._pb_cols(partition_by)
        ):
            partition_by = None  # new schema dropped a partition column
        if replace_schema and constraints is None:
            # CHECK constraints carry across the swap; one whose
            # expression reads a column the new schema dropped would
            # fail every later ingest with a raw Catalyst error —
            # refuse crisply instead, mirroring drop_column (r14)
            old_schema = self._manifest_schema(base)
            old_cols = (
                {f.name for f in old_schema.fields} if old_schema else set()
            )
            for cname, cexpr in (base.get("constraints") or {}).items():
                broken = sorted(
                    (self._expr_identifiers(cexpr) & old_cols)
                    - set(df.columns)
                )
                if broken:
                    raise ValueError(
                        "VersionedTable.overwrite: CHECK constraint "
                        f"{cname!r} references column(s) {broken} "
                        "absent from the replacement schema; drop the "
                        "constraint first (or pass a replacement "
                        "constraints map)"
                    )
        files = self._write_data(
            df, parent + 1, partition_by, base.get("bucket_by")
        )
        v = parent + 1
        cdc_dir = None
        if base.get("cdf"):
            # change-data-feed table (r11, completing the DML set
            # after r10 delete/update/merge and upsert): a
            # truncate-and-load replaces every row, so the CDC is the
            # old snapshot as ``delete`` plus the replacement as
            # ``insert`` — exactly Delta's CDF-on-overwrite, and like
            # Delta it costs O(old + new) extra IO, the price of
            # making a full refresh consumable downstream. Union BY
            # NAME so replace_schema=True overwrites record across
            # the schema swap (the feed NULL-fills either side).
            old_m = self._resolve(base)
            cdc = (
                self._read_files(old_m, old_m["files"])
                .select("*", F.lit("delete").alias("_change_type"))
                .unionByName(
                    df.select("*", F.lit("insert").alias("_change_type")),
                    allowMissingColumns=True,
                )
            )
            cdc_dir = self._write_cdc_if_any(cdc, v)
        stats_cols = base.get("stats_cols") or []
        bloom_cfg = base.get("bloom")
        if replace_schema:
            # the new schema may have dropped indexed columns — keep
            # only the live ones (stats over absent columns would
            # record dead all-NULL census entries forever)
            stats_cols = [c for c in stats_cols if c in df.columns]
            if bloom_cfg:
                live_bloom = [
                    c for c in bloom_cfg["cols"] if c in df.columns
                ]
                bloom_cfg = (
                    {**bloom_cfg, "cols": live_bloom} if live_bloom else None
                )
        m = {
            "version": v,
            "parent": parent,
            "op": "overwrite",
            "schema": sch["schema"],
            "schema_json": sch["schema_json"],
            "mixed": sch["mixed"],
            "txn": txn,
            "txns": self._txns_after(base, txn),
            "stats_cols": stats_cols,
            "bloom": bloom_cfg,
            "partition_by": partition_by,
            "constraints": (
                dict(constraints)
                if replace_schema and constraints is not None
                else base.get("constraints") or {}
            ),
        }
        m = self._carry_mapping(m, base)
        if replace_schema:
            # the schema swap redefines the table — generation
            # expressions over the OLD columns no longer apply; a
            # supplied map declares the NEW contract (create's
            # semantics, r14)
            m.pop("generated", None)
            if generated:
                m["generated"] = dict(generated)
                self._add_feature(m, "generated")
            if constraints:
                self._add_feature(m, "constraints")
            m.pop("identity", None)
            if id_map:
                m["identity"] = self._bump_identity(
                    id_map,
                    self._identity_watermark(files, id_map, id_alloc),
                )
                self._add_feature(m, "identity")
            if properties is not None:
                # the REPLACE lands as ONE commit: the declared
                # property map rides the same CAS as the data swap,
                # so no reader ever sees the new definition under the
                # old table's properties (ADVICE r14 #1)
                if properties:
                    m["properties"] = dict(properties)
                else:
                    m.pop("properties", None)
        elif id_alloc:
            m["identity"] = self._bump_identity(
                id_map,
                self._identity_watermark(files, id_map, id_alloc),
            )
        if cdc_dir:
            m["cdc"] = cdc_dir
        stats = parts = None
        if "segments" not in base:
            stats = (
                self._collect_stats(files, stats_cols, bloom_cfg)
                if stats_cols or bloom_cfg
                else {}
            )
            parts = (
                self._partition_values(files, partition_by)
                if partition_by
                else {}
            )
        if "segments" in base:
            m["segments"] = self._build_segments(
                files, stats_cols, partition_by, bloom_cfg
            )
            m["n_files"] = len(files)
        else:
            m.update({"files": files, "stats": stats, "parts": parts})
        self._check_constraints(files, m)
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: overwrite raced past stale v{parent}; "
                f"head is now v{self.head_version()} — re-run"
            )
        return v

    def restore(self, version: int, txn: str | None = None) -> int:
        """RESTORE TABLE TO VERSION AS OF (the Delta RESTORE command):
        commit a NEW version whose content is byte-identical to
        snapshot ``version`` — METADATA-ONLY. The target's file (and
        segment) references, schema, column mapping, stats and
        constraints are reused as-is, so rolling a 100 TB table back
        costs O(manifest), not O(data). History is preserved: the
        rolled-back versions stay time-travelable until vacuumed, and
        vacuum keeps every file the restore re-references because the
        head manifest now lists them. The ``change_data_feed`` flag is
        a live TABLE property, not snapshot state — it follows the
        current head, Delta-style.

        On a CDF table the commit records the EXACT row-level diff as
        CDC, computed at FILE granularity (content only ever moves by
        whole files): DV-applied rows of files the restore drops are
        ``delete`` preimages, rows of files it re-adds are
        ``insert``s, and rows of KEPT files that a post-``version``
        deletion vector hid (now un-hidden) are ``insert``s again.
        Files present in both snapshots contribute nothing, so
        restoring over a recent bad commit reads only that commit's
        delta.

        First-committer-wins like :meth:`overwrite`: restore is
        table-wide, so a lost CAS raises for a re-run. A no-op restore
        (``version`` already equals the head) returns the current
        version without committing."""
        parent = self.head_version()
        if version == parent:
            return parent
        if version not in self.versions():
            raise ValueError(
                f"VersionedTable.restore: no version {version} "
                f"(head is v{parent})"
            )
        target_ptr = self._read_pointer(version)
        head_ptr = self._read_pointer(parent)
        v = parent + 1
        cdc_dir = None
        if head_ptr.get("cdf"):
            from urllib.parse import unquote, urlparse

            head_m = self._resolve(head_ptr)
            target_m = self._resolve(target_ptr)
            head_files = set(head_m["files"])
            target_files = set(target_m["files"])
            frames = []
            removed = [f for f in head_m["files"] if f not in target_files]
            if removed:
                frames.append(
                    self._read_files(head_m, removed).select(
                        "*", F.lit("delete").alias("_change_type")
                    )
                )
            added = [f for f in target_m["files"] if f not in head_files]
            if added:
                frames.append(
                    self._read_files(target_m, added).select(
                        "*", F.lit("insert").alias("_change_type")
                    )
                )
            # kept files whose rows a post-`version` vector hid: the
            # restore un-hides them. _delete_mor's find-scan is
            # DV-applied, so a newer vector never names an
            # already-hidden position — every key in new_dvs was
            # visible at `version`.
            target_dvs = set(target_m.get("delete_vectors") or [])
            new_dvs = [
                d
                for d in (head_m.get("delete_vectors") or [])
                if d not in target_dvs
            ]
            kept = [f for f in target_m["files"] if f in head_files]
            if new_dvs and kept:
                dv = self.spark.read.parquet(*new_dvs)
                dv_files = {
                    unquote(urlparse(r[0]).path)
                    for r in dv.select(self._DV_FILE).distinct().collect()
                }
                hit = [f for f in kept if f in dv_files]
                if hit:
                    rows = self._read_files(
                        target_m, hit, apply_dvs=False, with_pos=True
                    )
                    unhidden = rows.join(
                        dv, [self._DV_FILE, self._DV_POS], "inner"
                    ).drop(self._DV_FILE, self._DV_POS)
                    frames.append(
                        unhidden.select(
                            "*", F.lit("insert").alias("_change_type")
                        )
                    )
            if frames:
                cdc = frames[0]
                for fdf in frames[1:]:
                    # BY NAME across schema evolution in the range;
                    # the feed projects to the reader's end schema
                    cdc = cdc.unionByName(fdf, allowMissingColumns=True)
                cdc_dir = self._write_cdc_if_any(cdc, v)
        m = dict(target_ptr)
        # op-specific keys of the TARGET commit would misdescribe this
        # one (and an inherited cdc dir would double-count its changes)
        for stale in ("merge_on", "mode", "predicate", "txn", "cdc"):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "restore",
                "restored_from": version,
                "txn": txn,
                # idempotency keys are live table state, not snapshot
                # content: carry the HEAD's set forward
                "txns": self._txns_after(head_ptr, txn),
            }
        )
        if head_ptr.get("cdf"):
            m["cdf"] = head_ptr["cdf"]
        else:
            m.pop("cdf", None)
        if cdc_dir:
            m["cdc"] = cdc_dir
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: restore raced past stale v{parent}; "
                f"head is now v{self.head_version()} — re-run"
            )
        return v

    def clone(
        self,
        dest_path: str,
        version: int | None = None,
        replace: bool = False,
    ) -> "VersionedTable":
        """SHALLOW CLONE (the Delta ``CLONE`` command): initialize a
        NEW table at ``dest_path`` whose v0 manifest REFERENCES this
        table's snapshot files without copying a byte — a zero-copy
        dev/test branch of a 100 TB table in O(metadata). Segment
        files are copied 1:1 (stats, partition values and specs
        preserved, no data footer re-read), so the clone keeps the
        O(appended files)-per-commit metadata discipline. Schema,
        column mapping, constraints, deletion vectors, bucket/
        partition layout and the change-data-feed flag all carry from
        the snapshot.

        The clone's history starts fresh at v0: its appends, DML and
        OPTIMIZE write under ``dest_path`` and never touch the source
        (a rewrite merely drops shared references; compaction writes
        new files), and source commits after the clone point are
        invisible to it.

        SOURCE-VACUUM SAFETY (r12 — closing the Delta caveat VERDICT
        r11 #4 names): the clone registers a BACK-POINTER at the
        source (``_clones/c-*.json``, best-effort — a source on a
        read-only mount still clones, it just keeps Delta's caveat),
        and the source's :meth:`vacuum` treats every registered
        clone's snapshot as a liveness root: shared data dirs and
        deletion vectors stay until the clone itself is deleted
        (registrations of vanished clones auto-expire). Vacuum on the
        CLONE is safe either way: it only sweeps directories under
        its own ``data/``, and shared source files never live
        there.

        ``replace=True`` is the REPLACE-with-CLONE form (r15, ADVICE
        r14 #3 — SQL ``CREATE OR REPLACE TABLE ... SHALLOW CLONE``
        rides it): when ``dest_path`` already holds an initialized
        table, the clone lands as that table's NEXT version (op
        ``replace_clone``) instead of refusing — a zero-copy full
        redefinition from the source snapshot, with the destination's
        own history preserved for time travel exactly like
        ``overwrite(replace_schema=True)``. On an uninitialized
        destination ``replace=True`` degrades to the plain create-
        clone (Delta's OR REPLACE contract)."""
        src_v = self.head_version() if version is None else version
        if src_v not in self.versions():
            raise ValueError(
                f"VersionedTable.clone: no version {src_v} "
                f"(head is v{self.head_version()})"
            )
        ptr = self._read_pointer(src_v)
        # refuse cloning a snapshot this build cannot faithfully
        # serve before any metadata is written at the destination
        self._check_features(ptr)
        dest = VersionedTable(self.spark, dest_path)
        dest_head = dest.versions()
        if dest_head and not replace:
            raise IOError(
                f"VersionedTable: {dest_path} already initialized"
            )
        replacing = bool(dest_head)
        if replacing and dest_path.rstrip("/") == self.path.rstrip("/"):
            raise ValueError(
                "VersionedTable.clone: replace-clone onto the clone's "
                "own source is a no-op loop — pick a different "
                "destination"
            )
        v_new = dest.head_version() + 1 if replacing else 0
        m = dict(ptr)
        # op-specific keys of the source commit would misdescribe the
        # clone's create (and an inherited cdc dir would replay the
        # source commit's changes as the clone's)
        for stale in (
            "merge_on", "mode", "predicate", "txn", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v_new,
                "parent": dest.head_version() if replacing else None,
                "op": "replace_clone" if replacing else "create",
                "cloned_from": {"path": self.path, "version": src_v},
                "txn": None,
                "txns": [],
            }
        )
        if "segments" in ptr:
            m["segments"] = [
                dest._write_segment_body(dict(self._read_segment(s)))
                for s in ptr["segments"]
            ]
        elif replacing and "segments" in dest._read_pointer(
            dest.head_version()
        ):
            raise ValueError(
                "VersionedTable.clone: replace-clone from a legacy "
                "inline source onto a segmented destination would "
                "demote the destination's metadata format — OPTIMIZE "
                "the source first"
            )
        if not dest._try_commit(m, v_new):
            raise ConcurrentWriteError(
                f"VersionedTable: clone raced another commit at "
                f"{dest_path}"
            )
        # back-registry at the SOURCE (r12): lets vacuum keep the
        # shared snapshot alive. Best-effort by design — the clone is
        # already committed and valid; a source this writer cannot
        # write to (read-only prod mount) just keeps Delta's caveat.
        try:
            reg_dir = self._P(f"{self.path}/_clones")
            if not self._fs.exists(reg_dir):
                self._fs.mkdirs(reg_dir)
            rec = {
                "dest": dest.path,
                "version": src_v,
                "registered_ms": int(
                    self._jvm.java.lang.System.currentTimeMillis()
                ),
            }
            # temp-then-rename (ADVICE r12): a crash mid-write must
            # never leave a torn c-*.json — vacuum hard-stops its
            # data/dv sweep on an unparseable registration, so a torn
            # record would block reclamation until manually removed.
            reg_name = f"c-{uuid.uuid4().hex[:12]}.json"
            tmp_reg = self._P(f"{self.path}/_clones/.tmp-{reg_name}")
            out = self._fs.create(tmp_reg, False)
            try:
                out.write(bytearray(json.dumps(rec).encode("utf-8")))
            finally:
                out.close()
            if not self._fs.rename(
                tmp_reg, self._P(f"{self.path}/_clones/{reg_name}")
            ):  # pragma: no cover - registry is advisory
                self._fs.delete(tmp_reg, False)
        except Exception:  # pragma: no cover - registry is advisory
            pass
        return dest

    def deep_clone(
        self, dest_path: str, version: int | None = None
    ) -> "VersionedTable":
        """DEEP CLONE (Delta's ``CREATE TABLE ... DEEP CLONE`` — r15,
        VERDICT r14 #6): initialize a NEW table at ``dest_path`` from
        an INDEPENDENT byte-for-byte copy of this table's snapshot
        files — no shared references, fresh v0 history. Unlike
        :meth:`clone` (zero-copy, source-vacuum-protected via the
        back-registry), a deep clone owns every byte: the source can
        be VACUUMed, RESTOREd, rewritten, or deleted outright and the
        clone still reads — the isolate-then-experiment workflow a
        shallow clone cannot serve once retention applies.

        SCALE DESIGN: the copy is DISTRIBUTED — the (src, dst) file
        pairs become a DataFrame and an Arrow-batched ``mapInPandas``
        stage copies each pair executor-side through pyarrow's
        filesystem API (byte streams, no decode/re-encode, no driver
        loop), so a 100 TB clone is a linear scan spread over the
        cluster. Per-file manifest metadata (stats, bloom bitmaps,
        partition values and specs) is carried 1:1 with only the
        paths rewritten — no data footer is re-read. Deletion vectors
        are copied with their ``file_path`` keys remapped to the
        copied files, so MoR state survives the move; the relative
        ``data/``-layout is preserved, keeping bucket file names and
        partition leaf dirs intact. Same-filesystem copies are the
        tested path (executor-side pyarrow resolves each URI); a
        cross-filesystem deep clone additionally assumes both schemes
        are reachable from the executors.

        Refuses an already-initialized destination (like clone) and
        snapshots carrying features this build does not support.
        Citation: Delta Lake CLONE documentation (deep clone = full
        data copy + independent retention); reference repo has no
        clone concept (825-LoC Airflow ETL)."""
        src_v = self.head_version() if version is None else version
        if src_v not in self.versions():
            raise ValueError(
                f"VersionedTable.deep_clone: no version {src_v} "
                f"(head is v{self.head_version()})"
            )
        ptr = self._read_pointer(src_v)
        self._check_features(ptr)
        dest = VersionedTable(self.spark, dest_path)
        if dest.versions():
            raise IOError(
                f"VersionedTable: {dest_path} already initialized"
            )
        resolved = self._resolve(ptr)
        src_files = list(resolved.get("files") or [])

        def _rel(p: str) -> str:
            # preserve the data-dir layout (bucket suffixes, partition
            # leaf dirs); files of a shallow-cloned source may live
            # under ANOTHER table's root, so split on /data/, not on
            # self.path
            return p.split("/data/", 1)[1] if "/data/" in p else p.rsplit(
                "/", 1
            )[-1]

        mapping: dict[str, str] = {}
        used: set[str] = set()
        for p in src_files:
            r = _rel(p)
            if f"{dest_path}/data/{r}" in used:  # pragma: no cover
                r = f"dup{len(mapping)}/{r}"
            mapping[p] = f"{dest_path}/data/{r}"
            used.add(mapping[p])
        dv_mapping: dict[str, str] = {}
        for dvd in ptr.get("delete_vectors") or []:
            r = dvd.split("/dv/", 1)[1] if "/dv/" in dvd else dvd.rsplit(
                "/", 1
            )[-1]
            dv_mapping[dvd] = f"{dest_path}/dv/{r}"
        copied = self._copy_files_distributed(list(mapping.items()))
        if copied != len(mapping):  # pragma: no cover - copy gate
            raise IOError(
                f"VersionedTable.deep_clone: copied {copied} of "
                f"{len(mapping)} files"
            )
        # deletion vectors: copy with file_path keys remapped to the
        # copied data files (the (file, row-position) join key must
        # point at the CLONE's files). Bounded by deleted rows.
        if dv_mapping:
            map_rows = [
                (orig, new) for orig, new in mapping.items()
            ]
            map_df = self.spark.createDataFrame(
                map_rows, "__orig string, __new string"
            )
            for dvd, dvd_new in dv_mapping.items():
                dv = self.spark.read.parquet(dvd)
                dv = (
                    dv.withColumn(
                        "__plain",
                        F.regexp_replace(
                            F.col(self._DV_FILE),
                            "^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?",
                            "",
                        ),
                    )
                    .withColumn(
                        "__prefix",
                        F.expr(
                            f"substring({self._DV_FILE}, 1, "
                            f"length({self._DV_FILE}) - length(__plain))"
                        ),
                    )
                    .join(
                        F.broadcast(map_df),
                        F.col("__plain") == F.col("__orig"),
                        "inner",
                    )
                    .select(
                        F.concat(F.col("__prefix"), F.col("__new")).alias(
                            self._DV_FILE
                        ),
                        F.col(self._DV_POS),
                    )
                )
                apply_light_committer(
                    dv.write.mode("error"), self.spark
                ).parquet(dvd_new)
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "txn", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": 0,
                "parent": None,
                "op": "create",
                "cloned_from": {
                    "path": self.path,
                    "version": src_v,
                    "deep": True,
                },
                "txn": None,
                "txns": [],
            }
        )
        if dv_mapping:
            m["delete_vectors"] = [
                dv_mapping[d] for d in ptr["delete_vectors"]
            ]

        def _remap_body(body: dict) -> dict:
            out = dict(body)
            out["files"] = [mapping[f] for f in body.get("files") or []]
            if body.get("stats"):
                out["stats"] = {
                    mapping.get(k, k): v for k, v in body["stats"].items()
                }
            if body.get("parts"):
                out["parts"] = {
                    mapping.get(k, k): v for k, v in body["parts"].items()
                }
            return out

        if "segments" in ptr:
            m["segments"] = [
                dest._write_segment_body(
                    _remap_body(self._read_segment(s))
                )
                for s in ptr["segments"]
            ]
        else:
            m.update(_remap_body(m))
        if not dest._try_commit(m, 0):
            raise ConcurrentWriteError(
                f"VersionedTable: deep_clone raced another create at "
                f"{dest_path}"
            )
        # NO back-registry at the source — independence is the point:
        # source vacuum owes this clone nothing
        return dest

    def _copy_files_distributed(self, pairs: list[tuple[str, str]]) -> int:
        """Copy (src, dst) file pairs executor-side — one Arrow batch
        of paths per task, bytes streamed through pyarrow's
        filesystem API. Returns the number of files copied. The
        driver never touches file contents; parallelism is one task
        per partition over the pair list.

        DRIVER FAST PATH (r15 optimization): below
        ``spark.smetl.copy.driverMaxFiles`` all-local pairs (default
        64) totalling under ``spark.smetl.copy.driverMaxBytes``
        (default 256 MB) the copies run as plain driver file IO —
        the Spark job costs ~0.3-0.5 s of pure scheduling while a
        small local copy is milliseconds. Large or remote clones (the
        100 TB shape) keep the distributed stage."""
        if not pairs:
            return 0
        if all(
            "://" not in s and "://" not in d for s, d in pairs
        ) and len(pairs) <= int(
            self.spark.conf.get("spark.smetl.copy.driverMaxFiles", "64")
        ):
            import shutil

            try:
                total = sum(os.path.getsize(s) for s, _ in pairs)
            except OSError:
                total = None
            if total is not None and total <= int(
                self.spark.conf.get(
                    "spark.smetl.copy.driverMaxBytes",
                    str(256 * 1024 * 1024),
                )
            ):
                for s, d in pairs:
                    os.makedirs(os.path.dirname(d), exist_ok=True)
                    shutil.copyfile(s, d)
                return len(pairs)
        import pandas as pd  # noqa: F401 - executor-side dependency

        def _copy(batches):
            import os as _os

            import pandas as _pd
            import pyarrow.fs as _pafs

            local = _pafs.LocalFileSystem()
            for pdf in batches:
                n = 0
                for s, d in zip(pdf["src"], pdf["dst"]):
                    if "://" in d:  # pragma: no cover - remote FS
                        dfs, dpath = _pafs.FileSystem.from_uri(d)
                    else:
                        dfs, dpath = local, d
                    if "://" in s:  # pragma: no cover - remote FS
                        sfs, spath = _pafs.FileSystem.from_uri(s)
                    else:
                        sfs, spath = local, s
                    dfs.create_dir(
                        _os.path.dirname(dpath), recursive=True
                    )
                    with sfs.open_input_stream(spath) as fin, \
                            dfs.open_output_stream(dpath) as fout:
                        while True:
                            chunk = fin.read(8 << 20)
                            if not chunk:
                                break
                            fout.write(chunk)
                    n += 1
                yield _pd.DataFrame({"copied": [n]})

        n_tasks = min(
            len(pairs), self.spark.sparkContext.defaultParallelism
        )
        pair_df = self.spark.createDataFrame(
            pairs, "src string, dst string"
        ).repartition(n_tasks)
        rows = pair_df.mapInPandas(_copy, "copied long").collect()
        return int(sum(r["copied"] for r in rows))

    def add_column(
        self, name: str, dtype: str, txn: str | None = None
    ) -> int:
        """ADD COLUMN as a METADATA-ONLY commit (r12 — Delta/Iceberg
        ALTER TABLE ADD COLUMNS; completing the evolution family
        add/rename/drop/widen, where 'add' previously only happened
        implicitly through an append carrying the new field): the
        manifest schema gains a NULLABLE field and a fresh field id —
        zero files move, existing files NULL-fill through the
        ``mixed`` read path exactly as after an implicit additive
        append. Refuses an existing name and any name a live footer
        still carries physically (a dropped column's name or a
        pre-rename alias — the same resurrect-guard the append path
        enforces). The new column is immediately assignable by
        UPDATE/MERGE and appendable; stats/bloom configs do not
        change (opt in by creating future tables with the column
        listed). First-committer-wins like every metadata commit."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        schema = self._manifest_schema(ptr)
        if schema is None:
            raise ValueError(
                "VersionedTable.add_column: legacy manifest without "
                "schema_json cannot evolve"
            )
        if name in {f.name for f in schema.fields}:
            raise ValueError(
                f"VersionedTable.add_column: column '{name}' already "
                "exists"
            )
        self._check_reserved_names([name], "add_column")
        forbidden = set(ptr.get("dropped_phys") or [])
        for chain in (ptr.get("aliases") or {}).values():
            forbidden.update(chain)
        if name in forbidden:
            raise ValueError(
                "VersionedTable.add_column: new column "
                f"'{name}' collides with a physical name live in "
                "pre-drop/pre-rename files; a name-mapped read would "
                "surface the OLD bytes. Pick a fresh name."
            )
        try:
            new_field = T.StructType.fromDDL(f"`{name}` {dtype}").fields[0]
        except Exception as exc:
            raise ValueError(
                f"VersionedTable.add_column: cannot parse type "
                f"{dtype!r}: {exc}"
            ) from None
        merged = T.StructType(
            list(schema.fields)
            + [T.StructField(name, new_field.dataType, True)]
        )
        field_ids = dict(
            ptr.get("field_ids")
            or {f.name: i + 1 for i, f in enumerate(schema.fields)}
        )
        field_ids[name] = max(field_ids.values(), default=0) + 1
        n_files = ptr.get("n_files")
        if n_files is None:
            n_files = len(ptr.get("files") or [])
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "add_column",
                "schema": merged.simpleString(),
                "schema_json": merged.json(),
                # existing files lack the column → reads NULL-fill
                # through the mixed projection (unless the table is
                # empty, where the next write lands the full schema)
                "mixed": bool(ptr.get("mixed")) or n_files > 0,
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "field_ids": field_ids,
            }
        )
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: add_column raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    def properties(self) -> dict[str, str]:
        """The table's user-level properties (TBLPROPERTIES) as of the
        head — one pointer read, the map is carried forward by every
        commit (``_carry_mapping``)."""
        return dict(
            self._read_pointer(self.head_version()).get("properties") or {}
        )

    def generated_columns(self) -> dict[str, str]:
        """The table's GENERATED column expressions (column → SQL),
        as of the head. Declared at :meth:`create`; computed when an
        ingest omits the column, validated in-plan when it supplies
        one; UPDATE/MERGE refuse to assign them or their inputs."""
        return dict(
            self._read_pointer(self.head_version()).get("generated") or {}
        )

    def identity_columns(self) -> dict[str, dict]:
        """The table's GENERATED ALWAYS AS IDENTITY specs (column →
        ``{"start", "step", "high"}``) as of the head — ``high`` is
        the watermark the next allocation continues from."""
        return {
            k: dict(v)
            for k, v in (
                self._read_pointer(self.head_version()).get("identity")
                or {}
            ).items()
        }

    def set_properties(
        self, props: dict[str, str], txn: str | None = None
    ) -> int:
        """ALTER TABLE SET TBLPROPERTIES as a METADATA-ONLY commit
        (r13 — the Delta table-properties surface): merge ``props``
        into the table's property map; zero files move, zero rows
        change (op ``set_properties`` joins METADATA_ONLY_OPS, so
        change feeds and the append-chain stream skip it). Properties
        are opaque key→string pairs EXCEPT the engine-consulted ones,
        which are validated here so a typo fails at SET time, not at
        the next DML: ``smetl.dml.mode`` must be ``cow``/``mor`` (the
        SQL DML layer resolves it between the per-call argument and
        the session conf — Delta's strategy-is-a-table-property
        contract). First-committer-wins like every metadata commit."""
        if not props:
            raise ValueError("set_properties: empty property map")
        self._validate_properties(props)
        return self._commit_properties(
            lambda cur: {**cur, **props}, txn
        )

    @staticmethod
    def _validate_properties(props: dict[str, str]) -> None:
        """Shared property validation for :meth:`set_properties` and
        the REPLACE path of :meth:`overwrite`: opaque key→string pairs
        EXCEPT the engine-consulted keys, which fail at declaration
        time, not at the next DML."""
        bad = {
            k: v
            for k, v in props.items()
            if not isinstance(k, str) or not isinstance(v, str)
        }
        if bad:
            raise ValueError(
                f"set_properties: keys and values must be strings: {bad}"
            )
        mode = props.get("smetl.dml.mode")
        if mode is not None and mode not in ("cow", "mor"):
            raise ValueError(
                "set_properties: smetl.dml.mode must be 'cow' or "
                f"'mor', got {mode!r}"
            )
        evo = props.get("smetl.merge.schemaEvolution")
        if evo is not None and evo.lower() not in ("true", "false"):
            raise ValueError(
                "set_properties: smetl.merge.schemaEvolution must be "
                f"'true' or 'false', got {evo!r}"
            )

    def unset_properties(
        self, keys: list[str], txn: str | None = None
    ) -> int:
        """ALTER TABLE UNSET TBLPROPERTIES — removes ``keys`` from the
        property map (absent keys are ignored, Delta's IF EXISTS
        default), metadata-only like :meth:`set_properties`."""
        if not keys:
            raise ValueError("unset_properties: empty key list")
        return self._commit_properties(
            lambda cur: {k: v for k, v in cur.items() if k not in set(keys)},
            txn,
        )

    def _commit_properties(self, fn, txn: str | None) -> int:
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "set_properties",
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "properties": fn(dict(ptr.get("properties") or {})),
            }
        )
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: set/unset_properties raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    def add_constraint(
        self, cname: str, expr: str, txn: str | None = None
    ) -> int:
        """ALTER TABLE ADD CONSTRAINT (r12 — the Delta CHECK
        constraint command; previously constraints existed only at
        ``create``): validates the EXISTING head against the new
        CHECK first — one DV-applied aggregate over the current
        files, the same in-plan predicate every writing commit uses —
        and refuses with per-constraint violation counts if any live
        row fails (Delta refuses identically). On success commits
        METADATA-ONLY: every later data-adding commit enforces the
        constraint before its CAS. Records the ``constraints``
        feature so a writer build that ignores CHECKs refuses rather
        than committing unvalidated rows."""
        if not cname or not expr:
            raise ValueError(
                "VersionedTable.add_constraint: name and expression "
                "required"
            )
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        existing = dict(base.get("constraints") or {})
        if cname in existing:
            raise ValueError(
                f"VersionedTable.add_constraint: constraint '{cname}' "
                f"already exists ({existing[cname]!r}); drop it first"
            )
        # existing rows must already satisfy the CHECK — one bounded
        # aggregate, DV-applied (vector-hidden rows don't count)
        self._check_constraints(
            base["files"], {**base, "constraints": {cname: expr}}
        )
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "add_constraint",
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "constraints": {**existing, cname: expr},
            }
        )
        self._add_feature(m, "constraints")
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: add_constraint raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    def drop_constraint(self, cname: str, txn: str | None = None) -> int:
        """ALTER TABLE DROP CONSTRAINT (r12): metadata-only removal;
        later commits stop enforcing it. Unknown names refuse (a
        typo'd drop that silently no-ops leaves the caller believing
        enforcement ended)."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        existing = dict(ptr.get("constraints") or {})
        if cname not in existing:
            raise ValueError(
                f"VersionedTable.drop_constraint: no constraint "
                f"'{cname}' (have: {sorted(existing)})"
            )
        existing.pop(cname)
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "drop_constraint",
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "constraints": existing,
            }
        )
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: drop_constraint raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    @staticmethod
    def _merge_stats_entry(old, new):
        """Elementwise merge of two ``[lo, hi, bloom, nulls, rows]``
        stats entries — non-None fields of the NEW computation win,
        everything else carries (a bloom backfill onto an existing
        stats column must not erase its bounds)."""
        out = list(old or [])
        while len(out) < len(new):
            out.append(None)
        for i, v in enumerate(new):
            if v is not None:
                out[i] = v
        return out

    def analyze(
        self,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 2048,
        bloom_hashes: int = 3,
        txn: str | None = None,
    ) -> int:
        """Backfill the pruning index for columns that were not
        indexed at ``create`` (r12 — the ANALYZE TABLE / Iceberg
        rewrite-manifests pattern): record per-file footer [min, max]
        + null census for new ``stats_cols`` and/or bloom bitmaps for
        new ``bloom_cols`` across EVERY current file, and extend the
        table's configs so later commits index their own files too.
        This is what makes :meth:`add_column` + pruning composable —
        a column added (or simply not anticipated) at create time
        becomes skippable without rewriting a byte of data.

        COST, stated plainly: one distributed footer pass over all
        current files for range stats, plus one COLUMN read per file
        for bloom bitmaps (the inherent bloom trade) — O(files)
        metadata work, run once, never a row rewrite. The commit
        itself rewrites segment METADATA (all segments, since every
        file gains entries) — O(table metadata), not O(data).

        Files whose footers do not physically carry the column
        (pre-evolution or pre-rename generations) record nothing and
        are always kept — pruning degrades, never drops data. A bloom
        config already on the table fixes bits/k; pass matching
        values (or the defaults) — conflicting geometry is refused
        because per-file bitmaps must share one hash layout. Columns
        already indexed are skipped; an analyze that adds nothing
        returns the current version (no empty commits). Losing a CAS
        race raises (re-run; the footer pass is the expensive part
        and it stays valid only against the snapshot it read)."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        schema = self._manifest_schema(base)
        known = (
            {f.name for f in schema.fields} if schema is not None else None
        )
        want_stats = list(stats_cols or [])
        want_bloom = list(bloom_cols or [])
        if known is not None:
            unknown = (set(want_stats) | set(want_bloom)) - known
            if unknown:
                raise ValueError(
                    f"VersionedTable.analyze: column(s) {sorted(unknown)} "
                    f"not in the table schema {sorted(known)}"
                )
        cur_stats = list(base.get("stats_cols") or [])
        cur_bloom_cfg = base.get("bloom")
        cur_bloom = list((cur_bloom_cfg or {}).get("cols") or [])
        if cur_bloom_cfg:
            if (
                bloom_bits != int(cur_bloom_cfg["bits"])
                and bloom_bits != 2048
            ) or (
                bloom_hashes != int(cur_bloom_cfg["k"])
                and bloom_hashes != 3
            ):
                raise ValueError(
                    "VersionedTable.analyze: the table's bloom config "
                    f"is bits={cur_bloom_cfg['bits']}/k="
                    f"{cur_bloom_cfg['k']}; per-file bitmaps must share "
                    "one hash geometry — pass matching values"
                )
            bloom_bits = int(cur_bloom_cfg["bits"])
            bloom_hashes = int(cur_bloom_cfg["k"])
        elif want_bloom and (bloom_bits < 64 or bloom_hashes < 1):
            raise ValueError(
                "VersionedTable.analyze: bloom_bits must be >= 64 and "
                "bloom_hashes >= 1"
            )
        added_stats = [c for c in want_stats if c not in cur_stats]
        added_bloom = [c for c in want_bloom if c not in cur_bloom]
        if not added_stats and not added_bloom:
            return parent
        aliases = base.get("aliases") or {}
        new_entries = (
            self._collect_stats(
                base["files"],
                added_stats,
                {
                    "cols": added_bloom,
                    "bits": bloom_bits,
                    "k": bloom_hashes,
                }
                if added_bloom
                else None,
                # alias-free columns absent from a footer are
                # logically all-NULL there (added after the file was
                # written) — record the census / empty bitmap so the
                # pruning actually skips; renamed columns keep their
                # data under old physical names and stay conservative
                absent_as_null=[
                    c
                    for c in set(added_stats) | set(added_bloom)
                    if not aliases.get(c)
                ],
            )
            if base["files"]
            else {}
        )
        new_stats_cols = cur_stats + added_stats
        new_bloom_cfg = (
            {
                "cols": cur_bloom + added_bloom,
                "bits": bloom_bits,
                "k": bloom_hashes,
            }
            if (cur_bloom or added_bloom)
            else None
        )
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "analyze",
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "stats_cols": new_stats_cols,
                "bloom": new_bloom_cfg,
            }
        )
        if "segments" in ptr:
            segs = []
            for name in ptr["segments"]:
                seg = self._read_segment(name)
                touched = [f for f in seg["files"] if f in new_entries]
                if not touched:
                    segs.append(name)  # nothing new recorded: carry
                    continue
                merged = dict(seg.get("stats") or {})
                for f in touched:
                    ent = dict(merged.get(f) or {})
                    for c, e in new_entries[f].items():
                        ent[c] = self._merge_stats_entry(ent.get(c), e)
                    merged[f] = ent
                segs.append(
                    self._write_segment(
                        seg["files"],
                        merged,
                        seg.get("parts") or {},
                        seg.get("spec"),
                    )
                )
            m["segments"] = segs
        else:
            merged_all = {
                f: dict(e) for f, e in (base.get("stats") or {}).items()
            }
            for f, cols in new_entries.items():
                ent = dict(merged_all.get(f) or {})
                for c, e in cols.items():
                    ent[c] = self._merge_stats_entry(ent.get(c), e)
                merged_all[f] = ent
            m["stats"] = merged_all
        if new_bloom_cfg:
            self._add_feature(m, "bloom")
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: analyze raced past stale v{parent}; "
                f"head is now v{self.head_version()} — re-run"
            )
        return v

    def rename_column(self, old: str, new: str, txn: str | None = None) -> int:
        """Column RENAME as a METADATA-ONLY commit (VERDICT r9 #4 —
        schema evolution v2, the Delta/Iceberg column-mapping pattern):
        zero data files move. The manifest's name→field-id map keeps
        the field's ID under its new name, and an ALIAS CHAIN records
        every physical name the column ever had; reads coalesce the
        current name with any alias present in the opened footers
        (:meth:`_read_files`), stats pruning falls through the chain
        (:meth:`_file_overlaps`), and a renamed PARTITION column keeps
        pruning because partition tuples are positional. Time travel
        to a pre-rename version resolves that version's own manifest —
        byte-identical, old name and all.

        Refusals (each would corrupt semantics silently otherwise):
        renaming to an existing column, to any LIVE physical name (an
        old file could then feed two logical columns), or renaming a
        column referenced by a CHECK constraint (the stored SQL text
        would break at the next data-adding commit — drop and re-add
        the constraint around the rename). DROP is :meth:`drop_column`
        (r11); an APPEND that silently omits a column still refuses
        (:meth:`_check_schema`)."""
        import re as _re

        parent = self.head_version()
        ptr = self._read_pointer(parent)
        schema = self._manifest_schema(ptr)
        if schema is None:
            raise ValueError(
                "VersionedTable.rename_column: legacy manifest without "
                "schema_json cannot track column mapping"
            )
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(
                f"VersionedTable.rename_column: no column {old!r} in "
                f"{names}"
            )
        aliases = {k: list(v) for k, v in (ptr.get("aliases") or {}).items()}
        live_phys = (
            set(names)
            | {a for v in aliases.values() for a in v}
            | set(ptr.get("dropped_phys") or [])
        )
        if new in live_phys:
            raise ValueError(
                f"VersionedTable.rename_column: {new!r} collides with a "
                "current column or a live physical name of one — a "
                "pre-rename file could feed two logical columns"
            )
        self._check_reserved_names([new], "rename_column")
        for cname, expr in (ptr.get("constraints") or {}).items():
            if _re.search(rf"\b{_re.escape(old)}\b", expr):
                raise ValueError(
                    "VersionedTable.rename_column: CHECK constraint "
                    f"{cname!r} references {old!r}; drop and re-add the "
                    "constraint around the rename"
                )
        # generated columns (ADVICE r13 #3): renaming a column a
        # generation expression READS would break the stored SQL text
        # at the next data-adding commit (refuse, mirroring the CHECK
        # refusal above); renaming the generated column ITSELF just
        # moves the map key — the expression only reads regular
        # columns (circularity is refused at create/add time)
        gen = dict(ptr.get("generated") or {})
        for g, gexpr in gen.items():
            if g != old and old in self._expr_identifiers(gexpr):
                raise ValueError(
                    "VersionedTable.rename_column: generated column "
                    f"{g!r} (= {gexpr}) references {old!r}; drop the "
                    "generated column first, or rename around it"
                )
        if old in gen:
            gen[new] = gen.pop(old)
        ids = {k: dict(v) for k, v in (ptr.get("identity") or {}).items()}
        if old in ids:
            # the sequence follows the column: spec and watermark move
            # with the new name
            ids[new] = ids.pop(old)
        merged = T.StructType(
            [
                T.StructField(
                    new if f.name == old else f.name, f.dataType, f.nullable
                )
                for f in schema.fields
            ]
        )
        aliases[new] = aliases.pop(old, []) + [old]
        field_ids = dict(
            ptr.get("field_ids") or {n: i + 1 for i, n in enumerate(names)}
        )
        field_ids[new] = field_ids.pop(old)
        pb = ptr.get("partition_by")
        if isinstance(pb, str):
            pb = new if pb == old else pb
        elif pb:
            pb = [new if c == old else c for c in pb]
        n_files = ptr.get("n_files")
        if n_files is None:
            n_files = len(ptr.get("files") or [])
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "rename",
                "schema": merged.simpleString(),
                "schema_json": merged.json(),
                # pre-rename files now carry a different physical name
                # for the field → reads must footer-merge (unless the
                # table is empty)
                "mixed": bool(ptr.get("mixed")) or n_files > 0,
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "stats_cols": [
                    new if c == old else c
                    for c in (ptr.get("stats_cols") or [])
                ],
                "partition_by": pb,
                "aliases": aliases,
                "field_ids": field_ids,
                "generated": gen,
            }
        )
        if ptr.get("identity"):
            m["identity"] = ids
        bk = m.get("bucket_by")
        if bk and bk.get("col") == old:
            # bucket hashing is value-based — the spec just tracks the
            # column's new name
            m["bucket_by"] = {**bk, "col": new}
        # readers must walk the alias chain or miss the column in
        # pre-rename footers — gate them (protocol feature, r12)
        self._add_feature(m, "column_mapping")
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: rename_column raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    def drop_column(self, name: str, txn: str | None = None) -> int:
        """Column DROP as a METADATA-ONLY commit (VERDICT r10 #7 —
        schema evolution v3, completing the add/rename/drop triad on
        the r10 column-mapping layer): zero data files move. The new
        manifest's schema simply omits the field; old files still
        physically carry the column, and because a drop marks the
        manifest ``mixed``, every read projects exactly the manifest
        schema, so the dropped bytes are never surfaced (and column
        pruning means they are never even decoded). Time travel to a
        pre-drop version resolves that version's own manifest —
        byte-identical, dropped column and all.

        The dropped column's physical name — and every alias it ever
        had — joins a TOMBSTONE set (``dropped_phys``, carried by
        every later commit): re-ADDING a column under a tombstoned
        name is refused, because live pre-drop footers still carry
        that physical name and a name-mapped read would resurrect the
        old bytes into the new logical column (Delta solves this with
        id-based physical names; this engine's name-mapped files make
        the refusal the honest contract — pick a fresh name, or
        OPTIMIZE-rewrite and re-create to reclaim one).

        Refusals (each would corrupt semantics silently otherwise):
        the last remaining column, a partition or bucket column (the
        layout and its pruning are keyed on the values), a column a
        CHECK constraint references (drop the constraint first), and
        legacy manifests without ``schema_json``."""
        import re as _re

        parent = self.head_version()
        ptr = self._read_pointer(parent)
        schema = self._manifest_schema(ptr)
        if schema is None:
            raise ValueError(
                "VersionedTable.drop_column: legacy manifest without "
                "schema_json cannot track column mapping"
            )
        names = [f.name for f in schema.fields]
        if name not in names:
            raise ValueError(
                f"VersionedTable.drop_column: no column {name!r} in "
                f"{names}"
            )
        if len(names) == 1:
            raise ValueError(
                "VersionedTable.drop_column: cannot drop the last "
                "column — a table needs at least one"
            )
        pb = ptr.get("partition_by")
        pb_cols = self._pb_cols(pb)
        if name in pb_cols:
            raise ValueError(
                f"VersionedTable.drop_column: {name!r} is a partition "
                "column — set_partition_spec away from it first"
            )
        bk = ptr.get("bucket_by")
        if bk and bk.get("col") == name:
            raise ValueError(
                f"VersionedTable.drop_column: {name!r} is the bucket "
                "column — the layout is keyed on its values"
            )
        for cname, expr in (ptr.get("constraints") or {}).items():
            if _re.search(rf"\b{_re.escape(name)}\b", expr):
                raise ValueError(
                    "VersionedTable.drop_column: CHECK constraint "
                    f"{cname!r} references {name!r}; drop the "
                    "constraint first"
                )
        # generated columns (ADVICE r13 #3): dropping a column a
        # generation expression READS would make every later ingest
        # fail at _apply_generated (F.expr over a missing name) —
        # refuse, pointing at the generated column; dropping the
        # generated column ITSELF removes its map entry so later
        # ingests stop computing it (carrying the stale entry forward
        # would resurrect the dropped column on the next append)
        gen = dict(ptr.get("generated") or {})
        for g, gexpr in gen.items():
            if g != name and name in self._expr_identifiers(gexpr):
                raise ValueError(
                    "VersionedTable.drop_column: generated column "
                    f"{g!r} (= {gexpr}) references {name!r}; drop the "
                    "generated column first"
                )
        gen.pop(name, None)
        drop_ids = {
            k: dict(v) for k, v in (ptr.get("identity") or {}).items()
        }
        drop_ids.pop(name, None)
        merged = T.StructType([f for f in schema.fields if f.name != name])
        aliases = {k: list(v) for k, v in (ptr.get("aliases") or {}).items()}
        tombstones = {name} | set(aliases.pop(name, []))
        dropped = sorted(set(ptr.get("dropped_phys") or []) | tombstones)
        field_ids = dict(
            ptr.get("field_ids") or {n: i + 1 for i, n in enumerate(names)}
        )
        field_ids.pop(name, None)
        n_files = ptr.get("n_files")
        if n_files is None:
            n_files = len(ptr.get("files") or [])
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "drop",
                "schema": merged.simpleString(),
                "schema_json": merged.json(),
                # existing files carry MORE columns than the manifest
                # declares → reads must project the manifest schema
                "mixed": bool(ptr.get("mixed")) or n_files > 0,
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
                "stats_cols": [
                    c for c in (ptr.get("stats_cols") or []) if c != name
                ],
                "aliases": aliases,
                "field_ids": field_ids,
                "dropped_phys": dropped,
                "generated": gen,
            }
        )
        if ptr.get("identity"):
            # dropping the identity column retires its sequence
            if drop_ids:
                m["identity"] = drop_ids
            else:
                m.pop("identity", None)
        # readers must honor dropped_phys or resurrect the column from
        # old footers — gate them (protocol feature, r12)
        self._add_feature(m, "column_mapping")
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: drop_column raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    # lossless primitive widenings (Iceberg/Delta type-widening set,
    # plus int→double which is exact for 32-bit integers); Spark 4's
    # parquet readers promote these at scan time under a requested
    # schema, so old files never rewrite
    _WIDENINGS = {
        "tinyint": {"smallint", "int", "bigint", "double"},
        "smallint": {"int", "bigint", "double"},
        "int": {"bigint", "double"},
        "float": {"double"},
    }

    def widen_column(
        self, name: str, new_type: str, txn: str | None = None
    ) -> int:
        """Type WIDENING as a METADATA-ONLY commit (r11 — schema
        evolution v4, the Delta type-widening feature): the manifest's
        field type changes to a strictly wider primitive (int→long,
        float→double, int→double, …) and ZERO data files move — reads
        request the manifest's schema, and Spark 4's parquet
        promotion up-casts pre-widen physical layouts at scan time.
        The id column that outgrew INT on a 100 TB table widens in
        O(manifest) instead of a table rewrite. Appends after the
        widen write the new type; time travel reads each version
        under its own manifest; stats bounds are domain-floats and
        bloom bitmaps normalize integral values to integer text, so
        data skipping carries across the widen unchanged.

        Refusals: narrowing or lateral changes (only
        :attr:`_WIDENINGS` pairs), unknown columns, the bucket column
        (bucket-hash values are type-sensitive), and legacy manifests
        without ``schema_json``."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        schema = self._manifest_schema(ptr)
        if schema is None:
            raise ValueError(
                "VersionedTable.widen_column: legacy manifest without "
                "schema_json cannot evolve types"
            )
        names = [f.name for f in schema.fields]
        if name not in names:
            raise ValueError(
                f"VersionedTable.widen_column: no column {name!r} in "
                f"{names}"
            )
        bk = ptr.get("bucket_by")
        if bk and bk.get("col") == name:
            raise ValueError(
                f"VersionedTable.widen_column: {name!r} is the bucket "
                "column — bucket hashes are type-sensitive"
            )
        old_f = next(f for f in schema.fields if f.name == name)
        old_t = old_f.dataType.simpleString()
        want = new_type.strip().lower()
        want = {"long": "bigint", "short": "smallint", "byte": "tinyint"}.get(
            want, want
        )
        if want == old_t:
            return parent  # already that type: no empty commits
        if want not in self._WIDENINGS.get(old_t, set()):
            raise ValueError(
                f"VersionedTable.widen_column: {old_t} → {want} is not "
                "a lossless widening; allowed: "
                f"{sorted(self._WIDENINGS.get(old_t, set()))}"
            )
        new_dt = T._parse_datatype_string(want)
        merged = T.StructType(
            [
                T.StructField(name, new_dt, f.nullable)
                if f.name == name
                else f
                for f in schema.fields
            ]
        )
        n_files = ptr.get("n_files")
        if n_files is None:
            n_files = len(ptr.get("files") or [])
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "widen",
                "schema": merged.simpleString(),
                "schema_json": merged.json(),
                # existing files carry the NARROW physical type →
                # reads must request the manifest schema
                "mixed": bool(ptr.get("mixed")) or n_files > 0,
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
            }
        )
        # readers must request the manifest type over narrower footers
        # or fail/misread the promotion — gate them (r12)
        self._add_feature(m, "widen")
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: widen_column raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    def register_bucketed(
        self, name: str, version: int | None = None, mode: str = "link"
    ) -> DataFrame:
        """Expose a snapshot of a bucket-spec'd table as a session-
        catalog BUCKETED table (VERDICT r9 #5 — marrying
        test_bucketing.py's zero-exchange layout to the versioned
        layer): every data file was written bucket-hashed
        (:meth:`_write_data`), and the bucket hash is stable across
        commits, so ANY snapshot's file set is a valid bucketed table.
        Catalog tables point at one DIRECTORY, while a snapshot is a
        FILE LIST spanning commit directories — so this materializes a
        VIEW DIR of hard links (O(files) metadata ops, zero data
        copied; falls back to copies on filesystems without links) and
        registers it with the bucket spec via DDL. Joins between two
        registered tables co-keyed on their bucket column then plan
        ZERO exchanges on either side, surviving appends (new commits
        add files to the same bucket universe).

        ``mode`` picks the materialization (VERDICT r10 missing #3):

        - ``'link'`` (default) — the VIEW-DIR path above: O(files)
          metadata, ZERO data copied. Local-filesystem only (hard
          links do not span schemes), and refuses snapshots whose
          rows are not purely physical — live deletion vectors or a
          ``mixed`` file layout (evolution/rename) — OPTIMIZE first.
        - ``'ctas'`` — a catalog-managed BUCKETED table written by
          ``df.write.bucketBy(n, col).sortBy(col).saveAsTable``: one
          DISTRIBUTED write of the snapshot, so it works from ANY
          source filesystem (the remote-table answer: rows flow
          through executors, the metastore owns the result) and from
          ANY snapshot — deletion vectors, mixed layouts, and renames
          read LOGICALLY before the write. Costs O(data) once; the
          zero-exchange join property of the result is identical
          (Spark computes the bucket hash itself at write time)."""
        import os
        import shutil
        from urllib.parse import urlparse

        if mode not in ("link", "ctas"):
            raise ValueError(
                f"VersionedTable.register_bucketed: unknown mode {mode!r}"
                " — expected 'link' (hard-linked view dir, local FS,"
                " zero copy) or 'ctas' (distributed rewrite into a"
                " catalog-managed bucketed table, any FS)"
            )
        if mode == "ctas":
            v = self.head_version() if version is None else version
            m = self._read_manifest(v)
            spec = m.get("bucket_by")
            if not spec:
                raise ValueError(
                    "VersionedTable.register_bucketed: table has no "
                    "bucket spec — create(..., bucket_by=(col, n)) first"
                )
            # logical rows: DV-applied, alias-resolved, manifest-
            # projected — so ctas accepts every snapshot link refuses
            df = self._read_files(m, m["files"])
            self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
            (
                df.repartition(int(spec["n"]), spec["col"])
                .write.bucketBy(int(spec["n"]), spec["col"])
                .sortBy(spec["col"])
                .format("parquet")
                .saveAsTable(name)
            )
            return self.spark.table(name)
        if "://" in self.path and not self.path.startswith("file://"):
            raise ValueError(
                "VersionedTable.register_bucketed: view-dir hard links "
                "need a local filesystem; use mode='ctas' (distributed "
                "rewrite into a catalog-managed bucketed table) for "
                "remote tables"
            )
        v = self.head_version() if version is None else version
        m = self._read_manifest(v)
        spec = m.get("bucket_by")
        if not spec:
            raise ValueError(
                "VersionedTable.register_bucketed: table has no bucket "
                "spec — create(..., bucket_by=(col, n)) first"
            )
        if m.get("delete_vectors"):
            raise ValueError(
                "VersionedTable.register_bucketed: snapshot carries "
                "deletion vectors — OPTIMIZE (compacts them away) "
                "before registering"
            )
        if m.get("mixed"):
            raise ValueError(
                "VersionedTable.register_bucketed: snapshot spans "
                "physical schemas (evolution/rename) — OPTIMIZE or "
                "rewrite to a uniform layout before registering"
            )
        local_root = (
            urlparse(self.path).path
            if self.path.startswith("file://")
            else self.path
        )
        vdir = (
            f"{local_root}/_bucketed_views/v{v:08d}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(vdir)
        seen = set()
        for f in m["files"]:
            base = os.path.basename(f)
            if base in seen:  # pragma: no cover - job UUIDs make names unique
                raise IOError(
                    f"VersionedTable.register_bucketed: duplicate file "
                    f"name {base!r} across commits"
                )
            seen.add(base)
            try:
                os.link(f, os.path.join(vdir, base))
            except OSError:  # pragma: no cover - cross-device fallback
                shutil.copy2(f, os.path.join(vdir, base))
        schema = self._manifest_schema(m)
        if schema is None:
            raise ValueError(
                "VersionedTable.register_bucketed: legacy manifest "
                "without schema_json"
            )
        cols_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        self.spark.sql(
            f"CREATE TABLE `{name}` ({cols_ddl}) USING parquet "
            f"CLUSTERED BY (`{spec['col']}`) SORTED BY (`{spec['col']}`) "
            f"INTO {spec['n']} BUCKETS LOCATION '{vdir}'"
        )
        # marker so vacuum can DROP the catalog entry before sweeping
        # this dir — otherwise the registered table silently reads
        # empty after its backing links vanish (ADVICE r10). An
        # underscore-prefixed file is invisible to Spark's FileIndex.
        with open(os.path.join(vdir, "_registered_as"), "w") as fh:
            fh.write(name)
        return self.spark.table(name)

    def set_partition_spec(
        self, partition_by: str | list | None, txn: str | None = None
    ) -> int:
        """Change the table's PARTITION SPEC as a METADATA-ONLY commit
        (r10 — Iceberg partition-spec evolution): zero files move.
        Existing files keep pruning under the spec they were written
        with (each segment records its spec; :meth:`_resolve` builds a
        per-file map, :meth:`_file_overlaps` reads it); commits from
        here lay out under the NEW spec — the unpartitioned→(date) and
        (date)→(date, region) growth paths every long-lived table
        walks, without a rewrite. ``None`` drops partitioning for new
        commits (old files keep their recorded values). OPTIMIZE after
        an evolution consolidates everything into the current spec.

        Refusals: unknown columns, legacy inline tables (their parts
        have no per-segment spec record), bucket-spec'd tables
        (bucket/partition layouts don't compose), and tables whose
        pre-feature segments lack a spec record while partitioned —
        each would make old values misread under the new spec."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        if "segments" not in ptr:
            raise ValueError(
                "VersionedTable.set_partition_spec: legacy inline "
                "tables carry no per-segment spec — only segmented "
                "tables support spec evolution"
            )
        if ptr.get("bucket_by"):
            raise ValueError(
                "VersionedTable.set_partition_spec: bucket_by does not "
                "compose with partition_by"
            )
        new_spec = self._pb_cols(partition_by)
        schema = self._manifest_schema(ptr)
        if schema is not None and new_spec:
            names = {f.name for f in schema.fields}
            missing = [c for c in new_spec if c not in names]
            if missing:
                raise ValueError(
                    "VersionedTable.set_partition_spec: unknown "
                    f"partition column(s) {missing}"
                )
        old_spec = self._pb_cols(ptr.get("partition_by"))
        if old_spec:
            for name in ptr["segments"]:
                seg = self._read_segment(name)
                # only segments CARRYING partition values can misread
                # under a different spec; a spec-less segment written
                # unpartitioned (a pre-evolution generation) has no
                # values to reinterpret — it is merely unprunable
                if seg.get("parts") and not seg.get("spec"):
                    raise ValueError(
                        "VersionedTable.set_partition_spec: segment "
                        f"{name} predates spec records — its values "
                        "would misread under a new spec; OPTIMIZE "
                        "first to rewrite under a recorded spec"
                    )
        v = parent + 1
        m = dict(ptr)
        for stale in (
            "merge_on", "mode", "predicate", "cdc", "restored_from",
        ):
            m.pop(stale, None)
        m.update(
            {
                "version": v,
                "parent": parent,
                "op": "set_partition_spec",
                "partition_by": partition_by,
                "txn": txn,
                "txns": self._txns_after(ptr, txn),
            }
        )
        if not self._try_commit(m, v):
            raise ConcurrentWriteError(
                f"VersionedTable: set_partition_spec raced past stale "
                f"v{parent}; head is now v{self.head_version()} — re-run"
            )
        return v

    def _touched_files(
        self,
        base: dict,
        predicate: str,
        prune: list[tuple] | None,
        verify_prune: bool = False,
    ) -> list[str]:
        """The find-files-to-rewrite scan shared by :meth:`delete` and
        :meth:`update`: distinct source files of predicate-matching
        rows (bounded collect, ≤ one row per data file). ``prune`` is
        an optional list of ``(col, lo, hi)`` range conjuncts that the
        predicate IMPLIES (the Delta partition-predicate contract):
        manifest stats/partition metadata then narrow the scan to the
        overlapping files BEFORE any footer is opened, so a point
        delete on a clustered 100 TB table plans a scan of a handful
        of files, not a full-table find-scan. THE CALLER OWNS THE
        IMPLICATION — bounds the predicate does not imply silently
        hide matching rows from the rewrite (they survive unchanged).
        ``verify_prune=True`` buys the proof back: it scans the
        pruned-OUT files for predicate matches and raises on the first
        hit — full-scan cost, so it is a debugging/audit knob, not the
        production path (ADVICE r8: the contract is now explicit and
        checkable at call sites)."""
        from urllib.parse import unquote, urlparse

        candidates = (
            self._kept_files_all(base, prune) if prune else base["files"]
        )
        if prune and verify_prune:
            cand = set(candidates)
            pruned_out = [f for f in base["files"] if f not in cand]
            if pruned_out:
                stray = (
                    self._read_files(base, pruned_out)
                    .filter(F.expr(predicate))
                    .limit(1)
                    .count()
                )
                if stray:
                    raise ValueError(
                        "VersionedTable: prune hint does not cover the "
                        f"predicate — rows matching {predicate!r} exist "
                        "in files the hint pruned out; fix the bounds "
                        "(they must be IMPLIED by the predicate)"
                    )
        if not candidates:
            return []
        # apply_dvs=False: input_file_name() is only defined over a
        # pure scan (a DV anti-join would blank it). Rows a deletion
        # vector already hides can only ADD a file to the rewrite set
        # (over-approximation); the rewrite itself reads DV-applied,
        # so they stay deleted.
        matched = (
            self._read_files(base, candidates, apply_dvs=False)
            .filter(F.expr(predicate))
            .select(F.input_file_name().alias("__f"))
            .distinct()
            .collect()
        )
        touched = {unquote(urlparse(r["__f"]).path) for r in matched}
        return [f for f in base["files"] if f in touched]

    def delete(
        self,
        predicate: str,
        txn: str | None = None,
        prune: list[tuple] | None = None,
        verify_prune: bool = False,
        mode: str = "cow",
    ) -> int:
        """Row-level DELETE as COPY-ON-WRITE (the Delta DELETE pattern,
        VERDICT r7 #3): remove every row where ``predicate`` (a SQL
        boolean expression over the table's columns) is TRUE — rows
        where it is FALSE or NULL are kept, standard DML semantics.

        ``mode='mor'`` switches to MERGE-ON-READ (Delta deletion
        vectors, VERDICT r8 #5): instead of rewriting files, the
        commit stores the matching rows' (file, row-position) keys as
        a parquet DELETION VECTOR and every read anti-joins them out
        (see :meth:`_read_files`). ZERO data files are rewritten — a
        point delete on a high-churn wide table costs O(matched rows)
        of DV IO, not a rewrite of every touched file; OPTIMIZE
        compacts vectors away. Time travel and the read_changes/CDC
        rewrite-refusal semantics are identical in both modes (the
        commit is op ``delete`` either way).

        Only the files that actually CONTAIN matching rows are
        rewritten: a filter-pushed scan collects the distinct
        ``input_file_name()`` of matching rows (at 100 TB the scan is
        pruned by parquet footer stats under the pushed predicate and
        the match set is O(files) metadata), untouched files are
        carried into the new manifest byte-identical, and the touched
        files are re-written WITHOUT their matching rows. The commit
        is op ``delete``. CONCURRENCY (r11, the Delta conflict rules
        at file granularity): a lost CAS race against appends OR
        DISJOINT rewrites rebases — the winners must not have touched
        any file this delete rewrote, and the files they ADDED are
        scanned (bounded by their size) to prove no row matches the
        predicate; then the already-written rewrite commits onto the
        new head. A winner that rewrote a shared file, vectored one of
        this delete's files, added a MATCH, or is table-wide
        (overwrite/upsert) or metadata-changing (rename/drop/spec)
        raises for a re-run (the rewrite is then semantically stale). :meth:`read_changes`
        refuses ranges that cross a delete (rewrites have no
        added-rows semantics). Time
        travel to pre-delete versions still reads the old file list.
        Returns the new version, or the CURRENT version unchanged if
        no row matched (no empty commits). ``prune``: optional
        predicate-implied range conjuncts that let manifest metadata
        narrow the find-scan itself (see :meth:`_touched_files`)."""
        if mode not in ("cow", "mor"):
            raise ValueError(
                f"VersionedTable.delete: unknown mode {mode!r} — "
                "expected 'cow' (copy-on-write rewrite) or 'mor' "
                "(merge-on-read deletion vector)"
            )
        if mode == "mor":
            return self._delete_mor(predicate, txn, prune, verify_prune)
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        touched_files = self._touched_files(
            base, predicate, prune, verify_prune
        )
        touched = set(touched_files)
        if not touched_files:
            return parent
        kept_files = [f for f in base["files"] if f not in touched]
        keep_rows = ~F.coalesce(F.expr(predicate), F.lit(False))
        remaining = self._read_files(base, touched_files).filter(keep_rows)
        cdc_dir = None
        if base.get("cdf"):
            # change-data-feed table: record the removed rows as CDC
            # files so read_change_feed covers this COW commit (the
            # Delta enableChangeDataFeed contract)
            removed = (
                self._read_files(base, touched_files)
                .filter(F.coalesce(F.expr(predicate), F.lit(False)))
                .select("*", F.lit("delete").alias("_change_type"))
            )
            # _touched_files over-approximates (its find-scan skips
            # DVs) while this preimage read is DV-applied — if every
            # predicate match was already vector-hidden, the frame is
            # empty and an empty parquet dir is unreadable; skip
            # recording like merge does and the feed treats the
            # commit as change-free (ADVICE r10). Write-first (r16):
            # the old limit(1) probe executed the preimage scan once
            # and the write executed it again.
            cdc_dir = self._write_cdc_if_any(removed, parent + 1)
        partition_by = base.get("partition_by")
        # bounded action over the touched files only: an all-rows-
        # deleted rewrite must commit an empty file set. Write-first
        # (r16, drop_if_empty): the old limit(1) probe executed the
        # rewrite plan once and the write executed it again.
        new_files = self._write_data(
            remaining,
            parent + 1,
            partition_by,
            base.get("bucket_by"),
            drop_if_empty=True,
        )
        stats_cols = base.get("stats_cols") or []
        new_stats = (
            self._collect_stats(new_files, stats_cols, base.get("bloom"))
            if "segments" not in ptr
            and (stats_cols or base.get("bloom"))
            and new_files
            else {}
        )
        new_parts = (
            self._partition_values(new_files, partition_by)
            if "segments" not in ptr and partition_by
            else {}
        )
        new_segs = None
        for _ in range(10):
            v = parent + 1
            m = {
                "version": v,
                "parent": parent,
                "op": "delete",
                "predicate": predicate,
                # on a rebase the winner may have evolved the schema
                # additively — the commit keeps the HEAD's logical
                # schema; the rewritten files are then one more
                # physical generation under it
                "schema": base["schema"],
                "schema_json": base.get("schema_json"),
                # kept files may still span pre-evolution physical
                # schemas
                "mixed": bool(base.get("mixed")),
                "txn": txn,
                "txns": self._txns_after(base, txn),
                # from the REBASED head, not the pre-race capture: an
                # analyze winner may have extended the index config
                "stats_cols": base.get("stats_cols") or [],
                "bloom": base.get("bloom"),
                "partition_by": partition_by,
                # a delete keeps a subset of already-valid rows — no
                # check
                "constraints": base.get("constraints") or {},
            }
            m = self._carry_mapping(m, base)
            if cdc_dir:
                m["cdc"] = cdc_dir
            if base.get("delete_vectors"):
                # rewritten files dropped their DV'd rows physically;
                # kept files still need the vectors applied at read
                # time
                m["delete_vectors"] = base["delete_vectors"]
            if "segments" in ptr:
                segs = self._segments_without(ptr, touched)
                if new_files:
                    if new_segs is None:
                        new_segs = self._build_segments(
                            new_files,
                            stats_cols,
                            partition_by,
                            base.get("bloom"),
                        )
                    segs.extend(new_segs)
                m["segments"] = segs
                m["n_files"] = len(kept_files) + len(new_files)
            else:
                kept_set = set(kept_files)
                m["files"] = sorted(kept_files + new_files)
                m["stats"] = {
                    **{
                        f: s
                        for f, s in (base.get("stats") or {}).items()
                        if f in kept_set
                    },
                    **new_stats,
                }
                m["parts"] = {
                    **{
                        f: p
                        for f, p in (base.get("parts") or {}).items()
                        if f in kept_set
                    },
                    **new_parts,
                }
            if self._try_commit(m, v):
                return v
            # CAS lost. Delta's file-granularity conflict rules (r11):
            # a DELETE commutes with appends AND with disjoint
            # rewrites — any winner that neither touched this delete's
            # files nor added rows the predicate covers. Verify, then
            # rebase the already-written rewrite onto the new head;
            # anything else still raises.
            parent, ptr, base = self._rebase_over_disjoint(
                parent,
                ptr,
                base,
                "delete",
                touched,
                self._stale_if_predicate_match(predicate),
            )
            kept_files = [f for f in base["files"] if f not in touched]
        raise ConcurrentWriteError(
            "VersionedTable: delete lost 10 CAS races"
        )

    def overwrite_where(
        self,
        df: DataFrame,
        predicate: str,
        txn: str | None = None,
        prune: list[tuple] | None = None,
        verify_prune: bool = False,
    ) -> int:
        """Predicate-scoped transactional overwrite — Delta's
        ``replaceWhere`` (r15): atomically replace EXACTLY the rows
        where ``predicate`` is TRUE with ``df``, in ONE commit::

            result = (table WHERE NOT predicate) UNION df

        The partition-refresh staple: reload one day/region of a
        100 TB table without touching the rest, with readers seeing
        the old state or the new one, never a mix. File-granular like
        :meth:`delete`: files with no matching row carry
        byte-identical; touched files rewrite keeping their
        NOT-predicate rows; ``df`` lands as new files (one clustered
        write for both). ``prune`` narrows the find-scan with
        predicate-implied range conjuncts exactly as in delete — a
        date-partitioned reload plans a scan of one partition's
        files, not the table.

        REPLACEMENT-CONFORMANCE (the Delta replaceWhere contract):
        every ``df`` row must itself satisfy ``predicate`` — rows
        outside it would silently survive the next same-predicate
        refresh; refused up front with a bounded probe. Generated
        columns compute/validate on ``df``; identity columns
        allocate; CHECK constraints validate on the written files;
        CDF tables record delete-images for the replaced rows and
        insert-images for ``df``. Concurrency follows delete's
        file-granularity rules (commutes with appends and disjoint
        rewrites; a winner adding predicate-matching rows, or
        advancing an identity watermark this commit allocated from,
        raises for a re-run). No-op calls (empty ``df`` AND no
        matching rows) return the current version — no empty commits.

        SQL form: ``INSERT INTO t REPLACE WHERE <pred> SELECT ...``.
        Citation: Delta Lake DataFrameWriter ``replaceWhere`` option
        / INSERT INTO ... REPLACE WHERE; the reference (825-LoC
        Airflow ETL) has only the full truncate-and-load
        (``users_etl.py:206-214``), which :meth:`overwrite` covers —
        this is its partition-scoped refinement."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        id_map = ptr.get("identity") or {}
        df, id_alloc = self._alloc_identity(df, id_map)
        df = self._apply_generated(df, ptr.get("generated"))
        if id_alloc:
            tbl = self._manifest_schema(ptr)
            if tbl is not None:
                order = [
                    f.name for f in tbl.fields if f.name in df.columns
                ]
                order += [c for c in df.columns if c not in order]
                df = df.select(*order)
        sch = self._check_schema(df, parent)
        # conformance probe (bounded: first violation only) — BEFORE
        # any file is written
        stray = (
            df.filter(
                ~F.coalesce(F.expr(predicate), F.lit(False))
            )
            .limit(1)
            .count()
        )
        if stray:
            raise ValueError(
                "VersionedTable.overwrite_where: replacement rows "
                f"must satisfy the predicate ({predicate!r}) — a row "
                "outside it would silently survive the next "
                "same-predicate refresh; filter the frame or widen "
                "the predicate"
            )
        touched_files = self._touched_files(
            base, predicate, prune, verify_prune
        )
        touched = set(touched_files)
        kept_files = [f for f in base["files"] if f not in touched]
        # probe the replacement frame only when nothing was touched —
        # the common touched-files path skips the extra job (r16)
        if not touched_files and not df.limit(1).count():
            return parent
        keep_rows = ~F.coalesce(F.expr(predicate), F.lit(False))
        remaining = (
            self._read_files(base, touched_files).filter(keep_rows)
            if touched_files
            else None
        )
        combined = (
            remaining.unionByName(df, allowMissingColumns=True)
            if remaining is not None
            else df
        )
        cdc_dir = None
        if base.get("cdf"):
            removed = (
                self._read_files(base, touched_files)
                .filter(F.coalesce(F.expr(predicate), F.lit(False)))
                .select("*", F.lit("delete").alias("_change_type"))
                if touched_files
                else None
            )
            cdc = df.select(
                "*", F.lit("insert").alias("_change_type")
            )
            if removed is not None:
                cdc = removed.unionByName(cdc, allowMissingColumns=True)
            cdc_dir = self._write_cdc_if_any(cdc, parent + 1)
        partition_by = base.get("partition_by")
        # write-first (r16, drop_if_empty): the old limit(1) probe
        # executed the keep-rows scan + replacement union once for the
        # gate and again for the write
        new_files = self._write_data(
            combined,
            parent + 1,
            partition_by,
            base.get("bucket_by"),
            drop_if_empty=True,
        )
        id_marks = (
            self._identity_watermark(new_files, id_map, id_alloc)
            if id_alloc and new_files
            else {}
        )
        stats_cols = base.get("stats_cols") or []
        new_stats = (
            self._collect_stats(new_files, stats_cols, base.get("bloom"))
            if "segments" not in ptr
            and (stats_cols or base.get("bloom"))
            and new_files
            else {}
        )
        new_parts = (
            self._partition_values(new_files, partition_by)
            if "segments" not in ptr and partition_by
            else {}
        )
        new_segs = None
        checked = False
        for _ in range(10):
            v = parent + 1
            m = {
                "version": v,
                "parent": parent,
                "op": "replace_where",
                "predicate": predicate,
                "schema": sch["schema"],
                "schema_json": sch["schema_json"],
                "mixed": bool(base.get("mixed")) or bool(sch["mixed"]),
                "txn": txn,
                "txns": self._txns_after(base, txn),
                "stats_cols": base.get("stats_cols") or [],
                "bloom": base.get("bloom"),
                "partition_by": partition_by,
                "constraints": base.get("constraints") or {},
            }
            m = self._carry_mapping(m, base)
            if id_marks:
                m["identity"] = self._bump_identity(
                    ptr.get("identity") or id_map, id_marks
                )
            if cdc_dir:
                m["cdc"] = cdc_dir
            if base.get("delete_vectors"):
                m["delete_vectors"] = base["delete_vectors"]
            if "segments" in ptr:
                segs = self._segments_without(ptr, touched)
                if new_files:
                    if new_segs is None:
                        new_segs = self._build_segments(
                            new_files,
                            stats_cols,
                            partition_by,
                            base.get("bloom"),
                        )
                    segs.extend(new_segs)
                m["segments"] = segs
                m["n_files"] = len(kept_files) + len(new_files)
            else:
                kept_set = set(kept_files)
                m["files"] = sorted(kept_files + new_files)
                m["stats"] = {
                    **{
                        f: s
                        for f, s in (base.get("stats") or {}).items()
                        if f in kept_set
                    },
                    **new_stats,
                }
                m["parts"] = {
                    **{
                        f: p
                        for f, p in (base.get("parts") or {}).items()
                        if f in kept_set
                    },
                    **new_parts,
                }
            if not checked:
                # the replacement rows are NEW — CHECK constraints
                # must hold on them (remaining rows re-validate for
                # free; they were already valid). New files carry no
                # DVs.
                self._check_constraints(
                    new_files, {**m, "delete_vectors": []}
                )
                checked = True
            if self._try_commit(m, v):
                return v
            parent, ptr, base = self._rebase_over_disjoint(
                parent,
                ptr,
                base,
                "replace_where",
                touched,
                self._stale_if_predicate_match(predicate),
            )
            if id_alloc and (ptr.get("identity") or {}) != id_map:
                raise ConcurrentWriteError(
                    "VersionedTable: replace_where raced a commit "
                    "that advanced the identity watermark; the "
                    "staged ids are stale — re-run"
                )
            kept_files = [f for f in base["files"] if f not in touched]
        raise ConcurrentWriteError(
            "VersionedTable: overwrite_where lost 10 CAS races"
        )

    # commit ops a lost CAS race can rebase OVER: appends and
    # file-scoped rewrites. Table-wide replacements (overwrite,
    # upsert) and metadata commits that change what a predicate or
    # file name MEANS (rename, drop, set_partition_spec) always
    # invalidate a staged rewrite.
    # analyze changes no file list and no rows — it always commutes
    # under rules 2-4 (nothing removed, no vectors, nothing added)
    _REBASABLE_OPS = frozenset(
        {
            "append",
            "delete",
            "update",
            "merge",
            "optimize",
            "analyze",
            # replace_where is delete+append at file granularity —
            # the same disjointness rules decide (r15)
            "replace_where",
        }
    )

    def _rebase_over_disjoint(
        self, parent: int, ptr: dict, base: dict, op: str, touched, is_stale
    ):
        """After a file-scoped rewrite lost its CAS: decide whether the
        staged change set still holds on the new head, at FILE
        granularity — Delta's conflict rules (ConcurrentAppend /
        ConcurrentDeleteRead / ConcurrentDeleteDelete), extended in
        r11 from append-only spans to DISJOINT rewrites. The loser
        rebases iff

        1. every winning commit is itself file-scoped
           (:attr:`_REBASABLE_OPS`) — an overwrite/upsert or a
           rename/drop/spec change invalidates everything;
        2. no winner removed or rewrote a file THIS writer rewrote or
           vectored (``touched``) — the staged output or the (file,
           position) keys would be stale (ConcurrentDeleteDelete);
        3. no winner added a deletion vector on a ``touched`` file —
           the staged rewrite, computed DV-as-of-base, would
           resurrect those rows;
        4. ``is_stale`` — one bounded, head-DV-applied scan of just
           the files the span ADDED — finds nothing the staged change
           set mis-classified (an appended/updated row the predicate
           or merge keys now cover).

        Returns the new ``(head, pointer, manifest)`` to rebase onto;
        any violated rule raises :class:`ConcurrentWriteError` and the
        caller must recompute. Cost is O(span metadata) + one scan of
        the span's added files — never a re-scan of the table."""
        from urllib.parse import unquote, urlparse

        new_head = self.head_version()
        span = [v2 for v2 in self.versions() if parent < v2 <= new_head]
        bad = [
            v2
            for v2 in span
            if self._read_pointer(v2).get("op") not in self._REBASABLE_OPS
        ]
        if bad:
            raise ConcurrentWriteError(
                f"VersionedTable: {op} raced non-rebasable commits "
                f"{bad} (table-wide or metadata ops); the rewrite is "
                "stale — re-run"
            )
        new_ptr = self._read_pointer(new_head)
        new_base = self._resolve(new_ptr)
        touched = set(touched)
        removed = set(base["files"]) - set(new_base["files"])
        overlap = removed & touched
        if overlap:
            raise ConcurrentWriteError(
                f"VersionedTable: {op} raced a rewrite of "
                f"{len(overlap)} file(s) it also rewrote — the staged "
                "output is stale; re-run against the new head"
            )
        new_dvs = [
            d
            for d in (new_base.get("delete_vectors") or [])
            if d not in set(base.get("delete_vectors") or [])
        ]
        if new_dvs and touched:
            # bounded by the winners' vectors: file-level keys only
            dv_files = {
                unquote(urlparse(r[0]).path)
                for r in self.spark.read.parquet(*new_dvs)
                .select(self._DV_FILE)
                .distinct()
                .collect()
            }
            if dv_files & touched:
                raise ConcurrentWriteError(
                    f"VersionedTable: {op} raced a deletion vector on "
                    "a file it rewrote — the staged output would "
                    "resurrect those rows; re-run against the new head"
                )
        added = sorted(set(new_base["files"]) - set(base["files"]))
        if added:
            # one bounded scan of just the winners' files, DV-applied
            # at the NEW head (a row a later winner already vectored
            # out cannot be mis-classified)
            reason = is_stale(self._read_files(new_base, added))
            if reason:
                raise ConcurrentWriteError(
                    f"VersionedTable: {op} {reason}"
                )
        return new_head, new_ptr, new_base

    def _stale_if_predicate_match(self, predicate: str):
        """`is_stale` for predicate-scoped DML: the span's added rows
        must provably miss the predicate, else the staged rewrite (or
        deletion vector) would skip rows it semantically covers."""

        def check(df: DataFrame):
            hit = df.filter(F.coalesce(F.expr(predicate), F.lit(False)))
            if hit.limit(1).count():
                return (
                    "raced a commit whose added rows match the "
                    "predicate — the staged rewrite would miss them; "
                    "re-run against the new head"
                )
            return None

        return check

    def _delete_mor(
        self,
        predicate: str,
        txn: str | None,
        prune: list[tuple] | None,
        verify_prune: bool,
    ) -> int:
        """Merge-on-read DELETE (Delta deletion vectors, VERDICT r8
        #5): write the matching rows' (file, row-position) keys as a
        parquet DELETION VECTOR — distributed write, never through the
        driver — and commit a manifest that keeps every data file and
        segment BY NAME, adding only the vector reference. Reads
        anti-join the vectors out (:meth:`_read_files`); OPTIMIZE and
        full rewrites compact them away. The find-scan is DV-applied,
        so re-deleting an already-deleted slice is a no-op commit-wise
        (returns the current version), and prune hints narrow it
        exactly as in COW mode."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        candidates = (
            self._kept_files_all(base, prune) if prune else base["files"]
        )
        if prune and verify_prune:
            cand = set(candidates)
            pruned_out = [f for f in base["files"] if f not in cand]
            if pruned_out:
                stray = (
                    self._read_files(base, pruned_out)
                    .filter(F.expr(predicate))
                    .limit(1)
                    .count()
                )
                if stray:
                    raise ValueError(
                        "VersionedTable: prune hint does not cover the "
                        f"predicate — rows matching {predicate!r} exist "
                        "in files the hint pruned out; fix the bounds "
                        "(they must be IMPLIED by the predicate)"
                    )
        if not candidates:
            return parent
        hits = (
            self._read_files(base, candidates, with_pos=True)
            .filter(F.coalesce(F.expr(predicate), F.lit(False)))
            .select(self._DV_FILE, self._DV_POS)
        )
        # bounded probe before writing: no matches → no empty commit
        if not hits.limit(1).count():
            return parent
        dv_dir = f"{self.path}/dv/b{parent + 1:08d}-{uuid.uuid4().hex[:8]}"
        apply_light_committer(
            hits.write.mode("error"), self.spark
        ).parquet(dv_dir)
        from urllib.parse import unquote, urlparse

        # the files this vector names: the staged (file, position)
        # keys stay valid on a rebase iff no winner rewrote one of
        # them — file-level metadata, bounded by the matched files
        dv_touched = {
            unquote(urlparse(r[0]).path)
            for r in self.spark.read.parquet(dv_dir)
            .select(self._DV_FILE)
            .distinct()
            .collect()
        }
        for _ in range(10):
            v = parent + 1
            m = dict(ptr)
            # drop op-specific keys a previous commit may have left in
            # the pointer (a stale merge_on/predicate would misdescribe
            # THIS commit in history inspection; an inherited cdc dir
            # would double-count the WINNER's changes at this version)
            for stale in (
                "merge_on", "mode", "predicate", "txn", "cdc",
                "restored_from",
            ):
                m.pop(stale, None)
            m.update(
                {
                    "version": v,
                    "parent": parent,
                    "op": "delete",
                    "mode": "mor",
                    "predicate": predicate,
                    "txn": txn,
                    "txns": self._txns_after(ptr, txn),
                    "delete_vectors": (ptr.get("delete_vectors") or [])
                    + [dv_dir],
                }
            )
            # readers must anti-join the vector or resurrect rows —
            # gate them (protocol feature, r12)
            self._add_feature(m, "dv")
            if self._try_commit(m, v):
                return v
            # the vector names (file, position) keys — appends never
            # move files and disjoint rewrites by definition don't
            # touch the vectored files, so the keys stay valid on the
            # new head; the same file-granularity rules as COW delete
            # apply (r11): a winner that rewrote a vectored file, or
            # added rows the predicate covers, raises
            parent, ptr, base = self._rebase_over_disjoint(
                parent,
                ptr,
                base,
                "delete(mor)",
                dv_touched,
                self._stale_if_predicate_match(predicate),
            )
        raise ConcurrentWriteError(
            "VersionedTable: delete(mor) lost 10 CAS races"
        )

    #: target rows per MoR-written file — sizes new-rows-only commits
    #: explicitly instead of trusting AQE's coalescing heuristics
    #: (parallelismFirst etc. vary with session history; the 10×
    #: probe caught a 16-row merge writing 12 sliver files when the
    #: keyless-repartition form ran mid-battery)
    _MOR_ROWS_PER_FILE = 4_000_000

    def _mor_shuffle(
        self,
        df: DataFrame,
        partition_by,
        bucket_by,
        n_rows: int,
    ) -> DataFrame:
        """Optimized-write shuffle for MoR new-rows-only files (r12 —
        the Delta optimizeWrite idea): repartition the commit's
        changed rows to an EXPLICIT count derived from their number
        (``ceil(n / _MOR_ROWS_PER_FILE)``, capped at the session's
        shuffle parallelism), so a low-selectivity MoR commit writes
        a few right-sized files instead of one sliver per scan task.
        Partitioned layouts shuffle on the partition columns instead
        (one writer set per leaf dir); bucketed layouts pass through —
        the bucket write repartitions itself. The shuffle moves only
        the commit's changed rows, never table-sized data."""
        if bucket_by:
            return df
        pb = self._pb_cols(partition_by)
        if pb:
            return df.repartition(*[F.col(c) for c in pb])
        cap = int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        # tunable per session like dedup.driverComponentThreshold
        # (VERDICT r12 #4): a 128 MB-file deployment sets
        # spark.smetl.mor.rowsPerFile to its own row budget without
        # editing source; the class constant is only the default.
        conf = self.spark.conf.get("spark.smetl.mor.rowsPerFile", None)
        rows_per_file = (
            int(conf) if conf is not None else self._MOR_ROWS_PER_FILE
        )
        if rows_per_file < 1:
            raise ValueError(
                "spark.smetl.mor.rowsPerFile must be >= 1, got "
                f"{rows_per_file}"
            )
        nparts = max(1, min(cap, -(-n_rows // rows_per_file)))
        return df.repartition(nparts)

    def _update_mor(
        self,
        predicate: str,
        assignments: dict[str, str],
        txn: str | None,
        prune: list[tuple] | None,
        verify_prune: bool,
    ) -> int:
        """Merge-on-read UPDATE (VERDICT r11 #3 — extending the
        deletion-vector machinery beyond DELETE, as Delta's DVs serve
        update too): the matching rows' (file, row-position) keys
        become a DELETION VECTOR hiding their PRE-update versions, and
        their POST-update images land in new files — ZERO existing
        data files are rewritten. At 100 TB a 0.1%-selectivity update
        costs O(matched rows) written, not O(touched files) rewritten;
        OPTIMIZE folds the vectors away exactly as for MoR delete.
        Reads see one version of every row (the vector hides the old
        one); time travel below the commit still reads the originals.
        CDC on a ``change_data_feed`` table records the same
        pre/postimage pairs as the COW form. Conflict rules are the
        MoR-delete rules plus the update staleness check: a winner
        that rewrote/vectored a vectored file, or added rows the
        predicate covers, raises."""
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        schema = self._manifest_schema(base)
        if schema is None:
            raise ValueError(
                "VersionedTable.update: legacy manifest without "
                "schema_json cannot type-check assignments"
            )
        types = {f.name: f.dataType for f in schema.fields}
        unknown = set(assignments) - set(types)
        if unknown:
            raise ValueError(
                f"VersionedTable.update: assignment to unknown "
                f"column(s) {sorted(unknown)}; table columns are "
                f"{sorted(types)}"
            )
        self._refuse_generated_assignment(
            base, set(assignments), "update"
        )
        candidates = (
            self._kept_files_all(base, prune) if prune else base["files"]
        )
        if prune and verify_prune:
            cand = set(candidates)
            pruned_out = [f for f in base["files"] if f not in cand]
            if pruned_out:
                stray = (
                    self._read_files(base, pruned_out)
                    .filter(F.expr(predicate))
                    .limit(1)
                    .count()
                )
                if stray:
                    raise ValueError(
                        "VersionedTable: prune hint does not cover the "
                        f"predicate — rows matching {predicate!r} exist "
                        "in files the hint pruned out; fix the bounds "
                        "(they must be IMPLIED by the predicate)"
                    )
        if not candidates:
            return parent
        hit = F.coalesce(F.expr(predicate), F.lit(False))
        # DV-applied scan: a row an earlier vector already hid must
        # not be re-updated (its post-image would resurrect it)
        rows = self._read_files(
            base, candidates, with_pos=True
        ).filter(hit)
        if not rows.limit(1).count():
            return parent

        def _assigned(name):
            # strict in-plan cast, the COW update contract (ADVICE r8)
            t = types[name].simpleString()
            return F.expr(
                self._strict_cast_sql(
                    assignments[name],
                    t,
                    "VersionedTable.update: assignment to column "
                    f"'{name}' does not fit type {t} for value '",
                )
            )

        post_cols = [
            (
                _assigned(f.name).alias(f.name)
                if f.name in assignments
                else F.col(f.name)
            )
            for f in schema.fields
        ]
        v = parent + 1
        # the vector hides the pre-update versions…
        dv_dir = f"{self.path}/dv/b{v:08d}-{uuid.uuid4().hex[:8]}"
        apply_light_committer(
            rows.select(self._DV_FILE, self._DV_POS).write.mode("error"),
            self.spark,
        ).parquet(dv_dir)
        from urllib.parse import unquote, urlparse

        dv_touched = {
            unquote(urlparse(r[0]).path)
            for r in self.spark.read.parquet(dv_dir)
            .select(self._DV_FILE)
            .distinct()
            .collect()
        }
        # …and the post-images land as NEW files (never a rewrite),
        # explicitly sized from the vector's row count (a columnar
        # count over the just-written DV parquet — footer metadata,
        # no data pass) so slivers don't proliferate
        n_changed = self.spark.read.parquet(dv_dir).count()
        partition_by = base.get("partition_by")
        new_files = self._write_data(
            self._mor_shuffle(
                rows.select(*post_cols),
                partition_by,
                base.get("bucket_by"),
                n_changed,
            ),
            v,
            partition_by,
            base.get("bucket_by"),
        )
        cdc_dir = None
        if base.get("cdf"):
            pre = rows.select(*[F.col(f.name) for f in schema.fields])
            post = rows.select(*post_cols)
            cdc_dir = self._write_cdc(
                pre.select(
                    "*", F.lit("update_preimage").alias("_change_type")
                ).unionByName(
                    post.select(
                        "*",
                        F.lit("update_postimage").alias("_change_type"),
                    )
                ),
                v,
            )
        stats_cols = base.get("stats_cols") or []
        new_stats = (
            self._collect_stats(new_files, stats_cols, base.get("bloom"))
            if "segments" not in ptr and (stats_cols or base.get("bloom"))
            else {}
        )
        new_parts = (
            self._partition_values(new_files, partition_by)
            if "segments" not in ptr and partition_by
            else {}
        )
        new_segs = None
        checked = False
        for _ in range(10):
            v = parent + 1
            m = dict(ptr)
            for stale in (
                "merge_on", "mode", "predicate", "txn", "cdc",
                "restored_from",
            ):
                m.pop(stale, None)
            m.update(
                {
                    "version": v,
                    "parent": parent,
                    "op": "update",
                    "mode": "mor",
                    "predicate": predicate,
                    "txn": txn,
                    "txns": self._txns_after(ptr, txn),
                    "delete_vectors": (ptr.get("delete_vectors") or [])
                    + [dv_dir],
                }
            )
            if "segments" in ptr:
                if new_segs is None:
                    new_segs = self._build_segments(
                        new_files,
                        stats_cols,
                        partition_by,
                        base.get("bloom"),
                    )
                # every parent segment carries BY NAME — the zero-
                # rewrite contract at the metadata layer too
                m["segments"] = list(ptr["segments"]) + new_segs
                m["n_files"] = ptr["n_files"] + len(new_files)
            else:
                m["files"] = sorted(base["files"] + new_files)
                m["stats"] = {**(base.get("stats") or {}), **new_stats}
                m["parts"] = {**(base.get("parts") or {}), **new_parts}
            if cdc_dir:
                m["cdc"] = cdc_dir
            self._add_feature(m, "dv")
            if not checked:
                # post-images can leave a CHECK; new files carry no
                # vectors, skip the anti-join
                self._check_constraints(
                    new_files, {**m, "delete_vectors": []}
                )
                checked = True
            if self._try_commit(m, v):
                return v
            # same file-granularity rules as delete(mor): the vector's
            # (file, position) keys survive appends and disjoint
            # rewrites; a winner that rewrote/vectored one of the
            # vectored files, or added rows the predicate covers,
            # raises
            parent, ptr, base = self._rebase_over_disjoint(
                parent,
                ptr,
                base,
                "update(mor)",
                dv_touched,
                self._stale_if_predicate_match(predicate),
            )
        raise ConcurrentWriteError(
            "VersionedTable: update(mor) lost 10 CAS races"
        )

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        when_matched_update: dict[str, str] | None = None,
        when_matched_delete: str | None = None,
        when_not_matched_insert: dict[str, str] | str | None = None,
        when_not_matched_by_source_update: dict[str, str] | None = None,
        when_not_matched_by_source_delete: str | None = None,
        txn: str | None = None,
        mode: str = "cow",
        when_matched_update_condition: str | None = None,
        when_not_matched_insert_condition: str | None = None,
        when_not_matched_by_source_update_condition: str | None = None,
        schema_evolution: bool | None = None,
    ) -> int:
        """MERGE INTO as ONE copy-on-write commit (the Delta MERGE
        pattern, VERDICT r8 #6) — the transactional generalization of
        :meth:`upsert`:

        - ``on``: equi-join key columns (present in both sides).
        - ``when_matched_delete``: SQL condition over ``t.*``/``s.*``;
          a matched target row satisfying it is REMOVED. Evaluated
          before the update clause, Delta clause-order semantics.
        - ``when_matched_update``: column -> SQL expression over
          ``t.*`` (pre-merge values) and ``s.*``; applied to matched
          rows the delete clause did not take. Expressions strict-cast
          to the column's type — a value that does not fit raises
          in-plan, never a silent NULL.
        - ``when_not_matched_insert``: ``"*"`` inserts source rows
          aligned by name (missing table columns NULL-fill), or a
          column -> expression dict over ``s.*``. ``None`` = no
          inserts. With ``INSERT *``, source columns ABSENT from the
          target refuse by default — silently dropping them is the
          failure mode schema evolution exists to prevent.
        - ``schema_evolution`` (r14 — Delta's
          ``spark.databricks.delta.schema.autoMerge``, VERDICT r13
          #4): opt-in per call, or table-wide via the property
          ``smetl.merge.schemaEvolution='true'``. With ``INSERT *``,
          new source columns WIDEN the target schema first (one
          metadata-only :meth:`add_column` commit each — zero files
          move; pre-evolution rows NULL-fill through the mixed read),
          and a source column whose type is a lossless widening of
          the target's (:attr:`_WIDENINGS` — int→bigint, float→double
          …) widens it via :meth:`widen_column` the same way; the
          data merge then runs against the evolved schema. The
          evolution commits precede the data commit (each
          individually atomic and CAS-rebased — the same sequence a
          Delta user runs manually; a concurrent reader between them
          sees the widened-but-not-yet-merged schema, never a torn
          one). Dict-form inserts and UPDATE assignments never
          evolve — they refuse unknown columns as before.
        - ``when_matched_update_condition`` /
          ``when_not_matched_insert_condition`` /
          ``when_not_matched_by_source_update_condition`` (r13 —
          completing Delta's clause matrix, where EVERY clause takes
          an optional ``AND <cond>``; the delete clauses are already
          conditions): a row failing its clause's condition is NOT
          taken — a matched row carries unchanged (and produces no
          CDC images), an unmatched source row is not inserted. The
          update condition sees ``t.*``/``s.*``; the insert condition
          sees ``s.*`` only, the by-source condition ``t.*`` only
          (refused otherwise, like the by-source delete). NULL
          conditions count as not-taken, SQL semantics. Note the COW
          find-scan stays KEY-granular: a file whose matched rows all
          fail the update condition is still rewritten
          (content-identical) — file granularity, as in Delta; MoR
          skips such rows entirely (no vector entry, no new file),
          so conditional point-merges prefer ``mode='mor'``.
        - ``when_not_matched_by_source_delete`` /
          ``when_not_matched_by_source_update`` (r11 — Delta's WHEN
          NOT MATCHED BY SOURCE): target rows with NO source match
          are deleted when the SQL condition (over ``t.*`` only — a
          by-source clause has no source row, ``s.`` references are
          refused) holds, else updated with the assignment dict;
          delete evaluates before update, Delta clause order. An
          unconditional by-source delete plus matched-update plus
          insert is the classic SYNC-TO-SOURCE: after the commit the
          table equals the (transformed) source. The find-scan stays
          COW-granular: only files holding a matched row or an
          unmatched row the clause fires for are rewritten.

        Only target files CONTAINING matched keys are rewritten
        (found via a key semi-join against a scan-level
        ``input_file_name`` projection — manifest metadata in,
        O(matched files) out); untouched files carry over
        byte-identical, and on a segmented table untouched SEGMENTS
        carry by NAME. Inserts land in the same new file set, so the
        whole MERGE is one atomic snapshot swap with
        first-committer-wins CAS (a lost race raises — the merge was
        computed against a stale snapshot). A target row matching
        MULTIPLE source rows raises (Delta's ambiguity error) —
        latest-wins reduction is the caller's job (or use
        :meth:`upsert`). ``txn`` records an application transaction id
        for idempotent replay via :meth:`committed_txns`. Returns the
        new version, or the current version unchanged if no clause
        applied to any row.

        ``mode='mor'`` (VERDICT r11 #3 — Delta DVs serving MERGE):
        matched rows taken by the delete OR update clauses (and
        by-source-taken rows) are hidden by a DELETION VECTOR instead
        of rewriting their files; update post-images and inserts land
        in NEW files — zero existing data files are rewritten, so a
        0.1%-selectivity MERGE on a 100 TB table costs O(matched
        rows), not O(touched files). OPTIMIZE folds the vectors away.
        CDC recording, clause semantics, ambiguity refusal, txn
        replay and the conflict rules are identical to COW (the
        rebase guards the VECTORED files instead of rewritten ones).

        FIND-SCAN PRUNING (VERDICT r11 #6): when a merge key column
        carries per-file metadata (bloom bitmap, footer stats, or the
        partition spec) and the source's distinct keys are few, the
        target-side scans — matched-file discovery, the ambiguity
        probe, and the insert anti-join — open only files that may
        hold a source key (:meth:`_keyed_candidate_files`), so a
        point-keyed MERGE on a bloom-indexed key reads
        O(files-holding-keys). A NOT MATCHED BY SOURCE clause
        classifies every target row and disables the pruning."""
        if mode not in ("cow", "mor"):
            raise ValueError(
                f"VersionedTable.merge: unknown mode {mode!r} — "
                "expected 'cow' (copy-on-write rewrite) or 'mor' "
                "(deletion vector + new-rows-only files)"
            )
        mor = mode == "mor"
        if not on:
            raise ValueError("VersionedTable.merge: 'on' must name key columns")
        # clause CONDITIONS (r13 — completing Delta's clause matrix:
        # every WHEN clause takes an optional AND <cond>): a condition
        # without its clause is a caller bug, refused; an insert
        # condition sees only ``s.*`` (an unmatched source row has no
        # target), mirroring the by-source refusal of ``s.``
        import re as _re

        for cname, cond, clause in (
            (
                "when_matched_update_condition",
                when_matched_update_condition,
                when_matched_update,
            ),
            (
                "when_not_matched_insert_condition",
                when_not_matched_insert_condition,
                when_not_matched_insert,
            ),
            (
                "when_not_matched_by_source_update_condition",
                when_not_matched_by_source_update_condition,
                when_not_matched_by_source_update,
            ),
        ):
            if cond is not None and clause is None:
                raise ValueError(
                    f"VersionedTable.merge: {cname} given without its "
                    "clause"
                )
        if when_not_matched_insert_condition is not None and _re.search(
            r"\bt\s*\.", when_not_matched_insert_condition
        ):
            raise ValueError(
                "VersionedTable.merge: a NOT MATCHED insert condition "
                "has no target row — remove the 't.' reference from "
                f"{when_not_matched_insert_condition!r}"
            )
        if (
            when_matched_update is None
            and when_matched_delete is None
            and when_not_matched_insert is None
            and when_not_matched_by_source_update is None
            and when_not_matched_by_source_delete is None
        ):
            raise ValueError(
                "VersionedTable.merge: at least one WHEN clause required"
            )
        by_source = (
            when_not_matched_by_source_update is not None
            or when_not_matched_by_source_delete is not None
        )
        if by_source:
            bs_texts = list(
                (when_not_matched_by_source_update or {}).values()
            ) + [
                txt
                for txt in (
                    when_not_matched_by_source_delete,
                    when_not_matched_by_source_update_condition,
                )
                if txt is not None
            ]
            for txt in bs_texts:
                if _re.search(r"\bs\s*\.", txt):
                    raise ValueError(
                        "VersionedTable.merge: a NOT MATCHED BY SOURCE "
                        "clause has no source row — remove the 's.' "
                        f"reference from {txt!r} (Delta refuses these "
                        "too)"
                    )
        pending_adds: list[tuple[str, str]] = []
        pending_widens: list[tuple[str, str]] = []
        if when_not_matched_insert == "*":
            # schema evolution (r14, see docstring): resolve the
            # opt-in, then either PLAN the metadata-only evolution or
            # refuse extra source columns explicitly — never drop
            # them silently. The evolution commits are DEFERRED past
            # every pre-commit validation (ADVICE r14 #2): a merge
            # that is refused for duplicate-key ambiguity, an unknown
            # column, or a bad clause no longer leaves add_column/
            # widen commits behind. (A merge that loses its final CAS
            # still does — the evolution commits are harmless
            # metadata a re-run reuses; Delta folds them into one
            # transaction, this engine keeps them as its standard
            # metadata commits.)
            head_ptr = self._read_pointer(self.head_version())
            tbl_schema = self._manifest_schema(head_ptr)
            if schema_evolution is None:
                schema_evolution = (
                    (head_ptr.get("properties") or {})
                    .get("smetl.merge.schemaEvolution", "")
                    .lower()
                    == "true"
                )
            if tbl_schema is not None:
                tbl_types = {f.name: f.dataType for f in tbl_schema.fields}
                extra = [
                    f
                    for f in source.schema.fields
                    if f.name not in tbl_types
                ]
                if extra and not schema_evolution:
                    raise ValueError(
                        "VersionedTable.merge: INSERT * source carries "
                        f"column(s) {sorted(f.name for f in extra)} not "
                        "in the target schema "
                        f"{sorted(tbl_types)} — dropping them silently "
                        "would lose data. Opt into schema evolution "
                        "(schema_evolution=True, or table property "
                        "smetl.merge.schemaEvolution='true') to widen "
                        "the target, or project the source first."
                    )
                if schema_evolution:
                    pending_adds = [
                        (f.name, f.dataType.simpleString()) for f in extra
                    ]
                    for f in source.schema.fields:
                        cur = tbl_types.get(f.name)
                        if (
                            cur is not None
                            and cur != f.dataType
                            and f.dataType.simpleString()
                            in self._WIDENINGS.get(cur.simpleString(), ())
                        ):
                            pending_widens.append(
                                (f.name, f.dataType.simpleString())
                            )
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        id_map = {
            k: dict(v) for k, v in (ptr.get("identity") or {}).items()
        }
        if id_map and when_not_matched_insert is not None:
            # identity + MERGE (r15): inserts ALLOCATE ids exactly
            # like append — the source may never supply them
            # (GENERATED ALWAYS), and merging ON an identity column
            # with an insert clause is contradictory (an unmatched
            # row's key would have to be engine-allocated, so it
            # could never have matched anything)
            keyed = sorted(set(on) & set(id_map))
            if keyed:
                raise ValueError(
                    "VersionedTable.merge: merging ON identity "
                    f"column(s) {keyed} with an insert clause is "
                    "contradictory — the engine allocates those "
                    "values, so an unmatched source row cannot carry "
                    "one; drop the insert clause (update/delete-only "
                    "merges may key on identity) or merge on a "
                    "natural key"
                )
            supplied = sorted(
                set(source.columns) & set(id_map)
                if when_not_matched_insert == "*"
                else set(when_not_matched_insert) & set(id_map)
                if isinstance(when_not_matched_insert, dict)
                else set()
            )
            if supplied:
                raise ValueError(
                    "VersionedTable.merge: insert supplies GENERATED "
                    f"ALWAYS AS IDENTITY column(s) {supplied} — the "
                    "engine allocates them; project them out of the "
                    "source / omit them from the insert list"
                )
        base = self._resolve(ptr)
        schema = self._manifest_schema(base)
        if schema is None:
            raise ValueError(
                "VersionedTable.merge: legacy manifest without "
                "schema_json cannot type-check merge clauses"
            )
        types = {f.name: f.dataType for f in schema.fields}
        # validations below see the POST-evolution types (the planned
        # adds/widens overlaid) so clause checks keep their r14
        # semantics while the commits themselves stay deferred
        pre_evolution_cols = set(types)
        for _n, _dt in pending_adds:
            types[_n] = T._parse_datatype_string(_dt)
        for _n, _dt in pending_widens:
            types[_n] = T._parse_datatype_string(_dt)
        for label, dct in (
            ("update", when_matched_update),
            ("by-source update", when_not_matched_by_source_update),
        ):
            if dct:
                unknown = set(dct) - set(types)
                if unknown:
                    raise ValueError(
                        f"VersionedTable.merge: {label} assigns unknown "
                        f"column(s) {sorted(unknown)}"
                    )
                self._refuse_generated_assignment(ptr, set(dct), "merge")
        gen_cols = ptr.get("generated") or {}
        if gen_cols and isinstance(when_not_matched_insert, dict):
            named = set(when_not_matched_insert) & set(gen_cols)
            if named:
                raise ValueError(
                    f"VersionedTable.merge: insert names GENERATED "
                    f"column(s) {sorted(named)} — they are computed "
                    "from their expressions; omit them from the "
                    "insert list"
                )
        missing = [c for c in on if c not in types]
        if missing:
            raise ValueError(
                f"VersionedTable.merge: key column(s) {missing} not in "
                f"table columns {sorted(types)}"
            )
        if when_matched_update:
            unknown = set(when_matched_update) - set(types)
            if unknown:
                raise ValueError(
                    "VersionedTable.merge: update assigns unknown "
                    f"column(s) {sorted(unknown)}"
                )
        if "__s_hit" in source.columns:
            raise ValueError(
                "VersionedTable.merge: source column name '__s_hit' is "
                "reserved for the match marker"
            )
        src_keys = source.select(*on).distinct()
        # key-metadata pruning of every target-side scan (r12 — see
        # docstring): sound because each scan below joins the target
        # against SOURCE KEYS on equality, and a pruned-out file
        # provably holds none of them. A by-source clause reads
        # unmatched rows anywhere, so it keeps the full list.
        # A key column the evolution will ADD has no target values
        # yet: pruning and the ambiguity probe are skipped (no target
        # row can match a NULL-only key — SQL MERGE's null-unsafe
        # equality), and the post-evolution refresh below recomputes
        # the candidate list against the evolved manifest.
        keys_preexist = all(c in pre_evolution_cols for c in on)
        candidates = (
            base["files"]
            if by_source or not keys_preexist
            else self._keyed_candidate_files(base, on, src_keys)
        )
        # introspection for gates/ops dashboards: what the keyed
        # pruning bought THIS merge (kept == total when it fell back)
        self.last_merge_scan_files = (len(candidates), len(base["files"]))

        # ambiguity: a target row matched by >1 source row has no
        # deterministic clause outcome — refuse, as Delta does. The
        # target-side probe only runs when the source actually HAS
        # duplicate keys (deduped sources — the common case — cost one
        # source-side aggregate, never a table scan). Runs BEFORE the
        # deferred evolution commits (ADVICE r14 #2): an ambiguity
        # refusal leaves the target schema untouched.
        target_keys = None
        # FUSED ambiguity probe (r16, guide §1.2): when no schema
        # evolution is pending (nothing to defer a refusal past) and
        # the target carries no deletion vectors (the probe must count
        # only VISIBLE rows, and the find-scan below is physical), the
        # duplicate-source-match refusal rides the matched-files scan
        # itself — max source-key multiplicity per touched file in the
        # SAME job — instead of a separate source aggregate per merge.
        fuse_ambiguity = (
            keys_preexist
            and not pending_adds
            and not pending_widens
            and not base.get("delete_vectors")
        )
        if keys_preexist:
            target_keys = self._read_files(base, candidates).select(*on)
            if not fuse_ambiguity:
                dup_keys = (
                    source.groupBy(*on)
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .filter(F.col("__n") > 1)
                    .drop("__n")
                )
                if dup_keys.limit(1).count() and (
                    dup_keys.join(
                        target_keys, on, "left_semi"
                    ).limit(1).count()
                ):
                    raise ValueError(
                        "VersionedTable.merge: a target row matches "
                        "multiple source rows — reduce the source to "
                        "one row per key first (latest-wins is "
                        "upsert's job)"
                    )

        if pending_adds or pending_widens:
            # every refusal above has passed — land the metadata-only
            # evolution commits, then re-read the head so the merge
            # plans against the evolved schema
            for _n, _dt in pending_adds:
                self.add_column(_n, _dt)
            for _n, _dt in pending_widens:
                self.widen_column(_n, _dt)
            parent = self.head_version()
            ptr = self._read_pointer(parent)
            base = self._resolve(ptr)
            schema = self._manifest_schema(base)
            types = {f.name: f.dataType for f in schema.fields}
            candidates = (
                base["files"]
                if by_source
                else self._keyed_candidate_files(base, on, src_keys)
            )
            self.last_merge_scan_files = (
                len(candidates),
                len(base["files"]),
            )
            # the evolved snapshot NULL-fills the added columns, so
            # key projection is always well-defined from here
            target_keys = self._read_files(base, candidates).select(*on)

        # files to rewrite: project file identity AT THE SCAN (valid
        # there, unlike post-shuffle input_file_name), then semi-join
        # the source keys
        from urllib.parse import unquote, urlparse

        if fuse_ambiguity:
            # one job returns the touched files AND the ambiguity
            # verdict: a target row matching a key with source
            # multiplicity > 1 is exactly the refusal condition (the
            # inner join against per-key counts never multiplies rows
            # — one count row per key; null keys never match, as with
            # the semi join)
            per_file = (
                self._read_files(base, candidates, apply_dvs=False)
                .select(F.input_file_name().alias("__f"), *on)
                .join(
                    source.groupBy(*on).agg(
                        F.count(F.lit(1)).alias("__n")
                    ),
                    on,
                    "inner",
                )
                .groupBy("__f")
                .agg(F.max("__n").alias("__mx"))
                .collect()
            )
            if any(r["__mx"] > 1 for r in per_file):
                raise ValueError(
                    "VersionedTable.merge: a target row matches "
                    "multiple source rows — reduce the source to one "
                    "row per key first (latest-wins is upsert's job)"
                )
            matched_rows = per_file
        else:
            matched_rows = (
                self._read_files(base, candidates, apply_dvs=False)
                .select(F.input_file_name().alias("__f"), *on)
                .join(src_keys, on, "left_semi")
                .select("__f")
                .distinct()
                .collect()
            )
        touched = {unquote(urlparse(r["__f"]).path) for r in matched_rows}
        if by_source:
            # a NOT MATCHED BY SOURCE clause also rewrites every file
            # holding an UNMATCHED row the clause fires for: an
            # unconditional by-source update/delete touches every file
            # with any unmatched row (the sync-to-source shape), a
            # conditional delete only the files where the condition
            # holds — COW granularity is preserved
            bs_scan = (
                self._read_files(base, base["files"], apply_dvs=False)
                .select(F.input_file_name().alias("__f"), "*")
                .alias("t")
                .join(src_keys, on, "left_anti")
            )
            if (
                when_not_matched_by_source_update is None
                and when_not_matched_by_source_delete is not None
            ):
                bs_scan = bs_scan.filter(
                    F.coalesce(
                        F.expr(when_not_matched_by_source_delete),
                        F.lit(False),
                    )
                )
            touched |= {
                unquote(urlparse(r["__f"]).path)
                for r in bs_scan.select("__f").distinct().collect()
            }
        touched_files = [f for f in base["files"] if f in touched]
        kept_files = [f for f in base["files"] if f not in touched]

        # rewritten rows: matched targets take the delete/update
        # clauses; unmatched rows in touched files carry unchanged
        # (COW) or stay in place behind the deletion vector (MoR)
        marked_src = source.select(
            source["*"], F.lit(True).alias("__s_hit")
        ).alias("s")
        new_frames = []
        cdc_frames: list = []
        dv_rows = None
        joined_cache = None
        # ADVICE r12: every joined-derived action (clause builds,
        # post-image count/write, vector + CDC writes, constraint
        # checks) runs under try/except so an in-plan failure can
        # never strand the persisted join's blocks in a long
        # session — the exact degradation the r5 comment warns of.
        try:
            if touched_files:
                t_rows = self._read_files(
                    base, touched_files, with_pos=mor
                ).alias("t")
                cond = None
                for c in on:
                    # PLAIN equality, never null-safe: SQL MERGE semantics
                    # say NULL keys match nothing — a NULL-keyed source row
                    # falls through to the not-matched (insert) clause, and
                    # a NULL-keyed target row is never updated/deleted.
                    # (eqNullSafe here would also contradict the find-files
                    # semi-join, which uses null-unsafe equality — r9
                    # self-review.)
                    eq = F.col(f"t.{c}") == F.col(f"s.{c}")
                    cond = eq if cond is None else cond & eq
                joined = t_rows.join(marked_src, cond, "left")
                if mor:
                    # the joined scan feeds up to FOUR actions in MoR mode
                    # (post-image probe + write, vector probe + write,
                    # plus CDC on CDF tables) — persist it once instead of
                    # re-running the candidate scan per action; bounded by
                    # the candidate files' rows (MoR targets point-keyed
                    # low-selectivity merges, and MEMORY_AND_DISK spills
                    # if a wide candidate set does not fit). Released
                    # before the commit loop.
                    joined = joined.persist()
                    joined_cache = joined
                is_matched = F.col("__s_hit").isNotNull()
                take_delete = (
                    is_matched
                    & F.coalesce(F.expr(when_matched_delete), F.lit(False))
                    if when_matched_delete is not None
                    else F.lit(False)
                )
                # Delta clause-order semantics on the by-source side too:
                # delete evaluated before update over the UNMATCHED rows
                take_bs_delete = (
                    ~is_matched
                    & F.coalesce(
                        F.expr(when_not_matched_by_source_delete), F.lit(False)
                    )
                    if when_not_matched_by_source_delete is not None
                    else F.lit(False)
                )
                take_bs_update = (
                    ~is_matched & ~take_bs_delete
                    if when_not_matched_by_source_update
                    else F.lit(False)
                )
                if when_not_matched_by_source_update and (
                    when_not_matched_by_source_update_condition is not None
                ):
                    take_bs_update = take_bs_update & F.coalesce(
                        F.expr(
                            when_not_matched_by_source_update_condition
                        ),
                        F.lit(False),
                    )

                def _bs_upd(name):
                    t = types[name].simpleString()
                    return F.expr(
                        self._strict_cast_sql(
                            when_not_matched_by_source_update[name],
                            t,
                            "VersionedTable.merge: by-source update "
                            f"of column '{name}' does not fit type "
                            f"{t} for value '",
                        )
                    )

                def _upd(name):
                    t = types[name].simpleString()
                    return F.expr(
                        self._strict_cast_sql(
                            when_matched_update[name],
                            t,
                            "VersionedTable.merge: update of column "
                            f"'{name}' does not fit type {t} for "
                            "value '",
                        )
                    )

                take_update = (
                    is_matched & ~take_delete
                    if when_matched_update
                    else F.lit(False)
                )
                if when_matched_update and (
                    when_matched_update_condition is not None
                ):
                    # Delta conditional-clause semantics: a matched row
                    # failing the condition is NOT taken — it carries
                    # unchanged (COW) / stays un-vectored (MoR), and
                    # produces no CDC images
                    take_update = take_update & F.coalesce(
                        F.expr(when_matched_update_condition),
                        F.lit(False),
                    )
                def _out_col(f):
                    e = F.col(f"t.{f.name}")
                    if (
                        when_not_matched_by_source_update
                        and f.name in when_not_matched_by_source_update
                    ):
                        e = F.when(take_bs_update, _bs_upd(f.name)).otherwise(e)
                    if when_matched_update and f.name in when_matched_update:
                        e = F.when(take_update, _upd(f.name)).otherwise(e)
                    return e.alias(f.name)

                if mor:
                    # MoR: every clause-taken row's PRE-image is hidden by
                    # the vector; only update POST-images become new rows
                    # (deletes contribute nothing, carry-through rows stay
                    # physically where they are)
                    affected = (
                        take_delete
                        | take_update
                        | take_bs_delete
                        | take_bs_update
                    )
                    dv_rows = joined.filter(affected).select(
                        F.col(f"t.{self._DV_FILE}").alias(self._DV_FILE),
                        F.col(f"t.{self._DV_POS}").alias(self._DV_POS),
                    )
                    new_frames.append(
                        joined.filter(take_update | take_bs_update).select(
                            *[_out_col(f) for f in schema.fields]
                        )
                    )
                else:
                    rewritten = joined.filter(
                        ~take_delete & ~take_bs_delete
                    ).select(*[_out_col(f) for f in schema.fields])
                    new_frames.append(rewritten)
                if base.get("cdf"):
                    # classify this commit's row-level changes from the
                    # SAME join (CDF tables record merge changes at commit
                    # time, completing the Delta-CDF DML matrix)
                    t_cols = [
                        F.col(f"t.{f.name}").alias(f.name)
                        for f in schema.fields
                    ]
                    cdc_frames.append(
                        joined.filter(take_delete | take_bs_delete).select(
                            *t_cols, F.lit("delete").alias("_change_type")
                        )
                    )
                    if when_not_matched_by_source_update:
                        bs_rows = joined.filter(take_bs_update)
                        cdc_frames.append(
                            bs_rows.select(
                                *t_cols,
                                F.lit("update_preimage").alias("_change_type"),
                            )
                        )
                        cdc_frames.append(
                            bs_rows.select(
                                *[
                                    (
                                        _bs_upd(f.name).alias(f.name)
                                        if f.name
                                        in when_not_matched_by_source_update
                                        else F.col(f"t.{f.name}").alias(f.name)
                                    )
                                    for f in schema.fields
                                ],
                                F.lit("update_postimage").alias("_change_type"),
                            )
                        )
                    if when_matched_update:
                        upd_rows = joined.filter(take_update)
                        cdc_frames.append(
                            upd_rows.select(
                                *t_cols,
                                F.lit("update_preimage").alias("_change_type"),
                            )
                        )
                        cdc_frames.append(
                            upd_rows.select(
                                *[
                                    (
                                        _upd(f.name).alias(f.name)
                                        if f.name in when_matched_update
                                        else F.col(f"t.{f.name}").alias(f.name)
                                    )
                                    for f in schema.fields
                                ],
                                F.lit("update_postimage").alias("_change_type"),
                            )
                        )

            if when_not_matched_insert is not None:
                unmatched_src = source.alias("s").join(
                    target_keys, on, "left_anti"
                )
                if when_not_matched_insert_condition is not None:
                    # Delta's WHEN NOT MATCHED AND <cond> THEN INSERT:
                    # unmatched source rows failing the condition are
                    # simply not inserted (evaluated over s.* only —
                    # the t.-reference refusal ran up front)
                    unmatched_src = unmatched_src.filter(
                        F.coalesce(
                            F.expr(when_not_matched_insert_condition),
                            F.lit(False),
                        )
                    )
                def _id_alloc_sql(name):
                    # identity allocation for MERGE inserts (r15):
                    # the same per-partition-range formula append
                    # uses, evaluated over the unmatched-source frame
                    spec = id_map[name]
                    return (
                        f"CAST({int(spec['high'])} + {int(spec['step'])}"
                        " * (monotonically_increasing_id() + 1)"
                        " AS BIGINT)"
                    )

                # insert expressions as SQL TEXT (r16): each column's
                # strict cast parses in one F.expr instead of ~12 py4j
                # Column calls — same resolved tree
                if when_not_matched_insert == "*":
                    src_cols = set(source.columns)
                    ins_exprs = {
                        f.name: (
                            _id_alloc_sql(f.name)
                            if f.name in id_map
                            else f"s.`{f.name}`"
                            if f.name in src_cols
                            else "NULL"
                        )
                        for f in schema.fields
                    }
                elif isinstance(when_not_matched_insert, dict):
                    unknown = set(when_not_matched_insert) - set(types)
                    if unknown:
                        raise ValueError(
                            "VersionedTable.merge: insert assigns unknown "
                            f"column(s) {sorted(unknown)}"
                        )
                    ins_exprs = {
                        f.name: (
                            _id_alloc_sql(f.name)
                            if f.name in id_map
                            else when_not_matched_insert[f.name]
                            if f.name in when_not_matched_insert
                            else "NULL"
                        )
                        for f in schema.fields
                    }
                else:
                    raise ValueError(
                        "VersionedTable.merge: when_not_matched_insert must "
                        "be '*', a column->expression dict, or None"
                    )

                def _ins(name):
                    t = types[name].simpleString()
                    return F.expr(
                        self._strict_cast_sql(
                            ins_exprs[name],
                            t,
                            "VersionedTable.merge: insert into column "
                            f"'{name}' does not fit type {t} for "
                            "value '",
                        )
                    )

                if gen_cols:
                    # GENERATED columns (r13): dict-form inserts never
                    # name them (refused up front) and "*"-form may or
                    # may not carry them in the source. Two phases:
                    # project the regular columns (plus any source-
                    # supplied generated values) into TARGET names,
                    # then compute-or-validate the generated ones over
                    # that projection — generation expressions
                    # reference target column names, which only exist
                    # after the first projection.
                    src_cols_set = set(source.columns)
                    supplied = (
                        {c for c in gen_cols if c in src_cols_set}
                        if when_not_matched_insert == "*"
                        else set()
                    )
                    first = unmatched_src.select(
                        *[
                            _ins(f.name).alias(f.name)
                            for f in schema.fields
                            if f.name not in gen_cols or f.name in supplied
                        ]
                    )
                    computed = self._apply_generated(first, gen_cols)

                    def _gen_cast(name):
                        # computed values strict-cast to the column
                        # type — the _ins contract (no silent NULLs)
                        val = F.col(name)
                        casted = val.cast(types[name])
                        return F.when(
                            val.isNotNull() & casted.isNull(),
                            F.raise_error(
                                F.lit(
                                    "VersionedTable.merge: generated "
                                    f"column '{name}' expression does "
                                    "not fit type "
                                    f"{types[name].simpleString()}"
                                )
                            ).cast(types[name]),
                        ).otherwise(casted)

                    inserts = computed.select(
                        *[
                            (
                                _gen_cast(f.name)
                                if f.name in gen_cols
                                else F.col(f.name)
                            ).alias(f.name)
                            for f in schema.fields
                        ]
                    )
                else:
                    inserts = unmatched_src.select(
                        *[_ins(f.name).alias(f.name) for f in schema.fields]
                    )
                new_frames.append(inserts)
                if base.get("cdf"):
                    cdc_frames.append(
                        inserts.select(
                            "*", F.lit("insert").alias("_change_type")
                        )
                    )

            if not new_frames:
                return parent
            combined = new_frames[0]
            for fr in new_frames[1:]:
                combined = combined.unionByName(fr)
            partition_by = base.get("partition_by")
            n_new = None
            if mor:
                # MoR writes ONLY changed/inserted rows — count them (one
                # bounded job over the persisted join + source anti-join;
                # it doubles as the emptiness gate) and size the files
                # explicitly (COW keeps its rewrite partitioning: its
                # output is touched-file-sized already)
                n_new = combined.count()
                combined = self._mor_shuffle(
                    combined, partition_by, base.get("bucket_by"), n_new
                )
            v = parent + 1
            if mor:
                # the MoR count above doubles as the emptiness gate
                new_files = (
                    self._write_data(
                        combined, v, partition_by, base.get("bucket_by")
                    )
                    if n_new
                    else []
                )
            else:
                # write-first (r16, drop_if_empty): the old limit(1)
                # probe executed the union-of-joins rewrite plan once
                # for the gate and again for the write
                new_files = self._write_data(
                    combined,
                    v,
                    partition_by,
                    base.get("bucket_by"),
                    drop_if_empty=True,
                )
            if not touched_files and not new_files:
                return parent  # nothing matched, nothing inserted
            dv_dir = None
            dv_touched: set = set()
            if mor and dv_rows is not None:
                # write FIRST, emptiness-check from the written
                # footers (r15, same shape as _write_cdc_if_any): the
                # old limit(1) probe executed the vector plan once and
                # the write executed it again
                dv_dir = f"{self.path}/dv/b{v:08d}-{uuid.uuid4().hex[:8]}"
                apply_light_committer(
                    dv_rows.write.mode("error"), self.spark
                ).parquet(dv_dir)
                if self._dir_num_rows(dv_dir) == 0:
                    if self._local:
                        import shutil

                        shutil.rmtree(dv_dir, ignore_errors=True)
                    else:
                        self._fs.delete(self._P(dv_dir), True)
                    dv_dir = None
                else:
                    # the files this vector names — the rebase guards
                    # exactly these (file, position) keys, like
                    # delete(mor); read over the (bounded) written dir
                    dv_touched = {
                        unquote(urlparse(r[0]).path)
                        for r in self.spark.read.parquet(dv_dir)
                        .select(self._DV_FILE)
                        .distinct()
                        .collect()
                    }
            if mor and dv_dir is None and not new_files:
                # every clause hit was already vector-hidden and nothing
                # inserted: no empty commits (the COW twin's contract)
                if joined_cache is not None:
                    joined_cache.unpersist()
                return parent
            cdc_dir = None
            if cdc_frames:
                cdc = cdc_frames[0]
                for fr in cdc_frames[1:]:
                    cdc = cdc.unionByName(fr)
                # a clause set can legitimately change zero rows (e.g. an
                # insert-only merge whose source keys all matched) —
                # the footer-count guard in _write_cdc_if_any keeps the
                # commit change-free without re-running the CDC plan
                cdc_dir = self._write_cdc_if_any(cdc, v)
            if joined_cache is not None:
                # every joined-derived action (post-images, vector, CDC)
                # has run — release before the commit loop (battery
                # hygiene: retained blocks degrade long sessions, r5)
                joined_cache.unpersist()
        except BaseException:
            if joined_cache is not None:
                joined_cache.unpersist()
            raise
        stats_cols = base.get("stats_cols") or []
        id_alloc_cols = (
            sorted(id_map)
            if id_map and when_not_matched_insert is not None
            else []
        )
        id_marks = (
            self._identity_watermark(new_files, id_map, id_alloc_cols)
            if id_alloc_cols and new_files
            else {}
        )
        new_stats = (
            self._collect_stats(new_files, stats_cols, base.get("bloom"))
            if "segments" not in ptr
            and (stats_cols or base.get("bloom"))
            and new_files
            else {}
        )
        new_parts = (
            self._partition_values(new_files, partition_by)
            if "segments" not in ptr and partition_by
            else {}
        )
        new_segs = None
        checked = False
        for _ in range(10):
            v = parent + 1
            m = {
                "version": v,
                "parent": parent,
                "op": "merge",
                "merge_on": list(on),
                "schema": base["schema"],
                "schema_json": base.get("schema_json"),
                "mixed": bool(base.get("mixed")),
                "txn": txn,
                "txns": self._txns_after(base, txn),
                # from the REBASED head, not the pre-race capture: an
                # analyze winner may have extended the index config
                "stats_cols": base.get("stats_cols") or [],
                "bloom": base.get("bloom"),
                "partition_by": partition_by,
                "constraints": base.get("constraints") or {},
            }
            if mor:
                m["mode"] = "mor"
            if mor and dv_dir:
                m["delete_vectors"] = (
                    base.get("delete_vectors") or []
                ) + [dv_dir]
            elif base.get("delete_vectors"):
                # rewritten files dropped their DV'd rows physically;
                # kept files still need the vectors applied at read
                # time
                m["delete_vectors"] = base["delete_vectors"]
            if "segments" in ptr:
                # MoR keeps every parent segment BY NAME (zero file
                # AND zero metadata rewrite); COW drops touched files
                segs = (
                    list(ptr["segments"])
                    if mor
                    else self._segments_without(ptr, touched)
                )
                if new_files:
                    if new_segs is None:
                        new_segs = self._build_segments(
                            new_files,
                            stats_cols,
                            partition_by,
                            base.get("bloom"),
                        )
                    segs.extend(new_segs)
                m["segments"] = segs
                m["n_files"] = (
                    ptr["n_files"] if mor else len(kept_files)
                ) + len(new_files)
            elif mor:
                m["files"] = sorted(base["files"] + new_files)
                m["stats"] = {**(base.get("stats") or {}), **new_stats}
                m["parts"] = {**(base.get("parts") or {}), **new_parts}
            else:
                kept_set = set(kept_files)
                m["files"] = sorted(kept_files + new_files)
                m["stats"] = {
                    **{
                        f: s
                        for f, s in (base.get("stats") or {}).items()
                        if f in kept_set
                    },
                    **new_stats,
                }
                m["parts"] = {
                    **{
                        f: p
                        for f, p in (base.get("parts") or {}).items()
                        if f in kept_set
                    },
                    **new_parts,
                }
            m = self._carry_mapping(m, base)
            if id_marks:
                m["identity"] = self._bump_identity(
                    ptr.get("identity") or id_map, id_marks
                )
            if mor and dv_dir:
                self._add_feature(m, "dv")
            if cdc_dir:
                m["cdc"] = cdc_dir
            if not checked:
                # updates and inserts can both push rows outside a
                # CHECK; new files carry no deletion vectors, so skip
                # the DV anti-join
                self._check_constraints(
                    new_files, {**m, "delete_vectors": []}
                )
                checked = True
            if self._try_commit(m, v):
                return v
            # CAS lost. The r11 file-granularity rules, merge form: a
            # winner commutes iff it neither touched a file this merge
            # rewrote (every source-key MATCH lives in one of those)
            # nor added rows that join the SOURCE on the merge keys
            # (null-unsafe, the merge contract) — such a row would
            # have been a MATCH this merge mis-classified as absent.
            # One bounded semi-join over just the winners' added
            # files decides; any other race raises.
            def _stale_if_key_match(df: DataFrame):
                if by_source:
                    # a by-source clause classifies EVERY target row,
                    # so any row the span added is a row this merge
                    # never considered — matched or not
                    if df.limit(1).count():
                        return (
                            "raced a commit that added rows — a NOT "
                            "MATCHED BY SOURCE clause classifies every "
                            "row, so the change set is stale; re-run"
                        )
                    return None
                hit = df.select(*on).join(src_keys, list(on), "left_semi")
                if hit.limit(1).count():
                    return (
                        "raced a commit whose added rows match the "
                        "source keys — the computed change set "
                        "mis-classifies them; re-run against the new "
                        "head"
                    )
                return None

            parent, ptr, base = self._rebase_over_disjoint(
                parent,
                ptr,
                base,
                "merge(mor)" if mor else "merge",
                dv_touched if mor else touched,
                _stale_if_key_match,
            )
            if id_alloc_cols and (ptr.get("identity") or {}) != id_map:
                raise ConcurrentWriteError(
                    "VersionedTable: merge raced a commit that "
                    "advanced the identity watermark; the staged "
                    "inserted ids are stale — re-run"
                )
            kept_files = [f for f in base["files"] if f not in touched]
        raise ConcurrentWriteError(
            "VersionedTable: merge lost 10 CAS races"
        )

    def update(
        self,
        predicate: str,
        assignments: dict[str, str],
        txn: str | None = None,
        prune: list[tuple] | None = None,
        verify_prune: bool = False,
        mode: str = "cow",
    ) -> int:
        """Row-level UPDATE as COPY-ON-WRITE — the DML sibling of
        :meth:`delete` (Delta UPDATE pattern): for every row where
        ``predicate`` is TRUE, each ``assignments`` column is replaced
        by its SQL expression (evaluated against the row's PRE-update
        values, standard UPDATE semantics); FALSE/NULL rows are kept
        unchanged. Only files containing matching rows are rewritten —
        untouched files carry over byte-identical. Every assigned
        expression is cast to the column's existing type (an UPDATE
        can never drift the table schema) — STRICTLY: an assignment
        value the cast cannot represent raises in-plan rather than
        silently writing NULL into rewritten rows (ADVICE r8; the
        session pins ANSI off, under which a bare ``.cast`` nulls like
        ``try_cast``, so the guard is the same in-plan raise
        ``cast_columns(strict=True)`` uses). Commit is op ``update``;
        like :meth:`delete` it COMMUTES with concurrent appends and
        DISJOINT rewrites whose rows provably miss the predicate
        (r11, file-granularity conflict rules) and raises on any
        other race. ``read_changes`` refuses ranges
        crossing it. Returns the new version, or the current version
        unchanged if no row matched. ``prune``: optional
        predicate-implied range conjuncts that let manifest metadata
        narrow the find-scan itself (see :meth:`_touched_files`).
        ``mode='mor'`` takes the merge-on-read path instead
        (:meth:`_update_mor`): deletion vector over the pre-images,
        post-images as new files, zero data files rewritten."""
        if mode not in ("cow", "mor"):
            raise ValueError(
                f"VersionedTable.update: unknown mode {mode!r} — "
                "expected 'cow' (copy-on-write rewrite) or 'mor' "
                "(deletion vector + new-rows-only files)"
            )
        if mode == "mor":
            return self._update_mor(
                predicate, assignments, txn, prune, verify_prune
            )
        parent = self.head_version()
        ptr = self._read_pointer(parent)
        base = self._resolve(ptr)
        schema = self._manifest_schema(base)
        if schema is None:
            raise ValueError(
                "VersionedTable.update: legacy manifest without "
                "schema_json cannot type-check assignments"
            )
        types = {f.name: f.dataType for f in schema.fields}
        unknown = set(assignments) - set(types)
        if unknown:
            raise ValueError(
                f"VersionedTable.update: assignment to unknown "
                f"column(s) {sorted(unknown)}; table columns are "
                f"{sorted(types)}"
            )
        self._refuse_generated_assignment(base, set(assignments), "update")
        touched_files = self._touched_files(
            base, predicate, prune, verify_prune
        )
        touched = set(touched_files)
        if not touched_files:
            return parent
        kept_files = [f for f in base["files"] if f not in touched]
        hit = F.coalesce(F.expr(predicate), F.lit(False))

        def _assigned(name):
            """The assignment expression strict-cast to the column's
            type: a non-NULL value the cast cannot represent raises
            in-plan (never a silent NULL — ADVICE r8)."""
            t = types[name].simpleString()
            return F.expr(
                self._strict_cast_sql(
                    assignments[name],
                    t,
                    "VersionedTable.update: assignment to column "
                    f"'{name}' does not fit type {t} for value '",
                )
            )

        rewritten = self._read_files(base, touched_files).select(
            *[
                (
                    F.when(hit, _assigned(f.name))
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                    if f.name in assignments
                    else F.col(f.name)
                )
                for f in schema.fields
            ]
        )
        cdc_dir = None
        if base.get("cdf"):
            pre = self._read_files(base, touched_files).filter(hit)
            post = pre.select(
                *[
                    _assigned(f.name).alias(f.name)
                    if f.name in assignments
                    else F.col(f.name)
                    for f in schema.fields
                ]
            )
            # same empty guard as merge/delete: every match may be
            # DV-hidden (the find-scan over-approximates), and an
            # empty parquet dir breaks the feed's schema inference.
            # Write-first (r16): the old limit(1) probe executed the
            # filtered touched-file scan once and the write executed
            # pre AND post again; _write_cdc_if_any executes once and
            # reads emptiness from the written footers.
            cdc_dir = self._write_cdc_if_any(
                pre.select(
                    "*", F.lit("update_preimage").alias("_change_type")
                ).unionByName(
                    post.select(
                        "*",
                        F.lit("update_postimage").alias("_change_type"),
                    )
                ),
                parent + 1,
            )
        partition_by = base.get("partition_by")
        new_files = self._write_data(
            rewritten, parent + 1, partition_by, base.get("bucket_by")
        )
        stats_cols = base.get("stats_cols") or []
        new_stats = (
            self._collect_stats(new_files, stats_cols, base.get("bloom"))
            if "segments" not in ptr and (stats_cols or base.get("bloom"))
            else {}
        )
        new_parts = (
            self._partition_values(new_files, partition_by)
            if "segments" not in ptr and partition_by
            else {}
        )
        new_segs = None
        checked = False
        for _ in range(10):
            v = parent + 1
            kept_set = set(kept_files)
            m = {
                "version": v,
                "parent": parent,
                "op": "update",
                "predicate": predicate,
                "schema": base["schema"],
                "schema_json": base.get("schema_json"),
                "mixed": bool(base.get("mixed")),
                "txn": txn,
                "txns": self._txns_after(base, txn),
                # from the REBASED head, not the pre-race capture: an
                # analyze winner may have extended the index config
                "stats_cols": base.get("stats_cols") or [],
                "bloom": base.get("bloom"),
                "partition_by": partition_by,
                "constraints": base.get("constraints") or {},
            }
            if base.get("delete_vectors"):
                # rewritten files dropped their DV'd rows physically;
                # kept files still need the vectors applied at read
                # time
                m["delete_vectors"] = base["delete_vectors"]
            if "segments" in ptr:
                if new_segs is None:
                    new_segs = self._build_segments(
                        new_files, stats_cols, partition_by, base.get("bloom")
                    )
                m["segments"] = (
                    self._segments_without(ptr, touched) + new_segs
                )
                m["n_files"] = len(kept_files) + len(new_files)
            else:
                m["files"] = sorted(kept_files + new_files)
                m["stats"] = {
                    **{
                        f: s
                        for f, s in (base.get("stats") or {}).items()
                        if f in kept_set
                    },
                    **new_stats,
                }
                m["parts"] = {
                    **{
                        f: p
                        for f, p in (base.get("parts") or {}).items()
                        if f in kept_set
                    },
                    **new_parts,
                }
            m = self._carry_mapping(m, base)
            if cdc_dir:
                m["cdc"] = cdc_dir
            if not checked:
                # assignments can push rows outside a CHECK constraint;
                # the rewritten files carry no deletion vectors — skip
                # the anti-join
                self._check_constraints(new_files, {**m, "delete_vectors": []})
                checked = True
            if self._try_commit(m, v):
                return v
            # same file-granularity rules as delete (r11): appends and
            # disjoint rewrites whose rows miss the predicate commute;
            # anything else raises
            parent, ptr, base = self._rebase_over_disjoint(
                parent,
                ptr,
                base,
                "update",
                touched,
                self._stale_if_predicate_match(predicate),
            )
            kept_files = [f for f in base["files"] if f not in touched]
        raise ConcurrentWriteError(
            "VersionedTable: update lost 10 CAS races"
        )

    def optimize(
        self,
        target_files: int = 1,
        recluster_by: str | None = None,
        zorder_by: list[str] | None = None,
        max_retries: int = 10,
        where: list[tuple] | None = None,
    ) -> int:
        """Small-file compaction as a snapshot rewrite (the
        Delta/Iceberg OPTIMIZE pattern): re-lay the head's rows into
        ``target_files`` files — range-clustered on ``recluster_by``
        when given (re-tightening stats bounds for pruning),
        Z-ORDER-clustered on ``zorder_by`` (2-4 columns bit-interleaved
        via ``warehouse.zorder_value`` — Delta's OPTIMIZE ZORDER BY:
        every output file bounds a small min/max rectangle in ALL the
        clustered dimensions, so manifest-stats pruning skips files for
        predicates on ANY of them), hash-laid
        otherwise — and commit op ``optimize``. Content is unchanged
        (reads before and after are identical); what changes is the
        FILE GEOMETRY: a long append chain accumulates many small
        files, and at 100 TB open/seek overhead on thousands of tiny
        files dominates scans long before data volume does. Old
        versions still time-travel to the fragmented layout until
        vacuumed.

        CONCURRENCY: optimize COMMUTES with appends AND with DISJOINT
        rewrites (r11 file-granularity rules), exactly like Delta's —
        compaction must never abort ingest or predicate DML on other
        files. A lost CAS race rebases HEAD-relative: the new manifest
        is the winning head's files minus the compacted ones plus
        their replacement, so winners' appends and disjoint DML carry
        through by construction. Only a winner that removed or
        vectored a COMPACTED file (or a table-wide/metadata commit)
        raises — the compacted content is then stale.

        ``where`` SCOPES the compaction (r11 — Delta's ``OPTIMIZE
        table WHERE ...``): a list of range conjuncts ``(col, lo,
        hi)`` — the prune-hint form :meth:`delete` uses — selects only
        the files whose manifest stats/partition values overlap; every
        other file carries over byte-identical. At 100 TB this is the
        ONLY form maintenance can take: yesterday's fragmented ingest
        partition compacts (or Z-orders) in O(partition), cold
        partitions are never rewritten. Files without stats for a
        scoped column are conservatively INCLUDED (compacting more
        than asked is always safe). Deletion vectors: rows of scoped
        files fold in physically; vectors survive for the untouched
        files (their entries for vanished files are inert). A scope
        matching zero files returns the current version unchanged."""
        if recluster_by is not None and zorder_by:
            raise ValueError(
                "VersionedTable.optimize: recluster_by and zorder_by "
                "are mutually exclusive clusterings"
            )
        parent = self.head_version()
        base_ptr = self._read_pointer(parent)
        base = self._resolve(base_ptr)
        if where:
            touched_files = self._kept_files_all(base, list(where))
            if not touched_files:
                return parent  # scope matches nothing: no empty commits
        else:
            touched_files = base["files"]
        touched = set(touched_files)
        untouched = [f for f in base["files"] if f not in touched]
        df = self._read_files(base, touched_files)
        if zorder_by:
            from social_media_etl_spark.operators.warehouse import (
                zorder_value,
            )

            df = (
                zorder_value(df, zorder_by)
                .repartitionByRange(target_files, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif recluster_by is not None:
            df = df.repartitionByRange(
                target_files, recluster_by
            ).sortWithinPartitions(recluster_by)
        else:
            df = df.repartition(target_files)
        partition_by = base.get("partition_by")
        files = self._write_data(
            df, parent + 1, partition_by, base.get("bucket_by")
        )
        stats_cols = base.get("stats_cols") or []
        if "segments" in base_ptr:
            new_stats = new_parts = {}
            compacted_segs = self._build_segments(
                files, stats_cols, partition_by, base.get("bloom")
            )
        else:
            new_stats = (
                self._collect_stats(files, stats_cols, base.get("bloom"))
                if stats_cols or base.get("bloom")
                else {}
            )
            new_parts = (
                self._partition_values(files, partition_by)
                if partition_by
                else {}
            )
            compacted_segs = None
        compacted_parent = parent
        head_ptr, head_m = base_ptr, base
        for _ in range(max_retries):
            head = self.head_version()
            if head != compacted_parent:
                # file-granularity rebase (r11): optimize commutes with
                # appends AND with DISJOINT rewrites — any winner that
                # left the compacted files alone. A content-identical
                # rewrite has no change set for added rows to stale
                # (is_stale → None); a winner that removed or vectored
                # a compacted file raises (the compacted content is
                # then stale and must be recomputed).
                head, head_ptr, head_m = self._rebase_over_disjoint(
                    compacted_parent,
                    base_ptr,
                    base,
                    "optimize",
                    touched,
                    lambda df: None,
                )
            v = head + 1
            m = {
                "version": v,
                "parent": head,
                "op": "optimize",
                # appends may have evolved the schema; the rebase keeps
                # the HEAD's logical schema (compacted files are then a
                # pre-evolution physical layout → mixed)
                "schema": head_ptr["schema"],
                "schema_json": head_ptr.get("schema_json"),
                "txns": self._txns_after(head_ptr, None),
                # from the REBASED head, not the pre-race capture: an
                # analyze winner may have extended the index config
                "stats_cols": head_ptr.get("stats_cols") or [],
                "bloom": head_ptr.get("bloom"),
                "partition_by": partition_by,
                # content-identical rewrite of already-valid rows
                "constraints": head_ptr.get("constraints") or {},
            }
            m = self._carry_mapping(m, head_ptr)
            # assembly is HEAD-relative: the new snapshot is the head's
            # files minus the compacted ones plus their replacement —
            # winners' appends AND disjoint rewrites carry through
            # by construction (their files are simply "kept")
            if compacted_segs is not None:
                kept_segs = self._segments_without(head_ptr, touched)
                m["segments"] = kept_segs + compacted_segs
                # touched ⊆ head files (the rebase proved no winner
                # removed one), so the kept count is exact arithmetic
                m["n_files"] = head_ptr["n_files"] - len(touched) + len(files)
                kept_any = head_ptr["n_files"] > len(touched)
                m["mixed"] = (kept_any and bool(head_ptr.get("mixed"))) or (
                    bool(files) and head_ptr["schema"] != base["schema"]
                )
            else:
                head_stats = head_m.get("stats") or {}
                head_parts = head_m.get("parts") or {}
                kept = [f for f in head_m["files"] if f not in touched]
                m["files"] = sorted(kept + files)
                kept_any = bool(kept)
                m["mixed"] = (kept_any and bool(head_m.get("mixed"))) or (
                    bool(files) and head_m["schema"] != base["schema"]
                )
                m["stats"] = {
                    **{f: head_stats[f] for f in kept if f in head_stats},
                    **new_stats,
                }
                m["parts"] = {
                    **{f: head_parts[f] for f in kept if f in head_parts},
                    **new_parts,
                }
            if kept_any and head_m.get("delete_vectors"):
                # scoped compaction: the head's vectors still hide rows
                # of the carried-over files; entries for the vanished
                # compacted files are inert (their paths match no
                # scanned row). A winner's NEW vector on a compacted
                # file was already rejected by the rebase.
                m["delete_vectors"] = head_m["delete_vectors"]
            if self._try_commit(m, v):
                return v
        raise ConcurrentWriteError(
            f"VersionedTable: optimize lost {max_retries} CAS races"
        )

    def _drop_view_registration(self, view_path) -> None:
        """DROP the session-catalog table registered over a bucketed
        view dir vacuum is about to sweep (``register_bucketed``
        leaves a ``_registered_as`` marker) — otherwise the catalog
        entry outlives its backing hard links and silently reads
        empty (ADVICE r10). The name may have been re-registered over
        a NEWER snapshot's dir since, so the drop only fires if the
        table's current location is this very dir. View dirs are
        local-FS by construction (register_bucketed refuses remote
        paths), so plain file IO is the right tool here."""
        import os
        from urllib.parse import urlparse

        local = view_path.toUri().getPath()
        try:
            with open(os.path.join(local, "_registered_as")) as fh:
                name = fh.read().strip()
        except OSError:
            return  # pre-marker dir or foreign layout: nothing to drop
        if not name:
            return
        try:
            rows = self.spark.sql(
                f"DESCRIBE TABLE EXTENDED `{name}`"
            ).collect()
        except Exception:
            return  # table already dropped
        loc = next(
            (r[1] for r in rows if r[0] == "Location"), ""
        ) or ""
        if urlparse(loc).path.rstrip("/") == local.rstrip("/"):
            self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")

    def vacuum(
        self,
        keep_last: int = 2,
        min_age_seconds: float = 3600.0,
        dry_run: bool = False,
    ) -> int | list[str]:
        """Delete data directories referenced by NO retained manifest
        (the newest ``keep_last`` versions are retained, and their
        manifests' file lists are the liveness roots — plus every
        REGISTERED CLONE's snapshot, see below). Returns the
        number of directories removed — or, with ``dry_run=True``,
        the list of paths a real run would remove, deleting nothing
        (the shared-file visibility probe VERDICT r11 #4 asks for).
        Old manifests are kept (they
        are tiny); their time travel simply becomes unreadable, as in
        any vacuumed table format. Segment files referenced by ANY
        manifest are kept (they are the manifests' other half); only
        ORPHAN segments — written by a commit that then lost its CAS
        race — are swept, under the same age guard as data
        directories.

        ``min_age_seconds`` is the concurrent-writer guard (ADVICE
        r6): an in-flight append/upsert writes its data directory
        BEFORE entering the commit loop, so an unreferenced-looking
        directory younger than the window may belong to a writer about
        to commit — deleting it would let that writer commit a
        manifest pointing at vanished files, permanently breaking head
        reads. Only directories whose modification time is older than
        the window are deleted (Delta/Iceberg guard their vacuum the
        same way, with hours-to-days defaults). Pass ``0`` only when
        no writer can be concurrent (single-process tests, a paused
        pipeline)."""
        if keep_last < 1:
            raise ValueError(
                "vacuum: keep_last must be >= 1 — retaining zero "
                "versions would delete the head's own data files and "
                "leave every manifest pointing at nothing"
            )
        vs = self.versions()
        keep = vs[-keep_last:]
        # clone back-registry (r12 — VERDICT r11 #4): every registered
        # clone still sharing this table's files makes its cloned-from
        # snapshot a LIVENESS ROOT, so source-vacuum can no longer
        # break clones. A registration whose dest table has vanished
        # auto-expires; one that cannot be checked is kept — unsafe
        # sweeps need proof of death, not absence of proof.
        clone_roots: list[int] = []
        creg = self._P(f"{self.path}/_clones")
        if self._fs.exists(creg):
            for st in self._fs.listStatus(creg):
                cname = st.getPath().getName()
                if not (cname.startswith("c-") and cname.endswith(".json")):
                    continue
                try:
                    rec = self._read_json(str(st.getPath()))
                except Exception:
                    # ADVICE r12 (medium): an unreadable registration
                    # previously counted as "alive" but contributed NO
                    # liveness root, so the clone's shared data/dv dirs
                    # were still swept — permanently breaking the clone.
                    # Unsafe sweeps need proof of death: an unparseable
                    # record is a HARD STOP, not a shrug. (clone() now
                    # writes registrations via temp+rename, so a torn
                    # record here means external damage, not a crash
                    # mid-registration.)
                    raise IOError(
                        f"vacuum: clone registration {st.getPath()} is "
                        "unreadable — a registered clone may share this "
                        "table's data/dv files, and sweeping without its "
                        "liveness root could permanently break it. Repair "
                        "or remove the registration, then re-run."
                    )
                try:
                    alive = bool(
                        VersionedTable(self.spark, rec["dest"]).versions()
                    )
                except Exception:  # pragma: no cover - keep on doubt
                    alive = True
                if not alive:
                    if not dry_run:
                        self._fs.delete(st.getPath(), False)
                    continue
                if rec.get("version") in vs:
                    clone_roots.append(int(rec["version"]))
        roots = sorted(set(keep) | set(clone_roots))
        would: list[str] = []
        live_dirs = set()
        for v in roots:
            for f in self._read_manifest(v)["files"]:
                # liveness root = the commit directory directly under
                # data/ (partitioned layouts nest smetl_pt=<val> dirs
                # below it, so a plain parent-dir split would collect
                # the wrong granularity). Anchor on the "/data/"
                # segment, NOT a self.path prefix: recorded file paths
                # are scheme-stripped (toUri().getPath()) and would
                # miss a scheme-qualified table path, and a wrong
                # fallback here deletes LIVE data (r8 review).
                if "/data/" in f:
                    live_dirs.add(f.rsplit("/data/", 1)[1].split("/", 1)[0])
                else:
                    live_dirs.add(f.rsplit("/", 2)[-2])
        droot = self._P(f"{self.path}/data")
        removed = 0
        now_ms = self._jvm.java.lang.System.currentTimeMillis()

        def _sweep(path, recursive=True):
            nonlocal removed
            if dry_run:
                would.append(str(path))
            else:
                self._fs.delete(path, recursive)
            removed += 1

        if self._fs.exists(droot):
            for st in self._fs.listStatus(droot):
                name = st.getPath().getName()
                age_s = (now_ms - st.getModificationTime()) / 1000.0
                if name not in live_dirs and age_s >= min_age_seconds:
                    _sweep(st.getPath())
        # deletion vectors: keep the dirs any RETAINED manifest
        # references (they are part of those snapshots' read paths);
        # vectors only older versions referenced — or that a lost MoR
        # race left behind — are swept under the same age guard
        live_dv = set()
        for v in roots:
            for d in self._read_pointer(v).get("delete_vectors") or []:
                live_dv.add(d.rstrip("/").rsplit("/", 1)[-1])
        dvroot = self._P(f"{self.path}/dv")
        if self._fs.exists(dvroot):
            for st in self._fs.listStatus(dvroot):
                name = st.getPath().getName()
                age_s = (now_ms - st.getModificationTime()) / 1000.0
                if name not in live_dv and age_s >= min_age_seconds:
                    _sweep(st.getPath())
        # CDC dirs (change-data-feed commits): keep those any RETAINED
        # manifest references; sweep the rest (old versions' records
        # and lost-race orphans) under the same age guard
        live_cdc = set()
        for v in keep:
            c = self._read_pointer(v).get("cdc")
            if c:
                live_cdc.add(c.rstrip("/").rsplit("/", 1)[-1])
        croot = self._P(f"{self.path}/cdc")
        if self._fs.exists(croot):
            for st in self._fs.listStatus(croot):
                name = st.getPath().getName()
                age_s = (now_ms - st.getModificationTime()) / 1000.0
                if name not in live_cdc and age_s >= min_age_seconds:
                    _sweep(st.getPath())
        # bucketed view dirs (register_bucketed): HARD LINKS into data
        # dirs — an old view dir keeps vacuumed bytes alive through
        # its inodes, silently defeating the reclamation above. View
        # dirs are rebuildable caches, so sweep any whose snapshot
        # version is no longer retained, under the same age guard
        # (a just-registered view may still be serving queries).
        vroot = self._P(f"{self.path}/_bucketed_views")
        if self._fs.exists(vroot):
            for st in self._fs.listStatus(vroot):
                name = st.getPath().getName()  # v<NNNNNNNN>-<uuid>
                age_s = (now_ms - st.getModificationTime()) / 1000.0
                try:
                    view_v = int(name.split("-", 1)[0].lstrip("v"))
                except ValueError:  # pragma: no cover - foreign dir
                    continue
                if view_v not in keep and age_s >= min_age_seconds:
                    if not dry_run:
                        self._drop_view_registration(st.getPath())
                    _sweep(st.getPath())
        # orphan segments: lost CAS races leave segment files no
        # pointer references; referenced-by-ANY-manifest segments stay
        # (old versions' metadata remains readable even after their
        # data is vacuumed)
        referenced = set()
        for v in vs:
            referenced.update(self._read_pointer(v).get("segments") or [])
        mdir = self._P(self._manifest_dir())
        if self._fs.exists(mdir):
            for st in self._fs.listStatus(mdir):
                name = st.getPath().getName()
                age_s = (now_ms - st.getModificationTime()) / 1000.0
                if (
                    name.startswith("seg-")
                    and name not in referenced
                    and age_s >= min_age_seconds
                ):
                    _sweep(st.getPath(), recursive=False)
        return would if dry_run else removed
