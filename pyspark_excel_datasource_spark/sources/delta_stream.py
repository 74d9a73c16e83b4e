"""Streaming reader over the Delta transaction log (``pydelta``).

The log IS the offset ledger: a micro-batch is the half-open version
range ``(start, end]``, and its input files are exactly the
``dataChange=true`` ADD actions of those commits — so offsets are
replayable by construction (same range → same files → same rows, the
exactly-once property checkpoint recovery needs), appends stream
incrementally without ever re-listing the table, and compaction
commits (``dataChange=false``, see ``deltalog.optimize``) are invisible
to the stream, exactly as the Delta streaming contract specifies.

Non-append commits mirror the public Delta source options: delete-only
commits (partition/row DELETEs with no adds) fail loudly unless
``ignoreDeletes=true`` skips them; REWRITE commits (removes AND adds —
OVERWRITE/MERGE/row-DELETE rewrites) fail unless ``ignoreChanges=true``
streams their rewritten files (rows may repeat, the documented
trade-off) — skipping only the removes would half-apply the commit. A
mid-stream protocol upgrade fails the batch rather than streaming files
whose rows the reader can no longer interpret.

Scale: one input partition per added data file (at 100 TB a version's
commit lists thousands of files → thousands of parallel tasks); the
worker reads its single parquet file via Arrow and attaches the
partition columns from the log's per-file ``partitionValues`` — no
join, no driver funnel, the driver only ever parses JSON commits.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .deltalog import _list_log, _log_dir, snapshot


@dataclass
class DeltaFilePartition(InputPartition):
    path: str
    partition_values: str  # JSON {col: string|null}
    #: CDF mode: 'insert' | 'delete' and the emitting commit version
    change_type: str = "insert"
    version: int = -1


def _arrow_field_type(dt: T.DataType):
    # Lazy pyarrow (r15, guide §7.3): this module is imported by the
    # per-query STREAMING SOURCE RUNNER process (Spark spawns it fresh,
    # useDaemon=false is hardcoded) just to unpickle the reader, but
    # pyarrow is only used in read() on the daemon-reused executors —
    # keeping it out of module scope trims the runner's cold start.
    import pyarrow as pa

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    raise NotImplementedError(f"pydelta stream: unsupported type {dt}")


def _opt_flag(options: dict, *names: str) -> bool:
    """Case-tolerant boolean option lookup (Spark lowercases option keys
    in some paths); shared by the Delta and Iceberg stream readers."""
    for n in names:
        if n in options:
            return str(options[n]).lower() in ("true", "1")
    return False


def _read_parquet_with_pv(path: str, pv: dict, bound_schema: T.StructType):
    """Worker-side single-file read shared by the Delta and Iceberg
    stream readers: Arrow-scan one parquet file, attach the metadata
    layer's partition values as constant columns, fill nulls for
    pre-schema-evolution columns, and yield record batches."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    tbl = papq.read_table(path)
    n = tbl.num_rows
    file_cols = set(tbl.schema.names)
    cols, names = [], []
    for f in bound_schema.fields:
        at = _arrow_field_type(f.dataType)
        if f.name in pv:
            val = pv[f.name]
            # constant column: stay native-Arrow, no n-element
            # Python list (pa.nulls / repeated scalar + cast)
            if val is None:
                arr = pa.nulls(n, at)
            else:
                arr = pa.repeat(pa.scalar(val, type=pa.string()), n).cast(at)
        elif f.name not in file_cols:
            # pre-schema-evolution file: the column doesn't exist on
            # disk; the snapshot reader fills null, so must we
            arr = pa.nulls(n, at)
        else:
            arr = tbl.column(f.name).combine_chunks().cast(at)
        cols.append(arr)
        names.append(f.name)
    out = pa.table(dict(zip(names, cols)))
    yield from out.to_batches(max_chunksize=1 << 16)


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.bound_schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pydelta stream requires a table path")
        self.ignore_deletes = _opt_flag(options, "ignoreDeletes", "ignoredeletes")
        self.ignore_changes = _opt_flag(options, "ignoreChanges", "ignorechanges")
        # skipChangeCommits (the public Delta source's successor to
        # ignoreChanges): SKIP every commit that changes existing rows
        # — rewrite commits (removes+adds) AND deletion-vector re-adds
        # — instead of erroring or re-emitting. The stream stays
        # append-only and duplicate-free; row-level changes are
        # disregarded by declaration.
        self.skip_change_commits = _opt_flag(
            options, "skipChangeCommits", "skipchangecommits"
        )
        self.cdf = _opt_flag(options, "readChangeFeed", "readchangefeed")
        if self.cdf and (
            self.ignore_deletes or self.ignore_changes or self.skip_change_commits
        ):
            raise ValueError(
                "pydelta stream: readChangeFeed streams every change as "
                "typed rows; ignoreDeletes/ignoreChanges/skipChangeCommits "
                "do not compose"
            )
        # startingVersion (public Delta source option): begin the
        # stream AT a log version instead of replaying from 0 —
        # "latest" starts past the current head (new commits only).
        # History before the start is simply not part of the stream
        # (backfill with a batch read), which is what bounds a fresh
        # consumer's first drain on a long-lived table.
        sv = options.get("startingVersion", options.get("startingversion"))
        self.starting_version: int | None
        if sv is None:
            self.starting_version = None
        elif str(sv).lower() == "latest":
            self.starting_version = -1  # resolved in initialOffset
        else:
            try:
                self.starting_version = int(sv)
            except ValueError as e:
                raise ValueError(
                    f"pydelta stream: startingVersion must be an integer "
                    f"or 'latest', got {sv!r}"
                ) from e
            if self.starting_version < 0:
                raise ValueError(
                    "pydelta stream: startingVersion must be >= 0"
                )
        # maxFilesPerTrigger (public Delta source option, round 14):
        # admission control — each micro-batch's proposed offset covers
        # at most this many input partitions, splitting WITHIN a
        # version when needed (offset form {"version", "index"}; a
        # fully-consumed version stays index-less, so pre-r14
        # checkpoints replay unchanged). partitions()/commit() track
        # the consumed position — including on restart, where Spark
        # re-drives commit()/partitions() for the recovered batch
        # before asking for a new offset (observed: the ≤K bound held
        # across availableNow restart loops). Worst case a proposal
        # issued with no tracked position covers a full backlog —
        # correctness is unaffected (Spark always hands partitions()
        # the authoritative range; every recorded range replays its
        # exact file slice).
        mft = options.get("maxFilesPerTrigger", options.get("maxfilespertrigger"))
        self.max_files: int | None
        if mft is None:
            self.max_files = None
        else:
            try:
                self.max_files = int(mft)
            except ValueError as e:
                raise ValueError(
                    "pydelta stream: maxFilesPerTrigger must be a "
                    f"positive integer, got {mft!r}"
                ) from e
            if self.max_files < 1:
                raise ValueError(
                    "pydelta stream: maxFilesPerTrigger must be >= 1, "
                    f"got {self.max_files}"
                )
        # maxBytesPerTrigger (public Delta source option): the byte-
        # budget axis of the same admission walk — a SOFT cap (the file
        # that crosses the budget is still admitted, so one oversized
        # file streams alone rather than wedging the query). Composes
        # with maxFilesPerTrigger: a batch stops at whichever bound
        # trips first.
        mbt = options.get("maxBytesPerTrigger", options.get("maxbytespertrigger"))
        self.max_bytes: int | None
        if mbt is None:
            self.max_bytes = None
        else:
            try:
                self.max_bytes = int(mbt)
            except ValueError as e:
                raise ValueError(
                    "pydelta stream: maxBytesPerTrigger must be a "
                    f"positive integer, got {mbt!r}"
                ) from e
            if self.max_bytes < 1:
                raise ValueError(
                    "pydelta stream: maxBytesPerTrigger must be >= 1, "
                    f"got {self.max_bytes}"
                )
        self._pos: dict | None = None  # last consumed offset (this instance)
        self._nparts: dict[int, list[int]] = {}  # version -> part sizes

        from .deltalog import _require_no_dv, _require_unmapped

        snap = snapshot(self.path)  # validates table existence + protocol gate
        # the stream decodes files by LOGICAL column name; a
        # column-mapped table stores physical names — reject up front
        _require_unmapped(snap, "pydelta stream")
        # deletion vectors soft-delete rows INSIDE files the stream
        # would re-emit whole — reject up front (batch reads apply
        # them) UNLESS skipChangeCommits declares DV commits skippable
        if not self.skip_change_commits:
            _require_no_dv(snap, "pydelta stream")

    def initialOffset(self) -> dict:
        if self.starting_version is None:
            return {"version": -1}
        if self.starting_version == -1:  # "latest"
            js, cps = _list_log(self.path)
            return {"version": max(js + cps)}
        if self.starting_version == 0:
            return {"version": -1}
        # the offset is the last ALREADY-CONSUMED version: start AT
        # startingVersion means everything before it is consumed. The
        # version must still be replayable (not vacuumed past) — the
        # per-version file-existence guard in partitions() enforces it.
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        js, cps = _list_log(self.path)
        head = max(js + cps)
        if self.max_files is None and self.max_bytes is None:
            return {"version": head}
        base = self._pos if self._pos is not None else self.initialOffset()
        bv, bi = int(base["version"]), base.get("index")
        # resume point: mid-version if base carries an index short of
        # the version's partition count, else the next version
        if bi is not None and int(bi) < self._nparts_of(bv):
            v, start_i = bv, int(bi)
        else:
            v, start_i = bv + 1, 0
        taken_f = 0
        taken_b = 0
        cur = dict(base)
        while v <= head:
            sizes = self._sizes_of(v)
            n = len(sizes)
            if start_i >= n:  # empty/skipped version: consumed for free
                cur = {"version": v}
                v, start_i = v + 1, 0
                continue
            i = start_i
            while i < n:
                # maxFiles is a hard cap; maxBytes is the public soft
                # cap — the file that CROSSES the byte budget is still
                # included (so one oversized file streams alone), and
                # every batch admits at least one file
                if self.max_files is not None and taken_f >= self.max_files:
                    break
                if self.max_bytes is not None and taken_b >= self.max_bytes:
                    break
                taken_f += 1
                taken_b += sizes[i]
                i += 1
            if i == start_i:
                break  # budget exhausted before this version
            # canonical form: a fully-consumed version never carries an
            # index key, so offset JSON equality keeps meaning "no new
            # data" for Spark's progress tracking
            if i >= n:
                cur = {"version": v}
                v, start_i = v + 1, 0
            else:
                cur = {"version": v, "index": i}
                break
        return cur

    def _nparts_of(self, v: int) -> int:
        """Partition count of one version (cached; versions are
        immutable once committed). Runs the same classification as
        ``_version_parts``, so an unstreamable commit fails at
        PROPOSAL time — the same loud error, one call earlier."""
        return len(self._sizes_of(v))

    def _sizes_of(self, v: int) -> list[int]:
        """Per-partition on-disk byte sizes of one version (cached;
        versions are immutable once committed). Feeds both budget axes
        of the admission-control walk: count (maxFilesPerTrigger) and bytes
        (maxBytesPerTrigger)."""
        if v not in self._nparts:
            self._nparts[v] = [
                os.path.getsize(p.path) if os.path.exists(p.path) else 0
                for p in self._version_parts(v)
            ]
        return self._nparts[v]

    def commit(self, end: dict) -> None:
        self._pos = dict(end)

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # Fractional offsets (round 14, maxFilesPerTrigger): an offset
        # may carry an ``index`` = number of this version's partitions
        # already consumed; absent index = the version is fully
        # consumed (the pre-r14 offset form, so old checkpoints replay
        # unchanged). ``_version_parts`` is deterministic (log line
        # order), so any recorded (start, end] range reproduces its
        # slice exactly — the replayability contract is unchanged.
        sv, si = int(start["version"]), start.get("index")
        ev, ei = int(end["version"]), end.get("index")
        parts: list[InputPartition] = []
        first = sv if si is not None else sv + 1
        for v in range(first, ev + 1):
            vp = self._version_parts(v)
            lo = int(si) if (v == sv and si is not None) else 0
            hi = int(ei) if (v == ev and ei is not None) else len(vp)
            parts.extend(vp[lo:hi])
        # authoritative consumed position for the rate limiter (Spark
        # hands every batch's true range here, including recovered ones)
        self._pos = dict(end)
        return parts

    def _version_parts(self, v: int) -> list[InputPartition]:
        """All stream partitions of ONE log version, in deterministic
        (log line) order — the unit the offset ``index`` slices."""
        from .deltalog import _check_protocol

        parts: list[InputPartition] = []
        p = os.path.join(_log_dir(self.path), f"{v:020d}.json")
        adds: list[dict] = []
        removes: list[dict] = []
        with open(p, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "protocol" in act and act["protocol"] is not None:
                    # a mid-stream protocol upgrade (deletion vectors,
                    # column mapping) must fail loudly, not stream
                    # files whose rows we can no longer interpret
                    _check_protocol(act["protocol"])
                elif "add" in act and act["add"].get("dataChange", True):
                    if act["add"].get("deletionVector") is not None:
                        if self.skip_change_commits:
                            adds.append(act["add"])  # commit skipped below
                        else:
                            raise RuntimeError(
                                f"pydelta stream: version {v} attaches a "
                                "deletion vector; streaming a DV commit "
                                "would re-emit soft-deleted rows — set "
                                "skipChangeCommits=true to disregard "
                                "row-level changes, or read the table "
                                "in batch mode"
                            )
                    else:
                        adds.append(act["add"])
                elif "remove" in act and act["remove"].get(
                    "dataChange", True
                ):
                    removes.append(act["remove"])
        if self.cdf:
            parts.extend(self._cdf_parts(v, adds, removes))
            return parts
        if self.skip_change_commits and (
            removes
            or any(a.get("deletionVector") is not None for a in adds)
        ):
            # a commit that changes existing rows (rewrite or DV
            # attach) is skipped WHOLE — half-applying it would be
            # neither the old nor the new table state
            return parts
        has_dc_remove = bool(removes)
        # classify the commit, mirroring the public Delta source
        # options: delete-only commits need ignoreDeletes; REWRITE
        # commits (removes AND adds: OVERWRITE/MERGE/row DELETE)
        # need the stronger ignoreChanges and re-emit their rewritten
        # files (documented duplicate semantics) — silently skipping
        # only the removes would half-apply the commit
        if has_dc_remove:
            if adds and not self.ignore_changes:
                raise RuntimeError(
                    f"pydelta stream: version {v} rewrites data "
                    "(removes + adds: OVERWRITE/MERGE/DELETE rewrite); "
                    "set ignoreChanges=true to stream the rewritten "
                    "files (rows may repeat) or start a fresh stream"
                )
            if not adds and not (self.ignore_deletes or self.ignore_changes):
                raise RuntimeError(
                    f"pydelta stream: version {v} contains a "
                    "dataChange remove (DELETE); the source is "
                    "append-only — set ignoreDeletes=true to skip "
                    "delete-only commits"
                )
        for a in adds:
            # log paths are percent-encoded (deltalog _encode_path);
            # disk paths are not
            fpath = os.path.join(self.path, unquote(a["path"]))
            if not os.path.exists(fpath):
                # VACUUM after OPTIMIZE/OVERWRITE physically removed a
                # file this version added: the rows can no longer be
                # attributed to any offset range. Fail loudly at PLAN
                # time with the remedy, never a worker FileNotFound
                # (the Delta analog of the Iceberg stream's
                # expired-provenance guard).
                raise RuntimeError(
                    f"pydelta stream: version {v} adds {a['path']} but "
                    "the file was removed (VACUUM after a rewrite); "
                    "those rows cannot be streamed — backfill with a "
                    "batch read (read_delta) and start the stream from "
                    "the current version"
                )
            parts.append(
                DeltaFilePartition(
                    fpath, json.dumps(a.get("partitionValues") or {})
                )
            )
        return parts

    def _cdf_parts(
        self, v: int, adds: list[dict], removes: list[dict]
    ) -> list[DeltaFilePartition]:
        """Change-data-feed partitions for one commit: every
        ``dataChange`` ADD streams its rows as ``insert`` and every
        ``dataChange`` REMOVE streams the removed file's rows as
        ``delete`` — PER COMMIT, not netted across the range (a row
        inserted in v1 and deleted in v3 yields both changes; the batch
        ``read_change_feed`` nets them instead — both semantics are
        real, this is the streaming one). ``dataChange=false`` commits
        (OPTIMIZE) stay invisible. Removed-file partition values are
        resolved from the pre-commit snapshot (driver metadata)."""
        out: list[DeltaFilePartition] = []
        prev_files: dict | None = None
        for change, acts in (("insert", adds), ("delete", removes)):
            for a in acts:
                rel = unquote(a["path"])
                fpath = os.path.join(self.path, rel)
                if not os.path.exists(fpath):
                    raise RuntimeError(
                        f"pydelta stream: version {v} {change}s {a['path']} "
                        "but the file is gone (VACUUM); those rows cannot "
                        "be change-streamed — backfill from a batch CDF "
                        "read over a retained range"
                    )
                if change == "insert":
                    pv = a.get("partitionValues") or {}
                else:
                    # removes carry no partitionValues; the file was live
                    # at v-1, so that snapshot's file map has them
                    if prev_files is None:
                        prev_files = snapshot(self.path, v - 1).files
                    pv = prev_files.get(rel, {})
                out.append(
                    DeltaFilePartition(fpath, json.dumps(pv), change, v)
                )
        return out

    def read(self, partition: DeltaFilePartition):
        pv = json.loads(partition.partition_values)
        if self.cdf:
            # the two CDF columns ride the constant-column mechanism
            # (cast from string to the bound field's Arrow type)
            pv = {
                **pv,
                "_change_type": partition.change_type,
                "_commit_version": str(partition.version),
            }
        yield from _read_parquet_with_pv(
            partition.path, pv, self.bound_schema
        )

    def stop(self) -> None:
        pass


class DeltaStreamDataSource(DataSource):
    """``spark.readStream.format("pydelta").load(table_path)``."""

    @classmethod
    def name(cls) -> str:
        return "pydelta"

    def schema(self) -> T.StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("pydelta requires a table path")
        base = snapshot(path).schema
        if _opt_flag(dict(self.options), "readChangeFeed", "readchangefeed"):
            return T.StructType(
                list(base.fields)
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.LongType(), False),
                ]
            )
        return base

    def streamReader(self, schema: T.StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, dict(self.options))


def register_pydelta(spark: SparkSession) -> None:
    spark.dataSource.register(DeltaStreamDataSource)
