"""Streaming reader over Iceberg snapshots (``pyiceberg_stream``).

The snapshot list IS the offset ledger: a micro-batch is the half-open
snapshot-id range ``(start, end]``, and its input files are exactly the
manifest entries ADDED by those snapshots (status=1 with the matching
``snapshot_id`` — old manifests shared into an append's manifest list
carry their original ids, so re-listing a table never re-emits rows).
Offsets are replayable by construction: same range → same manifest
entries → same files.

Commit classification mirrors the Delta stream source
(``delta_stream.py``), translated to snapshot-tree vocabulary:

- ``append`` snapshots stream their added files incrementally;
- ``replace`` snapshots (``rewrite_data_files`` compaction) are
  INVISIBLE — same rows, different files — exactly like Delta's
  ``dataChange=false`` OPTIMIZE commits;
- ``overwrite`` snapshots rewrite data and fail loudly unless
  ``ignoreChanges=true`` streams their added files (rows may repeat —
  the documented trade-off, same as Delta's ignoreChanges);
- a start offset naming a snapshot that ``expire_snapshots`` has since
  removed fails loudly (continuity can no longer be proven) instead of
  silently skipping data — the analog of streaming a VACUUMed Delta log;
- compaction + expiry together fail loudly too: a rewrite records the
  snapshot ids it carries rows for in its summary
  (``replaced-snapshot-ids``), so a fresh stream over a table whose
  pre-compaction snapshots were expired raises instead of returning an
  empty table (the replace's own manifest entries carry the replace's
  id, which IS retained — the summary is what makes the loss visible).

Scale: one input partition per added data file; the worker reads its
single parquet file via Arrow and attaches identity partition columns
from the manifest's partition record (data files legally omit them) —
no join, no driver funnel; the driver only ever walks Avro manifests.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .delta_stream import _opt_flag, _read_parquet_with_pv
from .iceberg import _current_metadata, _read_avro, snapshot_iceberg


@dataclass
class IcebergFilePartition(InputPartition):
    path: str
    partition_values: str  # JSON {col: string|null}


def _added_files(
    table_path: str,
    snap_md: dict,
    lo: int | None = None,
    ids: set | None = None,
    with_rows: bool = False,
) -> list[tuple]:
    """(file_path, partition values[, record_count]) for entries this
    snapshot ADDED (``with_rows=True`` appends the manifest's
    record_count — the metadata-exact row budget the max-rows admission
    walk uses; no footer is opened).

    When ``lo``/``ids`` are given, the SAME walk doubles as the orphan
    check (one manifest pass per snapshot, not two): any live entry
    whose adding snapshot is in range but expired raises — those rows
    can never be attributed to an offset range, so a fresh stream would
    silently drop them."""
    sid = snap_md["snapshot-id"]
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
    out: list[tuple[str, dict]] = []
    for m in _read_avro(mlist):
        shared = m.get("added_snapshot_id") not in (None, sid)
        if shared and ids is None:
            continue  # a shared manifest from an earlier snapshot
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
        for entry in _read_avro(mpath):
            esid = entry.get("snapshot_id")
            if (
                ids is not None
                and entry["status"] == 1
                and esid is not None
                and esid > lo
                and esid not in ids
            ):
                raise RuntimeError(
                    f"pyiceberg_stream: snapshot {sid} holds rows added "
                    f"by expired snapshot {esid}; those rows cannot be "
                    "attributed to any offset range — backfill with a "
                    "batch read (read_iceberg) and start the stream "
                    "from the current snapshot"
                )
            if shared or entry["status"] != 1 or esid != sid:
                continue
            rec = entry["data_file"]
            row = (rec["file_path"], dict(rec.get("partition") or {}))
            if with_rows:
                row += (int(rec.get("record_count") or 0),)
            out.append(row)
    return out


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.bound_schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyiceberg_stream requires a table path")
        self.ignore_changes = _opt_flag(options, "ignoreChanges", "ignorechanges")
        # the public Iceberg source's skip options (round 13):
        # delete snapshots / overwrite snapshots are skipped WHOLE
        # instead of erroring (deletes) or re-emitting (overwrites with
        # ignoreChanges) — the stream stays append-only and
        # duplicate-free, row-level changes disregarded by declaration
        self.skip_deletes = _opt_flag(
            options, "streaming-skip-delete-snapshots"
        )
        self.skip_overwrites = _opt_flag(
            options, "streaming-skip-overwrite-snapshots"
        )
        from .iceberg import _require_v1

        snapshot_iceberg(self.path)  # validates table + format gate
        # the stream re-emits whole data files; v2 position deletes
        # soft-delete rows INSIDE them — reject up front (batch reads
        # apply the deletes) UNLESS streaming-skip-delete-snapshots
        # declares the delete snapshots skippable
        if not self.skip_deletes:
            _require_v1(_current_metadata(self.path), "pyiceberg stream")

        # streaming-max-files-per-micro-batch (public Iceberg source
        # option, round 14; Delta twin: pydelta's maxFilesPerTrigger):
        # admission control via fractional offsets
        # ({"snapshot_id", "index"}) that split WITHIN a snapshot at
        # file granularity. A fully-consumed snapshot stays index-less,
        # so pre-r14 checkpoints replay unchanged; partitions()/
        # commit() track the consumed position so the bound holds
        # across restarts, and every recorded range replays its exact
        # file slice (the replayability contract is unchanged).
        mfb = options.get("streaming-max-files-per-micro-batch")
        self.max_files: int | None
        if mfb is None:
            self.max_files = None
        else:
            try:
                self.max_files = int(mfb)
            except ValueError as e:
                raise ValueError(
                    "pyiceberg_stream: streaming-max-files-per-micro-"
                    f"batch must be a positive integer, got {mfb!r}"
                ) from e
            if self.max_files < 1:
                raise ValueError(
                    "pyiceberg_stream: streaming-max-files-per-micro-"
                    f"batch must be >= 1, got {self.max_files}"
                )
        # streaming-max-rows-per-micro-batch (the public source's other
        # admission axis): a SOFT row cap taken from the manifests'
        # record_count — metadata-exact, no footer opened; the file that
        # crosses the budget is still admitted (an oversized file
        # streams alone). Composes with max-files: whichever bound
        # trips first ends the batch.
        mrb = options.get("streaming-max-rows-per-micro-batch")
        self.max_rows: int | None
        if mrb is None:
            self.max_rows = None
        else:
            try:
                self.max_rows = int(mrb)
            except ValueError as e:
                raise ValueError(
                    "pyiceberg_stream: streaming-max-rows-per-micro-"
                    f"batch must be a positive integer, got {mrb!r}"
                ) from e
            if self.max_rows < 1:
                raise ValueError(
                    "pyiceberg_stream: streaming-max-rows-per-micro-"
                    f"batch must be >= 1, got {self.max_rows}"
                )
        self._pos: dict | None = None  # last consumed offset
        self._nparts: dict[int, list[int]] = {}  # snapshot id -> part rows

        # stream-from-timestamp (public Iceberg source option, ms):
        # begin with the first snapshot whose commit timestamp is at or
        # after T — earlier history is not part of the stream (backfill
        # with a batch read). Resolved once, here, against the snapshot
        # registry; offsets stay snapshot ids.
        ts = options.get("stream-from-timestamp")
        self.start_after: int = 0
        if ts is not None:
            try:
                t0 = int(ts)
            except ValueError as e:
                raise ValueError(
                    "pyiceberg_stream: stream-from-timestamp must be "
                    f"epoch milliseconds, got {ts!r}"
                ) from e
            snaps = sorted(
                _current_metadata(self.path).get("snapshots", []),
                key=lambda s: (s.get("timestamp-ms", 0), s["snapshot-id"]),
            )
            for s in snaps:
                if int(s.get("timestamp-ms", 0)) < t0:
                    self.start_after = s["snapshot-id"]

    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_after}

    def latestOffset(self) -> dict:
        md = _current_metadata(self.path)
        snaps = sorted(
            md.get("snapshots", []), key=lambda s: s["snapshot-id"]
        )
        ids = {s["snapshot-id"] for s in snaps}
        head = max(ids) if ids else 0
        if self.max_files is None and self.max_rows is None:
            return {"snapshot_id": head}
        base = self._pos if self._pos is not None else self.initialOffset()
        bv, bi = int(base["snapshot_id"]), base.get("index")
        taken_f = 0
        taken_r = 0
        cur = dict(base)
        for s in snaps:
            sid = s["snapshot-id"]
            if sid < bv or (sid == bv and bi is None):
                continue
            if sid not in self._nparts:
                self._snapshot_parts(s, bv, ids)  # fills the rows cache
            rows = self._nparts[sid]
            n = len(rows)
            start_i = int(bi) if (sid == bv and bi is not None) else 0
            if start_i >= n:  # empty/skipped snapshot: consumed for free
                cur = {"snapshot_id": sid}
                continue
            i = start_i
            while i < n:
                # max-files is a hard cap; max-rows is the public soft
                # cap — the file crossing the row budget is admitted,
                # and every batch admits at least one file
                if self.max_files is not None and taken_f >= self.max_files:
                    break
                if self.max_rows is not None and taken_r >= self.max_rows:
                    break
                taken_f += 1
                taken_r += rows[i]
                i += 1
            if i == start_i:
                break  # budget exhausted before this snapshot
            # canonical: a fully-consumed snapshot never carries an
            # index key (offset JSON equality = "no new data")
            if i >= n:
                cur = {"snapshot_id": sid}
            else:
                cur = {"snapshot_id": sid, "index": i}
                break
        return cur

    def commit(self, end: dict) -> None:
        self._pos = dict(end)

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, li = int(start["snapshot_id"]), start.get("index")
        hi, hie = int(end["snapshot_id"]), end.get("index")
        md = _current_metadata(self.path)
        snaps = sorted(
            md.get("snapshots", []), key=lambda s: s["snapshot-id"]
        )
        ids = {s["snapshot-id"] for s in snaps}
        if lo != 0 and lo not in ids:
            raise RuntimeError(
                f"pyiceberg_stream: start snapshot {lo} was expired from "
                f"{self.path} (retained: {sorted(ids)}); continuity cannot "
                "be proven — start a fresh stream"
            )
        parts: list[InputPartition] = []
        for s in snaps:
            sid = s["snapshot-id"]
            if sid < lo or sid > hi:
                continue
            if sid == lo and li is None:
                continue  # start snapshot fully consumed (legacy form)
            sp = self._snapshot_parts(s, lo, ids)
            a = int(li) if (sid == lo and li is not None) else 0
            b = int(hie) if (sid == hi and hie is not None) else len(sp)
            parts.extend(sp[a:b])
        self._pos = dict(end)
        return parts

    def _snapshot_parts(
        self, s: dict, lo: int, ids: set[int]
    ) -> list[InputPartition]:
        """All stream partitions of ONE snapshot, in deterministic
        (manifest walk) order — the unit the offset ``index`` slices.
        Skipped/replace/delete snapshots contribute zero partitions or
        raise, exactly as the unbounded walk did."""
        parts: list[InputPartition] = []
        sid = s["snapshot-id"]
        # default rows-cache entry for the zero-partition outcomes (the
        # skip/replace early returns below); the added-files walk at the
        # end overwrites it with the real per-file record counts
        self._nparts[sid] = []
        op = s.get("summary", {}).get("operation", "append")
        if op == "replace":
            # compaction: same rows, different files — INVISIBLE,
            # but only while every snapshot it carries rows for is
            # still streamable. A rewrite writes its entries under
            # its OWN snapshot id, so after expire_snapshots removes
            # the original appends the manifest walk alone cannot
            # see the loss; the rewrite records the carried
            # snapshot ids in its summary (replaced-snapshot-ids)
            # exactly for this check. Legacy replace snapshots
            # without the summary fall back to the manifest walk.
            rids = s.get("summary", {}).get("replaced-snapshot-ids")
            if rids is not None:
                missing = sorted(
                    r for r in rids if r > lo and r not in ids
                )
                if missing:
                    raise RuntimeError(
                        f"pyiceberg_stream: replace snapshot {sid} is "
                        f"the only holder of rows added by expired "
                        f"snapshot(s) {missing}; those rows cannot be "
                        "attributed to any offset range — backfill "
                        "with a batch read (read_iceberg) and start "
                        "the stream from the current snapshot"
                    )
            else:
                _added_files(self.path, s, lo, ids)
            return parts
        if op == "delete":
            if self.skip_deletes:
                return parts  # row-level delete: declared skippable
            raise RuntimeError(
                f"pyiceberg_stream: snapshot {sid} is a row-level "
                "DELETE; set streaming-skip-delete-snapshots=true to "
                "disregard row-level changes, or read the table in "
                "batch mode"
            )
        if op == "overwrite" and self.skip_overwrites:
            return parts  # rewrite skipped whole — no re-emit, no dupes
        if op == "overwrite" and not self.ignore_changes:
            raise RuntimeError(
                f"pyiceberg_stream: snapshot {sid} is an OVERWRITE "
                "(data rewrite); set ignoreChanges=true to stream its "
                "added files (rows may repeat), "
                "streaming-skip-overwrite-snapshots=true to skip it "
                "whole, or start a fresh stream"
            )
        # one walk lists the added files AND orphan-checks every
        # entry (shared manifests included) — a fresh stream over a
        # table whose early snapshots were expired fails here
        rows: list[int] = []
        for rel, pv, nr in _added_files(self.path, s, lo, ids, with_rows=True):
            p = rel if os.path.isabs(rel) else os.path.join(self.path, rel)
            parts.append(IcebergFilePartition(p, json.dumps(pv)))
            rows.append(nr)
        self._nparts[sid] = rows
        return parts

    def read(self, partition: IcebergFilePartition):
        yield from _read_parquet_with_pv(
            partition.path, json.loads(partition.partition_values),
            self.bound_schema,
        )

    def stop(self) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("pyiceberg_stream").load(table_path)``."""

    @classmethod
    def name(cls) -> str:
        return "pyiceberg_stream"

    def schema(self) -> T.StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("pyiceberg_stream requires a table path")
        return snapshot_iceberg(path).schema

    def streamReader(self, schema: T.StructType) -> IcebergStreamReader:
        return IcebergStreamReader(schema, dict(self.options))


def register_pyiceberg_stream(spark: SparkSession) -> None:
    spark.dataSource.register(IcebergStreamDataSource)
