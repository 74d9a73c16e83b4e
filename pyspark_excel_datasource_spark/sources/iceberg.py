"""Minimal Apache Iceberg v1 table reader/writer over the PUBLIC
Iceberg table spec (iceberg.apache.org/spec): versioned metadata JSON,
Avro manifest lists, Avro manifests, parquet data files, snapshot time
travel — with the Avro layers encoded/decoded by the repo's own
pure-Python container codec (``sources/avrofile.py``).

Together with the Delta log (``sources/deltalog.py``) this completes
the two mainstream lakehouse protocols; they make an instructive
contrast the module keeps explicit:

- Delta's log is a CHANGE journal (replay JSON commits to reconstruct
  state; checkpoints amortize the replay). Iceberg's metadata is a
  SNAPSHOT tree (each snapshot names a manifest list; no replay —
  reading any snapshot costs the same regardless of history length).
- Delta strips partition columns from data files and re-attaches them
  from the log; Iceberg data files keep all columns, and the manifest's
  per-file partition summary exists only for pruning.
- Both commit by atomic rename/put-if-absent of ONE small file (here:
  the next ``vN.metadata.json`` via O_EXCL create).

Scale notes: all metadata IO is driver-side by design (spec intent —
manifests are file-level metadata; a 10^6-file table is tens of MB of
Avro split across manifests). The data path is an ordinary multi-file
parquet scan with full pushdown. Manifest-level partition pruning reads
only matching manifests' file lists — file skipping before the scan.

Format-version 2 is supported on the BATCH read path, with BOTH
row-delete encodings:

- POSITION deletes: delete manifests (manifest-list ``content=1``)
  carry (``file_path``, ``pos``) parquet files, scanned DISTRIBUTED
  (round 13 — the driver touches only paths and record counts); the
  scan subtracts those row positions via the same positional anti-join
  on ``_metadata.row_index`` the Delta deletion-vector path uses
  (``deltalog._read_files``): broadcast under
  ``spark.graft.dv.broadcastMaxPositions``, shuffle above.
- EQUALITY deletes (``content=2``): applied with the spec's
  sequence-number ordering — a delete hits only data files whose data
  sequence number is STRICTLY LOWER (with manifest-list inheritance).
  The live file set partitions into classes by which delete groups
  apply; each class is one pushed-down scan followed by null-safe
  broadcast anti-joins on the ``equality_ids`` columns, unioned back
  (class count bounded; fails loudly past 16 groups — maintenance
  folds deletes into data long before that).

Schema evolution by FIELD-ID remapping is supported for tables this
writer creates: every data file is written with ``parquet.field.id``
footers, so ``rename_column_iceberg`` is one metadata-only commit (new
schema-id, same ids, no snapshot) and mixed-name file sets read
correctly by id; time travel shows each snapshot under its own schema.
Writers also enforce the spec's ``required`` (non-null) fields on
append, validated in one fused predicate pass BEFORE any data lands.

Not implemented (raises, never silently wrong): WRITES — including compaction, snapshot expiry, the streaming source,
and metadata-only conversion to Delta — against format-version 2
tables (this writer emits v1 metadata; a metadata-only conversion of a
v2 table would silently drop its delete files), non-identity partition
transforms, renames of partition columns or on tables whose files lack
field ids.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_META = "metadata"
_DATA = "data"


class IcebergFormatError(RuntimeError):
    """Table uses spec features this reader does not implement."""


class IcebergConcurrentCommitError(RuntimeError):
    """Another writer published the target metadata version first."""


def _require_v1(md: dict, op: str) -> None:
    """Mutations (and the stream / metadata-only conversion) require a
    v1 table: this writer emits v1 metadata, and appending v1 snapshots
    to — or expiring/compacting/converting — a v2 table would silently
    drop or misorder its delete files. Batch reads accept v2."""
    fv = int(md.get("format-version", 1))
    if fv != 1:
        raise IcebergFormatError(
            f"{op} on a format-version {fv} table is not implemented; "
            "v2 is supported on the batch read path only"
        )


#: stamped when THIS writer upgrades a table to v2 (first MOR delete);
#: mutations stay enabled on such tables because every v2 feature
#: present is one this module wrote and reads back exactly
_OWN_V2_PROP = "spark-graft.row-deletes"


def _require_writable(md: dict, op: str) -> None:
    """Mutation gate with the round-11 refinement: v1 tables are always
    writable; a v2 table is writable ONLY when this module upgraded it
    (``delete_where_iceberg`` stamps ``spark-graft.row-deletes``) — its
    delete files are position deletes this writer emitted, which every
    code path here carries and applies exactly. EXTERNAL v2 tables stay
    read-only: they may hold sequence-number orderings or delete shapes
    a blind v1-style commit would silently drop or misorder."""
    fv = int(md.get("format-version", 1))
    if fv == 1:
        return
    if fv == 2 and (md.get("properties") or {}).get(_OWN_V2_PROP) == "true":
        return
    raise IcebergFormatError(
        f"{op} on a format-version {fv} table is not implemented unless "
        "this writer produced its v2 features (externally-written v2 "
        "tables are batch-read-only)"
    )


def _require_identity_spec(md: dict, op: str) -> None:
    """Data-writer gate (round 13): a table whose CURRENT partition
    spec uses non-identity transforms is READ-ONLY here — an append or
    rewrite that ignored the transform would commit files with wrong
    (or missing) partition tuples, silently breaking every pruning
    reader. Evolving the spec to identity columns unlocks writes."""
    spec_fields = md.get("partition-spec", [])
    if md.get("partition-specs"):
        by_id = {s["spec-id"]: s for s in md["partition-specs"]}
        cur = by_id.get(md.get("default-spec-id", 0))
        if cur is not None:
            spec_fields = cur["fields"]
    kinds = sorted(
        {
            str(f.get("transform"))
            for f in spec_fields
            if f.get("transform") != "identity"
        }
    )
    if kinds:
        raise IcebergFormatError(
            f"{op} on a table whose current partition spec has "
            f"non-identity transforms ({', '.join(kinds)}) is not "
            "implemented — transformed foreign tables are read-only"
        )


#: partition_by spellings accepted by write_iceberg (round 13 —
#: hidden partitioning, the spec's headline feature): plain column
#: names are identity; the functional spellings mirror Spark SQL DDL.
_PARTITION_BY_RE = __import__("re").compile(
    r"^(?:(year|month|day|hour)\((\w+)\)|(bucket|truncate)\((\d+)\s*,\s*(\w+)\))$"
)


def _murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (public algorithm; Iceberg spec Appendix B's
    bucket hash). Verified against the spec vectors hash(34L) =
    2017239379 and hash("iceberg") = 1210000089 in
    tests/test_iceberg_transforms.py. The WRITER computes bucket tuple
    values with it (``_transform_column``); the reader never needs it
    (bucket fields are not order-preserving, so matching rows are
    filtered in-scan, never pruned by tuple)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    m = 0xFFFFFFFF

    def rot(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & m

    h = seed
    n4 = len(data) // 4
    for i in range(n4):
        k = int.from_bytes(data[i * 4 : (i + 1) * 4], "little")
        k = (k * c1) & m
        k = rot(k, 15)
        k = (k * c2) & m
        h ^= k
        h = rot(h, 13)
        h = (h * 5 + 0xE6546B64) & m
    tail = data[n4 * 4 :]
    k = 0
    for i, b in enumerate(tail):
        k ^= b << (8 * i)
    if tail:
        k = (k * c1) & m
        k = rot(k, 15)
        k = (k * c2) & m
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h



def _parse_partition_by(entries: tuple[str, ...]) -> list[dict]:
    """``partition_by`` strings → canonical field descriptors:
    ``{"field_name", "transform", "n", "source"}``. Identity keeps the
    column name; transformed fields get the upstream naming convention
    (``ts_day``, ``id_bucket``, ``s_trunc``)."""
    out: list[dict] = []
    for e in entries:
        m = _PARTITION_BY_RE.match(e.strip())
        if m is None:
            out.append(
                {"field_name": e, "transform": "identity", "n": None, "source": e}
            )
        elif m.group(1):
            t, src = m.group(1), m.group(2)
            out.append(
                {"field_name": f"{src}_{t}", "transform": t, "n": None, "source": src}
            )
        else:
            t, n, src = m.group(3), int(m.group(4)), m.group(5)
            suffix = "bucket" if t == "bucket" else "trunc"
            out.append(
                {"field_name": f"{src}_{suffix}", "transform": t, "n": n, "source": src}
            )
    return out


def _transform_column(spark_col, tr: dict, dtype) -> "Any":
    """The Spark expression computing a partition field's TUPLE value
    from its source column (write-side twin of ``_transform_bound``):
    epoch-based ints for year/month/day/hour, floor-multiple/prefix for
    truncate, spec Appendix-B murmur3 for bucket (integral sources,
    Arrow-batched pandas_udf — partition-tuple-sized work, not a data
    transform)."""
    import pyspark.sql.types as T_

    kind = tr["transform"]
    if kind == "identity":
        return spark_col
    if kind == "day":
        return F.datediff(spark_col.cast("date"), F.lit("1970-01-01"))
    if kind == "year":
        return F.year(spark_col) - F.lit(1970)
    if kind == "month":
        return (F.year(spark_col) - F.lit(1970)) * 12 + F.month(spark_col) - 1
    if kind == "hour":
        return (
            F.datediff(spark_col.cast("date"), F.lit("1970-01-01")) * 24
            + F.hour(spark_col)
        )
    if kind == "truncate":
        w = int(tr["n"])
        if isinstance(dtype, T_.StringType):
            return F.substring(spark_col, 1, w)
        return (
            spark_col.cast("long") - _pymod_expr(spark_col.cast("long"), w)
        )
    if kind == "bucket":
        if not isinstance(
            dtype, (T_.ByteType, T_.ShortType, T_.IntegerType, T_.LongType)
        ):
            raise IcebergFormatError(
                "bucket write support covers integral sources only; got "
                f"{dtype.simpleString()}"
            )
        n = int(tr["n"])

        @F.pandas_udf("int")
        def _bucket(s):
            import pandas as pd

            def one(v):
                if v is None or pd.isna(v):
                    return None
                h = _murmur3_x86_32(
                    int(v).to_bytes(8, "little", signed=True)
                )
                return (h & 0x7FFFFFFF) % n

            return s.map(one)

        return _bucket(spark_col.cast("long"))
    raise IcebergFormatError(f"unsupported partition transform {kind!r}")


def _pymod_expr(col, w: int):
    """Floor modulo (Python %) as a Spark expression: pmod handles the
    negative-value case Iceberg's truncate defines (v - (v mod W) with
    mod ≥ 0)."""
    return F.pmod(col, F.lit(w))


def _transform_bound(tr: dict, v: Any) -> Any:
    """Apply an ORDER-PRESERVING partition transform to a bound value
    (the pruning rule: for monotonic T, v in [lo, hi] ⇒ T(v) in
    [T(lo), T(hi)], so a file whose tuple value falls outside that
    transformed range holds no matching row). Timestamp/date bounds
    arrive as ISO strings (the ``bounds_filter`` contract); epoch
    arithmetic follows the spec: day = days since 1970-01-01, month =
    months since 1970-01, year = years since 1970, hour = hours since
    epoch. ``truncate``: ints floor to a multiple of W, strings keep
    the first W characters (both monotonic)."""
    import datetime as _dt

    kind = tr["transform"]
    if kind == "truncate":
        w = int(tr["n"])
        if isinstance(v, str):
            return v[:w]
        return int(v) - (int(v) % w)
    s = str(v)
    d = _dt.datetime.fromisoformat(s.replace("T", " ").split("+")[0])
    if kind == "year":
        return d.year - 1970
    if kind == "month":
        return (d.year - 1970) * 12 + (d.month - 1)
    if kind == "day":
        return (d.date() - _dt.date(1970, 1, 1)).days
    if kind == "hour":
        return (d.date() - _dt.date(1970, 1, 1)).days * 24 + d.hour
    raise IcebergFormatError(f"not an order-preserving transform: {kind!r}")


# ---------------------------------------------------------------------------
# driver-side Avro helpers (container codec from sources/avrofile.py)
# ---------------------------------------------------------------------------


def _write_avro(path: str, schema: dict, rows: list[tuple]) -> None:
    from .avrofile import _write_avro_part

    _write_avro_part(path, schema, "null", iter(rows), block_records=1000)


def _dictify(at: Any, v: Any) -> Any:
    """Recursively turn decoded nested records (tuples in field order,
    per the codec's ``dec_record``) into dicts keyed by field name."""
    if isinstance(at, list):  # union: value shape decides
        for branch in at:
            if branch == "null":
                continue
            if v is None:
                return None
            return _dictify(branch, v)
        return v
    if isinstance(at, dict) and at.get("type") == "record":
        return {
            f["name"]: _dictify(f["type"], x)
            for f, x in zip(at["fields"], v)
        }
    return v


def _read_avro(path: str) -> list[dict[str, Any]]:
    """Decode every record of one Avro container file into nested dicts."""
    from .avrofile import _decode_long, _make_decoder, _read_header

    with open(path, "rb") as fh:
        buf = fh.read()
    header = _read_header(buf)
    fields = header.schema["fields"]
    decs = [_make_decoder(f["type"]) for f in fields]
    out: list[dict[str, Any]] = []
    pos = header.body_start
    while pos < len(buf):
        count, pos = _decode_long(buf, pos)
        size, pos = _decode_long(buf, pos)
        block = buf[pos : pos + size]
        if header.codec == "deflate":
            import zlib

            block = zlib.decompress(block, wbits=-15)
        p = 0
        for _ in range(count):
            rec: dict[str, Any] = {}
            for f, d in zip(fields, decs):
                v, p = d(block, p)
                rec[f["name"]] = _dictify(f["type"], v)
            out.append(rec)
        pos += size + 16  # skip sync
    return out


# ---------------------------------------------------------------------------
# spec type mapping
# ---------------------------------------------------------------------------

_ICE_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "binary": T.BinaryType(),
}
_SPARK_TO_ICE = {v.typeName(): k for k, v in _ICE_TO_SPARK.items()}


def _ice_type_to_spark(t: str) -> T.DataType:
    if t in _ICE_TO_SPARK:
        return _ICE_TO_SPARK[t]
    if t.startswith("decimal("):
        p, s = t[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s.strip()))
    raise IcebergFormatError(f"unsupported Iceberg type {t!r}")


def _spark_type_to_ice(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    name = dt.typeName()
    if name in _SPARK_TO_ICE:
        return _SPARK_TO_ICE[name]
    raise IcebergFormatError(f"unsupported Spark type for Iceberg: {dt}")


def _ice_schema_to_spark(schema: dict, with_field_ids: bool = False) -> T.StructType:
    """Iceberg schema → Spark schema. With ``with_field_ids`` each field
    carries ``parquet.field.id`` metadata, so the parquet scan resolves
    columns by the spec's FIELD IDS instead of by name — the mechanism
    that makes reads correct across column renames (the files keep
    their write-time names; the ids never change)."""
    return T.StructType(
        [
            T.StructField(
                f["name"],
                _ice_type_to_spark(f["type"]),
                nullable=not f.get("required", False),
                metadata={"parquet.field.id": f["id"]} if with_field_ids else None,
            )
            for f in schema["fields"]
        ]
    )


#: table property set by this writer when every data file of the table
#: carries parquet field ids (true for tables it creates; an append to a
#: pre-property table keeps it unset, because the OLD files lack ids and
#: id-based resolution would fail loudly on them)
_FIELD_IDS_PROP = "pyiceberg-lite.field-ids"


def _has_field_ids(md: dict[str, Any]) -> bool:
    return (md.get("properties") or {}).get(_FIELD_IDS_PROP) == "true"


# ---------------------------------------------------------------------------
# metadata tree
# ---------------------------------------------------------------------------


@dataclass
class IcebergSnapshot:
    snapshot_id: int
    schema: T.StructType
    #: file path (relative to the table root, or absolute) → identity
    #: partition values as strings (empty for unpartitioned tables)
    files: dict[str, dict[str, str | None]] = field(default_factory=dict)
    partition_columns: list[str] = field(default_factory=list)
    #: v2 position deletes: the delete PARQUET paths (absolute) and the
    #: manifests' total record count — file-level metadata only; the
    #: (file_path, pos) rows themselves are scanned DISTRIBUTED by the
    #: read path, never materialized on the driver (round 13)
    pos_delete_files: list[str] = field(default_factory=list)
    pos_delete_rows: int = 0
    #: per delete-parquet path → manifest record_count (bounds the
    #: broadcast decision for both delete kinds)
    delete_file_rows: dict[str, int] = field(default_factory=dict)
    #: v2 data sequence number per data file (0 for v1 tables)
    files_seq: dict[str, int] = field(default_factory=dict)
    #: v2 equality deletes: (delete seq, equality field-id tuple,
    #: [delete parquet paths]) sorted by seq
    equality_deletes: list[tuple[int, tuple[int, ...], list[str]]] = field(
        default_factory=list
    )
    #: spec field id → column name, from the snapshot's resolved schema
    field_names_by_id: dict[int, str] = field(default_factory=dict)
    #: partition evolution: data-file path → the partition-spec id its
    #: manifest was written under, and spec id → that spec's identity
    #: partition column names. A snapshot whose files span >1 spec is
    #: read per spec class (each file's partition columns come from ITS
    #: spec's metadata; the other specs' columns live in its data).
    files_pspec: dict[str, int] = field(default_factory=dict)
    spec_pcols: dict[int, list[str]] = field(default_factory=dict)
    #: per-file column bounds from the manifests (data-skipping index):
    #: file path → {stringified field id: JSON-decoded min/max value}.
    #: Files from manifests without bounds are absent — consumers must
    #: treat a missing entry as "cannot prune".
    files_lower: dict[str, dict[str, Any]] = field(default_factory=dict)
    files_upper: dict[str, dict[str, Any]] = field(default_factory=dict)
    #: spec id → NON-identity partition fields (round 13, read-only):
    #: [{"name", "transform", "n", "source"}] for bucket[N]/truncate[W]/
    #: year/month/day/hour/void. Order-preserving transforms prune at
    #: the manifest level through ``bounds_filter``; bucket/void fields
    #: are scan-filtered only. Writers refuse tables whose CURRENT spec
    #: has any (``current_transforms``).
    spec_transforms: dict[int, list[dict]] = field(default_factory=dict)
    current_transforms: list[dict] = field(default_factory=list)


def _meta_dir(path: str) -> str:
    return os.path.join(path, _META)


def _current_metadata(table_path: str) -> dict[str, Any]:
    hint = os.path.join(_meta_dir(table_path), "version-hint.text")
    if not os.path.exists(hint):
        raise FileNotFoundError(f"not an Iceberg table (no version hint): {table_path}")
    v = int(open(hint, encoding="utf-8").read().strip())
    with open(
        os.path.join(_meta_dir(table_path), f"v{v}.metadata.json"), encoding="utf-8"
    ) as fh:
        md = json.load(fh)
    md["_version"] = v  # injected from the hint, never persisted
    return md


def snapshot_at_timestamp(table_path: str, timestamp_ms: int) -> int:
    """``FOR TIMESTAMP AS OF`` resolution: the snapshot with the
    LATEST ``timestamp-ms`` ≤ the given instant. Raises when the
    table's first snapshot is already newer — 'before the table
    existed' fails loudly instead of silently reading something."""
    md = _current_metadata(table_path)
    best: int | None = None
    best_ts = -1
    for s in md.get("snapshots", []):
        ts = int(s.get("timestamp-ms", 0))
        if ts <= timestamp_ms and ts > best_ts:
            best, best_ts = s["snapshot-id"], ts
    if best is None:
        raise ValueError(
            f"timestamp {timestamp_ms} predates every snapshot of {table_path}"
        )
    return best


def snapshot_iceberg(
    table_path: str,
    snapshot_id: int | None = None,
    ref: str | None = None,
    timestamp_ms: int | None = None,
) -> IcebergSnapshot:
    """Resolve one snapshot's live data files: metadata JSON → manifest
    list (Avro) → manifests (Avro) → entries with status != 2 (DELETED).
    No replay — cost is O(manifests of this snapshot), independent of
    table history, the structural difference from the Delta log.

    ``ref`` resolves a named branch or tag from the metadata ``refs``
    registry to its head snapshot (then reads exactly like time travel
    to that snapshot id — the snapshot's own schema/spec).
    ``timestamp_ms`` is FOR TIMESTAMP AS OF (mutually exclusive with
    both)."""
    if timestamp_ms is not None:
        if snapshot_id is not None or ref is not None:
            raise ValueError(
                "pass exactly one of snapshot_id / ref / timestamp_ms"
            )
        snapshot_id = snapshot_at_timestamp(table_path, timestamp_ms)
    md = _current_metadata(table_path)
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or ref, not both")
        r = (md.get("refs") or {}).get(ref)
        if r is None:
            raise ValueError(
                f"unknown ref {ref!r} (refs: {sorted(md.get('refs') or {})})"
            )
        snapshot_id = r["snapshot-id"]
    snap_md = _resolve_snapshot_md(md, snapshot_id)
    sid = snap_md["snapshot-id"]

    # Schema resolution follows the spec's read semantics: reading the
    # LATEST state uses the table's CURRENT schema (md["schema"]) — that
    # is what makes a metadata-only column RENAME visible without a new
    # snapshot — while TIME TRAVEL resolves the snapshot through its own
    # schema-id, so an overwrite that changed the schema never rewrites
    # how OLD snapshots read (null partition columns, vanished fields).
    ice_schema = md["schema"]
    if (
        snapshot_id is not None
        and "schema-id" in snap_md
        and md.get("schemas")
    ):
        by_id = {s["schema-id"]: s for s in md["schemas"]}
        ice_schema = by_id.get(snap_md["schema-id"], ice_schema)
    schema = _ice_schema_to_spark(ice_schema, with_field_ids=_has_field_ids(md))
    field_names: dict[int, str] = {f["id"]: f["name"] for f in ice_schema["fields"]}
    spec_fields = md.get("partition-spec", [])
    if "spec-id" in snap_md and md.get("partition-specs"):
        by_id = {s["spec-id"]: s for s in md["partition-specs"]}
        spec_fields = by_id.get(snap_md["spec-id"], {"fields": spec_fields})[
            "fields"
        ]
    def _split_spec(fields: list[dict]) -> tuple[list[str], list[dict]]:
        """One spec's fields → (identity column names, non-identity
        transform descriptors). Reading a TRANSFORMED table is legal —
        the source values live in the data files, the partition tuple
        only serves pruning — so only a transform outside the spec's
        registry raises."""
        import re as _re

        idents: list[str] = []
        transforms: list[dict] = []
        for sp in fields:
            tr = sp.get("transform")
            src = field_names.get(sp["source-id"], sp["name"])
            if tr == "identity":
                idents.append(src)
                continue
            m = _re.fullmatch(r"(bucket|truncate)\[(\d+)\]", tr or "")
            if m:
                transforms.append(
                    {
                        "name": sp["name"],
                        "transform": m.group(1),
                        "n": int(m.group(2)),
                        "source": src,
                    }
                )
            elif tr in ("year", "month", "day", "hour", "void"):
                transforms.append(
                    {"name": sp["name"], "transform": tr, "n": None, "source": src}
                )
            else:
                raise IcebergFormatError(
                    f"unsupported partition transform {tr!r}"
                )
        return idents, transforms

    pcols, cur_transforms = _split_spec(spec_fields)
    all_specs = {
        s["spec-id"]: s["fields"] for s in md.get("partition-specs", [])
    }
    files: dict[str, dict[str, str | None]] = {}
    files_seq: dict[str, int] = {}
    files_pspec: dict[str, int] = {}
    spec_pcols: dict[int, list[str]] = {}
    spec_transforms: dict[int, list[dict]] = {}
    files_lower: dict[str, dict[str, Any]] = {}
    files_upper: dict[str, dict[str, Any]] = {}
    for df_rec, seq, spec_id in _live_data_files(table_path, snap_md):
        files[df_rec["file_path"]] = dict(df_rec.get("partition") or {})
        files_seq[df_rec["file_path"]] = seq
        files_pspec[df_rec["file_path"]] = spec_id
        for src_key, dst in (
            ("lower_bounds", files_lower),
            ("upper_bounds", files_upper),
        ):
            b = df_rec.get(src_key)
            if b:
                dst[df_rec["file_path"]] = {
                    k: json.loads(v) for k, v in b.items()
                }
        if spec_id not in spec_pcols:
            # only specs actually referenced by live files are resolved
            # — a retired exotic spec in the registry must not fail a
            # read that never touches it
            spec_pcols[spec_id], spec_transforms[spec_id] = _split_spec(
                all_specs.get(spec_id, spec_fields)
            )
    # v2 position deletes: only the delete PARQUET paths + manifest
    # record counts are kept (the read path scans them distributed and
    # resolves abs/rel target-path spellings inside the anti-join;
    # targets matching no live file fall out of the join naturally —
    # the spec allows dangling references after a rewrite)
    pos_files, eq_deletes, del_rows = _delete_files(table_path, snap_md)
    return IcebergSnapshot(
        snapshot_id=sid,
        schema=schema,
        files=files,
        partition_columns=pcols,
        pos_delete_files=pos_files,
        pos_delete_rows=sum(del_rows.get(p, 0) for p in pos_files),
        delete_file_rows=del_rows,
        files_seq=files_seq,
        equality_deletes=eq_deletes,
        field_names_by_id=field_names,
        files_pspec=files_pspec,
        spec_pcols=spec_pcols,
        spec_transforms=spec_transforms,
        current_transforms=cur_transforms,
        files_lower=files_lower,
        files_upper=files_upper,
    )


def _resolve_snapshot_md(md: dict[str, Any], snapshot_id: int | None) -> dict[str, Any]:
    """Shared snapshot lookup + format gate (the module's 'raises, never
    silently wrong' contract lives here so every metadata reader gets it)."""
    if int(md.get("format-version", 1)) not in (1, 2):
        raise IcebergFormatError(
            f"unsupported format-version {md.get('format-version')} "
            "(this reader implements v1 fully and v2 batch reads)"
        )
    snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
    sid = md.get("current-snapshot-id") if snapshot_id is None else snapshot_id
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in {sorted(snaps)}")
    return snaps[sid]


def _entry_seq(entry: dict[str, Any], m: dict[str, Any]) -> int:
    """v2 data-sequence-number resolution with the spec's inheritance:
    the entry's own (data_)sequence_number wins; a null on an ADDED
    entry inherits the manifest-list entry's sequence_number; v1
    metadata has none of these → 0."""
    for key in ("data_sequence_number", "sequence_number"):
        v = entry.get(key)
        if v is not None:
            return int(v)
    v = m.get("sequence_number")
    return int(v) if v is not None else 0


def _live_data_files(table_path: str, snap_md: dict[str, Any]):
    """Walk one snapshot's manifest list → manifests, yielding each LIVE
    (status != DELETED) ``(data_file record, data sequence number,
    partition spec id)`` after the parquet gate. The spec id comes from
    the manifest-list entry — a manifest carries files of exactly one
    spec, which is how mixed-spec snapshots (partition evolution) stay
    readable. The one copy of the metadata-tree walk that
    snapshot_iceberg and files_meta share."""
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
    for m in _read_avro(mlist):
        if int(m.get("content") or 0) == 1:
            continue  # v2 delete manifest — see _delete_files
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
        spec_id = int(m.get("partition_spec_id") or 0)
        for entry in _read_avro(mpath):
            if entry["status"] == 2:  # DELETED
                continue
            df_rec = entry["data_file"]
            if int(df_rec.get("content") or 0) != 0:
                raise IcebergFormatError(
                    "delete file found in a DATA manifest "
                    f"(content={df_rec.get('content')}): {df_rec['file_path']}"
                )
            if df_rec["file_format"].lower() != "parquet":
                raise IcebergFormatError(
                    f"unsupported data file format {df_rec['file_format']}"
                )
            yield df_rec, _entry_seq(entry, m), spec_id


def _delete_files(
    table_path: str, snap_md: dict[str, Any]
) -> tuple[
    list[str],
    list[tuple[int, tuple[int, ...], list[str]]],
    dict[str, int],
]:
    """v2 delete files for one snapshot, walked from the delete
    manifests (manifest-list ``content=1``):

    - POSITION deletes (``data_file.content == 1``): the spec's
      two-column (``file_path``, ``pos``) parquet — only the PATHS are
      returned; the rows are scanned distributed by ``read_iceberg``
      and anti-joined against the data scan (round 13: no driver read
      of any delete parquet, matching how the data files themselves
      are handled).
    - EQUALITY deletes (``content == 2``): grouped by (data sequence
      number, equality_ids tuple) → ``[(seq, ids, [paths])]`` sorted by
      seq; likewise read lazily by ``read_iceberg``.

    Also returns path → manifest ``record_count`` for every delete
    file: the metadata-known row bound that picks broadcast vs shuffle
    for the anti-joins WITHOUT opening a footer.

    Driver-side like the rest of the metadata tree: delete MANIFESTS
    are file-level metadata, and real writers compact data files whose
    delete ratio grows."""
    pos_paths: list[str] = []
    eq_groups: dict[tuple[int, tuple[int, ...]], list[str]] = {}
    del_rows: dict[str, int] = {}
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
    for m in _read_avro(mlist):
        if int(m.get("content") or 0) != 1:
            continue
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
        for entry in _read_avro(mpath):
            if entry["status"] == 2:
                continue
            rec = entry["data_file"]
            content = int(rec.get("content") or 0)
            dpath = rec["file_path"]
            dpath = dpath if os.path.isabs(dpath) else os.path.join(table_path, dpath)
            if content == 1:
                pos_paths.append(dpath)
                del_rows[dpath] = int(rec.get("record_count") or 0)
            elif content == 2:
                ids = tuple(int(i) for i in (rec.get("equality_ids") or ()))
                if not ids:
                    raise IcebergFormatError(
                        "equality-delete file without equality_ids: "
                        f"{rec['file_path']}"
                    )
                seq = _entry_seq(entry, m)
                eq_groups.setdefault((seq, ids), []).append(dpath)
                del_rows[dpath] = int(rec.get("record_count") or 0)
            else:
                raise IcebergFormatError(
                    "non-delete file in a DELETE manifest "
                    f"(content={content}): {rec['file_path']}"
                )
    eq = sorted(
        [(seq, ids, sorted(paths)) for (seq, ids), paths in eq_groups.items()]
    )
    return sorted(set(pos_paths)), eq, del_rows


def _pos_delete_df(
    spark: SparkSession, table_path: str, snap: "IcebergSnapshot"
) -> DataFrame | None:
    """DISTRIBUTED (``__del_key``, ``__del_ridx``) frame over the
    snapshot's position-delete parquet — the anti-join side the shared
    positional reader subtracts. Each target path is exploded into its
    raw / root-stripped / root-joined spellings so the join matches
    whichever spelling the data manifest used (the driver can no longer
    normalize per target — it never sees the rows); extra spellings and
    dangling targets fall out of the anti-join naturally."""
    if not snap.pos_delete_files:
        return None
    import re as _re

    abs_root = os.path.abspath(table_path)
    df = spark.read.schema("file_path string, pos long").parquet(
        *snap.pos_delete_files
    )
    stripped = F.regexp_replace(
        F.col("file_path"), "^" + _re.escape(abs_root + "/"), ""
    )
    joined = F.when(
        F.col("file_path").startswith("/"), F.col("file_path")
    ).otherwise(F.concat(F.lit(abs_root + "/"), F.col("file_path")))
    return df.select(
        F.explode(
            F.array_distinct(F.array(F.col("file_path"), stripped, joined))
        ).alias("__del_key"),
        F.col("pos").alias("__del_ridx"),
    )


def read_iceberg(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    partition_filter: dict[str, set[str]] | None = None,
    ref: str | None = None,
    bounds_filter: dict[str, tuple[Any, Any]] | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Snapshot-consistent read (optionally time travel by snapshot id).

    ``partition_filter`` = {col: allowed string values} prunes at the
    MANIFEST-ENTRY level — excluded files are never listed, opened, or
    scheduled. Identity partition columns are stored only in manifest
    metadata (legal per the spec's identity-transform rule) and are
    re-attached via the same broadcast file-map join as the Delta
    reader; the data path is one ordinary parquet scan with full
    pushdown either way.

    ``bounds_filter`` = {col: (lo, hi)} inclusive range — DATA
    SKIPPING from the manifests' per-file lower/upper bounds: a file
    is pruned when its bounds prove no row can match. Files without
    bounds (older manifests, other writers) are conservatively kept;
    the caller still applies the real predicate, so pruning is a
    performance contract, never a correctness one. Bound values must
    compare against the bounds' JSON representation (numbers for
    numerics, ISO-8601 ``YYYY-MM-DD HH:MM:SS`` strings for
    timestamps) — the Delta reader's ``stats_filter`` contract.
    """
    from .deltalog import _read_files

    snap = snapshot_iceberg(
        table_path, snapshot_id, ref=ref, timestamp_ms=timestamp_ms
    )
    files = snap.files
    if bounds_filter:
        ids_by_name = {v: str(k) for k, v in snap.field_names_by_id.items()}
        unknown = set(bounds_filter) - set(ids_by_name)
        if unknown:
            raise ValueError(f"bounds_filter on unknown columns: {unknown}")

        def _survives(path: str) -> bool:
            lo_map = snap.files_lower.get(path)
            hi_map = snap.files_upper.get(path)
            if not lo_map or not hi_map:
                return True  # no bounds → cannot prune
            for c, (lo, hi) in bounds_filter.items():
                fid = ids_by_name[c]
                mn, mx = lo_map.get(fid), hi_map.get(fid)
                if mn is None or mx is None:
                    continue
                try:
                    if (hi is not None and mn > hi) or (
                        lo is not None and mx < lo
                    ):
                        return False
                except TypeError:
                    continue  # type mismatch → keep
            return True

        files = {p: pv for p, pv in files.items() if _survives(p)}

        def _transform_survives(p: str, pv: dict) -> bool:
            """Manifest-level pruning through ORDER-PRESERVING partition
            transforms (round 13): a file whose day/month/year/hour/
            truncate tuple value falls outside the transformed bound
            range holds no matching row. bucket/void fields are not
            order-preserving — those rows are filtered in-scan by the
            caller's predicate, never pruned here."""
            for tr in snap.spec_transforms.get(
                snap.files_pspec.get(p, -1), []
            ):
                src = tr["source"]
                if src not in bounds_filter:
                    continue
                if tr["transform"] in ("bucket", "void"):
                    continue
                v = pv.get(tr["name"])
                if v is None:
                    continue  # tuple value absent → cannot prune
                lo, hi = bounds_filter[src]
                try:
                    tlo = _transform_bound(tr, lo) if lo is not None else None
                    thi = _transform_bound(tr, hi) if hi is not None else None
                    # tuple values may arrive as strings (the manifest
                    # record encodes them nullable-string) — coerce to
                    # the transformed bound's type before comparing
                    ref = tlo if tlo is not None else thi
                    tv = int(v) if isinstance(ref, int) else str(v)
                    if tlo is not None and tv < tlo:
                        return False
                    if thi is not None and tv > thi:
                        return False
                except (TypeError, ValueError):
                    continue  # unusable bound/tuple spelling → keep
            return True

        files = {
            p: pv for p, pv in files.items() if _transform_survives(p, pv)
        }

    def _pcols_of(p: str) -> list[str]:
        return snap.spec_pcols.get(
            snap.files_pspec.get(p, -1), snap.partition_columns
        )

    if partition_filter:
        # a filter column must be an identity partition column in at
        # least one LIVE spec (else the caller misspelled it); files
        # whose own spec covers the column prune at the manifest level,
        # files from other specs keep the column in their DATA (it was
        # a regular column when they were written) and get an in-scan
        # filter below — same rows either way, pruning where possible
        spec_cols = set(snap.partition_columns)
        for cols in snap.spec_pcols.values():
            spec_cols |= set(cols)
        unknown = set(partition_filter) - spec_cols
        if unknown:
            raise ValueError(f"partition_filter on non-partition columns: {unknown}")
        files = {
            p: pv
            for p, pv in files.items()
            if all(
                pv.get(c) in allowed
                for c, allowed in partition_filter.items()
                if c in _pcols_of(p)
            )
        }

    pos_df = _pos_delete_df(spark, table_path, snap)

    def _scan(subset: dict) -> DataFrame:
        """One pushed-down scan per partition-spec class (files sharing
        identity partition columns), unioned back; single-spec tables
        take the one-scan path unchanged."""
        groups: dict[tuple[str, ...], dict] = {}
        for p, pv in subset.items():
            groups.setdefault(tuple(_pcols_of(p)), {})[p] = pv
        if not groups:
            groups[tuple(snap.partition_columns)] = {}
        frames: list[DataFrame] = []
        for cols, sub in sorted(groups.items()):
            part = _read_files(
                spark,
                table_path,
                sub,
                snap.schema,
                list(cols),
                deleted_positions_df=pos_df,
                deleted_positions_bound=snap.pos_delete_rows,
            )
            if partition_filter:
                for c in sorted(set(partition_filter) - set(cols)):
                    part = part.filter(
                        F.col(c)
                        .cast("string")
                        .isin(sorted(v for v in partition_filter[c] if v is not None))
                    )
            frames.append(part)
        out_ = frames[0]
        for f_ in frames[1:]:
            out_ = out_.unionByName(f_)
        return out_

    if not snap.equality_deletes:
        out = _scan(files)
    else:
        # EQUALITY deletes apply to data files STRICTLY OLDER than the
        # delete (data seq < delete seq — the spec's ordering rule), so
        # the file set partitions into equivalence classes by which
        # delete groups apply; each class is one ordinary pushed-down
        # scan followed by null-safe broadcast anti-joins against the
        # applicable delete frames, and the classes union back. Class
        # count is bounded by distinct (seq, ids) delete groups + 1 —
        # real tables keep this tiny because maintenance rewrites fold
        # deletes into data files; a runaway count fails loudly rather
        # than building an unbounded plan.
        groups = snap.equality_deletes
        if len(groups) > 16:
            raise IcebergFormatError(
                f"{len(groups)} distinct equality-delete groups; this "
                "reader bounds the class-split plan at 16 — compact the "
                "table's deletes first"
            )
        classes: dict[tuple[bool, ...], dict] = {}
        for pth, pv in files.items():
            fseq = snap.files_seq.get(pth, 0)
            key = tuple(fseq < g_seq for g_seq, _ids, _paths in groups)
            classes.setdefault(key, {})[pth] = pv
        parts: list[DataFrame] = []
        for key, subset in sorted(classes.items()):
            part = _scan(subset)
            for applies, (g_seq, ids, paths) in zip(key, groups):
                if not applies:
                    continue
                try:
                    cols = [snap.field_names_by_id[i] for i in ids]
                except KeyError as e:
                    raise IcebergFormatError(
                        f"equality-delete field id {e} not in the "
                        "snapshot schema"
                    ) from e
                dels = spark.read.parquet(*paths).select(*cols).dropDuplicates()
                # broadcast only while the manifests' record counts
                # bound the TOTAL key volume (r12 ADVICE: nothing used
                # to bound it); past the conf'd bound the anti-join
                # falls back to a shuffle join — slower but safe at any
                # delete volume (compaction is the real remedy:
                # rewrite_data_files folds the deletes away)
                from .deltalog import _dv_broadcast_max

                total_rows = sum(
                    snap.delete_file_rows.get(p, 0) for p in paths
                )
                if total_rows <= _dv_broadcast_max(spark):
                    dels = F.broadcast(dels)
                cond = None
                for c in cols:
                    term = part[c].eqNullSafe(dels[c])
                    cond = term if cond is None else (cond & term)
                part = part.join(dels, cond, "left_anti")
            parts.append(part)
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionAll(p_)
    if any(f.metadata for f in snap.schema.fields):
        # the parquet.field.id metadata did its job at the scan; strip
        # it from the RESULT so downstream schema comparisons see the
        # same plain schema as a name-resolved read
        out = out.select(
            *[F.col(c).alias(c, metadata={}) for c in out.columns]
        )
    return out


def files_meta(
    table_path: str, snapshot_id: int | None = None
) -> list[dict[str, Any]]:
    """The ``files`` metadata table: one row per live data file of a
    snapshot — path, identity partition values, record_count, size —
    read purely from manifests (no data file is opened). This is how
    Iceberg answers layout/maintenance questions (file counts, row
    skew, compaction targets) at metadata cost.
    """
    md = _current_metadata(table_path)
    snap_md = _resolve_snapshot_md(md, snapshot_id)
    return [
        {
            "file_path": rec["file_path"],
            "partition": dict(rec.get("partition") or {}),
            "record_count": rec["record_count"],
            "file_size_in_bytes": rec["file_size_in_bytes"],
        }
        for rec, _seq, _spec in _live_data_files(table_path, snap_md)
    ]


def rename_column_iceberg(table_path: str, old: str, new: str) -> int:
    """ALTER TABLE … RENAME COLUMN as Iceberg defines it: a METADATA-ONLY
    commit. The field keeps its ID and type; a new schema (new
    schema-id) binds the new name; no snapshot is created and no data
    file is touched. Reads of the LATEST state immediately show the new
    name — the parquet scan resolves columns by ``parquet.field.id``
    (``_ice_schema_to_spark(with_field_ids=True)``), so files written
    under the OLD name keep reading correctly — while time travel to
    pre-rename snapshots still shows the old name through the snapshot's
    own schema-id.

    Requires the ``pyiceberg-lite.field-ids`` table property (tables
    this writer created/overwrote): without footer field ids, id-based
    resolution would fail on every file. Partition-column renames are
    rejected — manifests key their partition records by NAME, so a
    renamed partition column would orphan every recorded partition
    value. Returns the new metadata version."""
    md = _current_metadata(table_path)
    _require_writable(md, "rename_column_iceberg")
    if not _has_field_ids(md):
        raise IcebergFormatError(
            "rename_column_iceberg requires the field-id table property "
            f"({_FIELD_IDS_PROP}); this table's data files were written "
            "without parquet field ids, so renamed columns could not be "
            "resolved — rewrite the table (mode='overwrite') first"
        )
    names = [f["name"] for f in md["schema"]["fields"]]
    if old not in names:
        raise ValueError(f"column {old!r} not in schema {names}")
    if new in names:
        raise ValueError(f"column {new!r} already exists in schema {names}")
    if old in {s["name"] for s in md.get("partition-spec", [])}:
        raise IcebergFormatError(
            f"renaming partition column {old!r} is not implemented "
            "(manifest partition records are keyed by name)"
        )
    schemas = list(md.get("schemas", []))
    new_schema = {
        "type": "struct",
        "schema-id": max((s["schema-id"] for s in schemas), default=-1) + 1,
        "fields": [
            {**f, "name": new if f["name"] == old else f["name"]}
            for f in md["schema"]["fields"]
        ],
    }
    schemas.append(new_schema)
    version = md["_version"] + 1
    new_md = {
        k: v for k, v in md.items() if k != "_version"
    }
    new_md["schema"] = new_schema
    new_md["schemas"] = schemas
    _publish_metadata(table_path, new_md, version)
    return version


def create_ref(
    table_path: str,
    name: str,
    ref_type: str = "branch",
    snapshot_id: int | None = None,
) -> int:
    """Create a named BRANCH (mutable head, advanced by
    ``write_iceberg(branch=...)``) or TAG (immutable label) pointing at
    ``snapshot_id`` (default: the current snapshot) — one metadata-only
    commit to the spec's ``refs`` registry. Branch/tag heads are GC
    roots: ``expire_snapshots`` never expires a snapshot a ref points
    at. Returns the referenced snapshot id. This is the audit-branch /
    reproducible-tag workflow at 100 TB: both cost one metadata write.
    """
    if ref_type not in ("branch", "tag"):
        raise ValueError(f"ref_type must be branch|tag, got {ref_type!r}")
    if name == "main":
        raise ValueError("'main' is the table's implicit branch")
    md = _current_metadata(table_path)
    _require_writable(md, "create_ref")
    refs = dict(md.get("refs") or {})
    if name in refs:
        raise ValueError(f"ref {name!r} already exists")
    snaps = {s["snapshot-id"] for s in md.get("snapshots", [])}
    sid = md.get("current-snapshot-id") if snapshot_id is None else snapshot_id
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in table history {sorted(snaps)}")
    refs[name] = {"snapshot-id": sid, "type": ref_type}
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["refs"] = refs
    _publish_metadata(table_path, new_md, md["_version"] + 1)
    return sid


def drop_ref(table_path: str, name: str) -> int:
    """Remove a branch or tag (metadata-only). The snapshots it pointed
    at stay in history — eligible for ``expire_snapshots`` once no
    other ref or the retention window holds them. Returns the snapshot
    id the dropped ref pointed at."""
    md = _current_metadata(table_path)
    _require_writable(md, "drop_ref")
    refs = dict(md.get("refs") or {})
    if name not in refs:
        raise ValueError(f"unknown ref {name!r} (refs: {sorted(refs)})")
    sid = refs.pop(name)["snapshot-id"]
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["refs"] = refs
    _publish_metadata(table_path, new_md, md["_version"] + 1)
    return sid


def evolve_partition_spec(
    table_path: str, partition_by: tuple[str, ...]
) -> int:
    """ALTER TABLE … partition evolution as Iceberg defines it: a
    METADATA-ONLY commit that registers a new partition spec (new
    spec-id) and makes it the table default for FUTURE writes. No data
    moves — existing files stay under the spec they were written with
    (their manifests keep that spec id), and the reader resolves each
    file's partition columns through ITS manifest's spec, scanning
    mixed-spec snapshots as one union of per-spec classes. This is the
    at-scale answer to "we partitioned by day, we need day+tenant now":
    a 100 TB table re-specs in one metadata write instead of a rewrite,
    queries prune new data on the new columns immediately, and old data
    prunes on whatever its own spec recorded. Returns the new default
    spec id. Identity transforms only (this writer's surface);
    evolving TO a spec the table already used re-activates that spec id
    rather than minting a new one, per the spec's registry semantics.
    """
    md = _current_metadata(table_path)
    _require_writable(md, "evolve_partition_spec")
    name_to_id = {f["name"]: f["id"] for f in md["schema"]["fields"]}
    unknown = [c for c in partition_by if c not in name_to_id]
    if unknown:
        raise ValueError(f"partition_by columns not in schema: {unknown}")
    cur = [s["name"] for s in md.get("partition-spec", [])]
    if list(partition_by) == cur:
        raise ValueError(f"table is already partitioned by {cur}")
    spec = [
        {
            "name": c,
            "transform": "identity",
            "source-id": name_to_id[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(partition_by)
    ]
    specs = list(md.get("partition-specs", []))
    smatch = next((s for s in specs if s["fields"] == spec), None)
    if smatch is None:
        spec_id = max((s["spec-id"] for s in specs), default=-1) + 1
        specs.append({"spec-id": spec_id, "fields": spec})
    else:
        spec_id = smatch["spec-id"]
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["partition-spec"] = spec
    new_md["partition-specs"] = specs
    _publish_metadata(table_path, new_md, md["_version"] + 1)
    return spec_id


def rollback_iceberg(table_path: str, snapshot_id: int) -> int:
    """Roll the table back to an earlier snapshot (Iceberg's
    ``rollback_to_snapshot``): a metadata-only commit that points
    ``current-snapshot-id`` at the target. History-preserving — every
    snapshot stays in the metadata and time travel still reaches the
    rolled-back ones (``expire_snapshots`` is the separate, explicit way
    to drop them). The target's manifests/files must still be reachable,
    which the metadata tree guarantees unless expiry removed the
    snapshot — that case fails the lookup loudly. Returns the new
    metadata version."""
    md = _current_metadata(table_path)
    _require_writable(md, "rollback_iceberg")
    snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in table history {sorted(snaps)}"
        )
    if snapshot_id == md.get("current-snapshot-id"):
        raise ValueError(f"snapshot {snapshot_id} is already current")
    version = md["_version"] + 1
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["current-snapshot-id"] = snapshot_id
    _publish_metadata(table_path, new_md, version)
    return version


def snapshots(table_path: str) -> list[dict[str, Any]]:
    """Snapshot audit trail (id, operation, timestamp), newest first."""
    md = _current_metadata(table_path)
    return sorted(
        [
            {
                "snapshot_id": s["snapshot-id"],
                "operation": s.get("summary", {}).get("operation"),
                "timestamp_ms": s.get("timestamp-ms"),
            }
            for s in md.get("snapshots", [])
        ],
        key=lambda r: -r["snapshot_id"],
    )


# ---------------------------------------------------------------------------
# writer (fixture-grade: append / overwrite snapshots, atomic metadata swap)
# ---------------------------------------------------------------------------

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
        # v2: 0 = data manifest, 1 = delete manifest; the commit's
        # sequence number inherits to entries with a null seq
        {"name": "content", "type": "int", "default": 0},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
    ],
}

#: delete-manifest entry schema (v2): data_file.content distinguishes
#: position (1) from equality (2) deletes; position-delete parquets are
#: the spec's two-column (file_path, pos) shape, equality deletes carry
#: the field ids their rows match on; neither carries a partition
_DELETE_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "default": None,
                    },
                ],
            },
        },
    ],
}

def _manifest_schema(pcols: tuple[str, ...] = ()) -> dict:
    """Manifest-entry Avro schema; the data_file.partition record carries
    one nullable string field per identity partition column."""
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {
                                        "name": c,
                                        "type": ["null", "string"],
                                        "default": None,
                                    }
                                    for c in pcols
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        # per-file column bounds for scan planning (the
                        # spec's lower_bounds/upper_bounds, here keyed
                        # by STRINGIFIED field id with JSON-encoded
                        # values instead of binary single-value
                        # serialization). Nullable: manifests written
                        # before this field (or by other writers) read
                        # back as None → the reader cannot prune.
                        {
                            "name": "lower_bounds",
                            "type": ["null", {"type": "map", "values": "string"}],
                            "default": None,
                        },
                        {
                            "name": "upper_bounds",
                            "type": ["null", {"type": "map", "values": "string"}],
                            "default": None,
                        },
                    ],
                },
            },
        ],
    }


_MANIFEST_SCHEMA = _manifest_schema(())


def _bounds_by_field_id(
    path: str, field_names: list[str]
) -> tuple[dict[str, str] | None, dict[str, str] | None]:
    """(lower_bounds, upper_bounds) for one data file, keyed by the
    stringified POSITIONAL field id (i+1 — identical to the
    ``parquet.field.id`` stamping the file itself carries), values
    JSON-encoded so numerics compare as numbers after decode. Reuses
    the Delta writer's footer-stats collector (metadata-only read;
    truncated string statistics rejected there)."""
    from .deltalog import _footer_stats

    raw = _footer_stats(path)
    if raw is None:
        return None, None
    st = json.loads(raw)
    ids = {name: str(i + 1) for i, name in enumerate(field_names)}
    lb = {
        ids[c]: json.dumps(v)
        for c, v in (st.get("minValues") or {}).items()
        if c in ids
    }
    ub = {
        ids[c]: json.dumps(v)
        for c, v in (st.get("maxValues") or {}).items()
        if c in ids
    }
    return (lb or None), (ub or None)


def _stage_data_manifest(
    df: DataFrame,
    table_path: str,
    pcols: tuple[str, ...],
    snap_id: int,
    data_fields: list[str] | None = None,
) -> tuple[str, int, list[tuple[str, int, int, dict[str, str | None]]]]:
    """Parallel staged data write → move under ``data/`` with uuid names
    → ONE data manifest for the added files. Identity partition values
    come from the hive-layout staging dirs (the data files omit the
    partition columns — legal per the spec's identity transform, the
    reader fills them from manifest metadata). Parquet field ids are
    stamped positionally (id-based resolution across renames).
    record_count comes from a footer-only read on the committer, the
    same place a real Iceberg writer collects per-task stats. Returns
    ``(manifest_rel, manifest_length, data_files)``. Shared by
    ``write_iceberg`` and ``upsert_iceberg``."""
    from .deltalog import _pv_from_relpath

    # field ids stamp the TABLE columns only (``data_fields``);
    # transformed-partition staging columns ride along un-id'd — they
    # exist solely to steer partitionBy and never land in a data file
    data_fields = data_fields or df.schema.fieldNames()
    df = df.select(
        *[
            F.col(n).alias(n, metadata={"parquet.field.id": i + 1})
            for i, n in enumerate(data_fields)
        ],
        *[F.col(c) for c in df.columns if c not in data_fields],
    )
    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex[:12]}")
    writer = df.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(staging)
    import pyarrow.parquet as _pq

    data_files: list[tuple[str, int, int, dict[str, str | None]]] = []
    for root, _dirs, names in os.walk(staging):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            pv = _pv_from_relpath(os.path.relpath(src, staging), list(pcols))
            rel = os.path.join(_DATA, f"part-{uuid.uuid4().hex}.parquet")
            dst = os.path.join(table_path, rel)
            os.replace(src, dst)
            nrows = _pq.read_metadata(dst).num_rows
            lb, ub = _bounds_by_field_id(dst, data_fields)
            data_files.append((rel, os.path.getsize(dst), nrows, pv, lb, ub))
    shutil.rmtree(staging, ignore_errors=True)

    manifest_rel = os.path.join(_META, f"{uuid.uuid4().hex}-m0.avro")
    _write_avro(
        os.path.join(table_path, manifest_rel),
        _manifest_schema(pcols),
        [
            (
                1,
                snap_id,
                {
                    "file_path": rel,
                    "file_format": "parquet",
                    "partition": pv,
                    "record_count": nrows,
                    "file_size_in_bytes": size,
                    "lower_bounds": lb,
                    "upper_bounds": ub,
                },
            )
            for rel, size, nrows, pv, lb, ub in data_files
        ],
    )
    mlen = os.path.getsize(os.path.join(table_path, manifest_rel))
    return manifest_rel, mlen, data_files


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
    operation: str | None = None,
    base_version: int | None = None,
    summary_extra: dict[str, Any] | None = None,
    branch: str | None = None,
) -> int:
    """Commit ``df`` as one Iceberg snapshot; returns the snapshot id.

    ``branch`` targets a named branch created by ``create_ref``: the
    commit's parent is the BRANCH head (an append carries that head's
    manifests, not main's), and the commit advances ``refs[branch]``
    while ``current-snapshot-id`` (main) stays untouched — the
    write-audit-publish pattern: audit a branch, then fast-forward main
    via ``rollback_iceberg`` or merge tooling. Tags are immutable:
    writing to one raises.

    append: new manifest with the added files; the new manifest list
    references it PLUS every manifest of the previous snapshot (old
    manifests are immutable and shared between snapshots — the spec's
    amortization of metadata writes). overwrite: the new manifest list
    references only the new manifest, so prior files fall out of the
    snapshot while remaining readable via time travel. The commit is an
    O_EXCL create of the next ``vN.metadata.json`` + version-hint swap.

    ``operation`` overrides the snapshot-summary operation label (spec
    vocabulary: append/overwrite/replace/delete); ``rewrite_data_files``
    uses it to record compaction as ``replace``, the spec's name for a
    commit that changes files but not table content.

    ``base_version`` pins the metadata version this commit must build
    on: the writer reads THAT version and publishes base+1, so the
    O_EXCL create turns a concurrent commit into
    ``IcebergConcurrentCommitError`` instead of silently building on
    newer state. Read-modify-write callers (``rewrite_data_files``)
    pass the version they resolved their content from — the validation
    real Iceberg's rewrite action performs. On a LOST race the staged
    data files, manifest, and manifest list written for the failed
    commit are deleted (they are referenced by no published metadata)
    so retries never leave permanent orphans under ``data/``.

    ``summary_extra`` merges extra keys into the snapshot summary —
    ``rewrite_data_files`` records ``replaced-snapshot-ids`` there, the
    provenance the streaming source needs to detect that a compaction
    is the only surviving holder of expired snapshots' rows.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_meta_dir(table_path), exist_ok=True)
    os.makedirs(os.path.join(table_path, _DATA), exist_ok=True)

    prev_md: dict[str, Any] | None
    if base_version is not None:
        with open(
            os.path.join(_meta_dir(table_path), f"v{base_version}.metadata.json"),
            encoding="utf-8",
        ) as fh:
            prev_md = json.load(fh)
        prev_md["_version"] = base_version
    else:
        try:
            prev_md = _current_metadata(table_path)
        except FileNotFoundError:
            prev_md = None
    if prev_md is not None:
        _require_writable(prev_md, "write_iceberg")
    version = 1 if prev_md is None else prev_md["_version"] + 1
    snap_id = version  # deterministic, monotonic

    # resolve the commit's PARENT snapshot: the branch head when a
    # branch is targeted, else main (current-snapshot-id)
    parent_sid: int | None = None
    if prev_md is not None:
        if branch is not None:
            r = (prev_md.get("refs") or {}).get(branch)
            if r is None:
                raise ValueError(
                    f"unknown branch {branch!r}; create_ref() it first"
                )
            if r.get("type") != "branch":
                raise ValueError(f"ref {branch!r} is a tag; tags are immutable")
            parent_sid = r["snapshot-id"]
        else:
            parent_sid = prev_md.get("current-snapshot-id")
    elif branch is not None:
        raise ValueError("cannot create a table on a branch; write main first")

    # 0. schema + contract validation BEFORE any data lands: a failed
    # append must not strand freshly-moved data files under data/
    ice_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {
                "id": i + 1,
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_type_to_ice(f.dataType),
            }
            for i, f in enumerate(df.schema.fields)
        ],
    }
    name_to_id = {f["name"]: f["id"] for f in ice_schema["fields"]}
    # hidden partitioning (round 13): partition_by entries may be
    # functional — "day(ts)", "month(ts)", "year(ts)", "hour(ts)",
    # "bucket(N, col)", "truncate(W, col)" — alongside plain identity
    # column names, mirroring PARTITIONED BY in Spark SQL DDL
    pfields = _parse_partition_by(partition_by)
    unknown = [p["source"] for p in pfields if p["source"] not in name_to_id]
    if unknown:
        raise ValueError(f"partition_by columns not in schema: {unknown}")

    def _spec_transform(p: dict) -> str:
        if p["transform"] in ("bucket", "truncate"):
            return f"{p['transform']}[{p['n']}]"
        return p["transform"]

    if prev_md is not None and mode == "append":
        prev_fields = [
            (s["name"], s.get("transform", "identity"), s["source-id"])
            for s in prev_md.get("partition-spec", [])
        ]
        new_fields = [
            (p["field_name"], _spec_transform(p), name_to_id[p["source"]])
            for p in pfields
        ]
        if prev_fields != new_fields:
            raise ValueError(
                f"append with partition_by={list(partition_by)} "
                f"(spec {new_fields}) but table spec is {prev_fields}"
            )
        # appends reuse the previous snapshot's manifests, whose files
        # were written under the TABLE schema — a silently replaced
        # schema would misread them (dropped/renamed columns vanish,
        # retyped columns corrupt). Exact (name, type) match required;
        # changing the schema takes an overwrite, which versions it.
        prev_sig = [
            (f["name"], f["type"]) for f in prev_md["schema"]["fields"]
        ]
        new_sig = [(f["name"], f["type"]) for f in ice_schema["fields"]]
        if prev_sig != new_sig:
            raise ValueError(
                f"append schema {new_sig} != table schema {prev_sig}; "
                "schema changes require mode='overwrite'"
            )
        # writer duty (spec: "required" fields must be non-null): the
        # TABLE schema's required flags win — Spark nullability is a
        # static over-approximation, so validate the rows themselves,
        # all required fields fused into one predicate pass
        req = [
            f["name"]
            for f in prev_md["schema"]["fields"]
            if f.get("required")
        ]
        if req:
            # backtick-quote: a required column named like a keyword or
            # containing spaces must not break the SQL predicate
            cond = " OR ".join(f"`{c}` IS NULL" for c in req)
            bad = df.filter(F.expr(cond)).limit(1).collect()
            if bad:
                raise ValueError(
                    f"append violates required (non-null) fields {req}: "
                    f"{bad[0].asDict()}"
                )

    # 0b. resolve this write's partition spec id BEFORE building any
    # metadata that references it — the manifest-list entry must carry
    # the REAL spec id (partition evolution makes ids > 0 routine; a
    # hardcoded 0 mis-attributes every post-evolution manifest)
    spec = [
        {
            "name": p["field_name"],
            "transform": _spec_transform(p),
            "source-id": name_to_id[p["source"]],
            "field-id": 1000 + i,
        }
        for i, p in enumerate(pfields)
    ]
    specs = list(prev_md.get("partition-specs", [])) if prev_md else []
    smatch = next((s for s in specs if s["fields"] == spec), None)
    if smatch is None:
        spec_id = max((s["spec-id"] for s in specs), default=-1) + 1
        specs.append({"spec-id": spec_id, "fields": spec})
    else:
        spec_id = smatch["spec-id"]

    # 1+2. parallel data write + data manifest (shared with upsert).
    # Transformed fields: compute the TUPLE value as a staging-only
    # column named exactly like the spec field and partition the write
    # by it — the source column stays IN the data files (unlike
    # identity, whose values live in manifest metadata only), which is
    # what lets the reader filter bucket rows in-scan.
    stage_df = df
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    dir_cols: list[str] = []
    for p in pfields:
        if p["transform"] == "identity":
            dir_cols.append(p["source"])
        else:
            # The staging column doubles as the partition DIRECTORY name,
            # so it must be named exactly like the spec field — which
            # means a REAL column of that name would be silently
            # overwritten (and its data dropped from the files while
            # data_fields still lists it). Refuse instead (ADVICE r14).
            if p["field_name"] in dtypes:
                raise ValueError(
                    f"write_iceberg: partition transform field "
                    f"{p['field_name']!r} collides with an existing "
                    "DataFrame column — rename the column or the "
                    "transform's source"
                )
            stage_df = stage_df.withColumn(
                p["field_name"],
                _transform_column(F.col(p["source"]), p, dtypes[p["source"]]),
            )
            dir_cols.append(p["field_name"])
    manifest_rel, mlen, data_files = _stage_data_manifest(
        stage_df,
        table_path,
        tuple(dir_cols),
        snap_id,
        data_fields=df.schema.fieldNames(),
    )

    # 3. manifest list = new manifest (+ the PARENT snapshot's, on
    # append — the branch head's when committing to a branch). Carried
    # entries keep their content flag and sequence number: dropping
    # either would turn a delete manifest into a data manifest or
    # re-order the row-delete timeline.
    entries: list[tuple] = [(manifest_rel, mlen, spec_id, snap_id, 0, snap_id)]
    if mode == "append" and prev_md is not None and prev_md.get("snapshots"):
        cur = {s["snapshot-id"]: s for s in prev_md["snapshots"]}[parent_sid]
        prev_list = cur["manifest-list"]
        prev_list = (
            prev_list if os.path.isabs(prev_list) else os.path.join(table_path, prev_list)
        )
        for m in _read_avro(prev_list):
            entries.append(
                (
                    m["manifest_path"],
                    m["manifest_length"],
                    m["partition_spec_id"],
                    m["added_snapshot_id"],
                    int(m.get("content") or 0),
                    m.get("sequence_number"),
                )
            )
    mlist_rel = os.path.join(_META, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
    _write_avro(os.path.join(table_path, mlist_rel), _MANIFEST_LIST_SCHEMA, entries)

    # 4. metadata JSON + atomic publish
    # versioned schema/spec registries: time travel resolves a snapshot
    # through its own schema-id/spec-id, so an overwrite that changes
    # either never rewrites how OLD snapshots read (finding: resolving
    # old manifests with the head's definitions nulls their partition
    # columns and drops their fields)
    schemas = list(prev_md.get("schemas", [])) if prev_md else []
    sig_of = lambda s: [(f["name"], f["type"]) for f in s["fields"]]  # noqa: E731
    match = next(
        (s for s in schemas if sig_of(s) == sig_of(ice_schema)), None
    )
    if match is None:
        schema_id = max((s["schema-id"] for s in schemas), default=-1) + 1
        ice_schema = {**ice_schema, "schema-id": schema_id}
        schemas.append(ice_schema)
    else:
        schema_id = match["schema-id"]
        ice_schema = match

    snaps = list(prev_md["snapshots"]) if prev_md else []
    snaps.append(
        {
            "snapshot-id": snap_id,
            "timestamp-ms": snap_id,  # deterministic fixture clock
            "manifest-list": mlist_rel,
            "summary": {
                "operation": operation or mode,
                **(summary_extra or {}),
            },
            "schema-id": schema_id,
            "spec-id": spec_id,
        }
    )
    # field-id property: tables this writer CREATES (and overwrites,
    # which replace every file) are fully id-stamped → id-based reads
    # and renames are safe; appends to a pre-property table keep it
    # unset because the old files lack ids
    props = dict((prev_md.get("properties") or {}) if prev_md else {})
    if prev_md is None or mode == "overwrite":
        props[_FIELD_IDS_PROP] = "true"
    # refs carry across every commit; a branch commit advances ITS ref
    # and leaves main (current-snapshot-id) where it was
    refs_out = dict((prev_md.get("refs") or {}) if prev_md else {})
    if branch is not None:
        refs_out[branch] = {"snapshot-id": snap_id, "type": "branch"}
    md = {
        # v2 sticks once row-level deletes upgraded the table
        "format-version": int(prev_md.get("format-version", 1)) if prev_md else 1,
        "table-uuid": prev_md["table-uuid"] if prev_md else uuid.uuid4().hex,
        "location": table_path,
        "schema": ice_schema,
        "schemas": schemas,
        "partition-spec": spec,
        "partition-specs": specs,
        "current-snapshot-id": (
            prev_md["current-snapshot-id"] if branch is not None else snap_id
        ),
        "snapshots": snaps,
        "properties": props,
        "refs": refs_out,
    }
    try:
        _publish_metadata(table_path, md, version)
    except IcebergConcurrentCommitError:
        # the loser of the commit race must not leave orphans: its data
        # files, manifest, and manifest list are referenced by no
        # published metadata (the winner built on the same base), so a
        # raced rewrite would otherwise strand a full copy of the table
        for rel, _size, _nrows, _pv, _lb, _ub in data_files:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(table_path, rel))
        with contextlib.suppress(OSError):
            os.remove(os.path.join(table_path, manifest_rel))
        with contextlib.suppress(OSError):
            os.remove(os.path.join(table_path, mlist_rel))
        raise
    return snap_id


def _publish_metadata(table_path: str, md: dict[str, Any], version: int) -> None:
    """Atomic metadata publish: O_EXCL create of ``vN.metadata.json``
    (put-if-absent — the loser of a concurrent commit race gets
    ``IcebergConcurrentCommitError``, never a silent overwrite) followed
    by an atomic version-hint swap so a concurrent reader never sees a
    truncated/empty hint mid-write."""
    meta_path = os.path.join(_meta_dir(table_path), f"v{version}.metadata.json")
    try:
        fd = os.open(meta_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        raise IcebergConcurrentCommitError(
            f"metadata version {version} already committed in {table_path}"
        ) from e
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(md, fh)
        fh.flush()
        os.fsync(fh.fileno())
    hint = os.path.join(_meta_dir(table_path), "version-hint.text")
    tmp = hint + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, hint)


# ---------------------------------------------------------------------------
# table maintenance: compaction + snapshot expiry
# ---------------------------------------------------------------------------


def rewrite_data_files(
    spark: SparkSession,
    table_path: str,
    target_files: int = 1,
    sort_by: tuple[str, ...] = (),
) -> dict[str, int]:
    """Compaction (Iceberg's ``rewrite_data_files`` action): read the
    CURRENT snapshot, rewrite its content into ``target_files`` files
    (up to ``target_files`` per identity partition, for partitioned
    tables), and commit the result as a ``replace`` snapshot — same
    rows, fewer files. Prior snapshots stay readable via time travel;
    ``expire_snapshots`` later reclaims their storage. The commit pins
    the metadata version the content was read from, so a concurrent
    append between read and publish raises
    ``IcebergConcurrentCommitError`` instead of being silently erased.

    ``sort_by`` implements Iceberg's sort-order rewrite: rows sort
    WITHIN each output task on the given columns before writing, so the
    rewritten files carry tight per-file min/max ranges on those columns
    — the property that makes post-compaction scans prunable by footer
    statistics (Spark's parquet row-group skipping; Iceberg
    lower/upper_bounds on real writers). Local sorts only, never a
    global exchange.

    Scale: the data rewrite is one distributed read + repartition +
    write (linear, no driver funnel); only file-level metadata touches
    the driver, per the spec's design. At 100 TB this is the job that
    keeps scan-task counts proportional to bytes, not to commit count —
    a table fed by many small appends otherwise degrades every reader.

    Returns ``{"snapshot_id", "files_before", "files_after"}``.
    """
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    base_md = _current_metadata(table_path)
    _require_writable(base_md, "rewrite_data_files")
    _require_identity_spec(base_md, "rewrite_data_files")
    base_version = base_md["_version"]
    prev = snapshot_iceberg(table_path)
    df = read_iceberg(spark, table_path)

    # provenance: the snapshot ids whose rows this replace will be
    # carrying — the live entries' adding snapshots, expanded through
    # any earlier replace's own recorded provenance (already
    # transitive, so one level suffices). The streaming source uses
    # this to fail loudly when expire_snapshots later makes the replace
    # the ONLY holder of some snapshot's rows (which _added_files can
    # no longer attribute to any offset range).
    snap_md = _resolve_snapshot_md(base_md, None)
    live_ids: set[int] = set()
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
    for m in _read_avro(mlist):
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
        for entry in _read_avro(mpath):
            if entry["status"] == 2:
                continue
            # spec: a null entry snapshot_id means snapshot-id
            # INHERITANCE — the entry was added by the snapshot that
            # added the manifest (manifest-list added_snapshot_id).
            # Externally-produced tables use this; dropping such
            # entries would let their rows escape the stream's
            # compaction+expiry loss guard, so if neither id is
            # present we refuse rather than under-record provenance.
            sid = entry.get("snapshot_id")
            if sid is None:
                sid = m.get("added_snapshot_id")
            if sid is None:
                raise RuntimeError(
                    "pyiceberg-lite rewrite_data_files: live manifest "
                    f"entry in {mpath} has no snapshot_id and its "
                    "manifest-list entry has no added_snapshot_id; "
                    "cannot record replaced-snapshot provenance (the "
                    "streaming loss guard depends on it) — compact this "
                    "externally-produced table with its own writer"
                )
            live_ids.add(sid)
    summaries = {
        s["snapshot-id"]: s.get("summary", {})
        for s in base_md.get("snapshots", [])
    }
    replaced: set[int] = set()
    for sid in live_ids:
        replaced.add(sid)
        replaced.update(summaries.get(sid, {}).get("replaced-snapshot-ids", []))
    pcols = tuple(prev.partition_columns)
    if pcols and target_files == 1:
        # one shuffle keyed on the partition columns: each identity
        # partition's rows land in exactly one task → one file each
        df = df.repartition(*[df[c] for c in pcols])
    elif pcols:
        # target_files > 1: a salt splits each identity partition across
        # up to `target_files` tasks (hashing on pcols alone would put a
        # whole partition in ONE task, silently ignoring target_files);
        # the salt never reaches the written files. Derived from ROW
        # CONTENT (xxhash64 of every column), not from the physical
        # partition layout, so repeated rewrites of the same snapshot
        # produce the same file assignment regardless of how the read
        # happened to parallelize. ``target_files`` is an UPPER BOUND
        # per identity partition: content hashing may leave some salt
        # buckets empty.
        from pyspark.sql import functions as F

        spread = max(
            target_files, spark.sparkContext.defaultParallelism
        ) * target_files
        df = (
            df.withColumn(
                "_rdf_salt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns]),
                    F.lit(target_files),
                ).cast("int"),
            )
            .repartition(spread, *[F.col(c) for c in pcols], F.col("_rdf_salt"))
            .drop("_rdf_salt")
        )
    elif sort_by:
        # range partitioning + local sort = globally sorted layout with
        # DISJOINT per-file ranges — maximal footer-stat pruning
        df = df.repartitionByRange(target_files, *[df[c] for c in sort_by])
    else:
        df = df.repartition(target_files)
    if sort_by:
        df = df.sortWithinPartitions(*[df[c] for c in sort_by])
    snap_id = write_iceberg(
        spark, df, table_path, mode="overwrite",
        partition_by=pcols, operation="replace",
        base_version=base_version,
        summary_extra={"replaced-snapshot-ids": sorted(replaced)},
    )
    new = snapshot_iceberg(table_path)
    return {
        "snapshot_id": snap_id,
        "files_before": len(prev.files),
        "files_after": len(new.files),
    }


def _manifest_schema_seq(pcols: tuple[str, ...] = ()) -> dict:
    """``_manifest_schema`` plus an optional per-entry
    ``data_sequence_number`` — written only by ``rewrite_manifests``,
    whose consolidated manifests carry entries from MANY source
    snapshots: each entry must keep its own v2 data sequence number
    (``_entry_seq`` reads it first) or equality-delete applicability
    (data seq < delete seq) would silently shift to the rewrite's
    sequence and resurrect deleted rows."""
    base = _manifest_schema(pcols)
    base["fields"].append(
        {
            "name": "data_sequence_number",
            "type": ["null", "long"],
            "default": None,
        }
    )
    return base


def rewrite_manifests(table_path: str, target_manifests: int = 1) -> dict[str, int]:
    """Manifest compaction (Iceberg's ``rewrite_manifests`` action):
    merge the current snapshot's DATA manifests into
    ``target_manifests`` consolidated manifest(s) per partition spec and
    commit as a metadata-only ``replace`` snapshot. No data file is
    read, moved, or rewritten — only the metadata tree shrinks.

    Why it exists at 100 TB: a table fed by thousands of appends
    accumulates one manifest per commit, so every planner walk
    (snapshot resolution, partition pruning, files_meta) pays O(commits)
    file opens even when the file COUNT is modest. Consolidation makes
    the walk O(live files / manifest capacity) — planning cost tracks
    table size again, not commit history (the lakehouse_stress metric).

    Preserved per entry, verbatim: the data_file record (bounds keep
    data skipping working), the adding ``snapshot_id`` (streaming/
    incremental attribution and the expired-snapshot loss guard both
    key on it), and the v2 data sequence number via the explicit
    ``data_sequence_number`` field (equality-delete ordering). DELETE
    manifests (content=1) are carried through untouched. Concurrency:
    the commit pins the base metadata version — a concurrent writer
    wins the O_EXCL race and this rewrite raises
    ``IcebergConcurrentCommitError`` after cleaning up its staged
    manifests.

    Returns ``{"snapshot_id", "manifests_before", "manifests_after",
    "entries"}`` (data-manifest counts; no-ops — already at or below
    target — return the current snapshot id unchanged with a 0 entry
    count).
    """
    if target_manifests < 1:
        raise ValueError(f"target_manifests must be >= 1, got {target_manifests}")
    base_md = _current_metadata(table_path)
    _require_writable(base_md, "rewrite_manifests")
    base_version = base_md["_version"]
    snap_md = _resolve_snapshot_md(base_md, None)
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)

    carried: list[tuple] = []  # delete-manifest rows, verbatim
    by_spec: dict[int, list[tuple[int, int | None, dict, int]]] = {}
    n_data_manifests = 0
    for m in _read_avro(mlist):
        if int(m.get("content") or 0) == 1:
            carried.append(
                (
                    m["manifest_path"],
                    m["manifest_length"],
                    m["partition_spec_id"],
                    m["added_snapshot_id"],
                    1,
                    m.get("sequence_number"),
                )
            )
            continue
        n_data_manifests += 1
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
        spec_id = int(m.get("partition_spec_id") or 0)
        for entry in _read_avro(mpath):
            if entry["status"] == 2:
                continue
            sid = entry.get("snapshot_id")
            if sid is None:
                sid = m.get("added_snapshot_id")
            if sid is None:
                raise RuntimeError(
                    "pyiceberg-lite rewrite_manifests: live entry in "
                    f"{mpath} has no snapshot_id and its manifest-list "
                    "entry has no added_snapshot_id; consolidating it "
                    "would erase stream-attribution provenance — "
                    "compact this externally-produced table with its "
                    "own writer"
                )
            by_spec.setdefault(spec_id, []).append(
                (entry["status"], int(sid), entry["data_file"], _entry_seq(entry, m))
            )

    n_specs = len(by_spec) or 1
    if n_data_manifests <= target_manifests * n_specs:
        return {
            "snapshot_id": snap_md["snapshot-id"],
            "manifests_before": n_data_manifests,
            "manifests_after": n_data_manifests,
            "entries": 0,
        }

    version = base_version + 1
    snap_id = version
    spec_fields = {
        s["spec-id"]: tuple(f["name"] for f in s["fields"])
        for s in base_md.get("partition-specs", [])
    }
    # the data_file record re-encodes under _manifest_schema's field
    # set; unknown writer extras (none from this writer) are dropped,
    # bounds and partition values survive verbatim
    known = (
        "file_path", "file_format", "partition", "record_count",
        "file_size_in_bytes", "lower_bounds", "upper_bounds",
    )
    staged: list[str] = []
    entries: list[tuple] = []
    n_entries = 0
    for spec_id, rows in sorted(by_spec.items()):
        pcols = spec_fields.get(spec_id, ())
        rel = os.path.join(_META, f"{uuid.uuid4().hex}-rm0.avro")
        _write_avro(
            os.path.join(table_path, rel),
            _manifest_schema_seq(pcols),
            [
                (
                    status,
                    sid,
                    {k: rec.get(k) for k in known},
                    seq,
                )
                for status, sid, rec, seq in rows
            ],
        )
        staged.append(rel)
        n_entries += len(rows)
        entries.append(
            (
                rel,
                os.path.getsize(os.path.join(table_path, rel)),
                spec_id,
                snap_id,
                0,
                snap_id,  # list-level seq; entries carry their own
            )
        )
    entries.extend(carried)
    mlist_rel = os.path.join(_META, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
    _write_avro(os.path.join(table_path, mlist_rel), _MANIFEST_LIST_SCHEMA, entries)
    staged.append(mlist_rel)

    snaps = list(base_md["snapshots"])
    snaps.append(
        {
            "snapshot-id": snap_id,
            "timestamp-ms": snap_id,  # deterministic fixture clock
            "manifest-list": mlist_rel,
            "summary": {
                "operation": "replace",
                "manifests-replaced": n_data_manifests,
                "manifests-created": len(by_spec),
                "rewritten-data-files": 0,
            },
            "schema-id": snap_md.get("schema-id", 0),
            "spec-id": snap_md.get("spec-id", 0),
        }
    )
    md = {
        **{k: v for k, v in base_md.items() if not k.startswith("_")},
        "current-snapshot-id": snap_id,
        "snapshots": snaps,
    }
    try:
        _publish_metadata(table_path, md, version)
    except IcebergConcurrentCommitError:
        for rel in staged:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(table_path, rel))
        raise
    return {
        "snapshot_id": snap_id,
        "manifests_before": n_data_manifests,
        "manifests_after": len(by_spec),
        "entries": n_entries,
    }


def delete_where_iceberg(
    spark: SparkSession, table_path: str, condition
) -> dict[str, int]:
    """Merge-on-read row DELETE via the spec's POSITION DELETES — the
    Iceberg twin of ``deltalog.delete_where(mode="deletion-vectors")``.

    No data file is read beyond the match probe or written at all: the
    matched (file, row position) pairs are written BY TASKS into
    two-column delete parquet shards under ``data/`` (repartitioned by
    target file, sorted within shards), referenced by a new DELETE
    manifest (content=1, one entry per shard) whose manifest list
    carries the parent snapshot's manifests unchanged — the driver
    handles only O(delete files) footers and paths, never per-row
    positions. The first MOR delete upgrades the table to
    format-version 2 and stamps ``spark-graft.row-deletes`` — the
    marker that keeps the table WRITABLE by this module (external v2
    tables stay batch-read-only). Readers subtract the positions via
    the shared positional anti-join; ``rewrite_data_files`` later folds
    accumulated deletes into data (its overwrite drops the delete
    manifests, and it reads through them first). At 100 TB: deleting a
    few rows per 1 GB file costs a delete-count-sized parquet plus one
    manifest, not a rewrite. Rows with a NULL predicate are kept (SQL
    DELETE semantics). Returns ``{"snapshot_id", "files_touched",
    "rows_deleted"}`` (no-op: current snapshot, 0, 0).
    """
    from .deltalog import _read_files

    md = _current_metadata(table_path)
    _require_writable(md, "delete_where_iceberg")
    _require_identity_spec(md, "delete_where_iceberg")
    prev = snapshot_iceberg(table_path)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    is_hit = F.coalesce(cond, F.lit(False))

    # match probe per partition-spec class (evolution-safe), projecting
    # only (file key, row index); the probes UNION into one lazy frame —
    # nothing is materialized on the driver
    groups: dict[tuple[str, ...], dict] = {}
    for p, pv in prev.files.items():
        cols = prev.spec_pcols.get(
            prev.files_pspec.get(p, -1), prev.partition_columns
        )
        groups.setdefault(tuple(cols), {})[p] = pv
    hits: DataFrame | None = None
    prev_pos_df = _pos_delete_df(spark, table_path, prev)
    for cols, sub in sorted(groups.items()):
        part = _read_files(
            spark,
            table_path,
            sub,
            prev.schema,
            list(cols),
            file_column="__f",
            deleted_positions_df=prev_pos_df,
            deleted_positions_bound=prev.pos_delete_rows,
            row_index_column="__ridx",
        )
        h = part.filter(is_hit).select(
            F.col("__f").alias("file_path"),
            F.col("__ridx").cast("long").alias("pos"),
        )
        hits = h if hits is None else hits.unionByName(h)
    if hits is not None:
        # dedupe invariant (ADVICE r12): the shards written below must
        # never carry a (file_path, pos) pair twice — duplicates would
        # inflate record_count/rows_deleted and write duplicate
        # positions into the delete parquet
        hits = hits.dropDuplicates(["file_path", "pos"])
    if hits is None:
        return {
            "snapshot_id": prev.snapshot_id,
            "files_touched": 0,
            "rows_deleted": 0,
        }

    # 1. the delete parquet(s): TASKS write the spec's (file_path, pos)
    # shape directly — repartitioned by target so one target's positions
    # land in one shard, sorted within shards per the spec's ordering
    # recommendation. The driver touches only O(delete files) footers
    # and paths, never per-row positions (VERDICT r11 #1); the spec
    # allows many position-delete files per commit and the reader
    # (_delete_files) unions them.
    import pyarrow.parquet as papq

    stage_abs = os.path.join(
        table_path, _DATA, f"_stage_posdel_{uuid.uuid4().hex}"
    )
    (
        hits.repartition("file_path")
        .sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite")
        .parquet(stage_abs)
    )
    del_entries: list[tuple[str, int, int]] = []  # (rel, rows, bytes)
    try:
        for name in sorted(os.listdir(stage_abs)):
            if not (name.startswith("part-") and name.endswith(".parquet")):
                continue
            src = os.path.join(stage_abs, name)
            nrows = papq.ParquetFile(src).metadata.num_rows  # footer only
            if nrows == 0:
                continue
            rel = os.path.join(_DATA, f"delete-{uuid.uuid4().hex}.parquet")
            os.replace(src, os.path.join(table_path, rel))
            del_entries.append(
                (rel, nrows, os.path.getsize(os.path.join(table_path, rel)))
            )
    finally:
        shutil.rmtree(stage_abs, ignore_errors=True)
    if not del_entries:
        return {
            "snapshot_id": prev.snapshot_id,
            "files_touched": 0,
            "rows_deleted": 0,
        }
    rows_deleted = sum(n for _, n, _ in del_entries)
    # distinct matched data files, counted over the delete-count-sized
    # shards just written — never re-probing the table
    files_touched = int(
        spark.read.parquet(
            *[os.path.join(table_path, r) for r, _, _ in del_entries]
        )
        .agg(F.countDistinct("file_path").alias("n"))
        .first()["n"]
    )

    version = md["_version"] + 1
    snap_id = version

    # 2. the DELETE manifest (content=1; one entry per delete shard)
    dman_rel = os.path.join(_META, f"{uuid.uuid4().hex}-d0.avro")
    _write_avro(
        os.path.join(table_path, dman_rel),
        _DELETE_MANIFEST_SCHEMA,
        [
            (
                1,
                snap_id,
                {
                    "content": 1,
                    "file_path": rel,
                    "file_format": "parquet",
                    "record_count": n,
                    "file_size_in_bytes": sz,
                    "equality_ids": None,
                },
            )
            for rel, n, sz in del_entries
        ],
    )
    dman_len = os.path.getsize(os.path.join(table_path, dman_rel))

    # 3. manifest list = parent's manifests + the delete manifest
    cur_snap = {s["snapshot-id"]: s for s in md["snapshots"]}[
        md["current-snapshot-id"]
    ]
    prev_list = cur_snap["manifest-list"]
    prev_list = (
        prev_list if os.path.isabs(prev_list) else os.path.join(table_path, prev_list)
    )
    entries: list[tuple] = [
        (
            m["manifest_path"],
            m["manifest_length"],
            m["partition_spec_id"],
            m["added_snapshot_id"],
            int(m.get("content") or 0),
            m.get("sequence_number"),
        )
        for m in _read_avro(prev_list)
    ]
    entries.append((dman_rel, dman_len, 0, snap_id, 1, snap_id))
    mlist_rel = os.path.join(_META, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
    _write_avro(os.path.join(table_path, mlist_rel), _MANIFEST_LIST_SCHEMA, entries)

    # 4. v2 metadata commit (upgrade + writable marker are sticky)
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["format-version"] = 2
    props = dict(new_md.get("properties") or {})
    props[_OWN_V2_PROP] = "true"
    new_md["properties"] = props
    snaps = list(new_md.get("snapshots", []))
    snaps.append(
        {
            "snapshot-id": snap_id,
            "timestamp-ms": snap_id,
            "manifest-list": mlist_rel,
            "summary": {
                "operation": "delete",
                "predicate": condition
                if isinstance(condition, str)
                else str(condition),
            },
            "schema-id": cur_snap.get("schema-id", 0),
            "spec-id": cur_snap.get("spec-id", 0),
        }
    )
    new_md["snapshots"] = snaps
    new_md["current-snapshot-id"] = snap_id
    try:
        _publish_metadata(table_path, new_md, version)
    except IcebergConcurrentCommitError:
        for rel, _, _ in del_entries:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(table_path, rel))
        with contextlib.suppress(OSError):
            os.remove(os.path.join(table_path, dman_rel))
        with contextlib.suppress(OSError):
            os.remove(os.path.join(table_path, mlist_rel))
        raise
    return {
        "snapshot_id": snap_id,
        "files_touched": files_touched,
        "rows_deleted": rows_deleted,
    }


def upsert_iceberg(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    on: list[str],
) -> int:
    """Merge-on-read UPSERT (the CDC-writer pattern real Iceberg v2
    engines use): ONE atomic commit containing an EQUALITY-DELETE file
    of ``df``'s key tuples plus a data manifest of ``df``'s rows. The
    spec's strictly-older rule makes this an upsert by construction —
    the equality deletes apply only to data files with a sequence
    number BELOW the commit's, so the commit's own appended rows
    survive while every pre-existing row with a matching key vanishes.
    No existing data file is read or rewritten: cost is the new rows
    plus a key-list parquet, which is the 100 TB CDC-apply story
    (contrast ``deltalog.merge_delta``'s join-and-rewrite COW MERGE).
    NULL keys match null-keyed rows (the reader joins null-safely).
    The first upsert upgrades the table to format-version 2 with this
    writer's marker; ``rewrite_data_files`` folds accumulated deletes.
    Returns the new snapshot id.
    """
    md = _current_metadata(table_path)
    _require_writable(md, "upsert_iceberg")
    # Same write-gate as rewrite_data_files/delete_where_iceberg (ADVICE
    # r14): on a foreign transformed spec the partitionBy below would
    # stage raw source values as partition tuples (or die mid-write),
    # and _transform_survives would then prune files wrongly.
    _require_identity_spec(md, "upsert_iceberg")
    if not on:
        raise ValueError("upsert_iceberg: empty key list")
    tbl_sig = [(f["name"], f["type"]) for f in md["schema"]["fields"]]
    new_sig = [
        (f.name, _spark_type_to_ice(f.dataType)) for f in df.schema.fields
    ]
    if tbl_sig != new_sig:
        raise ValueError(
            f"upsert schema {new_sig} != table schema {tbl_sig}"
        )
    name_to_id = {f["name"]: f["id"] for f in md["schema"]["fields"]}
    missing = [c for c in on if c not in name_to_id]
    if missing:
        raise ValueError(f"upsert keys not in schema: {missing}")
    pcols = tuple(s["name"] for s in md.get("partition-spec", []))
    version = md["_version"] + 1
    snap_id = version

    # 1. equality-delete parquet: the distinct key tuples, one file
    keys = df.select(*on).dropDuplicates().coalesce(1)
    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex[:12]}")
    keys.write.mode("overwrite").parquet(staging)
    del_rel = os.path.join(_DATA, f"eqdelete-{uuid.uuid4().hex}.parquet")
    del_abs = os.path.join(table_path, del_rel)
    staged = [
        os.path.join(r, n)
        for r, _d, ns in os.walk(staging)
        for n in ns
        if n.endswith(".parquet")
    ]
    os.replace(staged[0], del_abs)
    shutil.rmtree(staging, ignore_errors=True)
    import pyarrow.parquet as _pq

    n_keys = _pq.read_metadata(del_abs).num_rows

    # 2. the DELETE manifest (content=2 entry with the key field ids)
    dman_rel = os.path.join(_META, f"{uuid.uuid4().hex}-d0.avro")
    _write_avro(
        os.path.join(table_path, dman_rel),
        _DELETE_MANIFEST_SCHEMA,
        [
            (
                1,
                snap_id,
                {
                    "content": 2,
                    "file_path": del_rel,
                    "file_format": "parquet",
                    "record_count": n_keys,
                    "file_size_in_bytes": os.path.getsize(del_abs),
                    "equality_ids": [name_to_id[c] for c in on],
                },
            )
        ],
    )
    dman_len = os.path.getsize(os.path.join(table_path, dman_rel))

    # 3. the appended rows (same staging + manifest path as write)
    aman_rel, aman_len, data_files = _stage_data_manifest(
        df, table_path, pcols, snap_id
    )

    # 4. manifest list = parent's + delete + data, seq = this commit
    cur_snap = {s["snapshot-id"]: s for s in md["snapshots"]}[
        md["current-snapshot-id"]
    ]
    prev_list = cur_snap["manifest-list"]
    prev_list = (
        prev_list if os.path.isabs(prev_list) else os.path.join(table_path, prev_list)
    )
    entries: list[tuple] = [
        (
            m["manifest_path"],
            m["manifest_length"],
            m["partition_spec_id"],
            m["added_snapshot_id"],
            int(m.get("content") or 0),
            m.get("sequence_number"),
        )
        for m in _read_avro(prev_list)
    ]
    entries.append((dman_rel, dman_len, 0, snap_id, 1, snap_id))
    entries.append((aman_rel, aman_len, 0, snap_id, 0, snap_id))
    mlist_rel = os.path.join(_META, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
    _write_avro(os.path.join(table_path, mlist_rel), _MANIFEST_LIST_SCHEMA, entries)

    # 5. v2 metadata commit (upgrade + writable marker are sticky)
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["format-version"] = 2
    props = dict(new_md.get("properties") or {})
    props[_OWN_V2_PROP] = "true"
    new_md["properties"] = props
    snaps = list(new_md.get("snapshots", []))
    snaps.append(
        {
            "snapshot-id": snap_id,
            "timestamp-ms": snap_id,
            "manifest-list": mlist_rel,
            "summary": {"operation": "overwrite", "upsert-keys": ",".join(on)},
            "schema-id": cur_snap.get("schema-id", 0),
            "spec-id": cur_snap.get("spec-id", 0),
        }
    )
    new_md["snapshots"] = snaps
    new_md["current-snapshot-id"] = snap_id
    try:
        _publish_metadata(table_path, new_md, version)
    except IcebergConcurrentCommitError:
        for rel, _size, _n, _pv, _lb, _ub in data_files:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(table_path, rel))
        for rel in (del_rel, dman_rel, aman_rel, mlist_rel):
            with contextlib.suppress(OSError):
                os.remove(os.path.join(table_path, rel))
        raise
    return snap_id


def _reachable(table_path: str, snaps: list[dict[str, Any]]) -> tuple[set, set]:
    """(manifest rel-paths, data-file rel-paths) referenced by ``snaps``."""
    manifests: set[str] = set()
    data: set[str] = set()
    for s in snaps:
        mlist = s["manifest-list"]
        mlist_abs = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
        for m in _read_avro(mlist_abs):
            manifests.add(m["manifest_path"])
            mpath = m["manifest_path"]
            mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
            for entry in _read_avro(mpath):
                data.add(entry["data_file"]["file_path"])
    return manifests, data


def expire_snapshots(table_path: str, keep_last: int = 1) -> dict[str, int]:
    """Expire all but the newest ``keep_last`` snapshots: commit a new
    metadata version whose snapshot list retains only those, then delete
    every manifest list, manifest, and data file reachable ONLY from the
    expired ones (manifests are shared across snapshots, so reachability
    from the retained set is computed first — an append-chain's shared
    manifests survive their older siblings' expiry).

    Time travel to an expired snapshot id now raises (it is gone from
    the metadata), while the current snapshot's content is untouched.
    This is the storage-reclamation half of the maintenance pair with
    ``rewrite_data_files``, mirroring Delta's VACUUM — the difference
    (journal GC vs snapshot-tree GC) being that Iceberg expiry is purely
    a reachability computation over immutable metadata, no tombstone
    retention window.

    Returns ``{"expired_snapshots", "deleted_manifests", "deleted_data_files"}``
    (``deleted_manifests`` counts manifests AND the expired snapshots'
    manifest-list files — everything reclaimed under ``metadata/``).
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    md = _current_metadata(table_path)
    _require_writable(md, "expire_snapshots")
    snaps = sorted(md.get("snapshots", []), key=lambda s: s["snapshot-id"])
    # branch/tag heads are GC roots — a snapshot a ref points at is
    # retained regardless of its age (the spec's ref-retention rule)
    keep_ids = {s["snapshot-id"] for s in snaps[len(snaps) - keep_last :]}
    keep_ids |= {r["snapshot-id"] for r in (md.get("refs") or {}).values()}
    # main is a root too: a branch commit can hold a NEWER id than
    # main's head, so "newest keep_last" no longer implies it
    cur = md.get("current-snapshot-id")
    keep_ids.add(cur)
    retained = [s for s in snaps if s["snapshot-id"] in keep_ids]
    expired = [s for s in snaps if s["snapshot-id"] not in keep_ids]
    if not expired:
        return {"expired_snapshots": 0, "deleted_manifests": 0, "deleted_data_files": 0}

    live_manifests, live_data = _reachable(table_path, retained)
    dead_manifests, dead_data = _reachable(table_path, expired)
    dead_manifests -= live_manifests
    dead_data -= live_data

    # publish first (readers must never observe files vanishing from a
    # still-reachable snapshot), then delete physical files
    version = md["_version"] + 1
    new_md = {k: v for k, v in md.items() if k != "_version"}
    new_md["snapshots"] = retained
    _publish_metadata(table_path, new_md, version)

    # EXTERNAL files (absolute paths outside the table root — e.g.
    # manifests written by convert_delta_to_iceberg referencing the
    # source Delta table's parquet) are NEVER deleted: they are not this
    # table's storage to reclaim. Real Iceberg's snapshot/migrate
    # procedure documents the same GC protection.
    root = os.path.abspath(table_path) + os.sep

    def _owned(rel: str) -> str | None:
        p = rel if os.path.isabs(rel) else os.path.join(table_path, rel)
        return p if os.path.abspath(p).startswith(root) else None

    deleted_data = 0
    for rel in dead_data:
        p = _owned(rel)
        if p and os.path.exists(p):
            os.remove(p)
            deleted_data += 1
    deleted_manifests = 0
    for rel in dead_manifests:
        p = _owned(rel)
        if p and os.path.exists(p):
            os.remove(p)
            deleted_manifests += 1
    for s in expired:  # the expired snapshots' manifest LISTS count too
        mlist = s["manifest-list"]
        p = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
        if os.path.exists(p):
            os.remove(p)
            deleted_manifests += 1
    return {
        "expired_snapshots": len(expired),
        "deleted_manifests": deleted_manifests,
        "deleted_data_files": deleted_data,
    }


def convert_delta_to_iceberg(
    spark: SparkSession, delta_path: str, iceberg_path: str
) -> int:
    """Metadata-only table-format migration (Iceberg's ``snapshot``/
    ``migrate`` procedure, Delta's CONVERT in reverse): commit the Delta
    table's CURRENT live file set as Iceberg snapshot 1 — no data is
    rewritten or row-read (the committer does read each file's parquet
    FOOTER for the manifests' required record_count: O(files) tiny IO);
    manifests reference the original parquet by ABSOLUTE path (legal per
    the spec, and ``_read_files`` keeps absolute keys absolute —
    ``expire_snapshots`` never deletes files outside the table root, so
    the source table's storage is GC-protected). Identity partition
    values transfer from the Delta log's per-file partitionValues to
    manifest partition records — both formats store partition columns
    outside the data files, so the reader contract is unchanged.

    The result is a first-class Iceberg table: subsequent
    ``write_iceberg(mode='append')`` snapshots put NEW files under the
    Iceberg location while sharing the converted manifest, and all
    maintenance (compaction, expiry) applies. At 100 TB this is the
    migration story — converting petabytes by rewriting them is not.

    Returns the created snapshot id.
    """
    import pyarrow.parquet as _pq

    from .deltalog import snapshot as delta_snapshot

    snap = delta_snapshot(delta_path)
    schema = snap.schema
    pcols = tuple(snap.partition_columns)
    os.makedirs(_meta_dir(iceberg_path), exist_ok=True)
    os.makedirs(os.path.join(iceberg_path, _DATA), exist_ok=True)
    if os.path.exists(os.path.join(_meta_dir(iceberg_path), "version-hint.text")):
        raise ValueError(f"{iceberg_path} is already an Iceberg table")

    snap_id = 1
    entries = []
    for rel, pv in snap.files.items():
        ap = os.path.abspath(os.path.join(delta_path, rel))
        entries.append(
            (
                1,
                snap_id,
                {
                    "file_path": ap,
                    "file_format": "parquet",
                    "partition": {c: pv.get(c) for c in pcols},
                    "record_count": _pq.read_metadata(ap).num_rows,
                    "file_size_in_bytes": os.path.getsize(ap),
                },
            )
        )
    manifest_rel = os.path.join(_META, f"{uuid.uuid4().hex}-m0.avro")
    _write_avro(
        os.path.join(iceberg_path, manifest_rel), _manifest_schema(pcols), entries
    )
    mlen = os.path.getsize(os.path.join(iceberg_path, manifest_rel))
    mlist_rel = os.path.join(_META, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
    _write_avro(
        os.path.join(iceberg_path, mlist_rel),
        _MANIFEST_LIST_SCHEMA,
        [(manifest_rel, mlen, 0, snap_id, 0, snap_id)],
    )

    ice_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {
                "id": i + 1,
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_type_to_ice(f.dataType),
            }
            for i, f in enumerate(schema.fields)
        ],
    }
    name_to_id = {f["name"]: f["id"] for f in ice_schema["fields"]}
    spec = [
        {
            "name": c,
            "transform": "identity",
            "source-id": name_to_id[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(pcols)
    ]
    md = {
        "format-version": 1,
        "table-uuid": uuid.uuid4().hex,
        "location": iceberg_path,
        "schema": ice_schema,
        "schemas": [ice_schema],
        "partition-spec": spec,
        "partition-specs": [{"spec-id": 0, "fields": spec}],
        "current-snapshot-id": snap_id,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "timestamp-ms": snap_id,
                "manifest-list": mlist_rel,
                "summary": {"operation": "append"},
                "schema-id": 0,
                "spec-id": 0,
            }
        ],
    }
    _publish_metadata(iceberg_path, md, 1)
    return snap_id


def convert_iceberg_to_delta(
    spark: SparkSession, iceberg_path: str, delta_path: str
) -> int:
    """The reverse metadata-only migration (Delta's CONVERT TO DELTA):
    commit the Iceberg table's CURRENT snapshot as Delta version 0 —
    protocol + metaData + one absolute-path ``add`` per live data file,
    partition values copied from the manifests into ``partitionValues``.
    No data file is opened at all — the add actions' sizes come from
    ``os.path.getsize`` (file-system metadata), so this direction is
    strictly cheaper than Delta→Iceberg's footer reads. The result
    accepts native Delta commits, MERGE, OPTIMIZE, VACUUM, time travel
    and the change feed from version 0 onward.

    Returns the created Delta version (always 0).
    """
    from .deltalog import _commit, _encode_path
    from .deltalog import _log_dir as delta_log_dir

    _require_v1(_current_metadata(iceberg_path), "convert_iceberg_to_delta")
    snap = snapshot_iceberg(iceberg_path)
    pcols = snap.partition_columns
    if os.path.isdir(delta_log_dir(delta_path)):
        raise ValueError(f"{delta_path} is already a Delta table")
    os.makedirs(delta_path, exist_ok=True)

    actions: list[dict[str, Any]] = [
        {
            "commitInfo": {
                "operation": "CONVERT",
                "operationParameters": {"source": iceberg_path},
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": snap.schema.json(),
                "partitionColumns": pcols,
                "configuration": {},
            }
        },
    ]
    for rel in sorted(snap.files):
        pv = snap.files[rel]
        ap = rel if os.path.isabs(rel) else os.path.abspath(
            os.path.join(iceberg_path, rel)
        )
        actions.append(
            {
                "add": {
                    "path": _encode_path(ap),
                    "partitionValues": {c: pv.get(c) for c in pcols},
                    "size": os.path.getsize(ap),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    _commit(delta_path, 0, actions)
    return 0


def partitions_meta(
    table_path: str, snapshot_id: int | None = None
) -> list[dict[str, Any]]:
    """The ``partitions`` metadata table: one row per identity partition
    of a snapshot — partition values, live file count, row count, total
    bytes — aggregated purely from manifests (no data file is opened).
    The layout census behind compaction targeting, skew diagnosis, and
    partition-pruning estimates, at metadata cost like ``files_meta``.
    """
    out: dict[tuple, dict[str, Any]] = {}
    for rec in files_meta(table_path, snapshot_id):
        pv = rec["partition"]
        key = tuple(sorted(pv.items()))
        agg = out.setdefault(
            key,
            {"partition": dict(pv), "n_files": 0, "n_rows": 0, "n_bytes": 0},
        )
        agg["n_files"] += 1
        agg["n_rows"] += int(rec["record_count"])
        agg["n_bytes"] += int(rec["file_size_in_bytes"])
    return [out[k] for k in sorted(out)]


#: default orphan-file retention: 3 days, matching upstream Iceberg's
#: remove_orphan_files default (olderThan = now − 3 days).
_ORPHAN_RETENTION_DEFAULT = 72.0 * 3600.0


def manifests_meta(
    table_path: str, snapshot_id: int | None = None
) -> list[dict[str, Any]]:
    """The ``manifests`` metadata table: one row per manifest of a
    snapshot — path, length, partition spec id, adding snapshot,
    content kind, and live/deleted entry counts — aggregated from the
    manifest list plus one pass over each manifest. The census behind
    ``rewrite_manifests`` targeting (how fragmented is the metadata
    tree?) at the same metadata-only cost as ``files_meta``."""
    md = _current_metadata(table_path)
    snap_md = _resolve_snapshot_md(md, snapshot_id)
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)
    out: list[dict[str, Any]] = []
    for m in _read_avro(mlist):
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(table_path, mpath)
        live = deleted = 0
        for entry in _read_avro(mpath):
            if entry["status"] == 2:
                deleted += 1
            else:
                live += 1
        out.append(
            {
                "path": m["manifest_path"],
                "length": int(m["manifest_length"]),
                "partition_spec_id": int(m.get("partition_spec_id") or 0),
                "added_snapshot_id": m.get("added_snapshot_id"),
                "content": int(m.get("content") or 0),
                "live_entries": live,
                "deleted_entries": deleted,
            }
        )
    return sorted(out, key=lambda r: r["path"])


def describe_detail_iceberg(table_path: str) -> dict[str, Any]:
    """``DESCRIBE DETAIL`` twin for Iceberg (the Delta counterpart is
    ``deltalog.describe_detail``): one metadata-only census — current
    snapshot, live file/ROW counts (manifest record_counts minus v2
    position-delete cardinalities), manifest shape (data vs delete),
    snapshot/schema/spec registry sizes, refs, and format version. The
    probe that schedules rewrite_data_files / rewrite_manifests /
    expire_snapshots on a 100 TB table, at O(metadata tree) cost."""
    md = _current_metadata(table_path)
    snap = snapshot_iceberg(table_path)
    recs = files_meta(table_path)
    num_rows: int | None = sum(int(r["record_count"]) for r in recs)
    num_rows -= snap.pos_delete_rows
    if snap.equality_deletes:
        # an equality delete's matched-row count is unknowable from
        # metadata (only a data read resolves it) — report unknown,
        # matching the Delta twin's num_rows=None convention, never an
        # exact-looking inflated count (ADVICE r11)
        num_rows = None
    elif snap.pos_delete_files and (md.get("properties") or {}).get(
        _OWN_V2_PROP
    ) != "true":
        # manifest record counts are only exactly subtractable when the
        # delete files carry no duplicate or dangling (file, pos) pairs.
        # This writer guarantees that (its probe excludes already-
        # deleted rows and dedupes); a FOREIGN v2 table may not — report
        # unknown rather than an exact-looking miscount
        num_rows = None
    manifests = manifests_meta(table_path)
    size_bytes = sum(int(r["file_size_in_bytes"]) for r in recs)
    return {
        "format": "iceberg",
        "format_version": int(md.get("format-version", 1)),
        "current_snapshot_id": int(md["current-snapshot-id"]),
        "num_files": len(recs),
        "num_rows": num_rows,
        "size_bytes": size_bytes,  # encoding-dependent; never hashed
        "partition_columns": list(snap.partition_columns),
        "n_data_manifests": sum(1 for m in manifests if m["content"] == 0),
        "n_delete_manifests": sum(1 for m in manifests if m["content"] == 1),
        "n_snapshots": len(md.get("snapshots", [])),
        "n_schemas": len(md.get("schemas", [])),
        "n_partition_specs": len(md.get("partition-specs", [])),
        "n_refs": len(md.get("refs") or {}),
    }


def remove_orphan_files(
    table_path: str, retention_seconds: float = _ORPHAN_RETENTION_DEFAULT
) -> int:
    """``remove_orphan_files`` (the Iceberg maintenance procedure that
    pairs with ``expire_snapshots``, mirroring Delta's VACUUM): delete
    files under ``data/`` that NO manifest of ANY snapshot references —
    leftovers of crashed writers, killed tasks, or external copies.
    Returns the number removed.

    The referenced set is assembled by decoding every manifest Avro
    under ``metadata/`` (data manifests AND delete manifests share the
    ``data_file.file_path`` field), so files referenced only by
    historical snapshots survive — they belong to ``expire_snapshots``,
    not to orphan cleanup. Metadata-only walk, O(manifest entries), no
    data file opened.

    ``retention_seconds`` guards the commit window exactly like Delta's
    VACUUM retention: a concurrent writer moves data files into the
    table BEFORE publishing its commit, and removing them in that
    window would corrupt the about-to-land snapshot. The default is 72
    hours (upstream Iceberg's default); passing a short window is an
    explicit single-writer opt-in for fixtures and tests — never the
    path of least resistance on a shared table.
    """
    import time as _time

    meta = _meta_dir(table_path)
    referenced: set[str] = set()
    for name in sorted(os.listdir(meta)):
        if not name.endswith(".avro"):
            continue
        for rec in _read_avro(os.path.join(meta, name)):
            dfr = rec.get("data_file")
            if isinstance(dfr, dict) and dfr.get("file_path"):
                fp = dfr["file_path"]
                referenced.add(fp)
                # manifests may spell paths absolute; normalize both
                if os.path.isabs(fp):
                    referenced.add(os.path.relpath(fp, os.path.abspath(table_path)))
    cutoff = _time.time() - retention_seconds
    removed = 0
    data_dir = os.path.join(table_path, _DATA)
    if not os.path.isdir(data_dir):
        return 0
    for root, _dirs, names in os.walk(data_dir):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, table_path)
            if (
                rel not in referenced
                and full not in referenced
                and os.path.getmtime(full) <= cutoff
            ):
                os.remove(full)
                removed += 1
    return removed


def stats_summary_iceberg(
    table_path: str, column: str, snapshot_id: int | None = None
) -> tuple[int, Any, Any]:
    """(COUNT(*), MIN(column), MAX(column)) from the MANIFESTS alone —
    record_count plus the per-file lower/upper bounds; no data file is
    listed or opened. Raises when the metadata cannot answer exactly:
    a live file without bounds for the column, or any position/equality
    delete in the snapshot (deleted rows may hold the extremes and are
    not counted in record_count adjustments here).
    """
    snap = snapshot_iceberg(table_path, snapshot_id)
    if snap.pos_delete_files or snap.equality_deletes:
        raise ValueError(
            "row-level deletes present: metadata-only aggregation over "
            "this snapshot would be wrong"
        )
    ids_by_name = {v: str(k) for k, v in snap.field_names_by_id.items()}
    if column not in ids_by_name:
        raise ValueError(f"unknown column {column!r}")
    fid = ids_by_name[column]
    # record counts ride the files metadata table (manifest-only)
    md = _current_metadata(table_path)
    snap_md = _resolve_snapshot_md(
        md, snapshot_id if snapshot_id is not None else None
    )
    n = 0
    mn: Any = None
    mx: Any = None
    for rec, _seq, _spec in _live_data_files(table_path, snap_md):
        n += int(rec["record_count"])
        lo = (rec.get("lower_bounds") or {}).get(fid)
        hi = (rec.get("upper_bounds") or {}).get(fid)
        if lo is None or hi is None:
            raise ValueError(
                f"column {column!r} has no bounds in "
                f"{rec['file_path']}; metadata-only MIN/MAX impossible"
            )
        lo, hi = json.loads(lo), json.loads(hi)
        mn = lo if mn is None or lo < mn else mn
        mx = hi if mx is None or hi > mx else mx
    return n, mn, mx
