"""Pure-Python Avro Object Container File DataSource:
``spark.read.format("pyavro")`` / ``df.write.format("pyavro")``.

Avro is the one mainstream ingest format (the Kafka-ecosystem default)
absent from the repo's source matrix; this runtime ships the Avro
*library* jars but not the ``spark-avro`` DataSource jar, so the format
is implemented here from the PUBLIC Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) as a Python Data
Source — the same integration layer as the Excel connector
(reference: ``connector.py:162-203`` batch scan shape) and the tarshard
source. No Avro library code is used or copied: the wire codec below is
written against the spec's binary-encoding section only.

Supported schema subset (raises loudly beyond it): null, boolean, int,
long, float, double, bytes, string, records, ``["null", T]`` unions,
arrays, string-keyed maps, and the ``date`` / ``timestamp-micros`` /
``decimal``-over-bytes logical types — the closure of what Spark's own
relational types need. Codecs: ``null`` and ``deflate`` (stdlib zlib,
raw stream).

Scale design:

- **sync-marker splits**: Avro container files are splittable — every
  block ends with the file's 16-byte sync marker. The reader plans
  byte-range partitions (``maxSplitBytes``, default 128 MB) and each
  task scans forward from its range start to the first sync marker,
  then decodes exactly the blocks that START inside its range — the
  standard contract that makes one 10 GB file 80 parallel tasks with
  zero planning state (same rule the JVM FileFormat readers apply).
- **block-at-a-time decode**: one compressed block in memory per task
  at a time, decoded straight into Arrow arrays (typed columns, no
  per-row Python objects crossing to the JVM).
- **staged-commit writer**: each task writes ``part-<id>.avro`` into a
  staging directory; commit renames the directory into place and drops
  a ``_SUCCESS`` marker, abort removes the staging — a failed or
  speculative task can never leave a half-written file in place (the
  reference writer's last-partition-wins bug, connector.py:296-319,
  cannot recur here). Output bytes are deterministic: the sync marker
  derives from (schema, part name), not RNG.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone

import pyarrow as pa

from pyspark.errors import AnalysisException
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

FORMAT_NAME = "pyavro"

_MAGIC = b"Obj\x01"
_EPOCH = datetime(1970, 1, 1)
_EPOCH_DATE = date(1970, 1, 1)
_US = timedelta(microseconds=1)


# ---------------------------------------------------------------------------
# Binary primitives (Avro spec: zigzag varints, little-endian floats)
# ---------------------------------------------------------------------------


def _encode_long(value: int) -> bytes:
    value = (value << 1) ^ (value >> 63)
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return (result >> 1) ^ -(result & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("avro varint too long")


def _encode_bytes(value: bytes) -> bytes:
    return _encode_long(len(value)) + value


# ---------------------------------------------------------------------------
# Schema mapping Spark <-> Avro (JSON)
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.ShortType(): "int",
    T.ByteType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}

_LOGICAL_TO_AVRO = {
    T.DateType(): {"type": "int", "logicalType": "date"},
    T.TimestampType(): {"type": "long", "logicalType": "timestamp-micros"},
    T.TimestampNTZType(): {"type": "long", "logicalType": "timestamp-micros"},
}


def _spark_type_to_avro(dt: T.DataType):
    if dt in _PRIMITIVE_TO_AVRO:
        return _PRIMITIVE_TO_AVRO[dt]
    if dt in _LOGICAL_TO_AVRO:
        return dict(_LOGICAL_TO_AVRO[dt])
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        item = _spark_type_to_avro(dt.elementType)
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise AnalysisException("avro maps require string keys")
        val = _spark_type_to_avro(dt.valueType)
        if dt.valueContainsNull:
            val = ["null", val]
        return {"type": "map", "values": val}
    raise AnalysisException(f"type {dt} is not supported by the pyavro source")


def spark_to_avro_schema(schema: T.StructType, name: str = "spark_row") -> dict:
    fields = []
    for f in schema.fields:
        at = _spark_type_to_avro(f.dataType)
        if f.nullable:
            at = ["null", at]
        fields.append({"name": f.name, "type": at})
    return {"type": "record", "name": name, "fields": fields}


def _avro_type_to_spark(at) -> tuple[T.DataType, bool]:
    """→ (spark type, nullable)."""
    if isinstance(at, list):
        branches = [b for b in at if b != "null"]
        if len(branches) != 1:
            raise AnalysisException(
                f"only ['null', T] unions are supported, got {at}"
            )
        inner, _ = _avro_type_to_spark(branches[0])
        return inner, True
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "date" and at.get("type") == "int":
            return T.DateType(), False
        if lt == "timestamp-micros" and at.get("type") == "long":
            return T.TimestampNTZType(), False
        if lt == "decimal" and at.get("type") == "bytes":
            return T.DecimalType(at["precision"], at["scale"]), False
        if at.get("type") == "array":
            item, nullable = _avro_type_to_spark(at["items"])
            return T.ArrayType(item, nullable), False
        if at.get("type") == "map":
            val, nullable = _avro_type_to_spark(at["values"])
            return T.MapType(T.StringType(), val, nullable), False
        if at.get("type") == "record":
            return _avro_record_to_struct(at), False
        at = at.get("type")
    simple = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    if at in simple:
        return simple[at], False
    raise AnalysisException(f"avro type {at!r} is not supported by pyavro")


def _avro_record_to_struct(rec: dict) -> T.StructType:
    fields = []
    for f in rec["fields"]:
        dt, nullable = _avro_type_to_spark(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Encoders / decoders compiled from the Avro type (closures, built per task)
# ---------------------------------------------------------------------------


def _make_encoder(at):
    if isinstance(at, list):  # ["null", T]
        branches = [b for b in at if b != "null"]
        inner = _make_encoder(branches[0])
        null_first = at[0] == "null"
        none_tag = _encode_long(0 if null_first else 1)
        val_tag = _encode_long(1 if null_first else 0)

        def enc_union(v, out):
            if v is None:
                out += none_tag
            else:
                out += val_tag
                inner(v, out)

        return enc_union
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "decimal":
            scale = at["scale"]

            def enc_decimal(v, out):
                from decimal import Decimal

                unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
                raw = unscaled.to_bytes(
                    max(1, (unscaled.bit_length() + 8) // 8), "big", signed=True
                )
                out += _encode_bytes(raw)

            return enc_decimal
        if lt == "date":
            return lambda v, out: out.__iadd__(
                _encode_long((v - _EPOCH_DATE).days)
            )
        if lt == "timestamp-micros":

            def enc_ts(v, out):
                if v.tzinfo is not None:
                    v = v.astimezone(timezone.utc).replace(tzinfo=None)
                out += _encode_long((v - _EPOCH) // _US)

            return enc_ts
        if at.get("type") == "array":
            item = _make_encoder(at["items"])

            def enc_array(v, out):
                if v:
                    out += _encode_long(len(v))
                    for x in v:
                        item(x, out)
                out += _encode_long(0)

            return enc_array
        if at.get("type") == "map":
            val = _make_encoder(at["values"])

            def enc_map(v, out):
                if v:
                    out += _encode_long(len(v))
                    for k, x in v.items():
                        out += _encode_bytes(k.encode("utf-8"))
                        val(x, out)
                out += _encode_long(0)

            return enc_map
        if at.get("type") == "record":
            encs = [_make_encoder(f["type"]) for f in at["fields"]]
            flds = at["fields"]

            def enc_record(v, out):
                for f, e in zip(flds, encs):
                    name = f["name"]
                    # absent key + schema default → write the default
                    # (Avro writer semantics; a missing REQUIRED field
                    # still raises loudly via the KeyError below)
                    if name in v:
                        e(v[name], out)
                    elif "default" in f:
                        e(f["default"], out)
                    else:
                        e(v[name], out)

            return enc_record
        at = at.get("type")
    if at in ("int", "long"):
        return lambda v, out: out.__iadd__(_encode_long(int(v)))
    if at == "boolean":
        return lambda v, out: out.append(1 if v else 0)
    if at == "float":
        return lambda v, out: out.__iadd__(struct.pack("<f", v))
    if at == "double":
        return lambda v, out: out.__iadd__(struct.pack("<d", v))
    if at == "string":
        return lambda v, out: out.__iadd__(_encode_bytes(v.encode("utf-8")))
    if at == "bytes":
        return lambda v, out: out.__iadd__(_encode_bytes(bytes(v)))
    raise AnalysisException(f"avro type {at!r} has no encoder")


def _make_decoder(at):
    """→ fn(buf, pos) -> (python value, new pos). Logical types decode to
    their RAW representation (int days / long micros); the Arrow layer
    applies the logical interpretation as a typed cast, so row values
    never materialize datetime objects."""
    if isinstance(at, list):
        branches = list(at)
        decs = [None if b == "null" else _make_decoder(b) for b in branches]

        def dec_union(buf, pos):
            idx, pos = _decode_long(buf, pos)
            d = decs[idx]
            if d is None:
                return None, pos
            return d(buf, pos)

        return dec_union
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt in ("date", "timestamp-micros"):
            return _decode_long
        if lt == "decimal":
            scale = at["scale"]

            def dec_decimal(buf, pos):
                from decimal import Decimal

                n, pos = _decode_long(buf, pos)
                unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
                return Decimal(unscaled).scaleb(-scale), pos + n

            return dec_decimal
        if at.get("type") == "array":
            item = _make_decoder(at["items"])

            def dec_array(buf, pos):
                out = []
                while True:
                    n, pos = _decode_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        n = -n
                        _size, pos = _decode_long(buf, pos)
                    for _ in range(n):
                        v, pos = item(buf, pos)
                        out.append(v)

            return dec_array
        if at.get("type") == "map":
            val = _make_decoder(at["values"])

            def dec_map(buf, pos):
                out = {}
                while True:
                    n, pos = _decode_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        n = -n
                        _size, pos = _decode_long(buf, pos)
                    for _ in range(n):
                        klen, pos = _decode_long(buf, pos)
                        k = buf[pos : pos + klen].decode("utf-8")
                        pos += klen
                        v, pos = val(buf, pos)
                        out[k] = v

            return dec_map
        if at.get("type") == "record":
            decs = [_make_decoder(f["type"]) for f in at["fields"]]

            def dec_record(buf, pos):
                row = []
                for d in decs:
                    v, pos = d(buf, pos)
                    row.append(v)
                return tuple(row), pos

            return dec_record
        at = at.get("type")
    if at in ("int", "long"):
        return _decode_long
    if at == "boolean":
        return lambda buf, pos: (buf[pos] != 0, pos + 1)
    if at == "float":
        return lambda buf, pos: (struct.unpack_from("<f", buf, pos)[0], pos + 4)
    if at == "double":
        return lambda buf, pos: (struct.unpack_from("<d", buf, pos)[0], pos + 8)
    if at == "string":

        def dec_string(buf, pos):
            n, pos = _decode_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n

        return dec_string
    if at == "bytes":

        def dec_bytes(buf, pos):
            n, pos = _decode_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n

        return dec_bytes
    raise AnalysisException(f"avro type {at!r} has no decoder")


# ---------------------------------------------------------------------------
# Container file header
# ---------------------------------------------------------------------------


@dataclass
class _Header:
    schema: dict
    codec: str
    sync: bytes
    body_start: int


def _read_header(buf: bytes) -> _Header:
    if buf[:4] != _MAGIC:
        raise AnalysisException("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _decode_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _size, pos = _decode_long(buf, pos)
        for _ in range(n):
            klen, pos = _decode_long(buf, pos)
            k = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _decode_long(buf, pos)
            meta[k] = bytes(buf[pos : pos + vlen])
            pos += vlen
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AnalysisException(f"unsupported avro codec {codec!r}")
    return _Header(
        schema=json.loads(meta["avro.schema"].decode("utf-8")),
        codec=codec,
        sync=sync,
        body_start=pos,
    )


def _write_header(schema_json: str, codec: str, sync: bytes) -> bytes:
    out = bytearray(_MAGIC)
    out += _encode_long(2)
    out += _encode_bytes(b"avro.schema") + _encode_bytes(
        schema_json.encode("utf-8")
    )
    out += _encode_bytes(b"avro.codec") + _encode_bytes(codec.encode("utf-8"))
    out += _encode_long(0)
    out += sync
    return bytes(out)


# ---------------------------------------------------------------------------
# Arrow bridge
# ---------------------------------------------------------------------------


def _arrow_type(dt: T.DataType):
    simple = {
        T.BooleanType(): pa.bool_(),
        T.IntegerType(): pa.int32(),
        T.LongType(): pa.int64(),
        T.FloatType(): pa.float32(),
        T.DoubleType(): pa.float64(),
        T.StringType(): pa.string(),
        T.BinaryType(): pa.binary(),
        T.DateType(): pa.date32(),
        T.TimestampType(): pa.timestamp("us"),
        T.TimestampNTZType(): pa.timestamp("us"),
    }
    if dt in simple:
        return simple[dt]
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(pa.string(), _arrow_type(dt.valueType))
    raise AnalysisException(f"type {dt} has no arrow mapping in pyavro")


def _columns_to_batch(cols: list[list], schema: T.StructType) -> pa.RecordBatch:
    arrays = []
    for field, col in zip(schema.fields, cols):
        target = _arrow_type(field.dataType)
        if isinstance(field.dataType, T.MapType):
            col = [None if v is None else list(v.items()) for v in col]
        # logical types arrive as their raw ints (see _make_decoder):
        # build the int array and apply the logical meaning as a cast
        if pa.types.is_timestamp(target):
            arr = pa.array(col, type=pa.int64()).cast(target)
        elif pa.types.is_date(target):
            arr = pa.array(col, type=pa.int32()).cast(target)
        else:
            arr = pa.array(col, type=target)
        arrays.append(arr)
    return pa.RecordBatch.from_arrays(
        arrays, names=[f.name for f in schema.fields]
    )


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


@dataclass
class AvroOptions:
    path: str
    compression: str = "null"
    max_split_bytes: int = 128 * 1024 * 1024
    block_records: int = 4096

    @classmethod
    def from_options(cls, options: dict) -> "AvroOptions":
        path = options.get("path")
        if not path:
            raise AnalysisException("the 'path' option is required for pyavro")
        compression = str(
            options.get("compression", options.get("codec", "null"))
        ).lower()
        if compression in ("none", "uncompressed"):
            compression = "null"
        if compression not in ("null", "deflate"):
            raise AnalysisException(
                f"pyavro compression must be null|deflate, got {compression!r}"
            )
        return cls(
            path=path,
            compression=compression,
            max_split_bytes=int(
                options.get("maxsplitbytes", options.get("maxSplitBytes", 128 * 1024 * 1024))
            ),
            block_records=int(
                options.get("blockrecords", options.get("blockRecords", 4096))
            ),
        )


def _list_avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro") and os.path.isfile(os.path.join(path, f))
        )
        if not files:
            raise AnalysisException(f"no .avro files found in: {path}")
        return files
    import glob as _glob

    matches = sorted(m for m in _glob.glob(path) if os.path.isfile(m))
    if matches:
        return matches
    raise AnalysisException(f"path does not exist: {path}")


class AvroPartition(InputPartition):
    def __init__(self, file: str, start: int, end: int):
        self.file = file
        self.start = start
        self.end = end


def _batch_filter_mask(batch: pa.RecordBatch, filters: list[Filter]):
    """Best-effort pyarrow.compute mask for the pushed filters. Spark
    re-evaluates every filter (pushFilters re-yields them), so this only
    reduces Python→JVM Arrow traffic and can never change semantics."""
    import pyarrow.compute as pc

    mask = None
    for f in filters:
        try:
            name = f.attribute[-1]
            if name not in batch.schema.names:
                continue
            col = batch.column(name)
            if isinstance(f, IsNull):
                m = pc.is_null(col)
            elif isinstance(f, IsNotNull):
                m = pc.is_valid(col)
            elif isinstance(f, In):
                m = pc.is_in(col, value_set=pa.array(list(f.values)))
            elif isinstance(f, EqualTo):
                m = pc.equal(col, f.value)
            elif isinstance(f, GreaterThan):
                m = pc.greater(col, f.value)
            elif isinstance(f, GreaterThanOrEqual):
                m = pc.greater_equal(col, f.value)
            elif isinstance(f, LessThan):
                m = pc.less(col, f.value)
            elif isinstance(f, LessThanOrEqual):
                m = pc.less_equal(col, f.value)
            else:
                continue
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.and_(mask, m)
        except Exception:
            continue  # pushdown is advisory; Spark re-filters
    return mask


class AvroReader(DataSourceReader):
    def __init__(self, schema: T.StructType, opts: AvroOptions):
        self.bound_schema = schema
        self.opts = opts
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            self.pushed.append(f)
            yield f  # Spark re-evaluates everything (safe partial pushdown)

    def partitions(self) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for f in _list_avro_files(self.opts.path):
            size = os.path.getsize(f)
            step = max(1, self.opts.max_split_bytes)
            for start in range(0, max(size, 1), step):
                parts.append(AvroPartition(f, start, min(start + step, size)))
        return parts

    def read(self, partition: AvroPartition):
        with open(partition.file, "rb") as fh:
            buf = fh.read()
        header = _read_header(buf)
        file_schema = _avro_record_to_struct(header.schema)
        names = [f.name for f in file_schema.fields]
        missing = [f.name for f in self.bound_schema.fields if f.name not in names]
        if missing:
            raise AnalysisException(
                f"columns {missing} required by the schema are missing from "
                f"{partition.file} (file has {names})"
            )
        proj = [names.index(f.name) for f in self.bound_schema.fields]
        dec = _make_decoder(header.schema)
        sync = header.sync

        # locate the first block whose start lies in [start, end): blocks
        # begin at body_start or immediately after a sync marker. A sync
        # ENDING exactly at partition.start delimits a block that belongs
        # to THIS partition (the previous one only takes blocks starting
        # strictly before its end), so the scan begins 16 bytes early and
        # skips syncs that end before our range — the Hadoop split rule.
        pos = header.body_start
        if partition.start > header.body_start:
            search = partition.start - 16
            while True:
                hit = buf.find(sync, max(search, 0))
                if hit < 0:
                    return
                if hit + 16 >= partition.start:
                    pos = hit + 16
                    break
                search = hit + 1

        cols: list[list] = [[] for _ in proj]
        n_buffered = 0
        while pos < len(buf) and pos < partition.end:
            block_start = pos
            if block_start >= partition.end:
                break
            count, pos = _decode_long(buf, pos)
            size, pos = _decode_long(buf, pos)
            payload = buf[pos : pos + size]
            pos += size
            if buf[pos : pos + 16] != sync:
                raise AnalysisException(
                    f"corrupt avro block (bad sync) in {partition.file}"
                )
            pos += 16
            if header.codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            p = 0
            for _ in range(count):
                row, p = dec(payload, p)
                for i, j in enumerate(proj):
                    cols[i].append(row[j])
            n_buffered += count
            if n_buffered >= 8192:
                yield self._emit(_columns_to_batch(cols, self.bound_schema))
                cols = [[] for _ in proj]
                n_buffered = 0
        if n_buffered:
            yield self._emit(_columns_to_batch(cols, self.bound_schema))

    def _emit(self, batch: pa.RecordBatch) -> pa.RecordBatch:
        if not self.pushed:
            return batch
        mask = _batch_filter_mask(batch, self.pushed)
        return batch.filter(mask) if mask is not None else batch


class AvroStreamReader(DataSourceStreamReader):
    """Micro-batch file-arrival watcher with replayable manifest offsets
    — the same exactly-once design as the Excel and tarshard stream
    readers (offset = manifest of .avro files seen; a batch is the
    manifest diff, so checkpoint recovery re-reads exactly the same
    files). The Kafka-adjacent ingest loop: Avro files land in a drop
    directory and each becomes one (or more, via byte-range splits)
    tasks of the next micro-batch."""

    def __init__(self, schema: T.StructType, opts: AvroOptions):
        self.bound_schema = schema
        self.opts = opts
        self._batch = AvroReader(schema, opts)

    def _current_files(self) -> list[str]:
        path = self.opts.path
        if not os.path.isdir(path):
            raise AnalysisException(
                f"streaming pyavro path must be a directory: {path}"
            )
        return sorted(
            f
            for f in os.listdir(path)
            if f.endswith(".avro") and os.path.isfile(os.path.join(path, f))
        )

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        return {"files": {name: 1 for name in self._current_files()}}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        seen = set(start.get("files", {}))
        new = [n for n in sorted(end.get("files", {})) if n not in seen]
        parts: list[InputPartition] = []
        for n in new:
            f = os.path.join(self.opts.path, n)
            size = os.path.getsize(f)
            step = max(1, self.opts.max_split_bytes)
            for s in range(0, max(size, 1), step):
                parts.append(AvroPartition(f, s, min(s + step, size)))
        return parts

    def read(self, partition: AvroPartition):
        yield from self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # manifest offsets need no source-side cleanup

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


@dataclass
class AvroCommitMessage(WriterCommitMessage):
    part_path: str
    rows: int


def _write_avro_part(
    path: str, avro_schema: dict, compression: str, iterator, block_records: int
) -> int:
    """Encode rows into one Avro container file (shared by the batch and
    streaming writers). The sync marker derives from (schema, basename),
    so output bytes are a pure function of schema + name + content."""
    import hashlib

    schema_json = json.dumps(avro_schema)
    sync = hashlib.md5(
        (schema_json + ":" + os.path.basename(path)).encode("utf-8")
    ).digest()
    encs = [_make_encoder(f["type"]) for f in avro_schema["fields"]]
    rows = 0
    with open(path, "wb") as fh:
        fh.write(_write_header(schema_json, compression, sync))
        block = bytearray()
        n_block = 0

        def flush():
            nonlocal block, n_block
            if not n_block:
                return
            payload = bytes(block)
            if compression == "deflate":
                co = zlib.compressobj(wbits=-15)
                payload = co.compress(payload) + co.flush()
            fh.write(_encode_long(n_block))
            fh.write(_encode_long(len(payload)))
            fh.write(payload)
            fh.write(sync)
            block = bytearray()
            n_block = 0

        for row in iterator:
            for i, e in enumerate(encs):
                e(row[i], block)
            n_block += 1
            rows += 1
            if n_block >= block_records:
                flush()
        flush()
    return rows


class AvroWriter(DataSourceWriter):
    def __init__(self, schema: T.StructType, overwrite: bool, opts: AvroOptions):
        self.schema = schema
        self.overwrite = overwrite
        self.opts = opts
        self.avro_schema = spark_to_avro_schema(schema)
        self.staging = (
            self.opts.path.rstrip("/") + f"_staging_{uuid.uuid4().hex[:10]}"
        )

    def write(self, iterator) -> AvroCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.staging, exist_ok=True)
        part = os.path.join(self.staging, f"part-{pid:05d}.avro")
        rows = _write_avro_part(
            part,
            self.avro_schema,
            self.opts.compression,
            iterator,
            self.opts.block_records,
        )
        return AvroCommitMessage(part_path=part, rows=rows)

    def commit(self, messages) -> None:
        import shutil

        out = self.opts.path
        if os.path.exists(out):
            if not self.overwrite:
                self._cleanup()
                raise AnalysisException(
                    f"path {out} already exists and mode is not overwrite"
                )
            shutil.rmtree(out)
        os.replace(self.staging, out)
        with open(os.path.join(out, "_SUCCESS"), "wb"):
            pass

    def abort(self, messages) -> None:
        self._cleanup()

    def _cleanup(self) -> None:
        import shutil

        if os.path.exists(self.staging):
            shutil.rmtree(self.staging, ignore_errors=True)


class AvroStreamWriter(DataSourceStreamWriter):
    """Streaming sink: each micro-batch commits its task part files as
    ``batch-<id>-part-<pid>.avro`` under the target directory (staged
    per task, renamed at commit — no driver merge, the parallel layout
    is the point). Replay-idempotent: re-committing a batch after
    failure recovery first removes that batch id's files, so
    exactly-once output holds per batch."""

    def __init__(self, schema: T.StructType, opts: AvroOptions):
        self.schema = schema
        self.opts = opts
        self.avro_schema = spark_to_avro_schema(schema)
        os.makedirs(opts.path, exist_ok=True)
        # created lazily by the first task of a batch, removed at
        # commit/abort — a stopped query leaves no residue
        self.staging = os.path.join(
            opts.path, f".staging-{uuid.uuid4().hex[:8]}"
        )

    def write(self, iterator) -> AvroCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self.staging, exist_ok=True)
        part = os.path.join(
            self.staging, f"part-{pid:05d}-{uuid.uuid4().hex[:6]}.avro"
        )
        rows = _write_avro_part(
            part,
            self.avro_schema,
            self.opts.compression,
            iterator,
            self.opts.block_records,
        )
        return AvroCommitMessage(part_path=part, rows=rows)

    def commit(self, messages, batchId: int) -> None:
        out = self.opts.path
        prefix = f"batch-{batchId:06d}-"
        for f in os.listdir(out):  # replay: replace the whole batch
            if f.startswith(prefix):
                os.remove(os.path.join(out, f))
        live = [m for m in messages if m is not None]
        for i, m in enumerate(sorted(live, key=lambda m: m.part_path)):
            if m.rows == 0:
                continue
            os.replace(
                m.part_path, os.path.join(out, f"{prefix}part-{i:05d}.avro")
            )
        self._cleanup_staging([m.part_path for m in live])

    def abort(self, messages, batchId: int) -> None:
        self._cleanup_staging(
            [m.part_path for m in messages if m is not None]
        )

    def _cleanup_staging(self, parts: list[str]) -> None:
        """Remove this batch's staging dirs AND any orphaned siblings:
        Spark constructs separate writer instances for planning, the
        executor tasks, and the commit phase, each with its own staging
        uuid — so the dirs holding this batch's parts come from the
        commit messages, not ``self.staging``. Orphans under the sink
        dir are residue of a crashed run (the micro-batch engine is
        serial per query); sweep them here. Same contract as the Excel
        stream writer's cleanup."""
        import shutil

        used = {os.path.dirname(p) for p in parts} | {self.staging}
        for f in os.listdir(self.opts.path):
            if f.startswith(".staging-"):
                used.add(os.path.join(self.opts.path, f))
        for d in used:
            shutil.rmtree(d, ignore_errors=True)


class AvroDataSource(DataSource):
    def __init__(self, options):
        super().__init__(options)
        self.opts = AvroOptions.from_options(dict(options))

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        first = _list_avro_files(self.opts.path)[0]
        with open(first, "rb") as fh:
            head = fh.read(1 << 20)  # header is tiny; 1 MB covers any schema
        return _avro_record_to_struct(_read_header(head).schema)

    def reader(self, schema: T.StructType) -> AvroReader:
        return AvroReader(schema, self.opts)

    def writer(self, schema: T.StructType, overwrite: bool) -> AvroWriter:
        return AvroWriter(schema, overwrite, self.opts)

    def streamReader(self, schema: T.StructType) -> AvroStreamReader:
        return AvroStreamReader(schema, self.opts)

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> AvroStreamWriter:
        return AvroStreamWriter(schema, self.opts)


def register_pyavro(spark) -> None:
    """Register the pyavro format on a session (idempotent). Pins the
    session confs the source needs — in particular
    ``spark.sql.python.filterPushdown.enabled``: Spark refuses to plan a
    Python data source that implements ``pushFilters`` while that conf
    is off."""
    from ..session import configure

    configure(spark)
    spark.dataSource.register(AvroDataSource)
