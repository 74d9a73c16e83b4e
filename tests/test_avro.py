"""Avro container-file source/sink tests (``sources/avrofile.py``):
codec-level property roundtrips (no Spark in the loop), split-protocol
correctness under adversarially small byte ranges, staged-commit
semantics, and deterministic output bytes."""

from __future__ import annotations

import json
import os

import pytest

from pyspark_excel_datasource_spark.sources.avrofile import (
    AvroOptions,
    _decode_long,
    _encode_long,
    _make_decoder,
    _make_encoder,
    _read_header,
    _write_header,
    spark_to_avro_schema,
)


def test_zigzag_long_roundtrip():
    for v in (0, 1, -1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        buf = _encode_long(v)
        got, pos = _decode_long(buf, 0)
        assert got == v and pos == len(buf)


def test_header_roundtrip():
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    sync = bytes(range(16))
    raw = _write_header(json.dumps(schema), "deflate", sync)
    h = _read_header(raw)
    assert h.schema == schema
    assert h.codec == "deflate"
    assert h.sync == sync
    assert h.body_start == len(raw)


_AVRO_TYPES = [
    ("long", [0, -1, 2**62, -(2**62), 7]),
    ("string", ["", "héllo", "日本語", "a" * 300]),
    ("bytes", [b"", b"\x00\xff", b"payload"]),
    ("double", [0.0, -1.5, 3.141592653589793, float("inf")]),
    ("boolean", [True, False]),
    (["null", "long"], [None, 5, None, -9]),
    ({"type": "array", "items": "long"}, [[], [1, 2, 3], [-(2**40)]]),
    ({"type": "map", "values": "string"}, [{}, {"a": "x", "b": ""}]),
    ({"type": "long", "logicalType": "timestamp-micros"}, [0, 1699999999_000000]),
    ({"type": "int", "logicalType": "date"}, [0, 19700, -365]),
]


@pytest.mark.parametrize("avro_type,values", _AVRO_TYPES)
def test_codec_roundtrip(avro_type, values):
    enc = _make_encoder(avro_type)
    dec = _make_decoder(avro_type)
    # logical types encode from raw ints on this path (the writer's
    # encoder consumes datetimes, the decoder emits raw ints; symmetric
    # raw-int coverage pins the varint layer)
    raw_logical = isinstance(avro_type, dict) and avro_type.get("logicalType")
    out = bytearray()
    for v in values:
        if raw_logical:
            out += _encode_long(v)
        else:
            enc(v, out)
    pos = 0
    got = []
    for _ in values:
        v, pos = dec(bytes(out), pos)
        got.append(v)
    assert pos == len(out)
    assert got == values


def test_hypothesis_mixed_record_roundtrip():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "double"}},
            {"name": "d", "type": ["null", "bytes"]},
        ],
    }
    enc = _make_encoder(schema)
    dec = _make_decoder(schema)

    rows = st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.one_of(st.none(), st.text(max_size=40)),
            st.lists(
                st.floats(allow_nan=False, width=64), max_size=5
            ),
            st.one_of(st.none(), st.binary(max_size=40)),
        ),
        max_size=20,
    )

    @settings(max_examples=150, deadline=None)
    @given(data=rows)
    def inner(data):
        out = bytearray()
        for a, b, c, d in data:
            enc({"a": a, "b": b, "c": c, "d": d}, out)
        pos = 0
        got = []
        for _ in data:
            v, pos = dec(bytes(out), pos)
            got.append(v)
        assert pos == len(out)
        assert got == [(a, b, c, d) for a, b, c, d in data]

    inner()


def test_options_validation():
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        AvroOptions.from_options({})
    with pytest.raises(AnalysisException):
        AvroOptions.from_options({"path": "/x", "compression": "snappy"})
    o = AvroOptions.from_options({"path": "/x", "compression": "none"})
    assert o.compression == "null"


def test_spark_to_avro_schema_nullable_union(spark):
    df = spark.range(1).selectExpr(
        "id", "CAST(id AS STRING) AS s", "CAST(id AS DOUBLE) AS d"
    )
    sch = spark_to_avro_schema(df.schema)
    assert sch["fields"][0]["type"] in ("long", ["null", "long"])
    assert {f["name"] for f in sch["fields"]} == {"id", "s", "d"}


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


@pytest.fixture()
def registered(spark):
    from pyspark_excel_datasource_spark.sources.avrofile import register_pyavro

    register_pyavro(spark)
    return spark


def test_roundtrip_all_types(registered, tmp_path):
    spark = registered
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1L, CAST(1 AS INT), 'x', 1.5D, CAST(2.5 AS FLOAT), true,
           X'0AFF', DATE'2024-02-29', TIMESTAMP_NTZ'2024-01-02 03:04:05.123456',
           array(1L, 2L), map('k', 'v')),
          (2L, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL)
        AS t(a, b, c, d, e, f, g, h, i, j, k)
        """
    )
    out = str(tmp_path / "t.avro")
    df.write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.schema == df.schema
    a = sorted([tuple(r) for r in df.collect()])
    b = sorted([tuple(r) for r in back.collect()])
    assert a == b


def test_split_protocol_no_dup_no_loss(registered, tmp_path):
    spark = registered
    df = spark.range(5000).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "big.avro")
    # tiny blocks → many sync boundaries; then read with adversarially
    # small splits so block starts land on every boundary class
    df.coalesce(1).write.format("pyavro").mode("overwrite").option(
        "blockRecords", "64"
    ).save(out)
    for split in (500, 1024, 4096):
        back = spark.read.format("pyavro").option(
            "maxSplitBytes", str(split)
        ).load(out)
        assert back.count() == 5000
        assert back.select("id").distinct().count() == 5000


def test_deflate_roundtrip_smaller(registered, tmp_path):
    spark = registered
    df = spark.range(2000).selectExpr("id", "repeat('ab', 50) AS s")
    plain = str(tmp_path / "plain.avro")
    defl = str(tmp_path / "defl.avro")
    df.coalesce(1).write.format("pyavro").mode("overwrite").save(plain)
    df.coalesce(1).write.format("pyavro").mode("overwrite").option(
        "compression", "deflate"
    ).save(defl)

    def total(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".avro")
        )

    assert total(defl) < total(plain) / 2
    assert spark.read.format("pyavro").load(defl).count() == 2000


def test_write_is_deterministic(registered, tmp_path):
    spark = registered
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
    a = str(tmp_path / "a.avro")
    b = str(tmp_path / "b.avro")
    df.coalesce(1).write.format("pyavro").mode("overwrite").save(a)
    df.coalesce(1).write.format("pyavro").mode("overwrite").save(b)
    fa = [f for f in sorted(os.listdir(a)) if f.endswith(".avro")]
    fb = [f for f in sorted(os.listdir(b)) if f.endswith(".avro")]
    assert fa == fb
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        )


def test_no_overwrite_raises_and_stages_clean(registered, tmp_path):
    from pyspark.errors import AnalysisException

    spark = registered
    df = spark.range(10)
    out = str(tmp_path / "once.avro")
    df.write.format("pyavro").mode("overwrite").save(out)
    # append into an existing path is rejected (same contract as the
    # tarshard writer: directories are replaced atomically or not at all)
    with pytest.raises(Exception):
        df.write.format("pyavro").mode("append").save(out)
    # no staging residue next to the output
    residue = [d for d in os.listdir(tmp_path) if "_staging_" in d]
    assert residue == []
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_stream_discovers_and_survives_restart(registered, tmp_path):
    """Manifest-offset stream over arriving .avro files: files that land
    while the query is down are picked up exactly once on restart from
    the checkpoint; already-processed files are never re-read."""
    spark = registered
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = tmp_path / "ckpt_avro"
    out = str(tmp_path / "out_parquet")

    def land(name, lo, hi):
        spark.range(lo, hi).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ).coalesce(1).write.format("pyavro").mode("overwrite").save(
            str(tmp_path / name)
        )
        # move the single part into the drop dir under a stable name
        d = tmp_path / name
        (part,) = [f for f in os.listdir(d) if f.endswith(".avro")]
        os.replace(os.path.join(d, part), src / f"{name}.avro")

    land("f0", 0, 5)
    land("f1", 5, 9)

    def start():
        stream = (
            spark.readStream.format("pyavro")
            .schema("id long, s string")
            .load(str(src))
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(range(9))

    land("f2", 9, 12)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(12)), got


def test_push_filters_reduce_rows_but_not_results(registered, tmp_path):
    """pushFilters is advisory pre-filtering inside the Python reader:
    results must equal the unfiltered-read-then-filter plan for every
    supported predicate class, including on the timestamp logical type."""
    spark = registered
    df = spark.range(1000).selectExpr(
        "id",
        "CAST(id % 5 AS STRING) AS s",
        "timestamp_seconds(id * 60) AS ts",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE id * 1.5 END AS v",
    )
    out = str(tmp_path / "pf.avro")
    df.write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    cases = [
        "id > 900",
        "id <= 3",
        "s = '2'",
        "s IN ('1', '3')",
        "v IS NULL",
        "v IS NOT NULL AND v < 30",
        "ts >= timestamp_seconds(59000)",
    ]
    for cond in cases:
        got = sorted(r.id for r in back.filter(cond).collect())
        want = sorted(r.id for r in df.filter(cond).collect())
        assert got == want, cond


def test_decimal_logical_type_roundtrip(registered, tmp_path):
    """Avro decimal-over-bytes logical type: exact money values survive
    the write→read roundtrip with their (precision, scale), including
    negatives (two's-complement unscaled bytes) and nulls."""
    spark = registered
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1L, CAST(12345.67 AS DECIMAL(18,2)), CAST(-0.003 AS DECIMAL(10,3))),
          (2L, CAST(-99999999999999.99 AS DECIMAL(18,2)), NULL),
          (3L, CAST(0 AS DECIMAL(18,2)), CAST(1.001 AS DECIMAL(10,3)))
        AS t(id, money, tiny)
        """
    )
    out = str(tmp_path / "dec.avro")
    df.write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_stream_sink_commits_batches(registered, tmp_path):
    """Streaming Avro sink: each micro-batch lands as
    batch-<id>-part-*.avro files, later batches append new batch files,
    and the directory reads back through the batch reader as the union
    of everything streamed."""
    spark = registered
    src = tmp_path / "sink_src"
    src.mkdir()
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    def land(name, lo, hi):
        spark.range(lo, hi).coalesce(1).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ).write.mode("overwrite").parquet(str(tmp_path / name))
        d = tmp_path / name
        (part,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
        os.replace(os.path.join(d, part), src / f"{name}.parquet")

    land("p0", 0, 6)

    def start():
        stream = (
            spark.readStream.schema("id long, s string")
            .format("parquet")
            .load(str(src))
        )
        return (
            stream.writeStream.format("pyavro")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
        land("p1", 6, 10)
        q.processAllAvailable()
    finally:
        q.stop()

    files = sorted(f for f in os.listdir(out) if f.endswith(".avro"))
    assert files and all(f.startswith("batch-") for f in files)
    batch_ids = {f.split("-")[1] for f in files}
    assert len(batch_ids) == 2, files
    back = spark.read.format("pyavro").load(out)
    assert sorted(r.id for r in back.collect()) == list(range(10))
    # no staging residue
    assert not [f for f in os.listdir(out) if f.startswith(".staging")]
