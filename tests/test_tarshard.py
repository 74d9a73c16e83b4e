"""Tar-shard (WebDataset-layout) connector unit tests: member/sample
read modes, partition-per-shard planning, gzip shards, recursive
lookup, the staged-commit writer, and write→read byte losslessness."""

from __future__ import annotations

import io
import os
import tarfile

import pytest

from pyspark_excel_datasource_spark.sources.tarshard import register_tarshard


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_tarshard(spark)


def _make_shard(path, samples, mode="w"):
    """samples: list of (key, {ext: bytes})."""
    with tarfile.open(path, mode) as tf:
        for key, members in samples:
            for ext, payload in members.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}" if ext else key)
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))


def test_members_mode_rows_and_partitions(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    _make_shard(str(d / "s0.tar"), [("a", {"txt": b"hello", "cls": b"en"})])
    _make_shard(str(d / "s1.tar"), [("b", {"txt": b"welt"})])
    df = spark.read.format("tarshard").load(str(d))
    rows = {(r.shard, r.key, r.ext, r.size, bytes(r.payload)) for r in df.collect()}
    assert rows == {
        ("s0.tar", "a", "txt", 5, b"hello"),
        ("s0.tar", "a", "cls", 2, b"en"),
        ("s1.tar", "b", "txt", 4, b"welt"),
    }
    assert df.rdd.getNumPartitions() == 2  # one per shard


def test_samples_mode_groups_members(spark, tmp_path):
    d = tmp_path / "shards2"
    d.mkdir()
    _make_shard(
        str(d / "s.tar"),
        [
            ("k1", {"txt": b"x", "json": b"{}"}),
            ("k2", {"txt": b"yy"}),
        ],
    )
    df = spark.read.format("tarshard").option("mode", "samples").load(str(d))
    got = {r.key: (dict(r.data), r.n_members, r.total_bytes) for r in df.collect()}
    assert got["k1"] == ({"txt": b"x", "json": b"{}"}, 2, 3)
    assert got["k2"] == ({"txt": b"yy"}, 1, 2)


def test_gzip_shards_and_recursive_lookup(spark, tmp_path):
    d = tmp_path / "nested"
    (d / "sub").mkdir(parents=True)
    _make_shard(str(d / "top.tar"), [("t", {"txt": b"top"})])
    _make_shard(str(d / "sub" / "deep.tar.gz"), [("u", {"txt": b"deep"})], mode="w:gz")
    flat = spark.read.format("tarshard").load(str(d))
    assert {r.key for r in flat.collect()} == {"t"}
    deep = (
        spark.read.format("tarshard")
        .option("recursiveFileLookup", "true")
        .load(str(d))
    )
    assert {(r.key, bytes(r.payload)) for r in deep.collect()} == {
        ("t", b"top"),
        ("u", b"deep"),
    }


def test_writer_roundtrip_multi_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "out_shards")
    src = spark.range(20).select(
        F.format_string("%05d", F.col("id")).alias("key"),
        F.create_map(
            F.lit("txt"), F.encode(F.concat(F.lit("doc-"), F.col("id")), "UTF-8")
        ).alias("data"),
    )
    src.repartition(3).write.format("tarshard").option("path", out).mode(
        "overwrite"
    ).save()
    parts = sorted(os.listdir(out))
    assert len([p for p in parts if p.endswith(".tar")]) == 3
    back = spark.read.format("tarshard").load(out)
    got = {r.key: bytes(r.payload) for r in back.collect()}
    assert got == {f"{i:05d}": f"doc-{i}".encode() for i in range(20)}


def test_writer_refuses_existing_without_overwrite(spark, tmp_path):
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    out = str(tmp_path / "exists_shards")
    src = spark.range(1).select(
        F.lit("k").alias("key"),
        F.create_map(F.lit("txt"), F.encode(F.lit("v"), "UTF-8")).alias("data"),
    )
    src.write.format("tarshard").option("path", out).mode("overwrite").save()
    # Spark only offers Append/Overwrite to Python data sources; append
    # into an existing shard directory is refused by the committer (a
    # shard set is immutable once committed)
    with pytest.raises(Exception) as exc:
        src.write.format("tarshard").option("path", out).mode("append").save()
    assert "exists" in str(exc.value)
    # the failed attempt must not leave staging directories behind
    parent = os.path.dirname(out)
    assert not [p for p in os.listdir(parent) if "_staging_" in p]


def test_writer_rejects_wrong_schema(spark, tmp_path):
    from pyspark.sql import functions as F

    src = spark.range(1).select(F.lit("k").alias("wrong"))
    with pytest.raises(Exception) as exc:
        src.write.format("tarshard").option(
            "path", str(tmp_path / "bad_shards")
        ).mode("overwrite").save()
    assert "key" in str(exc.value) and "data" in str(exc.value)


def test_deterministic_shard_bytes(spark, tmp_path):
    """mtime=0 + sorted member order ⇒ writing the same rows twice gives
    byte-identical shards (content-addressable outputs)."""
    from pyspark.sql import functions as F

    src = spark.range(5).select(
        F.format_string("%03d", F.col("id")).alias("key"),
        F.create_map(
            F.lit("txt"), F.encode(F.col("id").cast("string"), "UTF-8")
        ).alias("data"),
    )
    outs = []
    for tag in ("a", "b"):
        out = str(tmp_path / f"det_{tag}")
        src.coalesce(1).write.format("tarshard").option("path", out).mode(
            "overwrite"
        ).save()
        (part,) = [p for p in os.listdir(out) if p.endswith(".tar")]
        outs.append(open(os.path.join(out, part), "rb").read())
    assert outs[0] == outs[1]


def test_stream_discovers_and_survives_restart(spark, tmp_path):
    """Manifest-offset stream over arriving shards: shards that land
    while the query is down are picked up exactly once on restart from
    the checkpoint; already-processed shards are never re-read."""
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = tmp_path / "ckpt_tar"
    out = str(tmp_path / "out_parquet")
    _make_shard(str(src / "s0.tar"), [("a", {"txt": b"one"})])
    _make_shard(str(src / "s1.tar"), [("b", {"txt": b"two"})])

    def start():
        stream = (
            spark.readStream.format("tarshard")
            .schema(
                "shard string, key string, ext string, member string,"
                " size long, payload binary"
            )
            .load(str(src))
        )
        return (
            stream.selectExpr("key", "CAST(payload AS STRING) AS text")
            .writeStream.format("parquet")
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
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == [
        ("a", "one"),
        ("b", "two"),
    ]

    _make_shard(str(src / "s2.tar"), [("c", {"txt": b"three"})])
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == [
        ("a", "one"),
        ("b", "two"),
        ("c", "three"),
    ]


def test_jvm_png_decode_agrees_with_stdlib_parser(spark, tmp_path):
    """The JVM-side IHDR extraction used by q_multimodal_tarshard
    (substring+hex+conv) must agree with the Python stdlib header parser
    (operators/multimodal.parse_image_header) on the same bytes."""
    import struct
    import zlib

    from pyspark.sql import functions as F

    from pyspark_excel_datasource_spark.operators.multimodal import (
        parse_image_header,
    )

    payloads = []
    for w, h, ct in ((640, 480, 2), (1, 1, 0), (4096, 2160, 6)):
        ihdr_data = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        ihdr = (
            struct.pack(">I", len(ihdr_data))
            + b"IHDR"
            + ihdr_data
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
        )
        payloads.append(b"\x89PNG\r\n\x1a\n" + ihdr)

    d = tmp_path / "png_shards"
    d.mkdir()
    _make_shard(
        str(d / "p.tar"),
        [(f"k{i}", {"png": p}) for i, p in enumerate(payloads)],
    )
    members = spark.read.format("tarshard").load(str(d))

    def be32(offset):
        return F.conv(F.hex(F.substring(F.col("payload"), offset, 4)), 16, 10).cast(
            "long"
        )

    got = {
        r.key: (int(r.h), int(r.w), bytes(r.payload))
        for r in members.select(
            "key", be32(21).alias("h"), be32(17).alias("w"), "payload"
        ).collect()
    }
    for key, (h, w, payload) in got.items():
        ph, pw, _pc = parse_image_header(payload)
        assert (ph, pw) == (h, w), key


def test_size_capped_rolling_shards(spark, tmp_path):
    """maxBytesPerShard rolls to a new tar when the payload cap is hit;
    a sample never splits across shards, and the readback is lossless."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "capped_shards")
    # 10 samples of 100 payload bytes in ONE partition, 250-byte cap
    # → ceil-ish packing: shards of 2 samples each ⇒ 5 shards
    src = spark.range(10).select(
        F.format_string("%03d", F.col("id")).alias("key"),
        F.create_map(
            F.lit("bin"), F.encode(F.rpad(F.col("id").cast("string"), 100, "x"), "UTF-8")
        ).alias("data"),
    )
    src.coalesce(1).write.format("tarshard").option("path", out).option(
        "maxBytesPerShard", "250"
    ).mode("overwrite").save()
    shards = sorted(p for p in os.listdir(out) if p.endswith(".tar"))
    assert len(shards) == 5, shards
    back = spark.read.format("tarshard").option("mode", "samples").load(out)
    rows = back.collect()
    assert len(rows) == 10
    per_shard: dict = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r.key)
    assert all(len(keys) == 2 for keys in per_shard.values()), per_shard
    got = {r.key: bytes(dict(r.data)["bin"]) for r in rows}
    assert got["003"] == b"3" + b"x" * 99
