"""Round 14: pydelta maxFilesPerTrigger — admission control via
fractional offsets ({"version", "index"}), splitting micro-batches
WITHIN a log version at file granularity while staying replayable
(every recorded range reproduces its exact file slice)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_excel_datasource_spark.sources.delta_stream import (  # noqa: E402
    register_pydelta,
)
from pyspark_excel_datasource_spark.sources.deltalog import (  # noqa: E402
    write_delta,
)


def _three_by_three(spark, tmp_path):
    """3 commits x 3 files each (9 files, 70 rows total)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "k long, g long"
    )
    for r in range(3):
        write_delta(
            spark,
            df.filter(F.col("k") % 3 == r).repartition(3),
            path,
            mode="append",
        )
    return path


def _offsets(ckpt: str) -> list[dict]:
    d = os.path.join(ckpt, "offsets")
    out = []
    for f in sorted(
        (n for n in os.listdir(d) if not n.startswith(".")), key=int
    ):
        last = open(os.path.join(d, f)).read().splitlines()[-1]
        out.append(json.loads(last))
    return out


def _files_spanned(reader, start: dict, end: dict) -> int:
    return len(reader.partitions(start, end))


def test_maxfiles_bounds_every_batch(spark, tmp_path):
    """Continuous (processingTime) drain with maxFilesPerTrigger=2:
    full exactly-once census AND every committed batch's replayed
    range spans <= 2 files — including mid-version splits."""
    register_pydelta(spark)
    path = _three_by_three(spark, tmp_path)
    sink = f"mf_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("pydelta")
        .option("maxFilesPerTrigger", "2")
        .load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table(sink).count() == 70:
                break
            time.sleep(0.5)
        assert spark.table(sink).count() == 70
    finally:
        q.stop()
    assert spark.table(sink).select("k").distinct().count() == 70  # no dupes

    # replay every committed range through a fresh reader: <= 2 files
    # per batch, and at least one offset splits INSIDE a version
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    reader = DeltaStreamReader(
        spark.read.format("pydelta").load(path).schema, {"path": path}
    )
    offs = _offsets(ckpt)
    prev = {"version": -1}
    spans = []
    for off in offs:
        spans.append(_files_spanned(reader, prev, off))
        prev = off
    assert all(s <= 2 for s in spans), spans
    assert sum(spans) == 9
    assert any("index" in o for o in offs), offs  # fractional split happened


def test_maxfiles_available_now_restart_loop(spark, tmp_path):
    """availableNow + persistent checkpoint: each run consumes ONE
    bounded batch (the Python source has no availableNow iteration),
    restarts resume exactly-once, and the loop drains the table in
    ceil(9/4)+ runs with the <=4-file bound held across restarts."""
    register_pydelta(spark)
    path = _three_by_three(spark, tmp_path)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt2")
    runs = 0
    cnt = 0
    while runs < 10:
        q = (
            spark.readStream.format("pydelta")
            .option("maxFilesPerTrigger", "4")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(90)
        q.stop()
        runs += 1
        cnt = (
            spark.read.parquet(out).count() if os.path.exists(out) else 0
        )
        if cnt == 70:
            break
    assert cnt == 70, cnt
    assert runs == 3, runs  # ceil(9 files / 4 per batch)
    got = {r.k for r in spark.read.parquet(out).collect()}
    assert got == set(range(70))  # exactly-once across restarts


def test_maxfiles_legacy_offsets_replay_whole_versions(spark, tmp_path):
    """Index-less offsets (pre-r14 checkpoints) keep their meaning:
    {"version": v} = fully consumed, so a legacy range replays whole
    versions unchanged."""
    register_pydelta(spark)
    path = _three_by_three(spark, tmp_path)
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    reader = DeltaStreamReader(
        spark.read.format("pydelta").load(path).schema, {"path": path}
    )
    assert len(reader.partitions({"version": -1}, {"version": 0})) == 3
    assert len(reader.partitions({"version": 0}, {"version": 2})) == 6
    assert len(reader.partitions({"version": -1}, {"version": 2})) == 9


def test_maxfiles_option_validation(spark, tmp_path):
    register_pydelta(spark)
    path = _three_by_three(spark, tmp_path)
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    schema = spark.read.format("pydelta").load(path).schema
    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        DeltaStreamReader(schema, {"path": path, "maxFilesPerTrigger": "0"})
    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        DeltaStreamReader(schema, {"path": path, "maxFilesPerTrigger": "x"})


# ---------------------------------------------------------------------------
# Iceberg twin: streaming-max-files-per-micro-batch
# ---------------------------------------------------------------------------


def _three_by_three_iceberg(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import write_iceberg

    path = str(tmp_path / "ice")
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "k long, g long"
    )
    for r in range(3):
        write_iceberg(
            spark,
            df.filter(F.col("k") % 3 == r).repartition(3),
            path,
            mode="append",
        )
    return path


def test_iceberg_maxfiles_bounds_every_batch(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        IcebergStreamReader,
        register_pyiceberg_stream,
    )

    register_pyiceberg_stream(spark)
    path = _three_by_three_iceberg(spark, tmp_path)
    sink = f"imf_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("pyiceberg_stream")
        .option("streaming-max-files-per-micro-batch", "2")
        .load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table(sink).count() == 70:
                break
            time.sleep(0.5)
        assert spark.table(sink).count() == 70
    finally:
        q.stop()
    assert spark.table(sink).select("k").distinct().count() == 70

    reader = IcebergStreamReader(
        spark.read.format("pyiceberg_stream").load(path).schema,
        {"path": path},
    )
    offs = _offsets(ckpt)
    prev = {"snapshot_id": 0}
    spans = []
    for off in offs:
        spans.append(len(reader.partitions(prev, off)))
        prev = off
    assert all(s <= 2 for s in spans), spans
    assert sum(spans) == 9
    assert any("index" in o for o in offs), offs


def test_iceberg_maxfiles_legacy_offsets(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        IcebergStreamReader,
        register_pyiceberg_stream,
    )

    register_pyiceberg_stream(spark)
    path = _three_by_three_iceberg(spark, tmp_path)
    reader = IcebergStreamReader(
        spark.read.format("pyiceberg_stream").load(path).schema,
        {"path": path},
    )
    assert len(reader.partitions({"snapshot_id": 0}, {"snapshot_id": 1})) == 3
    assert len(reader.partitions({"snapshot_id": 1}, {"snapshot_id": 3})) == 6
    assert len(reader.partitions({"snapshot_id": 0}, {"snapshot_id": 3})) == 9


def test_iceberg_maxfiles_option_validation(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        IcebergStreamReader,
        register_pyiceberg_stream,
    )

    register_pyiceberg_stream(spark)
    path = _three_by_three_iceberg(spark, tmp_path)
    schema = spark.read.format("pyiceberg_stream").load(path).schema
    with pytest.raises(ValueError, match="max-files-per-micro"):
        IcebergStreamReader(
            schema,
            {"path": path, "streaming-max-files-per-micro-batch": "0"},
        )


def test_maxbytes_soft_cap(spark, tmp_path):
    """maxBytesPerTrigger is a soft cap: a tiny budget admits exactly
    one file per batch (the crossing file streams alone); a huge budget
    drains everything in one batch; with maxFilesPerTrigger both
    bounds compose (whichever trips first)."""
    register_pydelta(spark)
    path = _three_by_three(spark, tmp_path)
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    schema = spark.read.format("pydelta").load(path).schema
    # budget of 1 byte -> every proposal advances exactly one file
    r = DeltaStreamReader(schema, {"path": path, "maxBytesPerTrigger": "1"})
    off = r.latestOffset()
    assert off == {"version": 0, "index": 1}, off
    r.commit(off)
    off2 = r.latestOffset()
    assert off2 == {"version": 0, "index": 2}, off2
    # huge budget -> the whole backlog in one proposal
    r2 = DeltaStreamReader(
        schema, {"path": path, "maxBytesPerTrigger": str(1 << 40)}
    )
    assert r2.latestOffset() == {"version": 2}
    # composed: bytes budget generous, file budget = 2 -> files win
    r3 = DeltaStreamReader(
        schema,
        {
            "path": path,
            "maxBytesPerTrigger": str(1 << 40),
            "maxFilesPerTrigger": "2",
        },
    )
    assert r3.latestOffset() == {"version": 0, "index": 2}
    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        DeltaStreamReader(schema, {"path": path, "maxBytesPerTrigger": "-5"})


def test_maxbytes_full_drain(spark, tmp_path):
    """Continuous drain under a small byte budget: exactly-once census,
    one file per batch (every fixture file exceeds the budget)."""
    register_pydelta(spark)
    path = _three_by_three(spark, tmp_path)
    sink = f"mb_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckptb")
    q = (
        spark.readStream.format("pydelta")
        .option("maxBytesPerTrigger", "1")
        .load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table(sink).count() == 70:
                break
            time.sleep(0.5)
        assert spark.table(sink).count() == 70
    finally:
        q.stop()
    assert spark.table(sink).select("k").distinct().count() == 70
    assert len(_offsets(ckpt)) == 9  # one file per committed batch


def test_iceberg_maxrows_soft_cap(spark, tmp_path):
    """streaming-max-rows-per-micro-batch: metadata-exact row budgets
    from manifest record_count — a tiny budget admits one file per
    proposal (soft cap), a huge budget drains everything, and the two
    axes compose (whichever trips first)."""
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        IcebergStreamReader,
        register_pyiceberg_stream,
    )

    register_pyiceberg_stream(spark)
    path = _three_by_three_iceberg(spark, tmp_path)
    schema = spark.read.format("pyiceberg_stream").load(path).schema
    r = IcebergStreamReader(
        schema, {"path": path, "streaming-max-rows-per-micro-batch": "1"}
    )
    off = r.latestOffset()
    assert off == {"snapshot_id": 1, "index": 1}, off
    r.commit(off)
    assert r.latestOffset() == {"snapshot_id": 1, "index": 2}
    r2 = IcebergStreamReader(
        schema,
        {"path": path, "streaming-max-rows-per-micro-batch": str(1 << 40)},
    )
    assert r2.latestOffset() == {"snapshot_id": 3}
    # rows budget generous + files budget 2 -> files cap wins
    r3 = IcebergStreamReader(
        schema,
        {
            "path": path,
            "streaming-max-rows-per-micro-batch": str(1 << 40),
            "streaming-max-files-per-micro-batch": "2",
        },
    )
    assert r3.latestOffset() == {"snapshot_id": 1, "index": 2}
    # rows budget = 20 (each file holds ~7-8 rows): the soft cap admits
    # files until the budget is reached, so the crossing file lands the
    # span at 3 (8+8 = 16 < 20, +8 = 24 >= 20 stops AFTER admitting it)
    r4 = IcebergStreamReader(
        schema, {"path": path, "streaming-max-rows-per-micro-batch": "20"}
    )
    o4 = r4.latestOffset()
    n4 = len(r4.partitions({"snapshot_id": 0}, o4))
    # snapshot 1 holds 24 rows in 3 files; the exact span depends on
    # the hash split (a 10/10/4 split stops at 2 files covering 20),
    # but the soft cap always stops within the first snapshot
    assert 2 <= n4 <= 3, (o4, n4)
    with pytest.raises(ValueError, match="max-rows-per-micro"):
        IcebergStreamReader(
            schema,
            {"path": path, "streaming-max-rows-per-micro-batch": "0"},
        )


def test_iceberg_maxrows_full_drain(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        register_pyiceberg_stream,
    )

    register_pyiceberg_stream(spark)
    path = _three_by_three_iceberg(spark, tmp_path)
    sink = f"imr_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckptr")
    q = (
        spark.readStream.format("pyiceberg_stream")
        .option("streaming-max-rows-per-micro-batch", "10")
        .load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table(sink).count() == 70:
                break
            time.sleep(0.5)
        assert spark.table(sink).count() == 70
    finally:
        q.stop()
    assert spark.table(sink).select("k").distinct().count() == 70
