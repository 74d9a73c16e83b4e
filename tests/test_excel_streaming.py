"""Streaming source tests — precisely the reference's zero-coverage gap
(SURVEY.md §5.1: R7/R8 have no tests; §3.3: its counter offsets are not
replayable and a restart reprocesses the whole directory).

Asserts: discovery across micro-batches, no-dup/no-loss across a forced
restart from checkpoint, and watermark late-data behavior for the window
queries.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark_excel_datasource_spark.sources import minixlsx
from pyspark_excel_datasource_spark.sources.excel import register_excel


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_excel(spark)


def _write(path, rows):
    minixlsx.write_xlsx(path, pd.DataFrame(rows, columns=["id", "name"]))


def _start(spark, src_dir, ckpt, sink_name):
    stream = (
        spark.readStream.format("excel")
        .schema("id long, name string")
        .option("path", str(src_dir))
        .load()
    )
    return (
        stream.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 second")
        .start()
    )


def test_discovery_across_microbatches(spark, tmp_path):
    src = tmp_path / "arrivals"
    src.mkdir()
    ckpt = tmp_path / "ckpt1"
    _write(str(src / "f1.xlsx"), [(1, "a")])
    _write(str(src / "f2.xlsx"), [(2, "b")])

    q = _start(spark, src, ckpt, "arrivals_sink")
    try:
        q.processAllAvailable()
        assert {r.id for r in spark.table("arrivals_sink").collect()} == {1, 2}
        _write(str(src / "f3.xlsx"), [(3, "c")])
        q.processAllAvailable()
        assert {r.id for r in spark.table("arrivals_sink").collect()} == {1, 2, 3}
    finally:
        q.stop()


def test_restart_no_dup_no_loss(spark, tmp_path):
    """Checkpointed manifest offsets ⇒ a restarted query must pick up only
    files that arrived while it was down — nothing reprocessed, nothing
    dropped."""
    src = tmp_path / "restart"
    src.mkdir()
    ckpt = tmp_path / "ckpt2"
    out = str(tmp_path / "out_parquet")
    _write(str(src / "f1.xlsx"), [(1, "a")])
    _write(str(src / "f2.xlsx"), [(2, "b")])

    def start():
        stream = (
            spark.readStream.format("excel")
            .schema("id long, name string")
            .option("path", str(src))
            .load()
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
    first = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert sorted(first) == [(1, "a"), (2, "b")]

    # files arriving while the query is down
    _write(str(src / "f3.xlsx"), [(3, "c")])
    _write(str(src / "f4.xlsx"), [(4, "d")])

    # restart from the same checkpoint: f1/f2 must NOT be reprocessed,
    # f3/f4 must not be lost
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    final = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert sorted(final) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_watermark_drops_late_data(spark, tmp_path):
    """Event-time watermark semantics on a real micro-batch stream (the
    registered q_stream_watermark runs the batch-equivalent form; this is
    the genuine late-drop behavior)."""
    import pyspark.sql.functions as F

    src = tmp_path / "late"
    src.mkdir()
    ckpt = tmp_path / "ckpt3"

    def write_events(name, rows):
        minixlsx.write_xlsx(
            str(src / name), pd.DataFrame(rows, columns=["ts", "v"])
        )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    write_events("b1.xlsx", [(t0 + dt.timedelta(minutes=m), 1.0) for m in (0, 5, 60)])

    stream = (
        spark.readStream.format("excel")
        .schema("ts timestamp, v double")
        .option("path", str(src))
        .load()
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # an event 2 hours late, far behind the watermark (10:60 - 10min)
        write_events("b2.xlsx", [(t0 + dt.timedelta(minutes=1), 1.0)])
        q.processAllAvailable()
        # push watermark forward so closed windows emit
        write_events("b3.xlsx", [(t0 + dt.timedelta(minutes=180), 1.0)])
        q.processAllAvailable()
        rows = {r.ws: r.n for r in spark.table("late_sink").collect()}
        # the 10:00 window closed at count 2 — the late event was dropped
        assert rows.get(t0) == 2
    finally:
        q.stop()


def test_stream_writer_excel_sink(spark, tmp_path):
    """Parquet-stream → Excel streaming sink: one batch-<id>.xlsx per
    micro-batch, rows preserved across multi-partition batches."""
    import os

    src = tmp_path / "sink_src"
    src.mkdir()
    out = str(tmp_path / "excel_sink")
    ckpt = str(tmp_path / "ckpt_sink")
    _write(str(src / "f1.xlsx"), [(1, "a"), (2, "b")])

    stream = (
        spark.readStream.format("excel")
        .schema("id long, name string")
        .option("path", str(src))
        .load()
    )
    q = (
        stream.repartition(3)
        .writeStream.format("excel")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(str(src / "f2.xlsx"), [(3, "c")])
        q.processAllAvailable()
    finally:
        q.stop()

    batches = sorted(f for f in os.listdir(out) if f.endswith(".xlsx"))
    assert len(batches) >= 2
    back = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", out)
        .load()
    )
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b"), (3, "c")]
