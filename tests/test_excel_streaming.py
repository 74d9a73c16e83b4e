"""Streaming source tests — precisely the reference's zero-coverage gap
(SURVEY.md §5.1: R7/R8 have no tests; §3.3: its counter offsets are not
replayable and a restart reprocesses the whole directory).

Asserts: discovery across micro-batches, no-dup/no-loss across a forced
restart from checkpoint, and watermark late-data behavior for the window
queries.
"""

from __future__ import annotations

import datetime as dt
import os

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


def test_stream_reader_rejects_non_directory(spark, tmp_path):
    """Negative path: streaming from a non-directory fails the query with
    the connector's AnalysisException recorded as the cause."""
    from pyspark.errors import StreamingQueryException

    f = tmp_path / "single.xlsx"
    _write(str(f), [(1, "a")])
    q = (
        spark.readStream.format("excel")
        .schema("id long, name string")
        .option("path", str(f))
        .load()
        .writeStream.format("memory")
        .queryName("nondir_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt_nondir"))
        .start()
    )
    try:
        with pytest.raises(StreamingQueryException, match="(?i)must be a directory"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()


def test_manifest_offsets_replay_exactly_with_midstream_arrivals(tmp_path):
    """Forced-crash recovery property: a batch is a pure function of its
    checkpointed (start, end) manifests. Files arriving after the offsets
    were fixed — and even a brand-new reader instance, as after a crash —
    must reproduce the SAME batch, byte for byte."""
    import json

    from pyspark.sql import types as T

    from pyspark_excel_datasource_spark.sources.excel import (
        ExcelOptions,
        ExcelStreamReader,
    )

    src = tmp_path / "replay"
    src.mkdir()
    _write(str(src / "f1.xlsx"), [(1, "a")])
    _write(str(src / "f2.xlsx"), [(2, "b")])
    schema = T.StructType([T.StructField("id", T.LongType())])
    opts = ExcelOptions.from_options({"path": str(src)})

    r1 = ExcelStreamReader(schema, opts)
    start = r1.initialOffset()
    end1 = r1.latestOffset()
    batch1 = [p.file_path for p in r1.partitions(start, end1)]
    assert [os.path.basename(p) for p in batch1] == ["f1.xlsx", "f2.xlsx"]

    # mid-stream arrival AFTER the batch's offsets were fixed
    _write(str(src / "f3.xlsx"), [(3, "c")])

    # same reader replays the same (start, end) → identical batch
    assert [p.file_path for p in r1.partitions(start, end1)] == batch1

    # crash recovery: offsets round-trip through the checkpoint (JSON) and
    # a NEW reader instance derives the identical batch from them
    start_rt = json.loads(json.dumps(start))
    end_rt = json.loads(json.dumps(end1))
    r2 = ExcelStreamReader(schema, opts)
    assert [p.file_path for p in r2.partitions(start_rt, end_rt)] == batch1

    # and the next batch contains exactly the mid-stream arrival
    end2 = r2.latestOffset()
    nxt = [os.path.basename(p.file_path) for p in r2.partitions(end_rt, end2)]
    assert nxt == ["f3.xlsx"]


def test_stream_writer_sweeps_stale_staging(spark, tmp_path):
    """A crashed run's orphaned .staging-<uuid> dir (its abort never ran)
    is swept when the next writer instance takes over the sink dir."""
    out = tmp_path / "sweep_sink"
    out.mkdir()
    stale = out / ".staging-deadbeef"
    stale.mkdir()
    (stale / "part-00000-junk.xlsx").write_bytes(b"orphan")

    src = tmp_path / "sweep_src"
    src.mkdir()
    _write(str(src / "f1.xlsx"), [(1, "a")])
    q = (
        spark.readStream.format("excel")
        .schema("id long, name string")
        .option("path", str(src))
        .load()
        .writeStream.format("excel")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt_sweep"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert not stale.exists(), "orphaned staging dir must be swept"
    assert any(f.startswith("batch-") for f in os.listdir(out))


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream interval join through the Excel source: purchases
    join clicks by user within a 10-minute lookback, both sides
    watermarked (the state-bounded join Structured Streaming runs where
    AQE can't help — the streaming counterpart of q_join_range)."""
    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    clicks_dir = tmp_path / "ss_clicks"
    purch_dir = tmp_path / "ss_purchases"
    clicks_dir.mkdir()
    purch_dir.mkdir()

    def write_events(d, name, rows):
        minixlsx.write_xlsx(
            str(d / name), pd.DataFrame(rows, columns=["user_id", "ts"])
        )

    # user 1: click at :02 and :07, purchase at :10 → both clicks match
    # user 2: click at :30, purchase at :45 → outside 10-min window
    write_events(clicks_dir, "c1.xlsx", [
        (1, t0 + dt.timedelta(minutes=2)),
        (1, t0 + dt.timedelta(minutes=7)),
        (2, t0 + dt.timedelta(minutes=30)),
    ])
    write_events(purch_dir, "p1.xlsx", [
        (1, t0 + dt.timedelta(minutes=10)),
        (2, t0 + dt.timedelta(minutes=45)),
    ])

    clicks = (
        spark.readStream.format("excel")
        .schema("user_id long, ts timestamp")
        .option("path", str(clicks_dir))
        .load()
        .withWatermark("ts", "30 minutes")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    purchases = (
        spark.readStream.format("excel")
        .schema("user_id long, ts timestamp")
        .option("path", str(purch_dir))
        .load()
        .withWatermark("ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            """
            user_id = c_user AND
            c_ts >= ts - INTERVAL 10 MINUTES AND
            c_ts < ts
            """
        ),
        "inner",
    )
    out = str(tmp_path / "ss_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    got = sorted((r.user_id, r.c_ts.minute) for r in rows)
    assert got == [(1, 2), (1, 7)], got


def test_stream_writer_commit_replay_idempotent(tmp_path):
    """Exactly-once per batch file: recovery replays a batch by calling
    commit again with the same batchId — the batch file must be atomically
    REPLACED, not duplicated or appended."""
    import pandas as pd
    from pyspark.sql import types as T

    from pyspark_excel_datasource_spark.sources.excel import (
        ExcelCommitMessage,
        ExcelOptions,
        ExcelStreamWriter,
        _write_frame,
    )

    out = tmp_path / "replay_sink"
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    opts = ExcelOptions.from_options({"path": str(out)})

    def staged_messages(writer, rows):
        part = os.path.join(writer.staging, "part-00000-test.xlsx")
        os.makedirs(writer.staging, exist_ok=True)
        _write_frame(part, pd.DataFrame(rows, columns=["id", "name"]), "Sheet1")
        return [ExcelCommitMessage(part_path=part, rows=len(rows))]

    # first attempt commits batch 7
    w1 = ExcelStreamWriter(schema, opts)
    w1.commit(staged_messages(w1, [(1, "a"), (2, "b")]), batchId=7)
    # crash-recovery replay: a NEW writer instance (fresh uuid, as Spark
    # constructs per phase) re-commits the SAME batch with the same rows
    w2 = ExcelStreamWriter(schema, opts)
    w2.commit(staged_messages(w2, [(1, "a"), (2, "b")]), batchId=7)

    files = sorted(f for f in os.listdir(out) if f.endswith(".xlsx"))
    assert files == ["batch-00000007.xlsx"], files
    from pyspark_excel_datasource_spark.sources import minixlsx

    frame = minixlsx.read_xlsx(str(out / "batch-00000007.xlsx"))
    assert sorted(map(tuple, frame.itertuples(index=False))) == [(1, "a"), (2, "b")]
    # no staging residue from either attempt
    assert not [d for d in os.listdir(out) if d.startswith(".staging-")]


def test_stream_chunked_partitions(spark, tmp_path):
    """chunkRows splits an arriving file into row-range partitions in the
    stream too — no row lost or duplicated, and partitions() really
    chunks."""
    from pyspark.sql import types as T

    from pyspark_excel_datasource_spark.sources.excel import (
        ExcelOptions,
        ExcelStreamReader,
    )

    src = tmp_path / "chunked"
    src.mkdir()
    _write(str(src / "big.xlsx"), [(i, f"r{i}") for i in range(10)])

    # unit level: 10 rows at chunkRows=3 → 4 partitions with offsets
    rdr = ExcelStreamReader(
        T.StructType([T.StructField("id", T.LongType())]),
        ExcelOptions.from_options({"path": str(src), "chunkRows": "3"}),
    )
    parts = rdr.partitions(rdr.initialOffset(), rdr.latestOffset())
    assert [(p.skip_rows, p.n_rows) for p in parts] == [
        (0, 3), (3, 3), (6, 3), (9, 1),
    ]

    # end to end through a query
    q = (
        spark.readStream.format("excel")
        .schema("id long, name string")
        .option("path", str(src))
        .option("chunkRows", "3")
        .load()
        .writeStream.format("memory")
        .queryName("chunk_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_chunk"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    rows = spark.table("chunk_sink").collect()
    assert sorted(r.id for r in rows) == list(range(10))


def test_crash_recovery_torn_commit_zero_reprocessing(spark, tmp_path):
    """Kill-and-restart proof for the replayable-offset claim (the
    reference's counter offsets reprocess the whole directory on restart,
    connector.py:228-243).

    Simulates the classic torn crash point — the sink committed the batch
    and THEN the process died before the checkpoint commit log was
    written — by deleting the last entry of ``ckpt/commits`` while
    leaving ``ckpt/offsets`` intact. On restart Spark re-runs that batch
    from the WAL'd offsets; with manifest offsets the re-run derives the
    exact same file set (asserted on the offsets log), and the file
    sink's own batchId log makes the replay a no-op, so no row
    duplicates and no file is read into the output twice.
    """
    import glob as _glob
    import json

    src = tmp_path / "crash_src"
    src.mkdir()
    ckpt = tmp_path / "crash_ckpt"
    out = str(tmp_path / "crash_out")
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
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == [
        (1, "a"),
        (2, "b"),
    ]

    # ---- simulate the crash: offset WAL present, commit log torn ----
    commits = sorted(_glob.glob(os.path.join(str(ckpt), "commits", "[0-9]*")))
    offsets = sorted(_glob.glob(os.path.join(str(ckpt), "offsets", "[0-9]*")))
    assert commits and offsets
    torn_batch = os.path.basename(commits[-1])
    os.remove(commits[-1])
    # the local checksum fs keeps a .crc sidecar; a torn commit would not
    # leave one behind either, and Spark's rewrite refuses to clobber it
    crc = os.path.join(os.path.dirname(commits[-1]), f".{torn_batch}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    def manifest(path):
        # offset log entry: version line, metadata line, then one offset
        # JSON per source — the manifest is the excel source's offset
        with open(path) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        return json.loads(lines[-1])

    before = manifest(os.path.join(str(ckpt), "offsets", torn_batch))

    # a file arriving BETWEEN crash and restart must not leak into the
    # replayed batch (replay = WAL'd manifest, not directory state)
    _write(str(src / "f3.xlsx"), [(3, "c")])

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    after = manifest(os.path.join(str(ckpt), "offsets", torn_batch))
    assert before == after, "replayed batch must re-derive the identical manifest"
    assert "f3.xlsx" not in json.dumps(after.get("files", after))

    # end-to-end exactly-once: replay deduped by the sink, f3 appended once
    final = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert final == [(1, "a"), (2, "b"), (3, "c")]
