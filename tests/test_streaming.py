"""Unified batch/streaming semantics: the window expressions registered as
batch queries produce the SAME results when run as genuine micro-batch
streams — the core Structured Streaming property the engine relies on."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from pyspark_excel_datasource_spark.sources import minixlsx
from pyspark_excel_datasource_spark.sources.excel import register_excel


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_excel(spark)


def _events(t0, spec):
    return pd.DataFrame(
        [(t0 + dt.timedelta(minutes=m), u, v) for m, u, v in spec],
        columns=["ts", "user_id", "value"],
    )


def test_stream_tumbling_equals_batch(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    spec = [(0, 1, 1.0), (3, 1, 2.0), (12, 2, 3.0), (14, 1, 4.0), (27, 2, 5.0)]
    src = tmp_path / "tumble"
    src.mkdir()
    # two files → two micro-batches worth of arrivals
    minixlsx.write_xlsx(str(src / "a.xlsx"), _events(t0, spec[:3]))
    minixlsx.write_xlsx(str(src / "b.xlsx"), _events(t0, spec[3:]))

    schema = "ts timestamp, user_id long, value double"

    def windowed(df):
        return (
            df.groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .select(F.col("w.start").alias("ws"), "n", "v")
        )

    stream = (
        spark.readStream.format("excel").schema(schema).option("path", str(src)).load()
    )
    q = (
        windowed(stream)
        .writeStream.format("memory")
        .queryName("tumble_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.read.format("excel").schema(schema).option("path", str(src)).load()
    )
    expect = {(r.ws, r.n, r.v) for r in windowed(batch).collect()}
    got = {(r.ws, r.n, r.v) for r in spark.table("tumble_sink").collect()}
    assert got == expect and len(got) == 3


def test_stream_session_window_equals_batch(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    # user 1: two sessions (gap > 30m); user 2: one session
    spec = [(0, 1, 1.0), (10, 1, 1.0), (90, 1, 1.0), (5, 2, 1.0)]
    src = tmp_path / "sess"
    src.mkdir()
    minixlsx.write_xlsx(str(src / "a.xlsx"), _events(t0, spec))

    schema = "ts timestamp, user_id long, value double"

    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("ss"), "n")
        )

    stream = (
        spark.readStream.format("excel").schema(schema).option("path", str(src)).load()
    )
    q = (
        sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.read.format("excel").schema(schema).option("path", str(src)).load()
    expect = {(r.user_id, r.ss, r.n) for r in sessions(batch).collect()}
    got = {(r.user_id, r.ss, r.n) for r in spark.table("sess_sink").collect()}
    assert got == expect
    assert sum(1 for u, _, _ in got if u == 1) == 2  # two sessions for user 1


def test_stream_static_join_equals_batch(spark, tmp_path):
    """q_stream_enrich's shape as a genuine micro-batch stream: events
    stream joined to a static dim, windowed — identical to batch."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    spec = [(0, 1, 1.0), (3, 2, 2.0), (12, 1, 3.0), (14, 3, 4.0), (27, 2, 5.0)]
    src = tmp_path / "enrich"
    src.mkdir()
    minixlsx.write_xlsx(str(src / "a.xlsx"), _events(t0, spec[:3]))
    minixlsx.write_xlsx(str(src / "b.xlsx"), _events(t0, spec[3:]))

    schema = "ts timestamp, user_id long, value double"
    dim = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY"), (3, "BUILDING")],
        "user_id long, segment string",
    )

    def enriched(df):
        return (
            df.join(F.broadcast(dim), "user_id")
            .groupBy(F.window("ts", "15 minutes").alias("w"), "segment")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .select(F.col("w.start").alias("ws"), "segment", "n", "v")
        )

    stream = (
        spark.readStream.format("excel").schema(schema).option("path", str(src)).load()
    )
    q = (
        enriched(stream)
        .writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.read.format("excel").schema(schema).option("path", str(src)).load()
    expect = {(r.ws, r.segment, r.n, r.v) for r in enriched(batch).collect()}
    got = {
        (r.ws, r.segment, r.n, r.v)
        for r in spark.table("enrich_sink").collect()
    }
    assert got == expect and len(got) >= 3


def test_stream_sliding_window_equals_batch(spark, tmp_path):
    """Sliding windows (10 min / 5 min slide): each event lands in two
    windows via Expand — the semantics must be identical under the
    micro-batch engine (the q_stream_sliding contract)."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    spec = [(0, 1, 1.0), (4, 2, 2.0), (7, 1, 3.0), (13, 3, 4.0), (22, 2, 5.0)]
    src = tmp_path / "slide"
    src.mkdir()
    minixlsx.write_xlsx(str(src / "a.xlsx"), _events(t0, spec[:2]))
    minixlsx.write_xlsx(str(src / "b.xlsx"), _events(t0, spec[2:]))

    schema = "ts timestamp, user_id long, value double"

    def windowed(df):
        return (
            df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(
                F.count("*").alias("n"),
                F.approx_count_distinct("user_id").alias("nu"),
            )
            .select(F.col("w.start").alias("ws"), "n", "nu")
        )

    stream = (
        spark.readStream.format("excel").schema(schema).option("path", str(src)).load()
    )
    q = (
        windowed(stream)
        .writeStream.format("memory")
        .queryName("slide_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.read.format("excel").schema(schema).option("path", str(src)).load()
    )
    expect = {(r.ws, r.n, r.nu) for r in windowed(batch).collect()}
    got = {(r.ws, r.n, r.nu) for r in spark.table("slide_sink").collect()}
    assert got == expect
    # every event appears in exactly size/slide = 2 windows
    assert sum(n for _, n, _ in got) == 2 * len(spec)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Bounded-state streaming dedup: duplicates arriving in LATER
    micro-batches (within the watermark) are still suppressed — the
    q_stream_dedup contract's true-stream form."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    src = tmp_path / "dedup"
    src.mkdir()
    # batch 1: two distinct keys; batch 2: replays key (1,'a') + new key
    minixlsx.write_xlsx(
        str(src / "a.xlsx"),
        pd.DataFrame(
            [(t0, 1, "a"), (t0 + dt.timedelta(minutes=1), 2, "b")],
            columns=["ts", "user_id", "event_type"],
        ),
    )
    minixlsx.write_xlsx(
        str(src / "b.xlsx"),
        pd.DataFrame(
            [
                (t0 + dt.timedelta(minutes=2), 1, "a"),  # duplicate key
                (t0 + dt.timedelta(minutes=3), 3, "c"),
            ],
            columns=["ts", "user_id", "event_type"],
        ),
    )
    schema = "ts timestamp, user_id long, event_type string"
    stream = (
        spark.readStream.format("excel").schema(schema).option("path", str(src)).load()
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.event_type) for r in spark.table("dedup_sink").collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Two watermarked streams joined with a time-range condition emit
    exactly the pairs the identical batch join produces — the
    stream-stream join contract behind q_stream_join."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    # (minute, user, value): purchases at 10/20/31; clicks before some
    purchases = [(10, 1, 1.0), (20, 2, 2.0), (31, 1, 3.0)]
    clicks = [(2, 1, 0.1), (8, 1, 0.2), (16, 2, 0.3), (28, 1, 0.4), (40, 2, 0.5)]
    pdir, cdir = tmp_path / "purchases", tmp_path / "clicks"
    pdir.mkdir(); cdir.mkdir()
    minixlsx.write_xlsx(str(pdir / "a.xlsx"), _events(t0, purchases[:2]))
    minixlsx.write_xlsx(str(pdir / "b.xlsx"), _events(t0, purchases[2:]))
    minixlsx.write_xlsx(str(cdir / "a.xlsx"), _events(t0, clicks[:3]))
    minixlsx.write_xlsx(str(cdir / "b.xlsx"), _events(t0, clicks[3:]))

    schema = "ts timestamp, user_id long, value double"

    def load(kind, path):
        reader = (
            spark.readStream if kind == "stream" else spark.read
        ).format("excel").schema(schema).option("path", str(path))
        return reader.load()

    def joined(p, c):
        p = p.select(F.col("ts").alias("p_ts"), F.col("user_id"), F.col("value").alias("pv"))
        c = c.select(F.col("ts").alias("c_ts"), F.col("user_id").alias("c_user"), F.col("value").alias("cv"))
        if hasattr(p, "isStreaming") and p.isStreaming:
            p = p.withWatermark("p_ts", "1 hour")
            c = c.withWatermark("c_ts", "1 hour")
        return p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (c.c_ts < F.col("p_ts")),
        ).select("user_id", "pv", "cv")

    q = (
        joined(load("stream", pdir), load("stream", cdir))
        .writeStream.format("memory")
        .queryName("ssjoin_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    expect = {
        (r.user_id, r.pv, r.cv)
        for r in joined(load("batch", pdir), load("batch", cdir)).collect()
    }
    got = {(r.user_id, r.pv, r.cv) for r in spark.table("ssjoin_sink").collect()}
    assert got == expect
    # sanity on the fixture: u1's purchase@10 matches clicks@2,8; @31
    # matches @28 (not @2/@8 — outside 15 min); u2's @20 matches @16
    assert (1, 1.0, 0.2) in got and (1, 3.0, 0.4) in got and (2, 2.0, 0.3) in got
    assert (1, 3.0, 0.1) not in got


def test_foreachbatch_merge_idempotent(spark, tmp_path):
    """The real foreachBatch loop behind q_stream_foreachbatch: an
    upsert MERGE per micro-batch, idempotent by batch_id (replaying a
    delivered batch must not change state), converging to the one-shot
    batch aggregate."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    spec = [(0, 1, 1.5), (3, 1, 2.25), (12, 2, 3.0), (14, 1, 4.0), (27, 2, 5.5)]
    src = tmp_path / "febatch"
    src.mkdir()
    minixlsx.write_xlsx(str(src / "a.xlsx"), _events(t0, spec[:2]))
    schema = "ts timestamp, user_id long, value double"

    state: dict[int, list] = {}  # user -> [n, total_cents, last_ts]
    applied: set[int] = set()
    deliveries: list = []  # (batch_id, per-user partials) for replay

    def apply_partials(batch_id, part):
        if batch_id in applied:  # crash-replay delivery: must be a no-op
            return
        applied.add(batch_id)
        for r in part:
            cur = state.setdefault(r["user_id"], [0, 0, r["last_ts"]])
            cur[0] += r["n"]
            cur[1] += r["cents"]
            cur[2] = max(cur[2], r["last_ts"])

    def merge(batch_df, batch_id):
        part = (
            batch_df.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
                F.max("ts").alias("last_ts"),
            )
            .collect()
        )
        deliveries.append((batch_id, part))
        apply_partials(batch_id, part)

    q = (
        spark.readStream.format("excel")
        .schema(schema)
        .option("path", str(src))
        .load()
        .writeStream.foreachBatch(merge)
        .start()
    )
    try:
        q.processAllAvailable()
        minixlsx.write_xlsx(str(src / "b.xlsx"), _events(t0, spec[2:]))
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(applied) >= 2  # the merge ran per micro-batch
    snapshot = {k: list(v) for k, v in state.items()}

    # redeliver every batch (simulated crash replay): state must not move
    for batch_id, part in deliveries:
        apply_partials(batch_id, part)
    assert {k: list(v) for k, v in state.items()} == snapshot

    batch = (
        spark.read.format("excel").schema(schema).option("path", str(src)).load()
    )
    expect = {
        (r["user_id"], r["n"], r["cents"], r["last_ts"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    got = {(u, v[0], v[1], v[2]) for u, v in state.items()}
    assert got == expect


def test_stream_rate_limit_equals_batch(spark, tmp_path):
    """The stateful streaming rate limiter admits exactly the events the
    batch window-rank form keeps — including across micro-batch
    boundaries (a key that fills its budget in batch 1 must admit
    nothing from batch 2)."""
    import pandas as pd

    from pyspark_excel_datasource_spark.streaming.stateful import (
        rate_limited_stream,
    )
    from pyspark_excel_datasource_spark.streaming.windows import _RATE_MAX

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    # user 1: 5 events inside ONE 10-min bucket split across two files
    # (budget exhausts mid-stream); user 2: spread over two buckets
    spec_a = [(0, 1, 10), (1, 1, 11), (2, 1, 12), (3, 2, 20)]
    spec_b = [(4, 1, 13), (5, 1, 14), (12, 2, 21), (13, 2, 22)]

    def frame(spec):
        return pd.DataFrame(
            [
                (t0 + dt.timedelta(minutes=m), u, e)
                for m, u, e in spec
            ],
            columns=["ts", "user_id", "event_id"],
        )

    src = tmp_path / "rate"
    src.mkdir()
    minixlsx.write_xlsx(str(src / "a.xlsx"), frame(spec_a))
    minixlsx.write_xlsx(str(src / "b.xlsx"), frame(spec_b))

    schema = "ts timestamp, user_id long, event_id long"
    stream = (
        spark.readStream.format("excel")
        .schema(schema)
        .option("path", str(src))
        .load()
    )
    q = (
        rate_limited_stream(stream, _RATE_MAX)
        .writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.event_id: r.nth_in_window
        for r in spark.table("rate_sink").collect()
    }

    batch = (
        spark.read.format("excel")
        .schema(schema)
        .option("path", str(src))
        .load()
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id", F.window("ts", "10 minutes")).orderBy(
        "ts", "event_id"
    )
    expected = {
        r.event_id: r.nth
        for r in batch.select(
            "event_id", F.row_number().over(w).cast("int").alias("nth")
        )
        .filter(F.col("nth") <= _RATE_MAX)
        .collect()
    }
    assert streamed == expected
    # the cross-batch property actually bit: user 1 sent 5, kept 3, and
    # one of the drops arrived in the second micro-batch
    assert 13 not in streamed and 14 not in streamed
    assert len([e for e in streamed if e // 10 == 1]) == _RATE_MAX


def test_stream_stream_outer_join_equals_batch(spark, tmp_path):
    """Watermarked LEFT OUTER stream-stream join: matched pairs emit
    immediately; a purchase with no click in its window emits its null
    row exactly once, AFTER the click-side watermark passes the window
    end (state eviction) — and the final result set equals the batch
    left join."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    # u1 purchase@10 matches clicks@2,8; u2 purchase@20 has NO click in
    # (5, 20) -> must surface as the organic null row after eviction
    purchases = [(10, 1, 1.0), (20, 2, 2.0)]
    clicks1 = [(2, 1, 0.1), (8, 1, 0.2)]
    late_clicks = [(40, 3, 0.5)]  # advances the watermark, matches nothing
    later_clicks = [(55, 3, 0.6)]  # forces a batch that flushes evictions
    pdir, cdir = tmp_path / "op", tmp_path / "oc"
    pdir.mkdir(); cdir.mkdir()
    minixlsx.write_xlsx(str(pdir / "a.xlsx"), _events(t0, purchases))
    minixlsx.write_xlsx(str(cdir / "a.xlsx"), _events(t0, clicks1))

    schema = "ts timestamp, user_id long, value double"

    def load(kind, path):
        reader = (
            spark.readStream if kind == "stream" else spark.read
        ).format("excel").schema(schema).option("path", str(path))
        return reader.load()

    def joined(p, c):
        p = p.select(F.col("ts").alias("p_ts"), F.col("user_id"), F.col("value").alias("pv"))
        c = c.select(F.col("ts").alias("c_ts"), F.col("user_id").alias("c_user"), F.col("value").alias("cv"))
        if hasattr(p, "isStreaming") and p.isStreaming:
            p = p.withWatermark("p_ts", "0 seconds")
            c = c.withWatermark("c_ts", "0 seconds")
        return p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (c.c_ts < F.col("p_ts")),
            "left",
        ).select("user_id", "pv", "cv")

    q = (
        joined(load("stream", pdir), load("stream", cdir))
        .writeStream.format("memory")
        .queryName("ssjoin_outer_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r.user_id, r.pv, r.cv) for r in spark.table("ssjoin_outer_sink").collect()}
        # matched pairs are out; the organic row for u2 is NOT (its
        # window end of minute 20 hasn't been passed by the watermark)
        assert (1, 1.0, 0.1) in got1 and (1, 1.0, 0.2) in got1
        assert (2, 2.0, None) not in got1
        minixlsx.write_xlsx(str(cdir / "b.xlsx"), _events(t0, late_clicks))
        q.processAllAvailable()
        minixlsx.write_xlsx(str(cdir / "c.xlsx"), _events(t0, later_clicks))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.user_id, r.pv, r.cv) for r in spark.table("ssjoin_outer_sink").collect()}
    expect = {
        (r.user_id, r.pv, r.cv)
        for r in joined(load("batch", pdir), load("batch", cdir)).collect()
    }
    assert (2, 2.0, None) in got, "evicted organic row must surface"
    assert got == expect


def test_stream_stream_full_outer_join_equals_batch(spark, tmp_path):
    """Watermarked FULL OUTER stream-stream join: matched pairs emit
    immediately; an unmatched PURCHASE emits its null-click row once the
    click-side watermark passes its window end, and an unmatched CLICK
    emits its null-purchase row once the watermark passes click.ts+15min
    — both evictions verified mid-stream, and the final result set
    equals the batch full join. Watermark-advancing events are MATCHED
    pairs (u8, u9) so they emit immediately and leave no stuck state."""
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    # u1 purchase@10 matches clicks@2,8 · u2 purchase@20 has no click
    # (organic) · u4 click@12 has no purchase in [12, 27) (unattributed)
    purchases1 = [(10, 1, 1.0), (20, 2, 2.0)]
    clicks1 = [(2, 1, 0.1), (8, 1, 0.2), (12, 4, 0.3)]
    purchases2, clicks2 = [(60, 8, 8.0)], [(55, 8, 0.8)]   # matched pair
    purchases3, clicks3 = [(100, 9, 9.0)], [(95, 9, 0.9)]  # matched pair
    pdir, cdir = tmp_path / "fp", tmp_path / "fc"
    pdir.mkdir(); cdir.mkdir()
    minixlsx.write_xlsx(str(pdir / "a.xlsx"), _events(t0, purchases1))
    minixlsx.write_xlsx(str(cdir / "a.xlsx"), _events(t0, clicks1))

    schema = "ts timestamp, user_id long, value double"

    def load(kind, path):
        reader = (
            spark.readStream if kind == "stream" else spark.read
        ).format("excel").schema(schema).option("path", str(path))
        return reader.load()

    def joined(p, c):
        p = p.select(F.col("ts").alias("p_ts"), F.col("user_id").alias("p_user"), F.col("value").alias("pv"))
        c = c.select(F.col("ts").alias("c_ts"), F.col("user_id").alias("c_user"), F.col("value").alias("cv"))
        if hasattr(p, "isStreaming") and p.isStreaming:
            p = p.withWatermark("p_ts", "0 seconds")
            c = c.withWatermark("c_ts", "0 seconds")
        return p.join(
            c,
            (p.p_user == c.c_user)
            & (c.c_ts >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (c.c_ts < F.col("p_ts")),
            "full",
        ).select(F.coalesce("p_user", "c_user").alias("user_id"), "pv", "cv")

    q = (
        joined(load("stream", pdir), load("stream", cdir))
        .writeStream.format("memory")
        .queryName("ssjoin_full_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_full"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r.user_id, r.pv, r.cv) for r in spark.table("ssjoin_full_sink").collect()}
        # matched pairs out immediately; neither eviction row yet (the
        # global watermark is min(p=20, c=12) = 12 < both window ends)
        assert (1, 1.0, 0.1) in got1 and (1, 1.0, 0.2) in got1
        assert (2, 2.0, None) not in got1 and (4, None, 0.3) not in got1
        minixlsx.write_xlsx(str(pdir / "b.xlsx"), _events(t0, purchases2))
        minixlsx.write_xlsx(str(cdir / "b.xlsx"), _events(t0, clicks2))
        q.processAllAvailable()
        minixlsx.write_xlsx(str(pdir / "c.xlsx"), _events(t0, purchases3))
        minixlsx.write_xlsx(str(cdir / "c.xlsx"), _events(t0, clicks3))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.user_id, r.pv, r.cv) for r in spark.table("ssjoin_full_sink").collect()}
    expect = {
        (r.user_id, r.pv, r.cv)
        for r in joined(load("batch", pdir), load("batch", cdir)).collect()
    }
    assert (2, 2.0, None) in got, "evicted organic-purchase row must surface"
    assert (4, None, 0.3) in got, "evicted unattributed-click row must surface"
    assert got == expect
