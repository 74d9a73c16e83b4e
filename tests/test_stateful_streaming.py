"""Custom stateful streaming operator test: per-user running totals via
``applyInPandasWithState`` over the Excel file stream, state carried
across micro-batches."""

from __future__ import annotations

import pandas as pd

from pyspark_excel_datasource_spark.sources import minixlsx
from pyspark_excel_datasource_spark.sources.excel import register_excel
from pyspark_excel_datasource_spark.streaming.stateful import user_running_totals


def _write(path, rows):
    minixlsx.write_xlsx(path, pd.DataFrame(rows, columns=["user_id", "value"]))


def test_state_survives_across_microbatches(spark, tmp_path):
    register_excel(spark)
    src = tmp_path / "evts"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    _write(str(src / "b1.xlsx"), [(1, 1.50), (1, 2.25), (2, 10.00)])

    stream = (
        spark.readStream.format("excel")
        .schema("user_id long, value double")
        .option("path", str(src))
        .load()
    )
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.user_id: (r.n_events, r.total_cents)
                 for r in spark.table("totals").collect()}
        assert first == {1: (2, 375), 2: (1, 1000)}

        # second batch: state must accumulate, not reset
        _write(str(src / "b2.xlsx"), [(1, 0.25), (3, 5.00)])
        q.processAllAvailable()
        rows = spark.table("totals").collect()
        latest = {}
        for r in rows:  # update mode appends new versions; keep the max-n one
            cur = latest.get(r.user_id)
            if cur is None or r.n_events > cur[0]:
                latest[r.user_id] = (r.n_events, r.total_cents)
        assert latest == {1: (3, 400), 2: (1, 1000), 3: (1, 500)}
    finally:
        q.stop()


def test_tws_agrees_with_apply_in_pandas_with_state(spark, tmp_path):
    """Spark 4 ``transformWithStateInPandas`` (StatefulProcessor +
    ValueState, RocksDB store, protobuf state server — via the vendored
    wire shim when no real protobuf exists) must agree bit-for-bit with
    the ``applyInPandasWithState`` twin on the exact-cents running-totals
    contract. This is the invariant a production migration between the
    two state APIs needs."""
    import pytest

    from pyspark_excel_datasource_spark.streaming import tws

    if not tws._HAVE_TWS:
        pytest.skip("no protobuf runtime (real or shim)")

    register_excel(spark)
    tws._ship_protoshim(spark)

    src = tmp_path / "evts_tws"
    src.mkdir()
    _write(str(src / "b1.xlsx"), [(1, 1.50), (1, 2.25), (2, 10.00)])
    _write(str(src / "b2.xlsx"), [(1, 0.25), (3, 5.005), (2, -0.335)])

    def drain(make_out, sink, ckpt):
        stream = (
            spark.readStream.format("excel")
            .schema("user_id long, value double")
            .option("path", str(src))
            .load()
        )
        q = (
            make_out(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        latest = {}
        for r in spark.table(sink).collect():
            cur = latest.get(r.user_id)
            if cur is None or r.n_events > cur[0]:
                latest[r.user_id] = (r.n_events, r.total_cents)
        return latest

    old_api = drain(user_running_totals, "totals_old_api", "ckpt_old")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        new_api = drain(tws.user_running_totals_tws, "totals_tws", "ckpt_tws")
    finally:
        spark.conf.unset(provider_key)

    assert old_api == new_api
    assert new_api == {1: (3, 400), 2: (2, 966), 3: (1, 501)}


def test_tws_list_and_map_state_through_shim(spark, tmp_path):
    """Exercise the REST of the TWS state-server surface through the
    protobuf shim: ListState (put/appendValue/get), MapState
    (updateValue/getValue/containsKey/iterator) and timer listing — the
    message families (ListStatePut, AppendValue, MapStateCall, Keys,
    Iterator) that the value-state query never touches."""
    import pytest

    from pyspark_excel_datasource_spark.streaming import tws

    if not tws._HAVE_TWS:
        pytest.skip("no protobuf runtime (real or shim)")

    import pandas as pd
    from pyspark.sql import types as T

    register_excel(spark)
    tws._ship_protoshim(spark)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_list", T.LongType()),
            T.StructField("list_sum_cents", T.LongType()),
            T.StructField("n_map_keys", T.LongType()),
            T.StructField("max_bucket_cents", T.LongType()),
        ]
    )

    class ListMapTotals(tws.StatefulProcessor):
        """Every observed value appends to a ListState; a MapState keeps
        per-cent-bucket (value // 1) running sums; output summarizes both
        so each state backend is provably read back."""

        def init(self, handle):
            self._vals = handle.getListState(
                "vals", T.StructType([T.StructField("cents", T.LongType())])
            )
            self._buckets = handle.getMapState(
                "buckets",
                T.StructType([T.StructField("b", T.LongType())]),
                T.StructType([T.StructField("sum_cents", T.LongType())]),
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for v in pdf["value"]:
                    cents = int(round(float(v) * 100))
                    self._vals.appendValue((cents,))
                    bucket = cents // 100
                    prev = (
                        self._buckets.getValue((bucket,))
                        if self._buckets.containsKey((bucket,))
                        else (0,)
                    )
                    self._buckets.updateValue((bucket,), (prev[0] + cents,))
            all_vals = [t[0] for t in self._vals.get()]
            pairs = [(k[0], v[0]) for k, v in self._buckets.iterator()]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_list": [len(all_vals)],
                    "list_sum_cents": [sum(all_vals)],
                    "n_map_keys": [len(pairs)],
                    "max_bucket_cents": [max(v for _, v in pairs)],
                }
            )

        def close(self):
            pass

    src = tmp_path / "evts_listmap"
    src.mkdir()
    _write(str(src / "b1.xlsx"), [(1, 1.50), (1, 2.25), (1, 1.10), (2, 10.00)])
    _write(str(src / "b2.xlsx"), [(1, 0.25), (2, 10.50)])

    stream = (
        spark.readStream.format("excel")
        .schema("user_id long, value double")
        .option("path", str(src))
        .load()
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ListMapTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("listmap_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_listmap"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
    finally:
        spark.conf.unset(provider_key)

    latest = {}
    for r in spark.table("listmap_tws").collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_list > cur[0]:
            latest[r.user_id] = (
                r.n_list,
                r.list_sum_cents,
                r.n_map_keys,
                r.max_bucket_cents,
            )
    # user 1: cents 150,225,110,25 → list sum 510; buckets 1→260, 2→225, 0→25
    # user 2: cents 1000,1050 → sum 2050; buckets 10→2050
    assert latest[1] == (4, 510, 3, 260)
    assert latest[2] == (2, 2050, 1, 2050)


def test_tws_processing_time_timers_through_shim(spark, tmp_path):
    """Processing-time timers through the shim: registerTimer +
    listTimers in handleInputRows, handleExpiredTimer fired in a
    follow-up micro-batch of the same availableNow run — the
    TimerStateCallCommand / TimerRequest / StateResponseWithTimer
    message families. (availableNow is used deliberately: a TWS memory
    sink query refuses checkpoint recovery, and a continuous
    processing-time trigger never lets processAllAvailable settle while
    timers are pending.)"""
    import pytest

    from pyspark_excel_datasource_spark.streaming import tws

    if not tws._HAVE_TWS:
        pytest.skip("no protobuf runtime (real or shim)")

    import pandas as pd
    from pyspark.sql import types as T

    register_excel(spark)
    tws._ship_protoshim(spark)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    class TimerTotals(tws.StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._count = handle.getValueState(
                "cnt", T.StructType([T.StructField("n", T.LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            # already-expired timer -> fires in a follow-up batch
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() - 1
            )
            n_timers = len(list(self._handle.listTimers()))
            yield pd.DataFrame(
                {"user_id": [key[0]], "kind": ["data"], "n": [n * 10 + n_timers]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            fired = int(expiredTimerInfo.getExpiryTimeInMs() > 0)
            yield pd.DataFrame(
                {"user_id": [key[0]], "kind": ["timer"], "n": [fired]}
            )

        def close(self):
            pass

    src = tmp_path / "evts_timer"
    src.mkdir()
    _write(str(src / "b1.xlsx"), [(1, 1.0), (1, 2.0), (2, 3.0)])

    stream = (
        spark.readStream.format("excel")
        .schema("user_id long, value double")
        .option("path", str(src))
        .load()
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TimerTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("timer_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_timer"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
    finally:
        spark.conf.unset(provider_key)

    rows = spark.table("timer_tws").collect()
    data = {(r.user_id, r.n) for r in rows if r.kind == "data"}
    timer_fired = {r.user_id for r in rows if r.kind == "timer" and r.n == 1}
    # data rows: n*10 + n_timers (exactly one live timer at emit time)
    assert (1, 21) in data and (2, 11) in data
    # the expired timers registered during the data batch fire for both
    # keys in the availableNow run's follow-up batch
    assert timer_fired == {1, 2}


def test_tws_initial_state_through_shim(spark, tmp_path):
    """The last TWS surface: a batch DataFrame seeds per-key state
    (``initialState`` + ``handleInitialState``) — the warm-start pattern
    a production migration from applyInPandasWithState uses to carry
    existing state into the new API. Seeded totals must accumulate with
    streamed rows exactly."""
    import pytest

    from pyspark_excel_datasource_spark.streaming import tws

    if not tws._HAVE_TWS:
        pytest.skip("no protobuf runtime (real or shim)")

    import pandas as pd
    from pyspark.sql import types as T

    register_excel(spark)
    tws._ship_protoshim(spark)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )

    class SeededTotals(tws.StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("cents", T.LongType()),
                    ]
                ),
            )

        def handleInitialState(self, key, initialState, timerValues):
            # one pandas row per key from the seed DataFrame
            self._state.update(
                (int(initialState["n"].iloc[0]), int(initialState["cents"].iloc[0]))
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._state.get() if self._state.exists() else (0, 0)
            n, cents = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                cents += int(round(float(pdf["value"].sum()) * 100))
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self):
            pass

    seed = spark.createDataFrame(
        [(1, 5, 1000), (3, 2, 50)], "user_id long, n long, cents long"
    ).groupBy("user_id")

    src = tmp_path / "evts_seed"
    src.mkdir()
    _write(str(src / "b1.xlsx"), [(1, 1.00), (2, 2.00)])

    stream = (
        spark.readStream.format("excel")
        .schema("user_id long, value double")
        .option("path", str(src))
        .load()
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SeededTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
        initialState=seed,
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("seeded_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_seed"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
    finally:
        spark.conf.unset(provider_key)

    got = {
        r.user_id: (r.n_events, r.total_cents)
        for r in spark.table("seeded_tws").collect()
    }
    # user 1: seed (5, 1000) + one 1.00 event → (6, 1100)
    # user 2: no seed + one 2.00 event → (1, 200)
    # user 3: seed only, no stream rows → no output row (update mode)
    assert got[1] == (6, 1100)
    assert got[2] == (1, 200)
    assert 3 not in got


def test_tws_event_time_timers_through_shim(spark, tmp_path):
    """Event-time timers — the watermark-driven half of the TWS timer
    API (timeMode='EventTime'): a timer registered just past the current
    watermark fires once a LATER batch runs under the advanced watermark
    (batch 1's max event time minus the delay). Two availableNow runs
    share one checkpoint (foreachBatch sink, which unlike the memory
    sink supports TWS checkpoint recovery), mirroring how production
    restarts drive watermark-based expiry. Complements the
    processing-time twin above, so both timer clocks are exercised
    end-to-end through the shim."""
    import pytest

    from pyspark_excel_datasource_spark.streaming import tws

    if not tws._HAVE_TWS:
        pytest.skip("no protobuf runtime (real or shim)")

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    register_excel(spark)
    tws._ship_protoshim(spark)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    class EventTimeTimers(tws.StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._count = handle.getValueState(
                "cnt", T.StructType([T.StructField("n", T.LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            # run 1: watermark is still 0 -> expiry 1 ms; batch 1's max
            # event time (100 s, 0 s delay) then advances the watermark
            # past it, so the timer fires under run 2's batch
            self._handle.registerTimer(
                timerValues.getCurrentWatermarkInMs() + 1
            )
            yield pd.DataFrame(
                {"user_id": [key[0]], "kind": ["data"], "n": [n]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # the watermark the timer fired under — proves the expiry was
            # watermark-driven, not wall-clock
            wm = timerValues.getCurrentWatermarkInMs()
            yield pd.DataFrame(
                {"user_id": [key[0]], "kind": ["timer"], "n": [wm]}
            )

        def close(self):
            pass

    src = tmp_path / "evts_evtime"
    src.mkdir()
    # value doubles as the event time in seconds
    _write(str(src / "b1.xlsx"), [(1, 10.0), (1, 20.0), (2, 100.0)])

    collected: list[tuple] = []

    def run_once():
        stream = (
            spark.readStream.format("excel")
            .schema("user_id long, value double")
            .option("path", str(src))
            .load()
            .withColumn("ts", F.timestamp_seconds(F.col("value")))
            .withWatermark("ts", "0 seconds")
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=EventTimeTimers(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="EventTime",
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(
                    (r.user_id, r.kind, r.n) for r in df.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_evtime"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_once()
        assert {(u, n) for u, k, n in collected if k == "data"} >= {(1, 2), (2, 1)}
        assert not [t for t in collected if t[1] == "timer"]  # not yet expired
        # batch 2: one late-ish event; run 2 executes under the advanced
        # watermark (100 s) and fires BOTH keys' pending timers
        _write(str(src / "b2.xlsx"), [(1, 150.0)])
        run_once()
    finally:
        spark.conf.unset(provider_key)

    timers = {u: n for u, k, n in collected if k == "timer"}
    assert set(timers) == {1, 2}, collected
    assert all(wm == 100_000 for wm in timers.values()), timers
