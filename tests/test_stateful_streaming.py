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
