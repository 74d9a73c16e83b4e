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
