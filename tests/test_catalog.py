"""Regression tests for catalog.table() — the testdata loader.

The driver has regenerated ``events.parquet`` with different physical types
for ``ts`` across rounds (TIMESTAMP(NANOS) int64 → TIMESTAMP(MICROS)).
``table()`` must normalise both to ``timestamp_ntz`` so every events-side
query keeps working when the testdata migrates again.
"""

from __future__ import annotations

import pytest

from pyspark_excel_datasource_spark.catalog import SMOKE_SF_DIR, TABLES, table


def test_events_ts_is_timestamp_ntz(spark):
    ev = table(spark, SMOKE_SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    # And the column is actually usable in arithmetic / window exprs.
    n = ev.selectExpr("date_trunc('hour', ts) AS h").where("h IS NOT NULL").count()
    assert n > 0


def test_events_ts_matches_duckdb_epoch(spark):
    """Values (not just the type) agree with DuckDB's view of the file."""
    duckdb = pytest.importorskip("duckdb")
    ev = table(spark, SMOKE_SF_DIR, "events")
    # Session tz is pinned UTC (session.py), so NTZ→TIMESTAMP is a no-op shift.
    got = ev.selectExpr(
        "min(unix_micros(CAST(ts AS TIMESTAMP))) AS lo",
        "max(unix_micros(CAST(ts AS TIMESTAMP))) AS hi",
    ).first()
    want = duckdb.sql(
        "SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi "
        f"FROM read_parquet('{SMOKE_SF_DIR}/events.parquet')"
    ).fetchone()
    assert (got.lo, got.hi) == want


def test_nanos_int64_ts_still_rebuilt(spark, tmp_path):
    """The legacy nanos-as-int64 path (older testdata generation) still works."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = 1_700_000_000_123_456
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([micros * 1000], pa.timestamp("ns")),
        }
    )
    d = tmp_path / "sfnano"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    ev = table(spark, str(d), "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert ev.selectExpr("unix_micros(CAST(ts AS TIMESTAMP)) AS us").first().us == micros


def test_all_tables_load(spark):
    for name in TABLES:
        df = table(spark, SMOKE_SF_DIR, name)
        assert len(df.columns) > 0
