"""Local replica of the driver's DuckDB-oracle correctness gate.

For each registered query we run the Spark DataFrame and the oracle SQL on
the same parquet tables and compare:

- row count,
- schema (arrow-level, column names sorted),
- order-insensitive canonicalized values.

Used by ``tests/test_oracle_parity.py`` and ``tools/run_parity.py`` so a
mismatch is caught here before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal
from typing import Any

import duckdb

from .catalog import TABLES

_ORACLE_VIEW_TABLES = TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in _ORACLE_VIEW_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v).hex()  # exact bit comparison
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows_sorted(columns: list[str], pylist: list[dict[str, Any]]) -> list[tuple]:
    rows = [tuple(_canon(rec.get(c)) for c in columns) for rec in pylist]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> dict[str, Any]:
    """Run Spark DF vs DuckDB oracle; return a structured mismatch report."""
    spark_tbl = spark_df.toArrow()
    con = duckdb_connection(sf_dir)
    try:
        duck_tbl = con.execute(oracle_sql).arrow()
    finally:
        con.close()

    report: dict[str, Any] = {"ok": True, "problems": []}
    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck_tbl.column_names)
    report["spark_rows"] = spark_tbl.num_rows
    report["duck_rows"] = duck_tbl.num_rows
    report["spark_schema"] = {
        n: str(spark_tbl.schema.field(n).type) for n in s_cols
    }
    report["duck_schema"] = {n: str(duck_tbl.schema.field(n).type) for n in d_cols}

    if s_cols != d_cols:
        report["ok"] = False
        report["problems"].append(f"column names differ: {s_cols} vs {d_cols}")
        return report
    if spark_tbl.num_rows != duck_tbl.num_rows:
        report["ok"] = False
        report["problems"].append(
            f"row count differs: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}"
        )
    if report["spark_schema"] != report["duck_schema"]:
        # Schema drift is a warning-level problem: the driver may compare
        # types; we aim for exact agreement and fix any drift we see here.
        report["problems"].append(
            f"schema differs: {report['spark_schema']} vs {report['duck_schema']}"
        )

    s_rows = _rows_sorted(s_cols, spark_tbl.to_pylist())
    d_rows = _rows_sorted(d_cols, duck_tbl.to_pylist())
    if s_rows != d_rows:
        report["ok"] = False
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_rows, d_rows))
            if a != b
        ][:5]
        report["problems"].append(f"values differ; first diffs: {diffs}")
    return report
