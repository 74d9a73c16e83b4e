"""Delta-log table queries: snapshot scan, time travel, sink roundtrip.

The fixture is a 3-version Delta table built from ``orders`` by the
pure-Python log writer in ``sources/deltalog.py``:

- v0 WRITE  (append):   orders with ``o_orderkey % 3 != 0``,
  partitioned by ``o_orderstatus``
- v1 WRITE  (append):   the ``% 3 == 0`` remainder → table == orders
- v2 DELETE (metadata): drop partition ``o_orderstatus = 'P'``
  (+ checkpoint parquet at v2, so the latest read exercises the
  checkpoint path and time travel exercises pure JSON replay)

The DuckDB oracles read the ORIGINAL parquet table with the matching
predicate, so the hash checks prove exact snapshot reconstruction at
each version — including that the delete removed precisely one
partition and that partition columns (stored only in the log, not in
the data files) are re-attached losslessly.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import query
from .deltalog import delete_partitions, read_delta, write_delta
from .excel_queries import _fixture_dir


def _materialize_orders_delta(spark: SparkSession, sf_dir: str) -> str:
    """orders.parquet → 3-version Delta table, idempotent per SF."""
    out = os.path.join(_fixture_dir(sf_dir), "orders_delta")
    done = os.path.join(out, "_delta_log", f"{2:020d}.json")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    orders = table(spark, sf_dir, "orders")
    third = F.col("o_orderkey") % 3 == 0
    write_delta(
        spark, orders.filter(~third), out, mode="append",
        partition_by=("o_orderstatus",),
    )
    write_delta(
        spark, orders.filter(third), out, mode="append",
        partition_by=("o_orderstatus",),
    )
    delete_partitions(out, {"o_orderstatus": "P"})
    return out


@query(
    "q_scan_delta",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q_scan_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot Delta scan after two appends and a partition
    DELETE: the reader reconstructs the live file set from the v2
    checkpoint, reads the surviving files through one ordinary parquet
    scan (full pushdown/pruning), and re-attaches the partition column
    from the log via a broadcast file-map join. The oracle's
    ``<> 'P'`` predicate pins that the metadata-only DELETE removed
    exactly the P partition and nothing else.
    """
    path = _materialize_orders_delta(spark, sf_dir)
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
        )
    )


@query(
    "q_scan_delta_timetravel",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE o_orderkey % 3 <> 0
    GROUP BY o_orderstatus
    """,
)
def q_scan_delta_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel to v0 (``versionAsOf=0``): replays only commit 0's
    JSON actions, so the two later commits — including the DELETE of
    the P partition — are invisible. The oracle reproduces v0's exact
    contents (the ``% 3 != 0`` slice across ALL statuses, P included),
    proving snapshot isolation: old versions stay byte-stable while
    the table head moves.
    """
    path = _materialize_orders_delta(spark, sf_dir)
    return (
        read_delta(spark, path, version=0)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
    )


@query(
    "q_sink_delta",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,0)))
                AS DECIMAL(38,0)) AS VARCHAR) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sink_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta sink roundtrip: aggregate → atomic partitioned OVERWRITE
    commit (parallel staged parquet write + one O_EXCL log publish;
    prior versions stay readable for time travel) → snapshot readback.
    The partition column travels through the log's ``partitionValues``
    (stripped from the data files on write, broadcast-joined back on
    read), so the hash check covers the writer's partition encode and
    the reader's attach in one path.
    """
    out = os.path.join(_fixture_dir(sf_dir), "pricing_summary_delta")
    src = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_qty"),
        )
    )
    write_delta(
        spark, src, out, mode="overwrite", partition_by=("l_returnflag",)
    )
    return read_delta(spark, out)
