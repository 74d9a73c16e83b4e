"""Iceberg-table queries: current-snapshot scan + snapshot time travel.

Fixture (3 snapshots over ``orders``, built by ``sources/iceberg.py``):
s1 append ``o_orderkey % 3 != 0`` · s2 append the remainder (table ==
orders) · s3 OVERWRITE with only ``o_orderstatus = 'F'`` rows. The
DuckDB oracles read the original parquet with the matching predicate,
so the hash checks prove exact snapshot resolution through the whole
metadata tree: version-hint → metadata JSON → manifest-list Avro →
manifest Avro → parquet (the Avro layers decoded by the repo's own
container codec).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import query
from .excel_queries import _fixture_dir
from .iceberg import read_iceberg, write_iceberg


def _materialize_orders_iceberg(spark: SparkSession, sf_dir: str) -> str:
    """orders.parquet → 3-snapshot Iceberg table, idempotent per SF."""
    import shutil

    out = os.path.join(_fixture_dir(sf_dir), "orders_iceberg")
    done = os.path.join(out, "metadata", "v3.metadata.json")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    orders = table(spark, sf_dir, "orders")
    third = F.col("o_orderkey") % 3 == 0
    write_iceberg(spark, orders.filter(~third), out)
    write_iceberg(spark, orders.filter(third), out, mode="append")
    write_iceberg(
        spark, orders.filter(F.col("o_orderstatus") == "F"), out, mode="overwrite"
    )
    return out


@query(
    "q_scan_iceberg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_scan_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-snapshot Iceberg scan after two appends and an OVERWRITE:
    the reader resolves s3's manifest list (which references ONLY the
    overwrite's manifest — prior manifests simply fall out of the
    snapshot, no tombstone replay), and the data path is one plain
    parquet scan over the resolved files. Structural contrast with the
    Delta log is documented in ``sources/iceberg.py``: snapshot tree vs
    change journal, same atomic single-file publish.
    """
    path = _materialize_orders_iceberg(spark, sf_dir)
    return (
        read_iceberg(spark, path)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
        )
    )


@query(
    "q_scan_iceberg_snapshot",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_scan_iceberg_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel to s2 (the full pre-overwrite table): the
    reader walks s2's manifest list — which still references s1's
    manifest alongside s2's own (manifests are immutable and SHARED
    between snapshots; an append writes one new manifest, never
    rewrites old ones) — so the census equals the complete base table
    even though the current snapshot (s3) retains only F-status rows.
    """
    path = _materialize_orders_iceberg(spark, sf_dir)
    return (
        read_iceberg(spark, path, snapshot_id=2)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
    )
