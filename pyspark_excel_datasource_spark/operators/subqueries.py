"""Subquery and CTE surface (Catalyst decorrelation coverage).

These shapes matter because Catalyst rewrites them into joins — scalar
subqueries become broadcast-able aggregates, IN/EXISTS become semi-joins —
and at 100 TB the rewrite (not the surface syntax) is what executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..functions.determinism import sql_davg, sql_dsum
from ..plans.registry import query


@query(
    "q_subquery_scalar",
    oracle=f"""
    SELECT c_custkey, c_acctbal,
           c_acctbal - (SELECT {sql_davg('c_acctbal', 2)} FROM customer)
               AS bal_vs_avg
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal', 2)} FROM customer)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast into the
    filter/projection)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               c_acctbal - (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                        AS DOUBLE) / COUNT(c_acctbal)
                            FROM customer) AS bal_vs_avg
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                       AS DOUBLE) / COUNT(c_acctbal)
                           FROM customer)
        """
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
        FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join on the correlation key (one shuffle, no per-row
    subplan execution). The average uses the exact-decimal-sum/count
    construction (determinism.py) so the comparison is bit-stable
    cross-engine.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                            AS DOUBLE) / COUNT(*)
            FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join rewrite."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
        )
        """
    )


@query(
    "q_cte",
    oracle=f"""
    WITH big_orders AS (
        SELECT o_custkey, COUNT(*) AS n_big,
               {sql_dsum('o_totalprice', 2)} AS total_big
        FROM orders WHERE o_totalprice > 200000.0
        GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           CAST(SUM(b.n_big) AS BIGINT) AS segment_big_orders,
           CAST(CAST(SUM(b.total_big) AS DECIMAL(38,2)) AS VARCHAR)
               AS segment_big_value
    FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE reuse feeding a join + re-aggregation. The exact decimal total
    presents as a canonical string (determinism.canon rationale)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, COUNT(*) AS n_big,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(38,2)) AS total_big
            FROM orders WHERE o_totalprice > 200000.0
            GROUP BY o_custkey
        )
        SELECT c.c_mktsegment,
               CAST(SUM(b.n_big) AS BIGINT) AS segment_big_orders,
               CAST(CAST(SUM(b.total_big) AS DECIMAL(38,2)) AS STRING)
                   AS segment_big_value
        FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )
