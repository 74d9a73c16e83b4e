"""Composite multi-join analytical queries (TPC-H Q5/Q10 shapes).

These are the join-ordering / CBO stress cases: 5-6 table joins mixing a
big fact chain (lineitem⋈orders) with small dimensions. The DataFrame
code declares the joins in natural order and leaves strategy to
Catalyst+AQE — dims collapse to broadcasts, fact-fact stays a shuffle
join; at 100 TB the same plan holds with AQE picking sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.determinism import canon, dsum, sql_canon, sql_dsum
from ..plans.registry import query
from .relational import ts


@query(
    "q_tpch_q5ish",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           {sql_canon(sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4))} AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 6-table join, region
    filter, revenue per nation. The s_nationkey = c_nationkey condition
    makes the supplier join partially non-equi-keyed — Catalyst carries it
    as a post-join predicate on the broadcast side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1999-01-01 00:00:00"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .select("nation_name", canon("revenue").alias("revenue"), "n_items")
    )


@query(
    "q_tpch_q10ish",
    oracle=f"""
    SELECT c_custkey, c_name, nation_name,
           CAST(revenue AS VARCHAR) AS revenue
    FROM (
        SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    )
    """,
)
def q_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue. Decimal revenue is exact, so the ORDER BY ... LIMIT is
    deterministic with the custkey tiebreak."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "nation_name",
            canon("revenue").alias("revenue"),
        )
    )


@query(
    "q_tpch_q3ish",
    oracle=f"""
    SELECT l_orderkey, orderdate, o_orderpriority,
           CAST(revenue AS VARCHAR) AS revenue
    FROM (
        SELECT l.l_orderkey,
               CAST(o.o_orderdate AS VARCHAR) AS orderdate,
               o.o_orderpriority,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate <  TIMESTAMP '1997-03-15 00:00:00'
          AND l.l_shipdate  >= TIMESTAMP '1997-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    )
    """,
)
def q_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped-as-of-date orders for
    one market segment, top-10 by revenue.

    Shape notes (reference has no composite queries; this extends the
    SURVEY §2.3 flagship family): the segment filter reduces customer to
    ~1/5 before its join — at 100 TB customer is still the small side of
    the orders join and AQE picks broadcast or shuffle-hash from runtime
    sizes; both date filters push to the parquet scans; the exact-decimal
    revenue makes the ORDER BY ... LIMIT deterministic with the orderkey
    tiebreak (TakeOrderedAndProject — no global sort materialized).
    """
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts("1997-03-15 00:00:00")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= ts("1997-03-15 00:00:00")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "orderdate",
            "o_orderpriority",
            canon("revenue").alias("revenue"),
        )
    )
