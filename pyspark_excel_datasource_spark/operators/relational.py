"""Relational operator suite (SURVEY.md §2.3: scans, filters, joins,
aggregations, windows, sorts, set ops).

The reference connector delegates its entire relational surface to Spark
(SURVEY.md §2.2, reference ``README.md:112-133``); here each capability is a
named, DuckDB-oracled query over the TPC-H-ish testdata.

Scale design notes (local[32] is the test rig; the plan targets a
1000-executor cluster on ~100 TB):

- All scans are declarative parquet reads → Catalyst pushes filters and
  prunes columns (verified via ``tools/explain_audit.py``).
- Joins: dimension tables (region/nation/supplier at TPC-H shape) are
  broadcast explicitly; fact-fact joins shuffle on their keys and rely on
  AQE for skew splitting and runtime coalescing.
- Aggregations use Spark's partial (map-side) + final hash aggregation —
  nothing here materializes on the driver.
- Top-k compiles to ``TakeOrderedAndProject`` (no global sort of 100 TB).

Numeric determinism vs the oracle: see ``functions/determinism.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import spread, table
from ..functions.determinism import (
    bigsum,
    canon,
    davg,
    dround,
    dsum,
    spark_canon,
    sql_bigsum,
    sql_canon,
    sql_davg,
    sql_dround,
    sql_dsum,
)
from ..plans.registry import query


def ts(lit: str) -> Column:
    """NTZ timestamp literal (testdata timestamps are all NTZ)."""
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Flagship (TPC-H Q1 shape): scan → filter → groupBy → 8 aggs → sort
# ---------------------------------------------------------------------------


@query(
    "q_flagship_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_canon(sql_dsum('l_quantity', 0))} AS sum_qty,
           {sql_canon(sql_dsum('l_extendedprice', 2))} AS sum_base_price,
           {sql_canon(sql_dsum('l_extendedprice * (1 - l_discount)', 4))} AS sum_disc_price,
           {sql_canon(sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6))} AS sum_charge,
           {sql_davg('l_quantity', 0)} AS avg_qty,
           {sql_davg('l_extendedprice', 2)} AS avg_price,
           {sql_davg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_flagship_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-like pricing summary.

    Maps the reference's end-to-end pattern (scan → Spark relational ops,
    reference ``tests/test_excel_connector.py:36-58``) onto the full
    scan+filter+agg+sort pipeline. Filter pushes to the parquet scan; agg is
    partial+final hash aggregation on 2 low-cardinality keys (no skew risk
    at any scale); final sort is 4 rows. The exact decimal sums present as
    canonical strings (``determinism.canon``) for the driver hash gate.
    """
    li = table(spark, sf_dir, "lineitem")
    # spread() AFTER the pushed filter (r14 opt, guide §2.5 "input skew:
    # one unsplittable file"): the sf parquet fixtures are single-row-group
    # files, so the scan — and with it the 8-aggregate exact-decimal
    # partial aggregation — is ONE task no matter the core count. The
    # round-robin of the filtered rows costs one ~10 MB shuffle and lets
    # the decimal math run on every core (1.12s → 0.71s at sf0.1 local).
    # Predicate pushdown is unaffected (the filter sits below the
    # repartition), and at 100 TB the input is thousands of splits so
    # spread() no-ops.
    # One F.expr per aggregate, built from the SAME sql_* strings the
    # oracle above uses (spark_canon swaps DuckDB's bare VARCHAR for
    # STRING): identical expression trees to the former column-DSL
    # spelling at ~1/4 the plan-build cost (guide §7.3).
    return (
        spread(li.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"{spark_canon(sql_dsum('l_quantity', 0))} AS sum_qty"),
            F.expr(
                f"{spark_canon(sql_dsum('l_extendedprice', 2))} AS sum_base_price"
            ),
            F.expr(
                f"{spark_canon(sql_dsum('l_extendedprice * (1 - l_discount)', 4))}"
                " AS sum_disc_price"
            ),
            F.expr(
                f"{spark_canon(sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6))}"
                " AS sum_charge"
            ),
            F.expr(f"{sql_davg('l_quantity', 0)} AS avg_qty"),
            F.expr(f"{sql_davg('l_extendedprice', 2)} AS avg_price"),
            F.expr(f"{sql_davg('l_discount', 2)} AS avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scans / projection / filters
# ---------------------------------------------------------------------------


@query(
    "q_scan_parquet",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 150000.0
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with pushed filter + pruned columns.

    ``.explain`` shows ``PushedFilters: [GreaterThan(o_totalprice,150000.0)]``
    and a 3-column ``ReadSchema`` — at 100 TB this is the difference between
    reading 3 columns of row groups that pass min/max stats vs. the table.
    """
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_project",
    oracle="""
    SELECT c_custkey AS customer_id,
           UPPER(c_name) AS customer_name,
           c_acctbal AS balance,
           c_acctbal * 1.1 AS balance_with_bonus,
           c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS is_key_segment
    FROM customer
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed columns (reference exercises projection
    only via user-schema pruning, ``tests/test_excel_connector.py:83-91``).

    Row-wise double math (``* 1.1``) is IEEE-deterministic cross-engine; no
    rounding needed (see determinism.py).
    """
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("balance"),
        (F.col("c_acctbal") * 1.1).alias("balance_with_bonus"),
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE").alias("is_key_segment"),
    )


@query(
    "q_filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45.0 AND l_discount < 0.02
      AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive comparison predicates — all pushed to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 45.0)
        & (F.col("l_discount") < 0.02)
        & (F.col("l_shipdate") >= ts("2000-01-01 00:00:00"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "q_filter_complex",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_orderpriority LIKE '1-%')
      AND o_totalprice BETWEEN 50000.0 AND 200000.0
      AND NOT (o_orderpriority = '5-LOW')
      AND o_custkey IS NOT NULL
    """,
)
def q_filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, IN, BETWEEN, LIKE, IS [NOT] NULL."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("F", "P") | F.col("o_orderpriority").like("1-%"))
        & F.col("o_totalprice").between(50000.0, 200000.0)
        & ~(F.col("o_orderpriority") == "5-LOW")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000.0
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst/AQE pick broadcast vs sort-merge by size.

    At 100 TB orders⋈customer shuffles both sides on the key; AQE skew-join
    splits hot customers. We don't force a strategy here on purpose.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_suppliers,
           {sql_canon(sql_dsum('s.s_acctbal', 2))} AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of small dims — nation/region are KBs even at
    100 TB fact scale, so the fact side never shuffles for them."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_suppliers"),
            canon(dsum("s_acctbal", 2)).alias("total_acctbal"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
      ON c.c_custkey = o.o_custkey
    WHERE c.c_acctbal > 5000.0
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying order."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, c.c_custkey, c.c_name
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
    RIGHT JOIN (SELECT * FROM customer WHERE c_nationkey < 5) c
      ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving unmatched customers."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_orderstatus", "c_custkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT c.c_custkey AS cust_side_key, c.c_name,
           o.o_custkey AS order_side_key, o.n_orders
    FROM (SELECT * FROM customer WHERE c_acctbal < 0.0) c
    FULL JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders WHERE o_totalprice > 300000.0 GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0.0)
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.col("c_custkey").alias("cust_side_key"),
        "c_name",
        F.col("o_custkey").alias("order_side_key"),
        "n_orders",
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no large order.

    (Every customer in the testdata has *some* order, so the unfiltered
    anti join would be a trivially-empty — and untestable — result.)
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_nationkey AS nationkey,
           COUNT(*) AS n_pairs,
           CAST(CAST(MAX(c.c_acctbal - s.s_acctbal) AS DECIMAL(38,2)) AS VARCHAR)
               AS max_gap
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
    GROUP BY s.s_nationkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded theta join: equi component on nationkey carries the shuffle,
    the inequality is evaluated post-match — this keeps a non-equi join
    partitionable at scale (never a pure cartesian)."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_pairs"),
            canon(
                F.max(F.col("c_acctbal") - F.col("s_acctbal")).cast("decimal(38,2)")
            ).alias("max_gap"),
        )
    )


@query(
    "q_join_star3",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_canon(sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4))} AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    """,
)
def q_join_star3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star join (TPC-H Q3 shape): filtered dims join the fact.

    customer is broadcast after its segment filter; orders⋈lineitem is the
    real shuffle and both sides arrive pre-filtered — the plan Catalyst
    should pick at 100 TB too (AQE demotes to broadcast when small enough).
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts("1998-01-01 00:00:00")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ts("1998-01-01 00:00:00")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            canon(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest prior 'click' per user for every 'purchase'.

    Spark has no native as-of join; the scalable composition is the
    union-and-window trick — tag both streams, union, and take the running
    ``last(click_ts)`` per user ordered by time. One shuffle on user_id,
    no per-row subquery, no cartesian: survives 100 TB (the per-user
    partition is the only ordering unit). Reference has no analog (its
    streaming is file discovery only, connector.py:206-277).
    """
    from .asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(purchases, clicks, on="ts", by="user_id", strict=True).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_right").alias("last_click_ts"),
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q_agg_group",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_canon(sql_dsum('o_totalprice', 2))} AS sum_price,
           {sql_davg('o_totalprice', 2)} AS avg_price,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash group-by with count/sum/avg/min/max (partial+final agg)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            canon(dsum("o_totalprice", 2)).alias("sum_price"),
            davg("o_totalprice", 2).alias("avg_price"),
            F.to_date(F.min("o_orderdate")).alias("first_order"),
            F.to_date(F.max("o_orderdate")).alias("last_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           CAST(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,0)))
                     AS DECIMAL(38,0)) AS VARCHAR) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) / SUM(DISTINCT) — Catalyst's Expand-based rewrite
    handles multiple distinct aggregates in one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        canon(
            F.sum_distinct(F.col("l_quantity").cast("decimal(18,0)")).cast(
                "decimal(38,0)"
            )
        ).alias("sum_distinct_qty"),
    )


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_canon(sql_dround('STDDEV_SAMP(c_acctbal)', 6))} AS std_bal,
           {sql_canon(sql_dround('VAR_SAMP(c_acctbal)', 4))} AS var_bal,
           {sql_canon(sql_dround('CORR(c_acctbal, CAST(c_nationkey AS DOUBLE))', 6))} AS corr_bal_nation,
           {sql_canon(sql_dround('COVAR_SAMP(c_acctbal, CAST(c_nationkey AS DOUBLE))', 4))} AS covar_bal_nation
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar)."""
    c = table(spark, sf_dir, "customer")
    nk = F.col("c_nationkey").cast("double")
    return c.groupBy("c_mktsegment").agg(
        canon(dround(F.stddev_samp("c_acctbal"), 6)).alias("std_bal"),
        canon(dround(F.var_samp("c_acctbal"), 4)).alias("var_bal"),
        canon(dround(F.corr(F.col("c_acctbal"), nk), 6)).alias("corr_bal_nation"),
        canon(dround(F.covar_samp(F.col("c_acctbal"), nk), 4)).alias("covar_bal_nation"),
    )


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n_rows,
           {sql_canon(sql_dsum('l_extendedprice', 2))} AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers to disambiguate subtotal rows."""
    li = table(spark, sf_dir, "lineitem")
    # Project to the 3 consumed columns, then spread() (r14 opt, guide
    # §2.3/§2.5): ROLLUP's Expand triples the scan output BEFORE the
    # partial aggregation, and the single-row-group fixture pins all of
    # that to one task. Repartitioning the 3-column projection
    # parallelizes Expand + the exact-decimal partial agg (1.01s → 0.82s
    # at sf0.1); no-op at scale where the scan has real splits.
    li = spread(li.select("l_returnflag", "l_linestatus", "l_extendedprice"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("n_rows"),
        canon(dsum("l_extendedprice", 2)).alias("sum_price"),
    )


@query(
    "q_agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n_orders,
           {sql_canon(sql_dsum('o_totalprice', 2))} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("n_orders"),
        canon(dsum("o_totalprice", 2)).alias("sum_price"),
    )


@query(
    "q_agg_gsets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           {sql_bigsum('CAST(l_quantity AS BIGINT)')} AS total_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL form — same Expand operator underneath)."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS cd_within_bounds, TRUE AS median_within_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) + approx percentile — the
    100 TB substitutes for exact distinct counts / exact medians.

    Estimates are implementation-specific, so the query verifies the
    approximation contracts in-plan and hash-checks the verdicts (same
    convention as ``q_agg_hll`` / ``q_agg_approx_quantile``): the HLL++
    estimate must land within ±3·rsd of the exact distinct count
    (hash-verified against DuckDB), and the GK median's rank must sit in
    the ±N/accuracy band. Both exact sides cost one extra aggregation at
    gate scale; the sketches remain the scale story.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )
    est = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("median_est"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    ranks = (
        li.join(F.broadcast(est.select("l_returnflag", "median_est")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("l_extendedprice").alias("n"),
            F.sum((F.col("l_extendedprice") <= F.col("median_est")).cast("long")).alias("le"),
            F.sum((F.col("l_extendedprice") < F.col("median_est")).cast("long")).alias("lt"),
        )
    )
    eps = 1.0 / 1000
    return (
        est.join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders").cast("double") - F.col("exact_orders"))
                <= F.lit(3 * 0.02) * F.col("exact_orders")
            ).alias("cd_within_bounds"),
            (
                (F.col("le") >= F.floor((F.lit(0.5) - F.lit(eps)) * F.col("n")) - 1)
                & (F.col("lt") <= F.ceil((F.lit(0.5) + F.lit(eps)) * F.col("n")) + 1)
            ).alias("median_within_bounds"),
        )
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = hash groupBy on all projected columns (shuffles once
    on the full key; map-side partial dedup keeps the shuffle small)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT user_id, event_id, ts, value
    FROM (
        SELECT user_id, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup: unlike ``dropDuplicates`` (arbitrary
    survivor), an explicit row_number + tiebreak is reproducible — the only
    defensible dedup semantics for a data pipeline."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


@query(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_canon(sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 0))}
               AS qty_O,
           {sql_canon(sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 0))}
               AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for pivot
    values at 100 TB — always pass them)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity", 0))
        .select(
            "l_returnflag",
            canon(F.col("O")).alias("qty_O"),
            canon(F.col("F")).alias("qty_F"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val
    FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via the native unpivot operator (Expand — no
    shuffle, no UDF)."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot("p_partkey", ["retailprice", "size"], "attr", "val")


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a deterministic total order (tiebreak on key)."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        # DuckDB emits BIGINT for the rank family; cast for schema parity.
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_win_analytic",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS final_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last analytics per user ordered by time."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(wfull).alias("final_value"),
    )


@query(
    "q_win_nth",
    oracle="""
    SELECT user_id,
           NTH_VALUE(event_type, 2) OVER w AS second_event,
           NTH_VALUE(event_type, 3) OVER w AS third_event,
           COUNT(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) = 1
    """,
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE over a full-partition frame — the second/third event of
    every user's timeline in one pass (the onboarding-path question
    "what do users do right after signup?"), reduced to one row per user
    by a rank-1 filter riding the SAME partition sort: one exchange, two
    Window ops, no self-join. Completes the analytic-window family
    (``q_win_analytic`` covers lag/lead/first/last). NULL where the user
    has fewer events — the frame is full-partition so nth_value is
    order-complete, not frame-clipped."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            F.nth_value("event_type", 2).over(wfull).alias("second_event"),
            F.nth_value("event_type", 3).over(wfull).alias("third_event"),
            F.count("*").over(W.partitionBy("user_id")).alias("n_events"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@query(
    "q_win_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,0)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey,
                      l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) AS DECIMAL(38,0)) AS VARCHAR) AS running_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey,
                      l_linenumber ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,2)) AS VARCHAR) AS moving_price
    FROM lineitem
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows: running total + moving sum. Decimal inputs make
    the windowed sums exact (order-independent) cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]
    wrun = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    wmov = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-3, 0)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        canon(
            F.sum(F.col("l_quantity").cast("decimal(18,0)"))
            .over(wrun)
            .cast("decimal(38,0)")
        ).alias("running_qty"),
        canon(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .over(wmov)
            .cast("decimal(38,2)")
        ).alias("moving_price"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "q_sort_multi",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + local sort)."""
    return (
        table(spark, sf_dir, "supplier")
        .orderBy(
            F.col("s_nationkey").asc_nulls_first(),
            F.col("s_acctbal").desc_nulls_last(),
            F.col("s_suppkey").asc(),
        )
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject: each task keeps a k-heap, the
    driver merges k×tasks rows — never a full sort of the table."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_topk_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ) WHERE rn <= 3
    """,
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: window row_number + filter (one shuffle on the
    group key; Spark's WindowGroupLimit pushes the k-limit into the sort)."""
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS side
    FROM customer WHERE c_acctbal > 9000.0
    UNION ALL
    SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, 'supplier' AS side
    FROM supplier WHERE s_acctbal > 9000.0
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no shuffle — pure concatenation of partitions)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("customer").alias("side"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000.0)
        .select(
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("side"),
        )
    )
    return c.unionByName(s)


@query(
    "q_union_dist",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + hash dedup."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0.0
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    a = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — set difference."""
    a = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    b = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.subtract(b)


@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts
              AND c.ts >= p.ts - INTERVAL 1 HOUR) AS click_within_1h,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts
              AND c.ts >= p.ts - INTERVAL 1 HOUR) IS NOT NULL AS attributed
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a match tolerance (pandas ``merge_asof(...,
    tolerance=...)`` semantics): each purchase gets its latest prior
    click only if that click happened within the last hour, else NULL —
    the attribution-window variant every ads/conversion pipeline runs.

    Composition insight: tolerance needs NO second plan — the backward
    as-of already carries the MAXIMAL prior click, so a click outside the
    window proves no click inside it; one ``when()`` over the carried
    timestamp applies the tolerance. Cost stays ONE shuffle on user_id
    (the union-and-window as-of, ``operators/asof.py``), unchanged at
    100 TB. Reference has no analog (streaming is file discovery only,
    connector.py:206-277).
    """
    from .asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by="user_id", strict=True)
    within = F.col("ts_right") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    hit = F.when(within, F.col("ts_right"))
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        hit.alias("click_within_1h"),
        hit.isNotNull().alias("attributed"),
    )


@query(
    "q_join_asof_backward_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts
              AND c.ts >= p.ts - INTERVAL 1 HOUR) AS click_within_1h,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts
              AND c.ts >= p.ts - INTERVAL 1 HOUR) IS NOT NULL AS attributed
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def q_join_asof_backward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with tolerance as a NATIVE bounded-range JOIN (SQL
    text, ``timestampdiff``) — the twin of ``q_join_asof_tolerance``
    that pins the other scalable spelling (VERDICT r10 #8).

    Same semantics, different physical strategy: instead of the
    union-and-window running-``last`` (one shuffle of the union, one
    per-user sort), this joins clicks to purchases on the user_id
    EQUI-key with the 1-hour window as a range condition, then takes
    ``MAX(click_ts)`` per purchase. Catalyst extracts user_id as the
    SortMergeJoin key (plan-asserted in tests: SMJ, never a broadcast
    nested loop or cartesian), the bounded window keeps per-purchase
    fan-out finite (≤ clicks-per-user-hour), and the follow-up MAX
    collapses it map-side before the tiny final agg exchange. At 100 TB
    pick per shape: heavy per-user histories favor the window form (no
    fan-out at all); sparse histories with tight tolerances favor this
    join (no full-history sort). Both are here, oracle-identical, so
    the planner choice is a measured swap, not a rewrite.
    """
    table(spark, sf_dir, "events").createOrReplaceTempView("asof_bt_events")
    return spark.sql(
        """
        WITH p AS (SELECT event_id, user_id, ts FROM asof_bt_events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts FROM asof_bt_events
                   WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
               MAX(c.ts) AS click_within_1h,
               MAX(c.ts) IS NOT NULL AS attributed
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts < p.ts
         AND timestampdiff(SECOND, c.ts, p.ts) <= 3600
        GROUP BY p.event_id, p.user_id, p.ts
        """
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH base AS (
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT MAX(c.ts) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts < p.ts) AS back,
               (SELECT MIN(c.ts) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts > p.ts) AS fwd
        FROM events p WHERE p.event_type = 'purchase'
    )
    SELECT event_id, user_id, ts AS purchase_ts,
           CASE WHEN back IS NULL AND fwd IS NULL THEN NULL
                WHEN fwd IS NULL THEN back
                WHEN back IS NULL THEN fwd
                WHEN epoch_us(ts) - epoch_us(back)
                     <= epoch_us(fwd) - epoch_us(ts) THEN back
                ELSE fwd END AS nearest_click,
           CASE WHEN back IS NULL AND fwd IS NULL THEN 'none'
                WHEN fwd IS NULL THEN 'prior'
                WHEN back IS NULL THEN 'later'
                WHEN epoch_us(ts) - epoch_us(back)
                     <= epoch_us(fwd) - epoch_us(ts) THEN 'prior'
                ELSE 'later' END AS side,
           CAST(CASE WHEN back IS NULL AND fwd IS NULL THEN -1
                WHEN fwd IS NULL THEN (epoch_us(ts) - epoch_us(back)) // 1000000
                WHEN back IS NULL THEN (epoch_us(fwd) - epoch_us(ts)) // 1000000
                WHEN epoch_us(ts) - epoch_us(back)
                     <= epoch_us(fwd) - epoch_us(ts)
                     THEN (epoch_us(ts) - epoch_us(back)) // 1000000
                ELSE (epoch_us(fwd) - epoch_us(ts)) // 1000000 END AS BIGINT)
               AS gap_s
    FROM base
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction="nearest")``):
    each purchase gets its closest click in EITHER time direction,
    strict on both sides (a simultaneous click is neither prior nor
    later), ties preferring the prior click — the sensor-fusion /
    attribution variant when causality is not assumed.

    Scale shape — ONE shuffle, not two as-of passes: union purchases
    and clicks, hash-partition by user once, then two window passes
    over the SAME partitioning (Catalyst reuses the exchange; the
    second pass costs only a re-sort). Strictness at equal timestamps
    falls out of the sort orders alone: the backward pass sorts clicks
    AFTER same-ts purchases (so the preceding frame can't see them),
    the forward pass sorts them BEFORE (so the following frame can't) —
    no value comparisons against the current row needed. Per-key window
    state is one carried timestamp in each direction. All gap math is
    integer microseconds.
    """
    return asof_nearest(table(spark, sf_dir, "events"))


def asof_nearest(ev: DataFrame) -> DataFrame:
    """Nearest-as-of plan over an events frame (shared with
    ``tools/scale_stress.py``)."""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_click"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id", "ts",
        F.lit(1).alias("is_click"),
        F.col("ts").alias("click_ts"),
    )
    u = purchases.unionByName(clicks)
    w_back = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(1, W.unboundedFollowing)
    )
    carried = u.select(
        "event_id", "user_id", "ts", "is_click",
        F.max("click_ts").over(w_back).alias("back"),
        F.min("click_ts").over(w_fwd).alias("fwd"),
    ).filter(F.col("is_click") == 0)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    us_b = F.unix_micros(F.col("back").cast("timestamp"))
    us_f = F.unix_micros(F.col("fwd").cast("timestamp"))
    gap_b = us - us_b
    gap_f = us_f - us
    prior_wins = F.col("back").isNotNull() & (
        F.col("fwd").isNull() | (gap_b <= gap_f)
    )
    nearest = (
        F.when(F.col("back").isNull() & F.col("fwd").isNull(), F.lit(None))
        .when(prior_wins, F.col("back"))
        .otherwise(F.col("fwd"))
    )
    side = (
        F.when(F.col("back").isNull() & F.col("fwd").isNull(), "none")
        .when(prior_wins, "prior")
        .otherwise("later")
    )
    # gap in whole seconds of the SELECTED side (-1 = no click at all)
    gap_sel = (
        F.when(F.col("back").isNull() & F.col("fwd").isNull(), F.lit(-1).cast("long"))
        .when(prior_wins, (gap_b / 1_000_000).cast("long"))
        .otherwise((gap_f / 1_000_000).cast("long"))
    )
    return carried.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        nearest.alias("nearest_click"),
        side.alias("side"),
        gap_sel.alias("gap_s"),
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_custkey % 100 END AS k
        FROM orders
    ),
    r AS (
        SELECT CASE WHEN g % 10 = 0 THEN NULL ELSE g END AS k,
               'grp_' || CAST(g AS VARCHAR) AS tag
        FROM (SELECT UNNEST(RANGE(0, 100)) AS g)
    )
    SELECT l.o_orderkey, r.tag
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the semantics
    a late-arriving-dimension pipeline wants when "unknown" is itself a
    joinable bucket (every NULL-keyed fact lands on the NULL dimension
    row, not on the floor).

    Catalyst plans ``eqNullSafe`` as a hash join on a null-safe key
    wrapper — still a broadcast here (100-row dim), still a plain
    shuffle-hash join at scale; NO fallback to nested-loop. The NULL
    bucket is a deliberate skew point at 100 TB (every null fact hits
    one key): the standard mitigation is pre-splitting the NULL slice,
    which `q_join_skew_salted` demonstrates; here the dim side is
    broadcast so the skew never shuffles at all. Keys are synthesized
    deterministically from order/custkey arithmetic in both engines.
    """
    o = table(spark, sf_dir, "orders")
    l = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey") % 100)
        .alias("k"),
    )
    r = spark.range(0, 100).select(
        F.when(F.col("id") % 10 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id"))
        .alias("k"),
        F.concat(F.lit("grp_"), F.col("id").cast("string")).alias("tag"),
    )
    return l.join(F.broadcast(r), l.k.eqNullSafe(r.k)).select(
        "o_orderkey", "tag"
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(NTILE(4) OVER (PARTITION BY l_suppkey
                               ORDER BY l_extendedprice, l_orderkey,
                                        l_linenumber) AS INT)
               AS price_quartile
    FROM lineitem
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: each supplier's line items split into price
    quartiles — the within-partition equi-count binning the window
    family was missing (``q_quantile_bins`` is its global, scan-level
    sibling). Deterministic under ties via the full (price, orderkey,
    linenumber) ordering; one shuffle on the supplier key, same cost
    envelope as every other window op here.
    """
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
    )


#: fixed priority domain for the transpose demo (column set must be
#: deterministic for the schema check)
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@query(
    "q_transpose",
    oracle=f"""
    SELECT 'n_orders' AS key,
           {", ".join(
               'CAST(SUM(CASE WHEN o_orderpriority = ' + repr(p)
               + ' THEN 1 ELSE 0 END) AS BIGINT) AS "' + p + '"'
               for p in ("1-URGENT", "2-HIGH", "3-MEDIUM",
                          "4-NOT SPECIFIED", "5-LOW"))}
    FROM orders
    UNION ALL
    SELECT 'n_high_value',
           {", ".join(
               'CAST(SUM(CASE WHEN o_orderpriority = ' + repr(p)
               + ' AND o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT)'
               for p in ("1-URGENT", "2-HIGH", "3-MEDIUM",
                          "4-NOT SPECIFIED", "5-LOW"))}
    FROM orders
    """,
)
def q_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix transpose of a small aggregate (Spark 4's new
    ``DataFrame.transpose``): per-priority metrics flip to metric rows ×
    priority columns — the report orientation BI consumers ask for,
    and the pivot family's missing fourth member (pivot/unpivot/
    transpose).

    ``transpose`` collects the frame to the driver by necessity (its
    output SCHEMA depends on the data), so the input here is the
    |priorities|-row aggregate — the same bounded-collect rule as every
    driver-side builder in this repo; never transpose a fact table. The
    metric columns are summed conditionally in one pass before the
    flip, and the priority domain is fixed so the output schema is
    deterministic.
    """
    o = table(spark, sf_dir, "orders")
    agg = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.when(F.col("o_totalprice") > 150000.0, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_high_value"),
        )
        .orderBy("o_orderpriority")
    )
    t = agg.transpose()
    # schema determinism: select the fixed priority domain in order
    return t.select(
        F.col("key"),
        *[F.col(f"`{p}`").cast("long").alias(p) for p in _PRIORITIES],
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT o_orderpriority,
           STRING_AGG(o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n_statuses
    FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP,
    new in Spark 4): each priority's distinct order statuses as one
    deterministic CSV — the report-cell concatenation every BI export
    needs, with the WITHIN GROUP ordering making it hash-stable (an
    unordered listagg would be shuffle-order-dependent and could never
    oracle-match).

    The DISTINCT pre-aggregation bounds the aggregated strings (states
    per group ≤ |status domain|), so the concatenation state is O(1)
    per group at any scale — the same bounded-state rule as the
    inverted-index postings.
    """
    o = table(spark, sf_dir, "orders")
    pairs = o.select("o_orderpriority", "o_orderstatus").distinct()
    return pairs.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(o_orderstatus, ',')"
            " WITHIN GROUP (ORDER BY o_orderstatus)"
        ).alias("statuses"),
        F.count("*").cast("long").alias("n_statuses"),
    )


@query(
    "q_sql_pipe",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_canon(sql_dsum('l_quantity', 0))} AS sum_qty,
           {sql_canon(sql_dsum('l_extendedprice', 2))} AS sum_price,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pricing aggregate expressed in Spark 4's SQL PIPE
    syntax (`FROM … |> WHERE … |> AGGREGATE … GROUP BY …`) with a
    PARAMETERIZED cutoff (named ``:cutoff`` argument — no string
    interpolation, the injection-safe way to template production SQL).
    Same Catalyst plan as the DataFrame flagship — pipe syntax is pure
    surface — so every pushdown/partial-agg property carries over; the
    point demonstrated is that the engine's newest SQL dialect runs the
    engine's oldest benchmark shape unchanged.
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate <= :cutoff
        |> AGGREGATE
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS STRING) AS sum_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS STRING) AS sum_price,
             COUNT(*) AS n_items
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, sum_price, n_items
        """,
        args={"cutoff": "1998-09-02 00:00:00"},
    )


@query(
    "q_sql_scripting",
    oracle="""
    WITH ks AS (SELECT 100 * (1 << k) AS thr FROM RANGE(0, 32) t(k)),
    stop AS (
        SELECT MIN(thr) AS thr FROM ks
        WHERE (SELECT COUNT(*) FROM orders WHERE o_totalprice > ks.thr) < 100
    )
    SELECT o_orderpriority,
           (SELECT thr FROM stop) AS threshold,
           CAST(COUNT(*) FILTER (o_totalprice > (SELECT thr FROM stop))
                AS BIGINT) AS n_above,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN…END, DECLARE, WHILE): a
    driver-orchestrated doubling search for the smallest power-of-two
    price threshold with fewer than 100 orders above it, then a
    per-priority census at that threshold. Control flow is driver-side
    BY DESIGN (that is what SQL scripting is); every statement the loop
    issues is still a full distributed query, and the loop runs
    O(log(max_price)) iterations regardless of row count — so the shape
    scales like any other iterative index build. Thresholds stay BIGINT
    so the doubling sequence is bit-exact across engines; the oracle
    unrolls the loop as a MIN over the same power-of-two series
    (monotonicity of the count makes the two equivalent).
    """
    # scope the scripting flag to this query (restore-in-finally, same
    # discipline as the stateStore provider override in streaming/tws.py);
    # the script executes eagerly inside spark.sql, so restoring before
    # returning the final statement's DataFrame is safe
    key = "spark.sql.scripting.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_script")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE thr BIGINT DEFAULT 100;
              WHILE (SELECT COUNT(*) FROM orders_script WHERE o_totalprice > thr) >= 100 DO
                SET thr = thr * 2;
              END WHILE;
              SELECT o_orderpriority,
                     thr AS threshold,
                     CAST(COUNT_IF(o_totalprice > thr) AS BIGINT) AS n_above,
                     CAST(COUNT(*) AS BIGINT) AS n_orders
              FROM orders_script
              GROUP BY o_orderpriority;
            END
            """
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@query(
    "q_execute_immediate",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY o_orderstatus
    """,
)
def q_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``EXECUTE IMMEDIATE``: the statement text lives in a SQL
    variable and binds a named parameter via ``USING`` — the
    injection-safe dynamic-SQL surface (template catalogs, BI tools)
    next to ``q_sql_pipe``'s parameterized-literal form. The executed
    statement compiles to the identical Catalyst plan as writing the
    query directly, so pushdown and partial aggregation carry over
    unchanged.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_exec")
    spark.sql(
        """
        DECLARE OR REPLACE VARIABLE stmt STRING DEFAULT
          'SELECT o_orderstatus,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(38,2)) AS STRING) AS revenue
           FROM orders_exec
           WHERE o_orderdate >= :cutoff
           GROUP BY o_orderstatus'
        """
    )
    return spark.sql(
        "EXECUTE IMMEDIATE stmt USING TIMESTAMP '1995-01-01 00:00:00' AS cutoff"
    )


@query(
    "q_sql_udf",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN cents > 10000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_large
    FROM per_order
    GROUP BY o_orderpriority
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL user-defined functions (Spark 4 ``CREATE FUNCTION ... RETURN``):
    a scalar SQL UDF (exact-cents conversion) and a predicate SQL UDF
    (large-order flag) declared in pure SQL and used inside an aggregate.
    SQL UDFs are INLINED by the analyzer — the plan is identical to
    writing the expressions directly (no per-row function-call overhead,
    full codegen, pushdown unaffected), which is exactly why they are
    the right spelling for shared business logic at 100 TB: reuse
    without leaving the JVM. The oracle writes the same logic inline.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqludf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION exact_cents(x DOUBLE)
        RETURNS BIGINT RETURN CAST(ROUND(x * 100) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION is_large(cents BIGINT)
        RETURNS BOOLEAN RETURN cents > 10000000
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(exact_cents(o_totalprice)) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN is_large(exact_cents(o_totalprice))
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_large
        FROM orders_sqludf
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_sql_qualify",
    oracle="""
    SELECT o_orderstatus,
           o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(ROW_NUMBER() OVER (
                    PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) <= 3
    ORDER BY o_orderstatus, rnk
    """,
)
def q_sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-clause semantics (filter on a window result without a
    derived table) — top-3 orders per status by price with a
    deterministic tiebreak. Spark has no QUALIFY keyword, so the
    engine spelling is the window + post-filter Catalyst normalizes a
    QUALIFY to anyway; the DuckDB oracle uses the literal QUALIFY
    clause, pinning that the two spellings are the same relation. The
    plan is the partitioned-window top-k shape: Spark inserts a
    WindowGroupLimit before the full window, so each partition ships
    only candidate rows — no global sort, no unbounded frame.
    """
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("price_cents"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("o_orderstatus", "rnk")
    )
