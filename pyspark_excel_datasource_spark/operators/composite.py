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
from ..functions.determinism import (
    canon,
    davg,
    dround,
    dsum,
    sql_canon,
    sql_davg,
    sql_dround,
    sql_dsum,
)
from ..plans.registry import query
from .relational import ts


@query(
    "q_tpch_q7ish",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           {sql_canon(sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4))} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations by ship year. The nation table joins TWICE (supplier side and
    customer side) — a self-referencing dimension that Catalyst resolves
    as two independent broadcasts; the disjunctive nation-pair predicate
    runs after both joins, exactly like the reference SQL.

    Scale notes: both nation broadcasts are 25 rows regardless of SF; the
    shipdate range filter pushes to the lineitem parquet scan; the only
    shuffles are lineitem⋈orders and ⋈customer on their natural keys plus
    the final partial→final aggregate on a 4-value group-by.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    ns = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            canon("revenue").alias("revenue"),
            "n_items",
        )
    )


@query(
    "q_tpch_q18ish",
    oracle="""
    SELECT c_name, o_orderkey, orderdate, totalprice, total_qty
    FROM (
        SELECT c.c_name,
               o.o_orderkey,
               CAST(o.o_orderdate AS VARCHAR) AS orderdate,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS totalprice,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,0))) AS BIGINT) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,0))) > 300
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    )
    """,
)
def q_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    line quantity exceeds 300, top-20 by order value.

    The IN-subquery is expressed as an aggregate-then-semi-join: lineitem
    pre-aggregates to (orderkey, total_qty) with a HAVING filter — a
    map-side-combinable aggregate that shrinks the fact table ~4000× —
    and the surviving keys drive a semi join back into orders. At 100 TB
    the qualifying-key set is tiny (heavy-hitter orders), so AQE converts
    the semi join to a broadcast at runtime; quantities sum in
    DECIMAL(18,0) so the HAVING threshold and the output are engine-exact.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,0)")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            canon(F.col("o_totalprice").cast("decimal(18,2)")).alias("totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


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


@query(
    "q_tpch_q2ish",
    oracle=f"""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    sup AS (
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT p.p_partkey, p.p_brand, sup.s_name, sup.n_name, c.cost,
               ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                  ORDER BY c.cost, c.l_suppkey) AS rn
        FROM costs c
        JOIN part p ON c.l_partkey = p.p_partkey
        JOIN sup   ON c.l_suppkey = sup.s_suppkey
        WHERE p.p_type = 'ECONOMY'
    )
    SELECT p_partkey, p_brand, s_name, n_name,
           {sql_canon(sql_dround("cost", 6))} AS cost
    FROM ranked WHERE rn = 1
    ORDER BY cost, p_partkey LIMIT 100
    """,
)
def q_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every part in a type
    slice, the cheapest qualifying supplier in one region. The schema
    has no partsupp table, so supply cost derives from observed trade —
    ``min(l_extendedprice / l_quantity)`` per (part, supplier) — which
    preserves Q2's defining structure: a per-part argmin over a
    fact-derived cost against a dimension-filtered supplier set.

    Scale notes: the cost table aggregates lineitem on its natural
    (part, supplier) key with map-side partials — the only big shuffle;
    part/supplier/nation/region are broadcasts at any SF; the per-part
    argmin is a window over the aggregated (not raw) rows, keyed on
    partkey. Unit cost is a row-local IEEE division (identical doubles
    both engines); the argmin tie-breaks on suppkey so the winner is
    engine-independent; presentation via canon(dround(·, 6)).
    """
    li = table(spark, sf_dir, "lineitem")
    costs = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    parts = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    joined = (
        costs.join(F.broadcast(parts), costs.l_partkey == parts.p_partkey)
        .join(F.broadcast(sup), costs.l_suppkey == sup.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "n_name", "cost", "l_suppkey")
    )
    from pyspark.sql.window import Window as W

    rn = F.row_number().over(
        W.partitionBy("p_partkey").orderBy(
            F.col("cost").asc(), F.col("l_suppkey").asc()
        )
    )
    return (
        joined.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            canon(F.round(F.col("cost"), 6).cast("decimal(38,6)")).alias("cost"),
        )
        .orderBy(F.col("cost").asc(), F.col("p_partkey").asc())
        .limit(100)
    )


@query(
    "q_tpch_q20ish",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey,
               SUM(CAST(l.l_quantity AS DECIMAL(18,0))) AS qty
        FROM lineitem l
        WHERE l.l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,0))) > 30
    )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_heavy_parts,
           CAST(SUM(sh.qty) AS BIGINT) AS total_qty
    FROM shipped sh
    JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
)
def q_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers): the nested semi-join
    chain — a part-name slice drives a lineitem aggregation whose
    HAVING output drives a supplier join filtered by nation. Without a
    partsupp table the "available vs shipped" comparison becomes a
    shipped-volume threshold per (supplier, part), which keeps Q20's
    defining plan: subquery → pre-aggregated HAVING filter → join into
    the dimension chain.

    Scale notes: the part-name slice broadcasts into the lineitem scan
    (a semi join the optimizer can push); the only big shuffle keys on
    (suppkey, partkey) with map-side partials, and HAVING shrinks its
    output before any further join; supplier/nation broadcast.
    Quantities sum in exact decimal.
    """
    parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("large%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1997-01-01"))
    )
    shipped = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,0)")).alias("qty"))
        .filter(F.col("qty") > 30)
    )
    nations = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    sup = table(spark, sf_dir, "supplier").join(
        F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        shipped.join(F.broadcast(sup), shipped.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.count("*").cast("long").alias("n_heavy_parts"),
            F.sum("qty").cast("long").alias("total_qty"),
        )
    )


@query(
    "q_fulfillment_latency",
    oracle="""
    WITH firsts AS (
        SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    ),
    gaps AS (
        SELECT o.o_orderpriority,
               DATE_DIFF('day', CAST(o.o_orderdate AS DATE), f.first_ship)
                   AS lat_days
        FROM orders o JOIN firsts f ON o.o_orderkey = f.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(lat_days) AS BIGINT) AS min_days,
           CAST(MAX(lat_days) AS BIGINT) AS max_days,
           CAST(SUM(lat_days) AS BIGINT) AS total_days,
           CAST(SUM(CASE WHEN lat_days <= 7 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_week
    FROM gaps GROUP BY o_orderpriority
    """,
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment latency per priority class — the
    fulfillment SLA readout (does URGENT actually ship faster?), with
    the ≤7-day SLA hit count alongside min/max/total days.

    One lineitem aggregate on its natural orderkey (map-side partials
    reduce the fact to one row per order) feeding the orders join —
    both sides hash by the same key, so at scale this is the
    exchange-reuse join every order-grain metric shares. Integer date
    arithmetic throughout; the mean is recoverable exactly as
    total_days / n_orders downstream (kept as exact integers here).
    """
    li = table(spark, sf_dir, "lineitem")
    firsts = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship")
    )
    o = table(spark, sf_dir, "orders")
    gaps = o.join(firsts, o.o_orderkey == firsts.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("first_ship"), F.to_date("o_orderdate")).alias(
            "lat_days"
        ),
    )
    return gaps.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.min("lat_days").cast("long").alias("min_days"),
        F.max("lat_days").cast("long").alias("max_days"),
        F.sum("lat_days").cast("long").alias("total_days"),
        F.sum(F.when(F.col("lat_days") <= 7, 1).otherwise(0))
        .cast("long")
        .alias("n_within_week"),
    )


@query(
    "q_return_rates",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS return_rate,
           CAST(CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2))
                AS VARCHAR) AS returned_value
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate quality screen per part brand: share of line items
    flagged returned and the exact value they represent — the
    supplier/brand quality metric a merchandising team reviews weekly
    (a brand whose return rate departs from the fleet gets audited).

    One fact scan with the part dim broadcast; all counters are
    conditional aggregates in the same partial+final pass (no second
    scan for the returned slice); rate is one IEEE division of exact
    integers and value sums in exact decimal.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    ret_val = F.when(
        F.col("l_returnflag") == "R",
        F.col("l_extendedprice").cast("decimal(18,2)"),
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(ret).cast("long").alias("n_returned"),
        (F.sum(ret).cast("double") / F.count("*")).alias("return_rate"),
        F.sum(ret_val).cast("decimal(38,2)").cast("string").alias(
            "returned_value"
        ),
    )


@query(
    "q_discount_lift",
    oracle=f"""
    SELECT CAST(ROUND(l_discount * 100) AS INT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_canon(sql_dsum("l_quantity", 0))} AS total_qty,
           {sql_davg("l_quantity", 0)} AS avg_qty,
           {sql_canon(sql_dsum("l_extendedprice * (1 - l_discount)", 4))}
               AS net_revenue
    FROM lineitem
    GROUP BY CAST(ROUND(l_discount * 100) AS INT)
    """,
)
def q_discount_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band lift table: per discount percentage, line volume,
    exact and average quantity, and exact net revenue — the
    price-promotion readout (does a deeper discount actually move more
    units, and at what revenue cost?) behind TPC-H Q19-style pricing
    questions.

    The discount column lives on the 2-decimal grid, so the band key
    (ROUND(d·100)) is an exact integer in both engines; quantities and
    net revenue use the dsum/davg exact-decimal conventions. One
    partial+final aggregation over ~12 band keys.
    """
    li = table(spark, sf_dir, "lineitem")
    band = F.round(F.col("l_discount") * 100).cast("int")
    return li.groupBy(band.alias("discount_pct")).agg(
        F.count("*").cast("long").alias("n_lines"),
        canon(dsum("l_quantity", 0)).alias("total_qty"),
        davg("l_quantity", 0).alias("avg_qty"),
        canon(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        ).alias("net_revenue"),
    )


@query(
    "q_tpch_q14ish",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS ship_month,
           {sql_canon("CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DECIMAL(38,4))")} AS promo_revenue,
           {sql_canon(sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4))} AS total_revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): per ship month, revenue from
    PROMO-type parts next to total revenue. The classic fact⋈dimension
    broadcast join with a conditional aggregate; the share division is
    left to the consumer so both reported sums stay exact decimals
    (ratio-of-decimals rounding differs between engines; the sums don't).

    Scale notes: part broadcasts (dimension), the shipdate range pushes
    to the parquet scan, and the aggregate is a 24-group partial→final —
    no shuffle grows with the fact table beyond the one broadcast-join
    stage.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("ship_year"),
            F.month("l_shipdate").cast("long").alias("ship_month"),
        )
        .agg(
            canon(
                F.sum(promo.cast("decimal(18,4)")).cast("decimal(38,4)")
            ).alias("promo_revenue"),
            canon(dsum(rev, 4)).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q12ish",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-delay audit, adapted): lines shipped
    more than 90 days after their order date, split by priority class
    per return flag. (The testdata schema carries no shipmode/commit/
    receipt dates, so the delay predicate compares shipdate against
    orderdate — same join + theta-predicate + pivoted conditional-count
    shape as the original.)

    Scale notes: the only shuffle is lineitem⋈orders on orderkey; the
    delay predicate evaluates post-join (it references both sides); the
    aggregate pivots into two conditional counts over a 3-group key.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q21ish",
    oracle="""
    WITH r_lines AS (
        SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM r_lines l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM r_lines l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1
    """,
)
def q_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): count, per
    supplier, the returned ('R') line items in multi-supplier orders
    where that supplier was the ONLY one with a return — the classic
    EXISTS + NOT EXISTS correlated pair, expressed as one semi join and
    one anti join on (orderkey, ≠suppkey).

    Scale notes: both the semi and the anti join shuffle on l_orderkey
    (the natural co-partitioning key, reused across all three legs under
    AQE); the supplier dimension broadcasts; no correlated per-row
    subquery execution survives into the physical plan.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l1 = r.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = r.alias("l3")
    waited = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waited.join(F.broadcast(s), waited.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


@query(
    "q_tpch_q8ish",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {sql_canon("CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DECIMAL(38,4))")} AS nation_revenue,
           {sql_canon(sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4))} AS total_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): within ASIA-region
    customers' orders, the revenue supplied by NATION_3 next to total
    revenue per order year — the deepest dimension chain in the suite
    (6 joins, nation twice). The share division is left to the consumer
    so both sums stay exact decimals.

    Scale notes: all five dimension legs broadcast (region 5 rows,
    nation 25, customer and supplier dimension-sized); the one
    fact-scaled shuffle is lineitem⋈orders; the region filter prunes
    through the customer-nation chain before the fact join under AQE.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    rg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("ns_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("ns_name") == "NATION_3", rev).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(rg), F.col("nc_region") == rg.r_regionkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            canon(
                F.sum(nat.cast("decimal(18,4)")).cast("decimal(38,4)")
            ).alias("nation_revenue"),
            canon(dsum(rev, 4)).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q6ish",
    oracle=f"""
    SELECT {sql_canon(sql_dsum('l_extendedprice * l_discount', 4))} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.045 AND l_discount <= 0.075
      AND l_quantity < 24
    """,
)
def q_tpch_q6ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a pure
    scan-filter-aggregate with three range predicates and no join — the
    canonical predicate-pushdown benchmark (reference parity: the Excel
    connector pushes no filters, `connector.py:162-203`; our parquet
    path pushes all three).

    Scale notes: all three predicates reach the parquet scan as
    PushedFilters (shipdate min/max prune whole row groups at 100 TB
    when the data is date-sorted); the aggregate is a single partial →
    final reduction with no groupBy key, so the shuffle moves exactly
    one row per partition. The discount bounds sit between the 2-decimal
    grid points (0.045/0.075) so float boundary ties cannot occur.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.045)
            & (F.col("l_discount") <= 0.075)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            canon(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4)).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q4ish",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): a correlated EXISTS
    against the fact table — orders in a quarter window that had at
    least one line item shipped more than 90 days after the order date
    (the schema has no commitdate/receiptdate, so "late" derives from
    shipdate vs orderdate). Counted per priority bucket.

    Scale notes: the EXISTS compiles to a LEFT SEMI join keyed on
    orderkey — the semi join short-circuits per key, never materializes
    the match multiplicity, and the orderdate window filter pushes to
    the orders scan before the shuffle. Both sides shuffle on orderkey
    only; the 5-row priority aggregate is map-side partial.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-10-01 00:00:00"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q9ish",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {sql_canon(sql_dsum(
               'l.l_extendedprice * (1 - l.l_discount)'
               ' - 0.5 * p.p_retailprice * l.l_quantity', 4))} AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit): profit per supplier nation
    per order year over a part-name slice. The schema has no partsupp,
    so supply cost is modeled as half the part's retail price per unit —
    preserving Q9's defining structure: a 5-table join where the
    aggregate mixes fact columns (price, discount, quantity) with a
    dimension column (retailprice) through the join.

    Scale notes: part/supplier/nation broadcast at any SF (the name
    LIKE filter shrinks part before the join); the fact-fact shuffle is
    lineitem⋈orders on orderkey. The profit expression is row-local
    IEEE arithmetic on the 2-decimal money grid (products land on the
    4-decimal grid), summed in exact decimal — bit-identical across
    engines, same layout as q_tpch_q7ish's revenue.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(canon(dsum(profit, 4)).alias("sum_profit"))
    )


@query(
    "q_tpch_q11ish",
    oracle=f"""
    WITH traded AS (
        SELECT l.l_partkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, {sql_canon('value')} AS value
    FROM traded
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(SUM(value) AS DOUBLE) FROM traded) * 0.001
    """,
)
def q_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part traded
    value within a nation slice, kept only when it exceeds a fraction of
    the slice's TOTAL value — the canonical HAVING-against-global-scalar
    query. No partsupp table, so "stock value" is observed traded value
    (price × (1-discount)), aggregated from lineitem.

    Scale notes: one fact-scaled shuffle (groupBy partkey with map-side
    partials, after the broadcast supplier/nation semi-chain prunes
    rows); the global total re-aggregates the ALREADY-GROUPED frame (a
    one-row second pass over part-count rows, not the fact), attached as
    a 1-row broadcast. The grouped frame is cached because both the
    per-part values and their total read it — one fact scan, not two.
    The threshold compare happens on doubles cast from the same exact
    decimals in both engines.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    traded = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("value"))
        .cache()
    )
    total = traded.agg(
        F.sum("value").cast("double").alias("grand_total")
    )
    return (
        traded.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("grand_total") * 0.001)
        .select("l_partkey", canon("value").alias("value"))
    )


@query(
    "q_tpch_q13ish",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): how many customers
    placed 0, 1, 2, … non-priority orders — the canonical outer-join +
    double-aggregation query. The join filter lives in the ON clause
    (not WHERE) so customers with zero qualifying orders survive with
    count 0, exactly Q13's defining subtlety.

    Scale notes: one shuffle joins customer⋈orders on custkey (the
    priority filter prunes the orders side BEFORE the shuffle since it
    references only that side); the per-customer count is map-side
    partial on the join's partitioning (no extra exchange under AQE);
    the second aggregate groups ~50 distinct counts — a broadcast-sized
    reduction.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_tpch_q15ish",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, {sql_canon('r.total_revenue')} AS total_revenue
    FROM revenue r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) whose quarterly
    revenue equals the maximum quarterly revenue — the canonical
    view-reused-twice query (revenue CTE feeds both the ranking scalar
    and the final join). Ties all surface, exactly like the reference
    query; equality is on exact decimals so no float tie ambiguity.

    Scale notes: the revenue aggregation is the only fact-scaled
    shuffle (shipdate window pushed to the scan, map-side partials);
    the MAX re-aggregates the grouped frame (supplier-count rows) into
    one row attached by broadcast; supplier is a broadcast dimension.
    The grouped frame is cached — one fact scan feeds both consumers.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-04-01 00:00:00"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue"))
        .cache()
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", canon("total_revenue").alias("total_revenue"))
    )


@query(
    "q_tpch_q16ish",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) bucket, excluding an out-of-favor
    supplier set via NOT IN — the canonical COUNT(DISTINCT) + anti-join
    query. "Complaints" (no comment column) proxies as negative account
    balance.

    Scale notes: the excluded-supplier list is a broadcast anti join
    (6 rows; NOT IN is safe here because s_suppkey is non-null by
    construction); the part slice broadcasts into the lineitem scan;
    the COUNT(DISTINCT) expands to a two-phase aggregate — first
    distinct (brand, type, size, suppkey), then count — both map-side
    partial on the same shuffle keys.
    """
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17ish",
    oracle=f"""
    WITH brand_lines AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#13'
    ),
    part_avg AS (
        SELECT l_partkey,
               {sql_davg('l_quantity', 0)} AS avg_qty
        FROM brand_lines
        GROUP BY l_partkey
    )
    SELECT {sql_dround(
        f"CAST({sql_dsum('b.l_extendedprice', 2)} AS DOUBLE) / 7.0", 4)} AS avg_yearly,
           COUNT(*) AS n_small
    FROM brand_lines b
    JOIN part_avg a ON b.l_partkey = a.l_partkey
    WHERE b.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): line items whose
    quantity is below 20% of their part's average quantity, within one
    brand — the canonical correlated-average query, decorrelated into a
    groupBy + self-join exactly as Catalyst would rewrite the subquery.

    Scale notes: the brand slice broadcasts into the lineitem scan and
    the surviving rows are cached — the per-part average and the final
    filter both read that one slice (one fact scan). The per-part
    average is a map-side-partial groupBy on partkey; joining it back
    keys on the same partkey so AQE reuses the partitioning. The 20%
    threshold compares doubles derived identically in both engines
    (exact decimal sum / count), so the strict inequality is
    deterministic.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    brand_lines = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .cache()
    )
    part_avg = brand_lines.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg("l_quantity", 0).alias("avg_qty")
    )
    return (
        brand_lines.join(part_avg, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dround(dsum("l_extendedprice", 2).cast("double") / 7.0, 4).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "q_tpch_q19ish",
    oracle=f"""
    SELECT {sql_canon(sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4))}
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): three disjunctive
    (brand, size-range, quantity-range) clause groups spanning BOTH join
    sides — the canonical OR-predicate join the optimizer must not
    naively push (each conjunct references a different table). The
    common join key stays an equi-join; only the residual disjunction
    evaluates post-join.

    Scale notes: Catalyst extracts the implied single-side disjunctions
    (brand IN (...), size <= 15, quantity <= 30) and pushes them to the
    respective scans, so both inputs shrink before the broadcast join;
    the residual OR runs in whole-stage codegen. At 100 TB the part
    side still broadcasts (brand/size slice), keeping the fact scan
    shuffle-free.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            canon(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q22ish",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {sql_davg('c_acctbal', 2)} AS threshold
        FROM customer WHERE c_acctbal > 0
    )
    SELECT (c.c_nationkey % 5) AS cntrycode,
           COUNT(*) AS numcust,
           {sql_canon(sql_dsum('c.c_acctbal', 2))} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): well-funded customers
    (account balance above the positive-balance average) with no RECENT
    orders, bucketed by country code — the canonical
    scalar-subquery + anti-join query. The schema has no phone column,
    so the country code derives from nationkey, and "never ordered"
    tightens to "no order since 1999" (the testdata gives every
    customer at least one order overall).

    Scale notes: the average is a 1-row broadcast attached to the
    customer scan (scalar-attach shape, allowlisted); the anti join
    shuffles on custkey with the orderdate filter pushed to the orders
    scan first; the 5-bucket aggregate is map-side partial. The
    threshold compare is on doubles computed identically in both
    engines (exact decimal sum / count → one IEEE division).
    """
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal", 2).alias("threshold")
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= ts("1999-01-01 00:00:00")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            canon(dsum("c_acctbal", 2)).alias("totacctbal"),
        )
    )
