"""Round-8 TPC-H completion set (Q4/Q6/Q9/Q11/Q13/Q15/Q16/Q17/Q19/Q22
shapes): plan-shape and semantic invariants the oracle hash can't see —
pushdown reaching the scan, semi/anti join strategy, zero-count outer-join
preservation, and scalar-threshold consistency."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _queries():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ops(plan: str) -> list[str]:
    return re.findall(r"^\(\d+\) (\w+)", plan, re.M)


def test_q6_filters_reach_parquet_scan(spark):
    """Q6 is the pushdown benchmark: shipdate window, discount range and
    quantity bound must all appear as PushedFilters on the lineitem scan."""
    plan = _plan(_queries()["q_tpch_q6ish"](spark, SF))
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    assert "GreaterThanOrEqual(l_discount,0.045)" in pushed
    assert "LessThan(l_quantity,24.0)" in pushed
    # column pruning: only the four touched columns are read
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert read.count(":") == 4, read


def test_q4_exists_is_semi_join(spark):
    """The EXISTS must compile to a LeftSemi hash join, not an inner join
    + distinct (which would materialize match multiplicity)."""
    plan = _plan(_queries()["q_tpch_q4ish"](spark, SF))
    assert "LeftSemi" in plan
    ops = _ops(plan)
    assert "HashAggregate" in ops


def test_q13_preserves_zero_order_customers(spark):
    """The defining Q13 subtlety: the priority filter lives in the join
    condition, so customers with no qualifying orders appear with count 0.
    Every customer must be accounted for across the distribution."""
    df = _queries()["q_tpch_q13ish"](spark, SF)
    total = df.agg(F.sum("custdist")).collect()[0][0]
    from pyspark_excel_datasource_spark.catalog import table

    n_cust = table(spark, SF, "customer").count()
    assert total == n_cust


def test_q15_returns_the_max_revenue_suppliers(spark):
    """Every returned supplier carries exactly the maximum revenue value
    (ties all surface; none below the max leak in)."""
    df = _queries()["q_tpch_q15ish"](spark, SF).collect()
    assert len(df) >= 1
    revenues = {r["total_revenue"] for r in df}
    assert len(revenues) == 1


def test_q16_excludes_negative_balance_suppliers(spark):
    """The anti join must remove every supplier with s_acctbal < 0 from
    the distinct counts: re-adding them can only grow the counts."""
    from pyspark_excel_datasource_spark.catalog import table

    q = _queries()["q_tpch_q16ish"](spark, SF)
    with_bad = (
        table(spark, SF, "lineitem")
        .join(
            F.broadcast(
                table(spark, SF, "part").filter(
                    (F.col("p_brand") != "Brand#13")
                    & (F.col("p_type") != "PROMO")
                    & (F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("all_cnt"))
    )
    joined = q.join(with_bad, ["p_brand", "p_type", "p_size"], "inner")
    bad = joined.filter(F.col("supplier_cnt") > F.col("all_cnt")).count()
    assert bad == 0


def test_q17_threshold_strictly_filters(spark):
    """The surviving small-quantity rows must be a strict subset of the
    brand slice, and the count column must be positive at sf0.001."""
    row = _queries()["q_tpch_q17ish"](spark, SF).collect()[0]
    assert row["n_small"] > 0
    from pyspark_excel_datasource_spark.catalog import table

    brand_total = (
        table(spark, SF, "lineitem")
        .join(
            F.broadcast(
                table(spark, SF, "part").filter(F.col("p_brand") == "Brand#13")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .count()
    )
    assert row["n_small"] < brand_total


def test_q19_residual_or_evaluates_post_join(spark):
    """The disjunction spans both tables, so the equi-join must stay an
    equi-join (no nested loop) with the OR as a residual filter."""
    plan = _plan(_queries()["q_tpch_q19ish"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q22_anti_join_excludes_recent_orderers(spark):
    """No returned bucket may include a customer with a post-1999 order:
    recompute the excluded set and assert disjointness via total count."""
    df = _queries()["q_tpch_q22ish"](spark, SF)
    total = df.agg(F.sum("numcust")).collect()[0][0]
    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.functions.determinism import davg
    from pyspark_excel_datasource_spark.operators.relational import ts

    cust = table(spark, SF, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal", 2).alias("t")
    ).collect()[0]["t"]
    rich = cust.filter(F.col("c_acctbal") > avg_bal)
    recent = (
        table(spark, SF, "orders")
        .filter(F.col("o_orderdate") >= ts("1999-01-01 00:00:00"))
        .select("o_custkey")
        .distinct()
    )
    expect = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).count()
    assert total == expect


def test_q11_threshold_is_global_fraction(spark):
    """Every surviving part's value must exceed 0.1% of the slice total —
    and at least one non-surviving part must exist below it (the HAVING
    actually filters at sf0.001)."""
    df = _queries()["q_tpch_q11ish"](spark, SF)
    n_out = df.count()
    assert n_out > 0
    from pyspark_excel_datasource_spark.catalog import table

    li = table(spark, SF, "lineitem")
    s = table(spark, SF, "supplier")
    n = table(spark, SF, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    grouped = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .count()
    )
    assert n_out < grouped.count()
