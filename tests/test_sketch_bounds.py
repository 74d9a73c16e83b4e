"""Error-bound tests for the approximate (rows-only-checked) aggregates.

The driver can only do a rows-only check on sketch outputs (no
engine-portable oracle exists), so these tests supply the missing rigor
locally: every estimate must sit within its algorithm's published error
envelope of the exact answer computed on the same data.

Bounds used (all generous vs the theoretical guarantees, so they are
regression tripwires, not flaky statistical tests — every input here is
fixed, so the estimates are deterministic):

- ``approx_count_distinct(rsd=0.02)`` — HLL++ relative standard error
  2%; assert < 10% (5 sigma).
- ``percentile_approx`` / ``approx_percentile(accuracy=a)`` —
  Greenwald-Khanna rank error <= n/a; with a=1000/10000 vs the sf0.001
  row counts the rank slack is a handful of rows, so assert the estimate
  lies between neighboring exact percentiles (value-domain bound).
- ``hll_sketch_agg`` (DataSketches HLL, default lgK=12) — RSE ~0.8%;
  assert < 5%.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()


def test_agg_approx_error_bounds(spark, queries):
    from pyspark_excel_datasource_spark.catalog import table

    got = {r.l_returnflag: r for r in queries["q_agg_approx"](spark, SF).collect()}
    exact = {
        r.l_returnflag: r
        for r in table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
            F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g.approx_orders - e.orders) / e.orders < 0.10, flag
        # GK sketch: estimated median must land inside the p45..p55 value
        # band (rank error n/1000 << 5% of n at this SF)
        assert e.p45 <= g.median_price_approx <= e.p55, flag


def test_agg_approx_quantile_error_bounds(spark, queries):
    from pyspark_excel_datasource_spark.catalog import table

    got = {
        r.l_returnflag: r
        for r in queries["q_agg_approx_quantile"](spark, SF).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_extendedprice, {p})").alias(name)
                for name, p in [
                    ("p45", 0.45), ("p55", 0.55),
                    ("p85", 0.85), ("p95", 0.95),
                    ("p98", 0.98), ("p995", 0.995),
                ]
            ]
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        # accuracy=10000 vs a few-thousand-row group: rank error is ~0-1
        # rows, so each estimate must sit in a wide value band around its
        # target rank
        assert e.p45 <= g.p50 <= e.p55, flag
        assert e.p85 <= g.p90 <= e.p95, flag
        assert e.p98 <= g.p99 <= e.p995 * 1.001, flag


def test_agg_hll_error_bounds(spark, queries):
    from pyspark_excel_datasource_spark.catalog import table

    got = {r.event_type: r.approx_users for r in queries["q_agg_hll"](spark, SF).collect()}
    ev = table(spark, SF, "events")
    exact = {
        r.event_type: r.users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)


def test_agg_countmin_error_bounds(spark, queries):
    """CMS guarantees: one-sided (estimate >= exact) always, and
    overshoot <= e*N/width with prob >= 1 - e^-depth. With N ~ 6e4
    tokens and width 1024 the bound is ~160; assert the hard one-sided
    property and a generous 2x-the-analytic-bound overshoot cap."""
    import math

    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.operators.analytics import _CMS_WIDTH

    rows = queries["q_agg_countmin"](spark, SF).collect()
    assert len(rows) == 20
    n_tokens = (
        table(spark, SF, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .count()
    )
    cap = 2 * math.e * n_tokens / _CMS_WIDTH
    for r in rows:
        assert r.cms_estimate >= r.exact_n, r  # never undercounts
        assert r.cms_estimate - r.exact_n <= cap, (r, cap)
