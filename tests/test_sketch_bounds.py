"""Error-bound tests for the approximate aggregates.

Round 6 converted the sketch queries to bound-asserted oracles: each
query now computes its own exact twin in-plan and emits hash-checked
verdict columns. These tests keep the INDEPENDENT rigor: the sketches
are rebuilt here directly from the raw tables (not through the registry
queries) and compared against exact answers computed with different
code, so a bug that broke both sides of a query's internal comparison
identically would still trip.

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
- count-min — one-sided error always; overshoot <= e*N/width w.h.p.
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

    li = table(spark, SF, "lineitem")
    got = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
                "median_price_approx"
            ),
        )
        .collect()
    }
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
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
    # and the registry query's in-plan verdicts agree
    for r in queries["q_agg_approx"](spark, SF).collect():
        assert r.cd_within_bounds and r.median_within_bounds, r


def test_agg_approx_quantile_error_bounds(spark, queries):
    from pyspark_excel_datasource_spark.catalog import table

    li = table(spark, SF, "lineitem")
    got = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice,"
                " array(0.5, 0.9, 0.99), 10000)"
            ).alias("q")
        )
        .select(
            "l_returnflag",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p90"),
            F.col("q")[2].alias("p99"),
        )
        .collect()
    }
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
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
    for r in queries["q_agg_approx_quantile"](spark, SF).collect():
        assert r.ok_p50 and r.ok_p90 and r.ok_p99, r


def test_agg_hll_error_bounds(spark, queries):
    from pyspark_excel_datasource_spark.catalog import table

    ev = table(spark, SF, "events")
    got = {
        r.event_type: r.approx
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("approx")
        )
        .collect()
    }
    got["ALL"] = (
        ev.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long")
        ).first()[0]
    )
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
    rows = queries["q_agg_hll"](spark, SF).collect()
    assert all(r.within_bounds for r in rows)
    # the query's exact side matches the independent exact computation
    assert {r.event_type: r.exact_users for r in rows} == exact


def test_agg_countmin_error_bounds(spark, queries):
    """CMS guarantees: one-sided (estimate >= exact) always, and
    overshoot <= e*N/width with prob >= 1 - e^-depth. The sketch is
    rebuilt here via the raw helper and probed manually — independent of
    the registry query's own verdict logic."""
    import math

    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.operators.analytics import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        countmin_sketch,
    )

    toks = (
        table(spark, SF, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .cache()
    )
    n_tokens = toks.count()
    sketch = {
        (r.d, r.bucket): r.n for r in countmin_sketch(toks).collect()
    }
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("tok").asc())
        .limit(20)
        .collect()
    )
    probe = (
        toks.sparkSession.createDataFrame(
            [(r.tok,) for r in top], "tok string"
        )
        .select(
            "tok",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("d"),
        )
        .select(
            "tok",
            "d",
            F.pmod(F.xxhash64("d", "tok"), F.lit(_CMS_WIDTH)).alias("bucket"),
        )
        .collect()
    )
    est = {}
    for r in probe:
        est[r.tok] = min(est.get(r.tok, float("inf")), sketch.get((r.d, r.bucket), 0))
    cap = 2 * math.e * n_tokens / _CMS_WIDTH
    for r in top:
        assert est[r.tok] >= r.exact_n, r  # never undercounts
        assert est[r.tok] - r.exact_n <= cap, (r, cap)
    rows = queries["q_agg_countmin"](spark, SF).collect()
    assert len(rows) == 20
    assert all(r.est_ge_exact and r.overshoot_ok for r in rows)


def test_agg_theta_error_bounds(spark, queries):
    """KMV/theta set algebra: saturated-set estimates within 4/sqrt(k)
    relative error (k=128 → 35%; actual is ~5% on this data — the bound
    is a deterministic regression tripwire), and the exact columns are
    re-derived here from the raw table with independent code."""
    import math

    from pyspark_excel_datasource_spark.operators.analytics import _THETA_K

    out = {r.measure: r for r in queries["q_agg_theta"](spark, SF).collect()}
    assert set(out) == {
        "a_f_status", "b_o_status", "union", "intersect", "diff_a_minus_b"
    }

    o = spark.read.parquet(f"{SF}/orders.parquet")
    a = {r.o_custkey for r in o.filter("o_orderstatus = 'F'").collect()}
    b = {r.o_custkey for r in o.filter("o_orderstatus = 'O'").collect()}
    expect = {
        "a_f_status": len(a),
        "b_o_status": len(b),
        "union": len(a | b),
        "intersect": len(a & b),
        "diff_a_minus_b": len(a - b),
    }
    for m, x in expect.items():
        assert out[m].exact_count == x, m

    bound = 4 / math.sqrt(_THETA_K)
    for m in ("a_f_status", "b_o_status", "union", "intersect"):
        r = out[m]
        rel = abs(r.estimate - r.exact_count) / r.exact_count
        assert rel < bound, f"{m}: rel err {rel:.3f} >= {bound:.3f}"
    # the difference is a small set (|A\B| ~ 2 at sf0.001): KMV noise is
    # absolute ~union/k there, so assert the additive bound instead
    r = out["diff_a_minus_b"]
    assert 0 <= r.estimate <= r.exact_count + 4 * expect["union"] / _THETA_K


def test_agg_theta_estimates_match_pure_python_kmv(spark, queries):
    """Independent-code exactness: rebuild both KMV sketches in pure
    Python (hashlib md5, k smallest, same estimator trees) and require
    the query's ESTIMATES to match to float equality — a bug that
    shifted both engines' sketch identically (they share the md5/k
    definitions) would still trip here."""
    import hashlib

    from pyspark_excel_datasource_spark.operators.analytics import (
        _THETA_K,
        _THETA_M,
    )

    out = {r.measure: r for r in queries["q_agg_theta"](spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet").collect()
    h = lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)  # noqa: E731
    a = sorted({h(r.o_custkey) for r in o if r.o_orderstatus == "F"})
    b = sorted({h(r.o_custkey) for r in o if r.o_orderstatus == "O"})
    u = sorted(set(a) | set(b))

    def kmv_est(hs):
        kept = hs[:_THETA_K]
        if len(kept) < _THETA_K:
            return float(len(kept))
        return float(_THETA_K - 1) * float(_THETA_M) / float(kept[-1])

    assert out["a_f_status"].estimate == kmv_est(a)
    assert out["b_o_status"].estimate == kmv_est(b)
    assert out["union"].estimate == kmv_est(u)
    ta = _THETA_M if len(a) < _THETA_K else a[:_THETA_K][-1]
    tb = _THETA_M if len(b) < _THETA_K else b[:_THETA_K][-1]
    ti = min(ta, tb)
    ka, kb = set(a[:_THETA_K]), set(b[:_THETA_K])
    ci = sum(1 for x in ka & kb if x < ti)
    cd = sum(1 for x in ka - kb if x < ti)
    assert out["intersect"].estimate == float(ci) * float(_THETA_M) / float(ti)
    assert out["diff_a_minus_b"].estimate == float(cd) * float(_THETA_M) / float(ti)
