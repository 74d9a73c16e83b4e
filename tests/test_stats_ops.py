"""Statistical inference operators (stats.py): chi-squared/Cramér's V,
mutual information, Kaplan–Meier survival, Mann–Kendall trend. DuckDB
hash parity is the exactness gate (driver + tools/run_parity.py); these
tests pin the SEMANTICS against independent pandas/numpy recomputes."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark_excel_datasource_spark.plans.registry import load_all_queries

SF = "/root/testdata/sf0.001"
FP = 1_000_000


@pytest.fixture(scope="module")
def queries():
    return load_all_queries()


def _fp(x: float) -> int:
    return math.floor(x * FP + 0.5)


def test_chi2_matches_numpy_recompute(spark, queries):
    row = queries["q_chi2_independence"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    ct = pd.crosstab(o["o_orderstatus"], o["o_orderpriority"])
    n = int(ct.values.sum())
    chi2_fp = 0
    for xi in ct.index:
        for yi in ct.columns:
            obs = int(ct.loc[xi, yi])
            r, c = int(ct.loc[xi].sum()), int(ct[yi].sum())
            num = obs * n - r * c
            chi2_fp += _fp(float(num) * float(num) / (r * c * n) / n)
    assert row["n"] == n
    assert (row["n_x"], row["n_y"]) == ct.shape
    assert row["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert row["chi2_fp"] == chi2_fp
    v = math.sqrt(chi2_fp / FP / (n * min(ct.shape[0] - 1, ct.shape[1] - 1)))
    assert row["cramers_v_fp"] == _fp(v)
    # independence sanity: synthetic priorities are ~independent of
    # status, so V is small but the statistic is strictly positive
    assert 0 < row["cramers_v_fp"] < FP // 4


def test_mutual_info_matches_numpy_recompute(spark, queries):
    row = queries["q_mutual_info"](spark, SF).collect()[0]
    c = pd.read_parquet(f"{SF}/customer.parquet")
    nn = pd.read_parquet(f"{SF}/nation.parquet")
    j = c.merge(nn, left_on="c_nationkey", right_on="n_nationkey")
    ct = pd.crosstab(j["c_mktsegment"], j["n_name"])
    n = int(ct.values.sum())
    mi_fp, n_cells = 0, 0
    for xi in ct.index:
        for yi in ct.columns:
            nxy = int(ct.loc[xi, yi])
            if nxy == 0:
                continue
            n_cells += 1
            nx, ny = int(ct.loc[xi].sum()), int(ct[yi].sum())
            mi_fp += _fp(
                (nxy / n) * math.log2(nxy * n / (float(nx) * float(ny)))
            )
    hx = sum(
        _fp(-(int(v) / n) * math.log2(int(v) / n))
        for v in ct.sum(axis=1)
    )
    hy = sum(
        _fp(-(int(v) / n) * math.log2(int(v) / n))
        for v in ct.sum(axis=0)
    )
    assert (row["n"], row["n_cells"]) == (n, n_cells)
    assert row["mi_fp"] == mi_fp
    assert (row["h_seg_fp"], row["h_nat_fp"]) == (hx, hy)
    assert row["nmi_fp"] == math.floor(mi_fp / min(hx, hy) * FP + 0.5)
    # MI is non-negative up to quantization and bounded by min entropy
    assert -10 <= row["mi_fp"] <= min(hx, hy)


def test_survival_km_matches_pandas_recompute(spark, queries):
    got = queries["q_survival_km"](spark, SF).toPandas()
    got = got.sort_values("t_month").reset_index(drop=True)
    o = pd.read_parquet(f"{SF}/orders.parquet")
    t = (
        (pd.Timestamp("2001-08-01") - o["o_orderdate"]).dt.days // 30
    ).astype(int)
    ev = (o["o_orderstatus"] == "F").astype(int)
    df = pd.DataFrame({"t": t, "ev": ev})
    census = (
        df.groupby("t")
        .agg(d=("ev", "sum"), tot=("ev", "size"))
        .sort_index()
    )
    census["censored"] = census["tot"] - census["d"]
    census["n_at_risk"] = census["tot"][::-1].cumsum()[::-1]
    assert list(got["t_month"]) == list(census.index)
    assert list(got["d"]) == list(census["d"])
    assert list(got["n_at_risk"]) == list(census["n_at_risk"])
    # cumulative log2-survival: quantize-then-sum, skip d=0 months
    cum, cums = 0, []
    for _, r in census.iterrows():
        if r["d"] > 0 and r["n_at_risk"] > r["d"]:
            cum += _fp(math.log2((r["n_at_risk"] - r["d"]) / r["n_at_risk"]))
        cums.append(cum)
    assert list(got["log2_surv_fp"]) == cums
    # survival is monotone non-increasing and never hits zero here
    assert (got["log2_surv_fp"].diff().dropna() <= 0).all()
    assert (got["surv_zero"] == 0).all()


def test_mann_kendall_matches_bruteforce(spark, queries):
    got = {
        r["priority"]: r.asDict()
        for r in queries["q_trend_mann_kendall"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["m"] = o["o_orderdate"].dt.strftime("%Y-%m")
    for pr, grp in o.groupby("o_orderpriority"):
        x = grp.groupby("m").size().sort_index().to_list()
        n = len(x)
        s = sum(
            (x[j] > x[i]) - (x[j] < x[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        vals = pd.Series(x).value_counts()
        tie18 = int(sum(t * (t - 1) * (2 * t + 5) for t in vals))
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        tx = int(sum(t * (t - 1) // 2 for t in vals))
        n0 = n * (n - 1) // 2
        row = got[pr]
        assert (row["n_months"], row["s_stat"], row["var18"]) == (
            n,
            s,
            var18,
        )
        assert row["tau_fp"] == math.floor(
            s / math.sqrt(float(n0 - tx) * n0) * FP + 0.5
        )
        zc = (s - 1) if s > 0 else (s + 1) if s < 0 else 0
        zexp = (
            0
            if s == 0
            else math.floor(zc / math.sqrt(var18 / 18.0) * FP + 0.5)
        )
        assert row["z_fp"] == zexp
