"""Round-11 operators: CUSUM changepoint + linear-interpolation gapfill
(the DuckDB hash parity is the exactness gate; these tests pin the
SEMANTICS against independent pandas recomputations)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.plans.registry import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return load_all_queries()


def test_cusum_matches_pandas_recompute(spark, queries):
    got = {
        r.event_type: r.asDict()
        for r in queries["q_changepoint_cusum"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = ev["ts"].dt.date
    for etype, grp in ev.groupby("event_type"):
        daily = grp.groupby("d").size().sort_index()
        n, t = len(daily), int(daily.sum())
        s = (n * daily - t).cumsum()
        # argmax of |S|, earliest day on ties
        best = s.abs().sort_values(kind="stable").index[-1]
        cands = s[s.abs() == s.abs().max()]
        best = min(cands.index)
        row = got[etype]
        assert row["cp_day"] == str(best)
        assert row["cusum_at_cp"] == int(s[best])
        assert (row["n_days"], row["n_events"]) == (n, t)


def test_gapfill_is_linear_between_neighbours(spark, queries):
    df = queries["q_interpolate_gapfill"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    hours = (
        ev.assign(bucket=ev["ts"].dt.floor("h"))
        .groupby(["event_type", "bucket"])
        .size()
    )
    # grid shape: full spine x types
    lo, hi = ev["ts"].min().floor("h"), ev["ts"].max().floor("h")
    n_hours = int((hi - lo) / pd.Timedelta(hours=1)) + 1
    assert len(df) == n_hours * ev["event_type"].nunique()
    # observed buckets pass through exactly; there ARE gaps to fill
    assert df["filled"].any()
    for _, r in df[~df["filled"]].sample(50, random_state=0).iterrows():
        assert r["rate_fp"] == hours[(r["event_type"], r["bucket"])] * 1_000_000
    # filled values recompute from the pandas interpolation exactly
    for etype, grp in df.groupby("event_type"):
        grp = grp.sort_values("bucket").set_index("bucket")
        obs = grp[~grp["filled"]]["rate_fp"] / 1_000_000
        # linear time interpolation with flat edges, on the same grid
        exp = (
            obs.reindex(grp.index)
            .interpolate(method="index", limit_direction="both")
        )
        exp_fp = (exp * 1_000_000 + 0.5).pipe(lambda s: s.apply(int))
        assert (grp["rate_fp"] == exp_fp).all(), etype


def test_ks_matches_pandas_recompute(spark, queries):
    row = queries["q_drift_ks"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o["o_orderstatus"].isin(["F", "O"])]
    v = (o["o_totalprice"] * 100).round().astype("int64")
    s1 = sorted(v[o["o_orderstatus"] == "F"])
    s2 = sorted(v[o["o_orderstatus"] == "O"])
    n1, n2 = len(s1), len(s2)
    import bisect

    grid = sorted(set(s1) | set(s2))
    best = max(
        (
            abs(bisect.bisect_right(s1, x) * n2 - bisect.bisect_right(s2, x) * n1),
            -x,
        )
        for x in grid
    )
    d_num, at = best[0], -best[1]
    assert (row["d_num"], row["n1"], row["n2"]) == (d_num, n1, n2)
    assert row["at_cents"] == at
    assert row["ks_fp"] == int(d_num / (n1 * n2) * 1_000_000)


def test_classify_gd_matches_numpy_recompute(spark, queries):
    import math

    row = queries["q_classify_gd"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    y = (o["o_orderstatus"] == "F").astype(float).to_numpy()
    x1 = (o["o_totalprice"] / 300000.0).to_numpy()
    x2 = ((o["o_custkey"] % 100).astype(float) / 100.0).to_numpy()
    n = len(y)
    a = b = c = 0.0
    for _ in range(3):
        z = a + (b * x1) + (c * x2)
        p = 0.5 + (z / (2.0 * (1.0 + abs(z))))
        e = p - y
        ga = int(sum(int(math.floor(v * 1e6 + 0.5)) for v in e))
        gb = int(sum(int(math.floor(v * 1e6 + 0.5)) for v in e * x1))
        gc = int(sum(int(math.floor(v * 1e6 + 0.5)) for v in e * x2))
        a, b, c = (
            a - (ga / 1e6) / n,
            b - (gb / 1e6) / n,
            c - (gc / 1e6) / n,
        )
    assert row["bias_fp"] == int(math.floor(a * 1e9 + 0.5))
    assert row["w_price_fp"] == int(math.floor(b * 1e9 + 0.5))
    assert row["w_cust_fp"] == int(math.floor(c * 1e9 + 0.5))
    z = a + (b * x1) + (c * x2)
    assert row["n_correct"] == int(((z >= 0.0) == (y == 1.0)).sum())
    assert row["n"] == n
    # the model actually learned something beyond the zero vector
    assert row["w_price_fp"] != 0 and 0 < row["n_correct"] < n


def test_stream_cdf_per_commit_semantics(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        register_pydelta,
    )
    from pyspark_excel_datasource_spark.sources.deltalog import (
        delete_where,
        optimize,
        write_delta,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "g" + str(i % 2)) for i in range(20)], "id int, g string"
    )
    # one task -> ONE file per partition dir, so the COW delete below
    # matches both files and their full pre-image streams as deletes
    write_delta(
        spark, df.repartition(1), path,
        partition_by=("g",), checkpoint_interval=0,
    )
    delete_where(spark, path, "id < 5")
    optimize(spark, path)  # dataChange=false: must be invisible
    register_pydelta(spark)
    sink = "cdf_sem_sink"
    q = (
        spark.readStream.format("pydelta")
        .option("readChangeFeed", "true")
        .load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = spark.table(sink)
    # v0: 20 inserts. v1 (COW delete): matched files re-emitted — the
    # removes stream their full pre-image as deletes, the rewrites
    # stream survivors as inserts; OPTIMIZE contributes nothing.
    by = {
        (r["_change_type"], r["_commit_version"]): r["n"]
        for r in got.groupBy("_change_type", "_commit_version")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by[("insert", 0)] == 20
    assert by[("delete", 1)] == 20  # both files contained matches
    assert by[("insert", 1)] == 15  # survivors rewritten
    assert ("insert", 2) not in by and ("delete", 2) not in by
    # partition values attach on deletes too
    assert (
        got.filter("_change_type = 'delete'")
        .select("g")
        .distinct()
        .count()
        == 2
    )
    # CDF + ignore flags do not compose (the reader gate fires at
    # construction; drive it directly — .start() reports lazily)
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )
    from pyspark_excel_datasource_spark.sources.deltalog import snapshot

    with pytest.raises(ValueError, match="do not compose"):
        DeltaStreamReader(
            snapshot(path).schema,
            {"path": path, "readChangeFeed": "true", "ignoreDeletes": "true"},
        )


def test_int8_quantization_matches_numpy(spark, queries):
    import numpy as np

    got = {
        r.dim: r.asDict()
        for r in queries["q_embed_quantize_int8"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    for d in range(mat.shape[1]):
        x = mat[:, d]
        scale = np.abs(x).max() / 127.0
        qv = np.floor(x / scale + 0.5) if scale else np.zeros_like(x)
        assert np.all(np.abs(qv) <= 127)  # int8-representable
        err = x - qv * scale
        row = got[d + 1]
        assert row["scale_fp"] == int(np.floor(scale * 1e9 + 0.5))
        assert row["n"] == len(x)
        assert row["sum_qabs"] == int(np.abs(qv).sum())
        assert row["sse_fp"] == int(
            sum(int(np.floor(e * e * 1e12 + 0.5)) for e in err)
        )
