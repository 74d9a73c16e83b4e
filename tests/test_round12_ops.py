"""Round-12 operators: AP/calibration eval, link prediction, label
propagation, readability, binaryFile scan, Delta VACUUM. DuckDB hash
parity is the exactness gate; these tests pin SEMANTICS against
independent pandas/python recomputes."""

from __future__ import annotations

import hashlib
import math
import os
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.plans.registry import load_all_queries

SF = "/root/testdata/sf0.001"
FP = 1_000_000


@pytest.fixture(scope="module")
def queries():
    return load_all_queries()


def _fp(x: float) -> int:
    return math.floor(x * FP + 0.5)


@pytest.fixture(scope="module")
def scored(spark):
    from pyspark_excel_datasource_spark.operators.ml import _nb_en_scored

    return _nb_en_scored(spark, SF).toPandas()


def test_eval_ap_matches_pandas_ranking(spark, queries, scored):
    row = queries["q_eval_ap"](spark, SF).collect()[0]
    df = scored.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    df["k"] = range(1, len(df) + 1)
    pos = df[df["pos"] == 1].reset_index(drop=True)
    pos["j"] = range(1, len(pos) + 1)
    terms = [_fp(j / k) for j, k in zip(pos["j"], pos["k"])]
    assert row["n"] == len(df)
    assert row["n_pos"] == len(pos)
    assert row["ap_sum_fp"] == sum(terms)
    assert row["ap_fp"] == math.floor(sum(terms) / len(pos) + 0.5)
    # the ranking is informative: AP beats the prevalence baseline
    assert row["ap_fp"] > _fp(len(pos) / len(df))
    assert row["ap_fp"] <= FP


def test_eval_calibration_matches_pandas_bins(spark, queries, scored):
    got = queries["q_eval_calibration"](spark, SF).toPandas()
    mn, mx = scored["score"].min(), scored["score"].max()
    bins = (
        ((scored["score"] - mn) / (mx - mn) * 10)
        .apply(math.floor)
        .clip(upper=9)
    )
    df = scored.assign(
        bin=bins, s_fp=scored["score"].apply(lambda s: _fp(s))
    )
    exp = (
        df.groupby("bin")
        .agg(n=("pos", "size"), n_pos=("pos", "sum"), s=("s_fp", "sum"))
        .reset_index()
    )
    assert list(got["bin"]) == list(exp["bin"])
    assert list(got["n"]) == list(exp["n"])
    assert list(got["n_pos"]) == list(exp["n_pos"])
    for g, (_, e) in zip(got.itertuples(), exp.iterrows()):
        assert g.pos_rate_fp == _fp(e["n_pos"] / e["n"])
        assert g.mean_score_fp == math.floor(e["s"] / e["n"] + 0.5)
    assert got["n"].sum() == len(scored)


def _cs_frame() -> pd.DataFrame:
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    return (
        o.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
        .rename(columns={"o_custkey": "cust", "l_suppkey": "supp"})
    )


def test_common_neighbors_matches_bruteforce(spark, queries):
    got = queries["q_graph_common_neighbors"](spark, SF).toPandas()
    cs = _cs_frame()
    by_supp = cs.groupby("supp")["cust"].apply(set)
    degc = cs.groupby("cust").size()
    rows = []
    supps = sorted(by_supp.index)
    for i, s1 in enumerate(supps):
        for s2 in supps[i + 1 :]:
            common = by_supp[s1] & by_supp[s2]
            common = {c for c in common if degc[c] <= 256}
            if not common:
                continue
            cn = len(common)
            d1, d2 = len(by_supp[s1]), len(by_supp[s2])
            aa = sum(_fp(1 / math.log2(degc[c])) for c in common)
            rows.append(
                (s1, s2, cn, d1, d2, _fp(cn / (d1 + d2 - cn)), aa)
            )
    exp = (
        pd.DataFrame(
            rows,
            columns=["s1", "s2", "cn", "deg1", "deg2", "jaccard_fp", "aa_fp"],
        )
        .sort_values(["cn", "s1", "s2"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )


def test_label_prop_matches_bruteforce(spark, queries):
    got = queries["q_graph_label_prop"](spark, SF).toPandas()
    cs = _cs_frame()
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    seeds = {
        int(r.s_suppkey): int(r.s_nationkey)
        for r in sup.itertuples()
        if r.s_suppkey % 3 == 0
    }

    def argmax(votes: dict[int, int]) -> int:
        best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
        return best[0]

    cust_lab = {}
    for cust, grp in cs.groupby("cust"):
        votes: dict[int, int] = {}
        for s in grp["supp"]:
            if s in seeds:
                votes[seeds[s]] = votes.get(seeds[s], 0) + 1
        if votes:
            cust_lab[cust] = argmax(votes)
    spread = {}
    for supp, grp in cs.groupby("supp"):
        if supp in seeds:
            continue
        votes = {}
        for c in grp["cust"]:
            if c in cust_lab:
                votes[cust_lab[c]] = votes.get(cust_lab[c], 0) + 1
        if votes:
            spread[supp] = argmax(votes)
    labels = sorted(set(cust_lab.values()) | set(spread.values()))
    exp = pd.DataFrame(
        {
            "label": labels,
            "n_seeds": [
                sum(1 for v in seeds.values() if v == l) for l in labels
            ],
            "n_customers": [
                sum(1 for v in cust_lab.values() if v == l) for l in labels
            ],
            "n_spread_suppliers": [
                sum(1 for v in spread.values() if v == l) for l in labels
            ],
        }
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_readability_matches_python_re(spark, queries):
    got = queries["q_text_readability"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg: dict[str, list[int]] = {}
    for r in docs.itertuples():
        w = len(re.findall(r"\S+", r.text))
        s = max(1, len(re.findall(r"[.!?]+", r.text)))
        y = len(re.findall(r"[aeiouyAEIOUY]+", r.text))
        a = agg.setdefault(r.source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    for row in got.itertuples():
        n, w, s, y = agg[row.source]
        assert (row.n_docs, row.words, row.sentences, row.syllables) == (
            n,
            w,
            s,
            y,
        )
        assert row.fk_grade_fp == _fp(0.39 * (w / s) + 11.8 * (y / w) - 15.59)
        assert row.flesch_ease_fp == _fp(
            206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        )
    assert set(got["source"]) == set(agg)


def test_scan_binaryfile_matches_hashlib(spark, queries):
    got = queries["q_scan_binaryfile"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["doc_id"] % 5 == 0]
    assert len(got) == len(docs)
    by_id = got.set_index("doc_id")
    for r in docs.itertuples():
        raw = r.text.encode("utf-8")
        assert by_id.loc[r.doc_id, "n_bytes"] == len(raw)
        assert by_id.loc[r.doc_id, "content_md5"] == hashlib.md5(raw).hexdigest()


def test_delta_vacuum_reclaims_and_breaks_time_travel(spark, queries):
    from pyspark_excel_datasource_spark.sources.deltalog import read_delta

    got = queries["q_delta_vacuum"](spark, SF).toPandas()
    assert (got["n_removed"] == 6).all()
    assert (got["n_files_after"] == 1).all()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    sub = ev[ev["event_id"] % 9 == 0]
    assert got["n_events"].sum() == len(sub)
    # the vacuumed files are gone: reading v0 (pre-optimize) must fail
    out = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
        ".fixtures",
        "sf0_001",
        "events_vacuum_delta",
    )
    with pytest.raises(Exception):
        read_delta(spark, out, version=0).collect()


def test_forecast_holt_matches_python_recurrence(spark, queries):
    got = {
        r["priority"]: r.asDict()
        for r in queries["q_forecast_holt"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["m"] = o["o_orderdate"].dt.strftime("%Y-%m")
    a, b = 0.5, 0.25
    for pr, grp in o.groupby("o_orderpriority"):
        vs = [float(v) for v in grp.groupby("m").size().sort_index()]
        if len(vs) < 3:
            assert pr not in got
            continue
        l, t = vs[0], vs[1] - vs[0]
        for x in vs[2:]:
            nl = a * x + (1 - a) * (l + t)
            t = b * (nl - l) + (1 - b) * t
            l = nl
        row = got[pr]
        assert row["n_months"] == len(vs)
        assert row["level_fp"] == _fp(l)
        assert row["trend_fp"] == _fp(t)
        for h in (1, 2, 3):
            assert row[f"fc{h}_fp"] == _fp(l + h * t)


def test_knn_classify_matches_bruteforce(spark, queries):
    import numpy as np

    got = {
        r["query_id"]: r.asDict()
        for r in queries["q_knn_classify"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.array([np.asarray(e, dtype=float) for e in emb["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    for qid in (0, 1, 2, 3, 4):
        qi = int(np.where(ids == qid)[0][0])
        cos = mat @ mat[qi] / (norms * norms[qi])
        cand = [
            (round(float(c), 8), int(i))
            for c, i in zip(cos, ids)
            if i != qid
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        top = cand[:10]
        votes: dict[int, int] = {}
        for _, vid in top:
            lab = int(labels[ids == vid][0])
            votes[lab] = votes.get(lab, 0) + 1
        pred = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        row = got[qid]
        assert row["pred_label"] == pred
        assert row["n_votes"] == votes[pred]
        assert row["true_label"] == int(labels[ids == qid][0])
        assert row["correct"] == int(pred == row["true_label"])


def test_iceberg_orphans_keeps_historical_files(spark, tmp_path):
    """Files referenced ONLY by historical snapshots survive orphan
    cleanup (they belong to expire_snapshots, not orphan removal)."""
    from pyspark_excel_datasource_spark.catalog import table as _t
    from pyspark_excel_datasource_spark.sources.iceberg import (
        read_iceberg,
        remove_orphan_files,
        write_iceberg,
    )

    out = str(tmp_path / "t")
    o = _t(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_iceberg(spark, o.filter(F.col("o_orderkey") % 2 == 0), out)
    # OVERWRITE drops the first snapshot's files from the current view
    write_iceberg(
        spark, o.filter(F.col("o_orderkey") % 2 != 0), out, mode="overwrite"
    )
    assert remove_orphan_files(out, retention_seconds=0.0) == 0
    # time travel to the first snapshot still works
    import json

    meta = os.path.join(out, "metadata")
    vh = open(os.path.join(meta, "version-hint.text")).read().strip()
    md = json.load(open(os.path.join(meta, f"v{vh}.metadata.json")))
    first = min(s["snapshot-id"] for s in md["snapshots"])
    assert read_iceberg(spark, out, snapshot_id=first).count() > 0


def test_agg_bitmap_matches_count_distinct(spark, queries):
    got = {
        r["o_orderstatus"]: (r["n_orders"], r["n_cust"])
        for r in queries["q_agg_bitmap"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    for st, grp in o.groupby("o_orderstatus"):
        assert got[st] == (len(grp), grp["o_custkey"].nunique())


def test_fn_higher_order_semantics(spark, queries):
    rows = queries["q_fn_higher_order"](spark, SF).collect()
    for r in rows[:20]:
        k = r["s_suppkey"]
        xs = [(k * i) % 97 for i in range(1, 2 + k % 7)]
        assert r["n"] == len(xs)
        assert r["doubled"] == ",".join(str(x * 2) for x in xs)
        assert r["n_even"] == sum(1 for x in xs if x % 2 == 0)
        assert r["any_gt50"] == any(x > 50 for x in xs)
        assert r["all_ge10"] == all(x >= 10 for x in xs)
        assert r["sum_sq"] == sum(x * x for x in xs)
        assert r["zip_sums"] == ",".join(
            str(a + b) for a, b in zip(xs, reversed(xs))
        )


def test_delta_timestamp_travel_resolution(spark, tmp_path):
    import time

    from pyspark_excel_datasource_spark.catalog import table as _t
    from pyspark_excel_datasource_spark.sources.deltalog import (
        read_delta,
        version_at_timestamp,
        write_delta,
    )

    out = str(tmp_path / "t")
    o = _t(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    t_before = int(time.time() * 1000) - 10
    write_delta(spark, o.limit(10), out)
    time.sleep(0.05)
    t_mid = int(time.time() * 1000)
    time.sleep(0.05)
    write_delta(spark, o.limit(30), out, mode="append")
    t_after = int(time.time() * 1000) + 10
    assert version_at_timestamp(out, t_mid) == 0
    assert version_at_timestamp(out, t_after) == 1
    assert read_delta(spark, out, timestamp_ms=t_mid).count() == 10
    assert read_delta(spark, out, timestamp_ms=t_after).count() == 40
    with pytest.raises(ValueError, match="predates"):
        version_at_timestamp(out, t_before)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, out, version=0, timestamp_ms=t_mid)


def test_iceberg_timestamp_travel_resolution(spark, tmp_path):
    from pyspark_excel_datasource_spark.catalog import table as _t
    from pyspark_excel_datasource_spark.sources.iceberg import (
        read_iceberg,
        snapshot_at_timestamp,
        write_iceberg,
    )

    out = str(tmp_path / "t")
    o = _t(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_iceberg(spark, o.limit(10), out)
    write_iceberg(spark, o.limit(30), out, mode="append")
    # deterministic clock: timestamp-ms == snapshot id (1, 2)
    assert snapshot_at_timestamp(out, 1) == 1
    assert snapshot_at_timestamp(out, 10**15) == 2
    assert read_iceberg(spark, out, timestamp_ms=1).count() == 10
    assert read_iceberg(spark, out, timestamp_ms=10**15).count() == 40
    with pytest.raises(ValueError, match="predates"):
        snapshot_at_timestamp(out, 0)


def test_delta_stats_summary_guard_rails(spark, tmp_path):
    from pyspark_excel_datasource_spark.catalog import table as _t
    from pyspark_excel_datasource_spark.sources.deltalog import (
        _commit,
        delete_where,
        snapshot,
        stats_summary,
        write_delta,
    )

    out = str(tmp_path / "t")
    o = _t(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_delta(spark, o.limit(100).repartition(2), out)
    n, mn, mx = stats_summary(out, "o_orderkey")
    rows = [r.o_orderkey for r in spark.read.parquet(out).collect()]
    assert (n, mn, mx) == (100, min(rows), max(rows))
    # a DV makes min/max unanswerable (count would still be exact)
    delete_where(spark, out, "o_orderkey % 5 = 0", mode="deletion-vectors")
    with pytest.raises(ValueError, match="deletion vectors"):
        stats_summary(out, "o_orderkey")
    # a statless re-add blocks metadata-only aggregation entirely
    out2 = str(tmp_path / "t2")
    write_delta(spark, o.limit(10).repartition(1), out2)
    snap = snapshot(out2)
    (rel,) = snap.files
    _commit(out2, snap.version + 1, [
        {"commitInfo": {"operation": "EXTERNAL"}},
        {"add": {"path": rel, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": False}},
    ])
    with pytest.raises(ValueError, match="without stats"):
        stats_summary(out2, "o_orderkey")


def test_iceberg_stats_summary_matches_scan(spark, tmp_path):
    from pyspark_excel_datasource_spark.catalog import table as _t
    from pyspark_excel_datasource_spark.sources.iceberg import (
        read_iceberg,
        stats_summary_iceberg,
        write_iceberg,
    )

    out = str(tmp_path / "t")
    o = _t(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_iceberg(spark, o.limit(60).repartition(2), out)
    write_iceberg(spark, o.limit(100).repartition(2), out, mode="append")
    n, mn, mx = stats_summary_iceberg(out, "o_orderkey")
    rows = [r.o_orderkey for r in read_iceberg(spark, out).collect()]
    assert (n, mn, mx) == (len(rows), min(rows), max(rows))
    with pytest.raises(ValueError, match="unknown column"):
        stats_summary_iceberg(out, "nope")


def test_delta_timestamp_travel_commitinfo_not_first(spark, tmp_path):
    """A foreign log may order commitInfo ANYWHERE in the commit JSON;
    version_at_timestamp must still use its embedded timestamp rather
    than falling back to file mtime (which a backup/restore resets)."""
    import json as _json
    import os as _os
    import time

    from pyspark_excel_datasource_spark.catalog import table as _t
    from pyspark_excel_datasource_spark.sources.deltalog import (
        version_at_timestamp,
        write_delta,
    )

    out = str(tmp_path / "t")
    o = _t(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_delta(spark, o.limit(10), out)
    time.sleep(0.05)
    t_mid = int(time.time() * 1000)
    time.sleep(0.05)
    write_delta(spark, o.limit(30), out, mode="append")
    # rewrite BOTH commits foreign-style: commitInfo moved to the LAST
    # line, then smash the mtimes (simulated backup restore)
    for v in (0, 1):
        p = _os.path.join(out, "_delta_log", f"{v:020d}.json")
        acts = [
            _json.loads(ln)
            for ln in open(p, encoding="utf-8")
            if ln.strip()
        ]
        acts.sort(key=lambda a: "commitInfo" in a)  # commitInfo last
        assert "commitInfo" in acts[-1] and "commitInfo" not in acts[0]
        with open(p, "w", encoding="utf-8") as fh:
            for a in acts:
                fh.write(_json.dumps(a) + "\n")
        _os.utime(p, (0, 0))  # mtime -> 1970: mtime fallback would say v0
    assert version_at_timestamp(out, t_mid) == 0
    assert version_at_timestamp(out, int(time.time() * 1000) + 10) == 1
