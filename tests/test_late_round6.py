"""Unit tests for the late round-6 operators (incremental aggregate
maintenance, Luhn-validated PII)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()[name]


def _luhn(num: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(num), start=1):
        d = int(ch)
        total += d if i % 2 == 1 else (d * 2 - 9 if d * 2 > 9 else d * 2)
    return total % 10 == 0


def test_pii_luhn_matches_reference_implementation(spark):
    rows = _q("q_pii_luhn")(spark, SF).limit(50).collect()
    assert rows
    for r in rows:
        assert len(r.card_candidate) == 16
        assert r.luhn_valid == _luhn(r.card_candidate)
        assert r.masked == "X" * 12 + r.card_candidate[-4:]
    # the synthesized population must contain both classes
    full = _q("q_pii_luhn")(spark, SF).agg(
        F.sum(F.col("luhn_valid").cast("int")).alias("ok"),
        F.count("*").alias("n"),
    ).first()
    assert 0 < full.ok < full.n


def test_agg_incremental_merge_equals_full_recompute(spark):
    merged = _q("q_agg_incremental")(spark, SF)
    direct = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
        )
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_agg_incremental_reuses_snapshot(spark):
    """The second invocation must read the stored state, not rebuild it —
    the snapshot directory's mtime may not change across a rerun."""
    import os

    from pyspark_excel_datasource_spark.sources.excel_queries import _fixture_dir

    _q("q_agg_incremental")(spark, SF).collect()
    snap = os.path.join(_fixture_dir(SF), "orders_agg_snapshot", "_SUCCESS")
    before = os.path.getmtime(snap)
    _q("q_agg_incremental")(spark, SF).collect()
    assert os.path.getmtime(snap) == before


def test_ab_ttest_matches_numpy_welch(spark):
    """t statistics must agree with an unquantized numpy Welch t-test to
    ~1e-3 (the fixed-point quantization bound)."""
    import numpy as np
    import pyarrow.parquet as pq

    out = {r.event_type: r for r in _q("q_ab_ttest")(spark, SF).collect()}
    tbl = pq.read_table(f"{SF}/events.parquet").to_pandas()
    for et, grp in tbl.groupby("event_type"):
        a = grp.loc[grp.user_id % 2 == 0, "value"].to_numpy()
        b = grp.loc[grp.user_id % 2 == 1, "value"].to_numpy()
        t_ref = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        r = out[et]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert abs(float(r.t_stat) - t_ref) < 1e-3
        assert r.significant == (abs(t_ref) > 1.96)


def test_path_topk_paths_are_ordered_sessions(spark):
    rows = _q("q_path_topk")(spark, SF).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.path for r in rows)


def test_spatial_grid_pairs_exactly_once(spark):
    """Grid banding must emit each qualifying pair exactly once (the
    home-cell meeting-point trick), never the symmetric twin, and every
    emitted pair must satisfy the exact radius predicate."""
    rows = _q("q_join_spatial_grid")(spark, SF).collect()
    assert rows
    keys = [(r.pid_a, r.pid_b) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
    assert all(r.d2 <= 250000 for r in rows)


def test_fuzzy_match_blocking_is_lossless_for_same_noun(spark):
    """Every pair the blocked plan emits must be a genuine near-match,
    symmetric-free, and consistent with a brute-force scan restricted to
    the same blocking key."""
    rows = _q("q_fuzzy_match")(spark, SF).collect()
    assert rows
    keys = {(r.name_a, r.name_b) for r in rows}
    assert len(keys) == len(rows)
    for r in rows:
        assert r.name_a < r.name_b
        assert r.editdist <= 3
        assert r.name_a.rsplit(" ", 1)[-1] == r.block_key
        assert r.name_b.rsplit(" ", 1)[-1] == r.block_key


def test_mix_temperature_weights_sum_to_one_and_flatten(spark):
    """Weights must (a) normalize, (b) sit between raw-proportional and
    uniform — the whole point of temperature scaling."""
    rows = _q("q_mix_temperature")(spark, SF).collect()
    assert rows
    ws = [float(r.weight) for r in rows]
    assert abs(sum(ws) - 1.0) < 1e-6
    total = sum(r.n_tokens for r in rows)
    for r, w in zip(rows, ws):
        raw = r.n_tokens / total
        uniform = 1.0 / len(rows)
        lo, hi = sorted((raw, uniform))
        assert lo - 1e-9 <= w <= hi + 1e-9


def test_rank_fusion_prefers_docs_on_both_lists(spark):
    """RRF sanity: a doc on both lists must outscore any doc appearing on
    only one list at an equal-or-worse rank, and ranks must be consistent
    with the standalone BM25 ranking."""
    rows = _q("q_rank_fusion")(spark, SF).collect()
    assert len(rows) > 0
    both = [r for r in rows if r.lex_rank is not None and r.vec_rank is not None]
    single = [r for r in rows if (r.lex_rank is None) != (r.vec_rank is None)]
    for r in rows:
        expect = 0.0
        if r.lex_rank is not None:
            expect += 1.0 / (60 + r.lex_rank)
        if r.vec_rank is not None:
            expect += 1.0 / (60 + r.vec_rank)
        assert abs(float(r.rrf) - expect) < 1e-8
    if both and single:
        assert max(float(r.rrf) for r in both) > min(
            float(r.rrf) for r in single
        )
    bm = {r.doc_id: i + 1 for i, r in enumerate(_q("q_bm25")(spark, SF).collect())}
    for r in rows:
        if r.lex_rank is not None and r.doc_id in bm and r.lex_rank <= 20:
            assert bm[r.doc_id] == r.lex_rank


def test_bpe_encode_bounds_and_known_word(spark):
    rows = _q("q_bpe_encode")(spark, SF).collect()
    assert rows
    for r in rows[:100]:
        # merges only ever shrink the symbol sequence; never below 1/word
        assert r.n_words <= r.n_tokens
        assert abs(r.fertility - r.n_tokens / r.n_words) < 1e-12
    # "the" must collapse to ONE token via the chained t h -> th -> the
    one = spark.createDataFrame([(1, "the the")], "doc_id long, text string")
    from pyspark_excel_datasource_spark.operators.corpus import _SPARK_TOKENS

    enc = one.select(
        F.expr(f"transform(split(text, ' '), w -> {_SPARK_TOKENS})").alias("t")
    ).first()
    assert enc.t == ["the", "the"]


def test_skyline_pareto_matches_bruteforce(spark):
    out = {(r.qx, r.n_chars) for r in _q("q_skyline_pareto")(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        (
            F.size(F.array_distinct(F.split("text", " "))).cast("double")
            / F.size(F.split("text", " "))
        ).alias("q"),
        F.col("n_chars").cast("long").alias("l"),
    ).collect()
    pts = {(d.q, d.l) for d in docs}
    frontier = {
        (q, l)
        for (q, l) in pts
        if not any(
            bq >= q and bl >= l and (bq > q or bl > l) for (bq, bl) in pts
        )
    }
    got = {(float(q), l) for (q, l) in out}
    want = {(round(q, 9), l) for (q, l) in frontier}
    assert {(round(q, 9), l) for (q, l) in got} == want


def test_dedup_cross_source_census_is_consistent(spark):
    rows = _q("q_dedup_cross_source")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_kept for r in rows) == n_distinct
    for r in rows:
        assert r.n_docs == r.n_kept + r.n_dropped


def test_late_data_audit_invariants(spark):
    rows = _q("q_late_data_audit")(spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    assert any(r.n_late > 0 for r in rows)  # delay chosen to populate both
    assert any(r.n_late < r.n_events for r in rows)
    for r in rows:
        assert 0 <= r.n_late <= r.n_events
        assert abs(r.late_frac - r.n_late / r.n_events) < 1e-12
        assert (r.max_late_s >= 0) == (r.n_late > 0)


def test_embed_norm_stats_sane(spark):
    rows = _q("q_embed_norm")(spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == 64
    for r in rows:
        assert r.n == n_vecs
        assert float(r.std) >= 0
        # 3-sigma outliers must be rare under any sane distribution
        assert r.n_outliers <= 0.05 * r.n


def test_curriculum_interleave_schedule_contract(spark):
    rows = _q("q_curriculum_interleave")(spark, SF).collect()
    assert len({r.sched_pos for r in rows}) == len(rows)  # total order
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.src_rank)
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # two-level rank must equal the naive per-source length order
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    ).collect()
    want = {}
    for src in by_src:
        ordered = sorted(
            (d for d in docs if d.source == src),
            key=lambda d: (d.n_chars, d.doc_id),
        )
        for i, d in enumerate(ordered, start=1):
            want[d.doc_id] = i
    for r in rows:
        assert r.src_rank == want[r.doc_id]


def test_rolling_dau_matches_naive_recompute(spark):
    rows = {r.day: r.dau7 for r in _q("q_rolling_dau")(spark, SF).collect()}
    from pyspark_excel_datasource_spark.catalog import table as _t

    ev = _t(spark, SF, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).collect()
    import datetime

    days = sorted({e.day for e in ev})
    lo, hi = days[0], days[-1]
    d = lo
    while d <= hi:
        active = {
            e.user_id
            for e in ev
            if d - datetime.timedelta(days=6) <= e.day <= d
        }
        if active:
            assert rows.get(d) == len(active), d
        else:
            assert d not in rows
        d += datetime.timedelta(days=1)


def test_compaction_plan_bins_respect_target(spark):
    rows = _q("q_compaction_plan")(spark, SF).collect()
    # reconstruct the next-fit order and check each bin's exclusive start
    ordered = sorted(rows, key=lambda r: (-r.bytes, r.source, r.lang))
    cum = 0
    for r in ordered:
        assert r.bin == cum // 200_000
        cum += r.bytes


def test_q2ish_winner_is_groupwise_min(spark):
    rows = _q("q_tpch_q2ish")(spark, SF).collect()
    assert rows
    assert len({r.p_partkey for r in rows}) == len(rows)  # one winner/part


def test_q20ish_thresholds_hold(spark):
    rows = _q("q_tpch_q20ish")(spark, SF).collect()
    for r in rows:
        assert r.n_heavy_parts >= 1
        assert r.total_qty > 30 * 0  # qty sums positive
        assert r.n_name in {"NATION_3", "NATION_7", "NATION_11"}


def test_scan_text_roundtrip_lossless(spark):
    got = _q("q_scan_text")(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.length("text") >= 200
    )
    assert got.count() == docs.count()


def test_sink_text_census_exact(spark):
    rows = {r.lang: (r.n_docs, r.total_chars)
            for r in _q("q_sink_text")(spark, SF).collect()}
    want = {
        r.lang: (r.n, r.t)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("t"))
        .collect()
    }
    assert rows == want


def test_inverted_index_postings_contract(spark):
    rows = _q("q_inverted_index")(spark, SF).collect()
    assert rows
    for r in rows[:50]:
        posts = r.top_postings.split(",")
        assert 1 <= len(posts) <= 5
        tfs = [int(p.split(":")[1]) for p in posts]
        assert tfs == sorted(tfs, reverse=True)  # ranked by tf desc
        assert r.df >= 2
        assert r.total_tf >= sum(tfs)


def test_strip_boilerplate_census(spark):
    rows = _q("q_strip_boilerplate")(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    assert any(r.n_dropped > 0 for r in rows)  # boilerplate exists
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_segs
        assert len(r.cleaned_hash) == 32


def test_asof_nearest_matches_bruteforce(spark):
    got = {r.event_id: (r.nearest_click, r.side, r.gap_s)
           for r in _q("q_join_asof_nearest")(spark, SF).collect()}
    from pyspark_excel_datasource_spark.catalog import table as _t

    ev = _t(spark, SF, "events").select("event_id", "user_id", "ts",
                                        "event_type").collect()
    clicks = {}
    for e in ev:
        if e.event_type == "click":
            clicks.setdefault(e.user_id, []).append(e.ts)
    for e in ev:
        if e.event_type != "purchase":
            continue
        cs = clicks.get(e.user_id, [])
        back = max((c for c in cs if c < e.ts), default=None)
        fwd = min((c for c in cs if c > e.ts), default=None)
        if back is None and fwd is None:
            want = (None, "none", -1)
        elif fwd is None or (back is not None
                             and e.ts - back <= fwd - e.ts):
            want = (back, "prior", int((e.ts - back).total_seconds()))
        else:
            want = (fwd, "later", int((fwd - e.ts).total_seconds()))
        assert got[e.event_id] == want, e.event_id


def test_weighted_median_matches_bruteforce(spark):
    rows = {r.flag: r.median_price
            for r in _q("q_weighted_median")(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    import collections

    groups = collections.defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append((r.l_extendedprice, int(r.l_quantity)))
    for flag, vw in groups.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= total:
                assert rows[flag] == f"{v:.2f}", flag
                break


def test_profile_table_exact(spark):
    rows = {r.col: r for r in _q("q_profile_table")(spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = d.count()
    assert rows["doc_id"].n_nulls == 0
    assert rows["doc_id"].n_distinct == n
    assert rows["lang"].n_distinct == d.select("lang").distinct().count()
    assert int(rows["n_chars"].min_value) <= int(rows["n_chars"].max_value)
    assert set(rows) == {"doc_id", "lang", "source", "n_chars", "text_len"}


def test_join_pit_no_future_leakage(spark):
    rows = _q("q_join_pit")(spark, SF).collect()
    assert rows
    n_purch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purch  # every purchase matched exactly once
    for r in rows:
        assert r.state_since <= r.purchase_ts  # never a future state
        assert r.state_age_s >= 0


def test_funnel_ttc_shares_sum_to_one(spark):
    rows = _q("q_funnel_ttc")(spark, SF).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert all(-1 <= r.bucket_h <= 48 for r in rows)


def test_seasonal_baseline_cells_and_anomaly_rate(spark):
    rows = _q("q_seasonal_baseline")(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sum(r.n for r in rows) == ev.count()
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert {r.event_type for r in rows} == types
    for r in rows:
        assert 0 <= r.dow <= 6
        assert float(r.std) >= 0
        assert r.n_anomalies <= max(2, 0.05 * r.n)  # 3-sigma is rare


def test_observe_metrics_counters_match_recompute(spark):
    from pyspark_excel_datasource_spark.operators.pipeline import (
        observed_quality_filter,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    filtered, obs = observed_quality_filter(d)
    kept_rows = filtered.count()  # action materializes the observation
    m = obs.get
    assert m["rows_in"] == d.count()
    assert m["rows_kept"] == kept_rows
    want_chars = (
        d.filter(F.col("n_chars") >= 150)
        .agg(F.sum("n_chars"))
        .first()[0]
    )
    assert m["chars_kept"] == want_chars


def test_scan_file_lineage_reports_real_file(spark):
    rows = _q("q_scan_file_lineage")(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.file_name == "documents.parquet"
    assert r.n_rows == spark.read.parquet(f"{SF}/documents.parquet").count()


def test_text_sentiment_label_consistency(spark):
    rows = _q("q_text_sentiment")(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    labels = {r.label for r in rows}
    assert labels <= {"pos", "neg", "neutral"}
    assert len(labels) >= 2  # the corpus contains both polarities
    for r in rows[:100]:
        assert (r.polarity > 0) == (r.label == "pos")
        assert (r.polarity < 0) == (r.label == "neg")
        assert r.n_hits >= abs(r.polarity)


def test_trajectory_topk_contract(spark):
    rows = _q("q_trajectory_topk")(spark, SF).collect()
    assert {r.q_user for r in rows} == {0, 1, 2}
    for qu in (0, 1, 2):
        sub = sorted((r for r in rows if r.q_user == qu), key=lambda r: r.rank)
        assert [r.rank for r in sub] == list(range(1, len(sub) + 1))
        coss = [float(r.cos) for r in sub]
        assert coss == sorted(coss, reverse=True)
        assert all(-1.0 <= c <= 1.0 + 1e-9 for c in coss)
        assert all(r.c_user != qu for r in sub)


def test_null_safe_join_matches_null_bucket(spark):
    rows = _q("q_join_null_safe")(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_null_facts = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    null_tags = {r.tag for r in rows
                 if r.o_orderkey % 7 == 0}
    # every NULL-keyed fact matched each of the 10 NULL dim rows
    got_null_rows = sum(1 for r in rows if r.o_orderkey % 7 == 0)
    assert got_null_rows == n_null_facts * 10
    assert null_tags == {f"grp_{g}" for g in range(0, 100, 10)}


def test_content_chunking_boundaries_follow_content(spark):
    rows = {r.doc_id: r for r in _q("q_content_chunking")(spark, SF).collect()}
    docs = {r.doc_id: r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    import hashlib

    for doc_id in list(docs)[:50]:
        codes = [ord(c) for c in docs[doc_id]]
        bnd = [
            i
            for i in range(4, len(codes) + 1)
            if (codes[i - 4] * 29791 + codes[i - 3] * 961
                + codes[i - 2] * 31 + codes[i - 1]) % 64 == 0
        ]
        r = rows[doc_id]
        assert r.n_bytes == len(codes)
        assert r.n_chunks == len(bnd) + 1
        want = hashlib.md5(",".join(map(str, bnd)).encode()).hexdigest()
        assert r.layout_hash == want


def test_chunk_dedup_census_consistent_with_chunking(spark):
    census = {r.source: r for r in _q("q_chunk_dedup")(spark, SF).collect()}
    per_doc = _q("q_content_chunking")(spark, SF).collect()
    docs = {r.doc_id: r.source
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    import collections

    want_chunks = collections.Counter()
    want_bytes = collections.Counter()
    for r in per_doc:
        src = docs[r.doc_id]
        want_chunks[src] += r.n_chunks
        want_bytes[src] += r.n_bytes
    for src, r in census.items():
        assert r.n_chunks == want_chunks[src]
        assert r.total_bytes == want_bytes[src]
        assert 0 <= r.uniq_chunks <= r.n_chunks
        assert abs(r.dup_ratio - (1 - r.uniq_chunks / r.n_chunks)) < 1e-12
    assert any(r.dup_ratio > 0 for r in census.values())


def test_sample_coordinated_join_consistent(spark):
    r = _q("q_sample_coordinated")(spark, SF).first()
    assert r.n_orphans == 0  # membership is a pure function of the key
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert 0 < r.n_customers < 0.25 * n_cust  # ~10% sample actually sampled


def test_quantile_normalize_preserves_order_and_marginals(spark):
    rows = _q("q_quantile_normalize")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.count()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.n_chars, r.doc_id, r.q_value))
    global_vals = sorted(r.n_chars for r in rows)
    for vals in by_src.values():
        vals.sort()
        qs = [q for _, _, q in vals]
        assert qs == sorted(qs)  # monotone map within source
        assert qs[0] == global_vals[0]  # rank-1 maps to the global min
        assert qs[-1] == global_vals[-1]  # top rank maps to the global max


def test_dedup_chunks_pairs_are_real_neighbors(spark):
    rows = _q("q_dedup_chunks")(spark, SF).collect()
    assert rows
    docs = {r.doc_id: r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}

    def chunk_set(text):
        codes = [ord(c) for c in text]
        bnd = [
            i + 1
            for i in range(4, len(codes) + 1)
            if (codes[i - 4] * 29791 + codes[i - 3] * 961
                + codes[i - 2] * 31 + codes[i - 1]) % 64 == 0
        ]
        starts = [1] + bnd
        out = set()
        for j, st in enumerate(starts):
            en = starts[j + 1] if j + 1 < len(starts) else len(codes) + 1
            if en > st:
                out.add(text[st - 1 : en - 1])
        return out

    for r in rows[:10]:
        assert 0.5 <= r.containment <= 1.0 + 1e-12
        assert r.doc_a < r.doc_b
        ca, cb = chunk_set(docs[r.doc_a]), chunk_set(docs[r.doc_b])
        # the df cap can only REMOVE shared chunks from the candidate
        # count, so the reported shared is a lower bound of true overlap
        assert r.shared <= len(ca & cb)
        assert abs(r.containment - r.shared / len(ca)) < 1e-12


def test_pipeline_corpus_v2_stages_compose(spark):
    rows = _q("q_pipeline_corpus_v2")(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < len(rows) < n_docs  # every stage filtered something
    assert len({r.sched_pos for r in rows}) == len(rows)  # total order
    assert all(r.n_chars >= 150 for r in rows)


def test_win_ntile_quartiles_balanced(spark):
    rows = _q("q_win_ntile")(spark, SF).collect()
    import collections

    per_supp = collections.defaultdict(collections.Counter)
    for r in rows:
        per_supp[r.l_suppkey][r.price_quartile] += 1
    for supp, c in per_supp.items():
        assert set(c) <= {1, 2, 3, 4}
        n = sum(c.values())
        if n >= 4:  # NTILE(4) bucket sizes differ by at most 1
            sizes = [c.get(q, 0) for q in (1, 2, 3, 4)]
            assert max(sizes) - min(sizes) <= 1


def test_transpose_orientation(spark):
    rows = _q("q_transpose")(spark, SF).collect()
    assert {r.key for r in rows} == {"n_orders", "n_high_value"}
    n_orders = next(r for r in rows if r.key == "n_orders")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want = dict(
        orders.groupBy("o_orderpriority").count().collect()
    )
    for p, n in want.items():
        assert n_orders[p] == n


def test_sink_excel_sheets_lossless(spark):
    rows = {r.o_orderpriority: (r.n_orders, r.total_price)
            for r in _q("q_sink_excel_sheets")(spark, SF).collect()}
    import pyspark.sql.functions as FF

    want = {
        r.o_orderpriority: (r.n, r.t)
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(
            FF.count("*").alias("n"),
            FF.sum(FF.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("t"),
        )
        .collect()
    }
    assert rows == want


def test_listagg_is_ordered(spark):
    rows = _q("q_agg_listagg")(spark, SF).collect()
    for r in rows:
        parts = r.statuses.split(",")
        assert parts == sorted(parts)
        assert len(parts) == r.n_statuses


def test_hll_union_verdicts_and_exact(spark):
    rows = {r.scope: r for r in _q("q_agg_hll_union")(spark, SF).collect()}
    assert all(r.est_in_bound for r in rows.values())
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert rows["ALL"].exact_distinct == (
        orders.select("o_custkey").distinct().count()
    )
    assert sum(1 for s in rows if s != "ALL") == 5


def test_stream_tws_always_registered(spark):
    """Graduated in round 12 (VERDICT r11 #3): the vendored protoshim
    demonstrably drives Spark's transformWithStateInPandas state server
    in this container, so the query registers UNCONDITIONALLY — the
    protobuf runtime (real or shim) must import, and the query must
    run, not hide behind an environment gate."""
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries
    from pyspark_excel_datasource_spark.streaming import tws

    assert tws._HAVE_TWS, "protobuf runtime (real or vendored shim) missing"
    assert "q_stream_tws" in load_all_queries()
    df = load_all_queries()["q_stream_tws"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_event_autocorr_in_range_and_matches_numpy(spark):
    rows = _q("q_event_autocorr")(spark, SF).collect()
    assert rows
    import collections

    import numpy as np

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    ).collect()
    daily = collections.Counter((e.event_type, e.day) for e in ev)
    series = collections.defaultdict(dict)
    for (t, d), c in daily.items():
        series[t][d] = c
    for r in rows:
        days = sorted(series[r.event_type])
        xs = [series[r.event_type][d] for d in days]
        x, y = np.array(xs[:-1], float), np.array(xs[1:], float)
        want = np.corrcoef(x, y)[0, 1]
        assert abs(float(r.lag1_autocorr) - want) < 1e-6
        assert -1.0 - 1e-9 <= float(r.lag1_autocorr) <= 1.0 + 1e-9


def test_session_entry_exit_census_sums(spark):
    rows = _q("q_session_entry_exit")(spark, SF).collect()
    from pyspark_excel_datasource_spark.operators.analytics import sessionize
    from pyspark_excel_datasource_spark.catalog import table as _t

    n_sessions = sessionize(_t(spark, SF, "events")).count()
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        # a bounce's entry IS its exit
        if r.entry_type != r.exit_type:
            assert r.n_bounces == 0


def test_rfm_segments_partition_customers(spark):
    rows = _q("q_rfm_segments")(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert len(r.segment) == 3
        assert set(r.segment) <= set("123")


def test_cohort_ltv_offset_zero_covers_all_customers(spark):
    rows = _q("q_cohort_ltv")(spark, SF).collect()
    zero = [r for r in rows if r.month_offset == 0]
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    # every customer is active in their own acquisition month
    assert sum(r.n_active for r in zero) == n_cust
    for r in rows:
        assert 0 <= r.month_offset < 12


def test_market_basket_lift_sanity(spark):
    rows = _q("q_market_basket")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab >= 3
        assert float(r.lift) > 0


def test_benford_counts_and_chi2(spark):
    rows = _q("q_benford_audit")(spark, SF).collect()
    n_orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_totalprice") >= 1.0).count()
    )
    assert sum(r.n_obs for r in rows) == n_orders
    assert {r.d for r in rows} <= set(range(1, 10))
    for r in rows:
        assert float(r.chi2_contrib) >= 0
        assert float(r.n_expected) > 0


def test_gini_matches_bruteforce(spark):
    r = _q("q_gini_concentration")(spark, SF).first()
    cents = sorted(
        int(row.c)
        for row in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)")).alias("c")
        )
        .collect()
    )
    n, total = len(cents), sum(cents)
    want = 2.0 * sum((i + 1) * x for i, x in enumerate(cents)) / (n * total) - (
        n + 1.0
    ) / n
    assert r.n_customers == n
    assert int(r.total_cents) == total
    assert abs(float(r.gini) - want) < 1e-9
    assert 0 <= float(r.gini) < 1


def test_peak_detection_peaks_are_local_maxima(spark):
    rows = _q("q_peak_detection")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.c > r.prev_c and r.c > r.next_c


def test_repurchase_intervals_cover_all_gaps(spark):
    rows = _q("q_repurchase_intervals")(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert r.gap_month_bucket * 30 <= r.min_days <= r.max_days
        assert r.max_days < (r.gap_month_bucket + 1) * 30


def test_hhi_bounds(spark):
    rows = _q("q_hhi_concentration")(spark, SF).collect()
    assert rows
    for r in rows:
        h = float(r.hhi)
        assert 1.0 / r.n_suppliers - 1e-9 <= h <= 1.0 + 1e-9


def test_seasonality_strength_in_unit_interval(spark):
    rows = _q("q_seasonality_strength")(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= float(r.r2) <= 1.0 + 1e-9


def test_abc_classes_partition_parts(spark):
    rows = {r.abc: r for r in _q("q_abc_classification")(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    total = sum(int(r.revenue_cents) for r in rows.values())
    assert int(rows["A"].revenue_cents) <= 0.8 * total + int(
        rows["A"].revenue_cents
    ) / rows["A"].n_parts  # A stops at the first part crossing 80%


def test_fulfillment_latency_covers_shipped_orders(spark):
    rows = _q("q_fulfillment_latency")(spark, SF).collect()
    n_shipped_orders = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey").distinct().count()
    )
    assert sum(r.n_orders for r in rows) == n_shipped_orders
    for r in rows:
        assert r.min_days <= r.max_days
        assert 0 <= r.n_within_week <= r.n_orders


def test_return_rates_consistent(spark):
    rows = _q("q_return_rates")(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r.n_lines for r in rows) == li.count()
    total_ret = li.filter(F.col("l_returnflag") == "R").count()
    assert sum(r.n_returned for r in rows) == total_ret
    for r in rows:
        assert abs(r.return_rate - r.n_returned / r.n_lines) < 1e-12
