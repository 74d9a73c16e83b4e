"""Semantic + plan tests for the event-analytics operators
(operators/analytics.py). Cross-engine value parity is covered by the
oracle gate (tools/run_parity.py); these tests pin the invariants the
oracle can't see — session monotonicity, funnel ordering, plan shape."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.plans.registry import load_all_queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_sessionize_invariants(spark):
    qs = load_all_queries()
    rows = qs["q_sessionize"](spark, SF).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
        assert r.span_sec >= 0
        by_user.setdefault(r.user_id, []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r.session_seq)
        # seqs are 1..n dense, and consecutive sessions are separated by
        # more than the 6 h gap threshold
        assert [s.session_seq for s in sessions] == list(
            range(1, len(sessions) + 1)
        )
        for a, b in zip(sessions, sessions[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > 6 * 3600, (a, b)


def test_funnel_is_monotone_and_single_shuffle(spark):
    qs = load_all_queries()
    df = qs["q_funnel"](spark, SF)
    rows = {r.step: r for r in df.collect()}
    assert [rows[i].event_type for i in (1, 2, 3, 4)] == [
        "signup",
        "view",
        "click",
        "purchase",
    ]
    users = [rows[i].users for i in (1, 2, 3, 4)]
    assert users == sorted(users, reverse=True), users
    assert users[0] > 0
    # the funnel is join-free: each step's frontier is a conditional MIN
    # window over the SAME user_id partitioning, so the event log is
    # scanned once and EnsureRequirements inserts exactly one big-side
    # exchange for all four chained Window passes. (Exchange text is
    # AQE-reuse-sensitive, so assert the structure: no joins, one scan
    # node id, four Windows.)
    import re

    final = _plan(df).split("Initial Plan")[0]
    assert "Join" not in final, final
    scan_ids = set(re.findall(r"Scan parquet\s*\((\d+)\)", final))
    assert len(scan_ids) == 1, final
    window_ids = set(re.findall(r"\bWindow \((\d+)\)", final))
    assert len(window_ids) == 4, final


def test_retention_week_zero_covers_all_users(spark):
    qs = load_all_queries()
    rows = qs["q_retention"](spark, SF).collect()
    week0 = sum(r.active_users for r in rows if r.week_offset == 0)
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # each user belongs to exactly one cohort and is by construction
    # active in that cohort's week 0
    assert week0 == n_users
    assert all(r.week_offset >= 0 for r in rows)


def test_scd2_intervals_partition_user_history(spark):
    qs = load_all_queries()
    rows = qs["q_scd2_intervals"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev_counts = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for uid, ivals in by_user.items():
        ivals.sort(key=lambda r: r.valid_from)
        # intervals chain: valid_to == next valid_from; one open interval
        open_ivals = [r for r in ivals if r.valid_to is None]
        assert len(open_ivals) == 1
        for a, b in zip(ivals, ivals[1:]):
            assert a.valid_to == b.valid_from
        # runs partition the user's events exactly
        assert sum(r.n_events for r in ivals) == ev_counts[uid]
        # consecutive runs change type (else they'd be one run)
        for a, b in zip(ivals, ivals[1:]):
            assert a.event_type != b.event_type


def test_stratified_sample_respects_thresholds(spark):
    qs = load_all_queries()
    rows = qs["q_sample_stratified"](spark, SF).collect()
    assert rows
    for r in rows:
        limit = "80" if r.lang == "en" else "40"
        assert r.bucket_hex < limit
    # deterministic: same rows on re-run
    again = {(r.doc_id, r.lang) for r in qs["q_sample_stratified"](spark, SF).collect()}
    assert {(r.doc_id, r.lang) for r in rows} == again


def test_hll_estimates_bracket_exact_counts(spark):
    """Round 6 made q_agg_hll self-auditing: it emits the exact distinct
    count plus a within_bounds verdict. Pin the exact side against an
    independent computation and require every verdict TRUE."""
    qs = load_all_queries()
    rows = {
        r.event_type: r for r in qs["q_agg_hll"](spark, SF).collect()
    }
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert set(rows) == set(exact)
    for k, r in rows.items():
        assert r.exact_users == exact[k], (k, r, exact[k])
        assert r.within_bounds, (k, r)


def test_incremental_dedup_lsh_matches_exact(spark):
    """The RAW banded-probe scale path (helper — the registered flagship
    now emits the exact pairs plus its in-plan verdict) must find the
    same cross-set pairs as the exact inverted-index baseline on this
    corpus (planted near-dups have jaccard ≥ 0.5, well above the
    banding knee)."""
    from pyspark_excel_datasource_spark.operators import dedup

    qs = load_all_queries()
    exact = {
        (r.new_id, r.corpus_id)
        for r in qs["q_dedup_incremental"](spark, SF).collect()
    }
    lsh = {
        (r.new_id, r.corpus_id)
        for r in dedup.incremental_lsh_pairs(spark, SF).collect()
    }
    assert exact, "fixture should contain cross-set near-dups"
    assert lsh == exact
    # the converted flagship: exact pairs + an all-TRUE verdict
    flag = qs["q_dedup_incremental_lsh"](spark, SF).collect()
    assert {(r.new_id, r.corpus_id) for r in flag} == exact
    assert all(r.band_recall_ok for r in flag)


def test_fill_forward_semantics(spark):
    qs = load_all_queries()
    filled = {r.event_id: r.value_filled for r in qs["q_fill_forward"](spark, SF).collect()}
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("event_id", "user_id", "ts", "event_type", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    last_valid: dict[int, float] = {}
    for r in ev:
        if r.event_type != "error":
            last_valid[r.user_id] = r.value
        expect = last_valid.get(r.user_id)
        assert filled[r.event_id] == expect, (r.event_id, filled[r.event_id], expect)


def test_anomaly_zscore_flags_only_outliers(spark):
    import statistics

    qs = load_all_queries()
    rows = qs["q_anomaly_zscore"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    stats = {
        t: (statistics.fmean(v), statistics.stdev(v)) for t, v in by_type.items()
    }
    flagged = {r.event_id for r in rows}
    for r in rows:
        mu, sigma = stats[r.event_type]
        assert abs((r.value - mu) / sigma) > 2.4, r  # rounding slack
    # no obvious outlier missed (|z| > 2.6 clears the rounded threshold)
    for r in ev:
        mu, sigma = stats[r.event_type]
        if abs((r.value - mu) / sigma) > 2.6:
            assert r.event_id in flagged, r


def test_pattern_sequence_hits_are_consecutive(spark):
    qs = load_all_queries()
    hits = qs["q_pattern_sequence"](spark, SF).collect()
    seq: dict[int, list] = {}
    for r in sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    ):
        seq.setdefault(r.user_id, []).append((r.event_id, r.event_type))
    expected = set()
    for uid, evs in seq.items():
        for i in range(len(evs) - 2):
            if [e[1] for e in evs[i : i + 3]] == ["view", "click", "purchase"]:
                expected.add((uid, evs[i][0]))
    assert {(r.user_id, r.start_event_id) for r in hits} == expected
    assert expected, "fixture should contain at least one pattern hit"
