"""The driver's correctness gate walks queries() in order with a cutoff
(rounds 1-3: exactly the first 50). These tests pin the window composition so
a refactor can't silently push a gate-critical query out of it."""

from __future__ import annotations


def _ordered_names():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return list(load_all_queries())


def test_priority_names_all_registered():
    from pyspark_excel_datasource_spark.plans.registry import (
        _DEPRIORITIZED,
        _PRIORITY,
        load_all_queries,
    )

    registered = set(load_all_queries())
    missing = [n for n in (*_PRIORITY, *_DEPRIORITIZED) if n not in registered]
    assert not missing, f"priority list references unregistered queries: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate priority entries"
    assert not set(_PRIORITY) & set(_DEPRIORITIZED)


def test_probes_trail_the_ordering():
    names = _ordered_names()
    assert all(n.startswith("q_probe_dec_") for n in names[-6:])
    assert not any(n.startswith("q_probe_dec_") for n in names[:-6])


def test_round4_window_composition():
    names = set(_ordered_names()[:50])
    # round-3 failures repaired this round — need fresh driver verdicts
    repaired = {
        "q_fn_math", "q_text_tfidf", "q_sim_topk",
        "q_fn_json", "q_fn_map", "q_cte",
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
        "q_stream_watermark", "q_stream_dedup",
        "q_sessionize", "q_funnel", "q_retention", "q_scd2_intervals",
        "q_rollup_hierarchical", "q_anomaly_zscore", "q_fill_forward",
        "q_pattern_sequence", "q_stream_enrich", "q_ewma",
        "q_event_transitions", "q_join_dpp", "q_win_median",
    }
    # SURVEY §2.3 core ops rotating in for first-time verdicts
    first_time = {
        "q_scan_parquet", "q_project", "q_filter_basic", "q_filter_complex",
        "q_join_inner", "q_join_left", "q_join_right", "q_join_full",
        "q_join_semi", "q_join_anti", "q_join_asof",
        "q_agg_group", "q_agg_stats", "q_agg_rollup", "q_agg_gsets",
        "q_dedup_exact", "q_win_rank", "q_win_analytic", "q_sort_multi",
        "q_topk", "q_topk_group", "q_union_all", "q_union_dist",
        "q_intersect", "q_except", "q_fn_string",
    }
    out = (repaired | first_time) - names
    assert not out, f"gate-critical queries fell out of the first 50: {out}"
    assert len(repaired | first_time) == 50


def test_every_oracle_has_a_query():
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = load_all_queries()
    assert all(k in qs for k in ORACLES)
