"""The driver's correctness gate walks queries() in order with a cutoff
(round 1: exactly the first 50). These tests pin the window composition so
a refactor can't silently push a gate-critical query out of it."""

from __future__ import annotations


def _ordered_names():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return list(load_all_queries())


def test_priority_names_all_registered():
    from pyspark_excel_datasource_spark.plans.registry import (
        _PRIORITY,
        load_all_queries,
    )

    registered = set(load_all_queries())
    missing = [n for n in _PRIORITY if n not in registered]
    assert not missing, f"priority list references unregistered queries: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate priority entries"


def test_probes_lead_the_window():
    names = _ordered_names()
    assert all(n.startswith("q_probe_dec_") for n in names[:6])


def test_gate_critical_queries_inside_first_50():
    names = set(_ordered_names()[:50])
    # round-1 hash-mismatches (re-spelled) must get fresh driver verdicts
    hash_fixed = {
        "q_flagship_pricing", "q_join_broadcast", "q_join_theta",
        "q_join_star3", "q_agg_distinct", "q_agg_cube", "q_pivot",
        "q_win_frame", "q_cte", "q_tpch_q10ish", "q_win_range_frame",
        "q_agg_percentile",
    }
    # round-1 never-reached SURVEY rows
    unreached = {
        "q_fn_date", "q_fn_math", "q_fn_cond", "q_fn_array", "q_fn_json",
        "q_fn_map", "q_udf_scalar", "q_udaf_grouped", "q_udtf",
        "q_text_stats", "q_text_tfidf", "q_sim_topk", "q_sim_selfjoin",
        "q_dedup_near", "q_multimodal_cols", "q_stream_tumbling",
        "q_stream_sliding", "q_stream_session", "q_stream_watermark",
        "q_stream_dedup", "q_stream_discover", "q_scan_excel",
        "q_scan_multifile", "q_sink_excel",
    }
    out = (hash_fixed | unreached) - names
    assert not out, f"gate-critical queries fell out of the first 50: {out}"


def test_every_oracle_has_a_query():
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = load_all_queries()
    assert all(k in qs for k in ORACLES)
