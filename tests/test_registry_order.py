"""The driver's correctness gate walks queries() in order with a cutoff
(rounds 1-5: exactly the first 50). These tests pin the window composition so
a refactor can't silently push a gate-critical query out of it."""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


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


def test_probes_retired():
    """The round-2/3 decimal hash probes were retired in round 6; nothing
    may re-register their names (their permanent hash-FAIL records would
    come back with them)."""
    assert not any(n.startswith("q_probe_dec_") for n in _ordered_names())


def test_round6_window_composition():
    """Round-6 window = every query with NO driver verdict in rounds 1-5
    (the 24 authored in round 5 after that window froze) + the round-6
    re-verdicts (rows-only sketches converted to bound-asserted oracles,
    the fixed multimodal features) + queries authored in round 6 + the
    regression/bench pads."""
    names = _ordered_names()
    window = set(names[:50])

    seen: set[str] = set()
    for r in ("01", "02", "03", "04", "05"):
        seen.update(json.loads((REPO / f"CORRECTNESS_r{r}.json").read_text()))

    # queries AUTHORED in round 6 queue inside the window by design; they
    # have no prior verdict but were not part of the round-5 backlog
    new_this_round = {
        n
        for n in names
        if n not in seen
        and n
        in {
            "q_dedup_ngram_jaccard",
            "q_sim_ann_recall",
            "q_resample_timeseries",
            "q_quantile_bins",
            "q_drift_kl",
            "q_embed_assign",
            "q_minhash_union_sketch",
            "q_entropy_ngrams",
            "q_topic_cooccur",
            "q_stream_rate_limit",
            "q_window_deltas_vs_baseline",
            "q_join_asof_tolerance",
            "q_multimodal_frames",
            "q_sample_exact_pergroup",
            "q_cdc_changelog",
            "q_bm25",
            "q_approx_audit",
        }
    }
    # authored late in round 6 after the 50-slot window froze (round-5
    # precedent: its 24 late queries became the round-6 backlog); these
    # queue immediately after slot 50 as the round-7 rotation head
    late_authored = {
        "q_tpch_q7ish",
        "q_tpch_q18ish",
        "q_fn_url",
        "q_dedup_url",
        "q_scan_orc",
        "q_sink_orc",
        "q_agg_incremental",
        "q_pii_luhn",
        "q_path_topk",
        "q_ab_ttest",
        "q_join_spatial_grid",
        "q_fuzzy_match",
        "q_mix_temperature",
        "q_rank_fusion",
        "q_bpe_encode",
        "q_skyline_pareto",
        "q_dedup_cross_source",
        "q_late_data_audit",
        "q_embed_norm",
        "q_curriculum_interleave",
        "q_rolling_dau",
        "q_compaction_plan",
        "q_tpch_q2ish",
        "q_tpch_q20ish",
        "q_scan_text",
        "q_sink_text",
        "q_inverted_index",
        "q_strip_boilerplate",
        "q_join_asof_nearest",
        "q_weighted_median",
        "q_profile_table",
        "q_join_pit",
        "q_funnel_ttc",
        "q_seasonal_baseline",
        "q_observe_metrics",
        "q_scan_file_lineage",
        "q_text_sentiment",
        "q_trajectory_topk",
        "q_join_null_safe",
        "q_content_chunking",
        "q_chunk_dedup",
        "q_sample_coordinated",
        "q_quantile_normalize",
        "q_dedup_chunks",
        "q_pipeline_corpus_v2",
        "q_scan_excel_sheets",
        "q_sink_excel_sheets",
        "q_win_ntile",
        "q_transpose",
        "q_agg_listagg",
        "q_fn_xml",
        "q_agg_hll_union",
        "q_fn_collation",
        "q_sql_pipe",
        "q_fn_try",
        "q_event_autocorr",
        "q_session_entry_exit",
        "q_rfm_segments",
        "q_cohort_ltv",
        "q_market_basket",
        "q_benford_audit",
        "q_gini_concentration",
        "q_peak_detection",
        "q_repurchase_intervals",
        "q_hhi_concentration",
        "q_seasonality_strength",
        "q_abc_classification",
        "q_fulfillment_latency",
        "q_return_rates",
        "q_discount_lift",
    }
    # names[50] is q_topk (the 51st-slot bench pad); late-authored head
    # the ordering right after it
    assert set(names[51 : 51 + len(late_authored)]) == late_authored, (
        "late-authored round-6 queries must head the post-window ordering"
    )
    backlog = set(names) - seen - new_this_round - late_authored
    out = backlog - window
    assert not out, f"never-verdicted queries fell out of the first 50: {out}"
    # re-verdicts whose contract changed in round 6 must also be audited
    for must in (
        "q_agg_approx",
        "q_agg_approx_quantile",
        "q_agg_hll",
        "q_multimodal_features",
    ):
        assert must in window, f"round-6 re-verdict {must} missing from window"
    assert new_this_round <= window, (
        f"round-6 queries outside the window: {new_this_round - window}"
    )


def test_every_oracle_has_a_query():
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = load_all_queries()
    assert all(k in qs for k in ORACLES)
