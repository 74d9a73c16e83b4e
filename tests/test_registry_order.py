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


def test_round5_window_composition():
    """Round-5 window = every query with NO driver verdict in rounds 1-4
    (47 of them, from CORRECTNESS_r01..r04.json) + 3 regression pads whose
    code paths changed this round."""
    import json
    import pathlib

    names = set(_ordered_names()[:50])
    repo = pathlib.Path(__file__).resolve().parents[1]
    seen: set[str] = set()
    for r in ("01", "02", "03", "04"):
        seen.update(json.loads((repo / f"CORRECTNESS_r{r}.json").read_text()))
    # queries AUTHORED in round 5 (after the window was frozen) queue for
    # the round-6 rotation instead of displacing the 47
    new_this_round = {
        "q_pii_redact",
        "q_strip_markup",
        "q_winsorize_by_group",
        "q_robust_zscore",
        "q_join_interval_overlap",
        "q_stream_join",
        "q_dedup_prefix",
        "q_tpch_q3ish",
        "q_corr_matrix",
        "q_join_bloom",
        "q_udf_cogroup",
        "q_vocab_coverage",
        "q_scan_csv",
        "q_sink_csv",
        "q_scan_jsonl",
        "q_stream_foreachbatch",
        "q_udf_mapinarrow",
        "q_attribution",
        "q_agg_countmin",
        "q_multimodal_dedup",
        "q_delta_lag",
        "q_corpus_stats",
    }
    never = set(_ordered_names()) - seen - new_this_round
    out = never - names
    assert not out, f"never-verdicted queries fell out of the first 50: {out}"
    assert len(never) == 47
    pads = names - never
    assert pads == {"q_scan_excel", "q_scan_multifile", "q_multimodal_cols"}


def test_every_oracle_has_a_query():
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = load_all_queries()
    assert all(k in qs for k in ORACLES)
