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


#: Queries authored in round 9 — appended to registry section B2 as they
#: land; they queue for the round-10 gate window behind the 8-name
#: overflow of section B.
ROUND9_AUTHORED: set[str] = {
    "q_eval_auc_sampled",
    "q_embed_pca_power",
    "q_scan_delta_pruned",
    "q_scan_iceberg_pruned",
    "q_win_nth",
}


#: Queries authored in round 8 (kept for provenance; all now inside the
#: round-9 rotation sections).
ROUND8_AUTHORED: set[str] = {
    "q_scan_avro",
    "q_sink_avro",
    "q_graph_cc",
    "q_stream_avro",
    "q_sql_udf",
    "q_state_reader",
    "q_stream_join_outer",
    "q_agg_approx_topk",
    "q_udtf_analyze",
    "q_agg_topk_union",
    "q_kmeans_lloyd",
    "q_udtf_table_arg",
    # TPC-H shape completion
    "q_tpch_q4ish",
    "q_tpch_q6ish",
    "q_tpch_q9ish",
    "q_tpch_q11ish",
    "q_tpch_q13ish",
    "q_tpch_q15ish",
    "q_tpch_q16ish",
    "q_tpch_q17ish",
    "q_tpch_q19ish",
    "q_tpch_q22ish",
    # Delta-log source family + substring dedup + federation
    "q_scan_delta",
    "q_scan_delta_timetravel",
    "q_sink_delta",
    "q_delta_cdf",
    "q_delta_merge",
    "q_delta_optimize",
    "q_dedup_substring",
    "q_stream_delta",
    "q_delta_schema_evolution",
    "q_federated_join",
    "q_delta_delete_rows",
    "q_stream_delta_upsert",
    "q_scan_iceberg",
    "q_scan_iceberg_snapshot",
    "q_text_substring_clean",
    "q_sample_importance",
    "q_delta_zorder",
    "q_delta_history",
    # Iceberg maintenance + full-outer stream join + classical-ML ops
    "q_iceberg_compact",
    "q_iceberg_expire",
    "q_stream_join_full",
    "q_nb_classify",
    "q_regression_multi",
    "q_agg_theta",
    "q_regression_cv",
    "q_iceberg_files",
    "q_pipeline_classifier_filter",
    "q_stream_iceberg",
    "q_iceberg_incremental",
    "q_iceberg_history",
    "q_eval_confusion",
    "q_eval_auc",
    "q_convert_delta_to_iceberg",
    "q_convert_iceberg_to_delta",
}


#: Queries authored in round 10 — registry section D; every one must be
#: inside the gate window the round it lands.
ROUND10_AUTHORED: set[str] = {
    "q_scan_delta_mapped",
    "q_scan_delta_dv",
    "q_scan_iceberg_posdel",
    "q_iceberg_rename",
    "q_delta_constraints",
    "q_delta_restore",
    "q_iceberg_rollback",
    "q_scan_iceberg_eqdel",
    "q_delta_delete_dv",
}


def test_round10_window_composition():
    """Round-10 window (VERDICT r9 next-round #1): the 13 queries with NO
    driver verdict in rounds 1-9, the 5 stale rows-only natives, and the
    2 LSH flagships whose only hash verdicts are judge-run all sit inside
    the 50-slot gate window, together with every round-10 addition. The
    staleness-driven fill is enforced mechanically by
    tests/test_registry_window.py; this test pins the mandated names."""
    names = _ordered_names()
    window = set(names[:50])

    never_verdicted = {
        "q_win_nth",
        "q_scan_delta_pruned",
        "q_scan_iceberg_pruned",
        "q_embed_pca_power",
        "q_eval_auc_sampled",
        "q_eval_confusion",
        "q_nb_classify",
        "q_regression_multi",
        "q_regression_cv",
        "q_agg_theta",
        "q_pipeline_classifier_filter",
        "q_sample_importance",
        "q_stream_join_full",
    }
    stale_natives = {
        "q_dedup_minhash",
        "q_dedup_simhash",
        "q_sim_ann_lsh",
        "q_sim_ann_ivf",
        "q_sim_ann_pq",
    }
    judge_only_lsh = {"q_dedup_embed_lsh", "q_dedup_incremental_lsh"}
    mandated = never_verdicted | stale_natives | judge_only_lsh | ROUND10_AUTHORED
    missing = mandated - window
    assert not missing, f"mandated round-10 window names missing: {sorted(missing)}"
    # the never-verdicted backlog leads the window (slots 1-13)
    assert set(names[:13]) == never_verdicted


def test_every_oracle_has_a_query():
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = load_all_queries()
    assert all(k in qs for k in ORACLES)


#: The ONLY queries allowed to register with oracle=None. Each is an
#: approximate structure whose output is not ANSI-SQL-expressible; each
#: MUST have (a) an oracled twin or (b) an in-plan hash-verified audit
#: (q_approx_audit / q_sim_ann_recall) covering its error contract.
ROWS_ONLY_ALLOWLIST = {
    "q_dedup_minhash",  # twin: q_dedup_minhash_oracled
    "q_dedup_simhash",  # twin: q_dedup_simhash_oracled
    # (q_dedup_embed_lsh / q_dedup_incremental_lsh converted to
    # hash-oracled hll-style verdict outputs in round 8)
    "q_sim_ann_lsh",  # twin: q_sim_ann_lsh_oracled + q_sim_ann_recall
    "q_sim_ann_ivf",  # twin: q_sim_ann_ivf_oracled + q_approx_audit
    "q_sim_ann_pq",  # audited: q_approx_audit
}


def test_no_silent_oracle_skips():
    """A future operator may not silently register without an oracle: every
    oracle-less query must be on the explicit rows-only allowlist (and the
    allowlist may not go stale the other way)."""
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = set(load_all_queries())
    oracleless = qs - set(ORACLES)
    unexpected = oracleless - ROWS_ONLY_ALLOWLIST
    assert not unexpected, (
        f"queries registered without an oracle but not allowlisted: "
        f"{sorted(unexpected)} — add a DuckDB oracle or (for genuinely "
        f"non-SQL-expressible approx ops) allowlist with an audit twin"
    )
    stale = ROWS_ONLY_ALLOWLIST - oracleless
    assert not stale, f"allowlist entries that now HAVE oracles: {sorted(stale)}"


def test_coverage_md_not_stale():
    """COVERAGE.md must match a fresh tools/gen_coverage.py run (regenerate
    after adding queries)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_coverage.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert out.strip() == (REPO / "COVERAGE.md").read_text().strip(), (
        "COVERAGE.md is stale — run: python tools/gen_coverage.py > COVERAGE.md"
    )
