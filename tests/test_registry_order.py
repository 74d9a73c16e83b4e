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


def test_pin_names_all_registered():
    from pyspark_excel_datasource_spark.plans.registry import (
        _PIN,
        load_all_queries,
    )

    registered = set(load_all_queries())
    missing = [n for n in _PIN if n not in registered]
    assert not missing, f"pin list references unregistered queries: {missing}"
    assert len(set(_PIN)) == len(_PIN), "duplicate pin entries"


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


def test_pinned_names_lead_window_until_hash_verdicted():
    """Round-11 window (VERDICT r10 #1): the 25 _PIN names — 19
    never-driver-verdicted round-10 additions + 6 r10-red rows — lead the
    gate window, but ONLY while they still lack a driver hash verdict;
    once CORRECTNESS_r11.json lands with their hashes the pin must
    dissolve into the normal staleness rotation (the r10 lesson: a static
    head goes red the moment the driver does its job)."""
    from pyspark_excel_datasource_spark.plans.registry import (
        _PIN,
        driver_verdicts,
    )

    names = _ordered_names()
    best = driver_verdicts()
    expected_head = [
        n for n in _PIN if best.get(n, ("", 0))[0] != "driver hash"
    ]
    assert names[: len(expected_head)] == expected_head
    # pins that earned a hash verdict must NOT occupy head slots ahead of
    # stale queries (they re-enter rotation by verdict age like any other)
    hash_pinned = [n for n in _PIN if n not in expected_head]
    head_set = set(names[: len(expected_head)])
    assert not (set(hash_pinned) & head_set)


def test_every_oracle_has_a_query():
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = load_all_queries()
    assert all(k in qs for k in ORACLES)


def test_no_silent_oracle_skips():
    """Since round 11 EVERY registered query must carry a DuckDB oracle —
    the approximate flagships' canonical names carry their md5
    cross-engine plans, so a ``no_oracle`` driver row is impossible by
    construction (VERDICT r10 #3). Genuinely non-SQL-expressible natives
    stay as unregistered ``*_native`` module functions covered by the
    in-plan audits (q_approx_audit / q_sim_ann_recall) and the extension
    tests."""
    from pyspark_excel_datasource_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    qs = set(load_all_queries())
    oracleless = qs - set(ORACLES)
    assert not oracleless, (
        f"queries registered without an oracle: {sorted(oracleless)} — "
        f"add a DuckDB oracle (md5-family conversion if the native hash "
        f"is engine-specific) or keep the native as an unregistered "
        f"*_native function with an in-plan audit"
    )


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
