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


#: Queries authored in round 7 — appended to registry section C as they
#: land; they queue for the round-8 gate window behind the 20-name
#: section-B backlog.
ROUND7_AUTHORED: set[str] = {
    "q_scan_excel_recursive",
    "q_scan_excel_allsheets",
    "q_sim_ann_lsh_oracled",
    "q_sim_ann_ivf_oracled",
    "q_stream_tws",
    "q_sql_scripting",
    "q_dedup_embed_lsh_oracled",
    "q_sim_ann_pq_oracled",
    "q_dedup_incremental_lsh_oracled",
    "q_execute_immediate",
    "q_scan_tarshard",
    "q_sink_tarshard",
    "q_stream_tarshard",
    "q_multimodal_tarshard",
    "q_pipeline_tarshard_ingest",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_dedup_containment",
    "q_zipf_slope",
    "q_pmi_collocations",
    "q_tpch_q14ish",
    "q_tpch_q12ish",
    "q_tpch_q21ish",
    "q_tpch_q8ish",
    "q_sink_parquet_bloom",
    "q_dedup_semantic_cluster",
    "q_text_ngram_novelty",
    "q_scan_xml",
    "q_sink_xml",
    "q_graph_ppr",
    "q_graph_randomwalk",
    "q_graph_kcore",
}


def test_round7_window_composition():
    """Round-7 window (VERDICT_r6 next-round #1): the 70 queries with NO
    driver verdict in rounds 1-6 rotate into the gate. Slots 1-50 hold the
    first 50; slots 51-70 the remaining 20 (round-8 rotation head). Every
    query outside the first 70 must either hold a recorded driver verdict
    in CORRECTNESS_r01-r06 or be authored this round (section C)."""
    names = _ordered_names()

    seen: set[str] = set()
    for r in ("01", "02", "03", "04", "05", "06"):
        seen.update(json.loads((REPO / f"CORRECTNESS_r{r}.json").read_text()))

    rows_only = {
        # approx structures with no oracle: the driver records a weaker
        # rows-only check; their correctness contract is audited in-plan
        # via q_approx_audit / q_sim_ann_recall (both hash-verified r6)
        "q_dedup_minhash",
        "q_dedup_simhash",
        "q_dedup_embed_lsh",
        "q_dedup_incremental_lsh",
        "q_sim_ann_lsh",
        "q_sim_ann_ivf",
        "q_sim_ann_pq",
    }
    backlog = [n for n in names if n not in seen and n not in rows_only]
    never_verdicted = [n for n in backlog if n not in ROUND7_AUTHORED]
    assert names[:50] == never_verdicted[:50], (
        "round-7 window must be the first 50 never-driver-verdicted queries"
    )
    assert names[50:70] == never_verdicted[50:70], (
        "slots 51-70 must hold the rest of the never-verdicted backlog"
    )
    assert len(never_verdicted) == 70, (
        f"expected exactly 70 never-verdicted round-6 holdovers, got "
        f"{len(never_verdicted)}"
    )
    # round-7 queries land right behind the backlog so a widened driver
    # window reaches them this round, and the round-8 rotation is cheap
    authored = [n for n in names if n in ROUND7_AUTHORED]
    if authored:
        start = names.index(authored[0])
        assert start == 70, "round-7 queries must start at slot 71"
        assert names[start : start + len(authored)] == authored


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
    "q_dedup_embed_lsh",  # audited: q_approx_audit
    "q_dedup_incremental_lsh",  # audited: q_approx_audit
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
