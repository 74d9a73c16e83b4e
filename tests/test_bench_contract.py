"""Driver-contract guards for bench.py's stdout (VERDICT r10 #4/#5).

The external driver captures only a ~2 KB stdout tail and parses ONE
JSON line from it; round 10's bench embedded per-pass samples in that
line and the driver recorded ``parsed: null``. These tests pin the
contract without running the (minutes-long) benchmark: the printed
summary for the live HEADLINE set, with worst-case-width timings, must
stay well under the capture window, and the per-pass detail must not be
part of it.
"""

from __future__ import annotations

import json


def _worst_case_summary():
    from pyspark_excel_datasource_spark.benchmark import HEADLINE

    return {
        "metric": "headline_queries_total_wall_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: 99999.999 for name in HEADLINE},
        "sf": "/root/testdata/sf0.1",
        "loadavg_before": 99.99,
        "loadavg_after": 99.99,
        "host_quiet": False,
    }


def test_summary_line_fits_driver_tail_capture():
    line = json.dumps(_worst_case_summary())
    assert len(line) <= 1800, (
        f"bench stdout line would be {len(line)} bytes; the driver "
        f"captures ~2 KB — trim HEADLINE growth or drop fields"
    )


def test_summary_carries_no_samples():
    import inspect

    from pyspark_excel_datasource_spark import benchmark

    src = inspect.getsource(benchmark.main)
    # the printed stdout line is json.dumps(summary); samples only ever
    # attach to the detail dict that goes to stderr/BENCH_DETAIL.json
    assert '"samples"' not in json.dumps(_worst_case_summary())
    assert "detail = dict(summary, samples=passes)" in src


def test_bench_impls_cover_headline():
    """Every HEADLINE name must resolve to a callable — including the
    two that time native fast paths instead of registered gate plans."""
    from pyspark_excel_datasource_spark.benchmark import (
        HEADLINE,
        _bench_impls,
    )
    from pyspark_excel_datasource_spark.plans.registry import (
        load_all_queries,
    )

    impls = _bench_impls(load_all_queries())
    missing = [n for n in HEADLINE if n not in impls or not callable(impls[n])]
    assert not missing
