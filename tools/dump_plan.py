#!/usr/bin/env python
"""Dump query plans for named queries to files.

Usage: python tools/dump_plan.py [--runtime] [--time-build] OUTDIR SUFFIX query [query ...]

Default mode writes OUTDIR/<query>_<SUFFIX>.txt with the STATIC
``.explain("formatted")`` plan, planned at $SPARK_GRAFT_PLAN_SF (default
/root/testdata/sf0.001). Used to record before/after plan evidence for
optimization rounds (plans/r14/, plans/r15/).

``--runtime`` (round 15, VERDICT r14 #2) additionally EXECUTES the query
through the noop sink and dumps the post-execution ADAPTIVE plan (the
"Final Plan" with AQE's join-strategy rewrites, AQEShuffleRead nodes and
ReusedExchange reuse that the static dump cannot show), read back from
the SQL status store. Runtime dumps default to $SPARK_GRAFT_PLAN_SF too;
set it to sf0.1 to capture the plan AQE actually picks at bench scale.

``--time-build`` prints per-query DataFrame *construction* wall time
(driver-side plan build: py4j round trips, fixture probes) without
executing anything — the §7.3 driver-overhead ranking tool.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_excel_datasource_spark.plans.registry import load_all_queries
from pyspark_excel_datasource_spark.session import get_session


def _final_plan(spark, df) -> str:
    """Execute df through the noop sink and return the final adaptive
    plan description recorded by the SQL status store."""
    df.write.format("noop").mode("overwrite").save()
    store = spark._jsparkSession.sharedState().statusStore()
    return store.executionsList().last().physicalPlanDescription()


def main() -> int:
    args = sys.argv[1:]
    runtime = "--runtime" in args
    time_build = "--time-build" in args
    args = [a for a in args if not a.startswith("--")]
    outdir, suffix, *names = args
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    spark = get_session("dump-plan", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    queries = load_all_queries()
    if names == ["ALL"]:
        names = sorted(queries)
    build_times: list[tuple[float, str]] = []
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, sf)
        build_times.append((time.perf_counter() - t0, name))
        if time_build:
            continue
        if runtime:
            plan = _final_plan(spark, df)
        else:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    if time_build:
        for sec, name in sorted(build_times, reverse=True):
            print(f"{sec:8.3f}s  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
