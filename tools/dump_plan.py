#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to files.

Usage: python tools/dump_plan.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, planned at
$SPARK_GRAFT_PLAN_SF (default /root/testdata/sf0.001). Used to record
the before/after plan evidence for optimization rounds (plans/r14/).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_excel_datasource_spark.plans.registry import load_all_queries
from pyspark_excel_datasource_spark.session import get_session


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    spark = get_session("dump-plan", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    queries = load_all_queries()
    for name in names:
        df = queries[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
