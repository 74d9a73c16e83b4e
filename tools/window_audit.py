#!/usr/bin/env python
"""Registry-wide unpartitioned-window audit.

Walks the physical plan of every registered query and reports each
Window / WindowGroupLimit node whose PARTITION SPEC IS EMPTY — the
single-task shape that silently serializes at 100 TB (Spark itself
warns ``No Partition Defined for Window operation``). Bounded inputs
(band-count tables, |classes|-sized censuses) are fine; row-scale
inputs are the scale-killer class round 8's verdict flagged.

The enforcement lives in tests/test_plan_quality.py::
test_unpartitioned_windows_are_justified — every query with such a
node must carry a justification in UNPARTITIONED_WINDOW_OK there.

Usage: python tools/window_audit.py [query ...]
Prints ``name  count  child-of-window`` for offenders; exit 0 always
(this is the survey tool; the test is the gate).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark_excel_datasource_spark.plans.registry import load_all_queries
from pyspark_excel_datasource_spark.session import get_session

SF = "/root/testdata/sf0.001"


def empty_partition_windows(df) -> list[str]:
    """Node-name + first-child-name of every Window-family physical node
    with an empty partition spec, via the pre-AQE sparkPlan tree."""
    out: list[str] = []
    stack = [df._jdf.queryExecution().sparkPlan()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name in ("Window", "WindowGroupLimit"):
            try:
                if node.partitionSpec().size() == 0:
                    ch = node.children()
                    child = ch.apply(0).nodeName() if ch.size() else "?"
                    out.append(f"{name}<-{child}")
            except Exception:  # pragma: no cover - node without the method
                pass
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def main() -> int:
    spark = get_session("winaudit", cpus=4, shuffle_partitions=4)
    queries = load_all_queries()
    names = sys.argv[1:] or list(queries)
    for name in names:
        try:
            hits = empty_partition_windows(queries[name](spark, SF))
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {str(exc)[:200]}")
            continue
        if hits:
            print(f"{name:32s} {len(hits)}  {'; '.join(hits)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
