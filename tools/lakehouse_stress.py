#!/usr/bin/env python
"""Lakehouse metadata-scale stress: file-COUNT scaling (not row scaling).

A 100 TB table fed by many appends accumulates data files and commits;
what must stay cheap as files × 10 is the DRIVER-side metadata
resolution (Delta log replay / Iceberg manifest walk) and the log-level
partition pruning that keeps scans proportional to the data asked for,
not the table size.

Builds base/scaled tables (same rows, 10× the data files via commit
count × per-commit repartition), then reports:

- Delta:   snapshot() replay time, base vs 10× files
- Delta:   read_delta(partition_filter) planned-file count vs full scan
           (log-level pruning — files never listed, never opened)
- Iceberg: snapshot_iceberg() manifest-walk time, base vs 10× files
- Iceberg: files_meta() row count sanity at both scales

Ratios land in BASELINE.md; the correctness side (pruned counts exact,
reads equal) is pinned by tests/test_lakehouse_scale.py.

Usage: python tools/lakehouse_stress.py [workdir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.catalog import table
from pyspark_excel_datasource_spark.session import get_session
from pyspark_excel_datasource_spark.sources import deltalog
from pyspark_excel_datasource_spark.sources import iceberg as ice

import os

SF = os.environ.get("STRESS_SF", "/root/testdata/sf0.01")
COMMITS = 4
FILES_BASE = 8  # per commit → 32 files
#: file-count scale factor (LH_STRESS_FACTOR=100 → 16000 scaled files)
FACTOR = int(os.environ.get("LH_STRESS_FACTOR", "10"))


def build_delta(spark, src, path: str, files_per_commit: int) -> None:
    for i in range(COMMITS):
        deltalog.write_delta(
            spark,
            src.filter(F.col("o_orderkey") % COMMITS == i).repartition(
                files_per_commit
            ),
            path,
            mode="append" if i else "overwrite",
            partition_by=("o_orderpriority",),
        )


def build_iceberg(spark, src, path: str, files_per_commit: int) -> None:
    for i in range(COMMITS):
        ice.write_iceberg(
            spark,
            src.filter(F.col("o_orderkey") % COMMITS == i).repartition(
                files_per_commit
            ),
            path,
            mode="append" if i else "overwrite",
            partition_by=("o_orderpriority",),
        )


def timed(fn, reps: int = 5) -> float:
    fn()  # warm (fs cache, imports)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lh_stress_")
    spark = get_session("lakehouse-stress")
    src = table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )

    results: dict[str, float] = {}
    for fmt, build, snap_fn in (
        ("delta", build_delta, lambda p: deltalog.snapshot(p)),
        ("iceberg", build_iceberg, lambda p: ice.snapshot_iceberg(p)),
    ):
        pb, ps = f"{work}/{fmt}_base", f"{work}/{fmt}_x{FACTOR}"
        build(spark, src, pb, FILES_BASE)
        build(spark, src, ps, FILES_BASE * FACTOR)
        nb, ns = len(snap_fn(pb).files), len(snap_fn(ps).files)
        tb = timed(lambda: snap_fn(pb))
        ts = timed(lambda: snap_fn(ps))
        ratio = ts / tb
        results[f"{fmt}_meta_ratio"] = ratio
        print(
            f"{fmt:8s} files {nb}->{ns} ({ns/nb:.1f}x)  metadata scan "
            f"{tb*1000:.1f}ms -> {ts*1000:.1f}ms  ratio={ratio:.1f}x "
            f"(files grew {ns/nb:.1f}x; linear => ratio <= that)"
        )

    # Delta log-level pruning at the scaled file count: one of five
    # priorities => ~1/5 of the files planned, rows exact
    ps = f"{work}/delta_x{FACTOR}"
    full = deltalog.read_delta(spark, ps)
    one = deltalog.read_delta(
        spark, ps, partition_filter={"o_orderpriority": {"1-URGENT"}}
    )
    nf, np_ = len(full.inputFiles()), len(one.inputFiles())
    exact = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    got = one.count()
    print(
        f"delta    pruning: {np_}/{nf} files planned for 1/5 partitions "
        f"({np_/nf:.2f}); rows {got} (exact {exact}) "
        f"{'OK' if got == exact and np_ * 3 < nf else 'FAIL'}"
    )
    if work.startswith(tempfile.gettempdir()):
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
