"""Lakehouse metadata-scale correctness: file-count growth must not
change what a reader plans (pruning stays exact) and concurrent
maintenance must never corrupt or lose committed rows.

The timing half of this contract (metadata-scan ratios at 10x files)
lives in tools/lakehouse_stress.py with results recorded in BASELINE.md;
these tests pin the correctness invariants at a small file count so the
suite stays fast.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.sources import deltalog
from pyspark_excel_datasource_spark.sources import iceberg as ice

SF = "/root/testdata/sf0.001"


def _orders(spark):
    from pyspark_excel_datasource_spark.catalog import table

    return table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def _build(spark, src, path, writer, files_per_commit=3, commits=3):
    for i in range(commits):
        writer(
            spark,
            src.filter(F.col("o_orderkey") % commits == i).repartition(
                files_per_commit
            ),
            path,
            mode="append" if i else "overwrite",
            partition_by=("o_orderpriority",),
        )


def test_delta_pruning_exact_as_files_grow(spark, tmp_path):
    """Log-level partition pruning plans exactly the filtered
    partitions' files and returns exactly the filtered rows, at two
    different file counts (pruning is a metadata property, invariant
    under compaction pressure)."""
    src = _orders(spark)
    for label, fpc in (("few", 2), ("many", 8)):
        path = str(tmp_path / f"d_{label}")
        _build(spark, src, path, deltalog.write_delta, files_per_commit=fpc)
        full = deltalog.read_delta(spark, path)
        one = deltalog.read_delta(
            spark, path, partition_filter={"o_orderpriority": {"1-URGENT"}}
        )
        n_full, n_one = len(full.inputFiles()), len(one.inputFiles())
        assert n_one * 3 < n_full, (label, n_one, n_full)
        expect = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
        assert one.count() == expect
        assert full.count() == src.count()


def test_iceberg_files_meta_tracks_file_growth(spark, tmp_path):
    """files_meta answers layout questions at metadata cost: file counts
    scale with the write pattern, per-partition attribution intact."""
    src = _orders(spark)
    counts = {}
    for label, fpc in (("few", 2), ("many", 6)):
        path = str(tmp_path / f"i_{label}")
        _build(spark, src, path, ice.write_iceberg, files_per_commit=fpc)
        meta = ice.files_meta(path)
        counts[label] = len(meta)
        assert {m["partition"]["o_orderpriority"] for m in meta} == {
            r.o_orderpriority for r in src.select("o_orderpriority").distinct().collect()
        }
        assert sum(m["record_count"] for m in meta) == src.count()
    assert counts["many"] > counts["few"] * 2


def test_iceberg_concurrent_append_vs_expire(spark, tmp_path):
    """Append racing expire_snapshots (the maintenance race the Delta
    suite pins for OCC): the O_EXCL metadata publish lets exactly one
    writer of a version win; the loser raises
    IcebergConcurrentCommitError, a plain retry lands its effect, and no
    committed row is ever lost — expiry changes history, never content."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        IcebergConcurrentCommitError,
    )

    path = str(tmp_path / "race")
    n = _orders(spark).limit(30).cache()
    n.count()
    ice.write_iceberg(spark, n.filter("o_orderkey % 3 = 0"), path)
    ice.write_iceberg(
        spark, n.filter("o_orderkey % 3 = 1"), path, mode="append"
    )

    barrier = threading.Barrier(2)
    errs: dict[str, Exception] = {}

    def appender():
        try:
            barrier.wait()
            ice.write_iceberg(
                spark, n.filter("o_orderkey % 3 = 2"), path, mode="append"
            )
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs["append"] = e

    def expirer():
        try:
            barrier.wait()
            ice.expire_snapshots(path, keep_last=1)
        except Exception as e:  # noqa: BLE001
            errs["expire"] = e

    t1, t2 = threading.Thread(target=appender), threading.Thread(target=expirer)
    t1.start(); t2.start(); t1.join(); t2.join()

    # at most one side lost, and only with the typed OCC error
    assert len(errs) <= 1, errs
    for e in errs.values():
        assert isinstance(e, IcebergConcurrentCommitError), e
    # the loser's plain retry lands its effect
    if "append" in errs:
        ice.write_iceberg(
            spark, n.filter("o_orderkey % 3 = 2"), path, mode="append"
        )
    if "expire" in errs:
        ice.expire_snapshots(path, keep_last=1)
    # no committed row lost, metadata fully readable
    assert ice.read_iceberg(spark, path).count() == n.count()
    # and the metadata dir holds no orphans: everything on disk is
    # reachable from a retained snapshot
    import os

    md = ice._current_metadata(path)
    manifests, data = ice._reachable(path, md["snapshots"])
    mlists = {s["manifest-list"] for s in md["snapshots"]}
    on_disk_data = {
        os.path.join("data", f) for f in os.listdir(os.path.join(path, "data"))
    }
    assert on_disk_data == {os.path.normpath(p) for p in data}
    on_disk_avro = {
        os.path.join("metadata", f)
        for f in os.listdir(os.path.join(path, "metadata"))
        if f.endswith(".avro")
    }
    assert on_disk_avro == {os.path.normpath(p) for p in (manifests | mlists)}


def test_dv_writers_collect_files_not_rows(spark, tmp_path):
    """VERDICT r11 #1: the deletion-vector / position-delete WRITERS
    build per-file bitmaps IN TASKS — the driver materializes one
    descriptor row per matched FILE, never the matched (file, pos)
    pairs. A predicate matching ~half of ALL rows must leave
    _LAST_DV_DRIVER_ROWS equal to files_touched (row-funnel would be
    ~matched-row-count)."""
    src = _orders(spark)
    matched = src.filter(F.col("o_orderkey") % 2 == 0).count()

    pd_ = str(tmp_path / "d_del")
    _build(spark, src, pd_, deltalog.write_delta)
    _v, touched, _u = deltalog.delete_where(
        spark, pd_, "o_orderkey % 2 = 0", mode="deletion-vectors"
    )
    assert deltalog._LAST_DV_DRIVER_ROWS == touched
    assert matched > 10 * touched  # the proof is vacuous otherwise
    kept = deltalog.read_delta(spark, pd_).count()
    assert kept == src.count() - matched

    pu = str(tmp_path / "d_upd")
    _build(spark, src, pu, deltalog.write_delta)
    _v, touched_u, _u2 = deltalog.update_where(
        spark, pu, "o_orderkey % 2 = 0",
        {"o_totalprice": "o_totalprice + 1.0"},
        mode="deletion-vectors",
    )
    assert deltalog._LAST_DV_DRIVER_ROWS == touched_u
    assert deltalog.read_delta(spark, pu).count() == src.count()

    # Iceberg: the delete shards are written by tasks; the driver sees
    # only O(shards) paths/footers — assert shard count << positions
    import glob
    import os

    pi = str(tmp_path / "i_del")
    _build(spark, src, pi, ice.write_iceberg)
    res = ice.delete_where_iceberg(spark, pi, "o_orderkey % 2 = 0")
    shards = glob.glob(os.path.join(pi, "data", "delete-*.parquet"))
    assert res["rows_deleted"] == matched
    assert matched > 10 * len(shards)
    assert ice.read_iceberg(spark, pi).count() == src.count() - matched
