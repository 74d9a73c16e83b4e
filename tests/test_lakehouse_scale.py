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


def test_compaction_plans_from_metadata_only(spark, tmp_path, monkeypatch):
    """VERDICT r11 #5: Delta OPTIMIZE (incl. DV fold) and Iceberg
    rewrite_data_files must PLAN from O(files) metadata — log replay,
    DV descriptors, manifest avro, parquet FOOTERS, and the
    delete-count-sized position-delete index. The data rewrite itself
    is a distributed Spark job (JVM executors); the driver's Python
    process must never read a DATA file's pages. Pin: any driver-side
    pyarrow data-page read of a table data parquet during the
    maintenance call fails."""
    import os

    import pyarrow.parquet as papq

    src = _orders(spark)
    pd_ = str(tmp_path / "d")
    _build(spark, src, pd_, deltalog.write_delta)
    deltalog.delete_where(
        spark, pd_, "o_orderkey % 7 = 0", mode="deletion-vectors"
    )
    pi = str(tmp_path / "i")
    _build(spark, src, pi, ice.write_iceberg)
    ice.delete_where_iceberg(spark, pi, "o_orderkey % 7 = 0")

    data_reads: list[str] = []

    def _is_metadata_read(path: str) -> bool:
        base = os.path.basename(path)
        # the log's own parquet artifacts: Delta checkpoints and the
        # delete-count-sized position-delete index — both documented
        # driver-side metadata, never table data pages
        return (
            "_delta_log" in path
            or base.startswith("delete-")
            or base.startswith("eqdelete-")
        )

    real_read_table = papq.read_table

    def guard_read_table(path, *a, **k):
        if isinstance(path, (str, os.PathLike)) and not _is_metadata_read(
            str(path)
        ):
            data_reads.append(str(path))
        return real_read_table(path, *a, **k)

    real_pf_read = papq.ParquetFile.read
    real_pf_rg = papq.ParquetFile.read_row_group

    def guard_pf_read(self, *a, **k):
        data_reads.append("ParquetFile.read")
        return real_pf_read(self, *a, **k)

    def guard_pf_rg(self, *a, **k):
        data_reads.append("ParquetFile.read_row_group")
        return real_pf_rg(self, *a, **k)

    monkeypatch.setattr(papq, "read_table", guard_read_table)
    monkeypatch.setattr(papq.ParquetFile, "read", guard_pf_read)
    monkeypatch.setattr(papq.ParquetFile, "read_row_group", guard_pf_rg)

    expect = deltalog.read_delta(spark, pd_).count()
    deltalog.optimize(spark, pd_)  # folds the DVs into data
    assert deltalog.read_delta(spark, pd_).count() == expect
    assert not deltalog.snapshot(pd_).dvs  # fold actually happened

    expect_i = ice.read_iceberg(spark, pi).count()
    ice.rewrite_data_files(spark, pi)
    assert ice.read_iceberg(spark, pi).count() == expect_i

    assert not data_reads, (
        f"driver-side data-page reads during compaction: {data_reads[:5]}"
    )
