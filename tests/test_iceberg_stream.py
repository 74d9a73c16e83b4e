"""Iceberg streaming source (pyiceberg_stream): incremental snapshot
consumption, compaction invisibility, overwrite gating, expiry guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.sources.iceberg import (
    expire_snapshots,
    rewrite_data_files,
    write_iceberg,
)
from pyspark_excel_datasource_spark.sources.iceberg_stream import (
    IcebergStreamReader,
    register_pyiceberg_stream,
)

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return spark.read.parquet(os.path.join(SF, "nation.parquet"))


def _drain(spark, path, name, **opts):
    register_pyiceberg_stream(spark)
    reader = spark.readStream.format("pyiceberg_stream")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    return spark.table(name)


def test_appends_stream_incrementally_with_checkpoint(spark, tmp_path):
    """Each append becomes its own micro-batch against a persistent
    checkpoint: restarting the stream after a new append emits ONLY the
    new snapshot's rows (offset replay, no duplicates)."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    register_pyiceberg_stream(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("pyiceberg_stream")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()

    drain()
    first = n.filter(F.col("n_regionkey") < 2).count()
    assert spark.read.parquet(out).count() == first
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == n.count(), "restart must emit ONLY the new snapshot"
    assert {r.n_nationkey for r in got.collect()} == {
        r.n_nationkey for r in n.collect()
    }


def test_replace_snapshot_is_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.repartition(4), path)
    rewrite_data_files(spark, path, target_files=1)
    got = _drain(spark, path, "ice_replace_sink")
    assert got.count() == n.count()  # compaction emitted nothing extra


def test_overwrite_requires_ignore_changes(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(
        spark, n.filter(F.col("n_regionkey") == 3), path, mode="overwrite"
    )
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain(spark, path, "ice_ow_fail")
    got = _drain(spark, path, "ice_ow_ok", ignoreChanges="true")
    # both snapshots' added files stream (documented duplicate semantics)
    assert got.count() == (
        n.filter(F.col("n_regionkey") < 2).count()
        + n.filter(F.col("n_regionkey") == 3).count()
    )


def test_expired_start_offset_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    reader = IcebergStreamReader(None, {"path": path})
    # snapshot 1 consumed, then expired away
    expire_snapshots(path, keep_last=1)
    with pytest.raises(RuntimeError, match="expired"):
        reader.partitions({"snapshot_id": 1}, {"snapshot_id": 2})


def test_fresh_stream_after_compaction_and_expiry_fails_loudly(spark, tmp_path):
    """The round-8 advisor finding: rewrite_data_files writes its
    manifest entries under the REPLACE snapshot's own id, so after the
    original appends are expired a manifest walk sees nothing wrong and
    a fresh stream returned 0 rows on a live table. The rewrite now
    records replaced-snapshot-ids in its summary; the stream must RAISE,
    never silently drop."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    rewrite_data_files(spark, path, target_files=1)
    expire_snapshots(path, keep_last=1)  # only the replace remains
    with pytest.raises(Exception, match="expired"):
        _drain(spark, path, "ice_compact_expire_sink")


def test_stream_past_replace_survives_expiry(spark, tmp_path):
    """A stream that already consumed through the replace snapshot keeps
    working after expiry: the lost provenance is entirely <= its start
    offset, so nothing in range is unattributable."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    rewrite_data_files(spark, path, target_files=1)
    expire_snapshots(path, keep_last=1)
    reader = IcebergStreamReader(None, {"path": path})
    hi = reader.latestOffset()["snapshot_id"]
    assert reader.partitions({"snapshot_id": hi}, {"snapshot_id": hi}) == []
    # and new appends stream normally from there
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    parts = reader.partitions(
        {"snapshot_id": hi}, reader.latestOffset()
    )
    assert len(parts) >= 1


def test_chained_rewrites_keep_transitive_provenance(spark, tmp_path):
    """replace-of-replace: the second rewrite's summary must still name
    the ORIGINAL appends, so expiring everything below it fails a fresh
    stream instead of dropping the appends' rows."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    rewrite_data_files(spark, path, target_files=2)
    rewrite_data_files(spark, path, target_files=1)
    expire_snapshots(path, keep_last=1)
    with pytest.raises(Exception, match="expired"):
        _drain(spark, path, "ice_chain_expire_sink")


def test_fresh_stream_after_expiry_fails_loudly(spark, tmp_path):
    """A FRESH stream (offset 0) over a table whose early snapshots were
    expired must raise — the expired snapshots' rows can no longer be
    attributed to any offset range, and silently dropping them is the
    failure mode the orphan check exists to prevent."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    expire_snapshots(path, keep_last=1)  # s1 gone; its rows live in s2
    with pytest.raises(Exception, match="expired snapshot"):
        _drain(spark, path, "ice_orphan_sink")
