"""Round 13: pydelta stream skipChangeCommits (the public Delta
source's successor to ignoreChanges) — change commits skipped whole,
appends exactly once, loud failure without the option."""

from __future__ import annotations

import os
import sys
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_excel_datasource_spark.sources.delta_stream import (  # noqa: E402
    register_pydelta,
)
from pyspark_excel_datasource_spark.sources.deltalog import (  # noqa: E402
    delete_where,
    read_delta,
    update_where,
    write_delta,
)


def _drain(spark, path, **options):
    register_pydelta(spark)
    sink = f"skipchanges_{uuid.uuid4().hex[:10]}"
    reader = spark.readStream.format("pydelta")
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            raise TimeoutError("drain timeout")
        exc = q.exception()
        if exc is not None:
            raise RuntimeError(str(exc))
    finally:
        q.stop()
    return spark.table(sink)


def _three_commit_table(spark, tmp_path, name):
    path = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, float(i % 5) - 2.0) for i in range(40)], "k long, v double"
    )
    write_delta(spark, df.filter("k % 2 = 0").coalesce(1), path)
    delete_where(spark, path, "v < 0", mode="deletion-vectors")
    write_delta(
        spark, df.filter("k % 2 = 1").coalesce(1), path, mode="append"
    )
    return path


def test_skipchangecommits_skips_dv_commit_whole(spark, tmp_path):
    path = _three_commit_table(spark, tmp_path, "skip_dv")
    got = sorted(
        r.k for r in _drain(spark, path, skipChangeCommits="true").collect()
    )
    # both appends exactly once, soft-deleted rows included (append-log
    # semantics: row-level changes disregarded by declaration)
    assert got == list(range(40))


def test_dv_commit_fails_loudly_without_option(spark, tmp_path):
    path = _three_commit_table(spark, tmp_path, "nodv_opt")
    with pytest.raises(Exception, match="[dD]eletion vector|DV"):
        _drain(spark, path, ignoreDeletes="true")


def test_skipchangecommits_skips_update_rewrite(spark, tmp_path):
    path = str(tmp_path / "skip_upd")
    df = spark.createDataFrame([(i, 0.0) for i in range(10)], "k long, v double")
    write_delta(spark, df.coalesce(1), path)
    update_where(spark, path, "k < 3", {"v": "v + 1.0"})  # COW rewrite
    write_delta(
        spark,
        spark.createDataFrame([(100, 9.0)], "k long, v double"),
        path,
        mode="append",
    )
    got = sorted(
        r.k for r in _drain(spark, path, skipChangeCommits="true").collect()
    )
    assert got == list(range(10)) + [100]
    # the rewrite's files never re-emit — no duplicates of k<3
    assert len(got) == 11


def test_skipchangecommits_incompatible_with_cdf(spark, tmp_path):
    path = _three_commit_table(spark, tmp_path, "skip_cdf")
    with pytest.raises(Exception, match="do not compose"):
        _drain(
            spark, path, skipChangeCommits="true", readChangeFeed="true"
        ).collect()


def test_batch_read_still_applies_dv_after_stream(spark, tmp_path):
    """The stream disregards the DV; the batch read must still apply
    it — the two contracts coexist on one table."""
    path = _three_commit_table(spark, tmp_path, "skip_batch")
    batch = read_delta(spark, path)
    # the DV deleted the EVEN-key v<0 rows (the only rows at v1); the
    # second append's odd-key v<0 rows postdate the delete and survive
    neg = batch.filter(F.col("v") < 0)
    assert neg.filter(F.col("k") % 2 == 0).count() == 0
    assert neg.count() == 8
    stream_rows = _drain(spark, path, skipChangeCommits="true").count()
    assert stream_rows == 40
    assert batch.count() == 32


# ---------------------------------------------------------------------------
# Iceberg twin: streaming-skip-delete/overwrite-snapshots
# ---------------------------------------------------------------------------


def _drain_ice(spark, path, **options):
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        register_pyiceberg_stream,
    )

    register_pyiceberg_stream(spark)
    sink = f"iceskip_{uuid.uuid4().hex[:10]}"
    reader = spark.readStream.format("pyiceberg_stream")
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            raise TimeoutError("drain timeout")
        exc = q.exception()
        if exc is not None:
            raise RuntimeError(str(exc))
    finally:
        q.stop()
    return spark.table(sink)


def _three_snapshot_iceberg(spark, tmp_path, name):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, float(i % 5) - 2.0) for i in range(40)], "k long, v double"
    )
    write_iceberg(spark, df.filter("k % 2 = 0").coalesce(1), path)
    delete_where_iceberg(spark, path, "v < 0")
    write_iceberg(
        spark, df.filter("k % 2 = 1").coalesce(1), path, mode="append"
    )
    return path


def test_iceberg_skip_delete_snapshots(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import read_iceberg

    path = _three_snapshot_iceberg(spark, tmp_path, "ice_skip_del")
    got = sorted(
        r.k
        for r in _drain_ice(
            spark, path, **{"streaming-skip-delete-snapshots": "true"}
        ).collect()
    )
    assert got == list(range(40))
    # the batch read still applies the position deletes
    assert read_iceberg(spark, path).count() == 32


def test_iceberg_v2_stream_fails_without_skip_option(spark, tmp_path):
    path = _three_snapshot_iceberg(spark, tmp_path, "ice_noskip")
    with pytest.raises(Exception, match="format-version 2|DELETE"):
        _drain_ice(spark, path)


def test_iceberg_skip_overwrite_snapshots(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import write_iceberg

    path = str(tmp_path / "ice_skip_ovw")
    df = spark.createDataFrame([(i, 0.0) for i in range(10)], "k long, v double")
    write_iceberg(spark, df.coalesce(1), path)
    write_iceberg(
        spark,
        spark.createDataFrame([(50, 1.0)], "k long, v double"),
        path,
        mode="overwrite",
    )
    write_iceberg(
        spark,
        spark.createDataFrame([(60, 2.0)], "k long, v double"),
        path,
        mode="append",
    )
    got = sorted(
        r.k
        for r in _drain_ice(
            spark, path, **{"streaming-skip-overwrite-snapshots": "true"}
        ).collect()
    )
    # s1 appends 0..9, the overwrite is skipped whole, s3 appends 60
    assert got == list(range(10)) + [60]


# ---------------------------------------------------------------------------
# startingVersion (Delta) / stream-from-timestamp (Iceberg)
# ---------------------------------------------------------------------------


def test_delta_starting_version(spark, tmp_path):
    path = str(tmp_path / "startver")
    for lo in (0, 10, 20):
        write_delta(
            spark,
            spark.range(lo, lo + 10).selectExpr("id AS k").coalesce(1),
            path,
            mode="append" if lo else "overwrite",
        )
    got = sorted(
        r.k for r in _drain(spark, path, startingVersion="1").collect()
    )
    assert got == list(range(10, 30))  # v0's rows not replayed
    got_latest = _drain(spark, path, startingVersion="latest").count()
    assert got_latest == 0  # past the head: new commits only
    got_zero = sorted(
        r.k for r in _drain(spark, path, startingVersion="0").collect()
    )
    assert got_zero == list(range(30))
    with pytest.raises(Exception, match="startingVersion"):
        _drain(spark, path, startingVersion="not-a-number")


def test_iceberg_stream_from_timestamp(spark, tmp_path):
    import json
    import os

    from pyspark_excel_datasource_spark.sources.iceberg import (
        _current_metadata,
        write_iceberg,
    )

    path = str(tmp_path / "fromts")
    write_iceberg(
        spark, spark.range(0, 10).selectExpr("id AS k").coalesce(1), path
    )
    for lo in (10, 20):
        write_iceberg(
            spark,
            spark.range(lo, lo + 10).selectExpr("id AS k").coalesce(1),
            path,
            mode="append",
        )
    # force strictly-increasing, known timestamps so the boundary is
    # deterministic (wall-clock stamps may share a millisecond)
    meta_dir = os.path.join(path, "metadata")
    v = int(open(os.path.join(meta_dir, "version-hint.text")).read().strip())
    md_path = os.path.join(meta_dir, f"v{v}.metadata.json")
    md = json.load(open(md_path))
    for s in md["snapshots"]:
        s["timestamp-ms"] = 1000 * s["snapshot-id"]
    json.dump(md, open(md_path, "w"))
    assert [
        s["timestamp-ms"] for s in _current_metadata(path)["snapshots"]
    ] == [1000, 2000, 3000]
    got = sorted(
        r.k
        for r in _drain_ice(
            spark, path, **{"stream-from-timestamp": "2000"}
        ).collect()
    )
    assert got == list(range(10, 30))  # snapshot 1 consumed by declaration
    got_all = _drain_ice(
        spark, path, **{"stream-from-timestamp": "500"}
    ).count()
    assert got_all == 30
    got_none = _drain_ice(
        spark, path, **{"stream-from-timestamp": "999999"}
    ).count()
    assert got_none == 0
    with pytest.raises(Exception, match="stream-from-timestamp"):
        _drain_ice(spark, path, **{"stream-from-timestamp": "nope"})


def test_stream_fixture_cache_hits_on_second_call(spark):
    """ADVICE r14: the done markers must reference the LAST version the
    builders actually write (v2 Delta log / v3 Iceberg metadata) — the
    off-by-one made every invocation rmtree + rebuild the fixture,
    defeating the documented 'Idempotent per SF' cache."""
    from pyspark_excel_datasource_spark.sources.delta_queries import (
        _materialize_dv_stream_delta,
    )
    from pyspark_excel_datasource_spark.sources.iceberg_queries import (
        _materialize_del_stream_iceberg,
    )

    sf = "/root/testdata/sf0.001"
    p1 = _materialize_dv_stream_delta(spark, sf)
    marker = os.path.join(p1, "_delta_log", f"{0:020d}.json")
    ino = os.stat(marker).st_ino
    assert _materialize_dv_stream_delta(spark, sf) == p1
    assert os.stat(marker).st_ino == ino, "delta stream fixture was rebuilt"

    p2 = _materialize_del_stream_iceberg(spark, sf)
    m2 = os.path.join(p2, "metadata", "v1.metadata.json")
    ino2 = os.stat(m2).st_ino
    assert _materialize_del_stream_iceberg(spark, sf) == p2
    assert os.stat(m2).st_ino == ino2, "iceberg stream fixture was rebuilt"
