"""Iceberg v1 metadata tree: snapshots, time travel, manifest sharing,
status=2 filtering, atomic publish, format gates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.sources.iceberg import (
    IcebergFormatError,
    _read_avro,
    read_iceberg,
    snapshot_iceberg,
    snapshots,
    write_iceberg,
)

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return spark.read.parquet(os.path.join(SF, "nation.parquet"))


@pytest.fixture()
def three_snapshot_table(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    write_iceberg(spark, n.filter(F.col("n_regionkey") == 3), path, mode="overwrite")
    return path


def test_snapshot_resolution_and_time_travel(spark, three_snapshot_table):
    n = _nation(spark)
    assert read_iceberg(spark, three_snapshot_table).count() == n.filter(
        F.col("n_regionkey") == 3
    ).count()
    assert read_iceberg(spark, three_snapshot_table, snapshot_id=2).count() == n.count()
    assert read_iceberg(spark, three_snapshot_table, snapshot_id=1).count() == n.filter(
        F.col("n_regionkey") < 2
    ).count()
    with pytest.raises(ValueError):
        read_iceberg(spark, three_snapshot_table, snapshot_id=99)
    # full-row equality incl. all columns at the pre-overwrite snapshot
    got = {tuple(r) for r in read_iceberg(spark, three_snapshot_table, snapshot_id=2).collect()}
    cols = read_iceberg(spark, three_snapshot_table).columns
    assert got == {tuple(r) for r in n.select(*cols).collect()}


def test_appends_share_manifests(spark, three_snapshot_table):
    """s2's manifest list must reference s1's manifest unchanged (append
    never rewrites history), while s3 (overwrite) references only its own."""
    md = json.load(
        open(os.path.join(three_snapshot_table, "metadata", "v3.metadata.json"))
    )
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}

    def manifests(sid):
        p = os.path.join(three_snapshot_table, by_id[sid]["manifest-list"])
        return {m["manifest_path"] for m in _read_avro(p)}

    m1, m2, m3 = manifests(1), manifests(2), manifests(3)
    assert m1 < m2 and len(m2) == 2  # s2 = s1's manifest + its own
    assert len(m3) == 1 and not (m3 & m2)  # overwrite drops prior manifests


def test_deleted_status_entries_are_skipped(spark, tmp_path):
    """A manifest entry with status=2 (DELETED) must not contribute files."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n, path)
    snap = snapshot_iceberg(path)
    # rewrite the manifest marking one file deleted
    md = json.load(open(os.path.join(path, "metadata", "v1.metadata.json")))
    mlist = os.path.join(path, md["snapshots"][0]["manifest-list"])
    mpath = os.path.join(path, _read_avro(mlist)[0]["manifest_path"])
    entries = _read_avro(mpath)
    from pyspark_excel_datasource_spark.sources.iceberg import (
        _MANIFEST_SCHEMA,
        _write_avro,
    )

    rows = [
        (2 if i == 0 else e["status"], e["snapshot_id"], e["data_file"])
        for i, e in enumerate(entries)
    ]
    os.remove(mpath)
    _write_avro(mpath, _MANIFEST_SCHEMA, rows)
    after = snapshot_iceberg(path)
    assert len(after.files) == len(snap.files) - 1
    assert read_iceberg(spark, path).count() < n.count()


def test_snapshot_log_and_atomic_publish(spark, three_snapshot_table):
    ops = [(s["snapshot_id"], s["operation"]) for s in snapshots(three_snapshot_table)]
    assert ops == [(3, "overwrite"), (2, "append"), (1, "append")]
    # the next metadata version is claimed by O_EXCL create: a squatter wins
    from pyspark_excel_datasource_spark.sources.iceberg import (
        IcebergConcurrentCommitError,
    )

    squat = os.path.join(three_snapshot_table, "metadata", "v4.metadata.json")
    open(squat, "w").close()
    with pytest.raises(IcebergConcurrentCommitError):
        write_iceberg(spark, _nation(spark), three_snapshot_table, mode="append")


def test_format_version_gate(spark, tmp_path):
    """v2 became BATCH-readable in round 10 (position deletes — see
    test_iceberg_v2_deletes.py); v3+ still raises, and v2 MUTATIONS
    raise."""
    path = str(tmp_path / "t")
    write_iceberg(spark, _nation(spark), path)
    meta = os.path.join(path, "metadata", "v1.metadata.json")
    md = json.load(open(meta))
    md["format-version"] = 2
    json.dump(md, open(meta, "w"))
    assert read_iceberg(spark, path).count() == _nation(spark).count()
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        write_iceberg(spark, _nation(spark), path, mode="append")
    md["format-version"] = 3
    json.dump(md, open(meta, "w"))
    with pytest.raises(IcebergFormatError, match="format-version"):
        read_iceberg(spark, path)


def test_roundtrip_types(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.5, True)], "id long, s string, d double, b boolean"
    )
    write_iceberg(spark, df, path)
    back = read_iceberg(spark, path)
    assert back.schema == df.schema
    assert [tuple(r) for r in back.collect()] == [(1, "a", 1.5, True)]


def test_identity_partitions_roundtrip_and_prune(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n, path, partition_by=("n_regionkey",))
    write_iceberg(spark, n, path, mode="append", partition_by=("n_regionkey",))
    back = read_iceberg(spark, path)
    assert back.count() == 2 * n.count()
    # the partition column (absent from the data files) attaches losslessly
    got = {tuple(r) for r in back.distinct().collect()}
    assert got == {tuple(r) for r in n.select(*back.columns).collect()}
    # manifest-entry pruning: only region-3 files are listed and scanned
    pruned = read_iceberg(spark, path, partition_filter={"n_regionkey": {"3"}})
    assert pruned.count() == 2 * n.filter(F.col("n_regionkey") == 3).count()
    snap = snapshot_iceberg(path)
    r3 = [p for p, pv in snap.files.items() if pv["n_regionkey"] == "3"]
    assert len(pruned.inputFiles()) == len(r3)
    with pytest.raises(ValueError):
        read_iceberg(spark, path, partition_filter={"n_name": {"x"}})
    # append with a different spec is rejected
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg(spark, n, path, mode="append")


def test_time_travel_survives_schema_and_spec_change(spark, tmp_path):
    """Overwriting with a different schema AND partitioning must not
    change how OLD snapshots read: each snapshot resolves through its
    own schema-id / spec-id."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(
        spark, n.select("n_nationkey", "n_name", "n_regionkey"), path,
        partition_by=("n_regionkey",),
    )
    write_iceberg(
        spark, n.select("n_nationkey", "n_name"), path, mode="overwrite"
    )
    # head: new schema, unpartitioned
    head = read_iceberg(spark, path)
    assert head.columns == ["n_nationkey", "n_name"]
    # snapshot 1: old schema incl. the partition column, fully populated
    old = read_iceberg(spark, path, snapshot_id=1)
    assert old.columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert old.filter(F.col("n_regionkey").isNull()).count() == 0
    got = {tuple(r) for r in old.collect()}
    assert got == {
        tuple(r) for r in n.select("n_nationkey", "n_name", "n_regionkey").collect()
    }


def test_append_schema_mismatch_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.select("n_nationkey", "n_name"), path)
    with pytest.raises(ValueError, match="overwrite"):
        write_iceberg(
            spark, n.select("n_nationkey", "n_name", "n_regionkey"), path,
            mode="append",
        )
    with pytest.raises(ValueError, match="overwrite"):
        write_iceberg(
            spark,
            n.select(F.col("n_nationkey").cast("string").alias("n_nationkey"),
                     "n_name"),
            path,
            mode="append",
        )


def test_rewrite_data_files_compacts_without_changing_rows(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import rewrite_data_files

    path = str(tmp_path / "compact")
    n = _nation(spark)
    write_iceberg(spark, n.repartition(4), path)
    write_iceberg(spark, n.repartition(4), path, mode="append")
    before = {tuple(r) for r in read_iceberg(spark, path).collect()}
    stats = rewrite_data_files(spark, path, target_files=1)
    assert stats["files_before"] == 8
    assert stats["files_after"] == 1
    after = {tuple(r) for r in read_iceberg(spark, path).collect()}
    assert after == before  # as a set: the append duplicated every row
    assert read_iceberg(spark, path).count() == 2 * n.count()
    # recorded as a `replace` snapshot, and history is still navigable
    trail = snapshots(path)
    assert trail[0]["operation"] == "replace"
    assert read_iceberg(spark, path, snapshot_id=1).count() == n.count()


def test_rewrite_data_files_partitioned_one_file_per_partition(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import rewrite_data_files

    path = str(tmp_path / "compact_part")
    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    part = n.withColumn("rk", F.col("n_regionkey").cast("string")).drop("n_regionkey")
    write_iceberg(spark, part.repartition(3), path, partition_by=("rk",))
    write_iceberg(spark, part.repartition(3), path, mode="append", partition_by=("rk",))
    rewrite_data_files(spark, path, target_files=1)
    snap = snapshot_iceberg(path)
    per_part: dict[str, int] = {}
    for pv in snap.files.values():
        per_part[pv["rk"]] = per_part.get(pv["rk"], 0) + 1
    assert set(per_part.values()) == {1}
    assert read_iceberg(spark, path).count() == 2 * n.count()
    # partition values still attach (manifest-metadata path, not file data)
    got = read_iceberg(spark, path, partition_filter={"rk": {"3"}})
    assert got.count() == 2 * n.filter(F.col("n_regionkey") == 3).count()


def test_expire_snapshots_reachability_gc(spark, tmp_path, three_snapshot_table):
    from pyspark_excel_datasource_spark.sources.iceberg import expire_snapshots

    path = three_snapshot_table
    cur_before = {tuple(r) for r in read_iceberg(spark, path).collect()}
    data_dir = os.path.join(path, "data")
    files_before = len(os.listdir(data_dir))
    stats = expire_snapshots(path, keep_last=1)
    assert stats["expired_snapshots"] == 2
    assert stats["deleted_data_files"] > 0
    # current snapshot untouched, expired ids now unknown
    assert {tuple(r) for r in read_iceberg(spark, path).collect()} == cur_before
    for sid in (1, 2):
        with pytest.raises(ValueError):
            read_iceberg(spark, path, snapshot_id=sid)
    assert len(snapshots(path)) == 1
    assert len(os.listdir(data_dir)) == files_before - stats["deleted_data_files"]
    # expiring again is a no-op
    again = expire_snapshots(path, keep_last=1)
    assert again == {
        "expired_snapshots": 0,
        "deleted_manifests": 0,
        "deleted_data_files": 0,
    }


def test_expire_snapshots_keeps_shared_manifests_alive(spark, tmp_path):
    """An append chain shares manifests: expiring s1 while keeping s2+s3
    must delete NOTHING s2/s3 still reference (s1's manifest and files
    are reachable from both retained snapshots)."""
    from pyspark_excel_datasource_spark.sources.iceberg import expire_snapshots

    path = str(tmp_path / "chain")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    write_iceberg(spark, n.limit(0), path, mode="append")
    full = read_iceberg(spark, path).count()
    stats = expire_snapshots(path, keep_last=2)
    assert stats["expired_snapshots"] == 1
    assert stats["deleted_data_files"] == 0
    # only s1's manifest LIST goes; its manifest itself is shared/live
    assert stats["deleted_manifests"] == 1
    assert read_iceberg(spark, path).count() == full == n.count()


def test_expire_snapshots_guards(spark, three_snapshot_table):
    from pyspark_excel_datasource_spark.sources.iceberg import expire_snapshots

    with pytest.raises(ValueError):
        expire_snapshots(three_snapshot_table, keep_last=0)


def test_manifest_record_counts_are_real(spark, three_snapshot_table):
    """Every manifest entry's record_count must equal the data file's
    actual row count (the spec field scan planners size tasks with)."""
    import glob

    total = 0
    for m in glob.glob(
        os.path.join(three_snapshot_table, "metadata", "*-m0.avro")
    ):
        for entry in _read_avro(m):
            df_rec = entry["data_file"]
            path = os.path.join(three_snapshot_table, df_rec["file_path"])
            import pyarrow.parquet as pq

            assert df_rec["record_count"] == pq.read_metadata(path).num_rows
            assert df_rec["record_count"] >= 0
            total += df_rec["record_count"]
    assert total > 0


def test_rewrite_data_files_target_gt_one_partitioned(spark, tmp_path):
    """target_files > 1 on a partitioned table must actually split each
    identity partition across multiple files (salted shuffle), not
    silently collapse to one file per partition."""
    from pyspark_excel_datasource_spark.sources.iceberg import rewrite_data_files

    path = str(tmp_path / "compact_split")
    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    part = n.withColumn("rk", F.col("n_regionkey").cast("string")).drop("n_regionkey")
    write_iceberg(spark, part.repartition(6), path, partition_by=("rk",))
    rewrite_data_files(spark, path, target_files=3)
    snap = snapshot_iceberg(path)
    per_part: dict[str, int] = {}
    for pv in snap.files.values():
        per_part[pv["rk"]] = per_part.get(pv["rk"], 0) + 1
    assert all(1 <= v <= 3 for v in per_part.values()), per_part
    assert max(per_part.values()) > 1, f"salt had no effect: {per_part}"
    assert read_iceberg(spark, path).count() == n.count()


def test_rewrite_data_files_concurrent_append_raises(spark, tmp_path):
    """Read-modify-write OCC: an append landing between the rewrite's
    content read and its publish must fail the rewrite loudly instead of
    silently erasing the appended rows."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        IcebergConcurrentCommitError,
        _current_metadata,
    )

    path = str(tmp_path / "race")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    base = _current_metadata(path)["_version"]
    df = read_iceberg(spark, path)
    # concurrent writer commits between read and publish
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    with pytest.raises(IcebergConcurrentCommitError):
        write_iceberg(
            spark, df, path, mode="overwrite",
            operation="replace", base_version=base,
        )
    # the loser changed nothing: both writers' rows are present
    assert read_iceberg(spark, path).count() == n.count()


def test_lost_commit_race_leaves_no_orphan_files(spark, tmp_path):
    """The loser of a commit race must clean up the data files,
    manifest, and manifest list it staged: nothing (expire_snapshots
    included — it only deletes files reachable from expired snapshots)
    would ever reclaim them otherwise, and a raced rewrite would strand
    a full duplicate copy of the table's data."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        IcebergConcurrentCommitError,
        _current_metadata,
        _reachable,
    )

    path = str(tmp_path / "race_gc")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    base = _current_metadata(path)["_version"]
    df = read_iceberg(spark, path)
    write_iceberg(spark, n.filter(F.col("n_regionkey") >= 2), path, mode="append")
    with pytest.raises(IcebergConcurrentCommitError):
        write_iceberg(
            spark, df, path, mode="overwrite",
            operation="replace", base_version=base,
        )
    # every physical file under the table root is reachable from some
    # retained snapshot — the failed commit left no orphans
    md = _current_metadata(path)
    manifests, data = _reachable(path, md["snapshots"])
    mlists = {s["manifest-list"] for s in md["snapshots"]}
    on_disk_data = {
        os.path.join("data", f) for f in os.listdir(os.path.join(path, "data"))
    }
    on_disk_avro = {
        os.path.join("metadata", f)
        for f in os.listdir(os.path.join(path, "metadata"))
        if f.endswith(".avro")
    }
    assert on_disk_data == {os.path.normpath(p) for p in data}
    assert on_disk_avro == {
        os.path.normpath(p) for p in (manifests | mlists)
    }


def test_rewrite_twice_same_content_same_layout(spark, tmp_path):
    """The compaction salt derives from row content, not physical
    partition layout: rewriting identical content twice produces the
    same per-identity-partition file counts."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        files_meta,
        rewrite_data_files,
    )

    path = str(tmp_path / "det_salt")
    n = _nation(spark)
    write_iceberg(spark, n.repartition(7), path, partition_by=("n_regionkey",))

    def layout():
        counts: dict = {}
        for f in files_meta(path):
            key = tuple(sorted(f["partition"].items()))
            counts[key] = counts.get(key, 0) + 1
        return counts

    rewrite_data_files(spark, path, target_files=3)
    first = layout()
    rewrite_data_files(spark, path, target_files=3)
    assert layout() == first


def test_files_meta_format_gate(spark, tmp_path):
    """files_meta shares snapshot resolution's guards: v2 is readable
    (round 10), v3+ raises instead of being silently misread."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        IcebergFormatError,
        files_meta,
    )

    path = str(tmp_path / "v2gate")
    write_iceberg(spark, _nation(spark), path)
    meta = os.path.join(path, "metadata", "v1.metadata.json")
    md = json.load(open(meta))
    md["format-version"] = 2
    json.dump(md, open(meta, "w"))
    assert len(files_meta(path)) >= 1
    md["format-version"] = 3
    json.dump(md, open(meta, "w"))
    with pytest.raises(IcebergFormatError):
        files_meta(path)


def test_rewrite_data_files_sorted_layout(spark, tmp_path):
    """sort_by compaction: range partitioning + local sort yields files
    that are internally sorted with DISJOINT key ranges (the layout
    footer-stat pruning needs), with content unchanged."""
    import pyarrow.parquet as pq

    from pyspark_excel_datasource_spark.sources.iceberg import (
        files_meta,
        rewrite_data_files,
    )

    path = str(tmp_path / "sorted")
    n = _nation(spark)
    write_iceberg(spark, n.repartition(5), path)
    before = {tuple(r) for r in read_iceberg(spark, path).collect()}
    stats = rewrite_data_files(
        spark, path, target_files=3, sort_by=("n_nationkey",)
    )
    assert stats["files_after"] == 3
    ranges = []
    for f in files_meta(path):
        keys = pq.read_table(
            os.path.join(path, f["file_path"]), columns=["n_nationkey"]
        )["n_nationkey"].to_pylist()
        assert keys == sorted(keys), "file not internally sorted"
        ranges.append((min(keys), max(keys)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {ranges}"
    assert {tuple(r) for r in read_iceberg(spark, path).collect()} == before


def test_convert_delta_to_iceberg_lossless_and_first_class(spark, tmp_path):
    """Metadata-only migration: identical row sets through both readers
    with zero data files copied; the converted table accepts NATIVE
    Iceberg appends afterwards (new files under the Iceberg location,
    shared converted manifest), time-travels across the conversion
    boundary, and refuses to convert onto an existing table."""
    from pyspark_excel_datasource_spark.sources.deltalog import (
        read_delta,
        write_delta,
    )
    from pyspark_excel_datasource_spark.sources.iceberg import (
        convert_delta_to_iceberg,
    )

    dsrc, idst = str(tmp_path / "d"), str(tmp_path / "i")
    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    part = n.withColumn("rk", F.col("n_regionkey").cast("string")).drop(
        "n_regionkey"
    )
    write_delta(spark, part.filter("n_nationkey < 10"), dsrc,
                mode="append", partition_by=("rk",))
    write_delta(spark, part.filter("n_nationkey >= 10"), dsrc,
                mode="append", partition_by=("rk",))
    sid = convert_delta_to_iceberg(spark, dsrc, idst)
    assert sid == 1
    via_delta = {tuple(r) for r in read_delta(spark, dsrc).collect()}
    cols = read_delta(spark, dsrc).columns
    via_ice = {
        tuple(r) for r in read_iceberg(spark, idst).select(*cols).collect()
    }
    assert via_ice == via_delta
    # zero data files under the Iceberg location (metadata only)
    assert os.listdir(os.path.join(idst, "data")) == []
    # manifest pruning works on converted partition values
    got = read_iceberg(spark, idst, partition_filter={"rk": {"3"}})
    assert got.count() == n.filter(F.col("n_regionkey") == 3).count()
    # native append after conversion: first-class Iceberg table
    write_iceberg(spark, part.limit(5), idst, mode="append",
                  partition_by=("rk",))
    assert read_iceberg(spark, idst).count() == n.count() + 5
    assert read_iceberg(spark, idst, snapshot_id=1).count() == n.count()
    assert len(os.listdir(os.path.join(idst, "data"))) > 0
    # refuse double-conversion
    with pytest.raises(ValueError, match="already an Iceberg table"):
        convert_delta_to_iceberg(spark, dsrc, idst)


def test_convert_iceberg_to_delta_lossless_and_first_class(spark, tmp_path):
    """Reverse migration: Iceberg snapshot → Delta v0, identical rows
    through both readers, native Delta append + time travel afterwards,
    double-conversion refused."""
    from pyspark_excel_datasource_spark.sources.deltalog import (
        read_delta,
        write_delta,
    )
    from pyspark_excel_datasource_spark.sources.iceberg import (
        convert_iceberg_to_delta,
    )

    isrc, ddst = str(tmp_path / "i"), str(tmp_path / "d")
    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    part = n.withColumn("rk", F.col("n_regionkey").cast("string")).drop(
        "n_regionkey"
    )
    write_iceberg(spark, part.filter("n_nationkey < 10"), isrc,
                  partition_by=("rk",))
    write_iceberg(spark, part.filter("n_nationkey >= 10"), isrc,
                  mode="append", partition_by=("rk",))
    assert convert_iceberg_to_delta(spark, isrc, ddst) == 0
    cols = read_iceberg(spark, isrc).columns
    via_ice = {tuple(r) for r in read_iceberg(spark, isrc).collect()}
    via_delta = {
        tuple(r) for r in read_delta(spark, ddst).select(*cols).collect()
    }
    assert via_delta == via_ice
    # native Delta append works on the converted table
    write_delta(spark, part.limit(5), ddst, mode="append",
                partition_by=("rk",))
    assert read_delta(spark, ddst).count() == n.count() + 5
    assert read_delta(spark, ddst, version=0).count() == n.count()
    with pytest.raises(ValueError, match="already a Delta table"):
        convert_iceberg_to_delta(spark, isrc, ddst)


def test_convert_roundtrip_delta_iceberg_delta(spark, tmp_path):
    """Delta → Iceberg → Delta round trip preserves the exact row set
    with zero data movement at every hop."""
    from pyspark_excel_datasource_spark.sources.deltalog import (
        read_delta,
        write_delta,
    )
    from pyspark_excel_datasource_spark.sources.iceberg import (
        convert_delta_to_iceberg,
        convert_iceberg_to_delta,
    )

    d0, i1, d2 = (str(tmp_path / x) for x in ("d0", "i1", "d2"))
    n = _nation(spark)
    write_delta(spark, n, d0, mode="append")
    convert_delta_to_iceberg(spark, d0, i1)
    convert_iceberg_to_delta(spark, i1, d2)
    a = {tuple(r) for r in read_delta(spark, d0).collect()}
    c = {tuple(r) for r in read_delta(spark, d2).select(*read_delta(spark, d0).columns).collect()}
    assert a == c
    assert os.listdir(os.path.join(i1, "data")) == []


def test_expire_never_deletes_converted_source_files(spark, tmp_path):
    """GC protection for metadata-only conversions: compacting and then
    expiring the CONVERTED table must not touch the source Delta table's
    data files (absolute external paths are never this table's storage
    to reclaim)."""
    from pyspark_excel_datasource_spark.sources.deltalog import (
        read_delta,
        write_delta,
    )
    from pyspark_excel_datasource_spark.sources.iceberg import (
        convert_delta_to_iceberg,
        expire_snapshots,
        rewrite_data_files,
    )

    dsrc, idst = str(tmp_path / "d"), str(tmp_path / "i")
    n = _nation(spark)
    write_delta(spark, n, dsrc, mode="append")
    before = {tuple(r) for r in read_delta(spark, dsrc).collect()}
    convert_delta_to_iceberg(spark, dsrc, idst)
    rewrite_data_files(spark, idst, target_files=1)  # replace snapshot
    stats = expire_snapshots(idst, keep_last=1)
    assert stats["expired_snapshots"] == 1
    # the converted snapshot's files were external -> nothing deleted
    assert stats["deleted_data_files"] == 0
    # the source Delta table is fully intact
    assert {tuple(r) for r in read_delta(spark, dsrc).collect()} == before
    # and the compacted Iceberg head still reads
    assert read_iceberg(spark, idst).count() == n.count()


def test_scan_iceberg_pruned_plans_fraction_of_files(spark):
    """q_scan_iceberg_pruned's partition_filter must prune at the
    manifest-entry level: only the O partition's files are planned."""
    from pyspark_excel_datasource_spark.sources.iceberg_queries import (
        _materialize_orders_iceberg_part,
    )

    path = _materialize_orders_iceberg_part(spark, "/root/testdata/sf0.001")
    full = read_iceberg(spark, path)
    pruned = read_iceberg(
        spark, path, partition_filter={"o_orderstatus": {"O"}}
    )
    n_full, n_pruned = len(full.inputFiles()), len(pruned.inputFiles())
    assert 0 < n_pruned < n_full
    # three live statuses (F/O/P): O's share must be well under half
    assert n_pruned * 2 < n_full, (n_pruned, n_full)


def test_rewrite_provenance_inherits_null_snapshot_ids(spark, tmp_path):
    """Externally-produced tables may rely on snapshot-id INHERITANCE:
    manifest entries carry a null snapshot_id and the manifest-list's
    added_snapshot_id supplies it. rewrite_data_files must still record
    those snapshots in replaced-snapshot-ids (the streaming loss guard
    keys off them), not silently drop the rows from provenance."""
    import json
    import os

    from pyspark_excel_datasource_spark.sources.iceberg import (
        _current_metadata,
        _manifest_schema,
        _read_avro,
        _resolve_snapshot_md,
        _write_avro,
        rewrite_data_files,
    )

    path = str(tmp_path / "inherit")
    n = _nation(spark)
    write_iceberg(spark, n, path)
    write_iceberg(spark, n, path, mode="append")

    # simulate the external writer: null every manifest entry's
    # snapshot_id (inheritance form) — the manifest-list keeps
    # added_snapshot_id
    md = _current_metadata(path)
    snap_md = _resolve_snapshot_md(md, None)
    mlist = snap_md["manifest-list"]
    mlist = mlist if os.path.isabs(mlist) else os.path.join(path, mlist)
    for m in _read_avro(mlist):
        assert m["added_snapshot_id"] is not None
        mpath = m["manifest_path"]
        mpath = mpath if os.path.isabs(mpath) else os.path.join(path, mpath)
        rows = []
        for e in _read_avro(mpath):
            d = e["data_file"]
            # top level is positional (tuple), nested records are
            # name-keyed dicts — matching _write_avro's encoder shape
            rows.append(
                (
                    e["status"],
                    None,  # inherited
                    {
                        "file_path": d["file_path"],
                        "file_format": d["file_format"],
                        "partition": {},
                        "record_count": d["record_count"],
                        "file_size_in_bytes": d["file_size_in_bytes"],
                    },
                )
            )
        _write_avro(mpath, _manifest_schema(()), rows)

    stats = rewrite_data_files(spark, path, target_files=1)
    md2 = _current_metadata(path)
    snap = next(
        s for s in md2["snapshots"] if s["snapshot-id"] == stats["snapshot_id"]
    )
    assert set(snap["summary"]["replaced-snapshot-ids"]) == {1, 2}
    assert read_iceberg(spark, path).count() == 2 * n.count()


def _evolved_table(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        evolve_partition_spec,
    )

    path = str(tmp_path / "evo")
    df = spark.createDataFrame(
        [(i, f"r{i % 2}", f"s{i % 3}", float(i)) for i in range(60)],
        "id int, region string, seg string, v double",
    )
    write_iceberg(spark, df.filter("id < 30"), path, partition_by=("region",))
    evolve_partition_spec(path, ("seg",))
    write_iceberg(
        spark, df.filter("id >= 30"), path, mode="append", partition_by=("seg",)
    )
    return path, df


def test_partition_evolution_is_metadata_only(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        evolve_partition_spec,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n, path, partition_by=("n_regionkey",))
    files_before = set(snapshot_iceberg(path).files)
    snaps_before = len(snapshots(path))
    evolve_partition_spec(path, ("n_nationkey",))
    # no new snapshot, no file moved — one metadata version only
    assert len(snapshots(path)) == snaps_before
    assert set(snapshot_iceberg(path).files) == files_before
    with pytest.raises(ValueError, match="already partitioned"):
        evolve_partition_spec(path, ("n_nationkey",))
    with pytest.raises(ValueError, match="not in schema"):
        evolve_partition_spec(path, ("nope",))


def test_partition_evolution_mixed_spec_read_and_prune(spark, tmp_path):
    path, df = _evolved_table(spark, tmp_path)
    snap = snapshot_iceberg(path)
    # files genuinely span two specs
    assert sorted(map(tuple, snap.spec_pcols.values())) == [("region",), ("seg",)]
    got = read_iceberg(spark, path)
    assert got.count() == 60
    assert got.schema.simpleString() == df.schema.simpleString()
    # census across the evolution boundary is lossless
    assert sorted(
        map(tuple, got.groupBy("region", "seg").count().collect())
    ) == sorted(map(tuple, df.groupBy("region", "seg").count().collect()))
    # prune on the OLD spec column, the NEW one, and both at once
    for filt, cond in [
        ({"region": {"r0"}}, "region='r0'"),
        ({"seg": {"s1"}}, "seg='s1'"),
        ({"region": {"r0"}, "seg": {"s1"}}, "region='r0' and seg='s1'"),
    ]:
        assert (
            read_iceberg(spark, path, partition_filter=filt).count()
            == df.filter(cond).count()
        ), filt


def test_partition_evolution_prunes_new_spec_files_at_manifest_level(
    spark, tmp_path
):
    path, df = _evolved_table(spark, tmp_path)
    snap = snapshot_iceberg(path)
    by_spec = {}
    for p, sid in snap.files_pspec.items():
        by_spec.setdefault(tuple(snap.spec_pcols[sid]), set()).add(p)
    # a seg filter keeps every old-spec file (seg lives in their data)
    # but drops the non-matching new-spec files before any IO
    seg_files = by_spec[("seg",)]
    kept = {
        p
        for p, pv in snap.files.items()
        if p not in seg_files or pv.get("seg") == "s1"
    }
    assert len(kept) < len(snap.files)
    got = read_iceberg(spark, path, partition_filter={"seg": {"s1"}})
    scanned = {
        os.path.relpath(f.replace("file:", ""), path) for f in got.inputFiles()
    }
    assert scanned == kept


def test_partition_evolution_time_travel_uses_snapshot_spec(spark, tmp_path):
    path, df = _evolved_table(spark, tmp_path)
    # snapshot 1 predates the evolution: single-spec read, old pcols
    old = read_iceberg(spark, path, snapshot_id=1)
    assert old.count() == 30
    assert sorted(map(tuple, old.groupBy("region").count().collect())) == sorted(
        map(tuple, df.filter("id < 30").groupBy("region").count().collect())
    )
    snap1 = snapshot_iceberg(path, snapshot_id=1)
    assert snap1.partition_columns == ["region"]


def test_append_after_evolution_must_use_current_spec(spark, tmp_path):
    path, _df = _evolved_table(spark, tmp_path)
    extra = spark.createDataFrame(
        [(100, "r0", "s0", 1.0)], "id int, region string, seg string, v double"
    )
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg(
            spark, extra, path, mode="append", partition_by=("region",)
        )


def test_evolution_back_reactivates_prior_spec_id(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        evolve_partition_spec,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n, path, partition_by=("n_regionkey",))
    sid_b = evolve_partition_spec(path, ("n_nationkey",))
    sid_a = evolve_partition_spec(path, ("n_regionkey",))
    assert sid_b == 1 and sid_a == 0  # registry reuse, not a new id


def test_branch_commits_are_isolated_from_main(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import create_ref

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    create_ref(path, "wip", "branch")
    create_ref(path, "rel", "tag")
    # main advances; branch stays at its head
    write_iceberg(spark, n.filter(F.col("n_regionkey") == 2), path, mode="append")
    # branch advances from ITS head (not main's): carries regions 0-1
    write_iceberg(
        spark, n.filter(F.col("n_regionkey") == 4), path,
        mode="append", branch="wip",
    )
    main = read_iceberg(spark, path)
    wip = read_iceberg(spark, path, ref="wip")
    rel = read_iceberg(spark, path, ref="rel")
    assert sorted(r.n_regionkey for r in main.select("n_regionkey").distinct().collect()) == [0, 1, 2]
    assert sorted(r.n_regionkey for r in wip.select("n_regionkey").distinct().collect()) == [0, 1, 4]
    assert sorted(r.n_regionkey for r in rel.select("n_regionkey").distinct().collect()) == [0, 1]


def test_ref_validation(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        create_ref,
        drop_ref,
    )

    path = str(tmp_path / "t")
    write_iceberg(spark, _nation(spark), path)
    create_ref(path, "b", "branch")
    create_ref(path, "t1", "tag")
    with pytest.raises(ValueError, match="already exists"):
        create_ref(path, "b")
    with pytest.raises(ValueError, match="implicit branch"):
        create_ref(path, "main")
    with pytest.raises(ValueError, match="branch\\|tag"):
        create_ref(path, "x", "commit")
    with pytest.raises(ValueError, match="not in table history"):
        create_ref(path, "x", "branch", snapshot_id=999)
    with pytest.raises(ValueError, match="is a tag"):
        write_iceberg(spark, _nation(spark), path, mode="append", branch="t1")
    with pytest.raises(ValueError, match="unknown branch"):
        write_iceberg(spark, _nation(spark), path, mode="append", branch="nope")
    with pytest.raises(ValueError, match="unknown ref"):
        read_iceberg(spark, path, ref="nope")
    with pytest.raises(ValueError, match="unknown ref"):
        drop_ref(path, "nope")
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, path, snapshot_id=1, ref="b")


def test_expire_retains_ref_heads_until_dropped(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        create_ref,
        drop_ref,
        expire_snapshots,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n.filter(F.col("n_regionkey") < 2), path)
    create_ref(path, "keepme", "tag")
    write_iceberg(spark, n, path, mode="overwrite")
    # the tag pins snapshot 1 across an expiry that would drop it
    res = expire_snapshots(path, keep_last=1)
    assert res["expired_snapshots"] == 0
    assert read_iceberg(spark, path, ref="keepme").count() == n.filter(
        F.col("n_regionkey") < 2
    ).count()
    drop_ref(path, "keepme")
    res2 = expire_snapshots(path, keep_last=1)
    assert res2["expired_snapshots"] == 1
    assert read_iceberg(spark, path).count() == n.count()


def test_mor_delete_writes_no_data_bytes(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
    )

    path = str(tmp_path / "t")
    cust = spark.read.parquet(os.path.join(SF, "customer.parquet")).select(
        "c_custkey", "c_acctbal"
    )
    write_iceberg(spark, cust.repartitionByRange(4, "c_custkey"), path)
    before = snapshot_iceberg(path)
    sizes = {p: os.path.getsize(os.path.join(path, p)) for p in before.files}
    n_neg = cust.filter(F.col("c_acctbal") < 0).count()
    res = delete_where_iceberg(spark, path, "c_acctbal < 0")
    assert res["rows_deleted"] == n_neg and res["files_touched"] >= 1
    after = snapshot_iceberg(path)
    # same data files, byte-identical; the delete lives in metadata
    assert set(after.files) == set(before.files)
    for p, sz in sizes.items():
        assert os.path.getsize(os.path.join(path, p)) == sz
    assert after.pos_delete_rows == n_neg
    got = read_iceberg(spark, path)
    assert got.count() == cust.count() - n_neg
    assert got.filter(F.col("c_acctbal") < 0).count() == 0
    # pre-delete snapshot still reads complete (time travel)
    assert (
        read_iceberg(spark, path, snapshot_id=before.snapshot_id).count()
        == cust.count()
    )
    # NULL predicate keeps rows; no-match is a no-op commit
    res2 = delete_where_iceberg(spark, path, "c_acctbal < -999999")
    assert res2["rows_deleted"] == 0
    assert res2["snapshot_id"] == after.snapshot_id


def test_mor_deletes_compose_and_append_reads_through(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_iceberg(spark, n, path)
    delete_where_iceberg(spark, path, "n_regionkey = 0")
    delete_where_iceberg(spark, path, "n_regionkey = 1")
    exp = n.filter("n_regionkey >= 2")
    assert read_iceberg(spark, path).count() == exp.count()
    # the upgraded (v2 + marker) table stays writable by this module
    extra = n.filter("n_regionkey = 0").limit(2)
    write_iceberg(spark, extra, path, mode="append")
    got = read_iceberg(spark, path)
    # appended rows are NOT hit by the old position deletes (new files)
    assert got.count() == exp.count() + 2


def test_mor_delete_folds_away_under_compaction_and_expiry(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
        expire_snapshots,
        rewrite_data_files,
    )

    path = str(tmp_path / "t")
    cust = spark.read.parquet(os.path.join(SF, "customer.parquet")).select(
        "c_custkey", "c_acctbal"
    )
    write_iceberg(spark, cust.repartition(4), path)
    delete_where_iceberg(spark, path, "c_acctbal < 0")
    exp = cust.filter("c_acctbal >= 0").count()
    rewrite_data_files(spark, path, target_files=2)
    snap = snapshot_iceberg(path)
    assert not snap.pos_delete_files  # folded into data
    assert read_iceberg(spark, path).count() == exp
    res = expire_snapshots(path, keep_last=1)
    assert res["expired_snapshots"] == 2
    assert res["deleted_data_files"] >= 5  # 4 data + 1 delete parquet
    assert read_iceberg(spark, path).count() == exp


def test_external_v2_tables_stay_read_only(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
    )

    path = str(tmp_path / "t")
    write_iceberg(spark, _nation(spark), path)
    meta = os.path.join(path, "metadata", "v1.metadata.json")
    md = json.load(open(meta))
    md["format-version"] = 2  # externally-upgraded: no writer marker
    json.dump(md, open(meta, "w"))
    assert read_iceberg(spark, path).count() == _nation(spark).count()
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        delete_where_iceberg(spark, path, "n_regionkey = 0")
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        write_iceberg(spark, _nation(spark), path, mode="append")


def test_stream_rejects_mor_deleted_table(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
    )
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        IcebergStreamReader,
    )

    path = str(tmp_path / "t")
    write_iceberg(spark, _nation(spark), path)
    delete_where_iceberg(spark, path, "n_regionkey = 0")
    # the reader's format gate fires at construction: streaming would
    # re-emit whole files, resurrecting the position-deleted rows
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        IcebergStreamReader(snapshot_iceberg(path).schema, {"path": path})


def test_upsert_equality_deletes_one_commit(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        upsert_iceberg,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id int, s string"
    )
    write_iceberg(spark, df, path)
    before = snapshot_iceberg(path)
    sizes = {p: os.path.getsize(os.path.join(path, p)) for p in before.files}
    up = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (42, "ins42")], "id int, s string"
    )
    upsert_iceberg(spark, up, path, on=["id"])
    after = snapshot_iceberg(path)
    # pre-existing data files untouched byte-for-byte; one commit only
    for p, sz in sizes.items():
        assert p in after.files
        assert os.path.getsize(os.path.join(path, p)) == sz
    assert len(snapshots(path)) == 2
    got = {r.id: r.s for r in read_iceberg(spark, path).collect()}
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[42] == "ins42"
    assert got[5] == "v5" and len(got) == 11
    # the upsert's own rows escape its equality deletes (seq rule)
    assert 3 in got and 7 in got
    # time travel to the seed snapshot is unaffected
    assert read_iceberg(spark, path, snapshot_id=1).count() == 10


def test_upsert_validation_and_null_keys(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        upsert_iceberg,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (None, "null-key"), (2, "b")], "id int, s string"
    )
    write_iceberg(spark, df, path)
    with pytest.raises(ValueError, match="empty key list"):
        upsert_iceberg(spark, df, path, on=[])
    with pytest.raises(ValueError, match="not in schema"):
        upsert_iceberg(spark, df, path, on=["nope"])
    with pytest.raises(ValueError, match="!= table schema"):
        upsert_iceberg(
            spark,
            spark.createDataFrame([(1,)], "id int"),
            path,
            on=["id"],
        )
    # NULL keys replace null-keyed rows (null-safe equality join)
    up = spark.createDataFrame([(None, "NEWNULL")], "id int, s string")
    upsert_iceberg(spark, up, path, on=["id"])
    got = {r.s for r in read_iceberg(spark, path).collect()}
    assert got == {"a", "b", "NEWNULL"}


def test_sorted_pruned_probe_matches_recompute(spark):
    """q_iceberg_sorted_pruned (round 12) must agree with a live Spark
    recompute of the key-range census and report files_pruned=1 — the
    sort-order rewrite's manifest bounds provably skip files."""
    from pyspark.sql import functions as F

    from pyspark_excel_datasource_spark.catalog import table as _table
    from pyspark_excel_datasource_spark.plans.registry import (
        load_all_queries,
    )

    sf = "/root/testdata/sf0.001"
    row = load_all_queries()["q_iceberg_sorted_pruned"](spark, sf).first()
    o = _table(spark, sf, "orders").filter(F.col("o_orderkey") % 3 == 0)
    cut = int(o.agg(F.expr("max(o_orderkey) div 8").alias("c")).first().c)
    want = (
        o.filter(F.col("o_orderkey") <= cut)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("s"),
        )
        .first()
    )
    assert (row.n_rows, row.sum_key, row.files_pruned) == (
        want.n,
        want.s,
        1,
    )
