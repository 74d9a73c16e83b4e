"""Iceberg format-version 2 batch reads with POSITION DELETES.

Fixtures upgrade a v1 table the way an external v2 writer's table
looks on disk: metadata.json says format-version 2, the manifest list
gains ``content`` (0=data, 1=deletes), and a delete manifest lists a
two-column (``file_path``, ``pos``) parquet per the spec. The reader
must subtract exactly those row positions; every v2 MUTATION (append,
compaction, expiry, metadata-only conversion, the stream) must fail
loudly naming the format version.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from pyspark_excel_datasource_spark.sources.iceberg import (  # noqa: E402
    IcebergFormatError,
    _read_avro,
    _write_avro,
    expire_snapshots,
    read_iceberg,
    rewrite_data_files,
    snapshot_iceberg,
    write_iceberg,
)

SF = "/root/testdata/sf0.001"

_MLIST_V2_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "content", "type": "int"},
    ],
}


def _delete_manifest_schema() -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }


def _nation(spark):
    return spark.read.parquet(os.path.join(SF, "nation.parquet"))


def _upgrade_with_position_deletes(
    table_path: str, deletes: dict[str, list[int]], content: int = 1
) -> None:
    """Stamp format-version 2 and attach one delete manifest carrying
    one position-delete parquet per target file."""
    meta_dir = os.path.join(table_path, "metadata")
    v = int(open(os.path.join(meta_dir, "version-hint.text")).read().strip())
    md_path = os.path.join(meta_dir, f"v{v}.metadata.json")
    md = json.load(open(md_path))
    md["format-version"] = 2
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    mlist = snap["manifest-list"]
    mlist_abs = mlist if os.path.isabs(mlist) else os.path.join(table_path, mlist)

    # position-delete parquet (spec layout: file_path, pos)
    rows_fp, rows_pos = [], []
    for target, positions in deletes.items():
        rows_fp.extend([target] * len(positions))
        rows_pos.extend(positions)
    del_parquet = os.path.join(table_path, "data", "pos-delete-0.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(rows_fp, pa.string()),
                "pos": pa.array(rows_pos, pa.int64()),
            }
        ),
        del_parquet,
    )

    # delete manifest listing it
    del_manifest = os.path.join(meta_dir, "delete-m0.avro")
    _write_avro(
        del_manifest,
        _delete_manifest_schema(),
        [
            (
                1,  # ADDED
                md["current-snapshot-id"],
                {
                    "content": content,
                    "file_path": os.path.join("data", "pos-delete-0.parquet"),
                    "file_format": "PARQUET",
                    "record_count": len(rows_pos),
                    "file_size_in_bytes": os.path.getsize(del_parquet),
                },
            )
        ],
    )

    # rewrite the manifest list with the v2 content column
    old_entries = _read_avro(mlist_abs)
    rows = [
        (
            m["manifest_path"],
            m["manifest_length"],
            m["partition_spec_id"],
            m["added_snapshot_id"],
            0,
        )
        for m in old_entries
    ]
    rows.append(
        (
            del_manifest,
            os.path.getsize(del_manifest),
            0,
            md["current-snapshot-id"],
            1,
        )
    )
    _write_avro(mlist_abs, _MLIST_V2_SCHEMA, rows)
    json.dump(md, open(md_path, "w"))


def _make_table(spark, tmp_path, name: str) -> tuple[str, str, list]:
    path = str(tmp_path / name)
    n = _nation(spark).orderBy("n_nationkey").coalesce(1)
    write_iceberg(spark, n, path)
    snap = snapshot_iceberg(path)
    (target,) = snap.files
    keys = [r.n_nationkey for r in read_iceberg(spark, path).orderBy("n_nationkey").collect()]
    return path, target, keys


def test_position_deletes_filter_rows(spark, tmp_path):
    path, target, keys = _make_table(spark, tmp_path, "v2_posdel")
    _upgrade_with_position_deletes(path, {target: [0, 2, 5]})
    got = sorted(r.n_nationkey for r in read_iceberg(spark, path).collect())
    want = sorted(k for i, k in enumerate(keys) if i not in (0, 2, 5))
    assert got == want


def test_dangling_delete_target_ignored(spark, tmp_path):
    path, target, keys = _make_table(spark, tmp_path, "v2_dangling")
    _upgrade_with_position_deletes(
        path, {target: [1], "data/no-such-file.parquet": [0, 1]}
    )
    assert read_iceberg(spark, path).count() == len(keys) - 1


def test_absolute_delete_target_normalized(spark, tmp_path):
    path, target, keys = _make_table(spark, tmp_path, "v2_abs")
    abs_target = target if os.path.isabs(target) else os.path.join(
        os.path.abspath(path), target
    )
    _upgrade_with_position_deletes(path, {abs_target: [3]})
    assert read_iceberg(spark, path).count() == len(keys) - 1


def test_equality_deletes_raise(spark, tmp_path):
    path, target, _ = _make_table(spark, tmp_path, "v2_eq")
    _upgrade_with_position_deletes(path, {target: [0]}, content=2)
    with pytest.raises(IcebergFormatError, match="equality"):
        read_iceberg(spark, path).collect()


def test_v2_mutations_raise(spark, tmp_path):
    path, target, _ = _make_table(spark, tmp_path, "v2_guard")
    _upgrade_with_position_deletes(path, {target: [0]})
    n = _nation(spark)
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        write_iceberg(spark, n, path, mode="append")
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        rewrite_data_files(spark, path, target_files=1)
    with pytest.raises(IcebergFormatError, match="format-version 2"):
        expire_snapshots(path, keep_last=1)
    from pyspark_excel_datasource_spark.sources.iceberg import (
        convert_iceberg_to_delta,
    )

    with pytest.raises(IcebergFormatError, match="format-version 2"):
        convert_iceberg_to_delta(spark, path, str(tmp_path / "d"))


def test_v2_stream_raises(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.iceberg_stream import (
        register_pyiceberg_stream,
    )

    path, target, _ = _make_table(spark, tmp_path, "v2_stream")
    _upgrade_with_position_deletes(path, {target: [0]})
    register_pyiceberg_stream(spark)
    with pytest.raises(Exception, match="format-version 2"):
        spark.readStream.format("pyiceberg_stream").load(path).writeStream.format(
            "noop"
        ).trigger(availableNow=True).start().awaitTermination(60)


def test_v2_partitioned_with_filter(spark, tmp_path):
    path = str(tmp_path / "v2_part")
    n = (
        _nation(spark)
        .withColumn("rk", F.col("n_regionkey").cast("string"))
        .drop("n_regionkey")
        .orderBy("n_nationkey")
        .repartition(1)
        .sortWithinPartitions("n_nationkey")
    )
    write_iceberg(spark, n, path, partition_by=("rk",))
    snap = snapshot_iceberg(path)
    target = next(p for p, pv in snap.files.items() if pv["rk"] == "0")
    before = {
        r.n_nationkey
        for r in read_iceberg(
            spark, path, partition_filter={"rk": {"0"}}
        ).collect()
    }
    _upgrade_with_position_deletes(path, {target: [0]})
    after = {
        r.n_nationkey
        for r in read_iceberg(
            spark, path, partition_filter={"rk": {"0"}}
        ).collect()
    }
    assert len(after) == len(before) - 1
    assert after < before
    # other partitions untouched
    assert (
        read_iceberg(spark, path, partition_filter={"rk": {"1"}}).count()
        == _nation(spark).filter(F.col("n_regionkey") == 1).count()
    )
