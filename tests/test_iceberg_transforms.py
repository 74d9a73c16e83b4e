"""Round 13: foreign Iceberg tables with non-identity partition
transforms (VERDICT r12 #5) — read-only support.

The fixture (``_materialize_transforms_iceberg``) is a spec-true
foreign layout over orders: one data file per (day(o_orderdate),
bucket[4](o_custkey), truncate[2](o_orderpriority)) tuple, manifest
entries carrying the tuples, metadata declaring the transformed spec.
Reads must resolve every transform (order-preserving ones prune at the
manifest level, bucket in-scan only); writers must refuse loudly.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_excel_datasource_spark.sources.iceberg import (  # noqa: E402
    IcebergFormatError,
    _transform_bound,
    read_iceberg,
    rewrite_data_files,
    snapshot_iceberg,
    write_iceberg,
)
from pyspark_excel_datasource_spark.sources.iceberg_queries import (  # noqa: E402
    _TRANSFORMS_PROBE_HI,
    _TRANSFORMS_WINDOW_HI,
    _ice_bucket_long,
    _materialize_transforms_iceberg,
    _murmur3_x86_32,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _subset(spark):
    from pyspark_excel_datasource_spark.catalog import table

    return table(spark, SF, "orders").filter(
        F.col("o_orderdate") < F.lit(_TRANSFORMS_WINDOW_HI).cast("timestamp_ntz")
    )


def test_murmur3_spec_vectors():
    # Iceberg spec Appendix B test vectors
    assert _murmur3_x86_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert _murmur3_x86_32(b"iceberg") == 1210000089
    assert _ice_bucket_long(34, 16) == 2017239379 % 16


def test_transform_bound_rules():
    assert _transform_bound({"transform": "day"}, "1995-01-10 00:00:00") == 9140
    assert _transform_bound({"transform": "year"}, "1995-01-10") == 25
    assert _transform_bound({"transform": "month"}, "1995-02-10") == 301
    assert (
        _transform_bound({"transform": "hour"}, "1970-01-02 03:00:00") == 27
    )
    assert _transform_bound({"transform": "truncate", "n": 10}, -7) == -10
    assert _transform_bound({"transform": "truncate", "n": 2}, "3-MEDIUM") == "3-"


def test_full_read_matches_subset(spark):
    """Reading the transformed table with no filter returns exactly the
    subset rows — transform tuples (incl. bucket) never drop or dup."""
    path = _materialize_transforms_iceberg(spark, SF)
    got = read_iceberg(spark, path)
    exp = _subset(spark)
    assert got.count() == exp.count()
    assert (
        got.agg(F.sum("o_orderkey")).first()[0]
        == exp.agg(F.sum("o_orderkey")).first()[0]
    )
    # in-scan filtering over a bucketed source column stays exact
    k = exp.select("o_custkey").first()[0]
    assert (
        got.filter(F.col("o_custkey") == k).count()
        == exp.filter(F.col("o_custkey") == k).count()
    )


def test_day_bounds_prune_files(spark):
    path = _materialize_transforms_iceberg(spark, SF)
    total = len(snapshot_iceberg(path).files)
    pruned = read_iceberg(
        spark, path, bounds_filter={"o_orderdate": (None, _TRANSFORMS_PROBE_HI)}
    )
    assert len(pruned.inputFiles()) < total
    exp = _subset(spark).filter(
        F.col("o_orderdate") <= F.lit(_TRANSFORMS_PROBE_HI).cast("timestamp_ntz")
    )
    got = pruned.filter(
        F.col("o_orderdate") <= F.lit(_TRANSFORMS_PROBE_HI).cast("timestamp_ntz")
    )
    assert got.count() == exp.count()


def test_truncate_bounds_prune_files(spark):
    path = _materialize_transforms_iceberg(spark, SF)
    total = len(snapshot_iceberg(path).files)
    pruned = read_iceberg(
        spark, path, bounds_filter={"o_orderpriority": ("1-URGENT", "1-URGENT")}
    )
    assert len(pruned.inputFiles()) < total
    exp = _subset(spark).filter(F.col("o_orderpriority") == "1-URGENT")
    assert (
        pruned.filter(F.col("o_orderpriority") == "1-URGENT").count()
        == exp.count()
    )


def test_writers_refuse_transformed_tables(spark):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
    )

    path = _materialize_transforms_iceberg(spark, SF)
    one = _subset(spark).limit(1)
    with pytest.raises(IcebergFormatError, match="non-identity"):
        write_iceberg(spark, one, path, mode="append")
    with pytest.raises(IcebergFormatError, match="non-identity"):
        delete_where_iceberg(spark, path, "o_orderkey = 1")
    with pytest.raises(IcebergFormatError, match="non-identity"):
        rewrite_data_files(spark, path)


def test_unknown_transform_still_raises(spark, tmp_path):
    import json
    import shutil

    path = _materialize_transforms_iceberg(spark, SF)
    bad = str(tmp_path / "bad_transform")
    shutil.copytree(path, bad)
    md_path = os.path.join(bad, "metadata", "v1.metadata.json")
    md = json.load(open(md_path))
    for spec in md["partition-specs"]:
        for f in spec["fields"]:
            if f["name"] == "od_day":
                f["transform"] = "zorder"
    md["partition-spec"] = md["partition-specs"][0]["fields"]
    json.dump(md, open(md_path, "w"))
    with pytest.raises(IcebergFormatError, match="unsupported partition transform"):
        read_iceberg(spark, bad).count()
