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
    """DML/maintenance writers stay gated on transformed specs;
    ``write_iceberg`` appends are gated by exact-spec matching instead
    (foreign field names never match this writer's naming convention,
    so a blind append still refuses loudly)."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
    )

    path = _materialize_transforms_iceberg(spark, SF)
    one = _subset(spark).limit(1)
    with pytest.raises(ValueError, match="table spec"):
        write_iceberg(spark, one, path, mode="append")
    with pytest.raises(IcebergFormatError, match="non-identity"):
        delete_where_iceberg(spark, path, "o_orderkey = 1")
    with pytest.raises(IcebergFormatError, match="non-identity"):
        rewrite_data_files(spark, path)
    # ADVICE r14: upsert shares the gate — ungated it would stage spec
    # FIELD names as partitionBy columns and corrupt partition tuples
    from pyspark_excel_datasource_spark.sources.iceberg import (
        upsert_iceberg,
    )

    with pytest.raises(IcebergFormatError, match="non-identity"):
        upsert_iceberg(spark, one, path, on=["o_orderkey"])


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


# ---------------------------------------------------------------------------
# round 13 (second half): hidden-partition WRITES
# ---------------------------------------------------------------------------


def _ts_df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [
            (i, f"2024-0{1 + i % 3}-{10 + i % 5:02d} 07:00:00", f"{i % 4}-P")
            for i in range(60)
        ],
        "k long, ts string, pr string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "pr")


def test_write_hidden_partitioning_roundtrip(spark, tmp_path):
    """write_iceberg(partition_by=("month(ts)", "bucket(4, k)",
    "truncate(2, pr)")): spec-true tuples, source columns kept in data,
    appends exactly once, month probe prunes at the manifest level."""
    path = str(tmp_path / "hidden")
    df = _ts_df(spark)
    spec = ("month(ts)", "bucket(4, k)", "truncate(2, pr)")
    write_iceberg(spark, df.filter("k % 2 = 0"), path, partition_by=spec)
    write_iceberg(
        spark, df.filter("k % 2 = 1"), path, mode="append", partition_by=spec
    )
    snap = snapshot_iceberg(path)
    trs = {t["name"]: t for t in snap.spec_transforms[0]}
    assert set(trs) == {"ts_month", "k_bucket", "pr_trunc"}
    got = read_iceberg(spark, path)
    assert got.count() == 60
    assert got.agg(F.sum("k")).first()[0] == sum(range(60))
    # tuple spot check: month(2024-01) = (2024-1970)*12 + 0 = 648
    months = {pv["ts_month"] for pv in snap.files.values()}
    assert months == {"648", "649", "650"}
    # bucket tuples carry spec-Appendix-B murmur3 values
    from pyspark_excel_datasource_spark.sources.iceberg_queries import (
        _ice_bucket_long,
    )

    some = next(iter(snap.files))
    rows = spark.read.parquet(f"{path}/{some}").collect()
    assert all(
        str(_ice_bucket_long(r.k, 4)) == snap.files[some]["k_bucket"]
        for r in rows
    )
    pruned = read_iceberg(
        spark,
        path,
        bounds_filter={"ts": ("2024-01-01 00:00:00", "2024-01-31 23:59:59")},
    )
    assert len(pruned.inputFiles()) < len(snap.files)
    assert (
        pruned.filter(F.month("ts") == 1).count()
        == df.filter(F.month("ts") == 1).count()
    )


def test_write_transform_spec_mismatch_and_guards(spark, tmp_path):
    path = str(tmp_path / "hidden2")
    df = _ts_df(spark)
    write_iceberg(spark, df, path, partition_by=("day(ts)",))
    with pytest.raises(ValueError, match="table spec"):
        write_iceberg(
            spark, df, path, mode="append", partition_by=("month(ts)",)
        )
    with pytest.raises(ValueError, match="table spec"):
        write_iceberg(spark, df, path, mode="append")
    # bucket on a non-integral source refuses loudly
    with pytest.raises(IcebergFormatError, match="integral"):
        write_iceberg(
            spark,
            df,
            str(tmp_path / "badbucket"),
            partition_by=("bucket(4, pr)",),
        )
    # ADVICE r14: a REAL column named like the staging/spec field would
    # be silently overwritten and dropped from the data files — refuse
    from pyspark.sql import functions as F

    clash = df.withColumn("ts_day", F.lit(0))
    with pytest.raises(ValueError, match="collides"):
        write_iceberg(
            spark,
            clash,
            str(tmp_path / "clash"),
            partition_by=("day(ts)",),
        )


def test_write_day_year_hour_truncate_tuples(spark, tmp_path):
    """Epoch arithmetic of every order-preserving transform matches the
    read side's _transform_bound (one rule, both directions)."""
    from pyspark_excel_datasource_spark.sources.iceberg import (
        _transform_bound,
    )

    path = str(tmp_path / "epoch")
    df = spark.createDataFrame(
        [(1, "1995-01-10 03:00:00"), (2, "1995-01-11 23:00:00"), (3, None)],
        "k long, ts string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    write_iceberg(
        spark, df, path, partition_by=("day(ts)", "hour(ts)", "year(ts)")
    )
    snap = snapshot_iceberg(path)
    days = {pv["ts_day"] for pv in snap.files.values()}
    assert str(_transform_bound({"transform": "day"}, "1995-01-10")) in days
    hours = {pv["ts_hour"] for pv in snap.files.values()}
    assert (
        str(_transform_bound({"transform": "hour"}, "1995-01-10 03:00:00"))
        in hours
    )
    assert {pv["ts_year"] for pv in snap.files.values()} == {"25", None}
    assert read_iceberg(spark, path).count() == 3  # null tuple kept
    # negative-int truncate floors toward -inf (Iceberg semantics)
    p2 = str(tmp_path / "negtrunc")
    d2 = spark.createDataFrame([(-7,), (-3,), (4,)], "v long")
    write_iceberg(spark, d2, p2, partition_by=("truncate(10, v)",))
    s2 = snapshot_iceberg(p2)
    assert {pv["v_trunc"] for pv in s2.files.values()} == {"-10", "0"}
    assert read_iceberg(spark, p2).count() == 3
