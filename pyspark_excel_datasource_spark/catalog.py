"""Loaders for the driver-generated test tables (TESTDATA.md).

Each table is one parquet file under ``{sf_dir}/{name}.parquet``. We read
them lazily and *declaratively* (``spark.read.parquet``) so Catalyst keeps
predicate pushdown, column pruning and partition-size planning — at 100 TB
these would be multi-file datasets and the same call sites hold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All tables the driver generates (FIXTURES.md §B).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame (lazy parquet scan).

    ``events.ts`` has been written by different testdata generators as either
    parquet TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so we
    read nanos as raw int64 (``spark.sql.legacy.parquet.nanosAsLong``) and
    rebuild a microsecond ``timestamp_ntz`` (the same truncation DuckDB
    applies casting TIMESTAMP_NS → TIMESTAMP) — or plain TIMESTAMP(MICROS),
    which loads directly. Branch on the *loaded* dtype so both generations of
    testdata work.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Integer DIV, not `/`: epoch-nanos exceed 2^53, double division
            # would round the microsecond.
            return df.withColumn(
                "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
            )
        if ts_type != "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        return df
    return spark.read.parquet(path)


def sf_tag(sf_dir: str) -> str:
    """Scale-factor tag for namespacing derived fixtures (bucketed tables,
    xlsx bridges, partitioned sinks) so concurrent runs at different
    sf_dirs never share a directory. Dots swapped out so the tag is safe
    in table names as well as paths."""
    return (os.path.basename(os.path.normpath(sf_dir)) or "sf").replace(".", "_")


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input up to cluster parallelism.

    Small single-file tables arrive as ONE partition (one row group), so a
    CPU-heavy per-row stage (shingling, vector math) would run on one core
    no matter how many the session has. The shuffle cost is the raw bytes
    of a small table — trivially worth it. No-op when the input is already
    parallel enough. At 100 TB inputs are thousands of splits and this
    never fires.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table; keys are table names."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
