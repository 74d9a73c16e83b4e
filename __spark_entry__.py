"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``pyspark_excel_datasource_spark.plans.registry``;
every operator module registers its (query, oracle) pair there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_excel_datasource_spark.plans.registry import (
    ORACLES,
    load_all_queries,
)
from pyspark_excel_datasource_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    qs = load_all_queries()
    return qs["q_flagship_pricing"](configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(load_all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-able query."""
    load_all_queries()
    return dict(ORACLES)
