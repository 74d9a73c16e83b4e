"""Query registry — the single source of truth for SURVEY.md §2 coverage.

Every implemented operator registers itself here as a named query:

    @query("q_agg_group", oracle="SELECT ... AS sum_qty ...")
    def q_agg_group(spark, sf_dir) -> DataFrame: ...

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
module. The driver runs the Spark callable and the DuckDB oracle SQL
side-by-side at sf0.01 and compares row count + schema + order-insensitive
value hash, so:

- alias every computed column identically in both;
- make float aggregates deterministic across engines: round and cast to
  DECIMAL (see ``operators/relational.py`` docstring for the convention);
- queries whose semantics aren't ANSI-SQL-expressible register with
  ``oracle=None`` → driver does a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import configure

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Modules that register queries on import (order = SURVEY.md §7 milestones).
_QUERY_MODULES = (
    "pyspark_excel_datasource_spark.operators.relational",
    "pyspark_excel_datasource_spark.operators.subqueries",
    "pyspark_excel_datasource_spark.operators.composite",
    "pyspark_excel_datasource_spark.operators.extras",
    "pyspark_excel_datasource_spark.functions.scalar",
    "pyspark_excel_datasource_spark.operators.udf_surface",
    "pyspark_excel_datasource_spark.streaming.windows",
    "pyspark_excel_datasource_spark.operators.dedup",
    "pyspark_excel_datasource_spark.operators.similarity",
    "pyspark_excel_datasource_spark.operators.text",
    "pyspark_excel_datasource_spark.operators.multimodal",
    "pyspark_excel_datasource_spark.sources.excel_queries",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a (query, oracle) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver hands us its own session; pin the runtime confs the
            # queries rely on (UTC tz, AQE, Arrow) before building the plan.
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all_queries() -> dict[str, QueryFn]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Modules land milestone by milestone; only swallow *their own*
            # absence, never a real import error inside an existing module.
            if exc.name != mod:
                raise
    return QUERIES
