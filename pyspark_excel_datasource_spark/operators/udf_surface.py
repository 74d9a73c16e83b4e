"""UDF / UDAF / UDTF surface (SURVEY.md §2.3 M6).

The reference's "custom code on executors" is its connector read path
(reference ``connector.py:162``); the equivalent user-facing capability in a
Spark engine is the Python UDF family. Everything here uses the Arrow-
vectorized paths (``pandas_udf`` / ``applyInPandas`` / ``mapInPandas`` /
Python UDTF) — never row-at-a-time Python UDFs, which serialize per row and
are 10-100x slower at scale.

Determinism across engines: inside Python we use *exact integer-cent*
arithmetic (Python ints are arbitrary precision) so aggregates match the
oracle's exact DECIMAL sums regardless of accumulation order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..plans.registry import query


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_quantity >= 48.0
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy math).

    Row-wise IEEE double math in numpy is bit-identical to the same
    expression in any engine, so the oracle is the plain SQL formula.
    """

    @F.pandas_udf(T.DoubleType())
    def charge_udf(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - discount) * (1 + tax)

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge_udf("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS total_weighted_cents_amt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                AS DOUBLE) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via ``applyInPandas``: quantity-weighted average
    price per return flag.

    Python-side exact arithmetic: price*qty is rounded to integer cents
    (exact — the true product is on the 2-dp grid) and summed as Python
    ints, so the result is identical to the oracle's DECIMAL sum no matter
    how Spark orders or splits groups. Each group must fit in one pandas
    frame — fine for low-cardinality keys; high-cardinality UDAFs should
    use pandas_udf GROUPED_AGG instead (streamed per group).
    """

    out_schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("total_weighted_cents_amt", T.DecimalType(38, 2)),
            T.StructField("total_qty", T.LongType()),
            T.StructField("weighted_avg_price", T.DoubleType()),
        ]
    )

    def weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import Decimal

        cents = (pdf["l_extendedprice"] * pdf["l_quantity"] * 100).round()
        total_cents = int(cents.sum())  # exact: python int accumulation
        total_qty = int(pdf["l_quantity"].sum())
        wavg = (total_cents / 100) / total_qty
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "total_weighted_cents_amt": [Decimal(total_cents).scaleb(-2)],
                "total_qty": [total_qty],
                "weighted_avg_price": [wavg],
            }
        )

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(weighted_avg, out_schema)


@query(
    "q_udtf",
    oracle="""
    SELECT doc_id, toks[i] AS token, CAST(i AS INT) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 50),
         LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → N output rows (tokenize with
    positions). The lateral-join shape keeps it fully parallel — each
    partition expands independently, no shuffle."""

    @F.udtf(returnType="token: string, pos: int", useArrow=True)
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM docs_for_udtf d,
             LATERAL tokenize_udtf(d.doc_id, d.text) t
        """
    )


@query(
    "q_udf_mapinpandas",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           value * CAST(json_extract_string(props, '$.k') AS INT) AS scaled
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_udf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas``: per-partition batch iterator — the pattern for
    custom scans/decodes (and the multimodal pipeline in
    ``operators/multimodal.py``). Arrow batches stream through Python;
    nothing materializes whole partitions."""

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            k = pdf["props"].map(lambda s: json.loads(s).get("k")).astype("int32")
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "k_int": k,
                    "scaled": pdf["value"] * k,
                }
            )

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.mapInPandas(
        parse_batches,
        schema="event_id long, user_id long, k_int int, scaled double",
    )


@query(
    "q_udf_cogroup",
    oracle="""
    SELECT c.c_custkey AS custkey,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.spend_cents, 0) AS spend_cents
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
                      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS spend_cents
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map UDF: ``cogroup(...).applyInPandas`` joins the two
    key-aligned pandas frames per customer (account profile x order
    history) in Python — the escape hatch for join logic Catalyst can't
    express (model scoring over both sides, per-key reconciliation).

    Scale shape: ONE co-partitioning shuffle keyed on custkey feeds both
    sides; each task receives matched (customer, orders) slices via
    Arrow. State is bounded by the largest single key group, not the
    table. Determinism: integer-cent Python arithmetic (exact, order-
    independent), so the oracle is a plain aggregate-then-join.
    """

    out_schema = T.StructType(
        [
            T.StructField("custkey", T.LongType()),
            T.StructField("acctbal_cents", T.LongType()),
            T.StructField("n_orders", T.LongType()),
            T.StructField("spend_cents", T.LongType()),
        ]
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:  # order rows whose custkey has no customer row
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        spend = (
            int((right["o_totalprice"] * 100).round().astype("int64").sum())
            if not right.empty
            else 0
        )
        return pd.DataFrame(
            {
                "custkey": [int(left["c_custkey"].iloc[0])],
                "acctbal_cents": [
                    int(round(float(left["c_acctbal"].iloc[0]) * 100))
                ],
                "n_orders": [len(right)],
                "spend_cents": [spend],
            }
        )

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(reconcile, out_schema)
    )


@query(
    "q_udf_mapinarrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS net_cents
    FROM lineitem
    WHERE l_returnflag = 'A'
    """,
)
def q_udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy Arrow RecordBatch UDF path —
    lower-level than pandas UDFs (no Series conversion, no index
    bookkeeping), the right surface for columnar libraries that speak
    Arrow natively (tokenizers, image decoders, compiled kernels).

    Per-batch pyarrow.compute kernels do the math (C++ SIMD, never
    per-row Python); batch boundaries can't affect values since the
    computation is row-wise. IEEE doubles match the SQL formula exactly;
    the cents column pins the integer rounding contract.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def net_batches(batches):
        for b in batches:
            net = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            cents = pc.cast(
                pc.round(
                    pc.multiply(net, pa.scalar(100.0)),
                    round_mode="half_towards_infinity",  # SQL ROUND, not banker's
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), net, cents],
                ["l_orderkey", "l_linenumber", "net", "net_cents"],
            )

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "A")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    return li.mapInArrow(
        net_batches,
        "l_orderkey long, l_linenumber int, net double, net_cents long",
    )


@query(
    "q_udtf_analyze",
    oracle="""
    WITH src AS (
        SELECT o_orderkey, o_orderpriority AS s FROM orders
        WHERE o_orderkey % 100 = 0
    ),
    params AS (
        SELECT *, CAST(CEIL(LEN(s) / 3.0) AS INT) AS step FROM src
    )
    SELECT o_orderkey,
           SUBSTR(s, 1, step) AS c0,
           SUBSTR(s, step + 1, step) AS c1,
           SUBSTR(s, 2 * step + 1, step) AS c2
    FROM params
    """,
)
def q_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output schema
    — here the number of chunk columns — is computed at ANALYSIS time
    from the literal argument, the API behind schema-shaping table
    functions (dynamic unpivots, configurable feature splitters) that a
    fixed-returnType UDTF cannot express. The UDTF splits each string
    into n equal chunks as columns c0..c{n-1}; the oracle spells the
    same arithmetic with SUBSTR. Per-row work is trivial by design —
    the surface under test is the analyze-time schema derivation and
    the LATERAL correlation, not throughput (Arrow batches still carry
    the rows)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf(useArrow=True)
    class SplitFixed:
        @staticmethod
        def analyze(s: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, s, n):
            step = -(-len(s) // n) if s else 1
            yield tuple(
                (s or "")[i * step : (i + 1) * step] for i in range(n)
            )

    spark.udtf.register("split_fixed_r8", SplitFixed)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_udtf")
    return spark.sql(
        """
        SELECT o.o_orderkey, s.*
        FROM orders_udtf o, LATERAL split_fixed_r8(o.o_orderpriority, 3) s
        WHERE o.o_orderkey % 100 = 0
        """
    )


@query(
    "q_udtf_table_arg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM events
    """,
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-argument Python UDTF (Spark 4):
    ``f(TABLE(t) PARTITION BY user_id ORDER BY ts)`` hands the UDTF one
    ordered partition per instance — SQL-native custom per-group
    sequential logic (the surface for per-entity simulations/parsers
    that window functions can't express). Here the sequential body is a
    running exact-cents balance, deliberately chosen because a window
    oracle CAN express it — proving the partition/order contract, the
    per-partition state reset, and the Arrow row transport end-to-end.
    Scale: one shuffle on the PARTITION BY key, then per-partition
    Arrow-batched Python — the same topology as applyInPandas, with
    SQL-level ergonomics.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="event_id bigint, user_id bigint, running_cents bigint",
        useArrow=True,
    )
    class RunningCents:
        def __init__(self):
            self.total = 0

        def eval(self, row):
            self.total += int(round(row["value"] * 100))
            yield row["event_id"], row["user_id"], self.total

    spark.udtf.register("running_cents_r8", RunningCents)
    table(spark, sf_dir, "events").createOrReplaceTempView("events_udtf_ta")
    return spark.sql(
        """
        SELECT * FROM running_cents_r8(
            TABLE(events_udtf_ta) PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )
