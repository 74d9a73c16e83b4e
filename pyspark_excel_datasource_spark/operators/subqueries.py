"""Subquery and CTE surface (Catalyst decorrelation coverage).

These shapes matter because Catalyst rewrites them into joins — scalar
subqueries become broadcast-able aggregates, IN/EXISTS become semi-joins —
and at 100 TB the rewrite (not the surface syntax) is what executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..functions.determinism import sql_davg, sql_dsum
from ..plans.registry import query


@query(
    "q_subquery_scalar",
    oracle=f"""
    SELECT c_custkey, c_acctbal,
           c_acctbal - (SELECT {sql_davg('c_acctbal', 2)} FROM customer)
               AS bal_vs_avg
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal', 2)} FROM customer)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast into the
    filter/projection)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               c_acctbal - (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                        AS DOUBLE) / COUNT(c_acctbal)
                            FROM customer) AS bal_vs_avg
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                       AS DOUBLE) / COUNT(c_acctbal)
                           FROM customer)
        """
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
        FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join on the correlation key (one shuffle, no per-row
    subplan execution). The average uses the exact-decimal-sum/count
    construction (determinism.py) so the comparison is bit-stable
    cross-engine.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                            AS DOUBLE) / COUNT(*)
            FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join rewrite."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
        )
        """
    )


@query(
    "q_cte",
    oracle=f"""
    WITH big_orders AS (
        SELECT o_custkey, COUNT(*) AS n_big,
               {sql_dsum('o_totalprice', 2)} AS total_big
        FROM orders WHERE o_totalprice > 200000.0
        GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           CAST(SUM(b.n_big) AS BIGINT) AS segment_big_orders,
           CAST(CAST(SUM(b.total_big) AS DECIMAL(38,2)) AS VARCHAR)
               AS segment_big_value
    FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE reuse feeding a join + re-aggregation. The exact decimal total
    presents as a canonical string (determinism.canon rationale)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, COUNT(*) AS n_big,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(38,2)) AS total_big
            FROM orders WHERE o_totalprice > 200000.0
            GROUP BY o_custkey
        )
        SELECT c.c_mktsegment,
               CAST(SUM(b.n_big) AS BIGINT) AS segment_big_orders,
               CAST(CAST(SUM(b.total_big) AS DECIMAL(38,2)) AS STRING)
                   AS segment_big_value
        FROM big_orders b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "q_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) c
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery: top-2 customers per nation.

    The surface is the per-row subquery a SQL user writes; Catalyst
    rewrites the correlated LIMIT into a join + per-key limit — the same
    physical shape as ``q_topk_group``'s window formulation, which is
    why LATERAL is safe at scale (nothing executes per-row).
    Deterministic ties via the c_custkey secondary sort.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        """
    )


@query(
    "q_recursive_closure",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in RANGE(1, LEN(w) - 1)]) AS shingles
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    ),
    toks AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, LEN(shingles) AS n FROM sh),
    pairs AS (
        SELECT d1, d2
        FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                   JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.5
    ),
    edges AS (
        SELECT d1 AS src, d2 AS dst FROM pairs
        UNION ALL SELECT d2, d1 FROM pairs
    ),
    reach AS (
        SELECT src AS node, src AS root, 0 AS depth FROM edges
        UNION ALL
        SELECT e.dst AS node, r.root, r.depth + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.root < e.dst AND r.depth < 8
    )
    SELECT node AS doc_id, MIN(root) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def q_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (``WITH RECURSIVE``, Spark 4.1 native): transitive
    closure of the near-duplicate graph — each clustered document mapped
    to the smallest doc_id reachable from it.

    This is the ENGINE-NATIVE recursion surface, cross-checking
    ``q_dedup_clusters``\' distributed label propagation on the same
    graph. The pair list reuses the exact-Jaccard operator (registered
    here as a temp view); the recursion then iterates
    driver-coordinated rounds over that tiny edge list. At 100 TB you
    run the label-propagation operator instead — this query exists
    because a complete engine must also speak the SQL-standard
    recursion users port in.
    """
    from .dedup import _NEAR_DUP_THRESHOLD, _exact_pairs, _shingles
    from ..catalog import table

    register_views(spark, sf_dir)
    pairs = _exact_pairs(
        _shingles(table(spark, sf_dir, "documents")), _NEAR_DUP_THRESHOLD
    ).select("d1", "d2")
    pairs.createOrReplaceTempView("near_pairs")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT d1 AS src, d2 AS dst FROM near_pairs
            UNION ALL SELECT d2, d1 FROM near_pairs
        ),
        reach AS (
            SELECT src AS node, src AS root, 0 AS depth FROM edges
            UNION ALL
            SELECT e.dst AS node, r.root, r.depth + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.root < e.dst AND r.depth < 8
        )
        SELECT node AS doc_id, MIN(root) AS cluster_id
        FROM reach GROUP BY node
        """
    )
