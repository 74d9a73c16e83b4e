"""Distributed graph analytics over relationship graphs mined from the
relational tables (SURVEY.md §2.4 north-star extensions; beyond-reference).

Training-data pipelines and commerce analytics both end up running graph
algorithms over entity graphs mined from the base tables — link-based
quality scores (PageRank over a citation/co-purchase graph), community
sanity checks (triangle counts detect dense near-duplicate clusters the
pair view under-reports). The reference engine has no graph operators at
all (its surface stops at the connector, `connector.py:162-322`); these
are pure exceed-the-reference extensions, built as plain DataFrame
join/agg pipelines so Catalyst plans them like any other query — no GraphX,
no RDDs.

Determinism convention (same as ``corpus.q_drift_kl``): every per-edge
double is quantized to fixed-point BIGINT *before* any aggregation, so
all reductions are integer sums (associative, order-independent) and the
results are bit-identical between Spark and the DuckDB oracle. The only
double arithmetic is a single multiply+divide per edge with an identical
expression shape in both engines — IEEE 754 makes that deterministic.

Scale notes (100 TB):

- ``q_graph_pagerank``: each iteration is one shuffle join of the rank
  vector (|V| rows) against the edge list (|E| rows) keyed on src, plus
  one groupBy dst — the standard distributed PageRank shape. The rank
  vector is tiny relative to the edges and co-partitions with them after
  the first iteration (AQE reuses the exchange). Fixed iteration count
  (3) keeps the oracle expressible as unrolled CTEs; the operator itself
  takes ``iterations`` as a parameter.
- ``q_graph_triangles``: edges are oriented low-id → high-id before the
  two-hop join, which (a) halves the edge list and (b) counts each
  triangle exactly once without a post-hoc /6. At 100 TB you'd orient by
  (degree, id) instead — the standard trick that bounds the join fan-out
  by sqrt(|E|) per vertex — the plan shape (two shuffle joins on vertex
  keys + one explode-free aggregation) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import query

#: PageRank fixed-point scale: ranks live in [0, 1]; 1e12 gives 12 exact
#: decimals while 0.85 * SCALE stays far inside double-exact integer range.
_PR_SCALE = 1_000_000_000_000


def copurchase_edges(o: DataFrame, li: DataFrame) -> DataFrame:
    """Symmetric customer↔supplier edge list from orders ⋈ lineitem.

    Node ids are disambiguated arithmetically (customer 2k, supplier
    2k+1) so both partitions share one BIGINT key space — cheaper to
    shuffle than a tagged string key.
    """
    o = o.select("o_orderkey", "o_custkey")
    li = li.select("l_orderkey", "l_suppkey")
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    return cs.select("u", "v").unionAll(cs.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copurchase_edges(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Fixed-point PageRank over a symmetric edge list (u, v).

    Returns (id, pr_fp) where pr_fp is the rank scaled by ``_PR_SCALE``.
    Per-edge contributions are quantized with FLOOR before the integer
    sum, so the result is exactly reproducible regardless of partition
    count or reduction order — the property that lets a 1000-executor
    run and the single-node oracle agree bit-for-bit.
    """
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg"))
    n = deg.agg(F.count("*").alias("n"))
    # rank vector and the (edges ⋈ deg) message frame are reused every
    # iteration — cache the static part once
    ed = edges.join(deg, "u").cache()
    pr = deg.crossJoin(F.broadcast(n)).select(
        F.col("u").alias("id"),
        F.floor(F.lit(float(_PR_SCALE)) / F.col("n")).cast("long").alias("pr"),
    )
    base = F.floor(F.lit(0.15 * _PR_SCALE) / F.col("n")).cast("long")
    for _ in range(iterations):
        contrib = ed.join(pr, ed.u == pr.id).select(
            F.col("v").alias("dst"),
            F.floor(F.col("pr") * F.lit(0.85) / F.col("outdeg"))
            .cast("long")
            .alias("c"),
        )
        pr = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("recv"))
            .crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("id"),
                (base + F.col("recv")).cast("long").alias("pr"),
            )
        )
    return pr


@query(
    "q_graph_pagerank",
    oracle=f"""
    WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT u, v FROM cs UNION ALL SELECT v, u FROM cs),
    deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
    n AS (SELECT COUNT(*) AS n FROM deg),
    pr0 AS (
        SELECT u AS id, CAST(FLOOR({_PR_SCALE}.0 / n.n) AS BIGINT) AS pr
        FROM deg CROSS JOIN n
    ),
    it1 AS (
        SELECT e.v AS id,
               CAST(FLOOR({0.15 * _PR_SCALE} / n.n) AS BIGINT)
               + SUM(CAST(FLOOR(p.pr * 0.85 / d.outdeg) AS BIGINT)) AS pr
        FROM edges e JOIN pr0 p ON e.u = p.id JOIN deg d ON e.u = d.u
        CROSS JOIN n GROUP BY e.v, n.n
    ),
    it2 AS (
        SELECT e.v AS id,
               CAST(FLOOR({0.15 * _PR_SCALE} / n.n) AS BIGINT)
               + SUM(CAST(FLOOR(p.pr * 0.85 / d.outdeg) AS BIGINT)) AS pr
        FROM edges e JOIN it1 p ON e.u = p.id JOIN deg d ON e.u = d.u
        CROSS JOIN n GROUP BY e.v, n.n
    ),
    it3 AS (
        SELECT e.v AS id,
               CAST(FLOOR({0.15 * _PR_SCALE} / n.n) AS BIGINT)
               + SUM(CAST(FLOOR(p.pr * 0.85 / d.outdeg) AS BIGINT)) AS pr
        FROM edges e JOIN it2 p ON e.u = p.id JOIN deg d ON e.u = d.u
        CROSS JOIN n GROUP BY e.v, n.n
    )
    SELECT id AS node_id,
           CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(pr AS BIGINT) AS pr_fp
    FROM it3
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the customer↔supplier co-purchase graph.

    The link-quality score you'd compute over a web/citation graph at
    100 TB to weight training documents (as in Common Crawl curation);
    here exercised on the commerce bipartite graph the test data offers.
    ``pr_fp`` is the rank in 1e-12 units — bit-identical to the unrolled
    DuckDB oracle because every reduction happens on quantized integers.
    """
    pr = pagerank(_copurchase_edges(spark, sf_dir), iterations=3)
    return pr.select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("pr").alias("pr_fp"),
    )


def personalized_pagerank(
    edges: DataFrame, seeds: DataFrame, iterations: int = 3
) -> DataFrame:
    """Fixed-point personalized PageRank: the teleport mass restarts to a
    SEED SET instead of uniformly, so rank measures proximity to the
    seeds (the construction behind "find documents like this labeled set"
    in corpus curation, and behind-seed recommendation at commerce scale).

    ``seeds`` is a one-column (id) frame. Ranks start uniform over the
    seeds and every iteration redeposits ``0.15/|S|`` on each seed only.
    Same quantize-before-sum discipline as :func:`pagerank`: per-edge
    contributions FLOOR to BIGINT before the integer sum, so the result
    is reduction-order independent and bit-identical to the unrolled
    DuckDB oracle.

    Scale: seeds are a tiny frame — broadcast both into the init and the
    per-iteration redeposit; each iteration is the same one shuffle join
    (rank ⋈ edges on src) + one groupBy dst as uniform PageRank, and the
    rank vector stays |V| rows. Nothing here grows with |S|.
    """
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg"))
    seeds = seeds.join(deg, seeds.id == deg.u, "left_semi").select("id")
    ns = seeds.agg(F.count("*").alias("ns"))
    ed = edges.join(deg, "u").cache()
    seed_marked = (
        deg.select(F.col("u").alias("id"))
        .join(F.broadcast(seeds.withColumn("is_seed", F.lit(1))), "id", "left")
        .select("id", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
    )
    pr = seed_marked.crossJoin(F.broadcast(ns)).select(
        "id",
        (
            F.col("is_seed")
            * F.floor(F.lit(float(_PR_SCALE)) / F.col("ns")).cast("long")
        ).alias("pr"),
    )
    for _ in range(iterations):
        recv = (
            ed.join(pr, ed.u == pr.id)
            .select(
                F.col("v").alias("dst"),
                F.floor(F.col("pr") * F.lit(0.85) / F.col("outdeg"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("recv"))
        )
        pr = (
            seed_marked.join(recv, seed_marked.id == recv.dst, "left")
            .crossJoin(F.broadcast(ns))
            .select(
                "id",
                (
                    F.col("is_seed")
                    * F.floor(F.lit(0.15 * _PR_SCALE) / F.col("ns")).cast("long")
                    + F.coalesce(F.col("recv"), F.lit(0))
                ).cast("long").alias("pr"),
            )
        )
    return pr


_PPR_ORACLE_ITER = """
    it{k} AS (
        SELECT m.id,
               CAST(m.is_seed * FLOOR({teleport} / ns.ns) AS BIGINT)
               + COALESCE(r.recv, 0) AS pr
        FROM marked m CROSS JOIN ns
        LEFT JOIN (
            SELECT e.v AS dst,
                   SUM(CAST(FLOOR(p.pr * 0.85 / d.outdeg) AS BIGINT)) AS recv
            FROM edges e JOIN it{prev} p ON e.u = p.id JOIN deg d ON e.u = d.u
            GROUP BY e.v
        ) r ON m.id = r.dst
    )"""


@query(
    "q_graph_ppr",
    oracle=f"""
    WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT u, v FROM cs UNION ALL SELECT v, u FROM cs),
    deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
    seeds AS (
        SELECT DISTINCT c_custkey * 2 AS id FROM customer
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey * 2 IN (SELECT u FROM deg)
    ),
    ns AS (SELECT COUNT(*) AS ns FROM seeds),
    marked AS (
        SELECT d.u AS id, CASE WHEN s.id IS NULL THEN 0 ELSE 1 END AS is_seed
        FROM deg d LEFT JOIN seeds s ON d.u = s.id
    ),
    it0 AS (
        SELECT m.id,
               CAST(m.is_seed * FLOOR({_PR_SCALE}.0 / ns.ns) AS BIGINT) AS pr
        FROM marked m CROSS JOIN ns
    ),
    {_PPR_ORACLE_ITER.format(k=1, prev=0, teleport=0.15 * _PR_SCALE).lstrip()},
    {_PPR_ORACLE_ITER.format(k=2, prev=1, teleport=0.15 * _PR_SCALE).lstrip()},
    {_PPR_ORACLE_ITER.format(k=3, prev=2, teleport=0.15 * _PR_SCALE).lstrip()}
    SELECT id AS node_id,
           CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(pr AS BIGINT) AS ppr_fp
    FROM it3
    WHERE pr > 0
    """,
)
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration personalized PageRank seeded on BUILDING-segment
    customers over the customer↔supplier co-purchase graph — proximity-
    to-seed-set scoring (corpus curation's "expand this labeled set",
    commerce's "suppliers close to this customer cohort"). Bit-identical
    to the unrolled DuckDB oracle via the fixed-point discipline; rows
    with rank exactly 0 (unreached vertices) are dropped.
    """
    cust = table(spark, sf_dir, "customer")
    seeds = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 2).alias("id")
    ).distinct()
    pr = personalized_pagerank(_copurchase_edges(spark, sf_dir), seeds, iterations=3)
    return pr.filter(F.col("pr") > 0).select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("pr").alias("ppr_fp"),
    )


@query(
    "q_graph_triangles",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM pairs e1
        JOIN pairs e2 ON e1.y = e2.x
        JOIN pairs e3 ON e3.x = e1.x AND e3.y = e2.y
    ),
    member AS (
        SELECT a AS part FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT part AS partkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM member GROUP BY part
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph.

    Triangles (three parts pairwise co-ordered) flag densely connected
    product clusters — the same statistic that, over a near-duplicate
    document graph, distinguishes isolated dup *pairs* from template
    *families* that need cluster-level dedup. Edges are oriented
    low-id → high-id so each triangle is generated exactly once by the
    two-hop join; at 100 TB orient by (degree, id) instead to bound the
    wedge fan-out per vertex (same plan shape).
    """
    return triangle_counts(table(spark, sf_dir, "lineitem"))


def triangle_counts(li: DataFrame) -> DataFrame:
    """Per-part triangle participation via DEGREE-ORDERED wedge
    enumeration (see ``q_graph_triangles``).

    Every undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher one; wedges are enumerated only from each
    edge's lower-ranked endpoint, which bounds the per-vertex fan-out by
    O(sqrt(|E|)) even on power-law graphs — the standard trick that
    keeps the wedge stage from exploding on hub vertices at 100 TB. A
    triangle's membership counts are orientation-independent, so the
    output (and the DuckDB oracle, which uses the simpler id
    orientation) is unchanged.
    """
    li = li.select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .distinct()
    )
    deg = (
        und.select(F.col("x").alias("id"))
        .unionAll(und.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    dx = deg.select(F.col("id").alias("x"), F.col("deg").alias("degx"))
    dy = deg.select(F.col("id").alias("y"), F.col("deg").alias("degy"))
    ranked = und.join(dx, "x").join(dy, "y")
    # rank(v) = (deg, id) packed into one orderable struct-free long pair:
    # orient from lower rank to higher rank
    lower_first = (F.col("degx") < F.col("degy")) | (
        (F.col("degx") == F.col("degy")) & (F.col("x") < F.col("y"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(lower_first, F.col("degy")).otherwise(F.col("degx")).alias("degv"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("idv"),
    ).cache()  # scanned by both wedge legs and the closing-edge leg
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.select("u", "v").alias("e3")
    # wedges out of the lower-ranked endpoint u, second leg strictly
    # higher-ranked than the first so each triangle closes exactly once
    wedge_order = (F.col("e1.degv") < F.col("e2.degv")) | (
        (F.col("e1.degv") == F.col("e2.degv"))
        & (F.col("e1.idv") < F.col("e2.idv"))
    )
    tri = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & wedge_order)
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
            "left_semi",
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    member = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    return member.groupBy("part").agg(
        F.count("*").cast("long").alias("n_triangles")
    ).select(F.col("part").alias("partkey"), "n_triangles")
