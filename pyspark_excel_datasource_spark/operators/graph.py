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
from pyspark.sql.window import Window as W

from ..catalog import table
from ..plans.registry import query

#: PageRank fixed-point scale: ranks live in [0, 1]; 1e12 gives 12 exact
#: decimals while 0.85 * SCALE stays far inside double-exact integer range.
_PR_SCALE = 1_000_000_000_000

#: Broadcast the rank vector into the per-iteration (edges ⋈ ranks) join
#: while |V| stays under this bound (a ~100 MB hash relation of (long,
#: long) rows); past it, demote to a shuffle join keyed on src — the same
#: size-guard discipline as q_join_bloom (scale.py). On the bench graph
#: this halves the shuffles per iteration (measured 11.4s → 4.1s cold at
#: sf0.1 for 3 iterations).
_PR_BROADCAST_MAX_VERTICES = 8_000_000


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


#: integer teleport mass per iteration: 0.15 * _PR_SCALE, exact
_PR_TELEPORT = 150_000_000_000


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Fixed-point PageRank over an arbitrary (u, v) edge list — general
    digraphs included: the vertex set is u ∪ v, and the rank mass of
    dangling nodes (no out-edges) is redistributed uniformly each
    iteration, so total mass is conserved the way standard PageRank
    defines it (not silently lost through the edge join).

    Returns (id, pr_fp) where pr_fp is the rank scaled by ``_PR_SCALE``.
    All arithmetic is exact int64 — per-edge contribution
    ``(pr * 85) div (outdeg * 100)`` (pr ≤ 1e12 so pr*85 ≤ 8.5e13, far
    inside int64) — so there is no float step anywhere in the pipeline:
    the result is exactly reproducible regardless of partition count,
    reduction order, or engine (the earlier FLOOR(pr*0.85/outdeg) form
    differed from DuckDB by 1 ulp on some inputs because DuckDB routes
    the product through DECIMAL).

    Scale: with sinks present, the dangling mass rides the SAME
    aggregation exchange as the edge messages — sink ranks enter the
    union with a NULL dst, so one groupBy computes both the per-vertex
    receipts and (in the NULL group) the global dangling sum; the
    aggregate is localCheckpoint-ed (it is |V|+1 rows and feeds two
    subtrees) and the 1-row NULL group becomes a driver literal. That
    is ONE exchange per iteration, where the previous shape paid a
    second full aggregation job just for the dangling sum. The path is
    SKIPPED entirely when the setup probe finds no sinks (symmetric
    graphs — the common case). ALL setup questions — vertex count, sink
    existence, source existence — come from ONE aggregate over one
    degree-flag census, and n becomes a driver-side literal so the
    teleport and init terms are constants folded into the plan. The
    edge list itself is cached first: deg, the census, and the message
    frame all read it, and without the cache the upstream edge build
    (often a join+distinct) would run three times.
    """
    edges = edges.cache()
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg")).cache()
    # degree-flag census: one shuffle answers |V|, sinks?, sources?
    flags = (
        edges.select(
            F.col("u").alias("id"),
            F.lit(1).alias("has_out"),
            F.lit(0).alias("has_in"),
        )
        .unionAll(
            edges.select(
                F.col("v").alias("id"),
                F.lit(0).alias("has_out"),
                F.lit(1).alias("has_in"),
            )
        )
        .groupBy("id")
        .agg(
            F.max("has_out").alias("has_out"),
            F.max("has_in").alias("has_in"),
        )
        .cache()
    )
    probe = flags.agg(
        F.count("*").alias("n"),
        F.sum(F.lit(1) - F.col("has_out")).alias("n_sinks"),
        F.sum(F.lit(1) - F.col("has_in")).alias("n_sources"),
    ).collect()[0]
    n_vertices = int(probe.n)
    verts = flags.select("id")
    if n_vertices == 0:
        return verts.select("id", F.lit(0).cast("long").alias("pr"))
    has_sinks = int(probe.n_sinks) > 0
    has_sources = int(probe.n_sources) > 0
    maybe_broadcast = (
        F.broadcast if n_vertices <= _PR_BROADCAST_MAX_VERTICES else (lambda df: df)
    )
    sinks = flags.filter(F.col("has_out") == 0).select(F.col("id").alias("sid"))
    # the (edges ⋈ deg) message frame is reused every iteration — cache
    # the static part once, PRE-PARTITIONED BY v: the rank join is a
    # broadcast (no shuffle of ed), so the cached HashPartitioning(v)
    # flows through to the per-iteration groupBy(dst=v), which then
    # needs NO exchange at all — measured 2-2.7x on the warm iteration
    # loop at sf0.1. One exchange at cache build, zero per iteration
    # (sink-less graphs). init/teleport are exact int literals
    # (identical floor-div arithmetic to the previous in-plan `div n`)
    ed = edges.join(deg, "u").repartition("v").cache()
    init, tp = _PR_SCALE // n_vertices, _PR_TELEPORT // n_vertices
    pr = verts.select("id", F.lit(init).cast("long").alias("pr"))
    for _ in range(iterations):
        prb = maybe_broadcast(pr)
        msgs = ed.join(prb, ed.u == prb.id).select(
            F.col("v").alias("dst"),
            F.expr("(pr * 85) div (outdeg * 100)").alias("c"),
        )
        if has_sinks:
            # fold the dangling sum into the message aggregation: sink
            # ranks enter the union keyed dst=NULL, so ONE exchange
            # yields per-vertex receipts AND (in the NULL group) the
            # global dangling mass. The division by n happens on the
            # SUMMED mass (floor of sum ≠ sum of floors), so the NULL
            # group carries raw rank.
            dmsg = pr.join(
                F.broadcast(sinks), pr.id == sinks.sid, "left_semi"
            ).select(
                F.lit(None).cast(msgs.schema["dst"].dataType).alias("dst"),
                F.col("pr").alias("c"),
            )
            agg = (
                msgs.unionAll(dmsg)
                .groupBy("dst")
                .agg(F.sum("c").alias("recv"))
                .localCheckpoint()  # |V|+1 rows; feeds the split below
            )
            dm_rows = agg.filter(F.col("dst").isNull()).collect()
            dshare = (int(dm_rows[0].recv) * 85) // (n_vertices * 100) if dm_rows else 0
            recv = agg.filter(F.col("dst").isNotNull())
            nxt = verts.join(recv, verts.id == recv.dst, "left")
            pr = nxt.select(
                "id",
                F.expr(f"{tp} + coalesce(recv, 0L) + {dshare}")
                .cast("long")
                .alias("pr"),
            )
        else:
            recv = msgs.groupBy("dst").agg(F.sum("c").alias("recv"))
            if has_sources:
                # a SOURCE receives nothing: rebuild the rank frame from
                # the full vertex set so its teleport-only row survives
                nxt = verts.join(recv, verts.id == recv.dst, "left")
            else:
                nxt = recv.select(F.col("dst").alias("id"), "recv")
            pr = nxt.select(
                "id",
                F.expr(f"{tp} + coalesce(recv, 0L)").cast("long").alias("pr"),
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
        SELECT u AS id, CAST({_PR_SCALE} // n.n AS BIGINT) AS pr
        FROM deg CROSS JOIN n
    ),
    it1 AS (
        SELECT e.v AS id,
               CAST({_PR_TELEPORT} // n.n AS BIGINT)
               + SUM((p.pr * 85) // (d.outdeg * 100)) AS pr
        FROM edges e JOIN pr0 p ON e.u = p.id JOIN deg d ON e.u = d.u
        CROSS JOIN n GROUP BY e.v, n.n
    ),
    it2 AS (
        SELECT e.v AS id,
               CAST({_PR_TELEPORT} // n.n AS BIGINT)
               + SUM((p.pr * 85) // (d.outdeg * 100)) AS pr
        FROM edges e JOIN it1 p ON e.u = p.id JOIN deg d ON e.u = d.u
        CROSS JOIN n GROUP BY e.v, n.n
    ),
    it3 AS (
        SELECT e.v AS id,
               CAST({_PR_TELEPORT} // n.n AS BIGINT)
               + SUM((p.pr * 85) // (d.outdeg * 100)) AS pr
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

    Scale: seeds are a tiny frame — broadcast into the init and the
    per-iteration redeposit; each iteration is the same one shuffle join
    (rank ⋈ edges on src) + one groupBy dst as uniform PageRank, and the
    rank vector stays |V| rows. Nothing here grows with |S|. Dangling
    (no-out-edge) mass redeposits on the SEEDS — the standard PPR restart
    semantics — and rides the SAME aggregation exchange as the edge
    messages (NULL-dst union leg → the dangling sum is the NULL group of
    the one groupBy, becoming a driver literal), exactly like
    :func:`pagerank`; the path is probed once and skipped when the graph
    has no sinks. |S| is collected once to a literal so the teleport
    term is constant-folded instead of a 1-row broadcast every
    iteration. The edge list is cached first (deg, the vertex census,
    and the message frame all read it).
    """
    edges = edges.cache()
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg")).cache()
    verts = (
        edges.select(F.col("u").alias("id"))
        .unionAll(edges.select(F.col("v").alias("id")))
        .distinct()
        .cache()
    )
    n_vertices = verts.count()
    maybe_broadcast = (
        F.broadcast if n_vertices <= _PR_BROADCAST_MAX_VERTICES else (lambda df: df)
    )
    sinks = verts.join(deg, verts.id == deg.u, "left_anti").select(
        F.col("id").alias("sid")
    )
    has_sinks = sinks.limit(1).count() > 0
    seeds = seeds.join(verts, "id", "left_semi")
    ns = seeds.count()  # |S|: bounded, one job, folds into literals below
    if ns == 0:
        raise ValueError(
            "personalized_pagerank: no seed id appears in the graph's "
            "vertex set — an empty effective seed set is a caller error"
        )
    # pre-partitioned by v so the per-iteration groupBy(dst) reuses the
    # cache's partitioning — see pagerank() for the measured rationale
    ed = edges.join(deg, "u").repartition("v").cache()
    seed_marked = (
        verts.join(F.broadcast(seeds.withColumn("is_seed", F.lit(1))), "id", "left")
        .select("id", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
    )
    pr = seed_marked.select(
        "id",
        F.expr(f"is_seed * {_PR_SCALE // ns}").cast("long").alias("pr"),
    )
    for _ in range(iterations):
        prb = maybe_broadcast(pr)
        msgs = ed.join(prb, ed.u == prb.id).select(
            F.col("v").alias("dst"),
            F.expr("(pr * 85) div (outdeg * 100)").alias("c"),
        )
        if has_sinks:
            # same one-exchange dangling fold as pagerank(): sink ranks
            # enter the union keyed dst=NULL; the division happens on
            # the SUMMED mass (floor of sum ≠ sum of floors)
            dmsg = pr.join(
                F.broadcast(sinks), pr.id == sinks.sid, "left_semi"
            ).select(
                F.lit(None).cast(msgs.schema["dst"].dataType).alias("dst"),
                F.col("pr").alias("c"),
            )
            agg = (
                msgs.unionAll(dmsg)
                .groupBy("dst")
                .agg(F.sum("c").alias("recv"))
                .localCheckpoint()
            )
            dm_rows = agg.filter(F.col("dst").isNull()).collect()
            dm = int(dm_rows[0].recv) if dm_rows else 0
            recv = agg.filter(F.col("dst").isNotNull())
            nxt = seed_marked.join(recv, seed_marked.id == recv.dst, "left")
            pr = nxt.select(
                "id",
                F.expr(
                    f"is_seed * ({_PR_TELEPORT // ns}"
                    f" + {(dm * 85) // (ns * 100)}) + coalesce(recv, 0L)"
                )
                .cast("long")
                .alias("pr"),
            )
        else:
            recv = msgs.groupBy("dst").agg(F.sum("c").alias("recv"))
            nxt = seed_marked.join(recv, seed_marked.id == recv.dst, "left")
            pr = nxt.select(
                "id",
                F.expr(
                    f"is_seed * {_PR_TELEPORT // ns} + coalesce(recv, 0L)"
                )
                .cast("long")
                .alias("pr"),
            )
    return pr


_PPR_ORACLE_ITER = """
    it{k} AS (
        SELECT m.id,
               CAST(m.is_seed * ({teleport} // ns.ns) AS BIGINT)
               + COALESCE(r.recv, 0) AS pr
        FROM marked m CROSS JOIN ns
        LEFT JOIN (
            SELECT e.v AS dst,
                   SUM((p.pr * 85) // (d.outdeg * 100)) AS recv
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
               CAST(m.is_seed * ({_PR_SCALE} // ns.ns) AS BIGINT) AS pr
        FROM marked m CROSS JOIN ns
    ),
    {_PPR_ORACLE_ITER.format(k=1, prev=0, teleport=_PR_TELEPORT).lstrip()},
    {_PPR_ORACLE_ITER.format(k=2, prev=1, teleport=_PR_TELEPORT).lstrip()},
    {_PPR_ORACLE_ITER.format(k=3, prev=2, teleport=_PR_TELEPORT).lstrip()}
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


# ---------------------------------------------------------------------------
# Deterministic random walks (node2vec-style corpus sampling)
# ---------------------------------------------------------------------------

_WALK_STEPS = 3


def _md5_idx(*parts) -> "F.Column":
    """First 15 hex digits of md5(':'-joined parts) as a BIGINT — the
    md5-hash-family bridge (same construction as ``q_dedup_minhash_oracled``,
    dedup.py:832): identical in Spark (`conv(substr(md5(..),1,15),16,10)`)
    and DuckDB (`CAST('0x'||SUBSTR(MD5(..),1,15) AS UBIGINT)`), so the
    "random" choices are bit-reproducible across engines AND across
    cluster sizes — a walk is a pure function of (walk_id, step, node)."""
    joined = F.concat_ws(":", *[p.cast("string") for p in parts])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def random_walks(edges: DataFrame, starts: DataFrame, steps: int = _WALK_STEPS) -> DataFrame:
    """Hash-deterministic uniform random walks over a symmetric edge list.

    ``starts`` is a one-column (walk_id) frame of start nodes. At step t
    from node ``cur`` the walk moves to neighbor number
    ``md5(walk_id, t, cur) mod outdeg(cur)`` in the id-sorted adjacency
    list — uniform in distribution, yet a pure function of the walk
    state, so reruns, retried tasks, and the DuckDB oracle all emit the
    identical paths (the property PRNG-seeded samplers lose under
    task retry).

    Scale: adjacency is one sorted array per vertex (`sort_array ∘
    collect_list`), so each step is a 1:1 shuffle join of the walk
    frontier (|walks| rows) against the adjacency table — no per-edge
    fan-out. At 100 TB the hub-vertex arrays are the pressure point;
    the standard fix (reservoir-cap the list at ~10k neighbors with the
    same hash family) keeps rows bounded without breaking determinism.
    """
    adj = edges.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs"),
        F.count("*").alias("outdeg"),
    )
    walk = starts.select(
        F.col("walk_id"),
        F.col("walk_id").alias("cur"),
        F.array(F.col("walk_id")).alias("path"),
    )
    for t in range(steps):
        walk = (
            walk.join(adj, walk.cur == adj.u)
            .select(
                "walk_id",
                F.element_at(
                    "nbrs",
                    (_md5_idx(F.lit("w"), F.col("walk_id"), F.lit(t), F.col("cur"))
                     % F.col("outdeg")).cast("int") + 1,
                ).alias("cur"),
                "path",
            )
            .select(
                "walk_id",
                "cur",
                F.array_append("path", F.col("cur")).alias("path"),
            )
        )
    return walk.select("walk_id", "path")


_WALK_ORACLE_STEP = """
    w{k} AS (
        SELECT w.walk_id,
               a.nbrs[CAST(CAST(('0x' || SUBSTR(
                   MD5('w:' || CAST(w.walk_id AS VARCHAR) || ':{t}:'
                       || CAST(w.cur AS VARCHAR)), 1, 15)) AS UBIGINT)
                   % a.outdeg AS INTEGER) + 1] AS cur
        FROM w{prev} w JOIN adj a ON w.cur = a.u
    )"""


@query(
    "q_graph_randomwalk",
    oracle=f"""
    WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT u, v FROM cs UNION ALL SELECT v, u FROM cs),
    adj AS (
        SELECT u, LIST(v ORDER BY v) AS nbrs, COUNT(*) AS outdeg
        FROM edges GROUP BY u
    ),
    w0 AS (
        SELECT u AS walk_id, u AS cur FROM adj
        WHERE u % 2 = 0 AND (u / 2) % 10 = 0
    ),
    {_WALK_ORACLE_STEP.format(k=1, prev=0, t=0).lstrip()},
    {_WALK_ORACLE_STEP.format(k=2, prev=1, t=1).lstrip()},
    {_WALK_ORACLE_STEP.format(k=3, prev=2, t=2).lstrip()}
    SELECT w0.walk_id, w0.cur AS s0, w1.cur AS s1, w2.cur AS s2, w3.cur AS s3
    FROM w0 JOIN w1 USING (walk_id) JOIN w2 USING (walk_id)
    JOIN w3 USING (walk_id)
    """,
)
def q_graph_randomwalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step deterministic uniform random walks from every 10th customer
    node over the co-purchase graph — the sampling primitive behind
    DeepWalk/node2vec graph embeddings in training-data pipelines. The
    md5 hash family makes every step choice bit-reproducible, so the
    full paths (not just counts) hash-match the DuckDB oracle.
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg"))
    starts = deg.filter(
        (F.col("u") % 2 == 0) & ((F.col("u") / 2) % 10 == 0)
    ).select(F.col("u").alias("walk_id"))
    w = random_walks(edges, starts, steps=_WALK_STEPS)
    return w.select(
        "walk_id",
        *[F.element_at("path", i + 1).alias(f"s{i}") for i in range(_WALK_STEPS + 1)],
    )


# ---------------------------------------------------------------------------
# K-core decomposition (fixed-round peel)
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 6


def kcore_peel(edges: DataFrame, kdf: DataFrame, rounds: int = _KCORE_ROUNDS) -> DataFrame:
    """K-core via ``rounds`` synchronous peel rounds: repeatedly drop
    vertices whose degree within the surviving set is < k, where k is a
    one-row (k BIGINT) frame so callers can derive it from the data
    in-plan (``q_graph_kcore`` uses the lower-median initial degree).

    Returns (id, core_deg, stable) for round-``rounds`` survivors, where
    ``stable`` = 1 iff the vertex's in-core degree did not change in the
    final round — an in-plan convergence verdict, so "this IS the k-core"
    (not "k-core after R rounds") is itself part of the hash-checked
    output whenever all rows carry stable=1.

    Scale: each round is one degree count over edges semi-joined to the
    surviving set (two shuffle joins on vertex keys) — the synchronous
    form of distributed k-core peeling; k broadcasts as a 1-row frame.
    Rounds needed = peel depth, which is tiny on real graphs (power-law
    graphs shed low-degree shells in 2-4 rounds); production peeling at
    100 TB keeps the same round shape and iterates until the in-plan
    verdict reports stability.
    """
    edges = edges.cache()
    active = edges.select("u").distinct()
    prev_deg = None
    deg = None
    for _ in range(rounds):
        prev_deg = deg
        # localCheckpoint (eager) truncates lineage each round: ``active``
        # feeds BOTH semi joins, so without it the logical plan doubles
        # per round (2^rounds copies of the base scan) and analysis alone
        # dominates. Same discipline as dedup.connected_min_labels.
        deg = (
            edges.join(active.select(F.col("u").alias("au")), F.col("u") == F.col("au"), "left_semi")
            .join(active.select(F.col("u").alias("av")), F.col("v") == F.col("av"), "left_semi")
            .groupBy("u")
            .agg(F.count("*").alias("core_deg"))
            .crossJoin(F.broadcast(kdf))
            .filter(F.col("core_deg") >= F.col("k"))
            .drop("k")
            .localCheckpoint()
        )
        active = deg.select("u")
    out = deg.alias("d").join(
        prev_deg.select(F.col("u").alias("pu"), F.col("core_deg").alias("prev_deg")).alias("p"),
        F.col("d.u") == F.col("p.pu"),
        "left",
    )
    return out.select(
        F.col("d.u").alias("id"),
        F.col("d.core_deg").alias("core_deg"),
        F.when(F.col("p.prev_deg") == F.col("d.core_deg"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("stable"),
    )


_KCORE_ORACLE_ROUND = """
    d{r} AS (
        SELECT e.u, COUNT(*) AS core_deg
        FROM edges e
        JOIN a{prev} x ON e.u = x.u
        JOIN a{prev} y ON e.v = y.u
        GROUP BY e.u
        HAVING COUNT(*) >= (SELECT k FROM kk)
    ),
    a{r} AS (SELECT u FROM d{r})"""


@query(
    "q_graph_kcore",
    oracle=f"""
    WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT u, v FROM cs UNION ALL SELECT v, u FROM cs),
    d0 AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    ranked AS (
        SELECT d, ROW_NUMBER() OVER (ORDER BY d, u) AS rn FROM d0
    ),
    kk AS (
        SELECT d AS k FROM ranked
        WHERE rn = ((SELECT COUNT(*) FROM d0) + 1) // 2
    ),
    a0 AS (SELECT DISTINCT u FROM edges),
    {",".join(_KCORE_ORACLE_ROUND.format(r=r, prev=r - 1).lstrip() for r in range(1, _KCORE_ROUNDS + 1))}
    SELECT d.u AS node_id,
           CASE WHEN d.u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(d.core_deg AS BIGINT) AS core_deg,
           CAST(CASE WHEN p.core_deg = d.core_deg THEN 1 ELSE 0 END AS INTEGER)
               AS stable
    FROM d{_KCORE_ROUNDS} d
    LEFT JOIN d{_KCORE_ROUNDS - 1} p ON d.u = p.u
    """,
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-scaling k-core of the co-purchase graph: k = the lower-median
    initial degree, 6 peel rounds, with a per-node stability verdict. The
    dense-subgraph screen used both for commerce anomaly detection
    (collusive rings) and corpus curation (boilerplate template farms
    show up as unexpectedly dense k-cores in doc-similarity graphs).

    The median pick never sorts the vertex table through one task: the
    oracle's ROW_NUMBER orders by (d, u), but the median row's DEGREE
    depends only on how many vertices hold each degree value, so the
    plan reduces to per-degree counts, bands the degree axis
    (``q_gini_concentration``'s template: per-band counts → exclusive
    offsets over the tiny band table → in-band running sums), and picks
    the degree whose cumulative range covers row (n+1) DIV 2 — identical
    k, every window bounded or band-partitioned.
    """
    edges = _copurchase_edges(spark, sf_dir)
    from .banding import banded_lower_median

    d0 = edges.groupBy("u").agg(F.count("*").alias("d"))
    # per-degree census; distinct degrees ≤ O(sqrt(2|E|)) but the helper
    # bands anyway so no unpartitioned window ever exceeds the band table.
    # localCheckpoint the 1-row k: every peel round cross-joins it, and
    # without truncation the whole degree-census subtree re-executes
    # per round (same discipline as the peel's own per-round checkpoint)
    dc = d0.groupBy("d").agg(F.count("*").alias("c"))
    kdf = (
        banded_lower_median(dc, "d", "c")
        .select(F.col("d").alias("k"))
        .localCheckpoint()
    )
    res = kcore_peel(edges, kdf, rounds=_KCORE_ROUNDS)
    return res.select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("core_deg").cast("long").alias("core_deg"),
        F.col("stable"),
    )


# ---------------------------------------------------------------------------
# Connected components: alternating large-star / small-star
# ---------------------------------------------------------------------------


def connected_components_star(
    edges: DataFrame, max_rounds: int = 30, stats: dict | None = None
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    rounds — the O(log n)-round MapReduce CC construction (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii: "Connected Components in
    MapReduce and Beyond", ACM SoCC 2014; public algorithm, reimplemented
    here as plain DataFrame aggregations).

    Returns (id, cluster_id) with cluster_id = the component's minimum
    node id — the SAME labels as ``dedup.connected_min_labels``, whose
    min-label propagation needs O(diameter) rounds: on chain-shaped
    (adversarial) graphs that is O(n) shuffles, while the star
    alternation provably collapses any component in O(log n) rounds.
    This is the 100 TB-safe spelling; the property test pins the round
    count on chains.

    Per round each star op is one groupBy(min) over the current edge
    set plus one join back — two shuffles keyed on node id, edge count
    never grows above the input (plus one parent pointer per node). The
    edge frame is localCheckpoint-ed per round (it feeds both ops and
    the convergence probe), and convergence is detected by a (count,
    order-insensitive xxhash checksum) signature — one tiny job per
    round, no data to the driver.

    ``stats``, when provided, receives {"rounds": r, "converged": bool}.
    """
    # drop self-loops and orient (max, min): small-star's canonical form,
    # which both star ops preserve (all emitted edges point u -> smaller)
    e = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        # LARGE-STAR: symmetrize, then connect every neighbor v > u to
        # m = min(N(u) ∪ {u}) — hub nodes hand their big neighborhoods
        # to their minimum in one round
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # SMALL-STAR: per node u over its ≤-neighbors Γ(u), connect
        # everything (u included) to m = min(Γ(u) ∪ {u})
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            o.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        sig = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    # converged edge set is a star forest u -> component min; roots
    # appear only on the v side and label themselves
    return e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id")).unionByName(
        e.select(F.col("v").alias("id"), F.col("v").alias("cluster_id"))
    ).distinct()


def _cc_oracle() -> str:
    from .dedup import CLUSTERS_ORACLE

    return CLUSTERS_ORACLE


@query("q_graph_cc", oracle=_cc_oracle())
def q_graph_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the exact near-duplicate pair graph via
    large-star/small-star — same labels, same oracle, same output schema
    as ``q_dedup_clusters``'s min-label propagation, but in O(log n)
    rounds instead of O(diameter): the spelling that survives
    adversarial chain-shaped duplicate graphs at 100 TB. Nodes outside
    any pair are absent (exactly like the propagation form); is_kept
    marks each cluster's surviving minimum doc.
    """
    from .dedup import _NEAR_DUP_THRESHOLD, _exact_pairs, _shingles

    docs = table(spark, sf_dir, "documents")
    pairs = _exact_pairs(_shingles(docs), _NEAR_DUP_THRESHOLD).select(
        F.col("d1").alias("u"), F.col("d2").alias("v")
    )
    labels = connected_components_star(pairs)
    return labels.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        (F.col("cluster_id") == F.col("id")).alias("is_kept"),
    )


#: Link-prediction safety cap: customers whose distinct-supplier degree
#: exceeds this bound are dropped from PAIR GENERATION (not from the
#: degree tables) — the df-cap discipline of the dedup family. TPC-H
#: customer degree is ~O(orders-per-customer × items-per-order), which
#: is scale-INVARIANT (~40), so the cap only guards pathological skew.
_LP_MAX_CUST_DEGREE = 256

_CS_SQL = """
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


@query(
    "q_graph_common_neighbors",
    oracle=f"""
    WITH cs AS ({_CS_SQL}),
    degc AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS dc
             FROM cs GROUP BY cust),
    degs AS (SELECT supp, CAST(COUNT(*) AS BIGINT) AS ds
             FROM cs GROUP BY supp),
    pairs AS (
        SELECT a.supp AS s1, b.supp AS s2, a.cust AS cust
        FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
        JOIN degc ON degc.cust = a.cust
        WHERE degc.dc <= {_LP_MAX_CUST_DEGREE}
    ),
    scored AS (
        SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS cn,
               CAST(SUM(CAST(FLOOR(1000000.0 / LOG2(CAST(dc AS DOUBLE))
                    + 0.5) AS BIGINT)) AS BIGINT) AS aa_fp
        FROM pairs JOIN degc USING (cust)
        GROUP BY s1, s2
    )
    SELECT s1, s2, cn, d1.ds AS deg1, d2.ds AS deg2,
           CAST(FLOOR(CAST(cn AS DOUBLE)
                / CAST(d1.ds + d2.ds - cn AS DOUBLE)
                * 1000000 + 0.5) AS BIGINT) AS jaccard_fp,
           aa_fp
    FROM scored
    JOIN degs d1 ON d1.supp = s1
    JOIN degs d2 ON d2.supp = s2
    ORDER BY cn DESC, s1, s2
    LIMIT 20
    """,
)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-purchase bipartite graph: for every
    supplier pair sharing at least one customer, the three classic
    scores — common-neighbor count, Jaccard over customer sets, and
    Adamic–Adar (each shared customer weighted 1/log2(degree), so
    promiscuous customers count less) — top-20 by raw overlap. The
    "which two nodes will connect next" primitive of recommendation
    and graph-completion pipelines.

    Determinism: cn/degrees are exact int64; Adamic–Adar quantizes each
    1/log2(dc) term to BIGINT before the sum (the entropy convention);
    Jaccard is one double over integers. (cn DESC, s1, s2) is a total
    order, so the LIMIT is deterministic.

    Scale: pair generation fans out per customer posting list —
    bounded by the df-cap (``_LP_MAX_CUST_DEGREE``) exactly like the
    MinHash band joins, never all-pairs: the capped degree lands on the
    posting list BEFORE the self-join (plan-asserted) via a window
    count over the cust partitioning, so candidate volume is
    Σ_c deg(c)² ≤ customers × cap² even on a pathologically hot
    customer. The window, both self-join sides and the distinct all
    ride ONE reused (cust[, supp]) exchange chain, dc rides the pair
    rows (no post-pair weight join), and the top-20 is a distributed
    TakeOrdered, not a global sort.
    """
    return common_neighbor_scores(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )


def common_neighbor_scores(o: DataFrame, li: DataFrame) -> DataFrame:
    """The link-prediction plan on arbitrary orders/lineitem frames —
    split out so ``tools/scale_stress.py`` can run the df-capped
    posting-list shape on replicated input."""
    # Explicit not-null filters on all four key columns (r15, guide
    # §2.4): WITHOUT them Catalyst inferred a DIFFERENT null filter per
    # consumer branch (the pair branch inferred isnotnull(o_custkey)
    # from its self-join keys, the degree branch isnotnull(l_suppkey)
    # from its own), the two copies of the distinct subtree stopped
    # canonicalizing identically, and the orders x lineitem join +
    # (cust, supp) exchange ran TWICE — the runtime plan showed two full
    # scan-join-exchange chains where the comment below promises one.
    # Equal explicit constraints make the subtrees byte-identical so the
    # exchange actually reuses (plans/r15). Contract note: an edge with
    # a null endpoint is not an edge (and TPC-H declares these keys NOT
    # NULL); on null-free inputs this is a pure plan change.
    o = o.select("o_orderkey", "o_custkey").filter(
        F.col("o_orderkey").isNotNull() & F.col("o_custkey").isNotNull()
    )
    li = li.select("l_orderkey", "l_suppkey").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    # No checkpoint, no degc JOIN (r14 opt, guide §2.4): the distinct's
    # own (cust, supp) exchange is the shared materialization point —
    # every consumer (both pair-join sides, supplier degrees) reuses it
    # via ReusedExchange, so the orders x lineitem join + partial
    # distinct run exactly once without an eager localCheckpoint
    # barrier. The customer degree comes from a WINDOW count over the
    # cust-partitioned posting list instead of a groupBy+join: one
    # exchange establishes the cust hash partitioning, the window rides
    # it, and the pair self-join's clustering requirement is already
    # satisfied by that same exchange (reused for both aliases) — the
    # r13 spelling computed degc and the cap join twice, once per join
    # side, behind four exchanges.
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    degs = cs.groupBy("supp").agg(F.count("*").cast("long").alias("ds"))
    # The degree cap must land BEFORE the pair self-join: a hot customer
    # with degree d fans out O(d^2) join rows, so filtering dc after the
    # join (the r13 spelling — Catalyst does NOT reorder a capped join
    # ahead of the fan-out) leaves the plan quadratic in the hottest key.
    # Attaching the capped dc to each posting-list row up front bounds
    # pair generation at the source (candidate volume <= customers x
    # cap^2) — dc rides the pair rows for the Adamic-Adar weight.
    # Pinned by tests/test_plan_quality.py::test_pair_join_caps_precede_fanout.
    # Explicit-width cust exchange (r14 opt, guide §2.5): AQE sizes the
    # post-shuffle partition count from the exchange's READ bytes, but the
    # pair self-join above it fans every posting-list row out up to cap
    # times — at sf0.1 a 12 MB exchange AQE coalesces to ~9 partitions
    # feeds a 12.5M-row join+aggregate stage. Pinning the exchange at the
    # session's configured shuffle parallelism (a conf, not a constant —
    # locally cores, on a cluster whatever shuffle.partitions is set to)
    # keeps the fan-out stage wide: 2.36s → 1.98s at sf0.1. The window
    # and both self-join sides reuse this one exchange.
    wide = cs.repartition(
        int(cs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
        "cust",
    )
    capped = wide.withColumn(
        "dc", F.count("*").over(W.partitionBy("cust")).cast("long")
    ).filter(F.col("dc") <= _LP_MAX_CUST_DEGREE)
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b, (F.col("a.cust") == F.col("b.cust")) & (F.col("a.supp") < F.col("b.supp"))
    ).select(
        F.col("a.supp").alias("s1"),
        F.col("b.supp").alias("s2"),
        F.col("a.dc").alias("dc"),
    )
    aa_term = F.floor(
        F.lit(1_000_000.0) / F.log2(F.col("dc").cast("double")) + F.lit(0.5)
    ).cast("long")
    scored = pairs.groupBy("s1", "s2").agg(
        F.count("*").cast("long").alias("cn"),
        F.sum(aa_term).cast("long").alias("aa_fp"),
    )
    d1 = degs.select(F.col("supp").alias("s1"), F.col("ds").alias("deg1"))
    d2 = degs.select(F.col("supp").alias("s2"), F.col("ds").alias("deg2"))
    return (
        scored.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "cn",
            "deg1",
            "deg2",
            F.floor(
                F.col("cn").cast("double")
                / (F.col("deg1") + F.col("deg2") - F.col("cn")).cast("double")
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("jaccard_fp"),
            "aa_fp",
        )
        .orderBy(F.col("cn").desc(), "s1", "s2")
        .limit(20)
    )


@query(
    "q_graph_label_prop",
    oracle=f"""
    WITH cs AS ({_CS_SQL}),
    seeds AS (
        SELECT s_suppkey AS supp, CAST(s_nationkey AS BIGINT) AS label
        FROM supplier WHERE s_suppkey % 3 = 0
    ),
    votes1 AS (
        SELECT cs.cust, seeds.label, CAST(COUNT(*) AS BIGINT) AS n
        FROM cs JOIN seeds ON cs.supp = seeds.supp
        GROUP BY 1, 2
    ),
    cust_lab AS (
        SELECT cust, label FROM (
            SELECT cust, label,
                   ROW_NUMBER() OVER (PARTITION BY cust
                                      ORDER BY n DESC, label) AS r
            FROM votes1
        ) WHERE r = 1
    ),
    votes2 AS (
        SELECT cs.supp, cust_lab.label, CAST(COUNT(*) AS BIGINT) AS n
        FROM cs JOIN cust_lab ON cs.cust = cust_lab.cust
        WHERE cs.supp NOT IN (SELECT supp FROM seeds)
        GROUP BY 1, 2
    ),
    spread_lab AS (
        SELECT supp, label FROM (
            SELECT supp, label,
                   ROW_NUMBER() OVER (PARTITION BY supp
                                      ORDER BY n DESC, label) AS r
            FROM votes2
        ) WHERE r = 1
    )
    SELECT label,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM seeds s2
            WHERE s2.label = t.label) AS n_seeds,
           CAST(SUM(CASE WHEN kind = 'c' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers,
           CAST(SUM(CASE WHEN kind = 's' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_spread_suppliers
    FROM (
        SELECT label, 'c' AS kind FROM cust_lab
        UNION ALL
        SELECT label, 's' AS kind FROM spread_lab
    ) t
    GROUP BY label
    ORDER BY label
    """,
)
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation on the co-purchase bipartite
    graph: a third of the suppliers are seeded with their nation as
    the label; round 1 labels every customer by the majority label of
    its seeded suppliers (ties → smallest label — the deterministic
    tie-break every sync label-prop needs), round 2 labels the
    UNSEEDED suppliers from their customers' round-1 labels. Output is
    the per-label census (seeds, labeled customers, spread suppliers)
    — community structure recovered from 2 hops of message passing,
    the bounded-round sibling of ``q_graph_cc``'s min-label star
    contraction.

    Scale: each round is one shuffle keyed on the receiving node
    (map-side-combined vote counts) plus a PARTITIONED row_number
    argmax — no global windows, no iteration-count data dependence
    (fixed 2 rounds), seed table broadcast into round 1.
    """
    # localCheckpoint: both propagation rounds consume the same
    # distinct co-purchase edge set — materialize it once
    cs = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
            table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_suppkey"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
        .localCheckpoint()
    )
    sup = table(spark, sf_dir, "supplier")
    seeds = sup.filter(F.col("s_suppkey") % 3 == 0).select(
        F.col("s_suppkey").alias("supp"),
        F.col("s_nationkey").cast("long").alias("label"),
    )
    w_cust = W.partitionBy("cust").orderBy(F.col("n").desc(), "label")
    cust_lab = (
        cs.join(F.broadcast(seeds), "supp")
        .groupBy("cust", "label")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("r", F.row_number().over(w_cust))
        .filter(F.col("r") == 1)
        .select("cust", "label")
    )
    non_seed = sup.filter(F.col("s_suppkey") % 3 != 0).select(
        F.col("s_suppkey").alias("supp")
    )
    w_supp = W.partitionBy("supp").orderBy(F.col("n").desc(), "label")
    spread_lab = (
        cs.join(F.broadcast(non_seed), "supp", "left_semi")
        .join(cust_lab, "cust")
        .groupBy("supp", "label")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("r", F.row_number().over(w_supp))
        .filter(F.col("r") == 1)
        .select("supp", "label")
    )
    seed_census = seeds.groupBy("label").agg(
        F.count("*").cast("long").alias("n_seeds")
    )
    union = cust_lab.select("label", F.lit("c").alias("kind")).unionByName(
        spread_lab.select("label", F.lit("s").alias("kind"))
    )
    return (
        union.groupBy("label")
        .agg(
            F.sum(F.when(F.col("kind") == "c", 1).otherwise(0))
            .cast("long")
            .alias("n_customers"),
            F.sum(F.when(F.col("kind") == "s", 1).otherwise(0))
            .cast("long")
            .alias("n_spread_suppliers"),
        )
        .join(F.broadcast(seed_census), "label")
        .select("label", "n_seeds", "n_customers", "n_spread_suppliers")
        .orderBy("label")
    )
