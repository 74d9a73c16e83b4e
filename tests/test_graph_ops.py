"""Semantic properties of the graph operators (round 7). Cross-engine
value parity is the driver's / tools/run_parity.py's job; these pin the
invariants the oracle comparison can't see — mass conservation, exact
reproducibility across partition counts, triangle-count ground truth on
a hand-built graph."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_conservation(spark):
    """Sum of ranks stays ≈ SCALE (total probability mass 1.0): each
    iteration redistributes, never creates, mass. FLOOR quantization only
    leaks mass downward, bounded by one ulp per (edge + node)."""
    from pyspark_excel_datasource_spark.operators.graph import (
        _PR_SCALE,
        _copurchase_edges,
        pagerank,
    )

    edges = _copurchase_edges(spark, SF)
    n_edges = edges.count()
    pr = pagerank(edges, iterations=3)
    n_nodes = pr.count()
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert total <= _PR_SCALE
    # floor-loss: < 1 unit per edge contribution per iteration + base term
    assert total >= _PR_SCALE - 3 * (n_edges + n_nodes) - n_nodes


def test_pagerank_partition_invariant(spark):
    """The fixed-point quantization makes the result EXACTLY identical
    under different partitioning — the property that lets a
    1000-executor run agree with the oracle bit-for-bit."""
    from pyspark_excel_datasource_spark.operators.graph import (
        _copurchase_edges,
        pagerank,
    )

    edges = _copurchase_edges(spark, SF)
    a = {(r.id, r.pr) for r in pagerank(edges, iterations=2).collect()}
    b = {
        (r.id, r.pr)
        for r in pagerank(edges.repartition(13), iterations=2).collect()
    }
    assert a == b


def test_pagerank_uniform_on_regular_graph(spark):
    """On a k-regular graph (a cycle), PageRank is exactly uniform at
    every iteration — a closed-form check of the update rule."""
    from pyspark_excel_datasource_spark.operators.graph import (
        _PR_SCALE,
        pagerank,
    )

    n = 8
    cyc = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)],
        "u long, v long",
    )
    rows = pagerank(cyc, iterations=3).collect()
    assert len(rows) == n
    vals = {r.pr for r in rows}
    assert len(vals) == 1, f"cycle graph must stay uniform, got {vals}"
    # uniform value ≈ SCALE/n (floor losses only)
    assert abs(vals.pop() - _PR_SCALE // n) <= 3


def test_triangles_ground_truth(spark):
    """Hand-built orders: {p1,p2,p3} together twice and {p1,p4} once →
    exactly one triangle {p1,p2,p3}, each member participating once
    (distinct edges collapse the repeat)."""
    from pyspark_excel_datasource_spark.operators.graph import q_graph_triangles
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        li = spark.createDataFrame(
            [
                (1, 101),
                (1, 102),
                (1, 103),
                (2, 101),
                (2, 102),
                (2, 103),
                (3, 101),
                (3, 104),
            ],
            "l_orderkey long, l_partkey long",
        )
        li.write.parquet(os.path.join(td, "lineitem.parquet"))
        out = {
            (r.partkey, r.n_triangles)
            for r in q_graph_triangles(spark, td).collect()
        }
    assert out == {(101, 1), (102, 1), (103, 1)}


def test_pagerank_plan_has_no_python_stages(spark):
    """PageRank must stay entirely JVM-side — joins + integer aggs, no
    Python workers in the hot path."""
    import contextlib
    import io

    from pyspark_excel_datasource_spark.operators.graph import (
        _copurchase_edges,
        pagerank,
    )

    df = pagerank(_copurchase_edges(spark, SF), iterations=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_random_walks_are_valid_and_partition_invariant(spark):
    """Every consecutive walk pair must be a real edge, and the paths must
    be identical under a different partitioning (the determinism claim:
    a walk is a pure function of (walk_id, step, node))."""
    from pyspark_excel_datasource_spark.operators.graph import random_walks

    sym = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    edges = spark.createDataFrame(sym, "u long, v long")
    starts = spark.createDataFrame([(1,), (4,)], "walk_id long")
    got = {r.walk_id: r.path for r in random_walks(edges, starts, steps=3).collect()}
    assert set(got) == {1, 4}
    eset = set(sym)
    for path in got.values():
        assert len(path) == 4
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset, f"walk used a non-edge {(a, b)}"
    got2 = {
        r.walk_id: r.path
        for r in random_walks(edges.repartition(7), starts, steps=3).collect()
    }
    assert got == got2


def test_kcore_matches_sequential_peel_to_fixpoint(spark):
    """Round-based peel with a stable verdict must agree with a sequential
    peel-to-fixpoint reference whenever every row reports stable=1."""
    from pyspark_excel_datasource_spark.operators.graph import kcore_peel

    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (1, 4), (2, 4), (5, 6)]
    sym = und + [(b, a) for a, b in und]
    k = 3
    # sequential reference: peel to fixpoint
    active = {u for u, _ in sym}
    while True:
        deg = {}
        for a, b in sym:
            if a in active and b in active:
                deg[a] = deg.get(a, 0) + 1
        nxt = {u for u, d in deg.items() if d >= k}
        if nxt == active:
            break
        active = nxt
    want = {u: deg[u] for u in active}

    edges = spark.createDataFrame(sym, "u long, v long")
    kdf = spark.createDataFrame([(k,)], "k long")
    rows = kcore_peel(edges, kdf, rounds=5).collect()
    assert all(r.stable == 1 for r in rows)
    assert {r.id: r.core_deg for r in rows} == want


# ---------------------------------------------------------------------------
# Large-star / small-star connected components
# ---------------------------------------------------------------------------


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_cc_star_matches_union_find(spark):
    from pyspark_excel_datasource_spark.operators.graph import (
        connected_components_star,
    )

    raw = [(1, 2), (2, 3), (7, 8), (9, 9), (10, 11), (11, 12), (12, 10), (5, 4)]
    edges = spark.createDataFrame(raw, "u long, v long")
    stats = {}
    got = {
        r.id: r.cluster_id
        for r in connected_components_star(edges, stats=stats).collect()
    }
    want = _union_find_labels([(a, b) for a, b in raw if a != b])
    assert got == want
    assert stats["converged"]


def test_cc_star_chain_converges_in_log_rounds(spark):
    """The whole point of the star alternation: a 256-node chain (diameter
    255 — min-label propagation would need ~255 rounds) collapses in
    O(log n) rounds."""
    from pyspark_excel_datasource_spark.operators.graph import (
        connected_components_star,
    )

    n = 256
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(chain, "u long, v long")
    stats = {}
    labels = {
        r.id: r.cluster_id
        for r in connected_components_star(edges, stats=stats).collect()
    }
    assert labels == {i: 0 for i in range(n)}
    assert stats["converged"]
    # provable O(log n); allow head-room over log2(256)=8 for the
    # orientation warm-up rounds
    assert stats["rounds"] <= 12, f"took {stats['rounds']} rounds"


def test_cc_star_bit_identical_to_min_label_propagation(spark):
    from pyspark_excel_datasource_spark.operators.dedup import (
        connected_min_labels,
    )
    from pyspark_excel_datasource_spark.operators.graph import (
        connected_components_star,
    )

    import random

    rng = random.Random(8)
    raw = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    raw = [(a, b) for a, b in raw if a != b]
    star = {
        r.id: r.cluster_id
        for r in connected_components_star(
            spark.createDataFrame(raw, "u long, v long")
        ).collect()
    }
    prop = {
        r.id: r.cluster_id
        for r in connected_min_labels(
            spark.createDataFrame(raw, "d1 long, d2 long")
        ).collect()
    }
    assert star == prop
