"""Property test: the distributed fixed-point PageRank agrees EXACTLY
(every bit of every fixed-point rank) with a sequential pure-Python
reference — on random symmetric graphs AND on general digraphs with
dangling nodes (sinks) and pure sources.

This is the strongest statement the fixed-point design makes: every
per-edge contribution is ``(pr * 85) div (outdeg * 100)`` in exact int64
— no float step anywhere — so the distributed reduction has no
order-dependence at all: a 4-thread Spark run, a 1000-executor run, and
a Python for-loop all produce the identical integer vector. Dangling
mass is redistributed uniformly (PageRank) or onto the seed set (PPR),
conserving total mass on digraphs. The reference below mirrors the
operator's arithmetic without mirroring its code."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark_excel_datasource_spark.operators.graph import (  # noqa: E402
    _PR_SCALE,
    _PR_TELEPORT,
    pagerank,
    personalized_pagerank,
)

# directed edges over ≤12 nodes; at least one edge, no self-loops
_edges = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=30,
)


def _reference(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    outdeg: dict[int, int] = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    verts = {u for u, _ in edges} | {v for _, v in edges}
    n = len(verts)
    pr = {u: _PR_SCALE // n for u in verts}
    for _ in range(iterations):
        recv: dict[int, int] = {}
        for u, v in edges:
            recv[v] = recv.get(v, 0) + (pr[u] * 85) // (outdeg[u] * 100)
        dm = sum(p for u, p in pr.items() if u not in outdeg)
        share = (dm * 85) // (n * 100)
        pr = {u: _PR_TELEPORT // n + recv.get(u, 0) + share for u in verts}
    return pr


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(raw=_edges, iterations=st.integers(1, 3))
def test_pagerank_bit_identical_on_symmetric_graphs(spark, raw, iterations):
    # symmetrize + dedup exactly like copurchase_edges' union shape
    und = {tuple(sorted(t)) for t in raw}
    sym = [(u, v) for u, v in und] + [(v, u) for u, v in und]
    edges = spark.createDataFrame(sym, "u long, v long")
    got = {r.id: r.pr for r in pagerank(edges, iterations=iterations).collect()}
    want = _reference(sym, iterations)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(raw=_edges, iterations=st.integers(1, 3))
def test_pagerank_bit_identical_on_digraphs_with_sinks(spark, raw, iterations):
    # raw directed edges as-is: nodes appearing only as v are sinks whose
    # mass must be redistributed, nodes appearing only as u are sources
    # that must retain their teleport share — both paths exercised
    di = sorted(set(raw))
    edges = spark.createDataFrame(di, "u long, v long")
    got = {r.id: r.pr for r in pagerank(edges, iterations=iterations).collect()}
    want = _reference(di, iterations)
    assert got == want


def test_pagerank_conserves_mass_on_star_digraph(spark):
    # 0→1, 0→2, 0→3: after one iteration the sinks' mass must feed back
    # uniformly instead of vanishing; closed-form check of the invariant
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "u long, v long")
    got = {r.id: r.pr for r in pagerank(edges, iterations=2).collect()}
    assert got == _reference([(0, 1), (0, 2), (0, 3)], 2)
    # total mass stays within quantization slack of _PR_SCALE (each node
    # can lose < 1 unit per floor, 3 floors per node per iteration)
    assert abs(sum(got.values()) - _PR_SCALE) < 12 * 4


def _reference_ppr(
    edges: list[tuple[int, int]], seed_ids: set[int], iterations: int
) -> dict[int, int]:
    outdeg: dict[int, int] = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    verts = {u for u, _ in edges} | {v for _, v in edges}
    seeds = {s for s in seed_ids if s in verts}
    ns = len(seeds)
    pr = {u: (_PR_SCALE // ns if u in seeds else 0) for u in verts}
    for _ in range(iterations):
        recv: dict[int, int] = {}
        for u, v in edges:
            recv[v] = recv.get(v, 0) + (pr[u] * 85) // (outdeg[u] * 100)
        dm = sum(p for u, p in pr.items() if u not in outdeg)
        seed_extra = _PR_TELEPORT // ns + (dm * 85) // (ns * 100)
        pr = {
            u: recv.get(u, 0) + (seed_extra if u in seeds else 0) for u in verts
        }
    return pr


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    raw=_edges,
    seed_ids=st.sets(st.integers(0, 11), min_size=1, max_size=4),
    iterations=st.integers(1, 3),
)
def test_ppr_bit_identical_to_sequential_reference(spark, raw, seed_ids, iterations):
    und = {tuple(sorted(t)) for t in raw}
    sym = [(u, v) for u, v in und] + [(v, u) for u, v in und]
    present = {u for u, _ in sym}
    # ensure at least one seed touches the graph (the operator semi-joins
    # seeds to vertices; an empty effective seed set is a caller error)
    if not (seed_ids & present):
        seed_ids = seed_ids | {next(iter(present))}
    edges = spark.createDataFrame(sym, "u long, v long")
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "id long")
    got = {
        r.id: r.pr
        for r in personalized_pagerank(edges, seeds, iterations=iterations).collect()
    }
    want = _reference_ppr(sym, seed_ids, iterations)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    raw=_edges,
    seed_ids=st.sets(st.integers(0, 11), min_size=1, max_size=4),
    iterations=st.integers(1, 2),
)
def test_ppr_bit_identical_on_digraphs_with_sinks(spark, raw, seed_ids, iterations):
    di = sorted(set(raw))
    verts = {u for u, _ in di} | {v for _, v in di}
    if not (seed_ids & verts):
        seed_ids = seed_ids | {next(iter(verts))}
    edges = spark.createDataFrame(di, "u long, v long")
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "id long")
    got = {
        r.id: r.pr
        for r in personalized_pagerank(edges, seeds, iterations=iterations).collect()
    }
    want = _reference_ppr(di, seed_ids, iterations)
    assert got == want
