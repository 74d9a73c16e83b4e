"""Property tests for the round-6 tie-sensitive operators.

``q_weighted_median``'s band localization and ``q_skyline_pareto``'s
bucketed prune both claim exact equality with their naive declarative
definitions, with the subtle cases living at ties (equal values crossing
the weight threshold; equal quality/length pairs on the frontier). The
fixed-frame tests pin known cases; this layer fuzzes the tie space.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_flags = st.sampled_from(["A", "B"])
# prices on the 2-decimal grid, spanning several 1000-wide bands
_prices = st.integers(min_value=0, max_value=450_000).map(lambda c: c / 100.0)
_weights = st.integers(min_value=1, max_value=50)

_li_rows = st.lists(
    st.tuples(_flags, _prices, _weights), min_size=1, max_size=40
)

_words = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=6
).map(" ".join)
_doc_rows = st.lists(
    st.tuples(_words, st.integers(min_value=1, max_value=8)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_li_rows)
def test_weighted_median_equals_bruteforce(spark, rows):
    from pyspark_excel_datasource_spark.operators.extras import weighted_median

    li = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity long"
    )
    got = {r.flag: (r.total_w, r.median_price)
           for r in weighted_median(li).collect()}
    import collections

    groups = collections.defaultdict(list)
    for f, v, w in rows:
        groups[f].append((v, w))
    for f, vw in groups.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= total:
                assert got[f] == (total, f"{v:.2f}"), (f, vw)
                break


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_doc_rows)
def test_skyline_equals_bruteforce(spark, rows):
    from pyspark_excel_datasource_spark.operators.pipeline import skyline_select

    docs = spark.createDataFrame(
        [(i, t, n) for i, (t, n) in enumerate(rows)],
        "doc_id long, text string, n_chars long",
    )
    got = {r.doc_id for r in skyline_select(docs).collect()}
    pts = {}
    for i, (t, n) in enumerate(rows):
        ws = t.split(" ")
        pts[i] = (len(set(ws)) / len(ws), n)
    frontier = {
        i
        for i, (q, l) in pts.items()
        if not any(
            bq >= q and bl >= l and (bq > q or bl > l)
            for j, (bq, bl) in pts.items()
            if j != i
        )
    }
    # frontier membership is by (q, l) value: duplicates of a frontier
    # point are all kept
    vals = {pts[i] for i in frontier}
    want = {i for i, p in pts.items() if p in vals}
    assert got == want, (rows, got, want)


_uid = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=12)  # dense -> many exact ties
_etype = st.sampled_from(["click", "purchase", "view"])
_ev_rows = st.lists(st.tuples(_uid, _ts, _etype), min_size=1, max_size=25)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ev_rows)
def test_asof_nearest_ties_equal_bruteforce(spark, rows):
    """The strict-both-sides tie semantics (a simultaneous click is
    neither prior nor later) must hold under dense timestamp ties —
    the case the sort-order trick exists for."""
    import datetime

    from pyspark_excel_datasource_spark.operators.relational import asof_nearest

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, u, base + datetime.timedelta(seconds=t), e)
        for i, (u, t, e) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    got = {
        r.event_id: (r.nearest_click, r.side, r.gap_s)
        for r in asof_nearest(ev).collect()
    }
    clicks = {}
    for i, u, t, e in data:
        if e == "click":
            clicks.setdefault(u, []).append(t)
    n_purch = 0
    for i, u, t, e in data:
        if e != "purchase":
            continue
        n_purch += 1
        cs = clicks.get(u, [])
        back = max((c for c in cs if c < t), default=None)
        fwd = min((c for c in cs if c > t), default=None)
        if back is None and fwd is None:
            want = (None, "none", -1)
        elif fwd is None or (back is not None and t - back <= fwd - t):
            want = (back, "prior", int((t - back).total_seconds()))
        else:
            want = (fwd, "later", int((fwd - t).total_seconds()))
        assert got[i] == want, (i, data)
    assert len(got) == n_purch
