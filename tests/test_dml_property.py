"""Property tests: Delta UPDATE/DELETE (both strategies) and Iceberg
UPSERT vs a direct pandas model on random small frames.

The fixed-frame tests pin the documented semantics; this layer fuzzes
what they cannot enumerate — predicates matching nothing / everything /
NULL rows, SET expressions over predicate columns, repeated DML on the
same table, upserts that are all-updates or all-inserts, NULL keys.
Each drawn case runs the REAL table machinery end-to-end (commit, log
replay / manifest walk, read back) against the in-memory model.

Spark table writes are slow, so example counts stay small; determinism
comes from the machinery, not sampling volume.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # k (dup-able)
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),  # v
    ),
    min_size=1,
    max_size=12,
)
_cut = st.integers(min_value=-60, max_value=60)
_mode = st.sampled_from(["copy-on-write", "deletion-vectors"])


def _mk(spark, tmpdir, rows, name):
    from pyspark_excel_datasource_spark.sources.deltalog import write_delta

    path = os.path.join(tmpdir, name)
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "rid int, k int, v int",
    )
    write_delta(spark, df.repartition(2), path, checkpoint_interval=0)
    return path


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, cut=_cut, mode=_mode)
def test_update_where_matches_pandas(spark, tmp_path_factory, rows, cut, mode):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        read_delta,
        update_where,
    )

    tmpdir = str(tmp_path_factory.mktemp("upd"))
    path = _mk(spark, tmpdir, rows, "t")
    update_where(
        spark, path, f"v < {cut}", {"v": "v + 100", "k": "k + 1"}, mode=mode
    )
    got = {
        (r.rid, r.k, r.v) for r in read_delta(spark, path).collect()
    }
    exp = set()
    for i, (k, v) in enumerate(rows):
        if v is not None and v < cut:  # NULL predicate keeps the row
            exp.add((i, k + 1, v + 100))
        else:
            exp.add((i, k, v))
    assert got == exp


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, cut=_cut, mode=_mode)
def test_delete_where_matches_pandas(spark, tmp_path_factory, rows, cut, mode):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        delete_where,
        read_delta,
    )

    tmpdir = str(tmp_path_factory.mktemp("del"))
    path = _mk(spark, tmpdir, rows, "t")
    delete_where(spark, path, f"v >= {cut}", mode=mode)
    got = {(r.rid, r.k, r.v) for r in read_delta(spark, path).collect()}
    exp = {
        (i, k, v)
        for i, (k, v) in enumerate(rows)
        if not (v is not None and v >= cut)
    }
    assert got == exp


_seed = st.lists(
    st.tuples(st.integers(0, 6), st.integers(-20, 20)),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)
_up = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 9)), st.integers(100, 120)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=_seed, up=_up)
def test_iceberg_upsert_matches_dict_semantics(
    spark, tmp_path_factory, seed, up
):
    from pyspark_excel_datasource_spark.sources.iceberg import (
        read_iceberg,
        upsert_iceberg,
        write_iceberg,
    )

    tmpdir = str(tmp_path_factory.mktemp("ups"))
    path = os.path.join(tmpdir, "t")
    write_iceberg(
        spark, spark.createDataFrame(seed, "k int, v int"), path
    )
    upsert_iceberg(
        spark,
        spark.createDataFrame(up, "k int, v int"),
        path,
        on=["k"],
    )
    got = {(r.k, r.v) for r in read_iceberg(spark, path).collect()}
    model = {k: v for k, v in seed}
    for k, v in up:  # upsert keyed on k, NULL keys match NULL keys
        model[k] = v
    assert got == set(model.items())
