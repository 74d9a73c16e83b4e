"""Iceberg data skipping: per-file lower/upper bounds recorded in the
manifests at commit, manifest-level pruning, conservative fallbacks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.catalog import table
from pyspark_excel_datasource_spark.sources.iceberg import (
    read_iceberg,
    snapshot_iceberg,
    write_iceberg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )


def _ts(s):
    return F.lit(s).cast("timestamp_ntz")


def _build(spark, orders, out: str) -> None:
    slices = (
        orders.filter(F.col("o_orderdate") < _ts("1997-01-01")),
        orders.filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1999-01-01"))
        ),
        orders.filter(F.col("o_orderdate") >= _ts("1999-01-01")),
    )
    for i, sl in enumerate(slices):
        write_iceberg(
            spark, sl.repartition(1), out, mode="append" if i else "overwrite"
        )


def test_writer_records_bounds_in_manifests(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    _build(spark, orders, out)
    snap = snapshot_iceberg(out)
    assert len(snap.files) == 3
    assert set(snap.files_lower) == set(snap.files)
    assert set(snap.files_upper) == set(snap.files)
    ids = {v: str(k) for k, v in snap.field_names_by_id.items()}
    for p in snap.files:
        lo, hi = snap.files_lower[p], snap.files_upper[p]
        for c in ("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"):
            assert lo[ids[c]] <= hi[ids[c]]
    # date slices are disjoint: the three o_orderdate ranges don't overlap
    spans = sorted(
        (snap.files_lower[p][ids["o_orderdate"]], snap.files_upper[p][ids["o_orderdate"]])
        for p in snap.files
    )
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_bounds_filter_prunes_but_never_loses_rows(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    _build(spark, orders, out)
    flt = {"o_orderdate": ("1997-06-01 00:00:00", "1998-06-01 00:00:00")}
    pruned = read_iceberg(spark, out, bounds_filter=flt)
    assert pruned.select(F.input_file_name()).distinct().count() == 1
    pred = (F.col("o_orderdate") >= _ts("1997-06-01")) & (
        F.col("o_orderdate") <= _ts("1998-06-01")
    )
    full = read_iceberg(spark, out).filter(pred)
    assert sorted(r.o_orderkey for r in pruned.filter(pred).collect()) == sorted(
        r.o_orderkey for r in full.collect()
    )
    none = read_iceberg(
        spark, out, bounds_filter={"o_orderkey": (10**15, 10**16)}
    )
    assert none.count() == 0
    with pytest.raises(ValueError, match="unknown columns"):
        read_iceberg(spark, out, bounds_filter={"nope": (1, 2)})


def test_file_without_bounds_is_kept(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    _build(spark, orders, out)
    snap = snapshot_iceberg(out)
    # simulate an older manifest: drop one file's bounds from the
    # in-memory snapshot and re-run the reader's pruning logic
    victim = sorted(snap.files)[0]
    snap.files_lower.pop(victim)
    snap.files_upper.pop(victim)
    ids = {v: str(k) for k, v in snap.field_names_by_id.items()}
    lo, hi = (10**15, 10**16)
    kept = [
        p
        for p in snap.files
        if p not in snap.files_lower
        or not (
            snap.files_lower[p][ids["o_orderkey"]] > hi
            or snap.files_upper[p][ids["o_orderkey"]] < lo
        )
    ]
    assert kept == [victim]  # unbounded file survives an impossible range
