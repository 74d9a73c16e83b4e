"""Delta data skipping: per-file footer stats recorded at commit time,
reader-side file pruning from the log, conservative fallbacks, and
checkpoint persistence of the stats index."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.catalog import table
from pyspark_excel_datasource_spark.sources.deltalog import (
    _commit,
    read_delta,
    snapshot,
    write_delta,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )


def _slices(orders):
    ts = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731
    return (
        orders.filter(F.col("o_orderdate") < ts("1997-01-01")),
        orders.filter(
            (F.col("o_orderdate") >= ts("1997-01-01"))
            & (F.col("o_orderdate") < ts("1999-01-01"))
        ),
        orders.filter(F.col("o_orderdate") >= ts("1999-01-01")),
    )


def test_writer_records_footer_stats(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    for sl in _slices(orders):
        write_delta(spark, sl.repartition(1), out, mode="append")
    snap = snapshot(out)
    assert len(snap.files) == 3
    assert set(snap.stats) == set(snap.files)
    total = sum(s["numRecords"] for s in snap.stats.values())
    assert total == orders.count()
    for s in snap.stats.values():
        # every primitive column statted; bounds ordered; nulls counted
        for c in ("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"):
            assert s["minValues"][c] <= s["maxValues"][c]
            assert s["nullCount"][c] == 0


def test_skipping_prunes_files_but_never_rows(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    for sl in _slices(orders):
        write_delta(spark, sl.repartition(1), out, mode="append")
    flt = {"o_orderdate": ("1997-06-01 00:00:00", "1998-06-01 00:00:00")}
    pruned = read_delta(spark, out, stats_filter=flt)
    assert pruned.select(F.input_file_name()).distinct().count() == 1
    ts = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731
    pred = (F.col("o_orderdate") >= ts("1997-06-01")) & (
        F.col("o_orderdate") <= ts("1998-06-01")
    )
    full = read_delta(spark, out).filter(pred)
    assert sorted(r.o_orderkey for r in pruned.filter(pred).collect()) == sorted(
        r.o_orderkey for r in full.collect()
    )
    # a range matching nothing prunes everything
    none = read_delta(
        spark, out, stats_filter={"o_orderkey": (10**15, 10**16)}
    )
    assert none.count() == 0


def test_file_without_stats_is_kept(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    write_delta(
        spark, orders.limit(10).repartition(1), out, mode="append"
    )
    snap = snapshot(out)
    (rel,) = snap.files
    # simulate an external writer: re-add the same file with NO stats
    _commit(
        out,
        snap.version + 1,
        [
            {"commitInfo": {"operation": "EXTERNAL"}},
            {"add": {"path": rel, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": False}},
        ],
    )
    snap2 = snapshot(out)
    assert rel not in snap2.stats  # re-add cleared stale bounds
    kept = read_delta(
        spark, out, stats_filter={"o_orderkey": (10**15, 10**16)}
    )
    # cannot prove the file irrelevant without stats -> it is scanned
    assert kept.count() == 10


def test_stats_survive_checkpoint(spark, orders, tmp_path):
    out = str(tmp_path / "t")
    a, b, _ = _slices(orders)
    write_delta(spark, a.repartition(1), out, mode="append")
    write_delta(  # v1 -> checkpoint_interval=2 writes a checkpoint at v2
        spark, b.repartition(1), out, mode="append"
    )
    write_delta(spark, orders.limit(5).repartition(1), out, mode="append")
    ckpt = os.path.join(out, "_delta_log", f"{2:020d}.checkpoint.parquet")
    assert os.path.exists(ckpt)
    # delete the JSON commits the checkpoint covers: replay must come
    # from the checkpoint alone and still carry the stats
    for v in (0, 1):
        os.remove(os.path.join(out, "_delta_log", f"{v:020d}.json"))
    snap = snapshot(out)
    assert set(snap.stats) == set(snap.files)
    for s in snap.stats.values():
        assert json.dumps(s)  # parsed dicts, JSON-serializable
    flt = read_delta(
        spark, out, stats_filter={"o_orderdate": ("1997-06-01 00:00:00", "1997-07-01 00:00:00")}
    )
    # slice a (pre-1997) pruned via checkpoint-carried stats
    assert flt.select(F.input_file_name()).distinct().count() <= 2


def test_norm_ts_stat_spellings():
    """Foreign ISO-8601 timestamp statistics normalize to this writer's
    space-separated spelling with trailing fractional zeros dropped (so
    boundary-equal instants compare equal lexicographically); non-UTC
    zones are unusable (None); other values pass through untouched."""
    from pyspark_excel_datasource_spark.sources.deltalog import _norm_ts_stat

    assert _norm_ts_stat("1998-12-31T00:00:00.000Z") == "1998-12-31 00:00:00"
    assert _norm_ts_stat("1998-12-31T23:59:59") == "1998-12-31 23:59:59"
    assert _norm_ts_stat("1998-12-31 23:59:59") == "1998-12-31 23:59:59"
    assert _norm_ts_stat("1998-12-31T12:00:00+00:00") == "1998-12-31 12:00:00"
    assert _norm_ts_stat("1998-12-31T12:00:00+05:30") is None
    assert _norm_ts_stat("1998-12-31T12:00:00-0800") is None
    # fraction canonicalization: trailing zeros (then the dot) strip, so
    # '.5' == '.500000' and '.000' == no fraction; nonzero digits stay
    assert _norm_ts_stat("1998-12-31 12:00:00.500000") == "1998-12-31 12:00:00.5"
    assert _norm_ts_stat("1998-12-31T12:00:00.250Z") == "1998-12-31 12:00:00.25"
    assert _norm_ts_stat("1998-12-31 12:00:00.000") == "1998-12-31 12:00:00"
    assert _norm_ts_stat("MAIL") == "MAIL"  # plain string stat untouched
    assert _norm_ts_stat(42) == 42
    assert _norm_ts_stat(None) is None


def test_foreign_iso_timestamp_stats_never_misprune(spark, orders, tmp_path):
    """A file statted by a FOREIGN writer ('T'-separated, 'Z'-suffixed
    ISO-8601) whose min shares the filter's hi date must survive the
    prune: lexicographically 'T' > ' ', so the un-normalized compare
    would evaluate min > hi and silently drop live rows."""
    out = str(tmp_path / "t")
    write_delta(
        spark, orders.limit(10).repartition(1), out, mode="append"
    )
    snap = snapshot(out)
    (rel,) = snap.files
    foreign_stats = json.dumps(
        {
            "numRecords": 10,
            "minValues": {"o_orderdate": "1995-01-02T00:00:00.000Z"},
            "maxValues": {"o_orderdate": "1998-12-31T23:59:59.000Z"},
            "nullCount": {"o_orderdate": 0},
        }
    )
    _commit(
        out,
        snap.version + 1,
        [
            {"commitInfo": {"operation": "EXTERNAL"}},
            {"add": {"path": rel, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": False,
                     "stats": foreign_stats}},
        ],
    )
    flt = {"o_orderdate": ("1995-01-02 00:00:00", "1995-01-02 23:59:59")}
    kept = read_delta(spark, out, stats_filter=flt)
    assert kept.count() == 10, "foreign 'T'-spelled min mispruned live rows"
    # and a range provably outside the (normalized) bounds still prunes
    none = read_delta(
        spark, out,
        stats_filter={"o_orderdate": ("2005-01-01 00:00:00", "2006-01-01 00:00:00")},
    )
    assert none.count() == 0


def test_string_column_ts_lookalikes_never_normalized(spark, tmp_path):
    """ADVICE r11: a STRING column whose values are ISO-'T'-spelled
    timestamps must NOT be respelled — only schema-typed timestamp
    columns normalize, and the BOUNDS normalize together with the
    stats. Before the fix, a one-sided rewrite turned max
    '2020-06-15T23:59:59' into '2020-06-15 23:59:59' which compares
    below a 'T'-spelled lo bound (space < 'T'), pruning a file that
    holds in-range rows."""
    from pyspark_excel_datasource_spark.sources.deltalog import stats_summary

    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2020-06-15T12:00:00",), ("2020-06-15T23:59:59",)], "ev string"
    )
    write_delta(spark, df.repartition(1), out, mode="append")
    # 'T'-spelled bound over the string column: the file holds both
    # values, so it must survive and both rows come back
    kept = read_delta(
        spark, out,
        stats_filter={"ev": ("2020-06-15T12:00:00", "2020-06-15T23:59:59")},
    )
    assert kept.count() == 2, "string-typed lookalike stats were respelled"
    # metadata-only MIN/MAX returns the VERBATIM string values — never a
    # respelled value no full scan produces
    n, mn, mx = stats_summary(out, "ev")
    assert (n, mn, mx) == (2, "2020-06-15T12:00:00", "2020-06-15T23:59:59")


def test_timestamp_bounds_normalize_both_sides(spark, orders, tmp_path):
    """A 'T'-spelled filter bound over a timestamp column normalizes
    alongside the stats — mixed spellings on the two compare sides must
    not prune live files (ADVICE r11's two-sided rule)."""
    out = str(tmp_path / "t")
    write_delta(spark, orders.limit(10).repartition(1), out, mode="append")
    row = (
        orders.limit(10).agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    )
    lo = row[0].isoformat(sep="T")  # deliberately the foreign spelling
    hi = row[1].isoformat(sep="T")
    kept = read_delta(spark, out, stats_filter={"o_orderdate": (lo, hi)})
    assert kept.count() == 10, "'T'-spelled bounds mispruned live rows"
