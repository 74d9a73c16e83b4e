"""ORC source/sink + URL-operator tests (late round-6 surface)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()[name]


def test_orc_scan_filter_pushed(spark):
    """The status predicate must reach the ORC scan as a pushed filter
    (stripe-stat skipping — the contract the repo pins for parquet)."""
    df = _q("q_scan_orc")(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ScanOrc" in plan.replace(" ", "") or "orc" in plan.lower()
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "o_orderstatus" in pushed


def test_orc_sink_roundtrip_matches_direct(spark):
    """Readback through the ORC encode/decode path must equal the same
    aggregate computed directly from parquet."""
    back = _q("q_sink_orc")(spark, SF)
    direct = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_qty"),
        )
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_fn_url_components(spark):
    """parse_url decomposition matches a hand parse of one row."""
    row = _q("q_fn_url")(spark, SF).filter(F.col("doc_id") == 3).first()
    assert row.url.startswith("https://")
    scheme_rest = row.url.split("://", 1)[1]
    host = scheme_rest.split("/", 1)[0]
    assert row.host == host  # case preserved by parse
    assert row.path == "/" + scheme_rest.split("/", 1)[1].split("?", 1)[0]
    assert row.fragment == row.url.rsplit("#", 1)[1]
    assert row.id_param == str(3 % 97)
    assert "utm_source=feed" in row.query


def test_dedup_url_canonical_merges_and_keeps_min(spark):
    """Canonical dedup: every doc lands in exactly one canonical group,
    the keeper is the min doc_id of its group, and the canonical form is
    lowercase-host with tracking params and fragment stripped."""
    out = _q("q_dedup_url")(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_dups for r in out) == n_docs
    for r in out:
        host = r.canonical_url.split("://", 1)[1].split("/", 1)[0]
        assert host == host.lower()
        assert "utm" not in r.canonical_url
        assert "#" not in r.canonical_url
        assert "ref=" not in r.canonical_url
