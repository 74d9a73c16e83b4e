"""Round-7 batch-2 operators: semantic properties the oracle hash
comparison can't see (containment vs Jaccard ordering, Zipf slope sign,
PMI symmetry of the underlying counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _queries():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()


def test_containment_dominates_jaccard(spark):
    """For every pair, containment ≥ Jaccard (min ≤ union), so the
    containment screen at equal threshold can only ADD pairs over the
    Jaccard screen — the reason it catches quote-inclusions."""
    from pyspark_excel_datasource_spark.operators.dedup import (
        _pair_overlap,
        _shingles,
    )
    from pyspark_excel_datasource_spark.catalog import table

    ov = _pair_overlap(_shingles(table(spark, SF, "documents")))
    bad = ov.filter(
        (F.col("inter") / F.least("n1", "n2"))
        < (F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")))
    ).count()
    assert bad == 0


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc embedded verbatim in a long one: containment = 1.0,
    Jaccard well under 0.8 — exactly the case the operator exists for."""
    import os
    import tempfile

    from pyspark_excel_datasource_spark.operators.dedup import (
        q_dedup_containment,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, short, "en", "a", len(short)), (2, long, "en", "a", len(long))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = q_dedup_containment(spark, td).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.d1, r.d2) == (1, 2)
    assert r.containment_fp == 1_000_000  # exact subset
    # and the Jaccard the pair would score is far below the 0.8 screen
    jac = r.inter / (4 + 44 - r.inter)
    assert jac < 0.5


def test_zipf_slope_negative_and_bounded(spark):
    """Frequency decreases with rank by construction, so every source's
    OLS slope must be strictly negative; quantization keeps it exact, so
    repeated runs agree bit-for-bit."""
    qs = _queries()
    rows = qs["q_zipf_slope"](spark, SF).collect()
    assert rows
    assert all(r.slope_fp < 0 for r in rows)
    again = {(r.source, r.slope_fp) for r in qs["q_zipf_slope"](spark, SF).collect()}
    assert again == {(r.source, r.slope_fp) for r in rows}


def test_pmi_identity_on_uniform_bigrams(spark):
    """Hand-built corpus where 'a b' is the only bigram: PMI reduces to
    ln(N_uni²/(N_bi·c_a·c_b)) with every count known in closed form."""
    import math
    import os
    import tempfile

    from pyspark_excel_datasource_spark.operators.corpus import (
        q_pmi_collocations,
    )

    # 6 docs of "a b" → c_ab = 6, c_a = c_b = 6, N_uni = 12, N_bi = 6
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, "a b", "en", "s", 3) for i in range(6)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = q_pmi_collocations(spark, td).collect()
    assert len(rows) == 1
    expected = math.floor(math.log((6 * 12 * 12) / (6 * 6 * 6)) * 1_000_000 + 0.5)
    assert rows[0].pmi_fp == expected


def test_new_ops_plans_stay_jvm_side(spark):
    """No Python eval stages in any of the four new operators."""
    import contextlib
    import io

    qs = _queries()
    for name in (
        "q_dedup_containment",
        "q_zipf_slope",
        "q_pmi_collocations",
        "q_graph_pagerank",
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, SF).explain("formatted")
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_parquet_bloom_sink_pushdown_and_footer(spark):
    """The bloom-layout readback must push the IN probe into the scan,
    and the written footer must actually carry bloom filters on user_id
    (pyarrow exposes the offset when present)."""
    import contextlib
    import glob
    import io
    import os

    import pyarrow.parquet as pq

    qs = _queries()
    df = qs["q_sink_parquet_bloom"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "In(user_id" in plan, plan

    from pyspark_excel_datasource_spark.sources.excel_queries import _fixture_dir

    files = glob.glob(
        os.path.join(_fixture_dir(SF), "events_bloom_by_user", "*.parquet")
    )
    assert files
    # On the tiny fixture the user_id chunk is fully dictionary-encoded,
    # and parquet-mr (correctly) skips the bloom there — the dictionary
    # already filters point probes exactly. Prove the option takes effect
    # where it matters (high-NDV chunks that fall out of dictionary
    # encoding) by size delta on a 200k-distinct-key frame written with
    # the exact same writer options the query uses.
    import tempfile

    def size(path):
        return sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
        )

    hi = spark.range(0, 200_000).selectExpr("id AS user_id", "id % 7 AS v")
    with tempfile.TemporaryDirectory() as td:
        a, b = os.path.join(td, "plain"), os.path.join(td, "bloom")
        hi.write.parquet(a)
        (
            hi.write.option("parquet.bloom.filter.enabled#user_id", "true")
            .option("parquet.bloom.filter.expected.ndv#user_id", "100000")
            .parquet(b)
        )
        assert size(b) > size(a) + 50_000, (size(b), size(a))
