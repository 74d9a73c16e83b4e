"""Round-5 additions: bloom-join safety, cogroup edge semantics, vocab
determinism, corr-matrix sanity. Cross-engine value parity is the
driver's (and tools/run_parity.py's) job; these pin the properties the
oracle comparison can't see."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _queries():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()


def test_bloom_filter_never_drops_true_matches(spark):
    """The safety property correctness rests on: every dim key passes its
    own bloom probe (no false negatives, by construction — the probe uses
    the same seeded xxhash64 positions as the build)."""
    from pyspark_excel_datasource_spark.operators.scale import (
        _BLOOM_WORDS,
        _bloom_positions,
    )

    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    pos = _bloom_positions(F.col("k"))
    bits = keys.select(F.explode(F.array(*pos)).alias("p")).select(
        F.expr("CAST(p DIV 64 AS LONG)").alias("word_idx"),
        F.expr("SHIFTLEFT(1L, CAST(p % 64 AS INT))").alias("bit"),
    )
    arr = [0] * _BLOOM_WORDS
    for row in bits.groupBy("word_idx").agg(F.bit_or("bit").alias("w")).collect():
        arr[int(row["word_idx"])] = int(row["w"])
    bloom = F.array(*[F.lit(w).cast("long") for w in arr])
    m = _BLOOM_WORDS * 64
    tests = []
    for i in range(2):
        p = f"pmod(xxhash64({i}, k), {m})"
        word = f"ELEMENT_AT(__bloom, CAST(({p}) DIV 64 AS INT) + 1)"
        tests.append(f"(({word}) & SHIFTLEFT(1L, CAST(({p}) % 64 AS INT))) != 0")
    survivors = (
        keys.withColumn("__bloom", bloom).filter(F.expr(" AND ".join(tests)))
    )
    assert survivors.count() == 5000  # zero false negatives


def test_bloom_plan_probes_before_the_join(spark):
    """The probe must sit in the fact scan's Filter (below the semi
    join), not above it — the reordering regression the literal-array
    formulation exists to prevent."""
    df = _queries()["q_join_bloom"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan
    # the bloom literal appears inside a Filter condition on the scan side
    assert "element_at" in plan and "xxhash64" in plan


def test_cogroup_drops_orphan_order_keys(spark):
    """Orders whose custkey has no customer row produce nothing (LEFT
    JOIN semantics from the customer side)."""
    import pandas as pd

    from pyspark_excel_datasource_spark.operators.udf_surface import (  # noqa: F401
        q_udf_cogroup,
    )
    from pyspark_excel_datasource_spark.catalog import table

    out = _queries()["q_udf_cogroup"](spark, SF)
    custkeys = {
        r["c_custkey"]
        for r in table(spark, SF, "customer").select("c_custkey").collect()
    }
    got = {r["custkey"] for r in out.collect()}
    assert got == custkeys  # exactly one row per customer, no orphans


def test_vocab_rank_breaks_ties_on_token(spark):
    """Equal-count tokens must rank by token string, so the top-K vocab
    is a deterministic set (the property that makes oov_rate stable
    across runs/engines)."""
    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.operators.corpus import _VOCAB_K

    d1 = _queries()["q_vocab_coverage"](spark, SF).orderBy("doc_id").collect()
    d2 = _queries()["q_vocab_coverage"](spark, SF).orderBy("doc_id").collect()
    assert d1 == d2
    assert all(0.0 <= r["oov_rate"] <= 1.0 for r in d1)
    n_distinct = (
        table(spark, SF, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .distinct()
        .count()
    )
    if n_distinct > _VOCAB_K:
        assert any(r["n_oov"] > 0 for r in d1)
    else:  # tiny-sf corpus fits inside the vocab entirely
        assert all(r["n_oov"] == 0 for r in d1)


def test_corr_matrix_bounds(spark):
    """Pearson r in [-1, 1] for every pair and group (canon string)."""
    rows = _queries()["q_corr_matrix"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        for c in ("corr_qty_price", "corr_qty_disc", "corr_price_disc"):
            assert abs(float(r[c])) <= 1.0
