"""q_dedup_substring span semantics on a constructed corpus."""

from __future__ import annotations

from pyspark_excel_datasource_spark.operators.dedup import (
    _SUBSTR_K,
    substring_spans,
)


def _spans(spark, docs):
    """Run the registered operator's plan over an in-memory corpus."""
    d = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.n_spans, r.dup_tokens, r.total_tokens)
        for r in substring_spans(d).collect()
    }


def _w(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_block_marks_maximal_span(spark):
    k = _SUBSTR_K
    block = _w(k + 4, "dup")  # 12 shared tokens → one span of 12 in each doc
    docs = [
        (1, f"{_w(5, 'a')} {block} {_w(5, 'b')}"),
        (2, f"{_w(7, 'c')} {block}"),
    ]
    got = _spans(spark, docs)
    assert got[1] == (1, k + 4, 5 + (k + 4) + 5)
    assert got[2] == (1, k + 4, 7 + (k + 4))


def test_two_separated_blocks_are_two_spans(spark):
    k = _SUBSTR_K
    b1, b2 = _w(k, "x"), _w(k, "y")
    gap = _w(k + 5, "g")  # unique gap longer than k → spans don't merge
    docs = [
        (1, f"{b1} {gap} {b2}"),
        (2, f"{b1} {_w(k + 9, 'h')} {b2}"),
    ]
    got = _spans(spark, docs)
    assert got[1][0] == 2 and got[1][1] == 2 * k
    assert got[2][0] == 2 and got[2][1] == 2 * k


def test_within_doc_repeat_is_not_cross_doc_duplicate(spark):
    k = _SUBSTR_K
    block = _w(k, "r")
    docs = [
        (1, f"{block} {_w(k + 5, 'u')} {block}"),  # repeats only within doc 1
        (2, _w(3 * k, "z")),
    ]
    assert _spans(spark, docs) == {}


def test_registered_query_matches_oracle_shape(spark):
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    df = load_all_queries()["q_dedup_substring"](spark, "/root/testdata/sf0.001")
    assert df.columns == ["doc_id", "n_spans", "dup_tokens", "total_tokens"]
    rows = df.collect()
    assert rows, "synthetic corpus is known to contain cross-doc duplication"
    assert all(r.dup_tokens <= r.total_tokens for r in rows)
    assert all(r.n_spans >= 1 for r in rows)
