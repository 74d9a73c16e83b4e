"""Semantic + plan tests for the corpus-prep operators
(operators/corpus.py). Cross-engine value parity is covered by the
oracle gate; these pin the invariants the oracle can't see — chunk
reconstruction, shard determinism/uniformity, repetition math on a
crafted document, and plan shape."""

from __future__ import annotations

import contextlib
import hashlib
import io
from collections import Counter

from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.plans.registry import load_all_queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_chunks_reconstruct_documents(spark):
    """Dropping each chunk's 8-token overlap head (except chunk 0) and
    concatenating in chunk order must reproduce every document."""
    qs = load_all_queries()
    chunks = qs["q_chunk_tokens"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        assert 1 <= r.n_chunk_tokens <= 32
        assert r.n_chunk_tokens == len(r.chunk_text.split(" "))
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        toks: list[str] = []
        for r in rows:
            ct = r.chunk_text.split(" ")
            toks.extend(ct if r.chunk_id == 0 else ct[32 - 24 :])
        assert " ".join(toks) == docs[doc_id], doc_id


def test_repetition_math_matches_replay(spark):
    qs = load_all_queries()
    rows = qs["q_text_repetition"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        w = docs[r.doc_id].split(" ")
        counts = Counter(
            f"{a} {b}" for a, b in zip(w, w[1:])
        )
        assert r.n_bigrams == sum(counts.values())
        assert r.top_bigram_count == max(counts.values())
        dup = sum(c for c in counts.values() if c > 1)
        assert abs(r.dup_bigram_frac - dup / sum(counts.values())) < 1e-12
        assert r.keep == (
            r.top_bigram_frac <= 0.18 and r.dup_bigram_frac <= 0.60
        )


def test_bpe_pairs_match_replay(spark):
    qs = load_all_queries()
    rows = qs["q_bpe_pair_counts"](spark, SF).collect()
    counts: Counter = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        for word in r.text.split(" "):
            for i in range(len(word) - 1):
                counts[word[i : i + 2]] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.pair, r.cnt) for r in rows] == expect


def test_shuffle_shard_deterministic_and_uniform(spark):
    qs = load_all_queries()
    rows = qs["q_shuffle_shard"](spark, SF).collect()
    # exact replay: shard + order derive from md5 alone
    for r in rows:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        assert r.shard == int(h[0], 16)
        assert r.sort_key == h[1:]
    per_shard: dict[int, list] = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r)
    assert set(per_shard) == set(range(16))
    sizes = [len(v) for v in per_shard.values()]
    # 500 docs over 16 shards: no shard empty or >3x the mean
    assert min(sizes) > 0 and max(sizes) < 3 * (len(rows) / 16)
    for shard_rows in per_shard.values():
        shard_rows.sort(key=lambda r: (r.sort_key, r.doc_id))
        assert [r.shard_pos for r in shard_rows] == list(
            range(1, len(shard_rows) + 1)
        )
    # rerun is byte-identical (no RNG anywhere)
    again = qs["q_shuffle_shard"](spark, SF).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_corpus_plans_stay_jvm_side(spark):
    """No BatchEvalPython (row-Python) anywhere; chunking is shuffle-free."""
    qs = load_all_queries()
    for name in (
        "q_text_repetition",
        "q_chunk_tokens",
        "q_bpe_pair_counts",
        "q_shuffle_shard",
    ):
        plan = _plan(qs[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
    chunk_plan = _plan(qs["q_chunk_tokens"](spark, SF))
    # spread() may repartition the tiny fixture; beyond that the chunker
    # must not introduce an aggregation or join shuffle
    assert "SortMergeJoin" not in chunk_plan
    assert "HashAggregate" not in chunk_plan


def test_pack_context_invariants(spark):
    """Packing must tile each shard exactly: offsets stay inside the
    capacity, placements are contiguous (each doc starts where the
    previous one ended), and boundary flags match the arithmetic."""
    from pyspark_excel_datasource_spark.operators.corpus import _PACK_CAPACITY

    rows = load_all_queries()["q_pack_context"](spark, SF).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert 0 <= r.bin_offset < _PACK_CAPACITY
        assert r.crosses_boundary == (
            r.bin_id < (r.bin_id * _PACK_CAPACITY + r.bin_offset + r.n_tokens - 1) // _PACK_CAPACITY
        )
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 16
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r.bin_id, r.bin_offset))
        pos = 0
        for r in shard_rows:
            assert r.bin_id * _PACK_CAPACITY + r.bin_offset == pos
            pos += r.n_tokens
