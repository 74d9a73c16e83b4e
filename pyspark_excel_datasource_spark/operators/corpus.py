"""Corpus-preparation operators for LLM training data (SURVEY.md §2.4).

Four operators a training-data pipeline needs beyond filtering and
dedup — repetition-based quality gates, chunking, tokenizer statistics,
and deterministic shard shuffling:

- ``q_text_repetition``: Gopher-style repetition filters (Rae et al.
  2021, "Scaling Language Models", §A1.1): fraction of bigrams that are
  duplicates and fraction claimed by the single most frequent bigram.
  Boilerplate and template spam score high on both; the thresholds here
  mirror the paper's shape (not its exact constants, which are
  tokenizer-specific).
- ``q_chunk_tokens``: overlapping token-window chunking (window 32,
  stride 24) — the document→training-sample explosion step. Expressed
  as ``posexplode`` over a start-index sequence + ``slice``, so chunk
  construction is a codegen'd array op, not Python.
- ``q_bpe_pair_counts``: corpus-wide adjacent character-pair frequencies
  — the inner statistic of one BPE-training merge round. The classic
  two-level explode (doc → word → symbol pair) with map-side combine;
  at 100 TB this is the canonical wordcount shuffle shape on 2-char
  keys, which cannot skew badly (≤ alphabet² distinct keys).
- ``q_shuffle_shard``: deterministic global shuffle into N training
  shards. Shard = first md5 nibble of the doc id (content-addressed,
  engine-independent, stable under corpus growth — same rationale as
  ``pipeline.q_split_assign``); within-shard order = remaining md5
  bytes, i.e. a reproducible pseudo-random permutation with NO global
  sort. At 100 TB the writer form is
  ``df.repartition(N, "shard").sortWithinPartitions("sort_key")`` —
  one shuffle, zero RNG state, byte-identical shards on every rerun.

Determinism: every ratio is a single IEEE division of exact integers;
ranks are integer; md5 is md5 in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import spread, table
from ..plans.registry import query

#: repetition-filter thresholds (Gopher-shaped; corpus-calibrated)
_TOP_BIGRAM_MAX = 0.18
_DUP_BIGRAM_MAX = 0.60

#: chunking geometry: 32-token windows every 24 tokens (8-token overlap)
_CHUNK_W = 32
_CHUNK_S = 24

_HEX = "0123456789abcdef"


@query(
    "q_text_repetition",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, UNNEST([w[i] || ' ' || w[i+1]
                               for i in RANGE(1, LEN(w))]) AS g
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    ),
    counts AS (
        SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_count,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
               AS dup_bigram_frac,
           (CAST(MAX(c) AS DOUBLE) / SUM(c) <= {_TOP_BIGRAM_MAX}
            AND CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                / SUM(c) <= {_DUP_BIGRAM_MAX}) AS keep
    FROM counts GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: per-document duplicate-bigram
    fraction and most-frequent-bigram fraction, with a keep flag.

    Two aggregations, both keyed (doc_id, gram) then doc_id — partial
    aggregation absorbs the repetition itself (a doc of one repeated
    bigram combines map-side to a single row). No Python, no windows.
    """
    d = spread(table(spark, sf_dir, "documents"))
    w = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(w) >= 2,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> concat(element_at(split(text, ' '), i), ' ',"
            "            element_at(split(text, ' '), i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    top = F.max("c").cast("double")
    total = F.sum("c")
    dup = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.max("c").cast("long").alias("top_bigram_count"),
        (top / total).alias("top_bigram_frac"),
        (dup / total).alias("dup_bigram_frac"),
        (
            ((top / total) <= F.lit(_TOP_BIGRAM_MAX))
            & ((dup / total) <= F.lit(_DUP_BIGRAM_MAX))
        ).alias("keep"),
    )


@query(
    "q_chunk_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(k AS INT) AS chunk_id,
           CAST(LEN(w[k * {_CHUNK_S} + 1 : k * {_CHUNK_S} + {_CHUNK_W}])
                AS INT) AS n_chunk_tokens,
           ARRAY_TO_STRING(
               w[k * {_CHUNK_S} + 1 : k * {_CHUNK_S} + {_CHUNK_W}], ' ')
               AS chunk_text
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    CROSS JOIN UNNEST(RANGE(0, (LEN(w) - 1) // {_CHUNK_S} + 1)) AS t(k)
    """,
)
def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: 32-token windows at stride 24.

    Start offsets come from a ``sequence`` the optimizer folds per row;
    ``slice`` clamps the final partial window. One narrow explode — no
    shuffle at all; at 100 TB each task chunks its own split and the
    output feeds the shard writer directly.
    """
    d = spread(table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.split(F.col("text"), " ").alias("w"),
        )
        .select(
            "doc_id",
            F.posexplode(
                F.expr(f"sequence(0, CAST((size(w) - 1) / {_CHUNK_S} AS INT))")
            ).alias("chunk_id", "k"),
            "w",
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.expr(
                f"size(slice(w, k * {_CHUNK_S} + 1, {_CHUNK_W}))"
            ).cast("int").alias("n_chunk_tokens"),
            F.expr(
                f"array_join(slice(w, k * {_CHUNK_S} + 1, {_CHUNK_W}), ' ')"
            ).alias("chunk_text"),
        )
    )


@query(
    "q_bpe_pair_counts",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
    ),
    pairs AS (
        SELECT UNNEST([SUBSTR(word, i, 2) for i in RANGE(1, LENGTH(word))])
            AS pair
        FROM toks
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs across the corpus — the counting
    step of one BPE-training merge round.

    Double explode (words, then 2-char windows) feeding one group-by;
    the pair-key domain is ≤ |alphabet|², so partial aggregation reduces
    each task's output to a few hundred rows regardless of input size,
    and the final top-20 is a ``TakeOrderedAndProject``. Ties break on
    the pair string for a deterministic LIMIT.
    """
    d = spread(table(spark, sf_dir, "documents"))
    words = d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    pair_arr = F.when(
        F.length("word") >= 2,
        F.expr(
            "transform(sequence(1, length(word) - 1),"
            " i -> substring(word, i, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@query(
    "q_shuffle_shard",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               MD5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(STRPOS('{_HEX}', SUBSTR(h, 1, 1)) - 1 AS INT) AS shard,
           SUBSTR(h, 2) AS sort_key,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY SUBSTR(h, 1, 1)
               ORDER BY SUBSTR(h, 2), doc_id) AS BIGINT) AS shard_pos
    FROM keyed
    """,
)
def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 16 training shards.

    Shard = first md5 nibble of the doc id; within-shard order = the
    remaining md5 hex (a reproducible pseudo-random permutation). No
    RNG, no seed state, no global sort: the production writer form is
    ``repartition(16, "shard").sortWithinPartitions("sort_key")`` — one
    shuffle whose reducer count IS the shard count. Reruns and engine
    swaps produce byte-identical shard contents, which is what makes
    training-data audits possible.
    """
    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    win = W.partitionBy(F.substring("h", 1, 1)).orderBy(
        F.col("sort_key"), F.col("doc_id")
    )
    return (
        keyed.select(
            "doc_id",
            (F.expr(f"locate(substring(h, 1, 1), '{_HEX}')") - 1)
            .cast("int")
            .alias("shard"),
            F.expr("substring(h, 2)").alias("sort_key"),
            F.col("h"),
        )
        .withColumn("shard_pos", F.row_number().over(win).cast("long"))
        .drop("h")
    )


#: Context-packing geometry: tokens per packed training sequence, and the
#: shard fan-out the pack order is computed within.
_PACK_CAPACITY = 512
_PACK_SHARDS = 16


@query(
    "q_pack_context",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
               MD5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    placed AS (
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN SUBSTR(h, 1, 1) BETWEEN '0' AND '9'
                         THEN ASCII(SUBSTR(h, 1, 1)) - 48
                         ELSE ASCII(SUBSTR(h, 1, 1)) - 87 END AS INT)
                   AS shard,
               SUM(n_tokens) OVER (
                   PARTITION BY SUBSTR(h, 1, 1) ORDER BY SUBSTR(h, 2), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS tokens_before
        FROM sized
    )
    SELECT doc_id, shard, n_tokens,
           CAST(COALESCE(tokens_before, 0) // {_PACK_CAPACITY} AS BIGINT)
               AS bin_id,
           CAST(COALESCE(tokens_before, 0) % {_PACK_CAPACITY} AS BIGINT)
               AS bin_offset,
           (COALESCE(tokens_before, 0) // {_PACK_CAPACITY} <
            (COALESCE(tokens_before, 0) + n_tokens - 1) // {_PACK_CAPACITY})
               AS crosses_boundary
    FROM placed
    """,
)
def q_pack_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split context packing: documents are laid end-to-end in
    a deterministic content-addressed order and cut into fixed
    ``_PACK_CAPACITY``-token training sequences; each document learns its
    (shard, bin, offset) placement and whether it straddles a sequence
    boundary.

    The pretraining data-layout step after chunking/shuffling: GPT-style
    pipelines concatenate documents and split at context boundaries
    rather than padding per document. The placement is ONE running-sum
    window per md5-shard (the same partitioning the shard writer uses —
    at 100 TB each shard packs independently; no global coordination,
    no RNG, reproducible across engines and corpus versions).
    """
    d = spread(table(spark, sf_dir, "documents"))
    sized = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    shard = F.conv(F.substring("h", 1, 1), 16, 10).cast("int")
    w = (
        W.partitionBy(F.substring("h", 1, 1))
        .orderBy(F.substring(F.col("h"), 2, 32), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = sized.select(
        "doc_id",
        shard.alias("shard"),
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tokens_before"),
    )
    # integer DIV, not float division: token offsets at 100 TB overflow
    # the 2^53 double mantissa long before they overflow a BIGINT
    return placed.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"tokens_before DIV {_PACK_CAPACITY}").alias("bin_id"),
        (F.col("tokens_before") % _PACK_CAPACITY).cast("long").alias("bin_offset"),
        F.expr(
            f"tokens_before DIV {_PACK_CAPACITY} <"
            f" (tokens_before + n_tokens - 1) DIV {_PACK_CAPACITY}"
        ).alias("crosses_boundary"),
    )


_VOCAB_K = 1000  # vocabulary size (top tokens by corpus frequency)


@query(
    "q_vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
        FROM documents
    ),
    vocab AS (
        SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
        QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) <= {_VOCAB_K}
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + per-document OOV-rate scoring in one plan —
    the tokenizer-fit health check run before committing a vocab to a
    training corpus.

    Scale shape: token counting is the canonical wordcount (map-side
    partials, one shuffle on token). The top-K is an
    ``orderBy().limit()`` → TakeOrderedAndProject: every partition keeps
    its local top-{_VOCAB_K} and only those tiny heads reach the driver
    — never a single-task window over the full distinct-token table
    (at 100 TB that table is billions of rows); the resulting
    {_VOCAB_K}-row vocab BROADCASTS to the scoring join, so per-token
    scoring never shuffles the exploded corpus a second time (the
    doc_id re-agg reuses one shuffle). Ordering ties break on the token
    string → fully deterministic vocab. oov_rate is one IEEE division
    of exact integers → bit-equal cross-engine, no rounding convention.
    """
    return vocab_coverage(table(spark, sf_dir, "documents"))


def vocab_coverage(d: DataFrame) -> DataFrame:
    """Vocab-build + OOV scoring plan over a documents frame (see
    ``q_vocab_coverage``); reused by ``tools/scale_stress.py``."""
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # top-K via orderBy().limit() → TakeOrderedAndProject (parallel
    # per-partition partial top-K), NOT row_number over an unpartitioned
    # window — that would funnel the whole distinct-token table through
    # one task. Same rows: the (c DESC, tok ASC) total order is
    # tie-free, so "first K of the total order" ≡ "rank <= K".
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_VOCAB_K)
        .select("tok")
    )
    scored = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left"
    )
    n_oov = F.sum(
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    ).cast("long")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        n_oov.alias("n_oov"),
        (n_oov.cast("double") / F.count("*")).alias("oov_rate"),
    )


@query(
    "q_corpus_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card: per-(lang, source) document counts, token and
    char totals, and length extremes — the summary every corpus release
    ships with (and the input to `q_mix_budget`'s domain weighting).

    One shuffle on a tiny (lang, source) key domain with map-side
    partials absorbing the volume; token counting is `size(split(...))`
    inside the scan stage, so text never moves — only the |langs|×
    |sources| aggregate rows do. All sums are exact integers; mean is
    the one IEEE division of exact operands (davg argument).
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias(
            "total_tokens"
        ),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


#: fixed-point scale for order-independent sums of log-term series
#: (KL/entropy). 1e6 keeps a last-ulp libm difference in ln/log2 (~1e-16
#: relative) ~10 orders of magnitude away from a rounding boundary while
#: giving 6 exact decimals on the final statistic.
_LOG_FP = 1_000_000


@query(
    "q_drift_kl",
    oracle=f"""
    WITH toks AS (
        SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
        FROM documents
    ),
    st AS (SELECT source, tok, COUNT(*) AS n_st FROM toks GROUP BY 1, 2),
    s  AS (SELECT source, SUM(n_st) AS n_s FROM st GROUP BY 1),
    t  AS (SELECT tok, SUM(n_st) AS n_t FROM st GROUP BY 1),
    tot AS (SELECT SUM(n_st) AS n FROM st),
    terms AS (
        SELECT st.source,
               CAST(FLOOR((CAST(st.n_st AS DOUBLE) / s.n_s)
                    * LN((CAST(st.n_st AS DOUBLE) / s.n_s)
                         / (CAST(t.n_t AS DOUBLE) / tot.n))
                    * {_LOG_FP} + 0.5) AS BIGINT) AS term_fp
        FROM st JOIN s USING (source) JOIN t USING (tok) CROSS JOIN tot
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(term_fp) AS BIGINT) AS kl_fp
    FROM terms GROUP BY source
    """,
)
def q_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection: KL(source ‖ corpus) over the token
    distribution of each source vs the corpus-wide distribution — the
    statistic a data pipeline monitors to catch a crawler/source whose
    content suddenly shifts (KL spikes) before it pollutes a training
    mix. Every source token appears in the corpus by construction, so
    q > 0 always and no smoothing is needed.

    Scale/determinism shape: ONE token explode feeds a (source, tok)
    count; source totals, token totals, and the corpus total all derive
    from that count frame (no rescan). The per-term doubles are
    quantized to fixed-point BIGINT *before* the per-source sum, making
    the reduction order-independent (float sums are not associative;
    integer sums are) and engine-identical — ``kl_fp`` IS the statistic,
    scaled by 1e6. The joins key on tok (shuffle; vocab-sized) and
    source (tiny, broadcast).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("n_st"))
    s = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    t = st.groupBy("tok").agg(F.sum("n_st").alias("n_t"))
    tot = st.agg(F.sum("n_st").alias("n"))
    p = F.col("n_st").cast("double") / F.col("n_s")
    q = F.col("n_t").cast("double") / F.col("n")
    term_fp = F.floor(p * F.log(p / q) * _LOG_FP + F.lit(0.5)).cast("long")
    return (
        st.join(F.broadcast(s), "source")
        .join(t, "tok")
        .crossJoin(F.broadcast(tot))
        .select("source", term_fp.alias("term_fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("term_fp").cast("long").alias("kl_fp"),
        )
    )


@query(
    "q_entropy_ngrams",
    oracle=f"""
    WITH grams AS (
        SELECT source, SUBSTR(text, g.i, 2) AS gram
        FROM documents,
             UNNEST(GENERATE_SERIES(1, LENGTH(text) - 1)) AS g(i)
        WHERE LENGTH(text) >= 2
    ),
    sg AS (SELECT source, gram, COUNT(*) AS n_sg FROM grams GROUP BY 1, 2),
    s  AS (SELECT source, SUM(n_sg) AS n_s FROM sg GROUP BY 1)
    SELECT source,
           COUNT(*) AS n_grams,
           CAST(SUM(CAST(FLOOR(
               -(CAST(n_sg AS DOUBLE) / n_s)
               * LOG2(CAST(n_sg AS DOUBLE) / n_s)
               * {_LOG_FP} + 0.5) AS BIGINT)) AS BIGINT) AS entropy_fp
    FROM sg JOIN s USING (source)
    GROUP BY source
    """,
)
def q_entropy_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy per source (bits, fixed-point
    1e6): the text-quality signal that separates natural prose
    (entropy ≈ 7–10 bits over bigrams) from boilerplate, base64 blobs
    and key-mash spam — low-cost, tokenizer-free, language-agnostic.

    The bigram explode is a codegen'd ``transform(sequence(...))`` (no
    Python); the distribution aggregates on (source, gram) — key space
    ≤ sources × alphabet², skew-proof; per-term quantization to BIGINT
    before the sum makes the entropy reduction order-independent and
    engine-identical (same convention as ``q_drift_kl``).
    """
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    # substring with a per-element start index needs the expr form
    grams = d.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("gram"),
    )
    sg = grams.groupBy("source", "gram").agg(F.count("*").alias("n_sg"))
    s = sg.groupBy("source").agg(F.sum("n_sg").alias("n_s"))
    p = F.col("n_sg").cast("double") / F.col("n_s")
    term_fp = F.floor(-p * F.log2(p) * _LOG_FP + F.lit(0.5)).cast("long")
    return (
        sg.join(F.broadcast(s), "source")
        .select("source", term_fp.alias("term_fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("term_fp").cast("long").alias("entropy_fp"),
        )
    )


#: co-occurrence vocabulary size (top tokens by document frequency) and
#: result size — both fixed, so the pair stage is bounded at any scale.
_COOC_VOCAB = 100
_COOC_TOP = 30
_COOC_MIN_LEN = 4


@query(
    "q_topic_cooccur",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
            FROM documents
        ) WHERE LENGTH(tok) >= {_COOC_MIN_LEN}
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok
            ORDER BY df DESC, tok ASC LIMIT {_COOC_VOCAB}
        )
    ),
    vt AS (SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM vocab))
    SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS n_docs
    FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY 1, 2
    ORDER BY n_docs DESC, tok_a ASC, tok_b ASC
    LIMIT {_COOC_TOP}
    """,
)
def q_topic_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence mining: the {_COOC_TOP} most frequent
    within-document pairs over a bounded vocabulary — the raw statistic
    under topic models, PMI collocation scoring, and taxonomy seeding.

    Scale design: the quadratic step (pairs within a doc) is bounded
    BEFORE it happens — tokens are first semi-joined to a fixed top-K
    document-frequency vocabulary (K={_COOC_VOCAB}, deterministic
    df-then-token tiebreak, broadcast to every executor), so each doc
    contributes at most C(K,2) pairs regardless of its length, and the
    pair aggregation keys on a ≤K² space (map-side combined, skew-proof).
    The doc-frequency pass and the pair pass are the only two shuffles.
    """
    return topic_cooccur(table(spark, sf_dir, "documents"))


def topic_cooccur(d: DataFrame) -> DataFrame:
    """Bounded-vocab co-occurrence plan over a documents frame (see
    ``q_topic_cooccur``); reused by ``tools/scale_stress.py``."""
    toks = (
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .filter(F.length("tok") >= _COOC_MIN_LEN)
        .distinct()
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(_COOC_VOCAB)
        .select("tok")
    )
    vt = toks.join(F.broadcast(vocab), "tok", "left_semi")
    a = vt.alias("a")
    b = vt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy(
            F.col("n_docs").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
        )
        .limit(_COOC_TOP)
    )


# ---------------------------------------------------------------------------
# BPE merge application (the encode side of q_bpe_pair_counts' train side)
# ---------------------------------------------------------------------------

#: Learned merge list in priority order (the data ``q_bpe_pair_counts``
#: produces). Applying BPE = replaying these string rewrites in order on
#: the space-separated symbol sequence of each word; 12 merges is enough
#: to exercise chained merges ("t h"→"th" feeding "th e"→"the").
_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t h", "th"),
    ("th e", "the"),
    ("e r", "er"),
    ("i n", "in"),
    ("a t", "at"),
    ("o r", "or"),
    ("a n", "an"),
    ("s t", "st"),
    ("a r", "ar"),
    ("r o", "ro"),
    ("l e", "le"),
    ("c h", "ch"),
)


def _bpe_chain(spaced: str) -> str:
    """Wrap a spaced-symbol SQL expression in the merge rewrites, in
    priority order (same spelling in Spark SQL and DuckDB)."""
    expr = spaced
    for pair, merged in _BPE_MERGES:
        expr = f"REPLACE({expr}, '{pair}', '{merged}')"
    return expr


#: spaced-symbol spelling per engine: every char followed by one space,
#: trailing space trimmed. Spark regexp_replace is global by default and
#: uses $1; DuckDB needs the 'g' flag and \1.
_SPARK_TOKENS = _bpe_chain("TRIM(REGEXP_REPLACE(w, '(.)', '$1 '))")
_DUCK_TOKENS = _bpe_chain("TRIM(REGEXP_REPLACE(w, '(.)', '\\1 ', 'g'))")


@query(
    "q_bpe_encode",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words,
           CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                w -> LEN(STRING_SPLIT({_DUCK_TOKENS}, ' '))))
                AS BIGINT) AS n_tokens,
           CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                w -> LEN(STRING_SPLIT({_DUCK_TOKENS}, ' '))))
                AS DOUBLE)
               / LEN(STRING_SPLIT(text, ' ')) AS fertility
    FROM documents
    """,
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a learned BPE merge table and report per-document token
    counts + fertility (tokens per word) — the encode half of the BPE
    story (``q_bpe_pair_counts`` is the train half).

    The merge table is replayed as a chain of constant string rewrites
    over each word's spaced-symbol form — Catalyst folds the chain into
    one codegen'd projection, so this is a map-only stage with NO
    shuffle and no Python: at 100 TB it runs at scan bandwidth next to
    the shard writer. (A production tokenizer with a 50k-merge table
    moves the table into a broadcast ``aggregate()`` fold or an Arrow
    ``mapInPandas`` stage; the 12-merge constant chain keeps the whole
    computation — and the oracle — inside both engines' SQL dialects.)
    Fertility is one IEEE division of two exact integers, identical in
    both engines.
    """
    return bpe_encode(spread(table(spark, sf_dir, "documents")))


def bpe_encode(docs: DataFrame) -> DataFrame:
    """BPE-encode plan over a (doc_id, text) frame (shared with
    ``tools/scale_stress.py``)."""
    tok_counts = F.expr(
        f"transform(split(text, ' '), w -> size(split({_SPARK_TOKENS}, ' ')))"
    )
    n_tokens = F.aggregate(
        tok_counts, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_tokens.alias("n_tokens"),
        (n_tokens.cast("double") / n_words).alias("fertility"),
    )


#: OLS fixed-point scale for q_zipf_slope: ln() values are quantized at
#: 1e5 so the second-moment integer sums stay far inside int64 even at
#: web-corpus vocabulary sizes (x_fp ≤ ~3e6, Σx² ≤ 1e7·1e13 ≈ 1e20 needs
#: care — the sums here are per-source vocab ≤ ~1e6 rows, Σx² ≤ 1e19/10).
_OLS_FP = 100_000


@query(
    "q_zipf_slope",
    oracle=f"""
    WITH toks AS (
        SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
        FROM documents
    ),
    cnt AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    ranked AS (
        SELECT source, c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, tok) AS r
        FROM cnt
    ),
    fp AS (
        SELECT source,
               CAST(FLOOR(LN(CAST(r AS DOUBLE)) * {_OLS_FP} + 0.5) AS BIGINT) AS x,
               CAST(FLOOR(LN(CAST(c AS DOUBLE)) * {_OLS_FP} + 0.5) AS BIGINT) AS y
        FROM ranked
    ),
    sums AS (
        SELECT source, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM fp GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_vocab,
           CAST(FLOOR(
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               * 1000000 + 0.5) AS BIGINT) AS slope_fp
    FROM sums
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent per source: OLS slope of ln(freq) on ln(rank).

    The corpus-health diagnostic: natural language sits near slope −1;
    machine-generated or templated spam drifts far off (flat head or
    cliff tail), so a source whose slope leaves [−1.5, −0.7] gets
    flagged before entering a training mix. Determinism: ln() values are
    quantized to fixed-point BIGINT, so all five OLS sums are exact
    integer reductions (order-independent); the single closing division
    runs on identical integers in both engines. The rank window
    partitions by source over its vocabulary — vocab grows ~log(corpus),
    so the window stays bounded at 100 TB (and the heavy lifting, the
    token count, is an ordinary map-side-combine groupBy).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    cnt = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    r = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("c").desc(), F.col("tok"))
    )
    fp = cnt.select(
        "source",
        F.floor(F.log(r.cast("double")) * _OLS_FP + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * _OLS_FP + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    sums = fp.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return sums.select(
        "source",
        F.col("n").cast("long").alias("n_vocab"),
        F.floor(slope * 1000000 + F.lit(0.5)).cast("long").alias("slope_fp"),
    )


@query(
    "q_pmi_collocations",
    oracle=f"""
    WITH words AS (
        SELECT STRING_SPLIT(LOWER(text), ' ') AS w FROM documents
    ),
    bi AS (
        SELECT UNNEST([w[i]     for i in RANGE(1, LEN(w))]) AS w1,
               UNNEST([w[i + 1] for i in RANGE(1, LEN(w))]) AS w2
        FROM words WHERE LEN(w) >= 2
    ),
    uni AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT UNNEST(w) AS tok FROM words) GROUP BY tok
    ),
    bic AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bi GROUP BY 1, 2),
    nb AS (SELECT SUM(c_xy) AS n_bi FROM bic),
    nu AS (SELECT SUM(c) AS n_uni FROM uni)
    SELECT b.w1, b.w2, CAST(b.c_xy AS BIGINT) AS c_xy,
           CAST(FLOOR(LN(
               (CAST(b.c_xy AS DOUBLE) * n_uni * n_uni)
               / (CAST(n_bi AS DOUBLE) * u1.c * u2.c)
           ) * {_LOG_FP} + 0.5) AS BIGINT) AS pmi_fp
    FROM bic b
    JOIN uni u1 ON b.w1 = u1.tok
    JOIN uni u2 ON b.w2 = u2.tok
    CROSS JOIN nb CROSS JOIN nu
    WHERE b.c_xy >= 5
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs (collocations).

    The phrase-mining statistic (Mikolov et al. 2013 word2vec §4 uses
    the same score to merge phrases before training): high-PMI bigrams
    become single vocabulary units; very low PMI across a whole source
    signals word-salad spam. One bigram explode feeds the pair counts;
    unigram totals join back on the two word keys (vocab-sized shuffle);
    the corpus totals are broadcast scalars. ``pmi_fp`` is ln-PMI in
    1e-6 units, engine-exact because the only double math is one
    identical multiply/divide/ln chain per surviving bigram (count ≥ 5),
    quantized before any further use.
    """
    d = table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    words = spread(d).select(w.alias("w"))
    pair = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.struct(
            F.element_at(F.col("w"), i + 1).alias("w1"),
            F.element_at(F.col("w"), i + 2).alias("w2"),
        ),
    )
    bi = (
        words.filter(F.size("w") >= 2)
        .select(F.explode(pair).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    uni = (
        words.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    nb = bic.agg(F.sum("c_xy").alias("n_bi"))
    nu = uni.agg(F.sum("c").alias("n_uni"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c_xy").cast("double") * F.col("n_uni") * F.col("n_uni"))
        / (F.col("n_bi").cast("double") * F.col("c1") * F.col("c2"))
    )
    return (
        bic.filter(F.col("c_xy") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.floor(pmi * _LOG_FP + F.lit(0.5)).cast("long").alias("pmi_fp"),
        )
    )


@query(
    "q_text_ngram_novelty",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in RANGE(1, LEN(w) - 1)]) AS shingles
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
        WHERE LEN(w) >= 3
    ),
    toks AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    first AS (SELECT s, MIN(doc_id) AS first_doc FROM toks GROUP BY s)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_shingles,
           CAST((SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                 * 1000000) // COUNT(*) AS BIGINT) AS novelty_fp
    FROM toks t JOIN first f ON t.s = f.s
    GROUP BY t.doc_id
    """,
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's 3-gram
    shingles first seen (by min doc_id ingestion order) in THAT doc.

    The curriculum/diversity signal a corpus pipeline orders sources by:
    late documents full of already-seen n-grams (novelty → 0) are
    redundant with the mix so far; a novelty cliff across a source marks
    template spam even when no single pair crosses a dedup threshold.
    One shingle explode feeds a first-occurrence aggregation (min over
    doc_id per shingle — map-side combinable) and joins back on the
    shingle key: the same one-shuffle inverted-index shape as the dedup
    family. The score is integer fixed-point (1e-6), engine-exact.
    """
    docs = table(spark, sf_dir, "documents")
    from .dedup import _shingles

    toks = _shingles(docs).select("doc_id", F.explode("shingles").alias("s"))
    first = toks.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        toks.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(novel).cast("long").alias("novel_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "novel_shingles",
            F.expr(
                "CAST((novel_shingles * 1000000) DIV n_shingles AS BIGINT)"
            ).alias("novelty_fp"),
        )
    )
