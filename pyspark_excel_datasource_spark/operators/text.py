"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.4).

Language ID, quality scoring, token counting, TF-IDF and content
fingerprinting over the ``documents`` table — all pure built-in column
expressions (codegen'd, no Python), each with an exact DuckDB oracle.

Determinism: counting/ratio features are integer-derived (exact in both
engines); ``ln`` goes through libm → rounded via dround.

100 TB notes: everything here is embarrassingly parallel per document
except TF-IDF's document-frequency join, which broadcasts the term→df
side when small and otherwise shuffles on term — the canonical inverted-
index shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import local_df, spread, table
from ..functions.determinism import canon, dround, sql_dround
from ..plans.registry import query

#: tiny stopword list used by the quality heuristic (kept identical in the
#: SQL oracle strings below).
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_SQL_STOPWORDS = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

#: marker-token sets for the n-gram/keyword language-ID heuristic. The
#: corpus is synthetic (fixture words), so the heuristic discriminates on
#: corpus-realistic markers rather than real orthography.
_LANG_MARKERS = {
    "query_heavy": ("query", "filter", "join", "group"),
    "stream_heavy": ("stream", "batch", "window", "event"),
    "table_heavy": ("table", "row", "column", "scan"),
}


@query(
    "q_text_stats",
    oracle="""
    SELECT doc_id, lang, source,
           CAST(LENGTH(text) AS INT) AS text_chars,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_distinct,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
               / LEN(STRING_SPLIT(text, ' ')) AS ttr,
           CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) + 1 AS INT)
               AS ws_tokens
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics (chars, tokens, type-token ratio)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("int").alias("text_chars"),
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + F.lit(1)
        ).cast("int").alias("ws_tokens"),
    )


@query(
    "q_text_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, STRING_SPLIT(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({_SQL_STOPWORDS}, x)))
                AS INT) AS n_stopwords,
           CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({_SQL_STOPWORDS}, x)))
                AS DOUBLE) / LEN(toks) AS stopword_ratio,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[aeiou]')) AS INT) AS n_vowels,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]')) AS INT) AS n_digits,
           CAST(LEN(text) AS DOUBLE) / LEN(toks) AS avg_token_span,
           (CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({_SQL_STOPWORDS}, x)))
                 AS DOUBLE) / LEN(toks)) * 0.5
               + (CASE WHEN LEN(toks) BETWEEN 20 AND 500 THEN 0.5 ELSE 0.0 END)
               AS quality_score
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: stopword ratio, vowel/digit counts, length
    score — the standard cheap filters before expensive pipeline stages."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = n_stop.cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        n_stop.cast("int").alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        F.regexp_count("text", F.lit("[aeiou]")).cast("int").alias("n_vowels"),
        F.regexp_count("text", F.lit("[0-9]")).cast("int").alias("n_digits"),
        (F.length("text").cast("double") / F.size(toks)).alias("avg_token_span"),
        (
            stop_ratio * 0.5
            + F.when(F.size(toks).between(20, 500), 0.5).otherwise(0.0)
        ).alias("quality_score"),
    )


_SQL_QUALITY_SCORE = (
    f"(CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({_SQL_STOPWORDS}, x)))"
    " AS DOUBLE) / LEN(toks)) * 0.5"
    " + (CASE WHEN LEN(toks) BETWEEN 20 AND 500 THEN 0.5 ELSE 0.0 END)"
)


@query(
    "q_quality_tiers",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               {_SQL_QUALITY_SCORE} AS score
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
    ),
    b AS (
        SELECT QUANTILE_CONT(score, 0.25) AS q1,
               QUANTILE_CONT(score, 0.50) AS q2,
               QUANTILE_CONT(score, 0.75) AS q3
        FROM scored
    )
    SELECT doc_id, score,
           CAST(CAST(score > q1 AS INT) + CAST(score > q2 AS INT)
                + CAST(score > q3 AS INT) AS INT) AS tier
    FROM scored, b
    """,
)
def q_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-tier bucketing WITHOUT a global sort: exact quartile
    boundaries from one tiny aggregate (3 doubles), broadcast back onto
    the scan, tier = strict-greater count against the boundaries.

    The scale-correct spelling of ``ntile(4) OVER (ORDER BY score)`` —
    a global ntile funnels the corpus through ONE partition's sort; this
    plan's only wide stage is the percentile aggregate whose result is 3
    numbers, and assignment is a stateless projection. Both engines
    compute identical interpolated quantiles of identical doubles
    (q_agg_percentile proves the parity), so the strict comparison is
    deterministic cross-engine.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    score = (
        n_stop.cast("double") / F.size(toks) * 0.5
        + F.when(F.size(toks).between(20, 500), 0.5).otherwise(0.0)
    )
    scored = d.select("doc_id", score.alias("score"))
    bounds = scored.agg(
        F.percentile("score", 0.25).alias("q1"),
        F.percentile("score", 0.50).alias("q2"),
        F.percentile("score", 0.75).alias("q3"),
    )
    return (
        scored.join(F.broadcast(bounds))
        .select(
            "doc_id",
            "score",
            (
                (F.col("score") > F.col("q1")).cast("int")
                + (F.col("score") > F.col("q2")).cast("int")
                + (F.col("score") > F.col("q3")).cast("int")
            ).cast("int").alias("tier"),
        )
    )


def _sql_lang_score(markers: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in markers) + "]"
    return f"LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({arr}, x)))"


@query(
    "q_text_langid",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents
    ), scored AS (
        SELECT doc_id, lang,
               {_sql_lang_score(_LANG_MARKERS['query_heavy'])} AS s_query,
               {_sql_lang_score(_LANG_MARKERS['stream_heavy'])} AS s_stream,
               {_sql_lang_score(_LANG_MARKERS['table_heavy'])} AS s_table
        FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CAST(s_query AS INT) AS s_query,
           CAST(s_stream AS INT) AS s_stream,
           CAST(s_table AS INT) AS s_table,
           CASE WHEN s_query >= s_stream AND s_query >= s_table THEN 'query_heavy'
                WHEN s_stream >= s_table THEN 'stream_heavy'
                ELSE 'table_heavy' END AS predicted_register
    FROM scored
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-marker language/register ID (the n-gram-heuristic shape:
    score each class by marker hits, argmax with a fixed tie order).

    On real corpora the marker sets would be char n-gram tables per
    language; the argmax plumbing is identical.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scores = {}
    for name, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        scores[name] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    pred = (
        F.when(
            (scores["query_heavy"] >= scores["stream_heavy"])
            & (scores["query_heavy"] >= scores["table_heavy"]),
            "query_heavy",
        )
        .when(scores["stream_heavy"] >= scores["table_heavy"], "stream_heavy")
        .otherwise("table_heavy")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        scores["query_heavy"].cast("int").alias("s_query"),
        scores["stream_heavy"].cast("int").alias("s_stream"),
        scores["table_heavy"].cast("int").alias("s_table"),
        pred.alias("predicted_register"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               MD5(LOWER(REGEXP_REPLACE(TRIM(text), ' +', ' ', 'g'))) AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS n_same
    FROM fp
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of whitespace-normalized lowercase text) +
    duplicate-group size — the exact-dedup key at any scale (the group-by
    shuffles 16-byte keys, not documents)."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(
        F.encode(
            F.lower(F.regexp_replace(F.trim(F.col("text")), " +", " ")), "UTF-8"
        )
    )
    w = W.partitionBy("fingerprint")
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .withColumn("n_same", F.count("*").over(w))
    )


@query(
    "q_text_tfidf",
    oracle=f"""
    WITH N AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    tfc AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               {sql_dround('t.tf * LN(CAST((SELECT n_docs FROM N) AS DOUBLE) / d.df)', 8)}
                   AS tfidf
        FROM tfc t JOIN df d USING (term)
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(tfidf AS VARCHAR) AS tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL TF-IDF, top-3 terms per document.

    Inverted-index shape: explode → per-(doc,term) counts → term df join.
    The df side is |vocab| rows (tiny vs corpus) → broadcast; at 100 TB
    this is the standard two-pass term-weighting plan with no O(n²) step.
    """
    d = table(spark, sf_dir, "documents")
    # n_docs rides the plan as a broadcast 1-row aggregate (r14, guide
    # §5): the old ``d.count()`` ran a SEPARATE synchronous driver job on
    # every plan build (~0.2s per bench sample); as a crossJoin'd column
    # it computes inside the one real job. Same scalar, same IEEE
    # division (double / double), so the rounded tfidf is unchanged.
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    terms = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tfc = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # r14 opt: df(term) = COUNT(DISTINCT doc) = COUNT(*) over the tf
    # table (one row per (doc, term) by construction), so derive it from
    # ``tfc`` instead of a second full token explode+aggregation — the
    # (doc_id, term) exchange is shared between the join side and this
    # subtree (ReusedExchange), leaving ONE corpus-sized explode in the
    # plan where there were two (guide §1.2/§2.4).
    #
    # r15 (VERDICT r14 #2b): the r14 spelling did NOT actually reuse the
    # exchange — column pruning dropped the partial count from the df
    # branch's copy (df only reads the group keys), so the two exchange
    # subtrees canonicalized differently and AQE planned two explodes.
    # The always-true ``tf >= 1`` reference keeps ``tf`` alive in this
    # branch, the subtrees stay byte-identical, and the runtime plan now
    # shows ONE Generate + a ReusedExchange (plans/r15). Semantics are
    # untouched (a group count is ≥ 1 by construction).
    df = (
        tfc.where(F.col("tf") >= 1)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    scored = (
        tfc.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            dround(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 8
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", canon("tfidf").alias("tfidf"))
    )


@query(
    "q_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS ws_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS INT) AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS INT) AS est_llm_tokens
    FROM documents
    """,
)
def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, a BPE-ish regex segmentation
    (letters / digits / other, the pre-tokenizer split most BPE vocabs
    use), and the chars/4 LLM budget estimate."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("int")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("est_llm_tokens"),
    )


_WINNOW_K = 4  # k-gram size (tokens)
_WINNOW_WIN = 5  # winnowing window (k-gram hashes)

#: shared winnowing CTE (doc_id → distinct fingerprints), reused by both
#: winnow oracles so the construction can't drift between them
_WINNOW_SQL_CTE = f"""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               CASE WHEN LEN(w) >= {_WINNOW_K}
                    THEN [MD5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                              || w[i+3])
                          FOR i IN RANGE(1, LEN(w) - {_WINNOW_K - 2})]
                    ELSE [] END AS h
        FROM t
    ),
    m AS (
        SELECT doc_id,
               CASE WHEN LEN(h) >= {_WINNOW_WIN}
                    THEN [LIST_MIN(h[j:j+{_WINNOW_WIN - 1}])
                          FOR j IN RANGE(1, LEN(h) - {_WINNOW_WIN - 2})]
                    WHEN LEN(h) > 0 THEN [LIST_MIN(h)]
                    ELSE [] END AS fps
        FROM g
    ),
    fp AS (SELECT doc_id, UNNEST(LIST_DISTINCT(fps)) AS fingerprint FROM m)
"""


@query(
    "q_text_winnow",
    oracle=_WINNOW_SQL_CTE + "SELECT doc_id, fingerprint FROM fp",
)
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — public rolling-hash fingerprint scheme): hash every token
    4-gram, slide a window of 5 hashes, keep each window's minimum.
    Guarantees any shared run of ≥ w+k-1 tokens yields a shared
    fingerprint, with ~2/(w+1) selection density — the sub-document dedup
    primitive (plagiarism / partial-overlap detection) that md5-style
    whole-document fingerprints can't express.

    Built-ins only: one interpreted transform chain per document, no
    shuffle until the (doc_id, fingerprint) explode; grouping fingerprints
    then finds partial-overlap docs with an equi-join, exactly like the
    minhash band join. Hash = md5 hex (identical text → identical string
    in both engines), compared as strings, so the oracle is exact.
    """
    return winnow_fingerprints(spread(table(spark, sf_dir, "documents")))


def winnow_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) → (doc_id, fingerprint) winnowing rows — the
    reusable operator behind ``q_text_winnow`` (see its docstring for the
    guarantee and density math; ``tests/test_extensions.py`` asserts the
    shared-run guarantee on synthetic documents)."""
    w = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(w) >= _WINNOW_K,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - _WINNOW_K),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    *[F.element_at(w, i + j + 1) for j in range(_WINNOW_K)],
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = df.select("doc_id", grams.alias("h"))
    h = F.col("h")
    mins = (
        F.when(
            F.size(h) >= _WINNOW_WIN,
            F.transform(
                F.sequence(F.lit(0), F.size(h) - _WINNOW_WIN),
                lambda j: F.array_min(F.slice(h, j + 1, _WINNOW_WIN)),
            ),
        )
        .when(F.size(h) > 0, F.array(F.array_min(h)))
        .otherwise(F.array().cast("array<string>"))
    )
    return d.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fingerprint")
    )


_WINNOW_MIN_SHARED = 2


@query(
    "q_text_winnow_pairs",
    oracle=_WINNOW_SQL_CTE
    + f"""
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM fp a JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
    """,
)
def q_text_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document overlap pairs: documents sharing ≥2 winnowing
    fingerprints, found by an equi-join on the fingerprint key.

    This is the payoff of winnowing: shared token runs become shared
    fingerprints, so partial-overlap detection is an inverted-index
    equi-join (like the shingle/minhash joins) instead of any pairwise
    text comparison — at 100 TB the shuffle carries (doc_id, 32-byte fp)
    rows and the per-fingerprint groups are bounded by the ~2/(w+1)
    selection density.
    """
    # cache: both self-join sides re-evaluate the whole winnowing chain
    # otherwise (the CPU-heaviest stage of the query); the registry
    # wrapper drops the cache before the next query runs
    fps = winnow_fingerprints(spread(table(spark, sf_dir, "documents"))).cache()
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= _WINNOW_MIN_SHARED)
    )


@query(
    "q_text_lm_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
        FROM documents
    ),
    vocab AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ),
    corpus AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM vocab),
    scored AS (
        SELECT t.doc_id, LN(CAST(v.cnt AS DOUBLE) / c.n) AS lnp
        FROM toks t JOIN vocab v ON t.tok = v.tok CROSS JOIN corpus c
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           -LIST_SUM(LIST(lnp ORDER BY lnp)) / COUNT(*) AS avg_nll
    FROM scored
    GROUP BY doc_id
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-document mean negative
    log-likelihood under the corpus's own unigram distribution — the
    classic cheap perplexity-style quality signal (documents full of
    rare tokens score high, boilerplate scores low).

    Determinism across engines: double addition is order-sensitive, so
    each document's ln-probabilities are summed in ASCENDING VALUE order
    in both engines (Spark: ``array_sort`` + sequential ``aggregate``
    fold; DuckDB: ``LIST(... ORDER BY ...)`` + ``LIST_SUM``) — ties are
    bit-equal doubles, so the fold is bit-deterministic. One division at
    the end.

    Scale: token explode → vocab count (shuffle on token) → count join
    back → per-doc fold (shuffle on doc_id). Vocab and corpus-total are
    tiny aggregates; the two big shuffles are both linear in token count.
    """
    d = spread(table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    n_corpus = vocab.agg(
        F.sum("cnt").cast("double").alias("n")
    )
    scored = (
        toks.join(vocab.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "doc_id",
            F.log(F.col("cnt").cast("double") / F.col("n")).alias("lnp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.aggregate(
                F.array_sort(F.collect_list("lnp")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sum_lnp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (-F.col("sum_lnp") / F.col("n_tokens")).alias("avg_nll"),
        )
    )


@query(
    "q_contamination",
    oracle="""
    WITH split AS (
        SELECT doc_id, text,
               SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' AS in_train
        FROM documents
    ),
    sh AS (
        SELECT doc_id, in_train,
               LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in RANGE(1, LEN(w) - 1)]) AS grams
        FROM (SELECT doc_id, in_train, STRING_SPLIT(text, ' ') AS w
              FROM split)
    ),
    train_grams AS (
        SELECT DISTINCT UNNEST(grams) AS g FROM sh WHERE in_train
    ),
    val_grams AS (
        SELECT doc_id, UNNEST(grams) AS g FROM sh WHERE NOT in_train
    )
    SELECT v.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(t.g) AS BIGINT) AS matched,
           CAST(COUNT(t.g) AS DOUBLE) / COUNT(*) AS overlap,
           CAST(COUNT(t.g) AS DOUBLE) / COUNT(*) >= 0.8 AS contaminated
    FROM val_grams v LEFT JOIN train_grams t ON v.g = t.g
    GROUP BY v.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination detection: for each held-out document, the
    fraction of its word-3-gram shingles that appear ANYWHERE in the
    training split (content-addressed split, same as ``q_split_assign``).
    Containment-against-the-corpus, not pairwise similarity — a benchmark
    answer leaked across many training documents still lights up.

    Plan: the training side collapses to a distinct gram set once
    (at 100 TB: persist it — it is the corpus's n-gram index and the
    same artifact the incremental-dedup probe uses); the held-out side
    left-joins its grams against it on 8-byte hashes and aggregates per
    document. One distinct, one shuffle join, one aggregate; overlap is
    an exact integer ratio (single division → bit-identical). The oracle
    joins on gram STRINGS while Spark joins on ``xxhash64`` — a 64-bit
    collision would surface as a driver hash mismatch (P ≈ n²/2⁶⁴,
    negligible; same convention as ``q_dedup_near``).
    """
    from .dedup import _shingles

    docs = table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    sh = _shingles(docs).withColumn("in_train", bucket < "cd")
    train_grams = (
        sh.filter("in_train")
        .select(F.explode("shingles").alias("g0"))
        .select(F.xxhash64("g0").alias("g"))
        .distinct()
    )
    val_grams = (
        sh.filter(~F.col("in_train"))
        .select("doc_id", F.explode("shingles").alias("g0"))
        .select("doc_id", F.xxhash64("g0").alias("g"))
    )
    hit = F.col("t_g").isNotNull().cast("long")
    joined = val_grams.join(
        train_grams.hint("shuffle_hash").withColumnRenamed("g", "t_g"),
        val_grams.g == F.col("t_g"),
        "left",
    )
    overlap = F.col("matched").cast("double") / F.col("n_grams")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(hit).cast("long").alias("matched"),
        )
        .select(
            "doc_id",
            "n_grams",
            "matched",
            overlap.alias("overlap"),
            (overlap >= 0.8).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction / markup stripping — the scrubbing stages of a training-data
# pipeline (round 5; regex-only, codegen'd, embarrassingly parallel)
# ---------------------------------------------------------------------------

#: patterns chosen to mean the same thing in Java regex (Spark) and RE2
#: (DuckDB): character classes, bounded repetition, \b — no lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH synth AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-'
                    || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
                   AS pii_text
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(pii_text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(pii_text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           REGEXP_REPLACE(REGEXP_REPLACE(pii_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM synth
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count + redact email addresses and phone numbers.

    The corpus is synthetic (no real PII), so the query deterministically
    APPENDS a per-document email + phone before scrubbing — both engines
    synthesize the identical string, so the redaction regexes are
    genuinely exercised on every row and the hash check proves Spark's
    Java regex and DuckDB's RE2 agree on these pattern classes.

    100 TB: stateless projection, zero shuffles, whole-stage codegen'd;
    regex cost is linear in bytes and scales with executors. The pattern
    subset (classes, bounded reps, \\b) is deliberately lookaround-free
    so the same patterns run on any engine.
    """
    d = table(spark, sf_dir, "documents")
    pii = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(pii, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(pii, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(pii, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        redacted.alias("redacted"),
    )


@query(
    "q_strip_markup",
    oracle="""
    WITH synth AS (
        SELECT doc_id,
               '<div id="d' || CAST(doc_id AS VARCHAR) || '"><p>' || text
                   || '</p><br/></div>' AS html
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(html, '<[^>]+>')) AS BIGINT) AS n_tags,
           TRIM(REGEXP_REPLACE(REGEXP_REPLACE(html, '<[^>]+>', ' ', 'g'),
                               ' +', ' ', 'g')) AS clean_text
    FROM synth
    """,
)
def q_strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/markup stripping: drop HTML tags, collapse whitespace.

    Same synthesize-then-scrub harness as ``q_pii_redact``: both engines
    wrap each document in an identical deterministic tag structure, so
    the strip regex runs on real markup every row. This is the
    crawl-cleaning stage of a web-corpus pipeline (tag removal before
    quality scoring / dedup), expressed as two global regex passes.

    100 TB: stateless, shuffle-free, codegen'd — scales with executors.
    """
    d = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div id="d'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'),
        F.col("text"),
        F.lit("</p><br/></div>"),
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace(html, "<[^>]+>", " "), " +", " ")
    )
    return d.select(
        "doc_id",
        F.regexp_count(html, F.lit("<[^>]+>")).cast("long").alias("n_tags"),
        clean.alias("clean_text"),
    )


#: BM25 parameters (Robertson/Sparck-Jones defaults) and the fixed query
#: term set; scores fixed-pointed at 1e8 for order-independent summation
#: (same rationale as corpus._LOG_FP).
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("stream", "window", "vector", "filter", "merge")
_BM25_FP = 100_000_000
_BM25_TOP = 20


@query(
    "q_bm25",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN {_BM25_TERMS} GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    terms AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                   LN((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                      + {_BM25_B} * dl.dl / stats.avgdl))
                   * {_BM25_FP} + 0.5) AS BIGINT) AS term_fp
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
    )
    SELECT doc_id,
           COUNT(*) AS n_terms_hit,
           CAST(SUM(term_fp) AS BIGINT) AS bm25_fp
    FROM terms GROUP BY doc_id
    ORDER BY bm25_fp DESC, doc_id ASC
    LIMIT {_BM25_TOP}
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring for a fixed query term set, top
    {_BM25_TOP} documents — the standard lexical ranker (and the hard
    half of hybrid BM25+vector retrieval; the vector half is
    ``similarity.q_sim_topk``). Extends ``q_text_tfidf``'s weighting
    with per-document length normalization and saturating tf.

    Plan: the token explode feeds per-doc lengths ONCE; the tf table is
    pre-filtered to the query terms (so the expensive per-(doc,term)
    aggregation is |terms|-bounded, not vocab-bounded); df and the
    global (N, avgdl) scalars broadcast back onto it. Each BM25 term is
    row-local double math on exact integers, fixed-pointed BEFORE the
    per-doc sum (order-independent, engine-identical — the
    ``corpus._LOG_FP`` convention); avgdl is one exact-integer division.
    At 100 TB: two token-keyed aggregations + broadcast joins, no
    quadratic step, rank via TakeOrdered (no global sort).
    """
    return bm25_frame(table(spark, sf_dir, "documents")).orderBy(
        F.col("bm25_fp").desc(), F.col("doc_id").asc()
    ).limit(_BM25_TOP)


def bm25_frame(d: DataFrame) -> DataFrame:
    """(doc_id, n_terms_hit, bm25_fp) for every doc hitting the query
    terms — the unranked BM25 scoring plan shared by ``q_bm25`` and the
    hybrid fusion (``similarity.q_rank_fusion``)."""
    # Null-text docs never tokenize (explode of split(NULL) emits no
    # rows), so they must not count toward n_docs/avgdl either — the
    # pre-r14 explode+groupBy dropped them implicitly; the size(split())
    # rewrite below would emit a NULL-dl row per null doc and shift the
    # stats (ADVICE r14). Filter restores the original contract.
    d = d.filter(F.col("text").isNotNull())
    # r14 opt (guide §1.2): document length = size(split(...)) — a
    # per-row map, NOT an explode+groupBy. The old spelling ran the
    # token explode up to three times (dl aggregate, the stats
    # broadcast's own copy of it, and the tf path); now only the tf
    # path explodes, and the isin filter prunes to the query terms
    # immediately after the Generate, so the one remaining
    # corpus-sized subtree shuffles query-term hits only.
    dl = d.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_fp = F.floor(
        idf * (F.col("tf") * (_BM25_K1 + 1)) / denom * _BM25_FP + F.lit(0.5)
    ).cast("long")
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_fp.alias("term_fp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("term_fp").cast("long").alias("bm25_fp"),
        )
    )


_LUHN_SPARK = (
    "aggregate(transform(sequence(1, 16), i -> "
    "CASE WHEN i % 2 = 1 THEN CAST(substring(num, 17 - i, 1) AS INT) "
    "ELSE IF(CAST(substring(num, 17 - i, 1) AS INT) * 2 > 9, "
    "CAST(substring(num, 17 - i, 1) AS INT) * 2 - 9, "
    "CAST(substring(num, 17 - i, 1) AS INT) * 2) END), 0, "
    "(a, x) -> a + x) % 10 = 0"
)

_LUHN_DUCK = (
    "LIST_SUM(LIST_TRANSFORM(RANGE(1, 17), i -> "
    "CASE WHEN i % 2 = 1 THEN CAST(SUBSTR(num, 17 - i, 1) AS INT) "
    "ELSE CASE WHEN CAST(SUBSTR(num, 17 - i, 1) AS INT) * 2 > 9 "
    "THEN CAST(SUBSTR(num, 17 - i, 1) AS INT) * 2 - 9 "
    "ELSE CAST(SUBSTR(num, 17 - i, 1) AS INT) * 2 END END)) % 10 = 0"
)


@query(
    "q_pii_luhn",
    oracle=f"""
    SELECT doc_id, num AS card_candidate,
           {_LUHN_DUCK} AS luhn_valid,
           CONCAT(REPEAT('X', 12), SUBSTR(num, 13, 4)) AS masked
    FROM (
        SELECT doc_id,
               CONCAT(LPAD(CAST(doc_id * 7919 + 123456789 AS VARCHAR), 15, '0'),
                      CAST(doc_id % 10 AS VARCHAR)) AS num
        FROM documents
    )
    """,
)
def q_pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated PII detection: 16-digit card-number candidates
    pass through a Luhn check before redaction, separating real card
    numbers from random digit runs — the precision upgrade over
    ``q_pii_redact``'s pattern-only matching (a pattern scrubber that
    masks every 16-digit string destroys order ids and EANs; Luhn keeps
    false positives to ~10%).

    The candidates synthesize deterministically per doc (same
    synthesize-then-scrub harness as ``q_pii_redact``) so both engines
    validate byte-identical inputs and ~1 in 10 passes. The Luhn fold is
    a row-local higher-order ``aggregate`` over a 16-element sequence —
    JVM-side, shuffle-free, and map-only at any scale; masking keeps the
    last four digits per PCI display convention.
    """
    docs = table(spark, sf_dir, "documents")
    num = F.concat(
        F.lpad((F.col("doc_id") * 7919 + 123456789).cast("string"), 15, "0"),
        (F.col("doc_id") % 10).cast("string"),
    )
    return (
        docs.select("doc_id", num.alias("num"))
        .select(
            "doc_id",
            F.col("num").alias("card_candidate"),
            F.expr(_LUHN_SPARK).alias("luhn_valid"),
            F.concat(F.lit("X" * 12), F.substring("num", 13, 4)).alias("masked"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted-index build (the retrieval-side data product)
# ---------------------------------------------------------------------------

#: postings kept per term (top documents by term frequency)
_IDX_TOPK = 5
#: document-frequency floor: hapax terms carry no retrieval signal and
#: dominate the vocabulary — dropping them shrinks the index materially
_IDX_MIN_DF = 2


@query(
    "q_inverted_index",
    oracle=f"""
    WITH tf AS (
        SELECT tok, doc_id, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok, doc_id
    ),
    ranked AS (
        SELECT tok, doc_id, tf,
               ROW_NUMBER() OVER (PARTITION BY tok
                                  ORDER BY tf DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY tok) AS df,
               SUM(tf) OVER (PARTITION BY tok) AS total_tf
        FROM tf
    )
    SELECT tok, CAST(df AS BIGINT) AS df,
           CAST(total_tf AS BIGINT) AS total_tf,
           STRING_AGG(doc_id || ':' || tf, ',' ORDER BY rn) AS top_postings
    FROM ranked
    WHERE rn <= {_IDX_TOPK} AND df >= {_IDX_MIN_DF}
    GROUP BY tok, df, total_tf
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a pruned inverted index: per term, its document frequency,
    corpus term frequency, and the top-5 postings by in-document term
    frequency — the data product BM25 / keyword retrieval serves from.

    Scale shape: the classic two-level wordcount — (tok, doc) partial
    counts combine map-side, then per-term stats come from ONE window
    pass over the *aggregated* (tok, doc) rows, never raw tokens; the
    postings list is rank-filtered to ≤5 rows per term BEFORE any
    collection, so no operator ever holds an unbounded per-term state
    (the naive ``collect_list``-then-slice would). Hapax terms are
    dropped by the df floor (mirrored in the oracle). The postings
    column is presented as an ordered ``doc:tf`` string — deterministic
    by the (tf DESC, doc_id) total order — because arrays don't survive
    the gate's canonicalizer (the ``q_multimodal_features`` lesson).
    """
    return inverted_index(spread(table(spark, sf_dir, "documents")))


def inverted_index(d: DataFrame) -> DataFrame:
    """Inverted-index build plan over a documents frame (shared with
    ``tools/scale_stress.py``)."""
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    per_tok = W.partitionBy("tok")
    ranked = tf.select(
        "tok",
        "doc_id",
        "tf",
        F.row_number()
        .over(per_tok.orderBy(F.col("tf").desc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count("*").over(per_tok).alias("df"),
        F.sum("tf").over(per_tok).alias("total_tf"),
    ).filter((F.col("rn") <= _IDX_TOPK) & (F.col("df") >= _IDX_MIN_DF))
    return (
        ranked.groupBy("tok", "df", "total_tf")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "doc_id", "tf"))
                    ),
                    lambda s: F.concat_ws(":", s["doc_id"], s["tf"]),
                ),
            ).alias("top_postings")
        )
        .select(
            "tok",
            F.col("df").cast("long").alias("df"),
            F.col("total_tf").cast("long").alias("total_tf"),
            "top_postings",
        )
    )


# ---------------------------------------------------------------------------
# Corpus-frequency boilerplate stripping (CCNet-style segment removal)
# ---------------------------------------------------------------------------

#: segment width in words (non-overlapping) and the document-frequency
#: threshold above which a segment is boilerplate. At 100 TB the absolute
#: threshold becomes a corpus fraction via the broadcast-scalar pattern
#: (`q_text_tfidf`'s corpus-count join); the plan is unchanged.
_BP_W = 4
_BP_DF = 3


@query(
    "q_strip_boilerplate",
    oracle=f"""
    WITH segs AS (
        SELECT doc_id, k,
               ARRAY_TO_STRING(wd[k*{_BP_W}+1 : k*{_BP_W}+{_BP_W}], ' ') AS seg
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS wd FROM documents)
        CROSS JOIN UNNEST(RANGE(0, (LEN(wd)-1) // {_BP_W} + 1)) AS t(k)
    ),
    df AS (
        SELECT MD5(seg) AS h, COUNT(DISTINCT doc_id) AS df
        FROM segs GROUP BY MD5(seg)
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN d.df >= {_BP_DF} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           MD5(COALESCE(ARRAY_TO_STRING(
               LIST(s.seg ORDER BY s.k) FILTER (WHERE d.df < {_BP_DF}),
               ' '), '')) AS cleaned_hash
    FROM segs s JOIN df d ON MD5(s.seg) = d.h
    GROUP BY s.doc_id
    """,
)
def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet/RefinedWeb pass):
    split every document into non-overlapping 4-word segments, count
    each segment's document frequency corpus-wide, drop segments that
    repeat across ≥3 documents (headers, footers, template spam), and
    reassemble the cleaned text in original order — reported as per-doc
    segment census + md5 of the cleaned text (the hash keeps the gate
    comparison content-exact without shipping documents).

    Scale shape: the df aggregation and the join back both key on
    ``md5(segment)`` — 16-byte keys with map-side combine, never
    segment text across the df shuffle; reassembly is one per-doc
    aggregate whose ``collect_list`` holds only the doc's own segments
    (bounded by document length, the same state any per-doc op carries).
    Null-skipping ``collect_list(when(keep, …))`` filters and collects
    in one pass; ordering is pinned by the segment index, so the
    rebuilt text is deterministic in both engines.
    """
    return strip_boilerplate(spread(table(spark, sf_dir, "documents")))


def strip_boilerplate(d: DataFrame) -> DataFrame:
    """Boilerplate-stripping plan over a documents frame (shared with
    ``tools/scale_stress.py``)."""
    wd = F.split(F.col("text"), " ")
    segs = (
        d.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (size(split(text, ' ')) - 1) div {_BP_W}),"
                    f" k -> array_join(slice(split(text, ' '), k * {_BP_W} + 1, {_BP_W}), ' '))"
                )
            ).alias("k", "seg"),
        )
        .withColumn("h", F.md5("seg"))
    )
    df_tbl = segs.groupBy("h").agg(
        F.count_distinct("doc_id").alias("df")
    )
    joined = segs.join(df_tbl, "h")
    keep = F.col("df") < _BP_DF
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segs"),
        F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.md5(
            F.coalesce(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(keep, F.struct("k", "seg"))
                            )
                        ),
                        lambda s: s["seg"],
                    ),
                ),
                F.lit(""),
            )
        ).alias("cleaned_hash"),
    )


# ---------------------------------------------------------------------------
# Lexicon-based sentiment scoring (the EDBT'16 Spark-sentiment shape)
# ---------------------------------------------------------------------------

#: word → polarity lexicon (deterministic; the corpus vocabulary's
#: evaluative terms). A production lexicon (VADER/SentiWordNet) swaps in
#: as the same broadcast table.
_SENTI_LEX: tuple[tuple[str, int], ...] = (
    ("fast", 1),
    ("big", 1),
    ("small", -1),
    ("slow", -1),
)


@query(
    "q_text_sentiment",
    oracle=f"""
    WITH lex(tok, pol) AS (VALUES {", ".join(f"('{w}', {p})" for w, p in _SENTI_LEX)}),
    toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
    ),
    scored AS (
        SELECT t.doc_id,
               COUNT(*) AS n_toks,
               SUM(COALESCE(l.pol, 0)) AS polarity,
               SUM(CASE WHEN l.pol IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
        FROM toks t LEFT JOIN lex l ON t.tok = l.tok
        GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(polarity AS BIGINT) AS polarity,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(polarity AS DOUBLE) / n_toks AS score,
           CASE WHEN polarity > 0 THEN 'pos'
                WHEN polarity < 0 THEN 'neg' ELSE 'neutral' END AS label
    FROM scored
    """,
)
def q_text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based document sentiment (the classic large-scale Spark
    sentiment shape — EDBT'16 "Large Scale Sentiment Analysis with
    Spark"): tokens left-join a broadcast polarity lexicon, per-doc sum
    gives raw polarity, hit count, a length-normalized score, and a
    3-way label.

    Scale shape: the lexicon is a broadcast map-side join (a production
    VADER-size lexicon is ~7k rows — still broadcast); the only shuffle
    re-aggregates per doc_id with map-side partials. Score is one IEEE
    division of exact integers. No Python anywhere.
    """
    d = spread(table(spark, sf_dir, "documents"))
    lex = local_df(spark, list(_SENTI_LEX), "tok string, pol int")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    scored = (
        toks.join(F.broadcast(lex), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.coalesce(F.col("pol"), F.lit(0))).alias("polarity"),
            F.sum(F.when(F.col("pol").isNotNull(), 1).otherwise(0)).alias(
                "n_hits"
            ),
        )
    )
    return scored.select(
        "doc_id",
        F.col("polarity").cast("long").alias("polarity"),
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("polarity").cast("double") / F.col("n_toks")).alias("score"),
        F.when(F.col("polarity") > 0, "pos")
        .when(F.col("polarity") < 0, "neg")
        .otherwise("neutral")
        .alias("label"),
    )


#: must equal dedup._SUBSTR_K (module-level import would be circular —
#: dedup → similarity → text); pinned by an assert in the query body
_CLEAN_K = 8


@query(
    "q_text_substring_clean",
    oracle=f"""
    WITH words0 AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
    ),
    tokens AS (
      SELECT doc_id, i, ws[i] AS w
      FROM words0, UNNEST(GENERATE_SERIES(1, LEN(ws))) AS t(i)
    ),
    grams AS (
      SELECT doc_id, i, MD5(ARRAY_TO_STRING(ws[i:i+{_CLEAN_K - 1}], ' ')) AS gk
      FROM words0, UNNEST(GENERATE_SERIES(1, LEN(ws) - {_CLEAN_K - 1})) AS t(i)
      WHERE LEN(ws) >= {_CLEAN_K}
    ),
    dup AS (
      SELECT doc_id, i FROM grams
      WHERE gk IN (SELECT gk FROM grams GROUP BY gk
                   HAVING COUNT(DISTINCT doc_id) >= 2)
    ),
    lagged AS (
      SELECT doc_id, i,
             COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), -{_CLEAN_K + 10})
                 AS prev_i
      FROM dup
    ),
    islands AS (
      SELECT doc_id, i,
             SUM(CASE WHEN i - prev_i > {_CLEAN_K} THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY i) AS island
      FROM lagged
    ),
    spans AS (
      SELECT doc_id, island, MIN(i) AS s, MAX(i) + {_CLEAN_K - 1} AS e
      FROM islands GROUP BY doc_id, island
    ),
    kept AS (
      SELECT t.doc_id, t.i, t.w FROM tokens t
      WHERE NOT EXISTS (SELECT 1 FROM spans sp
                        WHERE sp.doc_id = t.doc_id
                          AND t.i BETWEEN sp.s AND sp.e)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MD5(STRING_AGG(w, ' ' ORDER BY i)) AS clean_md5
    FROM kept GROUP BY doc_id
    """,
)
def q_text_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of the exact-substring pass (Lee et al.
    2022): CUT every cross-document duplicated span out of each
    document and re-assemble the surviving tokens in order — the
    transform a training-data pipeline actually applies after
    ``q_dedup_substring`` measures the damage. Documents whose every
    token is duplicated drop out entirely.

    Plan: span ranges come from ``dedup.dup_span_ranges`` (one gram
    shuffle + one doc window); tokens anti-join the spans on doc_id
    with the position-range predicate as the join residual (span count
    per doc is small — the fan-in is bounded); reassembly is
    ``array_sort(collect_list(struct(pos, word)))`` per doc — one
    doc-keyed shuffle, never a global sort. Output carries
    md5(clean_text) instead of the text so the verified artifact stays
    row-sized; the md5 pins byte-exact reconstruction across engines.
    """
    from .dedup import _SUBSTR_K, dup_span_ranges

    assert _CLEAN_K == _SUBSTR_K, "oracle k drifted from dedup._SUBSTR_K"
    d = table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("p", "w"),
    ).select("doc_id", (F.col("p") + 1).alias("i"), "w")
    spans = dup_span_ranges(d).select("doc_id", "s", "e")
    kept = tokens.join(
        spans,
        (tokens.doc_id == spans.doc_id)
        & (tokens.i >= spans.s)
        & (tokens.i <= spans.e),
        "left_anti",
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda x: x.w,
                ),
                " ",
            )
        ).alias("clean_md5"),
    )


#: RAKE breaker words — phrase candidates are maximal runs of tokens
#: that are none of these (and at least 2 chars long)
_RAKE_STOP = (
    "the", "a", "an", "of", "and", "or", "in", "to", "is", "for",
    "on", "with", "by", "at", "as", "it", "be",
)


@query(
    "q_text_rake",
    oracle=f"""
    WITH arrs AS (
        SELECT doc_id,
               string_split_regex(LOWER(text), '[^a-z0-9]+') AS arr
        FROM documents
    ), tok AS (
        SELECT doc_id,
               UNNEST(arr) AS token,
               UNNEST(generate_series(1, len(arr))) AS pos,
               (UNNEST(arr) = '' OR LENGTH(UNNEST(arr)) < 2 OR
                UNNEST(arr) IN
                ({", ".join("'" + w + "'" for w in _RAKE_STOP)})) AS brk
        FROM arrs
    ), words AS (
        SELECT doc_id, token, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS island
        FROM tok WHERE NOT brk
    ), phrases AS (
        SELECT doc_id, island,
               STRING_AGG(token, ' ' ORDER BY pos) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS plen
        FROM words GROUP BY doc_id, island
    ), wstats AS (
        SELECT w.token,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(p.plen) AS BIGINT) AS degree
        FROM words w
        JOIN phrases p ON w.doc_id = p.doc_id AND w.island = p.island
        GROUP BY w.token
    ), scored AS (
        SELECT p.phrase, p.plen,
               CAST(SUM(s.degree * 1000000 // s.freq) AS BIGINT) AS score_fp
        FROM words w
        JOIN phrases p ON w.doc_id = p.doc_id AND w.island = p.island
        JOIN wstats s ON s.token = w.token
        GROUP BY p.doc_id, p.island, p.phrase, p.plen
    )
    SELECT phrase, CAST(plen AS BIGINT) AS n_words, score_fp,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM scored
    GROUP BY phrase, plen, score_fp
    ORDER BY score_fp DESC, phrase
    LIMIT 15
    """,
)
def q_text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.'s Rapid Automatic Keyword
    Extraction): candidate phrases are maximal stopword-free token runs
    (gaps-and-islands over token positions — no word-boundary regex, so
    both engines tokenize identically with one character-class split);
    each word scores degree/frequency, where degree sums the lengths of
    every phrase containing the word; a phrase scores the sum of its
    members' scores. Scoring is EXACT integer arithmetic — degree·1e6
    floor-divided by freq, summed as BIGINTs — so the top-15 ranking
    and its tie-break are bit-identical cross-engine, no float anywhere.

    Plan shape: tokenize in the scan projection, one shuffle to phrase
    islands (doc-local keys), one token-keyed shuffle for word stats
    (vocab-bounded), a broadcast-sized stats join back, and a
    TakeOrdered(15). Corpus passes: exactly one over the text.
    """
    stop = [F.lit(w) for w in _RAKE_STOP]
    d = spread(table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias(
            "pos0", "token"
        ),
    ).select(
        "doc_id",
        "token",
        # DuckDB's WITH ORDINALITY is 1-based; mirror it
        (F.col("pos0") + 1).alias("pos"),
        (
            (F.col("token") == "")
            | (F.length("token") < 2)
            | F.col("token").isin(*[w for w in _RAKE_STOP])
        ).alias("brk"),
    )
    words = tok.filter(~F.col("brk")).select(
        "doc_id",
        "token",
        "pos",
        (
            F.col("pos")
            - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
        ).alias("island"),
    )
    phrases = words.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda x: x["token"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    wp = words.join(phrases, ["doc_id", "island"])
    wstats = wp.groupBy("token").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("degree"),
    )
    scored = (
        wp.join(F.broadcast(wstats), "token")
        .groupBy("doc_id", "island", "phrase", "plen")
        .agg(
            F.sum(F.expr("degree * 1000000L DIV freq"))
            .cast("long")
            .alias("score_fp")
        )
    )
    return (
        scored.groupBy("phrase", "plen", "score_fp")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .select(
            "phrase",
            F.col("plen").cast("long").alias("n_words"),
            "score_fp",
            "n_occurrences",
        )
        .orderBy(F.col("score_fp").desc(), "phrase")
        .limit(15)
    )


@query(
    "q_text_readability",
    oracle=r"""
    WITH perdoc AS (
        SELECT source,
               CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
               GREATEST(1, CAST(LEN(regexp_extract_all(text, '[.!?]+'))
                   AS BIGINT)) AS s,
               CAST(LEN(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                   AS BIGINT) AS y
        FROM documents
    ),
    agg AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS words,
               CAST(SUM(s) AS BIGINT) AS sentences,
               CAST(SUM(y) AS BIGINT) AS syllables
        FROM perdoc GROUP BY source
    )
    SELECT source, n_docs, words, sentences, syllables,
           CAST(FLOOR((0.39 * (CAST(words AS DOUBLE)
                               / CAST(sentences AS DOUBLE))
                       + 11.8 * (CAST(syllables AS DOUBLE)
                                 / CAST(words AS DOUBLE))
                       - 15.59) * 1000000 + 0.5) AS BIGINT)
               AS fk_grade_fp,
           CAST(FLOOR((206.835 - 1.015 * (CAST(words AS DOUBLE)
                                          / CAST(sentences AS DOUBLE))
                       - 84.6 * (CAST(syllables AS DOUBLE)
                                 / CAST(words AS DOUBLE)))
                * 1000000 + 0.5) AS BIGINT) AS flesch_ease_fp
    FROM agg
    ORDER BY source
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid grade level and Flesch reading ease per source,
    from three regex censuses — words (``\\S+`` runs), sentences
    (``[.!?]+`` runs, floored at 1 per doc), and a vowel-group syllable
    heuristic (``[aeiouy]+`` runs, the classic approximation) — the
    corpus-quality signal that ranks sources by linguistic complexity
    for curriculum mixing (``q_mix_temperature``) and filtering
    (``q_quality_tiers``). Character classes only, so the pattern
    semantics are identical in Java regex and RE2.

    Determinism: the three counts are exact int64 summed per source;
    each score is ONE fixed double tree over those sums, floor-
    quantized — no per-row floats, no reduction-order dependence.

    Scale: counting happens inside the scan projection (JVM regex, no
    Python); the shuffle carries |sources| rows of four longs.
    """
    d = table(spark, sf_dir, "documents")
    perdoc = d.select(
        "source",
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
        .cast("long")
        .alias("w"),
        F.greatest(
            F.lit(1).cast("long"),
            F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")).cast(
                "long"
            ),
        ).alias("s"),
        F.size(F.expr(r"regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)"))
        .cast("long")
        .alias("y"),
    )
    agg = perdoc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("words"),
        F.sum("s").cast("long").alias("sentences"),
        F.sum("y").cast("long").alias("syllables"),
    )
    wps = F.col("words").cast("double") / F.col("sentences").cast("double")
    spw = F.col("syllables").cast("double") / F.col("words").cast("double")
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.floor(
            (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("fk_grade_fp"),
        F.floor(
            (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("flesch_ease_fp"),
    ).orderBy("source")
