"""Vector similarity search over the ``embeddings`` table (SURVEY.md §2.4).

- ``q_sim_topk``   : exact brute-force cosine top-k for a query set —
  the correctness baseline. Query vectors are broadcast; the scan side
  streams once; per-query top-k via window. DuckDB-oracled.
- ``q_sim_selfjoin``: exact pairwise similarity join above a threshold.
  DuckDB-oracled.
- ``q_sim_ann_lsh`` : the scale path — banded random-hyperplane (sign)
  LSH: 64 seeded hyperplane bits in 16 bands, inverted-index explode,
  bucket equi-join for candidates, exact cosine re-rank of candidates
  only. Approximate recall ⇒ rows-only.

All cosine math is built-in higher-order array functions (zip_with +
aggregate) over ``array<double>`` — JVM-side, no UDFs. Sequential fold
order matches DuckDB's list_sum, so thresholds compare bit-stably.

100 TB design: brute force is O(Q×N) per query batch — fine for small Q
with a broadcast; the LSH variant buckets N once (shuffle on 16-bit key ⇒
~65k buckets, AQE coalesces) and only re-ranks within buckets. IVF would
replace the hash with k-means centroids; the plumbing (bucket → rerank)
is identical. Exact-then-prune top-k staging mirrors the candidate/verify
split used by distributed top-k similarity systems (EDBT 2020 / ICDE 2021
REPOSE / SIGMOD 2020 CASS, PAPERS.md): cheap signatures bound the
candidate set, exact scoring ranks only candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import local_df, spread, table
from ..functions.determinism import canon
from ..plans.registry import alias_query, query

_QUERY_VEC_IDS = (0, 1, 2, 3, 4)
_TOP_K = 10
_SELFJOIN_THRESHOLD = 0.42
#: sign-LSH signature = _LSH_BANDS bands of _LSH_BAND_BITS hyperplane bits.
#: Candidates come from an equi-join on (band, band_value) — a vector is a
#: candidate iff it agrees with the query on ALL bits of at least one band.
#: Tuning math (p = per-bit disagreement = acos(cos)/π): per-neighbor recall
#: is 1-(1-(1-p)^BITS)^BANDS. This corpus's 10th neighbors sit at cos≈0.25
#: (p≈0.42), so 16 bands × 4 bits ⇒ ~87% recall; strong neighbors
#: (cos≥0.8, p≈0.2) ⇒ >99.9%. At 100 TB, raise BAND_BITS to sharpen
#: selectivity per bucket and BANDS to buy recall back — the join shape
#: (explode → hash join on the bucket key) is unchanged.
_LSH_BANDS = 16
_LSH_BAND_BITS = 4
_LSH_BITS = _LSH_BANDS * _LSH_BAND_BITS
_LSH_SEED = 42


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _cos8(qe: str = "qe", e: str = "e", qn: str = "qn", n: str = "n") -> Column:
    """``round(cosine, 8)`` as ONE parsed expression (r15, guide §7.3
    driver work): the zip_with/aggregate lambda-DSL spelling costs ~25
    py4j round trips per call site and this module has a dozen of them;
    the string parses in a single call. ``0.0D`` is the same double
    literal as ``F.lit(0.0)``, the fold order is unchanged, so the
    expression tree — and the bit-exact sequential sum it guarantees —
    is identical."""
    return F.expr(
        f"round(aggregate(zip_with({qe}, {e}, (a, b) -> a * b), 0.0D,"
        f" (acc, v) -> acc + v) / ({qn} * {n}), 8)"
    )


def _norm(x: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(x, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v)
    )


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id, e (double array), n (precomputed L2 norm).

    Norms are computed once per vector here, NOT per pair: higher-order
    array functions are interpreted (outside codegen), so dropping the two
    per-pair norm folds cuts the pairwise stage to a single dot fold —
    ~3x on the brute-force paths.
    """
    return spread(table(spark, sf_dir, "embeddings")).selectExpr(
        "vec_id",
        "CAST(embedding AS array<double>) AS e",
        "label",
        "sqrt(aggregate(transform(CAST(embedding AS array<double>),"
        " v -> v * v), 0.0D, (acc, v) -> acc + v)) AS n",
    )


_SQL_COS = (
    "LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), t -> t[1] * t[2]))"
    " / (SQRT(LIST_SUM(LIST_TRANSFORM({a}, x -> x * x)))"
    " * SQRT(LIST_SUM(LIST_TRANSFORM({b}, x -> x * x))))"
)


@query(
    "q_sim_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v
          WHERE vec_id IN {_QUERY_VEC_IDS}),
    scored AS (
        SELECT q.query_id, v.vec_id,
               CAST(ROUND({_SQL_COS.format(a='q.qe', b='v.e')}, 8)
                    AS DECIMAL(38,8)) AS cosine
        FROM q JOIN v ON v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, CAST(cosine AS VARCHAR) AS cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id) AS rn FROM scored)
    WHERE rn <= {_TOP_K}
    """,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{k} for a fixed query-vector set (brute force —
    the ANN correctness baseline). Ranking is on the *rounded* cosine with
    vec_id tiebreak so cross-engine ordering is deterministic."""
    emb = _embeddings(spark, sf_dir)
    q = (
        emb.filter(F.col("vec_id").isin(*_QUERY_VEC_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("n").alias("qn"),
        )
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


@query(
    "q_sim_selfjoin",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           {_SQL_COS.format(a='a.e', b='b.e')} AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_SQL_COS.format(a='a.e', b='b.e')} >= {_SELFJOIN_THRESHOLD}
    """,
)
def q_sim_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise near-duplicate vectors above a cosine threshold.

    **sf-capped oracle baseline, not the scale operator**: the O(n²) pair
    enumeration exists to be DuckDB-checkable and to ground-truth the
    bucketed twins. At 100 TB run ``q_sim_ann_lsh`` (banded bucket join)
    or ``q_sim_ann_ivf`` (centroid buckets) — same re-rank contract,
    candidates from equi-joins instead of all pairs.
    """
    emb = _embeddings(spark, sf_dir)
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            F.expr(
                "aggregate(zip_with(a.e, b.e, (x, y) -> x * y), 0.0D,"
                " (acc, v) -> acc + v) / (a.n * b.n)"
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= _SELFJOIN_THRESHOLD)
    )


def hyperplanes(dim: int, bits: int = _LSH_BITS, seed: int = _LSH_SEED) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH (fixed seed — SURVEY
    §7.4-4: reproducibility is a requirement, not a nicety)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def band_signature_udf(planes: list[list[float]]):
    """Arrow-vectorized signature computation: one numpy matmul per batch.

    Spelling the 64 hyperplane dots as built-in fold expressions makes a
    ~4k-literal-node plan whose analysis/codegen dwarfs the actual math;
    a pandas_udf doing ``(batch × dim) @ (dim × bits)`` is the honest
    scale design for hyperplane signatures (one Arrow round-trip, BLAS
    inner loop) and keeps the plan tiny. Returns per-band bucket values
    (band b packs its ``_LSH_BAND_BITS`` sign bits into one small int).
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # dim × bits
    weights = (2 ** np.arange(_LSH_BAND_BITS)).astype(np.int64)

    @pandas_udf("array<int>")
    def sig(col: pd.Series) -> pd.Series:
        E = np.stack(col.to_numpy())  # batch × dim
        bits = (E @ P) >= 0.0  # batch × (bands*band_bits)
        bands = bits.reshape(len(E), _LSH_BANDS, _LSH_BAND_BITS) @ weights
        return pd.Series([row.astype(np.int32).tolist() for row in bands])

    return sig


def q_sim_ann_lsh_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: banded random-hyperplane LSH → bucket **equi-join**
    candidates → exact cosine re-rank of candidates only.

    Bench-only since round 11: the gate name ``q_sim_ann_lsh`` carries the
    md5 cross-engine plan (hash-verifiable); this float-hyperplane form
    stays the quality path, recall-audited by ``q_sim_ann_recall``.

    Scale shape (the point of this operator vs the q_sim_topk baseline):

    1. every vector posexplodes to ``_LSH_BANDS`` rows keyed
       ``(band, band_value)`` — the inverted index;
    2. the (tiny) query set explodes the same way and **hash-joins** on the
       bucket key — never a nested-loop predicate over N, so the work is
       per-bucket, partitionable, and AQE-coalesced;
    3. candidate (query, vector) pairs dedup, re-join their vectors by key,
       and only those pairs pay the exact cosine.

    This mirrors q_dedup_minhash's band join (dedup.py) — one design for
    both text and vector near-neighbor search.
    """
    return ann_lsh_topk(_embeddings(spark, sf_dir), list(_QUERY_VEC_IDS))


def banded_signatures(emb: DataFrame) -> DataFrame:
    """Attach the banded LSH signature column to a vector frame and cache
    it. The signature table IS the index: every consumer (inverted index,
    query set, candidate re-join, the self-join in
    ``dedup.q_dedup_embed_lsh``) reads it repeatedly — at scale this is
    the persisted signature/index table every ANN system materializes
    once, not a per-query luxury. One shared construction point so the
    banding parameters can never drift between the text and vector
    near-neighbor operators."""
    dim = len(emb.select("e").first()["e"])
    return emb.withColumn(
        "bands", band_signature_udf(hyperplanes(dim))(F.col("e"))
    ).cache()


def ann_lsh_topk(emb: DataFrame, query_ids: list[int]) -> DataFrame:
    """(vec_id, e, n) + query ids → approximate top-k via the banded
    bucket join — the reusable operator behind ``q_sim_ann_lsh`` (also
    driven at 10× by ``tools/scale_stress.py``)."""
    signed = banded_signatures(emb)
    # inverted index: one row per (vector, band) with the band's bucket value
    buckets = signed.select(
        "vec_id", F.posexplode("bands").alias("band", "bval")
    )
    qvec = signed.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
        F.col("bands").alias("qbands"),
    )
    qbuckets = qvec.select(
        "query_id", F.posexplode("qbands").alias("band", "bval")
    )
    # bucket equi-join (hash join on the composite key), then dedup pairs:
    # a pair can collide in up to _LSH_BANDS buckets but must score once.
    candidates = (
        buckets.join(F.broadcast(qbuckets), ["band", "bval"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        candidates.join(signed.select("vec_id", "e", "n"), "vec_id")
        .join(F.broadcast(qvec.select("query_id", "qe", "qn")), "query_id")
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


_IVF_K = 16
_IVF_ITERS = 3
_IVF_PROBES = 2


def _assign_udf(cents: list[tuple[int, list[float]]]):
    """Arrow-vectorized nearest-centroid assignment: one ``E @ C.T`` per
    batch, argmax with lowest-cid tiebreak (np.argmax takes the first
    maximum; centroid rows are ordered by cid). Replaces a k-way
    crossJoin + window rank — the centroid matrix rides along as a
    closure, exactly like a broadcast variable."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray([v for _, v in cents], dtype=np.float64)  # k × dim

    @pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        E = np.stack(col.to_numpy())
        return pd.Series(np.argmax(E @ C.T, axis=1).astype(np.int32))

    return nearest


def _probe_udf(cents: list[tuple[int, list[float]]], nprobe: int):
    """Top-``nprobe`` centroid ids per query vector (sim desc, cid asc)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray([v for _, v in cents], dtype=np.float64)

    @pandas_udf("array<int>")
    def probes(col: pd.Series) -> pd.Series:
        E = np.stack(col.to_numpy())
        sims = E @ C.T
        # stable argsort on -sims ⇒ ties resolve to the lower cid
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    return probes


#: deterministic IVF training sample: the lowest vec_ids (same bounded
#: driver-side pattern as the PQ codebook's ``_PQ_TRAIN``)
_IVF_TRAIN = 512


def _centroids(emb: DataFrame, k: int = _IVF_K, iters: int = _IVF_ITERS) -> list[tuple[int, list[float]]]:
    """Deterministic mini k-means (Lloyd) trained on a bounded sample.

    Init = the k lowest vec_ids (deterministic, no RNG); Lloyd then runs
    entirely in driver-side float64 numpy on the ``_IVF_TRAIN`` lowest
    vec_ids — one bounded collect total, NOT one full-corpus pass per
    iteration. Training an IVF coarse quantizer on a sample is the
    standard build (the index is k rows regardless of corpus size; only
    the final ASSIGNMENT touches every vector), and at 100 TB the
    previous full-corpus Lloyd would have cost ``iters`` extra corpus
    scans for a 16-row artifact. Assignment uses argmax dot with
    first-occurrence (lowest-cid) tie-breaks, update is the float64
    mean — the same rules the distributed assignment UDF applies."""
    sample = np.stack(
        [
            r.e
            for r in emb.orderBy("vec_id")
            .limit(_IVF_TRAIN)
            .select("e")
            .collect()
        ]
    ).astype(np.float64)
    if len(sample) < k:
        raise ValueError(
            f"IVF coarse quantizer needs >= {k} training vectors for the "
            f"deterministic first-k init; got {len(sample)}"
        )
    C = sample[:k].copy()
    for _ in range(iters):
        cid = np.argmax(sample @ C.T, axis=1)  # first max = lowest cid
        for c in range(k):
            members = sample[cid == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return [(i, C[i].tolist()) for i in range(k)]


def q_sim_ann_ivf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: k-means-bucketed inverted file, probe the
    ``nprobe`` centroids nearest each query, exact re-rank inside probed
    buckets only.

    The other scale path next to sign-LSH (q_sim_ann_lsh): data is
    partitioned once by nearest centroid (one shuffle), queries touch
    nprobe/k of the table. Fully deterministic: centroid init is the k
    lowest vec_ids, ties broken by centroid id.
    """
    # cache: the vector table feeds the bounded training sample, the
    # final assignment, and the probe scoring — three reads
    emb = _embeddings(spark, sf_dir).cache()
    cents = _centroids(emb)
    # assign every vector to its nearest centroid (bucket) — one
    # vectorized matmul per Arrow batch, no crossJoin, no window
    assigned = emb.select(
        "vec_id", "e", "n", _assign_udf(cents)(F.col("e")).alias("bucket")
    )
    # each query probes its nprobe nearest buckets
    probes = (
        emb.filter(F.col("vec_id").isin(*_QUERY_VEC_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("n").alias("qn"),
            F.explode(_probe_udf(cents, _IVF_PROBES)(F.col("e"))).alias("bucket"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compressed ANN scale path
# ---------------------------------------------------------------------------

_PQ_M = 8        # subspaces (64-dim vectors → 8 sub-vectors of 8 dims)
_PQ_K = 64       # centroids per subspace (6-bit codes)
_PQ_TRAIN = 512  # deterministic training sample: the lowest vec_ids
_PQ_ITERS = 5
_PQ_REFINE = 8   # exact re-rank depth: ADC keeps top REFINE*k candidates


def _pq_codebook(emb: DataFrame) -> np.ndarray:
    """Train the per-subspace codebooks on a deterministic driver-side
    sample (the ``_PQ_TRAIN`` lowest vec_ids).

    Codebook training on a sample is the standard PQ build (the codebook
    is M×K×d_sub floats — here 8×64×8 — regardless of corpus size; only
    ENCODING touches every vector). Lloyd iterations in float64 numpy
    with first-occurrence argmin ties → fully deterministic, no RNG.
    Returns an (M, K, d_sub) array.
    """
    sample = np.stack(
        [r.e for r in emb.orderBy("vec_id").limit(_PQ_TRAIN).select("e").collect()]
    )
    return _pq_train(sample)


def _pq_train(sample: np.ndarray) -> np.ndarray:
    """Lloyd iterations over an already-collected training sample (the
    numpy half of :func:`_pq_codebook`, split out so ``pq_topk`` can
    fetch the training rows and the query rows in ONE driver job)."""
    if len(sample) < _PQ_K:
        raise ValueError(
            f"PQ codebook needs >= {_PQ_K} training vectors for the "
            f"deterministic first-K init; got {len(sample)}"
        )
    n, dim = sample.shape
    d_sub = dim // _PQ_M
    books = np.empty((_PQ_M, _PQ_K, d_sub))
    for m in range(_PQ_M):
        X = sample[:, m * d_sub : (m + 1) * d_sub]
        C = X[:_PQ_K].copy()  # deterministic init: first K sample rows
        for _ in range(_PQ_ITERS):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # first-occurrence ties
            for k in range(_PQ_K):
                members = X[assign == k]
                if len(members):
                    C[k] = members.mean(axis=0)
        books[m] = C
    return books


def _pq_encode_udf(books: np.ndarray):
    """Arrow-vectorized PQ encoder: one (batch × M × d_sub) distance
    computation per Arrow batch. The codebook rides along as a closure
    (a broadcast variable in cluster terms — 8×64×8 floats)."""
    from pyspark.sql.functions import pandas_udf

    M, K, d_sub = books.shape

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        E = np.stack(col.to_numpy())  # batch × dim
        Es = E.reshape(len(E), M, d_sub)
        codes = np.empty((len(E), M), dtype=np.int32)
        for m in range(M):
            d2 = ((Es[:, m, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return encode


def pq_topk(emb: DataFrame, query_ids: list[int]) -> DataFrame:
    """(vec_id, e, n) + query ids → PQ/ADC top-k with exact refine — the
    reusable operator behind ``q_sim_ann_pq`` (also driven at 10× by
    ``tools/scale_stress.py``)."""
    spark = emb.sparkSession
    # ONE driver job fetches both bounded row sets the build needs (r14
    # opt, guide §5 "the driver should do almost no data work" — but
    # when it must, batch it): the _PQ_TRAIN lowest-vec_id training rows
    # and the |queries| query rows, tagged so they split client-side.
    # The union's row order is not contractual, so the training sample
    # is re-sorted by vec_id before the deterministic first-K init.
    fetched = (
        emb.orderBy("vec_id")
        .limit(_PQ_TRAIN)
        .select(F.lit(0).alias("tag"), "vec_id", "e", "n")
        .unionByName(
            emb.filter(F.col("vec_id").isin(*query_ids)).select(
                F.lit(1).alias("tag"), "vec_id", "e", "n"
            )
        )
        .collect()
    )
    train = sorted((r for r in fetched if r.tag == 0), key=lambda r: r.vec_id)
    qrows = [r for r in fetched if r.tag == 1]
    books = _pq_train(np.stack([r.e for r in train]))
    # one-time encode — the persisted 8-bytes-per-vector code table
    codes = emb.select(
        "vec_id", "n", _pq_encode_udf(books)(F.col("e")).alias("codes")
    )
    # per-query ADC lookup tables, flattened to length M*K (tiny: 5×512)
    M, K, d_sub = books.shape
    lut_rows = []
    for r in qrows:
        q = np.asarray(r.e).reshape(M, d_sub)
        lut = np.einsum("ms,mks->mk", q, books).reshape(-1)
        lut_rows.append((r.vec_id, r.n, lut.tolist()))
    luts = local_df(spark, 
        lut_rows, "query_id long, qn double, lut array<double>"
    )
    adc = F.expr(
        f"aggregate(sequence(0, {M - 1}), 0D,"
        f" (acc, m) -> acc + lut[m * {K} + element_at(codes, m + 1)])"
    )
    approx = (
        codes.join(F.broadcast(luts), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (adc / (F.col("qn") * F.col("n"))).alias("adc_cosine"),
        )
    )
    # ADC shortlist, then exact re-rank of candidates only (Faiss-style
    # refine): the full-precision vectors are fetched for REFINE*k rows
    # per query, not the whole table.
    wa = W.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        approx.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= _PQ_REFINE * _TOP_K)
        .select("query_id", "vec_id")
    )
    qvec = (
        emb.filter(F.col("vec_id").isin(*query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("n").alias("qn"),
        )
    )
    rescored = (
        shortlist.join(emb.select("vec_id", "e", "n"), "vec_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


def q_sim_ann_pq_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k: vectors compressed to M codes from
    sample-trained per-subspace codebooks, queries scored against the
    codes via asymmetric-distance lookup tables — entirely JVM-side —
    then an exact cosine refine of the top shortlist only.

    The third ANN scale path next to sign-LSH (bucket pruning) and IVF
    (partition pruning): PQ attacks the MEMORY axis — the scan reads
    M small ints per vector instead of ``dim`` doubles (here 8 codes vs
    64 doubles, a 16-32× shrink at 100 TB, where the embedding table
    itself is the bottleneck). Per query the driver precomputes an M×K
    table of sub-dot-products against the codebook; approximate
    dot(q, x) = Σ_m LUT[m, code_m] — a built-in higher-order aggregate
    over the code array, no Python in the scoring path. True vector
    norms are kept exact (they compress poorly and cost one double).
    Deterministic end-to-end: sample-trained codebook, first-occurrence
    argmin encoding, float64 LUT sums, vec_id tiebreak.
    """
    emb = _embeddings(spark, sf_dir).cache()
    return pq_topk(emb, list(_QUERY_VEC_IDS))


#: per-query recall floor asserted by q_sim_ann_recall: observed LSH
#: recall@10 on the fixed corpus is 0.7–1.0 per query (sf0.001 + sf0.01);
#: 0.6 keeps 1-hit margin. Deterministic for fixed input (seeded planes).
_RECALL_FLOOR = 0.6


@query(
    "q_sim_ann_recall",
    oracle=f"""
    SELECT vec_id AS query_id,
           {_TOP_K} AS k,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id IN {_QUERY_VEC_IDS}
    """,
)
def q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality audit IN-PLAN: recall@k of the banded-LSH index
    against the exact brute-force top-k, per query — the acceptance test
    every ANN deployment runs before trusting an index, here expressed
    as one Spark job whose verdict column the DuckDB oracle hash-checks
    (same convention as the sketch queries: the approximate structure
    can't be reproduced cross-engine, so the *contract* is what gets
    hash-verified; a silent index regression flips recall_ok).

    Cost shape: the exact side is the ``q_sim_topk`` broadcast scan (one
    pass over the vectors); the ANN side reuses the shared banded
    signature index (``banded_signatures`` cache); the overlap join is
    k×|queries| rows. At 100 TB you run this on a sampled query set —
    the plan is already sample-sized in everything but the one exact
    scan.
    """
    qids = list(_QUERY_VEC_IDS)
    emb = _embeddings(spark, sf_dir)
    # build both rankings directly from the plan builders (the registered
    # q_sim_topk wrapper would clear this query's shared caches)
    qvecs = emb.filter(F.col("vec_id").isin(*qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
    )
    scored = emb.join(
        F.broadcast(qvecs), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        _cos8()
        .cast("decimal(38,8)")
        .alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id")
    )
    ann = ann_lsh_topk(emb, qids).select("query_id", "vec_id")
    hits = exact.join(ann, ["query_id", "vec_id"], "left_semi")
    floor_hits = int(_RECALL_FLOOR * _TOP_K)
    return (
        hits.groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
        .select(
            "query_id",
            F.lit(_TOP_K).alias("k"),
            (F.col("n_hits") >= F.lit(floor_hits)).alias("recall_ok"),
        )
    )


@query(
    "q_sim_ann_pq_native_audit",
    oracle=f"""
    SELECT vec_id AS query_id,
           {_TOP_K} AS k,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id IN {_QUERY_VEC_IDS}
    """,
)
def q_sim_ann_pq_native_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-pins the EXACT plan the bench headline times (VERDICT r12
    #4, PQ side): ``pq_topk`` — the sample-trained-codebook fast path
    behind the ``q_sim_ann_pq`` headline (``benchmark.NATIVE_IMPLS``) —
    is run ON DATA and its refined top-k is compared per query against
    the exact brute-force top-k; the driver hash-verifies the
    ``recall_ok`` verdict (observed native recall@{_TOP_K} is 0.8–1.0
    per query at sf0.001 and sf0.01; floor {_RECALL_FLOOR} keeps 2-hit
    margin). Same convention as ``q_sim_ann_recall`` for the LSH index:
    the trained codebook can't be reproduced cross-engine, so the
    CONTRACT is what hash-verifies — a silent regression in the encode,
    the ADC fold, or the refine flips the verdict. The md5 integer-
    codebook twin ``q_sim_ann_pq`` pins the PQ mechanics bit-for-bit in
    its own window; with this row the trained plan the bench times
    carries a driver verdict too.
    """
    qids = list(_QUERY_VEC_IDS)
    emb = _embeddings(spark, sf_dir).cache()
    qvecs = emb.filter(F.col("vec_id").isin(*qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
    )
    scored = emb.join(
        F.broadcast(qvecs), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        _cos8()
        .cast("decimal(38,8)")
        .alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id")
    )
    native = pq_topk(emb, qids).select("query_id", "vec_id")
    hits = exact.join(native, ["query_id", "vec_id"], "left_semi")
    floor_hits = int(_RECALL_FLOOR * _TOP_K)
    return (
        hits.groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
        .select(
            "query_id",
            F.lit(_TOP_K).alias("k"),
            (F.col("n_hits") >= F.lit(floor_hits)).alias("recall_ok"),
        )
    )


_FUSE_N = 50
_FUSE_K = 60
_FUSE_TOP = 20


def _rrf_bm25_sql() -> str:
    from .text import _BM25_B, _BM25_FP, _BM25_K1, _BM25_TERMS

    return f"""
    toks AS (
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
    dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    bm AS (
        SELECT tf.doc_id,
               SUM(CAST(FLOOR(
                   LN((stats.n_docs - dfr.df + 0.5) / (dfr.df + 0.5) + 1)
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                      + {_BM25_B} * dl.dl / stats.avgdl))
                   * {_BM25_FP} + 0.5) AS BIGINT)) AS bm25_fp
        FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )"""


@query(
    "q_rank_fusion",
    oracle=f"""
    WITH {_rrf_bm25_sql()},
    lexr AS (
        SELECT doc_id, rn AS lex_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25_fp DESC, doc_id) AS rn
            FROM bm) WHERE rn <= {_FUSE_N}
    ),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    qv AS (SELECT e AS qe FROM v WHERE vec_id = 0),
    cos AS (
        SELECT v.vec_id AS doc_id,
               CAST(ROUND({_SQL_COS.format(a='qv.qe', b='v.e')}, 8)
                    AS DECIMAL(38,8)) AS cosine
        FROM v CROSS JOIN qv WHERE v.vec_id <> 0
    ),
    vecr AS (
        SELECT doc_id, rn AS vec_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rn
            FROM cos) WHERE rn <= {_FUSE_N}
    )
    SELECT doc_id, CAST(lex_rank AS INT) AS lex_rank,
           CAST(vec_rank AS INT) AS vec_rank,
           CAST(CAST(ROUND(COALESCE(1.0 / ({_FUSE_K} + lex_rank), 0)
                         + COALESCE(1.0 / ({_FUSE_K} + vec_rank), 0), 9)
                AS DECIMAL(38,9)) AS VARCHAR) AS rrf
    FROM lexr FULL JOIN vecr USING (doc_id)
    ORDER BY COALESCE(1.0 / ({_FUSE_K} + lex_rank), 0)
           + COALESCE(1.0 / ({_FUSE_K} + vec_rank), 0) DESC, doc_id
    LIMIT {_FUSE_TOP}
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion — the hybrid-retrieval combiner: the BM25
    lexical top-{_FUSE_N} (``text.bm25_frame``) and the exact-cosine
    vector top-{_FUSE_N} (query = vector 0, ranked on the rounded cosine
    per the ``q_sim_topk`` convention) full-outer-join on doc_id and each
    doc scores Σ 1/({_FUSE_K}+rank) over the lists it appears in.

    RRF needs only the RANKS, never the incomparable raw scores — which
    is also why it cross-engine-hashes exactly: ranks are integers with
    doc_id tiebreaks, and 1/(k+rank) on identical integers is the
    identical double. Plan shape: both rankers end in a top-{_FUSE_N}
    (TakeOrdered — no global sort), the row_number windows run on those
    {_FUSE_N}-row frames only, and the fusion join touches 2×{_FUSE_N}
    rows regardless of corpus size — at 100 TB all the cost is in the
    two scorers, which are each already scale-shaped (see ``q_bm25``,
    ``q_sim_topk``).
    """
    from .text import bm25_frame

    d = table(spark, sf_dir, "documents")
    lex_top = (
        bm25_frame(d)
        .orderBy(F.col("bm25_fp").desc(), F.col("doc_id").asc())
        .limit(_FUSE_N)
    )
    lexr = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("bm25_fp").desc(), F.col("doc_id").asc()))
        .cast("int")
        .alias("lex_rank"),
    )
    emb = _embeddings(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("e").alias("qe"), F.col("n").alias("qn")
    )
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    vec_top = cos.orderBy(F.col("cosine").desc(), F.col("doc_id").asc()).limit(
        _FUSE_N
    )
    vecr = vec_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), F.col("doc_id").asc()))
        .cast("int")
        .alias("vec_rank"),
    )
    rrf = F.coalesce(
        F.lit(1.0) / (_FUSE_K + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (_FUSE_K + F.col("vec_rank")), F.lit(0.0))
    return (
        lexr.join(vecr, "doc_id", "full_outer")
        .orderBy(rrf.desc(), F.col("doc_id").asc())
        .limit(_FUSE_TOP)
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            F.round(rrf, 9).cast("decimal(38,9)").cast("string").alias("rrf"),
        )
    )


# ---------------------------------------------------------------------------
# Round 7: oracled twins for the ANN paths (VERDICT_r6 #3) — the md5 hash
# family that made q_dedup_minhash_oracled bit-identical in DuckDB, applied
# to sign-LSH bands and to the IVF bucket-probe-rerank pipeline.
# ---------------------------------------------------------------------------

_ORACLED_LSH_BANDS = 8
_ORACLED_LSH_BITS = 4
_ORACLED_PLANES = _ORACLED_LSH_BANDS * _ORACLED_LSH_BITS
_ORACLED_IVF_K = 16
_ORACLED_IVF_PROBES = 2
#: fixed-point quantization step for the cross-engine integer dot: both
#: engines compute FLOOR(e*1000) on the same float64, so the quantized
#: vectors are bit-identical and every signature/bucket decision is exact
#: int64 arithmetic — no float sign-bit divergence can exist.
_Q_SCALE = 1000


def _md5_weight(*parts: object) -> int:
    """(md5 of ':'-joined parts → first 15 hex digits) % 2001 - 1000 —
    the same value DuckDB computes as
    ``(('0x'||SUBSTR(MD5(a||':'||b),1,15))::UBIGINT::BIGINT % 2001) - 1000``."""
    import hashlib

    digest = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return int(digest[:15], 16) % 2001 - 1000


def _md5_matrix(prefix: list[object], rows: int, dim: int) -> np.ndarray:
    return np.asarray(
        [[_md5_weight(*prefix, i, j) for j in range(dim)] for i in range(rows)],
        dtype=np.int64,
    )


def _quantize(E: np.ndarray) -> np.ndarray:
    return np.floor(E * float(_Q_SCALE)).astype(np.int64)


def _oracled_band_udf(dim: int):
    """Band values from md5-derived integer hyperplanes: bit r of band b =
    sign of the int64 dot with plane (4b+r). Arrow-vectorized matmul —
    same batch shape as the float flagship's ``band_signature_udf``."""
    from pyspark.sql.functions import pandas_udf

    W_ = _md5_matrix([], _ORACLED_PLANES, dim)  # planes × dim
    weights = (2 ** np.arange(_ORACLED_LSH_BITS)).astype(np.int64)

    @pandas_udf("array<int>")
    def sig(col: pd.Series) -> pd.Series:
        Q = _quantize(np.stack(col.to_numpy()))  # batch × dim int64
        bits = (Q @ W_.T) >= 0  # batch × planes
        bands = (
            bits.reshape(len(Q), _ORACLED_LSH_BANDS, _ORACLED_LSH_BITS) @ weights
        )
        return pd.Series([row.astype(np.int32).tolist() for row in bands])

    return sig


def _lsh_weight_sql(plane: str, dim_idx: str) -> str:
    return (
        f"((CAST(('0x' || SUBSTR(MD5({plane} || ':' || {dim_idx}), 1, 15)) "
        f"AS UBIGINT)::BIGINT % 2001) - 1000)"
    )


@query(
    "q_sim_ann_lsh_oracled",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id, e,
                 [CAST(FLOOR(x * {_Q_SCALE}) AS BIGINT) for x in e] AS qv
          FROM v),
    dots AS (
        SELECT q.vec_id, t.i AS plane,
               LIST_SUM([{_lsh_weight_sql('t.i', '(j - 1)')} * qv[j]
                         for j in RANGE(1, LEN(qv) + 1)]) AS dot
        FROM q, RANGE(0, {_ORACLED_PLANES}) t(i)
    ),
    bands AS (
        SELECT vec_id, plane // {_ORACLED_LSH_BITS} AS band,
               SUM(CASE WHEN dot >= 0
                        THEN 1 << (plane % {_ORACLED_LSH_BITS}) ELSE 0 END) AS bval
        FROM dots GROUP BY vec_id, plane // {_ORACLED_LSH_BITS}
    ),
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, db.vec_id AS vec_id
        FROM bands qb
        JOIN bands db ON qb.band = db.band AND qb.bval = db.bval
        WHERE qb.vec_id IN {_QUERY_VEC_IDS} AND db.vec_id <> qb.vec_id
    ),
    scored AS (
        SELECT c.query_id, c.vec_id,
               CAST(ROUND({_SQL_COS.format(a='qq.e', b='dd.e')}, 8)
                    AS DECIMAL(38,8)) AS cosine
        FROM cand c
        JOIN v qq ON qq.vec_id = c.query_id
        JOIN v dd ON dd.vec_id = c.vec_id
    )
    SELECT query_id, vec_id, CAST(cosine AS VARCHAR) AS cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id) AS rn FROM scored)
    WHERE rn <= {_TOP_K}
    """,
)
def q_sim_ann_lsh_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN with a CROSS-ENGINE hash family — the whole pipeline
    (quantize → md5 integer hyperplanes → 8×4 banding → bucket equi-join
    candidates → exact cosine re-rank → top-k) hash-verifies against
    DuckDB end to end.

    The float flagship (``q_sim_ann_lsh``) stays the bench path: its
    seeded-Gaussian hyperplanes are numpy-only, capping the driver's
    check at rows-only. Here the hyperplane entries come from md5 (same
    trick as ``q_dedup_minhash_oracled``) and the sign decision is int64
    arithmetic on FLOOR(e*1000)-quantized vectors, so no float summation
    order can flip a bit between engines. Same plan shape as the
    flagship: one Arrow-vectorized signature pass, posexplode inverted
    index, broadcast bucket equi-join, candidates-only exact scoring.
    (The oracle spells the band join over all (vec, band) rows because
    DuckDB has no partitioned-index idiom — the Spark side is the real
    banded design.)
    """
    emb = _embeddings(spark, sf_dir)
    dim = len(emb.select("e").first()["e"])
    signed = emb.withColumn(
        "bands", _oracled_band_udf(dim)(F.col("e"))
    ).cache()
    buckets = signed.select(
        "vec_id", F.posexplode("bands").alias("band", "bval")
    )
    qvec = signed.filter(F.col("vec_id").isin(*_QUERY_VEC_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
        F.col("bands").alias("qbands"),
    )
    qbuckets = qvec.select(
        "query_id", F.posexplode("qbands").alias("band", "bval")
    )
    candidates = (
        buckets.join(F.broadcast(qbuckets), ["band", "bval"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        candidates.join(signed.select("vec_id", "e", "n"), "vec_id")
        .join(F.broadcast(qvec.select("query_id", "qe", "qn")), "query_id")
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


# Canonical gate names carry the md5 cross-engine plans (VERDICT r10 #3);
# the float/trained natives are the *_native functions above.
alias_query("q_sim_ann_lsh", "q_sim_ann_lsh_oracled")


def _anchor_assign_udf(dim: int, top: int):
    """Top-``top`` md5-anchor buckets per vector by int64 dot (dot desc,
    anchor id asc — stable argsort matches the SQL ROW_NUMBER order)."""
    from pyspark.sql.functions import pandas_udf

    A = _md5_matrix(["a"], _ORACLED_IVF_K, dim)  # k × dim

    @pandas_udf("array<int>")
    def nearest(col: pd.Series) -> pd.Series:
        Q = _quantize(np.stack(col.to_numpy()))
        dots = Q @ A.T  # batch × k, exact int64
        order = np.argsort(-dots, axis=1, kind="stable")[:, :top]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    return nearest


@query(
    "q_sim_ann_ivf_oracled",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id, e,
                 [CAST(FLOOR(x * {_Q_SCALE}) AS BIGINT) for x in e] AS qv
          FROM v),
    adots AS (
        SELECT q.vec_id, t.c AS anchor,
               LIST_SUM([{_lsh_weight_sql("'a:' || t.c", '(j - 1)')} * qv[j]
                         for j in RANGE(1, LEN(qv) + 1)]) AS dot
        FROM q, RANGE(0, {_ORACLED_IVF_K}) t(c)
    ),
    ranked AS (
        SELECT vec_id, anchor,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, anchor) AS rn
        FROM adots
    ),
    buckets AS (SELECT vec_id, anchor FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, anchor FROM ranked
               WHERE rn <= {_ORACLED_IVF_PROBES}
                 AND vec_id IN {_QUERY_VEC_IDS}),
    cand AS (
        SELECT DISTINCT p.query_id, b.vec_id
        FROM probes p JOIN buckets b ON b.anchor = p.anchor
        WHERE b.vec_id <> p.query_id
    ),
    scored AS (
        SELECT c.query_id, c.vec_id,
               CAST(ROUND({_SQL_COS.format(a='qq.e', b='dd.e')}, 8)
                    AS DECIMAL(38,8)) AS cosine
        FROM cand c
        JOIN v qq ON qq.vec_id = c.query_id
        JOIN v dd ON dd.vec_id = c.vec_id
    )
    SELECT query_id, vec_id, CAST(cosine AS VARCHAR) AS cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id) AS rn FROM scored)
    WHERE rn <= {_TOP_K}
    """,
)
def q_sim_ann_ivf_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF bucket-probe-rerank with a CROSS-ENGINE anchor family: bucket
    assignment is argmax over {_ORACLED_IVF_K} md5-derived integer anchor
    vectors (int64 dots on quantized embeddings — exact in both engines),
    queries probe their top-{_ORACLED_IVF_PROBES} anchors, candidates get
    the exact cosine re-rank. Hash-verifies the inverted-file pipeline
    end to end.

    The k-means flagship (``q_sim_ann_ivf``) stays the quality path —
    Lloyd-trained centroids cluster better than hash anchors — but its
    float centroid iteration is engine-local, capping its check at
    rows-only + the q_approx_audit recall contract. The pipeline under
    test here (partition-once by bucket, probe nprobe/k of the table,
    re-rank candidates only) is identical.
    """
    emb = _embeddings(spark, sf_dir)
    dim = len(emb.select("e").first()["e"])
    assigned = emb.select(
        "vec_id",
        "e",
        "n",
        _anchor_assign_udf(dim, 1)(F.col("e"))[0].alias("bucket"),
    )
    probes = (
        emb.filter(F.col("vec_id").isin(*_QUERY_VEC_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("n").alias("qn"),
            F.explode(
                _anchor_assign_udf(dim, _ORACLED_IVF_PROBES)(F.col("e"))
            ).alias("bucket"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


alias_query("q_sim_ann_ivf", "q_sim_ann_ivf_oracled")


_OPQ_M = 4        # subspaces (64-dim → 4 sub-vectors of 16 dims)
_OPQ_DSUB = 16
_OPQ_K = 16       # centroids per subspace
_OPQ_REFINE = 4   # shortlist = REFINE * k


def _opq_codebooks(dim: int) -> np.ndarray:
    """md5-derived integer codebooks, shape (M, K, d_sub) — the same
    cross-engine weight family as the hyperplanes/anchors, addressed as
    md5('pq:<m>:<k>:<j>')."""
    assert dim == _OPQ_M * _OPQ_DSUB
    return np.asarray(
        [
            [
                [_md5_weight("pq", m, k, j) for j in range(_OPQ_DSUB)]
                for k in range(_OPQ_K)
            ]
            for m in range(_OPQ_M)
        ],
        dtype=np.int64,
    )


def _opq_encode_udf(books: np.ndarray):
    """codes[m] = argmin_k ||qv_sub_m - C[m,k]||² on int64 — exact, ties
    to the lowest k (np.argmin takes the first minimum)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        Q = _quantize(np.stack(col.to_numpy())).reshape(
            -1, _OPQ_M, _OPQ_DSUB
        )  # batch × M × d
        # dists: batch × M × K
        d = ((Q[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
        codes = np.argmin(d, axis=2).astype(np.int32)
        return pd.Series([row.tolist() for row in codes])

    return enc


def _opq_weight_sql(m: str, k: str, j: str) -> str:
    return _lsh_weight_sql(f"'pq:' || {m} || ':' || {k}", j)


@query(
    "q_sim_ann_pq_oracled",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id, e,
                 [CAST(FLOOR(x * {_Q_SCALE}) AS BIGINT) for x in e] AS qv
          FROM v),
    dists AS (
        SELECT q.vec_id, t.m AS m, s.k AS k,
               LIST_SUM([(qv[t.m * {_OPQ_DSUB} + j]
                          - {_opq_weight_sql('t.m', 's.k', '(j - 1)')})
                         * (qv[t.m * {_OPQ_DSUB} + j]
                            - {_opq_weight_sql('t.m', 's.k', '(j - 1)')})
                         for j in RANGE(1, {_OPQ_DSUB} + 1)]) AS dist
        FROM q, RANGE(0, {_OPQ_M}) t(m), RANGE(0, {_OPQ_K}) s(k)
    ),
    codes AS (
        SELECT vec_id, m, k AS code
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                           ORDER BY dist, k) AS rn
              FROM dists)
        WHERE rn = 1
    ),
    adc AS (
        SELECT qq.vec_id AS query_id, c.vec_id,
               SUM(LIST_SUM([qq.qv[c.m * {_OPQ_DSUB} + j]
                             * {_opq_weight_sql('c.m', 'c.code', '(j - 1)')}
                             for j in RANGE(1, {_OPQ_DSUB} + 1)])) AS adc_ip
        FROM codes c
        JOIN q qq ON qq.vec_id IN {_QUERY_VEC_IDS}
        WHERE c.vec_id <> qq.vec_id
        GROUP BY qq.vec_id, c.vec_id
    ),
    shortlist AS (
        SELECT query_id, vec_id
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc_ip DESC, vec_id) AS arank FROM adc)
        WHERE arank <= {_OPQ_REFINE * _TOP_K}
    ),
    scored AS (
        SELECT s.query_id, s.vec_id,
               CAST(ROUND({_SQL_COS.format(a='qq.e', b='dd.e')}, 8)
                    AS DECIMAL(38,8)) AS cosine
        FROM shortlist s
        JOIN v qq ON qq.vec_id = s.query_id
        JOIN v dd ON dd.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, CAST(cosine AS VARCHAR) AS cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id) AS rn FROM scored)
    WHERE rn <= {_TOP_K}
    """,
)
def q_sim_ann_pq_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with a CROSS-ENGINE integer codebook: md5
    integer centroids per subspace, int64 argmin encoding, exact integer
    inner-product ADC, shortlist → exact cosine refine — the whole
    compress/score/refine pipeline hash-verifies against DuckDB.

    The trained flagship (``q_sim_ann_pq``, sample-trained float
    codebooks) stays the quality path with its recall audited by
    ``q_approx_audit``; this twin pins the PQ mechanics bit-for-bit.
    Plan shape matches the flagship: one Arrow encode pass producing the
    persisted code table, per-query integer LUT folded over codes as a
    built-in aggregate expression (no Python in scoring), ADC shortlist
    window, candidates-only exact re-rank.
    """
    emb = _embeddings(spark, sf_dir).cache()
    dim = len(emb.select("e").first()["e"])
    books = _opq_codebooks(dim)
    codes = emb.select(
        "vec_id", "n", _opq_encode_udf(books)(F.col("e")).alias("codes")
    )
    # per-query integer LUTs: lut[m*K + k] = <qv_sub_m, C[m,k]> (exact)
    qrows = (
        emb.filter(F.col("vec_id").isin(*_QUERY_VEC_IDS))
        .select("vec_id", "e", "n")
        .collect()
    )
    lut_rows = []
    for r in qrows:
        qv = np.floor(np.asarray(r.e, dtype=np.float64) * _Q_SCALE).astype(
            np.int64
        ).reshape(_OPQ_M, _OPQ_DSUB)
        lut = np.einsum("ms,mks->mk", qv, books).reshape(-1)
        lut_rows.append((r.vec_id, r.n, lut.tolist()))
    luts = local_df(spark, 
        lut_rows, "query_id long, qn double, lut array<long>"
    )
    adc = F.expr(
        f"aggregate(sequence(0, {_OPQ_M - 1}), CAST(0 AS BIGINT),"
        f" (acc, m) -> acc + lut[m * {_OPQ_K} + element_at(codes, m + 1)])"
    )
    approx = codes.join(
        F.broadcast(luts), F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id", adc.alias("adc_ip"))
    wa = W.partitionBy("query_id").orderBy(
        F.col("adc_ip").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        approx.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= _OPQ_REFINE * _TOP_K)
        .select("query_id", "vec_id")
    )
    qvec = emb.filter(F.col("vec_id").isin(*_QUERY_VEC_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
    )
    scored = (
        shortlist.join(emb.select("vec_id", "e", "n"), "vec_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "vec_id",
            _cos8()
            .cast("decimal(38,8)")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", canon("cosine").alias("cosine"), "rank")
    )


alias_query("q_sim_ann_pq", "q_sim_ann_pq_oracled")
