"""Embedding-column aggregate operators (SURVEY.md §2.4 extensions).

The similarity module (`operators/similarity.py`) covers *search* over the
embedding column; this module covers the *aggregate* shapes a training-data
pipeline runs over the same column:

- ``q_embed_centroids``: per-label mean vector — the one-pass "M step" of
  k-means / the class-prototype computation behind nearest-centroid
  classifiers and IVF coarse quantizers. Expressed as ``posexplode`` to
  (label, dim, value) rows and a keyed aggregation, so the shuffle key
  space is labels × dims (bounded, skew-free) and partial aggregation
  combines map-side regardless of corpus size. Returning long-format rows
  (label, dim, centroid) instead of re-assembled arrays keeps the result
  oracle-comparable and lets downstream consumers pivot as needed.
- ``q_embed_quantize``: per-vector symmetric int8 quantization (the
  standard ANN-index / activation-compression step): scale = amax/127,
  q_i = round(x_i/scale). Entirely row-local array math — no shuffle at
  all; at 100 TB this is a map-only stage limited by scan bandwidth. The
  result presents the quantization *summary* (scale, element sum, min,
  max of the int8 code vector) rather than 64 code columns.

Cross-engine float determinism (see ``functions/determinism``):
cross-row sums of float data are order-dependent in IEEE double, so
``q_embed_centroids`` converts each element to an exact fixed-point BIGINT
(``floor(v * 1e6 + 0.5)`` — identical single-rounding IEEE ops in both
engines) and sums integers (order-independent), then performs ONE double
division at the end. ``q_embed_quantize`` is row-local: every op is a
deterministic scalar function of one row's values, and integer folds over
the code array are exact.

Reference parity: the reference connector (`/root/reference/src/
pyspark_datasource/excel/connector.py`) has no vector operators at all;
these extend the engine for the embedding workloads described in the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.determinism import canon, dround, sql_canon, sql_dround
from ..plans.registry import query

#: fixed-point scale for order-independent centroid sums (6 decimals keeps
#: every float32 embedding value exactly representable in the BIGINT range:
#: |v| < 1 → |v * 1e6| < 2^20).
_FP = 1_000_000


@query(
    "q_embed_centroids",
    oracle=f"""
    WITH ex AS (
        SELECT label, g.i - 1 AS dim,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * {_FP} + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings,
             UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
    )
    SELECT label, CAST(dim AS INT) AS dim,
           COUNT(*) AS n_vectors,
           {sql_canon(sql_dround(f"CAST(SUM(vq) AS DOUBLE) / (COUNT(*) * {_FP}.0)", 9))} AS centroid
    FROM ex GROUP BY label, dim
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding in long format (label, dim, centroid).

    Plan shape: posexplode → partial+final HashAggregate keyed on
    (label, dim). Key cardinality is labels × dims (here 10 × 64),
    independent of corpus size, so the shuffle is tiny and skew-free at
    any scale; the explode itself is a codegen'd generator, no Python.
    Elements are fixed-pointed to BIGINT before the sum so the aggregate
    is order-independent across AQE plans; the sum itself accumulates in
    DECIMAL(38,0) to match DuckDB's HUGEINT promotion exactly (no int64
    wraparound at any corpus size), and the final double is presented via
    canon(dround(·, 9)) per the hash-gate convention.
    """
    emb = spread(table(spark, sf_dir, "embeddings"))
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    ).select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v") * _FP + F.lit(0.5)).cast("long").alias("vq"),
    )
    return ex.groupBy("label", "dim").agg(
        F.count("*").alias("n_vectors"),
        # sum in DECIMAL(38,0) (matches DuckDB's HUGEINT promotion exactly
        # — no int64 wraparound at any corpus size), ONE double division,
        # then the canon() string presentation the hash gate convention
        # expects for float aggregates
        canon(
            dround(
                F.sum(F.col("vq").cast("decimal(38,0)")).cast("double")
                / (F.count("*") * float(_FP)),
                9,
            )
        ).alias("centroid"),
    )


@query(
    "q_embed_quantize",
    oracle=f"""
    SELECT vec_id,
           {sql_canon(sql_dround("amax / 127.0", 9))} AS scale,
           CAST(LIST_SUM(LIST_TRANSFORM(e,
                x -> CAST(FLOOR(x / (amax / 127.0) + 0.5) AS BIGINT)))
                AS BIGINT) AS qsum,
           CAST(LIST_MIN(LIST_TRANSFORM(e,
                x -> CAST(FLOOR(x / (amax / 127.0) + 0.5) AS BIGINT)))
                AS BIGINT) AS qmin,
           CAST(LIST_MAX(LIST_TRANSFORM(e,
                x -> CAST(FLOOR(x / (amax / 127.0) + 0.5) AS BIGINT)))
                AS BIGINT) AS qmax
    FROM (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               LIST_MAX(LIST_TRANSFORM(embedding::DOUBLE[],
                        x -> ABS(x))) AS amax
        FROM embeddings
    )
    WHERE amax > 0
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization summary per vector: scale = amax/127,
    code_i = floor(x_i/scale + 0.5), reported as (scale, sum, min, max)
    of the code vector.

    Map-only — no shuffle, no Python: higher-order array functions
    (transform/aggregate/array_min/array_max) run JVM-side. ``scale`` is
    a single IEEE division of identical operands in both engines,
    presented via canon(dround(·, 9)) per the hash-gate convention for
    float outputs; the code elements are one division + one add + one
    floor each (identical rounding); integer folds are exact. The
    amax > 0 guard (mirrored in the oracle) excludes all-zero vectors
    from division rather than emitting engine-specific inf/NaN.
    """
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    amax = F.array_max(F.transform(F.col("e"), lambda v: F.abs(v)))
    with_scale = emb.withColumn("amax", amax).filter(F.col("amax") > 0)
    scale = F.col("amax") / F.lit(127.0)
    codes = F.transform(
        F.col("e"), lambda v: F.floor(v / scale + F.lit(0.5)).cast("long")
    )
    return with_scale.select(
        "vec_id",
        canon(dround(scale, 9)).alias("scale"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda acc, v: acc + v).alias(
            "qsum"
        ),
        F.array_min(codes).alias("qmin"),
        F.array_max(codes).alias("qmax"),
    )


@query(
    "q_embed_assign",
    oracle=f"""
    WITH ex AS (
        SELECT label, g.i - 1 AS dim,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * {_FP} + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings,
             UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
    ),
    cent AS (
        SELECT label,
               LIST(CAST(s AS DOUBLE) / (n * {_FP}.0) ORDER BY dim) AS c
        FROM (SELECT label, dim, SUM(vq) AS s, COUNT(*) AS n
              FROM ex GROUP BY label, dim)
        GROUP BY label
    ),
    scored AS (
        SELECT v.vec_id, c.label,
               CAST(FLOOR(LIST_SUM(LIST_TRANSFORM(
                        LIST_ZIP(v.e, c.c), t -> (t[1] - t[2]) * (t[1] - t[2])
                    )) * 1000000000 + 0.5) AS BIGINT) AS dist_fp
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) v
        CROSS JOIN cent c
    )
    SELECT vec_id,
           CAST(ARG_MIN(label, dist_fp * 100 + label) AS INT)
               AS assigned_label,
           CAST(MIN(dist_fp) AS BIGINT) AS dist_fp
    FROM scored GROUP BY vec_id
    """,
)
def q_embed_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step, completing
    ``q_embed_centroids``' M-step): every vector → the label whose mean
    embedding is closest in L2 — the semantic-sharding / cluster-balance
    primitive for training-data curation.

    Scale shape: the centroid table is labels × dims (tiny at any corpus
    size) and broadcasts; assignment is then a map-only stage — each
    vector folds one ordered zip-product per centroid, entirely inside
    codegen'd higher-order functions, no Python and no shuffle beyond
    the centroid aggregation itself. Determinism: centroid elements are
    one exact-integer division each (fixed-point sums, same as the
    M-step); the distance fold runs in array order in both engines (the
    ``_SQL_COS`` precedent), so dist² is bit-identical; the argmin packs
    (dist_fp, label) into one integer so ties break identically.
    """
    emb = spread(table(spark, sf_dir, "embeddings"))
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("v") * _FP + F.lit(0.5)).cast("long").alias("vq"),
    )
    cent = (
        ex.groupBy("label", "dim")
        .agg(F.sum(F.col("vq").cast("decimal(38,0)")).alias("s"), F.count("*").alias("n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("dim"),
                            (F.col("s").cast("double") / (F.col("n") * float(_FP))).alias("c"),
                        )
                    )
                ),
                lambda t: t["c"],
            ).alias("c")
        )
    )
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    dist2 = F.aggregate(
        F.zip_with(F.col("e"), F.col("c"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        F.floor(dist2 * F.lit(1_000_000_000) + F.lit(0.5))
        .cast("long")
        .alias("dist_fp"),
    )
    return scored.groupBy("vec_id").agg(
        F.min_by("label", F.col("dist_fp") * 100 + F.col("label"))
        .cast("int")
        .alias("assigned_label"),
        F.min("dist_fp").alias("dist_fp"),
    )


@query(
    "q_embed_norm",
    oracle=f"""
    WITH ex AS (
        SELECT g.i - 1 AS dim,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * {_FP} + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings,
             UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
    ),
    stats AS (
        SELECT dim, COUNT(*) AS n, SUM(vq) AS s, SUM(vq * vq) AS s2
        FROM ex GROUP BY dim
    ),
    solved AS (
        SELECT dim, n,
               CAST(s AS DOUBLE) / (n * {_FP}.0) AS mean,
               SQRT(CAST(s2 AS DOUBLE) / n / ({_FP}.0 * {_FP}.0)
                    - (CAST(s AS DOUBLE) / (n * {_FP}.0))
                      * (CAST(s AS DOUBLE) / (n * {_FP}.0))) AS std
        FROM stats
    )
    SELECT e.dim::INT AS dim, CAST(t.n AS BIGINT) AS n,
           {sql_canon(sql_dround("ANY_VALUE(t.mean)", 9))} AS mean,
           {sql_canon(sql_dround("ANY_VALUE(t.std)", 9))} AS std,
           CAST(SUM(CASE WHEN ABS(CAST(e.vq AS DOUBLE) / {_FP}.0 - t.mean)
                              > 3 * t.std THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM ex e JOIN solved t ON e.dim = t.dim
    GROUP BY e.dim, t.n
    """,
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus standardization statistics for the embedding
    column — mean, std, and 3-sigma outlier-element count per dimension
    — the whitening/feature-health pass run before embedding-space
    dedup or ANN indexing trusts distances.

    Two passes over the exploded elements: (1) per-dim moment
    aggregation on exact fixed-point integers (sum and sum-of-squares
    accumulate in DECIMAL(38,0)/HUGEINT — order-independent, no
    wraparound at any corpus size; key space = dims, bounded and
    skew-free); (2) the 64-row stats table broadcasts back onto the
    elements for the outlier census — a map-side join, no second
    shuffle beyond the per-dim re-count. mean/std/|v−mean| are computed
    by the identical operand-order IEEE expression in both engines, so
    the 3σ comparisons classify identically; presentation is
    canon(dround(·, 9)) per the hash convention.
    """
    return embed_norm_stats(spread(table(spark, sf_dir, "embeddings")))


def embed_norm_stats(emb: DataFrame) -> DataFrame:
    """Per-dim standardization plan over an embeddings frame (shared with
    ``tools/scale_stress.py``)."""
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    ).select(
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v") * _FP + F.lit(0.5)).cast("long").alias("vq"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    # operand order mirrors the oracle exactly: mean = s / (n * FP),
    # std = sqrt(s2 / n / FP² − mean²) — same IEEE ops, same order
    mean = dec(F.col("vq")) / (F.count("*") * float(_FP))
    stats = ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        mean.alias("mean"),
        F.sqrt(
            dec(F.col("vq") * F.col("vq")) / F.count("*") / (float(_FP) * float(_FP))
            - mean * mean
        ).alias("std"),
    )
    joined = ex.join(F.broadcast(stats), "dim")
    is_out = F.abs(F.col("vq").cast("double") / float(_FP) - F.col("mean")) > (
        3 * F.col("std")
    )
    return joined.groupBy("dim", "n").agg(
        canon(dround(F.first("mean"), 9)).alias("mean"),
        canon(dround(F.first("std"), 9)).alias("std"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
    ).select("dim", F.col("n").cast("long").alias("n"), "mean", "std", "n_outliers")


def _centroid_arrays(grouped: DataFrame, key: str) -> DataFrame:
    """(key, dim, s DECIMAL, n) → (key, c: array<double>) with the array
    assembled in dim order and each element the ONE exact-integer-sum
    division both engines share (the ``q_embed_assign`` discipline)."""
    return grouped.groupBy(key).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim"),
                        (
                            F.col("s").cast("double") / (F.col("n") * float(_FP))
                        ).alias("c"),
                    )
                )
            ),
            lambda t: t["c"],
        ).alias("c")
    )


def _assign_step(v: DataFrame, cent: DataFrame, key: str) -> DataFrame:
    """E-step: nearest centroid per vector with the packed-integer argmin
    tiebreak; cent is (key, c) and broadcasts (k × dims, tiny)."""
    dist2 = F.aggregate(
        F.zip_with(F.col("e"), F.col("c"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col(key).alias("k"),
        F.floor(dist2 * F.lit(1_000_000_000) + F.lit(0.5))
        .cast("long")
        .alias("dist_fp"),
    )
    return scored.groupBy("vec_id").agg(
        F.min_by("k", F.col("dist_fp") * 100 + F.col("k")).alias("k"),
        F.min("dist_fp").alias("dist_fp"),
    )


_KMEANS_SCORED = """
        SELECT v.vec_id, c.{key} AS k,
               CAST(FLOOR(LIST_SUM(LIST_TRANSFORM(
                        LIST_ZIP(v.e, c.c), t -> (t[1] - t[2]) * (t[1] - t[2])
                    )) * 1000000000 + 0.5) AS BIGINT) AS dist_fp
        FROM vv v CROSS JOIN {cent} c"""


@query(
    "q_kmeans_lloyd",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, g.i - 1 AS dim,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * {_FP} + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings,
             UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
    ),
    vv AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent0 AS (
        SELECT label, LIST(CAST(s AS DOUBLE) / (n * {_FP}.0) ORDER BY dim) AS c
        FROM (SELECT label, dim, SUM(vq) AS s, COUNT(*) AS n
              FROM ex GROUP BY label, dim)
        GROUP BY label
    ),
    scored0 AS ({_KMEANS_SCORED.format(key="label", cent="cent0")}),
    a0 AS (
        SELECT vec_id, ARG_MIN(k, dist_fp * 100 + k) AS k0
        FROM scored0 GROUP BY vec_id
    ),
    cent1 AS (
        SELECT k0, LIST(CAST(s AS DOUBLE) / (n * {_FP}.0) ORDER BY dim) AS c
        FROM (SELECT a.k0, e.dim, SUM(e.vq) AS s, COUNT(*) AS n
              FROM a0 a JOIN ex e ON a.vec_id = e.vec_id
              GROUP BY a.k0, e.dim)
        GROUP BY k0
    ),
    scored1 AS ({_KMEANS_SCORED.format(key="k0", cent="cent1")}),
    a1 AS (
        SELECT vec_id, ARG_MIN(k, dist_fp * 100 + k) AS k1,
               MIN(dist_fp) AS dist_fp
        FROM scored1 GROUP BY vec_id
    )
    SELECT a1.vec_id,
           CAST(a1.k1 AS INT) AS label_final,
           CAST(a1.dist_fp AS BIGINT) AS dist_fp,
           CAST(CASE WHEN a1.k1 <> a0.k0 THEN 1 ELSE 0 END AS INT) AS moved
    FROM a1 JOIN a0 ON a1.vec_id = a0.vec_id
    """,
)
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd iterations of k-means over the embedding column —
    E-step (nearest centroid), M-step (recompute means over the NEW
    assignments), E-step again — seeded from the per-label means so the
    whole loop is deterministic with no RNG. The semantic-clustering
    refinement pass a curation pipeline runs after a coarse label
    assignment; ``moved`` marks vectors whose cluster changed between
    iterations (the convergence signal production loops watch).

    Scale shape per iteration: the centroid table is k × dims (tiny at
    any corpus size) and broadcasts; assignment is map-only inside
    codegen'd higher-order functions; the M-step is one posexplode +
    (cluster, dim)-keyed partial+final aggregate — bounded, skew-free
    keys. Bit-exact cross-engine via the module's fixed-point
    discipline: integer element sums (DECIMAL(38,0)/HUGEINT), ONE
    double division per centroid element, array-ordered distance folds,
    packed-integer argmin tiebreaks.
    """
    emb = spread(table(spark, sf_dir, "embeddings"))
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).cache()
    exv = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("val") * _FP + F.lit(0.5)).cast("long").alias("vq"),
    ).cache()
    dec_sum = F.sum(F.col("vq").cast("decimal(38,0)")).alias("s")
    cent0 = _centroid_arrays(
        exv.groupBy(F.col("label"), F.col("dim")).agg(
            dec_sum, F.count("*").alias("n")
        ),
        "label",
    )
    a0 = _assign_step(v, cent0, "label").select(
        "vec_id", F.col("k").alias("k0")
    )
    cent1 = _centroid_arrays(
        a0.join(exv.drop("label"), "vec_id")
        .groupBy(F.col("k0"), F.col("dim"))
        .agg(dec_sum, F.count("*").alias("n")),
        "k0",
    )
    a1 = _assign_step(v, cent1, "k0")
    return a1.join(a0, "vec_id").select(
        "vec_id",
        F.col("k").cast("int").alias("label_final"),
        F.col("dist_fp"),
        F.when(F.col("k") != F.col("k0"), 1).otherwise(0).cast("int").alias(
            "moved"
        ),
    )


# ---------------------------------------------------------------------------
# PCA top component by power iteration (whitening/OPQ preprocessing)
# ---------------------------------------------------------------------------

_PCA_ITERS = 3

_PCA_IT_SQL = """
    w{r} AS (
        SELECT cf.i AS dim,
               LIST_SUM(LIST(cf.c * v.v ORDER BY cf.j)) AS w
        FROM covf cf JOIN v{p} v ON cf.j = v.dim GROUP BY cf.i
    ),
    n{r} AS (SELECT SQRT(LIST_SUM(LIST(w * w ORDER BY dim))) AS nrm
             FROM w{r}),
    v{r} AS (SELECT dim, w / n.nrm AS v FROM w{r}, n{r} n)"""


def _ofold(key, term):
    """Order-canonical double fold: sort (key, term) structs by key, then
    a sequential left-fold sum — the ``q_text_lm_score`` convention that
    makes cross-row float sums bit-equal to DuckDB's
    ``LIST_SUM(LIST(term ORDER BY key))``."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key, term.alias("t")))),
            lambda s: s["t"],
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


@query(
    "q_embed_pca_power",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, g.i - 1 AS dim,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * {_FP} + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings,
             UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
    ),
    pairs AS (
        SELECT a.dim AS i, b.dim AS j,
               SUM(a.vq * b.vq) AS sp, COUNT(*) AS n
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    ),
    means AS (SELECT dim, SUM(vq) AS s, COUNT(*) AS n FROM ex GROUP BY dim),
    cov AS (
        SELECT p.i, p.j,
               CAST(p.sp AS DOUBLE) / p.n / ({_FP}.0 * {_FP}.0)
               - (CAST(mi.s AS DOUBLE) / mi.n / {_FP}.0)
                 * (CAST(mj.s AS DOUBLE) / mj.n / {_FP}.0) AS c
        FROM pairs p
        JOIN means mi ON p.i = mi.dim
        JOIN means mj ON p.j = mj.dim
    ),
    covf AS (
        SELECT i, j, c FROM cov
        UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i <> j
    ),
    v0 AS (SELECT DISTINCT i AS dim, 1.0 AS v FROM covf),
    {",".join(_PCA_IT_SQL.format(r=r, p=r - 1).lstrip() for r in range(1, _PCA_ITERS + 1))},
    lamw AS (
        SELECT cf.i AS dim, LIST_SUM(LIST(cf.c * v.v ORDER BY cf.j)) AS w
        FROM covf cf JOIN v{_PCA_ITERS} v ON cf.j = v.dim GROUP BY cf.i
    ),
    lam AS (
        SELECT LIST_SUM(LIST(v.v * w.w ORDER BY v.dim)) AS lam
        FROM v{_PCA_ITERS} v JOIN lamw w ON v.dim = w.dim
    ),
    tr AS (SELECT LIST_SUM(LIST(c ORDER BY i)) AS tr FROM cov WHERE i = j)
    SELECT v.dim::INT AS dim,
           {sql_canon(sql_dround("v.v", 6))} AS loading,
           {sql_canon(sql_dround("lam.lam", 6))} AS eigenvalue,
           {sql_canon(sql_dround("lam.lam / tr.tr", 6))} AS var_share
    FROM v{_PCA_ITERS} v, lam, tr
    """,
)
def q_embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by {_PCA_ITERS}
    power-iteration steps over the exact covariance matrix — the
    whitening / OPQ-rotation preprocessing an ANN index runs before
    trusting inner products. Returns one row per dimension: the
    component loading, the Rayleigh-quotient eigenvalue, and the
    explained-variance share (eigenvalue / trace).

    Scale shape: covariance sufficient statistics are ONE pass — each
    vector expands to its d(d+1)/2 upper-triangle fixed-point products
    (map-side partial aggregation collapses them to the d² key space
    immediately, so the shuffle is bounded by dims², never rows), and
    the mean cross-terms are subtracted AFTER aggregation, exact-int
    moments in, fixed double tree out. The power iteration then runs
    entirely on the d²-row covariance frame: each step is one broadcast
    join + one d-key aggregation with order-canonical folds (the
    ``q_text_lm_score`` convention), so every float sum is bit-equal to
    the oracle's LIST_SUM spelling. No row-scale data is ever touched
    after the first pass; at 100 TB the first pass IS the job, and it
    is embarrassingly parallel. Spelling note: moments divide by n
    BEFORE the fixed-point descale (sp/n/FP²), so nothing overflows
    double precision at any corpus size."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    vq = (
        "CAST(FLOOR(CAST(embedding[{{k}}] AS DOUBLE) * {fp} + 0.5)"
        " AS BIGINT)"
    ).format(fp=_FP)
    pairs = emb.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(embedding) - 1), i -> "
                "transform(sequence(i, size(embedding) - 1), j -> "
                "struct(i, j, " + vq.format(k="i") + " * "
                + vq.format(k="j") + " AS p))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.p")
    moments = pairs.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("sp"),
        F.count("*").alias("n"),
    )
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    ).select(
        "dim", F.floor(F.col("v") * _FP + F.lit(0.5)).cast("long").alias("vq")
    )
    means = ex.groupBy("dim").agg(
        F.sum(F.col("vq").cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    )
    mean_of = lambda s, n: F.col(s).cast("double") / F.col(n) / float(_FP)  # noqa: E731
    cov = (
        moments.join(
            F.broadcast(
                means.select(
                    F.col("dim").alias("i"),
                    F.col("s").alias("si"),
                    F.col("n").alias("ni"),
                )
            ),
            "i",
        )
        .join(
            F.broadcast(
                means.select(
                    F.col("dim").alias("j"),
                    F.col("s").alias("sj"),
                    F.col("n").alias("nj"),
                )
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("sp").cast("double") / F.col("n") / (float(_FP) * float(_FP))
                - mean_of("si", "ni") * mean_of("sj", "nj")
            ).alias("c"),
        )
    )
    covf = cov.select("i", "j", "c").unionByName(
        cov.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    ).localCheckpoint()  # d^2 rows; reused by every iteration + trace

    def matvec(v: DataFrame) -> DataFrame:
        term = (F.col("c") * F.col("v")).alias("t")
        return (
            covf.join(F.broadcast(v), covf.j == v.dim)
            .select("i", "j", term)
            .groupBy("i")
            .agg(_ofold(F.col("j"), F.col("t")).alias("w"))
            .select(F.col("i").alias("dim"), "w")
        )

    v = covf.select("i").distinct().select(
        F.col("i").alias("dim"), F.lit(1.0).alias("v")
    )
    for _ in range(_PCA_ITERS):
        # localCheckpoint (64 rows, eager): w feeds BOTH the norm and
        # the update, so without truncation the iteration subtree
        # doubles per round (the kcore_peel discipline)
        w = matvec(v).localCheckpoint()
        nrm = w.agg(
            F.sqrt(_ofold(F.col("dim"), (F.col("w") * F.col("w")).alias("t")))
            .alias("nrm")
        )
        v = w.crossJoin(F.broadcast(nrm)).select(
            "dim", (F.col("w") / F.col("nrm")).alias("v")
        )
    lamw = matvec(v)
    lam = (
        v.join(lamw.select(F.col("dim"), F.col("w")), "dim")
        .agg(_ofold(F.col("dim"), (F.col("v") * F.col("w")).alias("t")).alias("lam"))
    )
    # trace from the CHECKPOINTED covf (diagonal appears exactly once
    # there) — reading it off `cov` would re-execute the whole row-scale
    # moments pass a second time
    tr = covf.filter(F.col("i") == F.col("j")).agg(
        _ofold(F.col("i"), F.col("c").alias("t")).alias("tr")
    )
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("dim").cast("int").alias("dim"),
            canon(dround(F.col("v"), 6)).alias("loading"),
            canon(dround(F.col("lam"), 6)).alias("eigenvalue"),
            canon(dround(F.col("lam") / F.col("tr"), 6)).alias("var_share"),
        )
    )


@query(
    "q_embed_quantize_int8",
    oracle="""
    WITH arrs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS arr FROM embeddings
    ), ex AS (
        SELECT vec_id,
               UNNEST(arr) AS x,
               UNNEST(generate_series(1, len(arr))) AS dim
        FROM arrs
    ), sc AS (
        SELECT dim, MAX(ABS(x)) / 127.0 AS scale FROM ex GROUP BY dim
    ), q AS (
        SELECT e.dim, e.x, s.scale,
               CASE WHEN s.scale = 0.0 THEN 0.0
                    ELSE FLOOR(e.x / s.scale + 0.5) END AS qv
        FROM ex e JOIN sc s ON e.dim = s.dim
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           CAST(FLOOR(MIN(scale) * 1000000000.0 + 0.5) AS BIGINT)
               AS scale_fp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ABS(qv) AS BIGINT)) AS BIGINT) AS sum_qabs,
           CAST(SUM(CAST(FLOOR(((x - (qv * scale)) * (x - (qv * scale)))
                * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sse_fp
    FROM q
    GROUP BY dim
    """,
)
def q_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension symmetric INT8 quantization of the embedding table —
    the compression step ANN serving stacks apply before indexing (4x
    smaller vectors, SIMD-dot-product-ready): scale_d = max|x_d|/127,
    code = FLOOR(x/scale + 0.5) (our fixed quantizer spelling — no
    engine-dependent ROUND-half behavior), guaranteed in [-127, 127] by
    the scale construction. Reports per-dimension scale, total code
    magnitude, and the exact-integer SSE of reconstruction — the
    quality census a pipeline gates on before swapping fp32 for int8.

    Determinism: the scale is MAX-derived (order-independent), x/scale
    and the reconstruction error are IEEE-exact identical expressions,
    and both reported sums quantize per row to BIGINT before summing.

    Plan shape: one posexplode pass → per-dim MAX (64-key aggregate,
    broadcast back) → one more pass for codes/errors → 64-row result.
    Two corpus passes total, both map-side combined; at 100 TB the
    broadcast is dims-bounded and nothing row-scale shuffles.
    """
    ex = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "x"
        ),
    ).select((F.col("dim0") + 1).alias("dim"), "x")
    sc = ex.groupBy("dim").agg(
        (F.max(F.abs(F.col("x"))) / 127.0).alias("scale")
    )
    q = ex.join(F.broadcast(sc), "dim").select(
        "dim",
        "x",
        "scale",
        F.when(F.col("scale") == 0.0, F.lit(0.0))
        .otherwise(F.floor(F.col("x") / F.col("scale") + F.lit(0.5)))
        .alias("qv"),
    )
    err = (F.col("x") - (F.col("qv") * F.col("scale")))
    return q.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.floor(F.min("scale") * 1_000_000_000.0 + F.lit(0.5))
        .cast("long")
        .alias("scale_fp"),
        F.count("*").cast("long").alias("n"),
        F.sum(F.abs(F.col("qv")).cast("long")).cast("long").alias("sum_qabs"),
        F.sum(
            F.floor((err * err) * 1_000_000_000_000.0 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("sse_fp"),
    )
