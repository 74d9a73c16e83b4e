"""Cross-structure audit of every approximate operator against its exact
twin, as ONE hash-verified query.

The engine's approximate family (banded LSH canonicalization, MinHash
band candidates, the incremental band index, IVF and PQ ANN) cannot be
hash-compared row-by-row against another engine — their outputs are
hash-layout/codebook-specific. What CAN be hash-verified is the
*contract*: each structure's recall/agreement against the exact operator
it replaces, computed in-plan on the same data. This query runs all five
audits and emits one verdict row per structure; the DuckDB oracle
reproduces the reference cardinalities exactly (vector count, exact
near-pair counts, query-set size) and asserts every verdict TRUE — so a
silent regression in ANY approximate structure flips a hash-checked
value in the driver gate.

Floors (all with ≥1-unit margin under the measured values on the fixture
corpora at sf0.001 and sf0.01; everything is deterministic for fixed
input — seeded hyperplanes, seeded hashes, driver-trained codebooks):

- embed-LSH canonicalization agreement: measured 1.00 → floor 0.95
- MinHash banded pair recall:           measured 1.00 → floor 0.90
- incremental band-index recall:        measured 1.00 → floor 0.90
- PQ per-query recall@10:   measured min 0.8 → floor 0.6 (6 of 10 hits)
- IVF per-query recall@10:  measured min 0.7 → floor 0.6
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import ORACLES, query

_EMBED_AGREE_FLOOR = 0.95
_PAIR_RECALL_FLOOR = 0.90
_ANN_MIN_HITS = 6  # of _TOP_K=10 → per-query recall floor 0.6


def _row(structure: str, n_ref, ok) -> DataFrame:
    return (
        F.lit(structure).alias("structure"),
        n_ref.cast("long").alias("n_reference"),
        ok.alias("ok"),
    )


@query(
    "q_approx_audit",
    oracle=f"""
    SELECT 'dedup_embed_lsh' AS structure,
           (SELECT COUNT(*) FROM embeddings) AS n_reference,
           TRUE AS ok
    UNION ALL
    SELECT 'dedup_minhash',
           (SELECT COUNT(*) FROM ({ORACLES["q_dedup_near"]})), TRUE
    UNION ALL
    SELECT 'dedup_incremental_lsh',
           (SELECT COUNT(*) FROM ({ORACLES["q_dedup_incremental"]})), TRUE
    UNION ALL
    SELECT 'sim_ann_ivf', 5, TRUE
    UNION ALL
    SELECT 'sim_ann_pq', 5, TRUE
    """,
)
def q_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per approximate structure: (structure, n_reference, ok).

    Expensive by design (runs exact twin + approximate structure for all
    five families) and gate-only — production monitoring would run each
    audit on a sample. Each audit is a join between two finished plans,
    so everything stays distributed; the final result is 5 rows.
    """
    from . import dedup, similarity

    # 1. embed-LSH canonicalization agreement vs exact all-pairs
    # (raw helpers, not the registered queries: the flagships were
    # converted hll-style in round 8 and now emit the exact values plus
    # their own verdicts — the audit must keep judging the RAW LSH path)
    emb = dedup._embed_vectors(spark, sf_dir).cache()
    exact_c = dedup.embed_exact_canonical(emb).select(
        "vec_id", F.col("canonical_id").alias("c_exact")
    )
    lsh_c = dedup.embed_lsh_canonical(emb).select(
        "vec_id", F.col("canonical_id").alias("c_lsh")
    )
    embed = exact_c.join(lsh_c, "vec_id").agg(
        *_row(
            "dedup_embed_lsh",
            F.count("*"),
            (
                F.avg((F.col("c_exact") == F.col("c_lsh")).cast("double"))
                >= _EMBED_AGREE_FLOOR
            ),
        )
    )

    # 2. MinHash banded candidates must recover the exact near-dup pairs
    near = dedup.q_dedup_near(spark, sf_dir).select("d1", "d2")
    # audit the NATIVE xxhash64 banding (the bench fast path) — the gate
    # name q_dedup_minhash is the md5 twin, already hash-verified directly
    banded = dedup.q_dedup_minhash_native(spark, sf_dir).select("d1", "d2")
    hits = near.join(banded, ["d1", "d2"], "left_semi").count()
    minhash = near.agg(
        *_row(
            "dedup_minhash",
            F.count("*"),
            (F.lit(hits) >= F.count("*") * _PAIR_RECALL_FLOOR),
        )
    )

    # 3. incremental band-index recall vs exact cross-set pairs
    inc_e = dedup.incremental_exact_pairs(spark, sf_dir).select(
        "new_id", "corpus_id"
    )
    inc_l = dedup.incremental_lsh_pairs(spark, sf_dir).select(
        "new_id", "corpus_id"
    )
    inc_hits = inc_e.join(inc_l, ["new_id", "corpus_id"], "left_semi").count()
    incremental = inc_e.agg(
        *_row(
            "dedup_incremental_lsh",
            F.count("*"),
            (F.lit(inc_hits) >= F.count("*") * _PAIR_RECALL_FLOOR),
        )
    )

    # 4+5. ANN recall@k per query for IVF and PQ vs exact brute force
    exact_tk = similarity.q_sim_topk(spark, sf_dir).select(
        "query_id", "vec_id"
    )

    def ann_audit(structure: str, approx: DataFrame) -> DataFrame:
        per_q = (
            exact_tk.join(
                approx.select("query_id", "vec_id"),
                ["query_id", "vec_id"],
                "left_semi",
            )
            .groupBy("query_id")
            .agg(F.count("*").alias("n_hits"))
        )
        return (
            exact_tk.select("query_id")
            .distinct()
            .join(per_q, "query_id", "left")
            .agg(
                *_row(
                    structure,
                    F.count("*"),
                    (
                        F.min(F.coalesce("n_hits", F.lit(0)))
                        >= _ANN_MIN_HITS
                    ),
                )
            )
        )

    ivf = ann_audit("sim_ann_ivf", similarity.q_sim_ann_ivf_native(spark, sf_dir))
    pq = ann_audit("sim_ann_pq", similarity.q_sim_ann_pq_native(spark, sf_dir))

    return embed.unionByName(minhash).unionByName(incremental).unionByName(
        ivf
    ).unionByName(pq)
