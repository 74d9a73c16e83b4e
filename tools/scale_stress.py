#!/usr/bin/env python
"""Scale-stress: run the headline plan shapes on 10x-replicated lineitem
(~6M rows) and compare per-row throughput against sf0.1 (~600k rows).

A plan that 'survives scale' keeps throughput roughly flat as input grows
(work is O(n) with constant shuffle structure). Replication happens in the
plan (explode over a sequence), so no data is written anywhere.

Usage: python tools/scale_stress.py [shape_name ...]
(no args = all shapes; names filter for budgeted runs)

Env overrides: STRESS_SF (base dataset dir, default sf0.1) and
STRESS_FACTOR (replication factor, default 10) — e.g. the round-7
100x point runs STRESS_SF=/root/testdata/sf0.001 STRESS_FACTOR=100.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.catalog import table
from pyspark_excel_datasource_spark.functions.determinism import davg, dsum
from pyspark_excel_datasource_spark.session import get_session

SF = os.environ.get("STRESS_SF", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("STRESS_FACTOR", "10"))


#: STRESS_SPREAD=1 repartitions the base frame to cluster width BEFORE
#: the in-plan replication explode. Without it the replicated rows are
#: generated inside the base scan's ~5 input splits, so the whole
#: scaled workload runs at parallelism ≈ input-file splits REGARDLESS
#: of core count (observed r15: flagship_agg at 30x measured 11.1s on
#: 32 cores vs 12.2s on 8 — a harness artifact, not a plan property).
#: Default off to keep the historical throughput-ratio numbers
#: comparable; turn on for core-scaling measurements.
SPREAD = os.environ.get("STRESS_SPREAD", "0") == "1"


def _maybe_spread(df):
    if not SPREAD:
        return df
    from pyspark_excel_datasource_spark.catalog import spread

    return spread(df)


def replicate(df, n: int):
    """n logical copies; replica id folded into the orderkey so join/group
    cardinalities scale realistically instead of creating n-way dup keys."""
    return (
        _maybe_spread(df)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn(
            "l_orderkey", F.col("l_orderkey") * n + F.col("rep")
        )
        .drop("rep")
    )


def flagship(li):
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 0).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            davg("l_extendedprice", 2).alias("avg_price"),
            F.count("*").alias("n"),
        )
    )


def window_frame(li):
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        F.sum(F.col("l_quantity").cast("decimal(18,0)")).over(w).alias("run"),
    )


def join_agg(li, orders):
    return (
        li.join(orders.hint("shuffle_merge"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice", 2).alias("v"))
    )


def replicate_docs(docs, n: int):
    """n decorrelated copies: each replica prefixes every token with its
    replica id, so replicas share NO shingles across copies (near-dup
    structure is preserved within each copy, corpus density stays flat —
    the honest way to 10× a dedup workload)."""
    return (
        _maybe_spread(docs)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn("doc_id", F.col("doc_id") * n + F.col("rep"))
        .withColumn(
            "text",
            F.regexp_replace(
                F.col("text"), " ", F.concat(F.lit(" "), F.col("rep"), F.lit("_"))
            ),
        )
        .drop("rep")
    )


def replicate_docs_chars(docs, n: int):
    """Character-level decorrelation for char-gram workloads: each replica
    rotates the alphabet by its replica id, so replicas share (almost) NO
    character n-grams. The word-prefix trick of ``replicate_docs`` is NOT
    enough here — char grams live inside words, so prefixed replicas still
    share their posting lists and the inverted-index self-join would grow
    ~n² instead of ~n (a replication artifact, not an operator property)."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rotated = F.lit(None).cast("string")
    expr = None
    out = _maybe_spread(docs).withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    ).withColumn("doc_id", F.col("doc_id") * n + F.col("rep"))
    for r in range(n):
        rot = alpha[r:] + alpha[:r]
        branch = F.translate(F.col("text"), alpha, rot)
        expr = F.when(F.col("rep") == r, branch) if expr is None else expr.when(
            F.col("rep") == r, branch
        )
    return out.withColumn("text", expr).drop("rep")


def replicate_vecs(vecs, n: int):
    """n near-identical copies with a deterministic per-replica nudge on
    one dimension — bucket density grows linearly, not degenerately."""
    return (
        _maybe_spread(vecs)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn("vec_id", F.col("vec_id") * n + F.col("rep"))
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda v, i: F.when(
                    i == 0, v + F.col("rep").cast("float") * F.lit(0.01)
                ).otherwise(v),
            ),
        )
        .drop("rep")
    )


def replicate_events(ev, n: int):
    """n copies with per-replica user ids: sessions-per-user and events-
    per-user stay constant while the user population grows 10× — the
    honest way to scale a per-user-window workload (hot keys don't get
    hotter, there are just more of them)."""
    return (
        _maybe_spread(ev)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn("user_id", F.col("user_id") * n + F.col("rep"))
        .withColumn("event_id", F.col("event_id") * n + F.col("rep"))
        .drop("rep")
    )


def url_dedup(docs):
    """Same plan as q_dedup_url: codegen'd URL build + canonicalize at
    the scan, one canonical-string-key groupBy."""
    url = F.concat(
        F.lit("https://"),
        F.upper("source"),
        F.lit(".Example.COM/"),
        F.col("lang"),
        F.lit("/doc/"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("&ref=rss#sec-"),
        (F.col("doc_id") % 5).cast("string"),
    )
    canonical = F.concat(
        F.lit("https://"),
        F.lower(F.parse_url(url, F.lit("HOST"))),
        F.parse_url(url, F.lit("PATH")),
        F.lit("?id="),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")),
    )
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
    )


def q18_semi(li, orders):
    """Same plan as q_tpch_q18ish minus the customer leg: lineitem
    pre-agg + HAVING drives a join back into orders."""
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,0)")).alias("tq"))
        .filter(F.col("tq") > 300)
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_totalprice", "tq"
    )


def timed(name, df):
    t0 = time.perf_counter()
    if callable(df):
        # eager operators (driver-side iteration with localCheckpoint,
        # e.g. connected components) — build + execute inside the timing
        df = df()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark_excel_datasource_spark.operators.dedup import (
        minhash_pairs,
        substring_spans,
    )
    from pyspark_excel_datasource_spark.operators.similarity import (
        _norm,
        ann_lsh_topk,
        pq_topk,
    )

    spark = get_session("scale-stress")
    li1 = table(spark, SF, "lineitem")
    orders1 = table(spark, SF, "orders")
    n1 = li1.count()
    li10 = replicate(li1, FACTOR)
    orders10 = (
        _maybe_spread(orders1)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
        .withColumn("o_orderkey", F.col("o_orderkey") * FACTOR + F.col("rep"))
        .drop("rep")
    )
    docs1 = table(spark, SF, "documents").select("doc_id", "text")
    docs10 = replicate_docs(docs1, FACTOR)

    def emb_frame(vecs):
        out = vecs.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        return out.withColumn("n", _norm(F.col("e")))

    vecs1 = table(spark, SF, "embeddings")
    emb1 = emb_frame(vecs1)
    emb10 = emb_frame(replicate_vecs(vecs1, FACTOR))
    qids1 = [0, 1, 2, 3, 4]
    # replicated ids: original query vec v becomes v*FACTOR (replica 0)
    qids10 = [q * FACTOR for q in qids1]

    from pyspark_excel_datasource_spark.operators.analytics import (
        funnel_counts,
        sessionize,
    )

    ev1 = table(spark, SF, "events")
    ev10 = replicate_events(ev1, FACTOR)

    def asof_range(ev):
        # round-13: the bounded-range as-of spelling
        # (q_join_asof_backward_tolerance). Per-replica user ids keep
        # clicks-per-user-hour constant, so the join fan-out — bounded
        # by that density — must scale linearly with the population.
        p = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
        joined = p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") < F.col("ts"))
            & (
                F.col("c_ts")
                >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
            ),
            "left",
        )
        return joined.groupBy("event_id", "user_id", "ts").agg(
            F.max("c_ts").alias("click_within_1h")
        )

    from pyspark_excel_datasource_spark.operators.scale import bloom_semi_join

    cust_dim = (
        table(spark, SF, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey")
    )

    def bloom_agg(spark_, fact, dim):
        # the 10x side replicates orders but keeps the SAME dim: the
        # bloom (8 KiB, built once from the dim) prunes 10x the fact
        # rows map-side — per-row probe cost must stay flat
        out = bloom_semi_join(fact, dim, "o_custkey", "c_custkey")
        return out.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), dsum("o_totalprice", 2).alias("v")
        )

    from pyspark_excel_datasource_spark.operators.corpus import (
        topic_cooccur,
        vocab_coverage,
    )
    from pyspark_excel_datasource_spark.operators.dedup import chargram_pairs
    from pyspark_excel_datasource_spark.operators.multimodal import (
        chunk_census,
        payload_dedup,
    )
    from pyspark_excel_datasource_spark.operators.scale import interval_overlap

    docs_full1 = table(spark, SF, "documents")
    docs_full10 = replicate_docs(
        docs_full1.select("doc_id", "text", "source", "lang", "n_chars"), FACTOR
    )

    # round-8: naive Bayes train+score — token prefixes make replica
    # vocabularies disjoint, so model size AND token stream both grow
    # linearly (the harsher variant of real vocab saturation)
    from pyspark_excel_datasource_spark.operators.ml import nb_predictions

    def nb_shape(docs):
        return nb_predictions(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ).agg(F.count("*").alias("n"), F.sum("correct").alias("n_correct"))

    # round-8: KMV/theta sketch build — TakeOrdered(k) over a distinct
    # key stream whose cardinality grows linearly (replica-salted keys)
    def cust_keys(orders, n):
        out = orders.filter(F.col("o_orderstatus").isin("F", "O"))
        if n > 1:
            out = out.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
            ).withColumn(
                "o_custkey", F.col("o_custkey") * n + F.col("rep")
            )
        return out.select(
            F.conv(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("h")
        ).distinct()

    def theta_union(keys):
        ku = keys.orderBy("h").limit(128)
        return ku.agg(F.count("*").alias("nu"), F.max("h").alias("mhu"))

    from pyspark_excel_datasource_spark.operators.scale import (
        spatial_neighbor_pairs,
        spatial_points,
    )

    from pyspark_excel_datasource_spark.operators.analytics import (
        lateness_audit,
        market_basket,
        pit_join,
        rolling_dau,
    )
    from pyspark_excel_datasource_spark.operators.extras import weighted_median
    from pyspark_excel_datasource_spark.operators.relational import asof_nearest
    from pyspark_excel_datasource_spark.operators.text import (
        inverted_index,
        strip_boilerplate,
    )
    from pyspark_excel_datasource_spark.operators.corpus import bpe_encode
    from pyspark_excel_datasource_spark.operators.dedup import cross_source_census
    from pyspark_excel_datasource_spark.operators.pipeline import (
        curriculum_schedule,
        quantile_normalize,
        skyline_select,
    )
    from pyspark_excel_datasource_spark.operators.vectors import embed_norm_stats

    cust_all1 = table(spark, SF, "customer")
    spatial_pts10 = spatial_points(cust_all1).withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1)))
    ).select(
        (F.col("pid") * FACTOR + F.col("rep")).alias("pid"),
        (F.col("xi") + F.col("rep") * 10000).alias("xi"),
        "yi",
    )

    from pyspark_excel_datasource_spark.operators.graph import (
        connected_components_star,
        copurchase_edges,
        pagerank,
        triangle_counts,
    )

    def _cc(edges):
        return connected_components_star(edges)

    # graph replication: entity keys carry the replica id so each replica
    # is a disjoint subgraph (disjoint union = linear growth in nodes,
    # edges, AND triangles — the right null model for throughput checks)
    li_g1 = li1.select("l_orderkey", "l_suppkey", "l_partkey")
    orders_g1 = orders1.select("o_orderkey", "o_custkey")
    li_g10 = (
        li1.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
        .select(
            (F.col("l_orderkey") * FACTOR + F.col("rep")).alias("l_orderkey"),
            (F.col("l_suppkey") * FACTOR + F.col("rep")).alias("l_suppkey"),
            (F.col("l_partkey") * FACTOR + F.col("rep")).alias("l_partkey"),
        )
    )
    orders_g10 = (
        orders1.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
        .select(
            (F.col("o_orderkey") * FACTOR + F.col("rep")).alias("o_orderkey"),
            (F.col("o_custkey") * FACTOR + F.col("rep")).alias("o_custkey"),
        )
    )

    # round-9: the banded global-rank machinery (exact NTILE without a
    # single-task sort) — rank axis rows grow linearly with the fact
    from pyspark_excel_datasource_spark.operators.banding import (
        banded_row_number,
        ntile_expr,
    )

    def banded_ntile(li):
        ranked = banded_row_number(
            li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
            F.floor(F.col("l_extendedprice") / 1000.0).cast("long"),
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
        )
        return (
            ranked.select(
                "l_extendedprice", ntile_expr(10).cast("int").alias("bin")
            )
            .groupBy("bin")
            .agg(
                F.count("*").alias("n"),
                F.min("l_extendedprice").alias("lo"),
                F.max("l_extendedprice").alias("hi"),
            )
        )

    # round-9: banded Mann-Whitney mid-rank AUC — per-event distinct
    # scores make the per-score census grow linearly with events
    from pyspark_excel_datasource_spark.operators.ml import _auc_agg

    def auc_rank(ev):
        scored = ev.select(
            (F.col("event_id") % 2).cast("int").alias("pos"),
            (F.col("value") + (F.col("event_id") % 1000000)).alias("score"),
        )
        return _auc_agg(scored)

    # round-9: banded median-degree pick (the q_graph_kcore k selection)
    # over a vertex population that grows 10x
    def kcore_median(orders, n):
        from pyspark_excel_datasource_spark.operators.banding import (
            banded_lower_median,
        )

        deg = orders
        if n > 1:
            deg = deg.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
            ).withColumn("o_custkey", F.col("o_custkey") * n + F.col("rep"))
        d0 = deg.groupBy("o_custkey").agg(F.count("*").alias("d"))
        dc = d0.groupBy("d").agg(F.count("*").alias("c"))
        return banded_lower_median(dc, "d", "c").select(
            F.col("d").alias("k")
        )


    # round-9: PCA covariance sufficient statistics — the one row-scale
    # pass of q_embed_pca_power (the power iteration is dims^2-bounded)
    def pca_moments(emb):
        vq = (
            "CAST(FLOOR(CAST(embedding[{k}] AS DOUBLE) * 1000000 + 0.5)"
            " AS BIGINT)"
        )
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
        return pairs.groupBy("i", "j").agg(
            F.sum(F.col("p").cast("decimal(38,0)")).alias("sp"),
            F.count("*").alias("n"),
        )

    # round-10 (VERDICT r9 #2): sampled-AUC with the in-plan exact audit —
    # the scored frame feeds both subtrees, so the shape is a thunk (the
    # localCheckpoint runs inside the timing, like q_eval_auc_sampled)
    def auc_sampled(ev):
        scored = ev.select(
            (F.col("event_id") % 2).cast("int").alias("pos"),
            (F.col("value") + (F.col("event_id") % 1000000)).alias("score"),
            F.col("event_id"),
        ).localCheckpoint()
        samp = scored.filter(
            F.substring(F.md5(F.col("event_id").cast("string")), 9, 2) < "80"
        )
        full = _auc_agg(scored).select(
            F.col("rank_sum2").alias("rs_f"),
            F.col("n_pos").alias("np_f"),
            F.col("n_neg").alias("nn_f"),
        )
        return _auc_agg(samp).crossJoin(F.broadcast(full))

    # round-10 (VERDICT r9 #2): NTH_VALUE full-partition frame + rank-1
    # filter on the same sort — q_win_nth's single-exchange claim, run
    # against SKEWED user growth (see replicate_events_skewed)
    def win_nth(ev):
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        return (
            ev.select(
                "user_id",
                F.nth_value("event_type", 2).over(wfull).alias("second_event"),
                F.nth_value("event_type", 3).over(wfull).alias("third_event"),
                F.count("*").over(W.partitionBy("user_id")).alias("n_events"),
                F.row_number().over(w).alias("_rn"),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def replicate_events_skewed(ev, n: int):
        """n copies where every 10th user KEEPS its id across replicas —
        those partitions grow n-fold (hot keys) while the rest grow in
        population only. The dishonest-skew stress for per-user Window
        shapes: a plan that only survives uniform user growth fails
        here."""
        return (
            ev.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
            )
            .withColumn(
                "user_id",
                F.when(F.col("user_id") % 10 == 0, F.col("user_id")).otherwise(
                    F.col("user_id") * n + F.col("rep")
                ),
            )
            .withColumn("event_id", F.col("event_id") * n + F.col("rep"))
            .drop("rep")
        )

    def ks_shape(o):
        # round-11 q_drift_ks shape: per-cent census → band offsets →
        # within-band cumsums → TakeOrdered(1); replicas repeat the same
        # price values, so the census keyspace is CONSTANT and the extra
        # rows must die in the map-side combine
        pts = o.filter(F.col("o_orderstatus").isin("F", "O")).select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("s1"),
            F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("s2"),
        )
        census = (
            pts.groupBy("v")
            .agg(F.sum("s1").alias("c1"), F.sum("s2").alias("c2"))
            .withColumn("__band", F.expr("v DIV 1048576"))
        )
        from pyspark.sql.window import Window as W

        offw = W.orderBy("__band").rowsBetween(W.unboundedPreceding, -1)
        offsets = (
            census.groupBy("__band")
            .agg(F.sum("c1").alias("b1"), F.sum("c2").alias("b2"))
            .select(
                "__band",
                F.coalesce(F.sum("b1").over(offw), F.lit(0)).alias("o1"),
                F.coalesce(F.sum("b2").over(offw), F.lit(0)).alias("o2"),
            )
        )
        tot = census.agg(
            F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
        )
        inw = (
            W.partitionBy("__band")
            .orderBy("v")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            census.select(
                "__band", "v",
                F.sum("c1").over(inw).alias("w1"),
                F.sum("c2").over(inw).alias("w2"),
            )
            .join(F.broadcast(offsets), "__band")
            .crossJoin(F.broadcast(tot))
            .select(
                "v",
                F.abs(
                    (F.col("o1") + F.col("w1")) * F.col("n2")
                    - (F.col("o2") + F.col("w2")) * F.col("n1")
                ).alias("d"),
            )
            .orderBy(F.col("d").desc(), "v")
            .limit(1)
        )

    def gd_gradient(o):
        # round-11 q_classify_gd per-iteration shape: one map-side-
        # combined aggregation of three fixed-point gradient sums —
        # shuffle-free, output one row; throughput must stay flat
        z = "(0.1 + (0.2 * x1) + (0.3 * x2))"
        p = f"(0.5 + ({z} / (2.0 * (1.0 + ABS({z})))))"
        pts = o.select(
            (F.col("o_totalprice") / 300000.0).alias("x1"),
            ((F.col("o_custkey") % 100).cast("double") / 100.0).alias("x2"),
            F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        )
        e = f"({p} - y)"
        return pts.agg(
            F.expr(
                f"SUM(CAST(FLOOR(({e}) * 1000000.0 + 0.5) AS BIGINT))"
            ).alias("ga"),
            F.expr(
                f"SUM(CAST(FLOOR(({e} * x1) * 1000000.0 + 0.5) AS BIGINT))"
            ).alias("gb"),
            F.expr(
                f"SUM(CAST(FLOOR(({e} * x2) * 1000000.0 + 0.5) AS BIGINT))"
            ).alias("gc"),
            F.count("*").alias("n"),
        )

    from pyspark_excel_datasource_spark.operators.graph import (
        common_neighbor_scores,
        personalized_pagerank,
    )
    from pyspark_excel_datasource_spark.operators.stats import (
        chi2_frame,
        mann_kendall_frame,
    )

    shapes = {
        # round-12: census-first inference shapes — the census key space
        # (status x priority cells / priority x month) is constant under
        # replication, so replicas must die in the map-side combine
        "chi2_census": (chi2_frame(orders1), chi2_frame(orders10)),
        "mann_kendall": (
            mann_kendall_frame(orders1),
            mann_kendall_frame(orders10),
        ),
        # round-12: df-capped posting-list link prediction — replicas
        # multiply raw (cust, supp) volume but the DISTINCT posting
        # lists are unchanged, so cost concentrates in the pre-distinct
        # pass and the pair stage stays constant
        "common_neighbors": (
            common_neighbor_scores(orders1, li1),
            common_neighbor_scores(orders10, li10),
        ),
        # round-14 (VERDICT r13 #1): ONE pathological customer whose
        # degree (20,000 distinct suppliers) dwarfs the pair-generation
        # cap (256). The capped plan drops it BEFORE the self-join, so
        # the added cost is a linear pass over 20k posting rows — the
        # r13 post-join-filter plan would materialize deg²/2 = 2x10^8
        # pair rows first and blow the ratio gate by an order of
        # magnitude.
        "cn_hot_key": (
            common_neighbor_scores(orders1, li1),
            common_neighbor_scores(
                orders1.select("o_orderkey", "o_custkey").unionByName(
                    spark.range(1).select(
                        F.lit(-1).cast("long").alias("o_orderkey"),
                        F.lit(-1).cast("long").alias("o_custkey"),
                    )
                ),
                li1.select("l_orderkey", "l_suppkey").unionByName(
                    spark.range(20_000).select(
                        F.lit(-1).cast("long").alias("l_orderkey"),
                        (F.col("id") + 1_000_000)
                        .cast("long")
                        .alias("l_suppkey"),
                    )
                ),
            ),
        ),
        "drift_ks": (ks_shape(orders1), ks_shape(orders10)),
        "gd_gradient": (gd_gradient(orders1), gd_gradient(orders10)),
        "pca_moments": (
            pca_moments(vecs1),
            pca_moments(replicate_vecs(vecs1, FACTOR)),
        ),
        "auc_sampled": (
            lambda: auc_sampled(ev1),
            lambda: auc_sampled(replicate_events(ev1, FACTOR)),
        ),
        "win_nth_skew": (
            win_nth(ev1),
            win_nth(replicate_events_skewed(ev1, FACTOR)),
        ),
        "banded_ntile": (banded_ntile(li1), banded_ntile(li10)),
        "auc_rank": (auc_rank(ev1), auc_rank(ev10)),
        "kcore_median": (
            kcore_median(orders1, 1),
            kcore_median(orders1, FACTOR),
        ),
        "flagship_agg": (flagship(li1), flagship(li10)),
        "window_frame": (window_frame(li1), window_frame(li10)),
        "join_agg": (join_agg(li1, orders1), join_agg(li10, orders10)),
        "minhash_dedup": (minhash_pairs(docs1), minhash_pairs(docs10)),
        # round-8: duplicated-substring spans — replicate_docs' per-replica
        # token prefixes keep replicas gram-disjoint, so the duplicated-
        # gram index and the semi join must both grow ~linearly
        "substring_spans": (
            substring_spans(docs1),
            substring_spans(docs10),
        ),
        "ann_lsh_topk": (
            ann_lsh_topk(emb1, qids1),
            ann_lsh_topk(emb10, qids10),
        ),
        "ann_pq_topk": (
            pq_topk(emb1, qids1),
            pq_topk(emb10, qids10),
        ),
        "sessionize": (sessionize(ev1), sessionize(ev10)),
        "asof_range": (asof_range(ev1), asof_range(ev10)),
        "funnel": (funnel_counts(ev1), funnel_counts(ev10)),
        "bloom_semi": (
            bloom_agg(spark, orders1, cust_dim),
            bloom_agg(spark, orders10, cust_dim),
        ),
        # round-6 additions: the scale claims the round-5/6 ops document
        # (banding, sublinear top-K, key-only shuffle, sampled index,
        # bounded-vocab pair cap) measured instead of asserted
        "interval_overlap": (
            interval_overlap(ev1),
            interval_overlap(ev10),
        ),
        "vocab_coverage": (
            vocab_coverage(docs_full1),
            vocab_coverage(docs_full10),
        ),
        "nb_classify": (nb_shape(docs_full1), nb_shape(docs_full10)),
        "theta_sketch": (
            theta_union(cust_keys(orders1, 1)),
            theta_union(cust_keys(orders1, FACTOR)),
        ),
        "payload_dedup": (
            payload_dedup(docs_full1),
            payload_dedup(docs_full10),
        ),
        "chargram_pairs": (
            chargram_pairs(docs_full1),
            chargram_pairs(
                replicate_docs_chars(
                    table(spark, SF, "documents").select(
                        "doc_id", "text", "source", "lang", "n_chars"
                    ),
                    FACTOR,
                )
            ),
        ),
        "topic_cooccur": (
            topic_cooccur(docs_full1),
            topic_cooccur(docs_full10),
        ),
        # late round-6 ops: canonical-URL dedup is one string-key shuffle
        # with map-side partials; Q18's agg-then-semi-join pre-shrinks
        # the fact before any join — both must stay ~linear
        "url_dedup": (
            url_dedup(docs_full1),
            url_dedup(docs_full10),
        ),
        "q18_semi": (
            q18_semi(li1, orders1),
            q18_semi(li10, orders10),
        ),
        # constant-DENSITY 10x for the spatial banding: each replica
        # shifts one world-width right, so the area grows with the
        # points and qualifying pairs grow ~linearly (fixed radius in a
        # 10x-denser world would quadratically grow the OUTPUT itself —
        # a property of the answer, not the plan)
        "spatial_grid": (
            spatial_neighbor_pairs(spatial_points(cust_all1)),
            spatial_neighbor_pairs(spatial_pts10),
        ),
        # round-6 batch: map-only tokenizer encode; bucketed-prune skyline;
        # content-key priority dedup; per-shard lateness window; bounded-key
        # moment aggregation; two-level curriculum rank (no per-source
        # single-task window)
        "bpe_encode": (
            bpe_encode(docs1),
            bpe_encode(docs10),
        ),
        "skyline": (
            skyline_select(docs_full1),
            skyline_select(docs_full10),
        ),
        "cross_source": (
            cross_source_census(docs_full1),
            cross_source_census(docs_full10),
        ),
        "late_audit": (
            lateness_audit(ev1),
            lateness_audit(ev10),
        ),
        "embed_norm": (
            embed_norm_stats(vecs1),
            embed_norm_stats(replicate_vecs(vecs1, FACTOR)),
        ),
        "curriculum": (
            curriculum_schedule(docs_full1),
            curriculum_schedule(docs_full10),
        ),
        # round-6 batch 3-5: interval rolling-DAU; bounded-postings index
        # build; md5-keyed boilerplate df; one-shuffle bidirectional asof;
        # band-localized weighted median
        "rolling_dau": (
            rolling_dau(ev1),
            rolling_dau(ev10),
        ),
        "inverted_index": (
            inverted_index(docs1),
            inverted_index(docs10),
        ),
        "strip_boiler": (
            strip_boilerplate(docs1),
            strip_boilerplate(docs10),
        ),
        "asof_nearest": (
            asof_nearest(ev1),
            asof_nearest(ev10),
        ),
        "weighted_median": (
            weighted_median(li1),
            weighted_median(li10),
        ),
        "pit_join": (
            pit_join(ev1),
            pit_join(ev10),
        ),
        # content-defined chunking family: boundary scan is per-byte map
        # work; census shuffles 16-byte hashes; near-dup candidates come
        # from df-capped posting lists (replicas are byte-decorrelated by
        # the char rotation, so candidates stay within each replica)
        "market_basket": (
            market_basket(li1),
            market_basket(li10),
        ),
        "quantile_norm": (
            quantile_normalize(docs_full1),
            quantile_normalize(docs_full10),
        ),
        # round-7 graph ops: replicas are key-disjoint (custkey/suppkey/
        # partkey carry the replica id), so nodes, edges, and triangles
        # all grow linearly — per-row throughput must stay flat while the
        # per-iteration shuffle structure (join on src + groupBy dst)
        # stays constant
        "pagerank": (
            pagerank(copurchase_edges(orders_g1, li_g1), iterations=2),
            pagerank(copurchase_edges(orders_g10, li_g10), iterations=2),
        ),
        # round-14: the seeded variant — eager setup (|S| collect, sink
        # probe) makes it a thunk like cc_star; key-disjoint replicas
        # grow seeds and vertices together, so per-iteration cost must
        # stay proportional to edges
        "ppr": (
            lambda: personalized_pagerank(
                copurchase_edges(orders_g1, li_g1),
                copurchase_edges(orders_g1, li_g1)
                .select(F.col("u").alias("id"))
                .filter(F.col("id") % 20 == 0)
                .distinct(),
                iterations=2,
            ),
            lambda: personalized_pagerank(
                copurchase_edges(orders_g10, li_g10),
                copurchase_edges(orders_g10, li_g10)
                .select(F.col("u").alias("id"))
                .filter(F.col("id") % 20 == 0)
                .distinct(),
                iterations=2,
            ),
        ),
        "triangles": (
            triangle_counts(li_g1),
            triangle_counts(li_g10),
        ),
        # round-8: large-star/small-star CC — eager (per-round
        # localCheckpoint), so the shape is a thunk and the timing covers
        # the whole alternation; disjoint replicas keep components and
        # round count constant while edges grow linearly
        "cc_star": (
            lambda: _cc(copurchase_edges(orders_g1, li_g1)),
            lambda: _cc(copurchase_edges(orders_g10, li_g10)),
        ),
        "chunk_census": (
            chunk_census(docs_full1),
            chunk_census(
                replicate_docs_chars(
                    table(spark, SF, "documents").select(
                        "doc_id", "text", "source", "lang", "n_chars"
                    ),
                    FACTOR,
                )
            ),
        ),
    }
    wanted = set(sys.argv[1:])
    if wanted:
        shapes = {k: v for k, v in shapes.items() if k in wanted}
    print(f"rows: base={n1:,} scaled={n1*FACTOR:,}")
    for name, (base, scaled) in shapes.items():
        # Warm BOTH sides once: base and scaled compile different
        # whole-stage-codegen classes, and a first pass over a huge
        # generated method can run interpreted (observed 104s → 8s on
        # the very next run of the 10x shingle HOF). JIT warmup is a
        # per-class constant, not a scale property; steady-state
        # throughput is what must stay flat as input grows.
        timed(name, base)
        timed(name, scaled)
        tb = timed(name, base)
        ts = timed(name, scaled)
        ratio = ts / tb
        verdict = "OK" if ratio < FACTOR * 1.6 else "SUPRALINEAR"
        print(
            f"{name:14s} base={tb:6.2f}s scaled={ts:6.2f}s "
            f"ratio={ratio:5.1f}x (target <{FACTOR*1.6:.0f}x) {verdict}"
        )


if __name__ == "__main__":
    main()
