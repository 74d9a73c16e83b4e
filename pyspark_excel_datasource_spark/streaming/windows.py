"""Event-time window queries (SURVEY.md §2.3 streaming family).

The reference's streaming surface is file discovery only — no event-time
semantics, no watermark, no windows (reference ``connector.py:206-277``).
This module provides the real semantics on Spark's unified engine: the
same ``window()`` / ``session_window()`` expressions run identically in
batch and in Structured Streaming, so each query here is registered in its
(DuckDB-oracle-able) batch form, and ``tests/test_streaming.py`` runs the
same expressions as genuine micro-batch streams (memory sink,
``availableNow`` trigger) including late-data/watermark behavior.

All windows are epoch-aligned, matching DuckDB ``time_bucket``.

Design follows the unified batch/streaming model of Structured Streaming
(Armbrust et al., SIGMOD 2018, PAPERS.md): identical window expressions
execute in both modes, with watermarks bounding state for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window as W

from ..catalog import table
from ..functions.determinism import canon, davg, dsum, sql_canon, sql_davg, sql_dsum
from ..plans.registry import query


@query(
    "q_stream_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS wstart,
           time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS wend,
           event_type,
           COUNT(*) AS n_events,
           {sql_canon(sql_dsum('value', 2))} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            canon(dsum("value", 2)).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT w.wstart, w.wstart + INTERVAL 10 MINUTE AS wend,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e, LATERAL (
        SELECT time_bucket(INTERVAL 5 MINUTE, e.ts) - INTERVAL (k*5) MINUTE
               AS wstart
        FROM (SELECT unnest(generate_series(0, 1)) AS k)
    ) w
    WHERE e.ts >= w.wstart AND e.ts < w.wstart + INTERVAL 10 MINUTE
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min size, 5 min slide) — each event lands in
    size/slide windows; Spark's Expand does this without a self-join."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "n_users",
        )
    )


@query(
    "q_stream_session",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {sql_canon(sql_dsum('value', 2))} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — Spark's native
    ``session_window`` merges adjacent events server-side; the oracle is
    the classic gaps-and-islands rewrite."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            canon(dsum("value", 2)).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "q_stream_watermark",
    oracle=f"""
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS wstart,
           event_type,
           COUNT(*) AS n_events,
           {sql_davg('value', 2)} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked windowed aggregation. ``withWatermark`` is a no-op in
    batch (all data is 'on time'), so the oracle is the plain window agg;
    the real late-data-drop behavior is asserted in
    ``tests/test_streaming.py::test_watermark_drops_late_data``."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            davg("value", 2).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style dedup on a key subset under a watermark. Projecting
    only the keys keeps the result deterministic (any-survivor semantics
    would not be); bounded-state streaming dedup
    (``dropDuplicatesWithinWatermark``) is exercised in the streaming
    tests."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


@query(
    "q_stream_enrich",
    oracle=f"""
    SELECT time_bucket(INTERVAL 15 MINUTE, e.ts) AS wstart,
           c.c_mktsegment,
           COUNT(*) AS n_events,
           {sql_canon(sql_dsum('e.value', 2))} AS seg_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a static
    dimension (customer) and windowed per market segment.

    The canonical streaming-ETL shape: the static side is broadcast, so
    each micro-batch enriches map-side with no stateful join — state
    exists only in the window aggregation. The same plan runs as a
    genuine micro-batch stream in
    ``tests/test_streaming.py::test_stream_static_join_equals_batch``.
    At 100 TB/day the dimension refresh is a broadcast swap per batch,
    never a reshuffle of the stream.
    """
    from pyspark.sql.functions import broadcast

    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        ev.join(broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "15 minutes").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            canon(dsum("value", 2)).alias("seg_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "c_mktsegment",
            "n_events",
            "seg_value",
        )
    )


@query(
    "q_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           EPOCH_US(p.ts) - EPOCH_US(c.ts) AS delay_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 15 MINUTE AND c.ts < p.ts
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded join, batch twin: every (purchase,
    click-within-the-prior-15-minutes) pair per user, with the
    click→purchase delay.

    This is the exact join Structured Streaming runs with two watermarked
    streams and a time-range condition (state bounded by the 15-minute
    constraint on both sides); ``tests/test_streaming.py`` executes the
    same expressions as a genuine two-stream micro-batch join. Batch
    plan: hash equi-join on ``user_id`` with the range predicate applied
    post-match; the banded variant for heavy per-user histories is
    ``q_join_range`` (this query keeps the pair-level output the
    streaming join emits). delay_us is integer microsecond arithmetic —
    exact cross-engine.
    """
    ev = table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (c.c_ts < F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (us("p_ts") - us("c_ts")).alias("delay_us"),
        )
    )


@query(
    "q_stream_join_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           EPOCH_US(p.ts) - EPOCH_US(c.ts) AS delay_us,
           CAST(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END AS INT)
               AS organic
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 15 MINUTE AND c.ts < p.ts
    """,
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER time-bounded join, batch twin: every
    purchase with its prior-15-minute clicks, PLUS a null-click row for
    purchases with no attributable click (``organic`` = 1) — the other
    half of the attribution contract ``q_stream_join`` covers.

    In Structured Streaming this is the watermarked left-outer join:
    matched pairs emit immediately, unmatched purchases emit exactly
    once when the watermark passes the end of their click window (state
    eviction — bounded by the 15-minute constraint). The genuine
    two-stream run incl. the delayed null-row emission is pinned in
    ``tests/test_streaming.py::test_stream_stream_outer_join_equals_batch``.
    Batch plan: filters pushed into both scans, hash equi-join on
    user_id, range predicate post-match.
    """
    ev = table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (c.c_ts < F.col("p_ts")),
            "left",
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (us("p_ts") - us("c_ts")).alias("delay_us"),
            F.when(F.col("click_id").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("organic"),
        )
    )


@query(
    "q_stream_foreachbatch",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {sql_canon(sql_dsum('value', 2))} AS total_value,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert-sink pattern, batch twin: the per-user state
    table an idempotent micro-batch MERGE loop converges to.

    The streaming form (exercised for real in
    ``tests/test_streaming.py::test_foreachbatch_merge_idempotent``) is
    ``writeStream.foreachBatch(merge)`` where ``merge(df, batch_id)``
    (1) skips batch ids it has already applied — Spark re-delivers the
    last batch after a crash, and idempotence-by-batch-id is what turns
    at-least-once delivery into exactly-once state — and (2) combines
    the batch's per-user partial aggregate into the state store
    (count/sum add, max takes greatest). Partial-aggregate-then-merge
    keeps per-batch shuffle proportional to the batch, not the state.
    The converged state equals this one-shot batch aggregate; decimal
    sums make the equality exact regardless of batch boundaries.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        canon(dsum("value", 2)).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


#: rate-limit cap: events kept per user per 10-minute window
_RATE_MAX = 3


@query(
    "q_stream_rate_limit",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type,
           CAST(rn AS INT) AS nth_in_window
    FROM (
        SELECT event_id, user_id, ts, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, time_bucket(INTERVAL 10 MINUTE, ts)
                   ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= {_RATE_MAX}
    """,
)
def q_stream_rate_limit(spark, sf_dir: str) -> DataFrame:
    """Per-key rate limiting: keep at most {_RATE_MAX} events per user
    per 10-minute event-time window, in arrival order — the throttling /
    spam-damping operator every ingestion pipeline puts in front of
    expensive enrichment (and the deterministic, replayable alternative
    to sampling: the SAME events survive on every rerun).

    Batch form: one window rank over (user, epoch-aligned bucket) —
    a single shuffle on the composite key, partition-local rank, no
    global sort. The identical semantics run streaming via
    ``applyInPandasWithState`` keyed on (user, bucket) with a per-key
    counter (state = one int; exactly the ``streaming/stateful.py``
    pattern) — the batch twin is what the oracle can hash-verify.
    Deterministic under same-timestamp events via the event_id tiebreak.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy(
        "user_id", F.window("ts", "10 minutes")
    ).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.row_number().over(w).cast("int").alias("nth_in_window"),
        )
        .filter(F.col("nth_in_window") <= _RATE_MAX)
    )


@query(
    "q_stream_join_full",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           COALESCE(p.user_id, c.user_id) AS user_id,
           CAST(CASE WHEN c.event_id IS NULL THEN 1
                     WHEN p.event_id IS NULL THEN 2
                     ELSE 0 END AS INT) AS side
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 15 MINUTE AND c.ts < p.ts
    """,
)
def q_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER time-bounded join, batch twin: matched
    purchase↔click pairs (side=0), organic purchases with no prior-15-min
    click (side=1, the left-outer half ``q_stream_join_outer`` covers),
    AND unattributed clicks that led to no purchase within 15 minutes
    (side=2) — the wasted-spend rows only the full join surfaces.

    In Structured Streaming (supported since Spark 3.1) both sides are
    watermarked; matched pairs emit immediately and each side's
    unmatched rows emit exactly once when the OTHER side's watermark
    passes their join-window end — state on both sides is bounded by
    the 15-minute constraint. The genuine two-stream run incl. both
    delayed null-row emissions is pinned in
    ``tests/test_streaming.py::test_stream_stream_full_outer_join_equals_batch``.
    Batch plan: filters pushed into both scans, hash equi-join on
    user_id, range predicate post-match; output is linear in
    matches + both unmatched sides (never a product).
    """
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (p.p_user == c.c_user)
            & (c.c_ts >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (c.c_ts < F.col("p_ts")),
            "full",
        )
        .select(
            "purchase_id",
            "click_id",
            F.coalesce("p_user", "c_user").alias("user_id"),
            F.when(F.col("click_id").isNull(), 1)
            .when(F.col("purchase_id").isNull(), 2)
            .otherwise(0)
            .cast("int")
            .alias("side"),
        )
    )
