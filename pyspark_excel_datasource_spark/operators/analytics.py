"""Event-analytics operators: sessionization, funnels, retention, SCD2.

The reference connector feeds BI-style workbooks
(`/root/reference/src/pyspark_datasource/excel/connector.py` reads sheets
into DataFrames for exactly this kind of analysis); these operators
provide the canonical event-log analyses natively, each as ONE
declarative plan over the ``events`` table.

Scale notes (100 TB event logs):

- Every operator here shuffles ONCE on ``user_id`` (the window/groupBy
  key) and then stays partition-local — sessionization, islands, and
  retention cohorts are all per-user computations, so the plans are a
  single hash exchange plus per-key sorts, no matter how many events.
  Skew on a hot user is bounded by per-user history, not corpus size.
- Time arithmetic is integer microseconds (``unix_micros``), never double
  seconds: epoch-micros exceed 2^53 as nanos, and the DuckDB oracle
  (``epoch_us``) agrees bit-for-bit on integers.
- Window tie-breaks always include ``event_id`` so run/island assignment
  is deterministic under same-timestamp events in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..functions.determinism import canon, dround, sql_canon, sql_dround
from ..plans.registry import query

#: Session gap threshold: a new session starts after 6 h of inactivity
#: (median inter-event gap in the test corpus is ~7 h, so users split
#: into several sessions without degenerating to one-event sessions).
_GAP_SEC = 6 * 3600
_GAP_US = _GAP_SEC * 1_000_000


def _micros(col: str) -> F.Column:
    # ts is TIMESTAMP_NTZ; session tz is pinned UTC so the cast is the
    # identity wall-clock mapping and unix_micros accepts it.
    return F.unix_micros(F.col(col).cast("timestamp"))


@query(
    "q_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         > {_GAP_US}
                    OR LAG(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, us,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS span_sec
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (6 h inactivity threshold).

    Plan: one shuffle on ``user_id``, then two window passes (lag flag,
    running sum) and a partial+final aggregate — all partition-local
    after the single exchange. This is the batch twin of
    ``q_stream_session`` (session_window in streaming/windows.py); at
    100 TB the same plan holds because state never leaves the user key.
    """
    return sessionize(table(spark, sf_dir, "events"))


def sessionize(ev: DataFrame) -> DataFrame:
    """Sessionization plan over an events frame (user_id, event_id, ts)."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    per_user = W.partitionBy("user_id").orderBy(*order)
    us = _micros("ts")
    lag_us = F.lag(us).over(per_user)
    is_new = F.when(
        lag_us.isNull() | ((us - lag_us) > F.lit(_GAP_US)), 1
    ).otherwise(0)
    running = per_user.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = ev.select(
        "user_id",
        "ts",
        us.alias("us"),
        F.sum(is_new).over(running).alias("session_seq"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.expr("(MAX(us) - MIN(us)) DIV 1000000").cast("long").alias("span_sec"),
    ).select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "session_start",
        "session_end",
        "n_events",
        "span_sec",
    )


@query(
    "q_funnel",
    oracle="""
    WITH w1 AS (
        SELECT user_id, event_type, ts,
               MIN(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' AND ts >= t1
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t2
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    ),
    w4 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t3
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t4
        FROM w3
    ),
    totals AS (
        SELECT CAST(COUNT(DISTINCT CASE WHEN t1 IS NOT NULL
                                        THEN user_id END) AS BIGINT) AS s1,
               CAST(COUNT(DISTINCT CASE WHEN t2 IS NOT NULL
                                        THEN user_id END) AS BIGINT) AS s2,
               CAST(COUNT(DISTINCT CASE WHEN t3 IS NOT NULL
                                        THEN user_id END) AS BIGINT) AS s3,
               CAST(COUNT(DISTINCT CASE WHEN t4 IS NOT NULL
                                        THEN user_id END) AS BIGINT) AS s4
        FROM w4
    )
    SELECT 1 AS step, 'signup' AS event_type, s1 AS users FROM totals
    UNION ALL SELECT 2, 'view', s2 FROM totals
    UNION ALL SELECT 3, 'click', s3 FROM totals
    UNION ALL SELECT 4, 'purchase', s4 FROM totals
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → view → click → purchase): step *i*
    counts users whose earliest qualifying event is at-or-after their
    step *i-1* time.

    Plan: ONE shuffle on ``user_id``, then four partition-local window
    passes (each step's frontier time is a conditional MIN over the
    user's partition — no self-joins, no per-step shuffles), one final
    aggregate. At 100 TB the event log is exchanged exactly once and
    per-user state is a handful of timestamps.
    """
    return funnel_counts(table(spark, sf_dir, "events"))


def funnel_counts(ev: DataFrame) -> DataFrame:
    """Funnel plan over an events frame (user_id, event_type, ts)."""
    ev = ev.select("user_id", "event_type", "ts")
    per_user = W.partitionBy("user_id")
    steps = ("signup", "view", "click", "purchase")

    d = ev
    prev_t = None
    for i, step in enumerate(steps, start=1):
        qualifies = F.col("event_type") == step
        if prev_t is not None:
            qualifies = qualifies & (F.col("ts") >= F.col(prev_t))
        t = f"t{i}"
        d = d.withColumn(
            t, F.min(F.when(qualifies, F.col("ts"))).over(per_user)
        )
        prev_t = t

    totals = d.agg(
        *[
            F.count_distinct(
                F.when(F.col(f"t{i}").isNotNull(), F.col("user_id"))
            )
            .cast("long")
            .alias(f"s{i}")
            for i in range(1, 5)
        ]
    )
    stack = ", ".join(
        f"{i}, '{step}', s{i}" for i, step in enumerate(steps, start=1)
    )
    return totals.select(
        F.expr(f"stack(4, {stack}) AS (step, event_type, users)")
    )


@query(
    "q_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(DATE_DIFF('day', c.cohort_day,
                          CAST(date_trunc('day', e.ts) AS DATE)) // 7
                AS INT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN cohorts c ON c.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    bucketed into week offsets from that day.

    Plan: the cohort table is one row per user (broadcast side); the
    big events scan joins to it map-side and aggregates on
    (cohort_day, week_offset) — two shuffles total, the second over a
    bounded key space (days × offsets). COUNT(DISTINCT) re-shuffles on
    the composite key + user_id, still bounded by users not events.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    cohorts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    return (
        ev.join(F.broadcast(cohorts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(day, F.col("cohort_day")) / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
    )


@query(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, island,
               MIN(ts) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM ordered GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_type)
               AS valid_to,
           n_events
    FROM runs
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 style change tracking: collapse each user's consecutive
    runs of the same ``event_type`` into validity intervals
    (gaps-and-islands), ``valid_to`` = next run's start, NULL for the
    open current run.

    Plan: one shuffle on ``user_id``; both row_numbers, the run
    aggregate, and the lead() all reuse that partitioning (the second
    row_number only adds a partition-local sort). Deterministic under
    timestamp ties via the ``event_id`` tie-break.
    """
    ev = table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    island = F.row_number().over(
        W.partitionBy("user_id").orderBy(*order)
    ) - F.row_number().over(
        W.partitionBy("user_id", "event_type").orderBy(*order)
    )
    runs = (
        ev.select("user_id", "event_type", "ts", island.alias("island"))
        .groupBy("user_id", "event_type", "island")
        .agg(
            F.min("ts").alias("valid_from"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    nxt = W.partitionBy("user_id").orderBy(
        F.col("valid_from").asc(), F.col("event_type").asc()
    )
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        "n_events",
    )


#: Per-language md5-prefix keep thresholds (256ths): en keeps 50 %, the
#: rest keep 25 % — the "rebalance a skewed corpus" shape.
_STRATA_HEX = {"en": "80"}
_DEFAULT_HEX = "40"


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang,
           SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket_hex
    FROM documents
    WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '{_STRATA_HEX["en"]}'
                 ELSE '{_DEFAULT_HEX}' END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic downsampling: per-language keep fraction
    via the content-addressed md5 bucket (en 50 %, others 25 %).

    Same machinery as ``q_split_assign`` / ``q_sample_hash``: no RNG, no
    global count, reproducible under corpus growth, and the predicate is
    a pure per-row projection — embarrassingly parallel at any scale.
    """
    d = table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    threshold = F.when(
        F.col("lang") == "en", F.lit(_STRATA_HEX["en"])
    ).otherwise(F.lit(_DEFAULT_HEX))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket_hex"), threshold.alias("t"))
        .filter(F.col("bucket_hex") < F.col("t"))
        .drop("t")
    )


#: relative-error acceptance band for the HLL verdict column: DataSketches
#: HLL at default lgK=12 has standard error ~1.04/sqrt(2^12) ≈ 1.6%; 5% is
#: ≈3σ — deterministic for fixed input, asserted at sf0.001/0.01/0.1.
_HLL_REL_ERR = 0.05


@query(
    "q_agg_hll",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_bounds
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_bounds
    FROM events
    """,
)
def q_agg_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: Apache DataSketches HLL via
    ``hll_sketch_agg`` / ``hll_sketch_estimate`` (Spark ≥ 3.5 built-ins,
    JVM-side).

    Unlike ``approx_count_distinct`` (HLL++ with a non-exposed state),
    these sketches are *storable and mergeable*: at 100 TB you
    pre-aggregate one sketch per partition/day, persist the binary, and
    union months of data with ``hll_union_agg`` without rescanning —
    the standard incremental-distinct pattern.

    Estimates are implementation-specific, so the raw estimate can't be
    hash-compared cross-engine; instead the query emits the exact
    distinct count (hash-verified against DuckDB) plus a ``within_bounds``
    verdict asserting the sketch landed within ±5 % (≈3σ at lgK=12) of
    it — covering BOTH the per-type sketches and the ``hll_union_agg``
    merge path through the ALL row. The exact count costs one extra
    distinct aggregation at gate scale; the sketch path remains the
    scale story.
    """
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    verdict = (
        F.abs(
            F.hll_sketch_estimate("sketch").cast("double")
            - F.col("exact_users").cast("double")
        )
        <= F.lit(_HLL_REL_ERR) * F.col("exact_users").cast("double")
    ).alias("within_bounds")
    all_row = (
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("long")
            .alias("approx"),
        )
        .crossJoin(
            F.broadcast(ev.agg(F.count_distinct("user_id").alias("exact_users")))
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            (
                F.abs(F.col("approx").cast("double") - F.col("exact_users"))
                <= F.lit(_HLL_REL_ERR) * F.col("exact_users")
            ).alias("within_bounds"),
        )
    )
    return per_type.select("event_type", "exact_users", verdict).unionByName(
        all_row
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value) AS mu,
               CAST(ROUND(STDDEV_SAMP(value), 6) AS DECIMAL(38,6)) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST(CAST(ROUND((e.value - s.mu) / CAST(s.sigma AS DOUBLE), 6)
                AS DECIMAL(38,6)) AS VARCHAR) AS z
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE ABS((e.value - s.mu) / CAST(s.sigma AS DOUBLE)) > 2.5
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: events whose value
    deviates more than 2.5 sample standard deviations from their
    group's mean.

    Cross-engine determinism: the mean is the exact decimal-sum/count
    construction; the stddev is rounded to 6 decimals BEFORE the z
    computation (engines accumulate variance in different orders), and
    the final z is rounded the same way on both sides. Plan: one tiny
    per-type aggregate broadcast back onto the event scan — the big
    side is never shuffled.
    """
    from ..functions.determinism import canon, davg, dround

    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        davg("value", 6).alias("mu"),
        dround(F.stddev_samp("value"), 6).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma").cast("double")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            "value",
            canon(dround(z, 6)).alias("z"),
        )
    )


@query(
    "q_fill_forward",
    oracle="""
    SELECT event_id, user_id, ts,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS value_filled
    FROM events
    """,
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: treat 'error' events' values as missing and
    carry the user's last valid value forward (NULL until a first valid
    reading exists).

    The standard sensor/telemetry repair: one shuffle on the key, then a
    partition-local ordered scan (``last(..., ignorenulls=True)`` over a
    running frame) — state per key is a single value, so the plan is
    identical at any scale. Deterministic under timestamp ties via the
    event_id tie-break in both engines.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    missing_as_null = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(missing_as_null, ignorenulls=True).over(w).alias("value_filled"),
    )


@query(
    "q_pattern_sequence",
    oracle="""
    WITH nxt AS (
        SELECT user_id, event_id, ts, event_type,
               LEAD(event_type, 1) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
               LEAD(event_type, 2) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS e2
        FROM events
    )
    SELECT user_id, event_id AS start_event_id, ts AS start_ts
    FROM nxt
    WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
    """,
)
def q_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-style): find every
    position where a user's event stream reads exactly
    view → click → purchase with no other event in between.

    Consecutive-row patterns compile to ``lead()`` chains over the
    per-user ordering — one shuffle on the key, one partition-local
    sort, then a pure filter; a k-step pattern is k-1 lead columns, not
    a join. Deterministic under timestamp ties via the event_id
    tie-break. This is the windowed-automaton building block: longer
    gapped patterns compose from these hits plus the funnel's
    conditional-MIN frontier technique.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    nxt = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    return (
        nxt.filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "click")
            & (F.col("e2") == "purchase")
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            F.col("ts").alias("start_ts"),
        )
    )


#: EWMA smoothing factor — 1/4 is exactly representable, so the
#: decimal→double literal conversion is exact in both engines.
_EWMA_ALPHA = 0.25


@query(
    "q_ewma",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id,
               LIST(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(LEN(vs) AS BIGINT) AS n_events,
           list_reduce(vs, (acc, x) -> CAST({_EWMA_ALPHA} AS DOUBLE) * x
                            + CAST({1.0 - _EWMA_ALPHA} AS DOUBLE) * acc)
               AS ewma_value
    FROM ordered
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event value per user
    (final smoothed level, alpha=0.25, seeded at the first observation).

    EWMA is a sequential recurrence, so it is computed as an explicit
    ordered fold — ``array_sort`` on (ts, event_id, value) structs fixes
    a total order, then ``aggregate`` folds left in that order. The fold
    is identical in both engines (DuckDB ``list_reduce`` seeds with the
    first element; Spark seeds ``aggregate`` with element 1 and folds the
    tail), so the doubles are bit-exact — no rounding needed.

    Scale note: state per user is one array of that user's events —
    fine for bounded per-key series (the streaming twin is
    ``applyInPandasWithState``); this is NOT the shape for million-event
    keys, where the closed-form weighted-sum window would overflow and a
    stateful scan is the answer.
    """
    ev = table(spark, sf_dir, "events")
    a, b = _EWMA_ALPHA, 1.0 - _EWMA_ALPHA
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.size("evs").cast("long").alias("n_events"),
            F.expr(
                f"aggregate(slice(evs, 2, size(evs) - 1), "
                f"element_at(evs, 1).value, "
                f"(acc, e) -> CAST({a} AS DOUBLE) * e.value "
                f"          + CAST({b} AS DOUBLE) * acc)"
            ).alias("ewma_value"),
        )
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS cnt
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt AS DOUBLE)
               / SUM(cnt) OVER (PARTITION BY from_type) AS prob
    FROM pairs
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    counts and row-normalized probabilities for every (from → to) step.

    Path analysis in three keyed stages — one window (lead over user
    sessions), one count aggregation on the ~|types|² pair domain, one
    window normalization over that tiny matrix. The only data-sized
    shuffle is the first; everything after operates on the matrix, so
    the shape is identical at 100 TB. ``prob`` is one IEEE division of
    exact counts — bit-equal cross-engine.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("cnt"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        F.col("cnt").cast("long").alias("cnt"),
        (
            F.col("cnt").cast("double")
            / F.sum("cnt").over(W.partitionBy("from_type"))
        ).alias("prob"),
    )


@query(
    "q_robust_zscore",
    oracle="""
    WITH med AS (
        SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               CAST(ROUND(1.4826 * QUANTILE_CONT(adev, 0.5), 6)
                    AS DECIMAL(38,6)) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           CAST(CAST(ROUND((d.value - d.med) / CAST(s.mad AS DOUBLE), 6)
                AS DECIMAL(38,6)) AS VARCHAR) AS robust_z
    FROM dev d JOIN mad s USING (event_type)
    WHERE ABS((d.value - d.med) / CAST(s.mad AS DOUBLE)) > 3.5
    """,
)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection — the heavy-tail-safe twin of
    ``q_anomaly_zscore``: mean and stddev are themselves dragged by the
    outliers they're meant to find, while the median and the median
    absolute deviation (scaled by the 1.4826 normal-consistency
    constant) are 50%-breakdown robust.

    Plan: two per-group exact-percentile aggregates (each |groups| rows)
    with the intermediate medians BROADCAST back onto the scan — the
    event table itself is never shuffled; at 100 TB swap the exact
    percentiles for ``approx_percentile`` partials, identical downstream
    shape. Determinism: quantile interpolation runs on identical doubles
    in both engines; the MAD is rounded to 6 decimals BEFORE the z
    division (same convention as the stddev in ``q_anomaly_zscore``) and
    the final z is canon(dround(...))-presented.
    """
    from ..functions.determinism import canon, dround

    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        dround(1.4826 * F.expr("percentile(abs(value - med), 0.5)"), 6).alias(
            "mad"
        )
    )
    z = (F.col("value") - F.col("med")) / F.col("mad").cast("double")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > 3.5)
        .select(
            "event_id",
            "event_type",
            "value",
            canon(dround(z, 6)).alias("robust_z"),
        )
    )


_ATTR_WINDOW_MIN = 30  # last-touch lookback


@query(
    "q_attribution",
    oracle=f"""
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN lc_ts >= ts - INTERVAL {_ATTR_WINDOW_MIN} MINUTE
                THEN lc_id END AS click_id,
           CASE WHEN lc_ts >= ts - INTERVAL {_ATTR_WINDOW_MIN} MINUTE
                THEN EPOCH_US(ts) - EPOCH_US(lc_ts) END AS delay_us
    FROM (
        SELECT *,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER win AS lc_id,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                          IGNORE NULLS) OVER win AS lc_ts
        FROM events
        WHERE event_type IN ('click', 'purchase')
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    WHERE event_type = 'purchase'
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest prior
    click by the same user within a 30-minute lookback — JOIN-FREE.

    The naive formulation is the `q_stream_join` time-range self-join
    (quadratic per hot user in pairs emitted). This is the scale
    spelling: union the two event kinds, ONE shuffle on user_id, and a
    running `last(click, ignorenulls)` carries the candidate forward —
    per-row O(1) state, emission linear in purchases, same single-pass
    structure at any fan-in of clicks per purchase. The (ts, event_id)
    window order makes same-timestamp behavior deterministic in both
    engines; delay arithmetic is integer microseconds.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_click = F.col("event_type") == "click"
    lc_id = F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w)
    lc_ts = F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w)
    attributed = F.col("lc_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {_ATTR_WINDOW_MIN} MINUTES"
    )
    return (
        ev.withColumn("lc_id", lc_id)
        .withColumn("lc_ts", lc_ts)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(attributed, F.col("lc_id")).alias("click_id"),
            F.when(
                attributed,
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("lc_ts").cast("timestamp")),
            ).alias("delay_us"),
        )
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 1024


def countmin_sketch(toks: DataFrame) -> DataFrame:
    """(depth, bucket) → count: a count-min sketch as a 4096-row frame.

    Mergeable by construction (counts add), so at 100 TB the sketch
    builds with map-side partial aggregation and the shuffle moves only
    depth×width rows per partition — the same contract as Spark's HLL
    partials. Seeded xxhash64 rows stay entirely JVM-side.
    """
    return (
        toks.select(
            "tok", F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("d")
        )
        .select(
            "d",
            F.pmod(F.xxhash64(F.col("d"), F.col("tok")), F.lit(_CMS_WIDTH)).alias(
                "bucket"
            ),
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_agg_countmin",
    oracle=f"""
    WITH toks AS (
        SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok FROM documents
    ),
    exact AS (SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok)
    SELECT tok, exact_n,
           TRUE AS est_ge_exact, TRUE AS overshoot_ok
    FROM exact
    ORDER BY exact_n DESC, tok ASC LIMIT 20
    """,
)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the corpus's exact top-20
    tokens (heavy hitters).

    The sketch answers "how often does X occur" from depth×width bounded
    state instead of a full token→count table — the streaming/LLM-corpus
    workhorse when the token domain (n-grams, URLs) is too wide to
    materialize. estimate = min over depth rows of the probed buckets.

    Estimates are hash-layout-specific, so the raw estimate can't be
    hash-compared cross-engine. Instead the query verifies the CM
    contract in-plan and emits the verdict columns: ``est_ge_exact``
    (one-sided error: the estimate never undercounts) and
    ``overshoot_ok`` (estimate ≤ exact + e·N/width, the Markov bound the
    min-over-depth rows satisfy w.h.p.; deterministic for fixed input —
    asserted at sf0.001/0.01/0.1 locally and in
    ``tests/test_sketch_bounds.py``). The DuckDB oracle reproduces the
    exact top-20 (deterministic tiebreak) and asserts the verdicts TRUE,
    so a broken sketch flips a hash-checked value.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    sketch = countmin_sketch(toks)

    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.col("exact_n").desc(), F.col("tok").asc()).limit(20)
    n_total = toks.count()  # scalar: one partial-agg'd count, no data moved
    probes = top.select(
        "tok",
        "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("d"),
    ).select(
        "tok",
        "exact_n",
        "d",
        F.pmod(F.xxhash64(F.col("d"), F.col("tok")), F.lit(_CMS_WIDTH)).alias(
            "bucket"
        ),
    )
    # 80-row probe side broadcasts INTO the 4096-row sketch join
    bound = math.ceil(math.e * n_total / _CMS_WIDTH)
    return (
        F.broadcast(probes)
        .join(sketch, ["d", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("n").alias("cms_estimate"))
        .select(
            "tok",
            "exact_n",
            (F.col("cms_estimate") >= F.col("exact_n")).alias("est_ge_exact"),
            (F.col("cms_estimate") <= F.col("exact_n") + F.lit(bound)).alias(
                "overshoot_ok"
            ),
        )
        .orderBy(F.col("exact_n").desc(), F.col("tok").asc())
    )


@query(
    "q_delta_lag",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value) OVER win AS value_delta,
           EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER win) AS gap_us
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_delta_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta encoding per key: each event against its predecessor
    (value delta + arrival gap) — the preprocessing step for
    change-detection, compression, and rate computation over metric
    streams.

    One shuffle on user_id, one per-key sort, O(1) lag state — the plan
    is identical at any event volume. Deltas are single IEEE
    subtractions of identical operands (bit-exact cross-engine); the gap
    is integer microseconds; (ts, event_id) ordering pins same-timestamp
    determinism.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (us("ts") - F.lag(us("ts")).over(w)).alias("gap_us"),
    )


@query(
    "q_resample_timeseries",
    oracle="""
    WITH spine AS (
        SELECT UNNEST(GENERATE_SERIES(
                   (SELECT time_bucket(INTERVAL 1 HOUR, MIN(ts)) FROM events),
                   (SELECT time_bucket(INTERVAL 1 HOUR, MAX(ts)) FROM events),
                   INTERVAL 1 HOUR)) AS bucket
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1, 2
    )
    SELECT s.bucket, t.event_type,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.sum_cents, 0) AS sum_cents
    FROM spine s CROSS JOIN types t
    LEFT JOIN agg a ON a.bucket = s.bucket AND a.event_type = t.event_type
    """,
)
def q_resample_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: downsample events to a dense hourly grid
    per event type, gap-filling empty buckets with zeros — the
    regularization step every downstream forecaster / rate monitor needs
    (sparse event streams have holes; models want a dense matrix).

    Plan shape: ONE aggregation over the events scan (keyed on bucket ×
    type — map-side combined, key space = hours × types regardless of
    row count), then the dense spine (a ``sequence()`` over the global
    min/max hour — two scalar aggregates — cross-joined with the distinct
    type frame, both broadcast-sized at any scale: a year is 8.8k hourly
    buckets) LEFT-joins the aggregate. Values accumulate as exact integer
    cents so the fill's zeros and the sums are bit-identical cross-engine.
    At 100 TB the expensive side (raw events) is touched exactly once.
    """
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(agg, ["bucket", "event_type"], "left")
        .select(
            # date_trunc yields a session-tz timestamp; present as NTZ to
            # match the NTZ source column (tz is pinned UTC, so identity)
            F.col("bucket").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_cents", F.lit(0).cast("long")).alias("sum_cents"),
        )
    )


@query(
    "q_window_deltas_vs_baseline",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER win AS n_baseline,
           CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER win,
                         0) AS BIGINT) AS baseline_sum_cents,
           CAST(CAST(ROUND(value * 100) AS BIGINT) * COUNT(*) OVER win
                - COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER win,
                           0) AS BIGINT) AS excess_cents_xn
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                   RANGE BETWEEN 86400000000 PRECEDING
                             AND 1 PRECEDING)
    """,
)
def q_window_deltas_vs_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event vs the SAME user's trailing-24h baseline: how far does
    this value sit above/below the user's own recent average (the
    anomaly/feature shape behind per-entity drift alerts and 'unusual
    activity' detectors).

    A RANGE frame over event-time microseconds (``86_400e6 PRECEDING TO
    1 PRECEDING`` — the current row never leaks into its own baseline).
    The comparison is presented as exact integers: ``excess_cents_xn =
    value_cents·n − Σ baseline_cents`` (i.e. (value − mean)·n scaled to
    cents), which avoids any float division while ordering identically
    with it for fixed n. One shuffle on user_id; the frame is bounded by
    each user's 24h event volume, so state per key is small and skew
    follows user skew (saltable if a user is pathological).
    """
    w = (
        W.partitionBy("user_id")
        .orderBy(_micros("ts"))
        .rangeBetween(-86_400_000_000, -1)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    n_base = F.count("*").over(w)
    sum_base = F.coalesce(F.sum(cents).over(w), F.lit(0).cast("long"))
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        n_base.alias("n_baseline"),
        sum_base.alias("baseline_sum_cents"),
        (cents * n_base - sum_base).cast("long").alias("excess_cents_xn"),
    )


@query(
    "q_path_topk",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         > {_GAP_US}
                    OR LAG(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, event_type, us, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_seq,
               STRING_AGG(event_type, '>' ORDER BY us, event_id) AS path
        FROM numbered
        GROUP BY user_id, session_seq
    )
    SELECT path, n_sessions FROM (
        SELECT path, COUNT(*) AS n_sessions
        FROM paths
        GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 20
    )
    """,
)
def q_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-journey paths: sessionize (6 h gap), serialize each
    session's ordered event-type sequence to a path string, count path
    frequencies — the "common navigation flows" query behind every
    product-analytics dashboard.

    The in-session ordering is made deterministic the portable way:
    ``collect_list`` over (micros, event_id, type) structs +
    ``array_sort`` (lexicographic on the leading fields — the tie-break
    the oracle mirrors with ``ORDER BY us, event_id`` inside
    ``STRING_AGG``), so no window-ordering nondeterminism leaks into the
    hash. Plan: ONE shuffle on user_id feeds both the session numbering
    windows and the per-session fold (same key); the path-frequency
    count then shuffles path strings — already collapsed to one row per
    session — and the top-20 is a ``TakeOrderedAndProject``. Session
    paths are bounded by session length, not corpus size, so the path
    key stays small at 100 TB; a skewed mega-path would land on AQE's
    skew handling like any hot group key.
    """
    ev = table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    per_user = W.partitionBy("user_id").orderBy(*order)
    us = _micros("ts")
    lag_us = F.lag(us).over(per_user)
    is_new = F.when(
        lag_us.isNull() | ((us - lag_us) > F.lit(_GAP_US)), 1
    ).otherwise(0)
    running = per_user.rowsBetween(W.unboundedPreceding, W.currentRow)
    numbered = ev.select(
        "user_id",
        "event_type",
        us.alias("us"),
        "event_id",
        F.sum(is_new).over(running).alias("session_seq"),
    )
    paths = (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.transform("evs", lambda x: x["event_type"]), ">"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Watermark lateness audit (the batch mirror of streaming late-data drops)
# ---------------------------------------------------------------------------

#: allowed lateness before the watermark would drop the event (7 days; the
#: testdata spans ~30 days, so both classes are populated)
_WM_DELAY_US = 7 * 24 * 3600 * 1_000_000


@query(
    "q_late_data_audit",
    oracle=f"""
    WITH arr AS (
        SELECT user_id % 8 AS shard, event_type, epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (
                   PARTITION BY user_id % 8
                   ORDER BY MD5(CAST(event_id AS VARCHAR)), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prevmax
        FROM events
    )
    SELECT CAST(shard AS INT) AS shard, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prevmax - {_WM_DELAY_US} > us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN prevmax - {_WM_DELAY_US} > us
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS late_frac,
           CAST(COALESCE(MAX(CASE WHEN prevmax - {_WM_DELAY_US} > us
                    THEN (prevmax - {_WM_DELAY_US} - us) // 1000000
                    END), -1) AS BIGINT) AS max_late_s
    FROM arr GROUP BY shard, event_type
    """,
)
def q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit: for each ingest shard, replay events in
    arrival order, track the running max event-time (the watermark
    source), and count how many events a streaming job with a 7-day
    watermark would have DROPPED — the capacity-planning readout that
    decides the `withWatermark` delay before a pipeline goes live.

    The testdata's ingest order is perfectly time-sorted (zero natural
    lateness), so arrival order is simulated content-addressed —
    ``md5(event_id)`` — which is deterministic, engine-independent, and
    adversarially shuffled; the AUDIT itself (per-shard running-max
    window → lateness classification → per-type census) is exactly what
    runs against a real ingest log's arrival sequence number.

    Scale shape: the window partitions by ingest shard (what a real
    ingest log is already partitioned by) and carries O(1) state (one
    running max) per shard, so it parallelizes across shards and never
    materializes more than a task's slice; the census re-aggregates on
    (shard × event_type) keys. All time math is integer microseconds;
    ``late_frac`` is one IEEE division of exact integers.
    """
    return lateness_audit(table(spark, sf_dir, "events"))


def lateness_audit(ev: DataFrame) -> DataFrame:
    """Watermark-lateness audit plan over an events frame (shared with
    ``tools/scale_stress.py``)."""
    us = _micros("ts")
    arr = ev.select(
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("shard"),
        "event_type",
        us.alias("us"),
        F.md5(F.col("event_id").cast("string")).alias("akey"),
        "event_id",
    )
    w = (
        W.partitionBy("shard")
        .orderBy(F.col("akey").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = arr.withColumn("prevmax", F.max("us").over(w)).select(
        "shard",
        "event_type",
        "us",
        (F.col("prevmax") - _WM_DELAY_US > F.col("us")).alias("late"),
        (F.col("prevmax") - _WM_DELAY_US - F.col("us")).alias("behind_us"),
    )
    late_i = F.when(F.col("late"), 1).otherwise(0)
    return flagged.groupBy("shard", "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(late_i).cast("long").alias("n_late"),
        (F.sum(late_i).cast("double") / F.count("*")).alias("late_frac"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("late"), F.expr("behind_us DIV 1000000")
                )
            ),
            F.lit(-1),
        )
        .cast("long")
        .alias("max_late_s"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (the classic "rolling DAU" hard problem)
# ---------------------------------------------------------------------------

#: rolling window length in days (window ending day d covers [d-6, d])
_DAU_DAYS = 7


@query(
    "q_rolling_dau",
    oracle=f"""
    WITH cal AS (
        SELECT UNNEST(GENERATE_SERIES(MIN(CAST(ts AS DATE)),
                                      MAX(CAST(ts AS DATE)),
                                      INTERVAL 1 DAY))::DATE AS day
        FROM events
    )
    SELECT c.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS dau7
    FROM cal c
    JOIN events e
      ON CAST(e.ts AS DATE) BETWEEN c.day - {_DAU_DAYS - 1} AND c.day
    GROUP BY c.day
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per calendar day — the metric
    whose naive form (COUNT(DISTINCT) over a sliding range frame) no
    engine's window operator supports and whose join form rescans every
    event once per covered day.

    Scale plan (linear, no day×event blowup): (1) reduce events to
    DISTINCT (user, day) — a key-only shuffle with map-side combine;
    (2) per-user interval merge with a >6-day gap rule (the sessionize
    lag/sum pattern, O(1) window state per user): a user active on days
    covering [a, b] contributes to every window-end in [a, b+6], and
    merged intervals of one user are disjoint BY CONSTRUCTION, so each
    user contributes at most once per day; (3) explode each merged
    interval into its covered days (bounded by the calendar span, not
    the event count) clipped to the data's max day, and count rows per
    day — no COUNT(DISTINCT) anywhere. The oracle states the
    declarative definition (calendar × 7-day range join + exact
    COUNT(DISTINCT)), so the interval plan is verified against the
    naive semantics it replaces.
    """
    return rolling_dau(table(spark, sf_dir, "events"))


def rolling_dau(ev: DataFrame) -> DataFrame:
    """Rolling-DAU interval plan over an events frame (shared with
    ``tools/scale_stress.py``)."""
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    per_user = W.partitionBy("user_id").orderBy("day")
    prev = F.lag("day").over(per_user)
    is_new = F.when(
        prev.isNull() | (F.datediff(F.col("day"), prev) > _DAU_DAYS - 1), 1
    ).otherwise(0)
    running = per_user.rowsBetween(W.unboundedPreceding, W.currentRow)
    grouped = ud.select(
        "user_id", "day", F.sum(is_new).over(running).alias("grp")
    )
    merged = grouped.groupBy("user_id", "grp").agg(
        F.min("day").alias("a"), F.max("day").alias("b")
    )
    cal_max = ev.agg(F.max(F.to_date("ts")).alias("cal_max"))
    covered = (
        merged.crossJoin(F.broadcast(cal_max))
        .select(
            F.explode(
                F.sequence(
                    F.col("a"),
                    F.least(F.date_add(F.col("b"), _DAU_DAYS - 1), F.col("cal_max")),
                    F.expr("interval 1 day"),
                )
            ).alias("day")
        )
    )
    return covered.groupBy("day").agg(F.count("*").cast("long").alias("dau7"))


# ---------------------------------------------------------------------------
# Point-in-time (SCD-2) dimension join
# ---------------------------------------------------------------------------


@query(
    "q_join_pit",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, island, MIN(ts) AS valid_from
        FROM ordered GROUP BY user_id, event_type, island
    ),
    hits AS (
        SELECT p.event_id, p.user_id, p.ts,
               r.event_type AS state_type, r.valid_from AS state_since,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY r.valid_from DESC, r.event_type DESC
               ) AS rn
        FROM events p
        JOIN runs r ON r.user_id = p.user_id AND r.valid_from <= p.ts
        WHERE p.event_type = 'purchase'
    )
    SELECT event_id, user_id, ts AS purchase_ts, state_type, state_since,
           CAST((epoch_us(ts) - epoch_us(state_since)) // 1000000 AS BIGINT)
               AS state_age_s
    FROM hits WHERE rn = 1
    """,
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD-2 dimension: each purchase is
    enriched with the user-state run (``q_scd2_intervals``' validity
    intervals) that was ACTIVE at purchase time — the
    no-future-leakage dimension lookup every feature-store backfill
    needs (joining today's dimension row onto last year's fact is the
    classic training-data leak).

    Scale shape — ONE shuffle, no interval range join: state intervals
    reduce to their start points carrying a (valid_from, state) struct;
    union with the facts, partition by user once, and a running
    ``max(struct)`` picks the latest state at-or-before each fact
    (struct ordering = valid_from DESC then state DESC, engine-exact
    tie-breaks; nulls from fact rows are ignored by max). Window state
    is one carried struct per key — the same cost envelope as the
    as-of family, where the naive form is a fact×runs range join. The
    oracle states that naive form and picks the same row with an
    explicit ROW_NUMBER, so the carried-state plan is verified against
    the declarative definition.
    """
    return pit_join(table(spark, sf_dir, "events"))


def pit_join(ev: DataFrame) -> DataFrame:
    """Point-in-time join plan over an events frame (shared with
    ``tools/scale_stress.py``)."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    island = F.row_number().over(
        W.partitionBy("user_id").orderBy(*order)
    ) - F.row_number().over(
        W.partitionBy("user_id", "event_type").orderBy(*order)
    )
    runs = (
        ev.select("user_id", "event_type", "ts", island.alias("island"))
        .groupBy("user_id", "event_type", "island")
        .agg(F.min("ts").alias("valid_from"))
    )
    points = runs.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.struct(
            F.col("valid_from").alias("since"), F.col("event_type").alias("st")
        ).alias("state"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("is_dim"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None)
        .cast("struct<since:timestamp_ntz,st:string>")
        .alias("state"),
        "event_id",
        F.lit(0).alias("is_dim"),
    )
    u = points.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "event_id",
        "user_id",
        "ts",
        "is_dim",
        F.max("state").over(w).alias("st"),
    ).filter(F.col("is_dim") == 0)
    age_s = F.expr(
        "(unix_micros(cast(ts as timestamp))"
        " - unix_micros(cast(st.since as timestamp))) DIV 1000000"
    )
    return carried.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("st.st").alias("state_type"),
        F.col("st.since").alias("state_since"),
        age_s.cast("long").alias("state_age_s"),
    )


# ---------------------------------------------------------------------------
# Time-to-convert distribution (funnel latency histogram)
# ---------------------------------------------------------------------------

#: histogram cap: delays at or beyond 48h collapse into one tail bucket
_TTC_CAP_H = 48


@query(
    "q_funnel_ttc",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) FILTER (event_type = 'click') AS c,
               MIN(ts) FILTER (event_type = 'purchase') AS p
        FROM events GROUP BY user_id
    ),
    delays AS (
        SELECT CASE WHEN p < c THEN -1
                    ELSE LEAST((epoch_us(p) - epoch_us(c)) // 3600000000,
                               {_TTC_CAP_H}) END AS bucket_h
        FROM firsts WHERE c IS NOT NULL AND p IS NOT NULL
    )
    SELECT CAST(bucket_h AS BIGINT) AS bucket_h,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
    FROM delays GROUP BY bucket_h
    """,
)
def q_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours between each user's FIRST
    click and FIRST purchase, bucketed into an hourly histogram with a
    48h+ tail bucket and a ``-1`` bucket for purchase-before-click users
    — the funnel-latency readout that sizes attribution windows (and
    motivated ``q_join_asof_tolerance``'s 1-hour choice).

    One conditional-min aggregation per user (a single shuffle on
    user_id computes both firsts — no self-join, no two passes), then a
    histogram aggregate whose key space is ≤50 buckets; the share
    normalization is an unbounded window over that tiny histogram, not
    the data. Time math is integer microseconds; share is one IEEE
    division of exact integers.
    """
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    both = firsts.filter(F.col("c").isNotNull() & F.col("p").isNotNull())
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    bucket = F.when(F.col("p") < F.col("c"), F.lit(-1)).otherwise(
        F.least(
            F.expr(
                "(unix_micros(cast(p as timestamp))"
                " - unix_micros(cast(c as timestamp))) DIV 3600000000"
            ),
            F.lit(_TTC_CAP_H),
        )
    )
    hist = both.select(bucket.cast("long").alias("bucket_h")).groupBy(
        "bucket_h"
    ).agg(F.count("*").cast("long").alias("n_users"))
    total_w = W.partitionBy()
    return hist.select(
        "bucket_h",
        "n_users",
        (F.col("n_users").cast("double") / F.sum("n_users").over(total_w)).alias(
            "share"
        ),
    )


# ---------------------------------------------------------------------------
# Seasonal (day-of-week) baseline + residual anomaly census
# ---------------------------------------------------------------------------


@query(
    "q_seasonal_baseline",
    oracle=f"""
    WITH base AS (
        SELECT event_type, DAYOFWEEK(ts) AS dow, value,
               CAST(value AS DECIMAL(18,2)) AS vq
        FROM events
    ),
    stats AS (
        SELECT event_type, dow, COUNT(*) AS n,
               CAST(SUM(vq) AS DOUBLE) / COUNT(*) AS mean,
               SQRT(CAST(SUM(vq * vq) AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(vq) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(vq) AS DOUBLE) / COUNT(*))) AS std
        FROM base GROUP BY event_type, dow
    )
    SELECT b.event_type, CAST(b.dow AS INT) AS dow,
           CAST(s.n AS BIGINT) AS n,
           {sql_canon(sql_dround("ANY_VALUE(s.mean)", 6))} AS mean,
           {sql_canon(sql_dround("ANY_VALUE(s.std)", 6))} AS std,
           CAST(SUM(CASE WHEN ABS(b.value - s.mean) > 3 * s.std
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM base b JOIN stats s
      ON b.event_type = s.event_type AND b.dow = s.dow
    GROUP BY b.event_type, b.dow, s.n
    """,
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal day-of-week baseline per event type — mean/std of the
    event value for each (type, weekday) cell — plus a 3σ residual
    anomaly census against that profile. Where ``q_anomaly_zscore``
    scores against a global per-type distribution, this is the
    seasonality-aware variant: a Saturday spike is judged against
    Saturdays.

    Same exact-moment machinery as ``q_embed_norm``: the testdata value
    column lives on the 2-decimal grid, so sums of DECIMAL(18,2) are
    exact and order-independent; mean/std derive from (Σv, Σv², n) with
    identical operand order in both engines, and the 5×7-cell stats
    table broadcasts back for the residual census (a map-side join).
    Key space is |types|×7 — bounded and skew-free at any scale.
    """
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        "value",
        F.col("value").cast("decimal(18,2)").alias("vq"),
    )
    dec = lambda c: F.sum(c).cast("double")  # noqa: E731
    mean = dec(F.col("vq")) / F.count("*")
    stats = base.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"),
        mean.alias("mean"),
        F.sqrt(
            dec(F.col("vq") * F.col("vq")) / F.count("*") - mean * mean
        ).alias("std"),
    )
    joined = base.join(F.broadcast(stats), ["event_type", "dow"])
    is_anom = F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std")
    return (
        joined.groupBy("event_type", "dow", "n")
        .agg(
            canon(dround(F.first("mean"), 6)).alias("mean"),
            canon(dround(F.first("std"), 6)).alias("std"),
            F.sum(F.when(is_anom, 1).otherwise(0)).cast("long").alias("n_anomalies"),
        )
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("n").cast("long").alias("n"),
            "mean",
            "std",
            "n_anomalies",
        )
    )


# ---------------------------------------------------------------------------
# Trajectory similarity search (REPOSE/ICDE'21-shaped top-k, long format)
# ---------------------------------------------------------------------------

#: fixed-point scale for the trajectory features (hour-of-day avg value)
_TRAJ_FP = 1_000_000
#: query users and neighbors returned per query
_TRAJ_QUERIES = (0, 1, 2)
_TRAJ_K = 5


@query(
    "q_trajectory_topk",
    oracle=f"""
    WITH traj AS (
        SELECT user_id, EXTRACT(HOUR FROM ts) AS b,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*) * {_TRAJ_FP} + 0.5) AS BIGINT) AS fp
        FROM events GROUP BY user_id, EXTRACT(HOUR FROM ts)
    ),
    norms AS (
        SELECT user_id, SUM(fp * fp) AS n2 FROM traj GROUP BY user_id
    ),
    dots AS (
        SELECT q.user_id AS q_user, c.user_id AS c_user,
               SUM(q.fp * c.fp) AS dot
        FROM traj q JOIN traj c ON q.b = c.b
        WHERE q.user_id IN {_TRAJ_QUERIES} AND c.user_id != q.user_id
        GROUP BY q.user_id, c.user_id
    ),
    scored AS (
        SELECT d.q_user, d.c_user,
               CAST(d.dot AS DOUBLE)
                   / SQRT(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE))
                   AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY d.q_user
                   ORDER BY CAST(d.dot AS DOUBLE)
                       / SQRT(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE))
                       DESC, d.c_user
               ) AS rn
        FROM dots d
        JOIN norms nq ON d.q_user = nq.user_id
        JOIN norms nc ON d.c_user = nc.user_id
    )
    SELECT q_user, c_user, CAST(rn AS INT) AS rank,
           {sql_canon(sql_dround("cos", 9))} AS cos
    FROM scored WHERE rn <= {_TRAJ_K}
    """,
)
def q_trajectory_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k trajectory similarity search (the REPOSE/ICDE'21 problem
    shape): each user's activity trajectory is their hour-of-day value
    profile; for each query user, the 5 most cosine-similar other
    users — behavioral twin matching over time-series profiles.

    Long-format throughout — trajectories never assemble into arrays:
    the dot product is an equi-join on the (bounded, 24-value) bucket
    key grouped by user pair, and norms are a per-user aggregate, so
    every shuffle keys on user ids or hour buckets with map-side
    partials. The query side is filtered to the 3 query users BEFORE
    the join (at 100 TB the optimizer broadcasts those ≤72 rows into
    the scan). Determinism: bucket averages quantize to fixed-point
    BIGINT (one identical rounding both engines); dot/norms are exact
    integer sums (DECIMAL(38,0)/HUGEINT); cosine is division +
    IEEE-correctly-rounded sqrt of identical operands; ranks tie-break
    on user id; presentation canon(dround(·, 9)).
    """
    ev = table(spark, sf_dir, "events")
    traj = (
        ev.select(
            "user_id",
            F.hour("ts").alias("b"),
            F.col("value").cast("decimal(18,2)").alias("vq"),
        )
        .groupBy("user_id", "b")
        .agg(
            F.floor(
                F.sum("vq").cast("double") / F.count("*") * _TRAJ_FP + F.lit(0.5)
            )
            .cast("long")
            .alias("fp")
        )
    )
    norms = traj.groupBy("user_id").agg(
        F.sum((F.col("fp") * F.col("fp")).cast("decimal(38,0)")).alias("n2")
    )
    q = traj.filter(F.col("user_id").isin(*_TRAJ_QUERIES)).select(
        F.col("user_id").alias("q_user"), "b", F.col("fp").alias("q_fp")
    )
    dots = (
        F.broadcast(q)
        .join(
            traj.select(F.col("user_id").alias("c_user"), "b", "fp"),
            "b",
        )
        .filter(F.col("c_user") != F.col("q_user"))
        .groupBy("q_user", "c_user")
        .agg(
            F.sum((F.col("q_fp") * F.col("fp")).cast("decimal(38,0)")).alias("dot")
        )
    )
    nq = norms.select(F.col("user_id").alias("q_user"), F.col("n2").alias("nq2"))
    nc = norms.select(F.col("user_id").alias("c_user"), F.col("n2").alias("nc2"))
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("nq2").cast("double") * F.col("nc2").cast("double")
    )
    scored = (
        dots.join(F.broadcast(nq), "q_user")
        .join(nc, "c_user")
        .select("q_user", "c_user", cos.alias("cos"))
    )
    rn = F.row_number().over(
        W.partitionBy("q_user").orderBy(F.col("cos").desc(), F.col("c_user").asc())
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= _TRAJ_K)
        .select(
            "q_user",
            "c_user",
            F.col("rank").cast("int").alias("rank"),
            canon(dround(F.col("cos"), 9)).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketch algebra (Spark's native DataSketches functions)
# ---------------------------------------------------------------------------

#: relative error budget asserted for the HLL estimates (the default
#: lgConfigK=12 gives ~1.6% standard error; 5% is a comfortable 3-sigma)
_HLL_EPS = 0.05


@query(
    "q_agg_hll_union",
    oracle=f"""
    SELECT o_orderpriority AS scope,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS est_in_bound
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT), TRUE
    FROM orders
    """,
)
def q_agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch algebra with Spark's native DataSketches HLL
    functions: per-priority customer sketches (``hll_sketch_agg``) whose
    UNION (``hll_union_agg``) answers the global distinct count WITHOUT
    re-touching the data — the property that lets 1000 executors (or 30
    daily partitions) each sketch locally and merge in O(sketch) time.
    This is the sketch-OBJECT surface ``q_agg_hll``'s
    approx_count_distinct hides.

    Correctness contract (the bound-asserted pattern of
    ``q_approx_audit``): the output carries the EXACT distinct counts
    plus an in-plan verdict that every estimate — per-group and merged
    — lands within 5%; the oracle asserts the verdicts TRUE, so a
    broken sketch or union hash-fails the gate even though DuckDB
    cannot evaluate the sketches themselves.
    """
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact"),
    )
    per_rows = per.select(
        F.col("o_orderpriority").alias("scope"),
        F.col("exact").cast("long").alias("exact_distinct"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact"))
            <= _HLL_EPS * F.col("exact")
        ).alias("est_in_bound"),
    )
    g_exact = o.agg(F.count_distinct("o_custkey").alias("gx"))
    g_row = (
        per.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("gest")
        )
        .crossJoin(F.broadcast(g_exact))
        .select(
            F.lit("ALL").alias("scope"),
            F.col("gx").cast("long").alias("exact_distinct"),
            (F.abs(F.col("gest") - F.col("gx")) <= _HLL_EPS * F.col("gx")).alias(
                "est_in_bound"
            ),
        )
    )
    return per_rows.unionByName(g_row)


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily series (time-series health stat)
# ---------------------------------------------------------------------------


@query(
    "q_event_autocorr",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lagged AS (
        SELECT event_type, c AS y,
               LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS x
        FROM daily
    ),
    moments AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
               SUM(x*x) AS sxx, SUM(y*y) AS syy
        FROM lagged WHERE x IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           {sql_canon(sql_dround(
               "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
               " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))", 9))}
               AS lag1_autocorr
    FROM moments
    """,
)
def q_event_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily count series —
    the is-this-series-momentum-or-noise statistic that decides whether
    yesterday predicts today (capacity planning, anomaly baselining).

    Exactness: the daily counts are INTEGERS, so every moment sum (Σx,
    Σy, Σxy, Σx², Σy²) accumulates exactly and order-independently; the
    Pearson formula then runs as one fixed sequence of IEEE ops on
    identical operands in both engines (sqrt is correctly rounded),
    presented via canon(dround(·, 9)). Plan: a (type × day) aggregate —
    bounded key space — then a lag window over the ~30-row-per-type
    daily series and a moments aggregate; nothing touches raw events
    after the first map-side-combining pass.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("c").alias("y"),
        F.lag("c").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    m = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    corr = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        canon(dround(corr, 9)).alias("lag1_autocorr"),
    )


@query(
    "q_session_entry_exit",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         > {6 * 3600 * 1_000_000}
                    OR LAG(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_seq,
               ARG_MIN(event_type, CAST(epoch_us(ts) AS HUGEINT)
                        * 1000000000 + event_id) AS entry_type,
               ARG_MAX(event_type, CAST(epoch_us(ts) AS HUGEINT)
                        * 1000000000 + event_id) AS exit_type,
               COUNT(*) AS n
        FROM numbered GROUP BY user_id, session_seq
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces
    FROM sessions GROUP BY entry_type, exit_type
    """,
)
def q_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit analysis over gap-sessionized activity: for every
    (first event type, last event type) pair, how many sessions flow
    that way and how many are single-event bounces — the landing→exit
    funnel census product analytics reads daily.

    Reuses the 6h gap-sessionization shuffle (ONE user_id exchange for
    the lag flag + running sum), then ``min_by``/``max_by`` on the
    (time, event_id) total order pick each session's endpoints inside
    the same per-session aggregate that counts the bounce flag; the
    final census keys on |types|² pairs. Endpoint ties are impossible
    by construction (event_id is unique within the order).
    """
    ev = table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    per_user = W.partitionBy("user_id").orderBy(*order)
    us = _micros("ts")
    lag_us = F.lag(us).over(per_user)
    is_new = F.when(
        lag_us.isNull() | ((us - lag_us) > F.lit(6 * 3600 * 1_000_000)), 1
    ).otherwise(0)
    running = per_user.rowsBetween(W.unboundedPreceding, W.currentRow)
    numbered = ev.select(
        "user_id",
        "event_type",
        "event_id",
        us.alias("us"),
        F.sum(is_new).over(running).alias("session_seq"),
    )
    # packed (time, id) total-order key in exact decimal — HUGEINT on
    # the DuckDB side; event ids stay below the 1e9 packing radix
    key = F.col("us").cast("decimal(38,0)") * 1_000_000_000 + F.col("event_id")
    sessions = numbered.groupBy("user_id", "session_seq").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
        F.count("*").alias("n"),
    )
    return sessions.groupBy("entry_type", "exit_type").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV triangle (acquisition month × months-since revenue)
# ---------------------------------------------------------------------------


@query(
    "q_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(DATE_TRUNC('month', CAST(o_orderdate AS DATE)))
                   AS cohort_month
        FROM orders GROUP BY o_custkey
    ),
    placed AS (
        SELECT f.cohort_month,
               (EXTRACT(YEAR FROM o.o_orderdate)
                - EXTRACT(YEAR FROM f.cohort_month)) * 12
               + (EXTRACT(MONTH FROM o.o_orderdate)
                  - EXTRACT(MONTH FROM f.cohort_month)) AS month_offset,
               o.o_custkey, o.o_totalprice
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT CAST(cohort_month AS VARCHAR) AS cohort_month,
           CAST(month_offset AS INT) AS month_offset,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS revenue
    FROM placed
    WHERE month_offset < 12
    GROUP BY cohort_month, month_offset
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort LTV triangle: customers grouped by acquisition month
    (their first order's month), revenue and active-customer counts per
    months-since-acquisition offset — the lifetime-value readout
    (``q_retention`` is its event-count sibling; this is the money
    version over orders), clipped to the first year.

    Two passes on the customer key sharing one shuffle shape: the
    first-order aggregate, then a broadcast-friendly join back (the
    cohort table is one row per customer — at 100 TB this is the
    shuffle join on the natural key both sides already hash by).
    Month arithmetic is integer year/month extraction — no date
    subtraction ambiguity — and revenue sums in exact decimal.
    """
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.trunc(F.to_date("o_orderdate"), "month")).alias("cohort_month")
    )
    joined = o.join(firsts, "o_custkey")
    offset = (
        (F.year(F.to_date("o_orderdate")) - F.year("cohort_month")) * 12
        + F.month(F.to_date("o_orderdate"))
        - F.month("cohort_month")
    )
    placed = joined.select(
        F.col("cohort_month"),
        offset.alias("month_offset"),
        "o_custkey",
        "o_totalprice",
    ).filter(F.col("month_offset") < 12)
    return placed.groupBy("cohort_month", "month_offset").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_active"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("string")
        .alias("revenue"),
    ).select(
        F.col("cohort_month").cast("string").alias("cohort_month"),
        F.col("month_offset").cast("int").alias("month_offset"),
        "n_active",
        "revenue",
    )


# ---------------------------------------------------------------------------
# Market-basket pair affinity (support / lift)
# ---------------------------------------------------------------------------

#: minimum co-occurrence support for a reported pair
_BASKET_MIN_AB = 3

#: basket-size cap: orders with more distinct items than this are dropped
#: from PAIR GENERATION (not from the support/total tables) — the df-cap
#: discipline of the dedup/link-prediction family (r14: same fix as
#: ``q_graph_common_neighbors``). TPC-H baskets are ≤ ~17 items at any
#: SF, so the cap only guards pathological skew: one registry-scraping
#: mega-order of d items would otherwise fan out O(d²) join rows.
_BASKET_MAX_ITEMS = 256


@query(
    "q_market_basket",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS total FROM op),
    part_n AS (SELECT l_partkey, COUNT(*) AS n FROM op GROUP BY l_partkey),
    small AS (
        SELECT l_orderkey FROM op GROUP BY l_orderkey
        HAVING COUNT(*) <= {_BASKET_MAX_ITEMS}
    ),
    capped AS (SELECT op.* FROM op JOIN small USING (l_orderkey)),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_ab
        FROM capped a JOIN capped b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_BASKET_MIN_AB}
    )
    SELECT p.part_a, p.part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
           {sql_canon(sql_dround(
               "CAST(p.n_ab AS DOUBLE) * t.total / (na.n * nb.n)", 9))}
               AS lift
    FROM pairs p
    JOIN part_n na ON p.part_a = na.l_partkey
    JOIN part_n nb ON p.part_b = nb.l_partkey
    CROSS JOIN n_orders t
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair affinity: parts co-purchased in the same order,
    scored by lift = P(ab) / (P(a)·P(b)) — >1 means the pair attracts,
    <1 repels — the association-mining readout behind
    bought-together recommendations (``q_topic_cooccur`` is its
    text-token sibling).

    Scale shape: candidates come from a SAME-ORDER self-join — Σ per
    order |items|², bounded by the ~7-line order size, so pair volume
    is linear in orders (never all-parts²); the (order, part) frame is
    DISTINCT'd first so duplicate lines can't inflate support. Lift is
    one ratio of exact integers times the order-count scalar
    (broadcast), presented via canon(dround(·, 9)).
    """
    return market_basket(table(spark, sf_dir, "lineitem"))


def market_basket(li: DataFrame) -> DataFrame:
    """Basket-affinity plan over a lineitem frame (shared with
    ``tools/scale_stress.py``)."""
    # localCheckpoint: the distinct (order, part) posting list feeds
    # FOUR consumers (order totals, part supports, the basket-size cap,
    # and — through capped — both pair-join sides); without it each
    # consumer re-runs the raw-lineitem distinct, which the r14 stress
    # run measured going supralinear (24.9x at 10x) the moment the cap
    # join added consumers. One materialized pass, same discipline as
    # common_neighbor_scores' co-purchase set.
    op = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    total = op.agg(
        F.count_distinct("l_orderkey").alias("total")
    )
    part_n = op.groupBy("l_partkey").agg(F.count("*").alias("n"))
    # Basket-size cap BEFORE the pair self-join (plan-asserted by
    # tests/test_plan_quality.py::test_pair_join_caps_precede_fanout):
    # a hot order fans out O(items²) pair rows, so the cap must prune
    # the posting list at the source, never post-join.
    small = (
        op.groupBy("l_orderkey")
        .agg(F.count("*").alias("bs"))
        .filter(F.col("bs") <= _BASKET_MAX_ITEMS)
        .select("l_orderkey")
    )
    capped = op.join(small, "l_orderkey", "left_semi")
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MIN_AB)
    )
    na = part_n.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    nb = part_n.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    lift = F.col("n_ab").cast("double") * F.col("total") / (
        F.col("na") * F.col("nb")
    )
    return (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            canon(dround(lift, 9)).alias("lift"),
        )
    )


@query(
    "q_peak_detection",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    ctx AS (
        SELECT event_type, day, c,
               LAG(c) OVER w AS prev_c,
               LEAD(c) OVER w AS next_c,
               AVG(c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                   AS trail
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, c,
           CAST(prev_c AS BIGINT) AS prev_c,
           CAST(next_c AS BIGINT) AS next_c
    FROM ctx
    WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
      AND c > prev_c AND c > next_c
      AND CAST(c AS DOUBLE) > 1.2 * trail
    """,
)
def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection over each event type's daily series: a day
    is a peak when it beats both neighbors AND runs >20% above its own
    7-day trailing mean — the spike-alerting primitive monitoring
    systems page on (strict local maximum filters plateau noise; the
    trailing-mean gate filters low-amplitude wiggle).

    One (type × day) aggregate then three window expressions over the
    SAME per-type ordering (one partition sort serves lag, lead, and
    the trailing frame). The trailing AVG divides an exact integer sum
    by an exact count in window-frame order — both engines evaluate
    the identical frame, so the 1.2× comparison classifies
    identically; outputs are all integers.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    w = W.partitionBy("event_type").orderBy("day")
    trail = W.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    ctx = daily.select(
        "event_type",
        "day",
        "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lead("c").over(w).alias("next_c"),
        F.avg("c").over(trail).alias("trail"),
    )
    return ctx.filter(
        F.col("prev_c").isNotNull()
        & F.col("next_c").isNotNull()
        & (F.col("c") > F.col("prev_c"))
        & (F.col("c") > F.col("next_c"))
        & (F.col("c").cast("double") > 1.2 * F.col("trail"))
    ).select("event_type", "day", "c", "prev_c", "next_c")


@query(
    "q_repurchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               DATE_DIFF('day',
                   LAG(CAST(o_orderdate AS DATE)) OVER
                       (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    )
    SELECT CAST(gap_days // 30 AS INT) AS gap_month_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY gap_days // 30
    """,
)
def q_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase-cycle distribution: days between each customer's
    consecutive orders, bucketed into 30-day bands — the
    inter-purchase-time histogram that sets reorder-reminder timing and
    churn thresholds (a customer past their band's max is churning).

    One customer-key shuffle serves the per-customer lag (orderkey
    tie-break pins equal-date orders); the census keys on ~50 month
    buckets. All integer date arithmetic.
    """
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    gaps = o.select(
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy(
        F.expr("gap_days DIV 30").cast("int").alias("gap_month_bucket")
    ).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_days"),
        F.max("gap_days").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Seasonality strength: share of daily variance explained by the weekday
# profile (one-way ANOVA R-squared)
# ---------------------------------------------------------------------------

#: fixed-order between-group sum written out per weekday so BOTH engines
#: evaluate the identical 7-term IEEE expression (no fold, no group-order
#: sensitivity); missing weekdays contribute exactly 0
_SEAS_TERMS = " + ".join(
    f"(CASE WHEN nd{d} > 0 THEN CAST(sd{d} AS DOUBLE) * sd{d} / nd{d}"
    f" ELSE 0.0 END)"
    for d in range(7)
)
_SEAS_COLS_SQL = ", ".join(
    f"SUM(CASE WHEN dow = {d} THEN c ELSE 0 END) AS sd{d},"
    f" SUM(CASE WHEN dow = {d} THEN 1 ELSE 0 END) AS nd{d}"
    for d in range(7)
)
_SEAS_R2 = (
    f"(({_SEAS_TERMS}) - CAST(tot_s AS DOUBLE) * tot_s / nrows)"
    " / (CAST(tot_s2 AS DOUBLE) - CAST(tot_s AS DOUBLE) * tot_s / nrows)"
)


@query(
    "q_seasonality_strength",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, DAYOFWEEK(ts) AS dow,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE), DAYOFWEEK(ts)
    ),
    m AS (
        SELECT event_type, COUNT(*) AS nrows, SUM(c) AS tot_s,
               SUM(c * c) AS tot_s2,
               {_SEAS_COLS_SQL}
        FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(nrows AS BIGINT) AS n_days,
           {sql_canon(sql_dround(_SEAS_R2, 9))} AS r2
    FROM m
    """,
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength per event type: the one-way-ANOVA R² of the
    weekday profile over daily counts — SS_between/SS_total, the share
    of day-to-day variance the weekly rhythm explains (≈1: schedule-
    driven; ≈0: weekday tells you nothing). The decision input for
    whether ``q_seasonal_baseline``'s profile is worth conditioning on.

    Determinism: every moment is an exact integer sum (daily counts are
    integers), and the between-group sum is UNROLLED into a fixed
    7-term expression — one per weekday, missing days contributing
    exactly 0 — so both engines evaluate the identical IEEE sequence
    with no group-order sensitivity; presented via canon(dround(·, 9)).
    Plan: a (type × day) aggregate, then a |types|-key census carrying
    16 conditional sums.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.dayofweek("ts") - 1).alias("dow"),
    ).agg(F.count("*").cast("long").alias("c"))
    aggs = [
        F.count("*").alias("nrows"),
        F.sum("c").alias("tot_s"),
        F.sum(F.col("c") * F.col("c")).alias("tot_s2"),
    ]
    for d in range(7):
        aggs.append(
            F.sum(F.when(F.col("dow") == d, F.col("c")).otherwise(0)).alias(
                f"sd{d}"
            )
        )
        aggs.append(
            F.sum(F.when(F.col("dow") == d, 1).otherwise(0)).alias(f"nd{d}")
        )
    m = daily.groupBy("event_type").agg(*aggs)
    return m.select(
        "event_type",
        F.col("nrows").cast("long").alias("n_days"),
        canon(dround(F.expr(_SEAS_R2), 9)).alias("r2"),
    )


@query(
    "q_agg_approx_topk",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN l_orderkey % 3
                    ELSE l_orderkey END AS k
        FROM lineitem
    ),
    exact AS (
        SELECT k, COUNT(*) AS c FROM keyed
        GROUP BY k ORDER BY c DESC, k LIMIT 3
    )
    SELECT k AS item, CAST(c AS BIGINT) AS exact_count, TRUE AS within_bounds
    FROM exact
    """,
)
def q_agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection via Spark 4.1's ``approx_top_k``
    (space-saving sketch: bounded tracked-item state, mergeable map-side
    partials — the frequency analogue of the HLL sketches). The key
    space is skewed in-plan (70% of rows fold onto 3 hot keys, the rest
    stay unique) so the sketch genuinely evicts cold items.

    hll-style verdict output (the ``q_agg_hll`` conversion): the emitted
    rows are the EXACT top-3 counts (DuckDB reproduces them; ties
    impossible by construction) and the sketch feeds a per-item
    ``within_bounds`` verdict — the sketch must report each true heavy
    hitter within 1% of N, else the hash-checked TRUE flips (a missed
    item nulls the estimate and flips it too). The exact side costs one
    aggregation at gate scale; the O(capacity)-state sketch is the
    100 TB story.
    """
    li = table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.expr(
            "CASE WHEN l_orderkey % 10 < 7 THEN l_orderkey % 3"
            " ELSE l_orderkey END"
        ).alias("k")
    )
    sk = keyed.agg(
        F.expr("approx_top_k(k, 3, 100)").alias("tk"),
        F.count("*").alias("n"),
    )
    est = sk.select(F.explode("tk").alias("e"), "n").select(
        F.col("e.item").alias("item"),
        F.col("e.count").alias("est"),
        "n",
    )
    exact = (
        keyed.groupBy("k")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "k")
        .limit(3)
    )
    return exact.join(F.broadcast(est), exact.k == est.item, "left").select(
        F.col("k").alias("item"),
        F.col("c").cast("long").alias("exact_count"),
        F.coalesce(
            F.abs(F.col("est") - F.col("c"))
            <= F.lit(0.01) * F.col("n"),
            F.lit(False),
        ).alias("within_bounds"),
    )


@query(
    "q_agg_topk_union",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN l_orderkey % 3
                    ELSE l_orderkey END AS k
        FROM lineitem
    ),
    exact AS (
        SELECT k, COUNT(*) AS c FROM keyed
        GROUP BY k ORDER BY c DESC, k LIMIT 3
    )
    SELECT k AS item, CAST(c AS BIGINT) AS exact_count, TRUE AS merge_exactly
    FROM exact
    """,
)
def q_agg_topk_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE heavy-hitter sketches: ``approx_top_k_accumulate`` one
    sketch per return-flag partition, ``approx_top_k_combine`` them, and
    ``approx_top_k_estimate`` the merged top-3 — the
    persist-partial-sketches-then-union pattern (the frequency analogue
    of ``q_agg_hll_union``): at 100 TB you store one tiny sketch per
    day/partition and answer "top items this quarter" without
    rescanning. Same skewed key space and hll-style verdict as
    ``q_agg_approx_topk``; here the verdict additionally pins that the
    MERGED estimate equals the exact count (capacity 100 per partial
    keeps the 3 heavy hitters exact through the merge), so a sketch-
    combine regression flips a hash-checked TRUE.
    """
    li = table(spark, sf_dir, "lineitem")
    keyed = li.select(
        "l_returnflag",
        F.expr(
            "CASE WHEN l_orderkey % 10 < 7 THEN l_orderkey % 3"
            " ELSE l_orderkey END"
        ).alias("k"),
    )
    per_group = keyed.groupBy("l_returnflag").agg(
        F.expr("approx_top_k_accumulate(k, 100)").alias("sk")
    )
    merged = per_group.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(sk, 100), 3)").alias(
            "top3"
        )
    )
    est = merged.select(F.explode("top3").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("est")
    )
    exact = (
        keyed.groupBy("k")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "k")
        .limit(3)
    )
    return exact.join(F.broadcast(est), exact.k == est.item, "left").select(
        F.col("k").alias("item"),
        F.col("c").cast("long").alias("exact_count"),
        F.coalesce(F.col("est") == F.col("c"), F.lit(False)).alias(
            "merge_exactly"
        ),
    )


#: KMV/theta sketch size (retained minimum hash values per set) and the
#: hash range: 60-bit md5 prefixes, so M = 16^15. Constants shared with
#: the oracle string so both engines build the identical sketch.
_THETA_K = 128
_THETA_M = 1 << 60

_THETA_SQL = f"""
    WITH cust AS (
        SELECT o_orderstatus AS st, o_custkey,
               CAST(CAST(('0x' || SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 15))
                    AS UBIGINT) AS BIGINT) AS h
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY 1, 2, 3
    ),
    ka AS (SELECT DISTINCT h FROM cust WHERE st = 'F' ORDER BY h LIMIT {_THETA_K}),
    kb AS (SELECT DISTINCT h FROM cust WHERE st = 'O' ORDER BY h LIMIT {_THETA_K}),
    ku AS (SELECT DISTINCT h FROM cust ORDER BY h LIMIT {_THETA_K}),
    st AS (
        SELECT
            (SELECT COUNT(*) FROM ka) AS na,
            (SELECT MAX(h) FROM ka) AS mha,
            (SELECT COUNT(*) FROM kb) AS nb,
            (SELECT MAX(h) FROM kb) AS mhb,
            (SELECT COUNT(*) FROM ku) AS nu,
            (SELECT MAX(h) FROM ku) AS mhu,
            (SELECT COUNT(DISTINCT o_custkey) FROM cust WHERE st = 'F') AS xa,
            (SELECT COUNT(DISTINCT o_custkey) FROM cust WHERE st = 'O') AS xb,
            (SELECT COUNT(DISTINCT o_custkey) FROM cust) AS xu,
            (SELECT COUNT(*) FROM (SELECT o_custkey FROM cust WHERE st = 'F'
                                   INTERSECT
                                   SELECT o_custkey FROM cust WHERE st = 'O')) AS xi,
            (SELECT COUNT(*) FROM (SELECT o_custkey FROM cust WHERE st = 'F'
                                   EXCEPT
                                   SELECT o_custkey FROM cust WHERE st = 'O')) AS xd
    ),
    th AS (
        SELECT *,
            CASE WHEN na < {_THETA_K} THEN {_THETA_M} ELSE mha END AS ta,
            CASE WHEN nb < {_THETA_K} THEN {_THETA_M} ELSE mhb END AS tb
        FROM st
    ),
    ti AS (
        SELECT CASE WHEN ta < tb THEN ta ELSE tb END AS ti FROM th
    ),
    th2 AS (
        SELECT th.*, ti.ti,
            (SELECT COUNT(*) FROM ka WHERE h IN (SELECT h FROM kb)
               AND h < ti.ti) AS ci,
            (SELECT COUNT(*) FROM ka WHERE h NOT IN (SELECT h FROM kb)
               AND h < ti.ti) AS cd
        FROM th CROSS JOIN ti
    )
    SELECT measure, exact_count, estimate FROM (
        SELECT 'a_f_status' AS measure, CAST(xa AS BIGINT) AS exact_count,
               CASE WHEN na < {_THETA_K} THEN CAST(na AS DOUBLE)
                    ELSE CAST({_THETA_K - 1} AS DOUBLE) * CAST({_THETA_M} AS DOUBLE)
                         / CAST(mha AS DOUBLE) END AS estimate
        FROM th2
        UNION ALL
        SELECT 'b_o_status', CAST(xb AS BIGINT),
               CASE WHEN nb < {_THETA_K} THEN CAST(nb AS DOUBLE)
                    ELSE CAST({_THETA_K - 1} AS DOUBLE) * CAST({_THETA_M} AS DOUBLE)
                         / CAST(mhb AS DOUBLE) END
        FROM th2
        UNION ALL
        SELECT 'union', CAST(xu AS BIGINT),
               CASE WHEN nu < {_THETA_K} THEN CAST(nu AS DOUBLE)
                    ELSE CAST({_THETA_K - 1} AS DOUBLE) * CAST({_THETA_M} AS DOUBLE)
                         / CAST(mhu AS DOUBLE) END
        FROM th2
        UNION ALL
        SELECT 'intersect', CAST(xi AS BIGINT),
               CAST(ci AS DOUBLE) * CAST({_THETA_M} AS DOUBLE) / CAST(ti AS DOUBLE)
        FROM th2
        UNION ALL
        SELECT 'diff_a_minus_b', CAST(xd AS BIGINT),
               CAST(cd AS DOUBLE) * CAST({_THETA_M} AS DOUBLE) / CAST(ti AS DOUBLE)
        FROM th2
    )
"""


@query("q_agg_theta", oracle=_THETA_SQL)
def q_agg_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET ALGEBRA over distinct-customer sets: union,
    intersection, and difference ESTIMATES from two k-minimum-values
    sketches (k=128, 60-bit md5 hashes), next to the exact counts — the
    capability HLL lacks (HLL unions but cannot intersect; theta
    sketches support the full algebra, which is why warehouse engines
    ship them for audience-overlap queries).

    Sketch math (Beyer et al. 2007 KMV; Dasgupta et al. 2016 theta):
    each set keeps its k smallest hash values; θ = k-th smallest (or M
    when unsaturated). Cardinality ≈ (k-1)·M/θ. Union: k smallest of
    the merged stream. Intersection/difference: count retained values
    below θ = min(θA, θB) that appear in both / only in A, scaled by
    M/θ. Everything is exact integer/double arithmetic on md5 hashes,
    so the DuckDB oracle hash-verifies the ESTIMATES bit-for-bit, not
    just the exact counts; the error-bound contract (rel. err within
    ~4/√k for the saturated sets) is asserted in
    ``tests/test_sketch_bounds.py``.

    Scale: per-set sketch building is ``ORDER BY h LIMIT k`` =
    TakeOrderedAndProject (per-partition top-k, merge of k-row
    partials — never a global sort); set algebra then runs on ≤k-row
    broadcast frames. At 100 TB the sketches are the only thing that
    moves: 128 longs per set, mergeable across days/shards.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    cust = o.select(
        F.col("o_orderstatus").alias("st"),
        "o_custkey",
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("h"),
    ).distinct()

    k, m = _THETA_K, _THETA_M
    ka = cust.filter(F.col("st") == "F").select("h").distinct().orderBy("h").limit(k)
    kb = cust.filter(F.col("st") == "O").select("h").distinct().orderBy("h").limit(k)
    ku = cust.select("h").distinct().orderBy("h").limit(k)

    def sketch_stats(kdf, prefix):
        return kdf.agg(
            F.count("*").alias(f"n{prefix}"), F.max("h").alias(f"mh{prefix}")
        )

    stats = (
        sketch_stats(ka, "a")
        .crossJoin(F.broadcast(sketch_stats(kb, "b")))
        .crossJoin(F.broadcast(sketch_stats(ku, "u")))
        .withColumn(
            "ta", F.when(F.col("na") < k, F.lit(m)).otherwise(F.col("mha"))
        )
        .withColumn(
            "tb", F.when(F.col("nb") < k, F.lit(m)).otherwise(F.col("mhb"))
        )
        .withColumn("ti", F.least("ta", "tb"))
    )
    # retained-set algebra below θ = min(θA, θB); sketches are ≤k rows
    theta_i = stats.select("ti")
    common = (
        ka.join(kb, "h", "semi")
        .crossJoin(F.broadcast(theta_i))
        .filter(F.col("h") < F.col("ti"))
        .agg(F.count("*").alias("ci"))
    )
    only_a = (
        ka.join(kb, "h", "anti")
        .crossJoin(F.broadcast(theta_i))
        .filter(F.col("h") < F.col("ti"))
        .agg(F.count("*").alias("cd"))
    )

    a_users = cust.filter(F.col("st") == "F").select("o_custkey").distinct()
    b_users = cust.filter(F.col("st") == "O").select("o_custkey").distinct()
    exact = (
        a_users.agg(F.count("*").alias("xa"))
        .crossJoin(F.broadcast(b_users.agg(F.count("*").alias("xb"))))
        .crossJoin(
            F.broadcast(
                cust.select("o_custkey").distinct().agg(F.count("*").alias("xu"))
            )
        )
        .crossJoin(
            F.broadcast(
                a_users.join(b_users, "o_custkey", "semi").agg(
                    F.count("*").alias("xi")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                a_users.join(b_users, "o_custkey", "anti").agg(
                    F.count("*").alias("xd")
                )
            )
        )
    )

    row = (
        stats.crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(only_a))
        .crossJoin(F.broadcast(exact))
    )
    md = F.lit(float(m))
    kd = F.lit(float(k - 1))

    def kmv_est(n, mh):
        return F.when(F.col(n) < k, F.col(n).cast("double")).otherwise(
            kd * md / F.col(mh).cast("double")
        )

    measures = [
        ("a_f_status", F.col("xa"), kmv_est("na", "mha")),
        ("b_o_status", F.col("xb"), kmv_est("nb", "mhb")),
        ("union", F.col("xu"), kmv_est("nu", "mhu")),
        (
            "intersect",
            F.col("xi"),
            F.col("ci").cast("double") * md / F.col("ti").cast("double"),
        ),
        (
            "diff_a_minus_b",
            F.col("xd"),
            F.col("cd").cast("double") * md / F.col("ti").cast("double"),
        ),
    ]
    out = None
    for name, ex, est in measures:
        part = row.select(
            F.lit(name).alias("measure"),
            ex.cast("long").alias("exact_count"),
            est.alias("estimate"),
        )
        out = part if out is None else out.unionAll(part)
    return out


@query(
    "q_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), st AS (
        SELECT event_type, d, c,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS t
        FROM daily
    ), cs AS (
        SELECT event_type, d, n, t,
               CAST(SUM(n * c - t) OVER (
                    PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS s
        FROM st
    )
    SELECT event_type, CAST(d AS VARCHAR) AS cp_day,
           s AS cusum_at_cp, n AS n_days, t AS n_events
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY ABS(s) DESC, d) AS rn
        FROM cs
    ) WHERE rn = 1
    """,
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint detection per event type: the day where
    the cumulative deviation from the series' own mean rate peaks — the
    classic single-changepoint estimator for 'when did the level
    shift?' over rate telemetry.

    Everything is EXACT integer arithmetic: with per-day counts c_i, n
    days and total t, the scaled deviation n·c_i − t replaces c_i − t/n
    (same argmax, no division), so the running sum, the |S| ranking,
    and the tie-break (earliest day) are bit-identical cross-engine —
    no float convention needed at all.

    Plan shape: one map-side-combined aggregation collapses the raw
    scan to (type × day) rows — bounded by the calendar, NOT the row
    count — and every window after that runs on the collapsed frame
    partitioned by type. At 100 TB the scan is the whole job; the
    changepoint math touches a few thousand rows.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    wt = W.partitionBy("event_type")
    st = daily.select(
        "event_type",
        "d",
        "c",
        F.count("*").over(wt).cast("long").alias("n"),
        F.sum("c").over(wt).cast("long").alias("t"),
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cs = st.select(
        "event_type",
        "d",
        "n",
        "t",
        F.sum(F.col("n") * F.col("c") - F.col("t"))
        .over(wcum)
        .cast("long")
        .alias("s"),
    )
    wpick = W.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.col("d")
    )
    return (
        cs.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").cast("string").alias("cp_day"),
            F.col("s").alias("cusum_at_cp"),
            F.col("n").alias("n_days"),
            F.col("t").alias("n_events"),
        )
    )


@query(
    "q_interpolate_gapfill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
    ), bounds AS (
        SELECT DATE_TRUNC('hour', MIN(ts)) AS lo,
               DATE_TRUNC('hour', MAX(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), g AS (
        SELECT t.event_type, s.bucket, h.c
        FROM spine s CROSS JOIN types t
        LEFT JOIN hourly h
          ON h.event_type = t.event_type AND h.bucket = s.bucket
    ), f AS (
        SELECT event_type, bucket, c,
               LAST_VALUE(c IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               LAST_VALUE(CASE WHEN c IS NOT NULL THEN epoch_us(bucket) END
                          IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
               FIRST_VALUE(c IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN c IS NOT NULL THEN epoch_us(bucket) END
                           IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM g
    )
    SELECT event_type, CAST(bucket AS TIMESTAMP) AS bucket,
           (c IS NULL) AS filled,
           CAST(FLOOR(
               CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                    WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
                    WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
                    ELSE CAST(pv AS DOUBLE)
                         + CAST(nv - pv AS DOUBLE)
                           * (CAST(epoch_us(bucket) - pb AS DOUBLE)
                              / CAST(nb - pb AS DOUBLE))
               END * 1000000 + 0.5) AS BIGINT) AS rate_fp
    FROM f
    """,
)
def q_interpolate_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid gap filling with LINEAR interpolation: hourly event
    rates per type on a full spine, holes filled by the straight line
    between the nearest observed neighbours (edges extend flat) — the
    step beyond ``q_resample_timeseries``'s zero-fill that forecasting
    and rate-limit pipelines want when a quiet hour means 'no sample',
    not 'rate zero'.

    Determinism: neighbour values/positions come from IGNORE NULLS
    window frames (exact), and the interpolated value pv + (nv−pv)·Δ/Δ
    is evaluated in the same operand order both engines, then
    fixed-pointed via the repo's FLOOR(x·1e6 + 0.5) convention —
    integer-valued doubles in, one rounded BIGINT out.

    Plan shape: one aggregation collapses the scan to (type × hour);
    the spine is two scalar aggregates + a broadcast sequence; the four
    neighbour windows run on the collapsed calendar-bounded frame. The
    raw scan is touched once; everything after is O(hours × types).
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").cast("long").alias("c"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "bucket"
        )
    ).select(F.col("bucket").cast("timestamp_ntz").alias("bucket"))
    types = ev.select("event_type").distinct()
    hourly = hourly.select(
        "event_type", F.col("bucket").cast("timestamp_ntz").alias("bucket"), "c"
    )
    g = (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["event_type", "bucket"], "left")
    )
    wp = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    us = _micros("bucket")
    mark = F.when(F.col("c").isNotNull(), us)
    f = g.select(
        "event_type",
        "bucket",
        "c",
        F.last("c", ignorenulls=True).over(wp).alias("pv"),
        F.last(mark, ignorenulls=True).over(wp).alias("pb"),
        F.first("c", ignorenulls=True).over(wn).alias("nv"),
        F.first(mark, ignorenulls=True).over(wn).alias("nb"),
    )
    interp = (
        F.when(F.col("c").isNotNull(), F.col("c").cast("double"))
        .when(F.col("pv").isNull(), F.col("nv").cast("double"))
        .when(F.col("nv").isNull(), F.col("pv").cast("double"))
        .otherwise(
            F.col("pv").cast("double")
            + (F.col("nv") - F.col("pv")).cast("double")
            * (
                (us - F.col("pb")).cast("double")
                / (F.col("nb") - F.col("pb")).cast("double")
            )
        )
    )
    return f.select(
        "event_type",
        "bucket",
        F.col("c").isNull().alias("filled"),
        F.floor(interp * 1_000_000 + F.lit(0.5)).cast("long").alias("rate_fp"),
    )


@query(
    "q_drift_ks",
    oracle="""
    WITH pts AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS s1,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS s2
        FROM orders WHERE o_orderstatus IN ('F', 'O')
    ), census AS (
        SELECT v, CAST(SUM(s1) AS BIGINT) AS c1, CAST(SUM(s2) AS BIGINT) AS c2
        FROM pts GROUP BY v
    ), cum AS (
        SELECT v,
               SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
               SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2,
               SUM(c1) OVER () AS n1,
               SUM(c2) OVER () AS n2
        FROM census
    )
    SELECT CAST(v AS BIGINT) AS at_cents,
           CAST(ABS(f1 * n2 - f2 * n1) AS BIGINT) AS d_num,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(FLOOR(CAST(ABS(f1 * n2 - f2 * n1) AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                * 1000000) AS BIGINT) AS ks_fp
    FROM cum
    ORDER BY ABS(f1 * n2 - f2 * n1) DESC, v
    LIMIT 1
    """,
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test in EXACT integer
    arithmetic: the KS statistic between the F- and O-status price
    distributions is max_v |F1(v)·n2 − F2(v)·n1| / (n1·n2); the argmax
    and the numerator are computed entirely in int64 (products bounded
    by n1·n2 — exact to ~3e9 rows per side, the same envelope as the
    AUC rank products), with the float division deferred to ONE
    fixed-point presentation column at the very end. Complements
    ``q_drift_kl``'s binned divergence with the classic
    distribution-free statistic drift monitors page on.

    Plan shape (the repo's banded-rank template): per-cent-value census
    (map-side combined, key space = distinct prices), band totals over
    ``v DIV 2^20`` (price-range-bounded band table — the ONLY
    unpartitioned window runs on it), within-band running sums in
    parallel, broadcast offsets + totals, then a TakeOrdered(1) for the
    argmax. No single-task sort over row-scale data anywhere.
    """
    pts = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("s1"),
            F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("s2"),
        )
    )
    census = pts.groupBy("v").agg(
        F.sum("s1").cast("long").alias("c1"),
        F.sum("s2").cast("long").alias("c2"),
    ).withColumn("__band", F.expr("v DIV 1048576"))
    band_tot = census.groupBy("__band").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    offw = W.orderBy("__band").rowsBetween(W.unboundedPreceding, -1)
    offsets = band_tot.select(
        "__band",
        F.coalesce(F.sum("b1").over(offw), F.lit(0)).cast("long").alias("o1"),
        F.coalesce(F.sum("b2").over(offw), F.lit(0)).cast("long").alias("o2"),
    )
    tot = census.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    inw = (
        W.partitionBy("__band")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        census.select(
            "__band",
            "v",
            F.sum("c1").over(inw).alias("w1"),
            F.sum("c2").over(inw).alias("w2"),
        )
        .join(F.broadcast(offsets), "__band")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            ((F.col("o1") + F.col("w1")) * F.col("n2")
             - (F.col("o2") + F.col("w2")) * F.col("n1")).alias("diff"),
            "n1",
            "n2",
        )
    )
    return (
        cum.select(
            "v", F.abs("diff").cast("long").alias("d_num"), "n1", "n2"
        )
        .orderBy(F.col("d_num").desc(), "v")
        .limit(1)
        .select(
            F.col("v").alias("at_cents"),
            "d_num",
            "n1",
            "n2",
            F.floor(
                F.col("d_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
                * 1_000_000
            )
            .cast("long")
            .alias("ks_fp"),
        )
    )


@query(
    "q_join_scd2",
    oracle="""
    WITH status AS (
        SELECT user_id, event_type, ts, event_id
        FROM events WHERE event_type IN ('signup', 'purchase', 'error')
    ), runs AS (
        SELECT user_id, event_type, island, MIN(ts) AS valid_from
        FROM (
            SELECT user_id, event_type, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                 - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS island
            FROM status
        )
        GROUP BY user_id, event_type, island
    ), dim AS (
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from, event_type)
                   AS valid_to
        FROM runs
    ), facts AS (
        SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT COALESCE(d.event_type, 'none') AS status,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           CAST(SUM(f.cents) AS BIGINT) AS sum_cents
    FROM facts f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY COALESCE(d.event_type, 'none')
    """,
)
def q_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 temporal join: each click/view fact joins the status
    interval (signup/purchase/error run, gaps-and-islands collapsed)
    VALID at its event time — the dimension-versioning join every
    warehouse does when facts must see the attribute as-of the fact,
    not as-of today. Half-open intervals make the match unique by
    construction (equal-start collisions produce empty intervals, never
    overlaps); pre-status facts keep a 'none' bucket via the left join.

    Plan shape: the dimension build is one shuffle on user_id (both
    row_numbers, the run aggregate, and the lead reuse it); the join is
    an equi-join ON user_id with the interval bounds as residual
    filters — per-user interval lists are change-rate-bounded, so the
    join state per key stays small at any fact volume. Value cents are
    exact BIGINTs.
    """
    ev = table(spark, sf_dir, "events")
    status = ev.filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    island = F.row_number().over(
        W.partitionBy("user_id").orderBy(*order)
    ) - F.row_number().over(
        W.partitionBy("user_id", "event_type").orderBy(*order)
    )
    runs = (
        status.select("user_id", "event_type", "ts", island.alias("island"))
        .groupBy("user_id", "event_type", "island")
        .agg(F.min("ts").alias("valid_from"))
    )
    dim = runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from")
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("valid_from").asc(), F.col("event_type").asc()
            )
        )
        .alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    j = facts.alias("f").join(
        dim.alias("d"),
        (F.col("f.user_id") == F.col("d.user_id"))
        & (F.col("f.ts") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col("f.ts") < F.col("d.valid_to"))),
        "left",
    )
    return j.groupBy(
        F.coalesce(F.col("d.event_type"), F.lit("none")).alias("status")
    ).agg(
        F.count("*").cast("long").alias("n_facts"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
