"""Statistical inference and forecasting operators: chi-squared
independence (with Cramér's V), mutual information between categorical
columns, Kaplan–Meier survival curves, the Mann–Kendall trend test, and
Holt double exponential smoothing.

Every query follows the repo's census-first determinism discipline:
the only row-scale pass is ONE map-side-combined groupBy onto a
bounded key space (contingency cells, month buckets, per-value tie
counts); all statistics then assemble on the tiny census with exact
int64 arithmetic, and any transcendental term (LOG2) is quantized to
fixed-point BIGINT per-term BEFORE the reduction so the sum is
order-independent and engine-identical — the ``q_entropy_ngrams`` /
``q_drift_kl`` convention.

Reference parity note: the reference connector
(/root/reference/src/pyspark_datasource/excel/connector.py) has no
statistics surface at all; these operators extend SURVEY.md §2.4's
north-star analytics family (drift/eval ops) with the classical
inference tests a data-quality pipeline runs on corpus metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..plans.registry import query

#: fixed-point presentation scale (6 exact decimals), shared with the
#: entropy/KL family so cross-query numbers compare directly.
_FP = 1_000_000


@query(
    "q_chi2_independence",
    oracle=f"""
    WITH cells AS (
        SELECT o_orderstatus AS x, o_orderpriority AS y,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT x, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY x),
    ct AS (SELECT y, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY y),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT rt.x, ct.y, rt.r, ct.c, n.n, COALESCE(cells.o, 0) AS o
        FROM rt CROSS JOIN ct CROSS JOIN n
        LEFT JOIN cells ON cells.x = rt.x AND cells.y = ct.y
    ),
    terms AS (
        SELECT x, y, n,
               CAST(FLOOR(
                   CAST(o * n - r * c AS DOUBLE)
                   * CAST(o * n - r * c AS DOUBLE)
                   / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                      * CAST(n AS DOUBLE))
                   / CAST(n AS DOUBLE)
                   * {_FP} + 0.5) AS BIGINT) AS cell_fp
        FROM grid
    ),
    agg AS (
        SELECT MAX(n) AS n,
               CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
               CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y,
               CAST(SUM(cell_fp) AS BIGINT) AS chi2_fp
        FROM terms
    )
    SELECT n, n_x, n_y, (n_x - 1) * (n_y - 1) AS dof, chi2_fp,
           CAST(FLOOR(SQRT(
               CAST(chi2_fp AS DOUBLE) / {_FP}.0
               / CAST(n * LEAST(n_x - 1, n_y - 1) AS DOUBLE))
               * {_FP} + 0.5) AS BIGINT) AS cramers_v_fp
    FROM agg
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between order status and
    order priority, plus Cramér's V effect size — the screening test a
    pipeline runs to detect leakage between a label column and a
    metadata column before training on it.

    Exactness: each cell's (O·N − R·C) numerator is exact int64 (exact
    while N·max(O) < 2⁶³, i.e. to ~3e9 rows — the AUC rank-product
    envelope); the per-cell χ² contribution is ONE fixed double tree
    over those integers quantized to BIGINT, so the integer sum is
    reduction-order-independent. Absent cells are restored by the
    marginal grid cross join (they contribute R·C/N², not zero).

    Scale: the only row-scale pass is the (status × priority) census —
    map-side combined onto |statuses|·|priorities| keys; everything
    after runs on ≤15 rows (broadcast grid join of two marginal
    tables). No shuffle grows with data size.
    """
    return chi2_frame(table(spark, sf_dir, "orders"))


def chi2_frame(orders: DataFrame) -> DataFrame:
    """The χ² plan on an arbitrary orders frame — split out so
    ``tools/scale_stress.py`` can run the census shape on replicated
    input."""
    # localCheckpoint: the census is |statuses|x|priorities| rows but
    # feeds FOUR consumers (rt, ct, n, grid left-join) — without it the
    # plan re-scans orders once per consumer (seen in PLANS.md)
    cells = (
        orders
        .groupBy(
            F.col("o_orderstatus").alias("x"),
            F.col("o_orderpriority").alias("y"),
        )
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint()
    )
    rt = cells.groupBy("x").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("y").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(cells), ["x", "y"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    num = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    cell_fp = F.floor(
        num.cast("double")
        * num.cast("double")
        / (
            F.col("r").cast("double")
            * F.col("c").cast("double")
            * F.col("n").cast("double")
        )
        / F.col("n").cast("double")
        * _FP
        + F.lit(0.5)
    ).cast("long")
    nx = F.countDistinct("x").cast("long")
    ny = F.countDistinct("y").cast("long")
    agg = grid.agg(
        F.max("n").alias("n"),
        nx.alias("n_x"),
        ny.alias("n_y"),
        F.sum(cell_fp).cast("long").alias("chi2_fp"),
    )
    return agg.select(
        "n",
        "n_x",
        "n_y",
        ((F.col("n_x") - 1) * (F.col("n_y") - 1)).alias("dof"),
        "chi2_fp",
        F.floor(
            F.sqrt(
                F.col("chi2_fp").cast("double")
                / float(_FP)
                / (
                    F.col("n")
                    * F.least(F.col("n_x") - 1, F.col("n_y") - 1)
                ).cast("double")
            )
            * _FP
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cramers_v_fp"),
    )


@query(
    "q_mutual_info",
    oracle=f"""
    WITH base AS (
        SELECT c_mktsegment AS x, n_name AS y
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    cells AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS nxy
        FROM base GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY y),
    n AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells),
    mi AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   (CAST(nxy AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * LOG2(CAST(nxy AS DOUBLE) * CAST(n.n AS DOUBLE)
                          / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
                   * {_FP} + 0.5) AS BIGINT)) AS BIGINT) AS mi_fp,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM cells
        JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
    ),
    hx AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   -(CAST(nx AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * LOG2(CAST(nx AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * {_FP} + 0.5) AS BIGINT)) AS BIGINT) AS h_seg_fp
        FROM mx CROSS JOIN n
    ),
    hy AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   -(CAST(ny AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * LOG2(CAST(ny AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * {_FP} + 0.5) AS BIGINT)) AS BIGINT) AS h_nat_fp
        FROM my CROSS JOIN n
    )
    SELECT n.n AS n, mi.n_cells, mi.mi_fp, hx.h_seg_fp, hy.h_nat_fp,
           CAST(FLOOR(CAST(mi.mi_fp AS DOUBLE)
                / CAST(LEAST(hx.h_seg_fp, hy.h_nat_fp) AS DOUBLE)
                * {_FP} + 0.5) AS BIGINT) AS nmi_fp
    FROM n CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between market segment and nation, with
    both marginal entropies and the normalized MI — the dependence
    score feature-selection and redundancy pruning rank categorical
    columns by (chi-squared's information-theoretic sibling; MI is what
    the dedup/mix pipelines use to decide whether two metadata columns
    encode the same signal).

    Determinism: every LOG2 term is quantized to fixed-point BIGINT
    before its SUM (order-independent, the ``q_entropy_ngrams``
    convention); the final NMI division is one double over two already
    -quantized integers. Zero cells contribute 0 to MI by definition,
    so the absent-cell grid restore chi-squared needs is NOT needed
    here — the census rows alone are the support.

    Scale: one map-side-combined census onto |segments|·|nations| keys
    (the broadcast nation join adds no shuffle); marginals and the
    three reductions all run on ≤125 rows.
    """
    c = table(spark, sf_dir, "customer")
    nn = table(spark, sf_dir, "nation")
    base = c.join(
        F.broadcast(nn), c.c_nationkey == nn.n_nationkey
    ).select(F.col("c_mktsegment").alias("x"), F.col("n_name").alias("y"))
    # localCheckpoint: <=|segments|x|nations| rows, four consumers —
    # one customer scan instead of four (same rationale as chi2_frame)
    cells = (
        base.groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("nxy"))
        .localCheckpoint()
    )
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("long").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").cast("long").alias("ny"))
    n = cells.agg(F.sum("nxy").cast("long").alias("n"))

    def _h_term(cnt: str) -> F.Column:
        p = F.col(cnt).cast("double") / F.col("n").cast("double")
        return F.floor(-p * F.log2(p) * _FP + F.lit(0.5)).cast("long")

    mi_term = F.floor(
        (F.col("nxy").cast("double") / F.col("n").cast("double"))
        * F.log2(
            F.col("nxy").cast("double")
            * F.col("n").cast("double")
            / (F.col("nx").cast("double") * F.col("ny").cast("double"))
        )
        * _FP
        + F.lit(0.5)
    ).cast("long")
    mi = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(mi_term).cast("long").alias("mi_fp"),
            F.count("*").cast("long").alias("n_cells"),
        )
    )
    hx = mx.crossJoin(F.broadcast(n)).agg(
        F.sum(_h_term("nx")).cast("long").alias("h_seg_fp")
    )
    hy = my.crossJoin(F.broadcast(n)).agg(
        F.sum(_h_term("ny")).cast("long").alias("h_nat_fp")
    )
    return (
        n.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            "n_cells",
            "mi_fp",
            "h_seg_fp",
            "h_nat_fp",
            F.floor(
                F.col("mi_fp").cast("double")
                / F.least(F.col("h_seg_fp"), F.col("h_nat_fp")).cast(
                    "double"
                )
                * _FP
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nmi_fp"),
        )
    )


@query(
    "q_survival_km",
    oracle=f"""
    WITH pts AS (
        SELECT DATE_DIFF('day', CAST(o_orderdate AS DATE),
                         DATE '2001-08-01') // 30 AS t,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        FROM orders
    ),
    census AS (
        SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS censored
        FROM pts GROUP BY t
    ),
    risk AS (
        SELECT t, d, censored,
               SUM(d + censored) OVER (
                   ORDER BY t ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING) AS n_at_risk
        FROM census
    ),
    terms AS (
        SELECT t, d, censored, CAST(n_at_risk AS BIGINT) AS n_at_risk,
               CASE WHEN d > 0 AND n_at_risk > d THEN CAST(FLOOR(
                   LOG2(CAST(n_at_risk - d AS DOUBLE)
                        / CAST(n_at_risk AS DOUBLE))
                   * {_FP} + 0.5) AS BIGINT) END AS term_fp,
               CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END AS dead
        FROM risk
    )
    SELECT t AS t_month, d, censored, n_at_risk,
           CAST(SUM(term_fp) OVER (
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS log2_surv_fp,
           CAST(MAX(dead) OVER (
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS INT) AS surv_zero
    FROM terms
    """,
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate over order lifetimes: orders
    "fail" (event) at their age in 30-day months when finalized
    (status F) and are right-censored at the same age otherwise —
    the classic churn/retention curve, here in the log2 domain so the
    product-limit estimator becomes an exact prefix SUM of per-month
    fixed-point terms (log2 S(t) = Σ log2(1 − d/n); quantize-then-sum
    makes the cumulative column engine-identical, where a direct
    product of doubles would depend on reduction order).

    Per month: d (events), censored, n_at_risk (suffix sum = everyone
    surviving to t), the cumulative log2-survival, and a ``surv_zero``
    flag from the month the estimator hits zero (d = n).

    Scale: one map-side-combined census onto ~|months| keys; the two
    unpartitioned windows (at-risk suffix sum, KM prefix sum) run on
    the month census, bounded by the time span — never by row count —
    so the single task sees ≤ a few hundred rows at ANY data scale
    (justified in tests/test_plan_quality.py UNPARTITIONED_WINDOW_OK).
    """
    pts = table(spark, sf_dir, "orders").select(
        F.expr(
            "datediff(DATE '2001-08-01', CAST(o_orderdate AS DATE)) DIV 30"
        ).alias("t"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
    )
    census = (
        pts.groupBy("t")
        .agg(
            F.sum("ev").cast("long").alias("d"),
            F.sum(F.lit(1) - F.col("ev")).cast("long").alias("censored"),
        )
        # |months| rows; both windows and the final select read it
        .localCheckpoint()
    )
    w_suffix = W.orderBy("t").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_prefix = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = census.withColumn(
        "n_at_risk",
        F.sum(F.col("d") + F.col("censored")).over(w_suffix).cast("long"),
    )
    term = F.when(
        (F.col("d") > 0) & (F.col("n_at_risk") > F.col("d")),
        F.floor(
            F.log2(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * _FP
            + F.lit(0.5)
        ).cast("long"),
    )
    dead = F.when(F.col("d") >= F.col("n_at_risk"), 1).otherwise(0)
    return risk.select(
        F.col("t").alias("t_month"),
        "d",
        "censored",
        "n_at_risk",
        F.sum(term).over(w_prefix).cast("long").alias("log2_surv_fp"),
        F.max(dead).over(w_prefix).cast("int").alias("surv_zero"),
    )


@query(
    "q_trend_mann_kendall",
    oracle=f"""
    WITH census AS (
        SELECT o_orderpriority AS priority,
               STRFTIME(o_orderdate, '%Y-%m') AS m,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1, 2
    ),
    s AS (
        SELECT a.priority,
               CAST(SUM(CAST(SIGN(b.x - a.x) AS BIGINT)) AS BIGINT)
                   AS s_stat
        FROM census a JOIN census b
          ON a.priority = b.priority AND a.m < b.m
        GROUP BY a.priority
    ),
    ties AS (
        SELECT priority,
               CAST(SUM(tv * (tv - 1) * (2 * tv + 5)) AS BIGINT) AS tie18,
               CAST(SUM(tv * (tv - 1) / 2) AS BIGINT) AS tx
        FROM (SELECT priority, x, CAST(COUNT(*) AS BIGINT) AS tv
              FROM census GROUP BY 1, 2)
        GROUP BY priority
    ),
    nm AS (
        SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months
        FROM census GROUP BY priority
    ),
    j AS (
        SELECT nm.priority, n_months, s_stat,
               n_months * (n_months - 1) * (2 * n_months + 5) - tie18
                   AS var18,
               n_months * (n_months - 1) / 2 AS n0, tx
        FROM nm JOIN s USING (priority) JOIN ties USING (priority)
    )
    SELECT priority, n_months, s_stat, var18,
           CAST(FLOOR(CAST(s_stat AS DOUBLE)
                / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 AS DOUBLE))
                * {_FP} + 0.5) AS BIGINT) AS tau_fp,
           CASE
             WHEN s_stat > 0 THEN CAST(FLOOR(
                 CAST(s_stat - 1 AS DOUBLE)
                 / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                 * {_FP} + 0.5) AS BIGINT)
             WHEN s_stat < 0 THEN CAST(FLOOR(
                 CAST(s_stat + 1 AS DOUBLE)
                 / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                 * {_FP} + 0.5) AS BIGINT)
             ELSE 0
           END AS z_fp
    FROM j
    ORDER BY priority
    """,
)
def q_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per order priority over the monthly
    order-count series: S = Σ_{i<j} sign(x_j − x_i), the tie-corrected
    variance (×18 to stay integer: Var·18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5)),
    Kendall's tau-b, and the continuity-corrected z — the
    distribution-free "is this metric drifting over time" monitor that
    complements ``q_drift_ks`` (two-sample) with a monotone-trend view.

    Exactness: S, the tie terms, and Var·18 are pure int64; tau and z
    are each ONE fixed double tree over those integers, floor-quantized
    to fixed point.

    Scale: the row-scale pass is the (priority, month) census — map-side
    combined, key space = priorities × months (time-bounded, NOT
    row-bounded). The O(months²) pair join runs on that census
    (~80 months → ~3k pairs per priority) via a broadcast self-join;
    at 100 TB the census is the same size, so the quadratic stage is
    constant-cost by construction.
    """
    return mann_kendall_frame(table(spark, sf_dir, "orders"))


def mann_kendall_frame(orders: DataFrame) -> DataFrame:
    """The Mann–Kendall plan on an arbitrary orders frame — split out
    so ``tools/scale_stress.py`` can run the census + bounded-pair-join
    shape on replicated input."""
    # localCheckpoint: priority x month census, three consumers (pair
    # join sides, tie counts, month counts) — one orders scan, not four
    census = (
        orders
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        )
        .agg(F.count("*").cast("long").alias("x"))
        .localCheckpoint()
    )
    a = census.alias("a")
    b = census.alias("b")
    s = (
        a.join(
            F.broadcast(b),
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.m") < F.col("b.m")),
        )
        .groupBy(F.col("a.priority").alias("priority"))
        .agg(
            F.sum(F.signum(F.col("b.x") - F.col("a.x")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        census.groupBy("priority", "x")
        .agg(F.count("*").cast("long").alias("tv"))
        .groupBy("priority")
        .agg(
            F.sum(
                F.col("tv") * (F.col("tv") - 1) * (2 * F.col("tv") + 5)
            )
            .cast("long")
            .alias("tie18"),
            F.sum(F.col("tv") * (F.col("tv") - 1) / 2)
            .cast("long")
            .alias("tx"),
        )
    )
    nm = census.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_months")
    )
    nmo = F.col("n_months")
    j = (
        nm.join(F.broadcast(s), "priority")
        .join(F.broadcast(ties), "priority")
        .select(
            "priority",
            "n_months",
            "s_stat",
            (nmo * (nmo - 1) * (2 * nmo + 5) - F.col("tie18")).alias(
                "var18"
            ),
            (nmo * (nmo - 1) / 2).cast("long").alias("n0"),
            "tx",
        )
    )
    sd = F.col("s_stat").cast("double")
    z_den = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    return j.select(
        "priority",
        "n_months",
        "s_stat",
        "var18",
        F.floor(
            sd
            / F.sqrt(
                (F.col("n0") - F.col("tx")).cast("double")
                * F.col("n0").cast("double")
            )
            * _FP
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tau_fp"),
        F.when(
            F.col("s_stat") > 0,
            F.floor(
                (F.col("s_stat") - 1).cast("double") / z_den * _FP
                + F.lit(0.5)
            ).cast("long"),
        )
        .when(
            F.col("s_stat") < 0,
            F.floor(
                (F.col("s_stat") + 1).cast("double") / z_den * _FP
                + F.lit(0.5)
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("z_fp"),
    ).orderBy("priority")


#: Holt smoothing factors — exactly representable in binary, so the
#: literal→double conversion is identical in both engines.
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.25


@query(
    "q_forecast_holt",
    oracle=f"""
    WITH census AS (
        SELECT o_orderpriority AS priority,
               STRFTIME(o_orderdate, '%Y-%m') AS m,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM orders GROUP BY 1, 2
    ),
    ordered AS (
        SELECT priority, LIST(x ORDER BY m) AS vs
        FROM census GROUP BY priority
    ),
    folded AS (
        SELECT priority, CAST(LEN(vs) AS BIGINT) AS n_months,
               list_reduce(
                   list_prepend(
                       [vs[1], vs[2] - vs[1]],
                       list_transform(list_slice(vs, 3, LEN(vs)),
                                      v -> [v, CAST(0 AS DOUBLE)])),
                   (acc, e) -> [
                       {_HOLT_ALPHA} * e[1]
                           + {1.0 - _HOLT_ALPHA} * (acc[1] + acc[2]),
                       {_HOLT_BETA} * (({_HOLT_ALPHA} * e[1]
                               + {1.0 - _HOLT_ALPHA} * (acc[1] + acc[2]))
                               - acc[1])
                           + {1.0 - _HOLT_BETA} * acc[2]]) AS st
        FROM ordered
        WHERE LEN(vs) >= 3
    )
    SELECT priority, n_months,
           CAST(FLOOR(st[1] * 1000000 + 0.5) AS BIGINT) AS level_fp,
           CAST(FLOOR(st[2] * 1000000 + 0.5) AS BIGINT) AS trend_fp,
           CAST(FLOOR((st[1] + 1 * st[2]) * 1000000 + 0.5) AS BIGINT)
               AS fc1_fp,
           CAST(FLOOR((st[1] + 2 * st[2]) * 1000000 + 0.5) AS BIGINT)
               AS fc2_fp,
           CAST(FLOOR((st[1] + 3 * st[2]) * 1000000 + 0.5) AS BIGINT)
               AS fc3_fp
    FROM folded
    ORDER BY priority
    """,
)
def q_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) over
    the monthly order-count series per priority, with 1/2/3-month-ahead
    forecasts — the capacity-planning primitive one step up from
    ``q_ewma``'s single-state smoothing and the model-based complement
    of ``q_trend_mann_kendall``'s nonparametric trend verdict.

    Determinism (the ``q_ewma`` convention, extended to 2-state):
    the coupled recurrence l_t = αx_t + (1−α)(l+b), b_t = β(l_t−l) +
    (1−β)b is an explicit ordered fold with a 2-slot accumulator —
    seeded with (l=x₁, b=x₂−x₁), folded left over x₃.. in month order.
    α=1/2 and β=1/4 are dyadic, every step is IEEE +,*, and both
    engines fold the same sequence, so the state doubles are
    bit-identical; presentation quantizes to fixed point at the end.
    Accumulator spelling differs by engine on purpose: Spark uses a
    ``named_struct`` (correct), but DuckDB 1.0's ``list_reduce``
    updates struct-accumulator FIELDS in place — the second field's
    expression sees the first field's NEW value (verified with a
    (l:=acc.l+e.l, b:=acc.l) probe) — so the oracle carries the state
    as a 2-element DOUBLE list, which folds correctly.

    Scale: the fold state is one array per (priority) of MONTHLY
    aggregates — bounded by the time span, never by row count; the
    row-scale pass is the same map-side-combined census as the
    Mann–Kendall test.
    """
    a, b = _HOLT_ALPHA, _HOLT_BETA
    census = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        )
        .agg(F.count("*").cast("double").alias("x"))
    )
    ordered = census.groupBy("priority").agg(
        F.array_sort(F.collect_list(F.struct("m", "x"))).alias("mv")
    )
    folded = (
        ordered.withColumn("vs", F.expr("transform(mv, e -> e.x)"))
        .filter(F.size("vs") >= 3)
        .select(
            "priority",
            F.size("vs").cast("long").alias("n_months"),
            F.expr(
                f"aggregate(slice(vs, 3, size(vs) - 2), "
                f"named_struct('l', element_at(vs, 1), "
                f"             'b', element_at(vs, 2) - element_at(vs, 1)), "
                f"(acc, v) -> named_struct("
                f"  'l', {a}D * v + {1.0 - a}D * (acc.l + acc.b), "
                f"  'b', {b}D * (({a}D * v + {1.0 - a}D * (acc.l + acc.b))"
                f"               - acc.l) + {1.0 - b}D * acc.b))"
            ).alias("st"),
        )
    )
    lv, tr = F.col("st.l"), F.col("st.b")
    return folded.select(
        "priority",
        "n_months",
        F.floor(lv * 1_000_000 + F.lit(0.5)).cast("long").alias("level_fp"),
        F.floor(tr * 1_000_000 + F.lit(0.5)).cast("long").alias("trend_fp"),
        F.floor((lv + 1 * tr) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("fc1_fp"),
        F.floor((lv + 2 * tr) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("fc2_fp"),
        F.floor((lv + 3 * tr) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("fc3_fp"),
    ).orderBy("priority")
