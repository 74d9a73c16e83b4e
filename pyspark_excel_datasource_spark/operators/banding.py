"""Banded global rank — the repo's standard replacement for single-task
window sorts (``q_gini_concentration`` introduced the template; round 9
factored it here).

An exact global row_number over N rows normally plans as ONE task
(Spark's ``No Partition Defined for Window`` warning). The banded form
splits the order axis into fixed-width bands, counts rows per band
(tiny aggregate), computes exclusive running offsets over the band
table (a window over #bands rows — bounded), ranks within each band in
parallel, and adds the offset: identical ranks, no single-task stage.

Direct users: ``q_quantile_bins``/``q_zorder_layout`` (exact NTILE via
``banded_row_number`` + ``ntile_expr``), ``q_graph_kcore`` and
``tools/scale_stress.py`` (``banded_lower_median``).
``q_gini_concentration`` (rank-weighted sum) and ``q_eval_auc``
(mid-rank ties over per-score censuses) implement the same template
inline because their band aggregates differ from a plain row_number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def banded_row_number(
    df: DataFrame, band: Column, order_cols: list[str]
) -> DataFrame:
    """``df`` + ``rn`` (exact global row_number in (band, *order_cols)
    order — the band MUST be a monotone function of the leading order
    column so band order extends row order, and ``order_cols`` must be a
    TOTAL order — include a unique key, or tied rows get
    run-dependent ranks) + ``n`` (total row count).

    One band census, offsets over the bounded band table, one
    band-partitioned row_number; the ``offsets`` side broadcasts.
    """
    # SQL-window selectExpr spellings (r15, guide §7.3): identical
    # expression trees to the Window-DSL form in ~a fifth of the py4j
    # round trips per build (this builder runs twice per q_eval_ap
    # sample). ``order_cols`` are plain column names by contract.
    base = df.withColumn("__band", band)
    counts = base.groupBy("__band").agg(F.expr("count(*) AS __c"))
    offsets = counts.selectExpr(
        "__band",
        "coalesce(sum(__c) OVER (ORDER BY __band ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off",
        "sum(__c) OVER () AS n",
    )
    order = ", ".join(order_cols)
    return (
        base.selectExpr(
            "*",
            f"row_number() OVER (PARTITION BY __band ORDER BY {order})"
            " AS __br",
        )
        .join(F.broadcast(offsets), "__band")
        .withColumn("rn", F.expr("__off + __br"))
        .drop("__band", "__br", "__off")
    )


def ntile_expr(k: int) -> Column:
    """SQL ``NTILE(k)`` from exact ``rn``/``n`` columns, in pure int64
    arithmetic (q = n DIV k, r = n MOD k; the first r buckets hold q+1
    rows; ceil(a/b) spelled (a+b-1) DIV b) — bucket boundaries exact at
    any n, no double division anywhere."""
    return F.expr(
        f"CASE WHEN rn <= ((n DIV {k}) + 1) * (n % {k})"
        f" THEN (rn + (n DIV {k})) DIV ((n DIV {k}) + 1)"
        f" ELSE (n % {k}) + (rn - ((n DIV {k}) + 1) * (n % {k})"
        f"                   + greatest(n DIV {k}, 1) - 1)"
        f"                  DIV greatest(n DIV {k}, 1) END"
    )


def banded_lower_median(
    census: DataFrame, value_col: str, count_col: str, band_width: int = 1024
) -> DataFrame:
    """One-row frame holding the LOWER MEDIAN of the expanded census —
    the ``value`` whose cumulative count range covers global rank
    (n + 1) DIV 2 when each census row (value, count) stands for
    ``count`` identical rows. Never materializes the expansion: per-band
    counts → exclusive offsets over the bounded band table → in-band
    running sums → one range filter. Used by ``q_graph_kcore``'s
    self-scaling k pick and ``tools/scale_stress.py``.
    """
    dc = census.withColumn("__band", F.expr(f"{value_col} DIV {band_width}"))
    bc = dc.groupBy("__band").agg(F.sum(count_col).alias("__bc"))
    off_w = W.orderBy("__band").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        bc.withColumn("__off", F.coalesce(F.sum("__bc").over(off_w), F.lit(0)))
        .withColumn("__n", F.sum("__bc").over(W.partitionBy()))
        .select("__band", "__off", "__n")
    )
    cum_w = (
        W.partitionBy("__band")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = (
        dc.withColumn("__cum_in", F.sum(count_col).over(cum_w))
        .join(F.broadcast(offsets), "__band")
        .select(
            value_col,
            F.col(count_col).alias("__c"),
            (F.col("__off") + F.col("__cum_in")).alias("__cum"),
            F.expr("(__n + 1) DIV 2").alias("__target"),
        )
    )
    return cum.filter(
        (F.col("__cum") - F.col("__c") < F.col("__target"))
        & (F.col("__target") <= F.col("__cum"))
    ).select(value_col)
