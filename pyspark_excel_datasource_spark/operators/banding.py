"""Banded global rank — the repo's standard replacement for single-task
window sorts (``q_gini_concentration`` introduced the template; round 9
factored it here).

An exact global row_number over N rows normally plans as ONE task
(Spark's ``No Partition Defined for Window`` warning). The banded form
splits the order axis into fixed-width bands, counts rows per band
(tiny aggregate), computes exclusive running offsets over the band
table (a window over #bands rows — bounded), ranks within each band in
parallel, and adds the offset: identical ranks, no single-task stage.

Used by ``q_quantile_bins``/``q_zorder_layout`` (exact NTILE),
``q_gini_concentration`` (rank-weighted sum), ``q_eval_auc`` (mid-rank
ties via per-score censuses), ``q_graph_kcore`` (median pick), and
``tools/scale_stress.py``.
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
    column so band order extends row order) + ``n`` (total row count).

    One band census, offsets over the bounded band table, one
    band-partitioned row_number; the ``offsets`` side broadcasts.
    """
    base = df.withColumn("__band", band)
    counts = base.groupBy("__band").agg(F.count("*").alias("__c"))
    off_w = W.orderBy("__band").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        counts.withColumn(
            "__off", F.coalesce(F.sum("__c").over(off_w), F.lit(0))
        )
        .withColumn("n", F.sum("__c").over(W.partitionBy()))
        .select("__band", "__off", "n")
    )
    in_band = F.row_number().over(
        W.partitionBy("__band").orderBy(*order_cols)
    )
    return (
        base.withColumn("__br", in_band)
        .join(F.broadcast(offsets), "__band")
        .withColumn("rn", F.col("__off") + F.col("__br"))
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
