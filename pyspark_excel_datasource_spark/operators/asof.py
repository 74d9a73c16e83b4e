"""Reusable as-of join operator.

Spark has no native as-of join (SURVEY.md §2.3 / §7.4); the scalable
composition is union-and-window: tag both inputs, union them, sort within
each ``by``-partition by (time, side) and carry the last-seen right-side
row forward. Cost: ONE shuffle on the ``by`` keys + a per-key sort — the
same complexity as any windowed aggregation, with none of the per-row
subqueries or range cross-joins naive formulations need. This is the plan
you want at 100 TB: state per key is a single carried row, and AQE handles
skewed keys like any other window.

Semantics match ``pandas.merge_asof(direction="backward")``:
for each left row, the most recent right row with ``right.time < left.time``
(``strict=True``) or ``<= `` (``strict=False``), per ``by`` group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    strict: bool = True,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach the nearest prior (``backward``) or next
    (``forward``) ``right`` row to each ``left`` row within ``by`` keys.

    Parameters
    ----------
    on : event-time column name present in both inputs.
    by : equality key(s) present in both inputs.
    value_cols : right-side columns to carry (default: all non-key,
        non-time columns).
    strict : True → right.time strictly earlier/later; False → ties match.
    suffix : appended to carried right-side column names that collide.
    direction : "backward" (latest prior, merge_asof default) or
        "forward" (earliest later) — forward is the same window scanned
        in reverse time order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by_cols and c != on
        ]
    carried = [on] + value_cols

    def out_name(c: str) -> str:
        base = f"{c}{suffix}" if c in left.columns else c
        return base

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by_cols and c != on
        ],
    ).select(*left.columns, "__is_left", *[f"__r_{c}" for c in carried])

    unioned = l_tagged.unionByName(r_tagged)

    # At equal timestamps: strict ⇒ the left row must NOT see the tied
    # right row ⇒ sort left rows first (desc on __is_left); non-strict ⇒
    # right rows first. Forward direction = identical construction over
    # reversed time order.
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    time_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        W.partitionBy(*by_cols)
        .orderBy(time_order, tie)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # Carry ONE struct over the window, not per-column lasts: the struct is
    # non-null for every right row even when its fields are NULL, so
    # last(..., ignorenulls) selects the nearest qualifying right ROW and
    # preserves that row's NULL values. Independent per-column lasts would
    # skip over a NULL field to an older right row — silently mixing
    # columns from different rows (not merge_asof semantics).
    marked = F.when(
        F.col("__is_left") == 0,
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in carried]),
    )
    result = unioned.withColumn("__last", F.last(marked, ignorenulls=True).over(w))
    return result.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__last").getField(c).alias(out_name(c)) for c in carried],
    )
