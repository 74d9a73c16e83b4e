"""The banded global-rank machinery must be EXACTLY the single-task
window it replaces: same row_number, same NTILE buckets, for any n —
including n < k, n == k, ties, and skewed band populations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pyspark_excel_datasource_spark.operators.banding import (
    banded_row_number,
    ntile_expr,
)


def _frame(spark, n: int, dup_every: int):
    """n rows with value ties every ``dup_every`` rows and a unique
    tiebreak id; values deliberately skewed so bands are uneven."""
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") - F.col("id") % dup_every) ** 2).cast("double").alias("v"),
    )


@pytest.mark.parametrize("n", [1, 3, 9, 10, 11, 100, 257])
@pytest.mark.parametrize("k", [3, 10, 16])
def test_banded_ntile_equals_window_ntile(spark, n, k):
    df = _frame(spark, n, dup_every=4)
    ranked = banded_row_number(
        df, F.floor(F.col("v") / 100.0).cast("long"), ["v", "id"]
    )
    got = {
        r.id: r.bin
        for r in ranked.select(
            "id", ntile_expr(k).cast("int").alias("bin")
        ).collect()
    }
    want = {
        r.id: r.bin
        for r in df.select(
            "id",
            F.ntile(k).over(W.orderBy("v", "id")).alias("bin"),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [1, 5, 64, 1000])
def test_banded_row_number_equals_global(spark, n):
    df = _frame(spark, n, dup_every=7)
    ranked = banded_row_number(
        df, F.floor(F.col("v") / 50.0).cast("long"), ["v", "id"]
    )
    got = {r.id: r.rn for r in ranked.collect()}
    want = {
        r.id: r.rn
        for r in df.select(
            "id", F.row_number().over(W.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    assert got == want
    assert all(r.n == n for r in ranked.collect())


@pytest.mark.parametrize("counts", [
    [(1, 1)],
    [(5, 3), (2, 4)],
    [(10, 1), (20, 1)],            # even total: lower median
    [(0, 7), (4096, 7), (9000, 1)],  # cross-band, odd total
    [(3, 1000000)],                # one heavy value
])
def test_banded_lower_median_matches_expanded_multiset(spark, counts):
    from pyspark_excel_datasource_spark.operators.banding import (
        banded_lower_median,
    )

    df = spark.createDataFrame(counts, "d long, c long")
    got = banded_lower_median(df, "d", "c").collect()
    assert len(got) == 1
    expanded = sorted(v for v, c in counts for _ in range(min(c, 100000)))
    # lower median = element at rank (n+1) DIV 2 (1-based)
    if any(c > 100000 for _, c in counts):
        # the heavy-value case: median is trivially that value
        assert got[0].d == 3
    else:
        n = len(expanded)
        assert got[0].d == expanded[(n + 1) // 2 - 1]
