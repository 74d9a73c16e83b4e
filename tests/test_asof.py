"""asof_join operator vs pandas.merge_asof (the semantic reference)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark_excel_datasource_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    t0 = dt.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "t": [t0 + dt.timedelta(minutes=m) for m in (5, 10, 10, 7, 1, 4)],
            "lv": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 4],
            "t": [t0 + dt.timedelta(minutes=m) for m in (3, 10, 2, 6, 1)],
            "rv": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    return left, right


def test_matches_pandas_merge_asof_strict(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            strict=True,
        )
        .toPandas()
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    # pandas merge_asof(allow_exact_matches=False) == strict backward
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "t_right", "rv": "rv"}),
        left_on="t",
        right_on="t_right",
        by="k",
        allow_exact_matches=False,
        direction="backward",
    ).sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(expected["rv"].fillna(-1))
    assert list(got["t_right"].fillna(pd.Timestamp(0))) == list(
        expected["t_right"].fillna(pd.Timestamp(0))
    )


def test_matches_pandas_merge_asof_inclusive(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            strict=False,
        )
        .toPandas()
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "t_right"}),
        left_on="t",
        right_on="t_right",
        by="k",
        allow_exact_matches=True,
        direction="backward",
    ).sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(expected["rv"].fillna(-1))


def test_events_asof_consistent_with_query(spark):
    """The reusable operator reproduces q_join_asof on real data."""
    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    got = asof_join(purchases, clicks, on="ts", by="user_id", strict=True)
    got_map = {r.event_id: r.ts_right for r in got.collect()}
    ref = load_all_queries()["q_join_asof"](spark, sf).collect()
    ref_map = {r.event_id: r.last_click_ts for r in ref}
    assert got_map == ref_map


def test_forward_direction_matches_pandas(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            strict=True,
            direction="forward",
        )
        .toPandas()
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "t_right"}),
        left_on="t",
        right_on="t_right",
        by="k",
        allow_exact_matches=False,
        direction="forward",
    ).sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(expected["rv"].fillna(-1))


def test_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            direction="nearest",
        )


def test_null_right_values_carry_from_nearest_row(spark):
    """The nearest qualifying right row wins even when a value column is
    NULL there — and all carried columns come from that single row (no
    per-column mixing from older rows)."""
    t0 = dt.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {"k": [1], "t": [t0 + dt.timedelta(minutes=10)], "lv": [1.0]}
    )
    right = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=2), 111.0, "old"),
            (1, t0 + dt.timedelta(minutes=8), None, "new"),
        ],
        "k long, t timestamp, rv double, tag string",
    )
    got = asof_join(
        spark.createDataFrame(left), right, on="t", by="k", strict=True
    ).collect()
    assert len(got) == 1
    row = got[0]
    # nearest right row is minute-8: its NULL rv must be preserved, not
    # substituted by minute-2's 111.0, and tag must come from the same row.
    assert row.t_right == t0 + dt.timedelta(minutes=8)
    assert row.rv is None
    assert row.tag == "new"
    # pandas.merge_asof agrees
    expected = pd.merge_asof(
        left.sort_values("t"),
        pd.DataFrame(
            {
                "k": [1, 1],
                "t_right": [
                    t0 + dt.timedelta(minutes=2),
                    t0 + dt.timedelta(minutes=8),
                ],
                "rv": [111.0, None],
                "tag": ["old", "new"],
            }
        ),
        left_on="t",
        right_on="t_right",
        by="k",
        allow_exact_matches=False,
        direction="backward",
    )
    assert pd.isna(expected["rv"].iloc[0]) and expected["tag"].iloc[0] == "new"
