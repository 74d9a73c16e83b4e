"""Round-13 operator tests: the native bounded-range as-of twin."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()


def test_asof_backward_tolerance_plan_is_equi_range_join(spark, queries):
    """Catalyst must extract user_id as the JOIN equi-key with the
    1-hour window left as a range condition: a hash- or sort-based join
    keyed on user_id, NEVER a nested-loop/cartesian (which would be
    O(purchases x clicks) and die at scale). Broadcast vs sort-merge is
    AQE's size-based pick — both are the scalable shape."""
    df = queries["q_join_asof_backward_tolerance"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan
    keyed = (
        "SortMergeJoin [user_id" in plan
        or "BroadcastHashJoin [user_id" in plan
        or "ShuffledHashJoin [user_id" in plan
    )
    assert keyed, plan


def test_asof_backward_tolerance_equals_window_form(spark, queries):
    """The range-join spelling and the union-and-window spelling are the
    SAME operator: identical (event_id, click_within_1h, attributed)
    output on the full fixture."""
    a = {
        (r.event_id, r.click_within_1h, r.attributed)
        for r in queries["q_join_asof_backward_tolerance"](spark, SF).collect()
    }
    b = {
        (r.event_id, r.click_within_1h, r.attributed)
        for r in queries["q_join_asof_tolerance"](spark, SF).collect()
    }
    assert a == b
