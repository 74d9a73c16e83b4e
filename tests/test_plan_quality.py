"""Physical-plan assertions for the core relational operators.

Correctness is the driver's oracle gate; these tests pin the PLAN shape
that makes each operator viable at 100 TB — filters reaching the parquet
scan, column pruning, map-side partial aggregation, top-k without a full
sort shuffle, one exchange per window partitioning. A refactor that keeps
results identical but breaks pushdown would pass every oracle and still
be a 100x regression on a real cluster; this is the test layer that
catches it.
"""

from __future__ import annotations

import contextlib
import io
import re

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ops(plan: str) -> list[str]:
    """Operator names from the detail section — one entry per physical node
    (the tree rendering would double-count them)."""
    return re.findall(r"^\(\d+\) (\w+)", plan, re.M)


def _q(spark, name):
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    return load_all_queries()[name](spark, SF)


def test_scan_filter_pushed_to_parquet(spark):
    plan = _plan(_q(spark, "q_scan_parquet"))
    assert "GreaterThan(o_totalprice,150000.0)" in plan, plan[:1500]
    # pruned scan: only the three projected columns are read
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in plan


def test_project_prunes_unused_columns(spark):
    plan = _plan(_q(spark, "q_project"))
    # customer has 8 columns; the query touches 4
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert read.count(":") == 4, read
    assert "c_address" not in read and "c_phone" not in read


def test_filter_complex_pushes_conjuncts(spark):
    plan = _plan(_q(spark, "q_filter_basic"))
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "GreaterThanOrEqual(l_quantity" in pushed
    assert "LessThan(l_discount" in pushed


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = _plan(_q(spark, "q_topk"))
    assert "TakeOrderedAndProject" in plan
    # a global Sort + Limit would shuffle everything to one partition
    assert "Exchange rangepartitioning" not in plan


def test_group_agg_is_partial_plus_final(spark):
    ops = _ops(_plan(_q(spark, "q_agg_group")))
    # map-side combine: HashAggregate below AND above the exchange
    assert ops.count("HashAggregate") == 2, ops
    assert ops.count("Exchange") == 1, ops


def test_window_rank_single_exchange(spark):
    plan = _plan(_q(spark, "q_win_rank"))
    ops = _ops(plan)
    # all four rank functions share one partitioning -> exactly one shuffle
    assert ops.count("Exchange") == 1, ops
    assert "Window" in ops


def test_q5ish_broadcasts_all_dims(spark):
    plan = _plan(_q(spark, "q_tpch_q5ish"))
    # supplier, nation, region ride broadcast; only fact-fact joins shuffle
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_flagship_no_python_udf_in_plan(spark):
    plan = _plan(_q(spark, "q_flagship_pricing"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


#: Queries whose plans legitimately contain Arrow-vectorized Python stages
#: (pandas UDF / mapInPandas / grouped-map) — the designed slow-path users.
#: Everything else must stay entirely JVM-side.
ARROW_ALLOWED = {
    "q_udf_mapinpandas",
    "q_udf_scalar",
    "q_udaf_grouped",
    "q_udtf",
    "q_udtf_analyze",  # polymorphic analyze() UDTF, Arrow-batched
    "q_udtf_table_arg",  # TABLE-argument UDTF, Arrow-batched
    "q_dedup_embed_lsh",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_sim_ann_pq",
    "q_sim_ann_lsh_oracled",  # md5 integer hyperplane signature pandas_udf
    "q_sim_ann_ivf_oracled",  # md5 integer anchor assignment pandas_udf
    "q_sim_ann_pq_oracled",  # md5 integer codebook encode pandas_udf
    "q_dedup_embed_lsh_oracled",  # md5 integer hyperplane signature pandas_udf
    "q_sim_ann_recall",  # reuses the banded-LSH signature pandas_udf
    "q_approx_audit",  # drives the LSH/IVF/PQ structures it audits
    "q_multimodal_features",
}


def test_no_cartesian_or_row_python_in_any_plan(spark):
    """Repo-wide invariant over all registered queries: no CartesianProduct
    (quadratic shuffle-free disaster at scale) and no BatchEvalPython
    (row-at-a-time Python, 10-100x slower than Arrow) anywhere; Arrow
    Python stages only in the designed UDF-surface queries."""
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    violations: list[tuple[str, str]] = []
    arrow_users: set[str] = set()
    for name, fn in load_all_queries().items():
        plan = _plan(fn(spark, SF))
        if "CartesianProduct" in plan:
            violations.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            violations.append((name, "BatchEvalPython"))
        if any(
            tok in plan
            for tok in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ):
            arrow_users.add(name)
    assert not violations, violations
    unexpected = arrow_users - ARROW_ALLOWED
    assert not unexpected, f"new Python stages outside the allowlist: {unexpected}"


def test_sim_topk_broadcasts_query_vectors(spark):
    plan = _plan(_q(spark, "q_sim_topk"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the embedding side must NOT be shuffled for the join itself
    assert "Exchange hashpartitioning" not in plan.split("Join")[0]


def test_winsorize_broadcasts_bounds(spark):
    """The per-group p05/p95 bounds frame (|sources| rows) must broadcast
    back onto the corpus scan — a shuffle join here would move the whole
    table a second time for a 20-row dimension."""
    plan = _plan(_q(spark, "q_winsorize_by_group"))
    assert "BroadcastHashJoin" in plan


def test_asof_nearest_single_exchange(spark):
    """The bidirectional nearest as-of claims ONE shuffle: both window
    passes must stack on a single hashpartitioning exchange (the second
    ordering costs a re-sort, never a re-shuffle)."""
    exe = (
        _q(spark, "q_join_asof_nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert exe.count("Exchange hashpartitioning") == 1, exe[:2000]
    assert exe.count("Window [") == 2


def test_curriculum_base_window_is_banded(spark):
    """The in-source ranking over base rows must key on (source, band) —
    a source-only window over the corpus would serialize each source
    into one task. Source-only partitionings may appear only on the
    tiny counts/source-index frames."""
    exe = (
        _q(spark, "q_curriculum_interleave")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"row_number\(\) windowspecdefinition\(source#\d+, band#\d+L", exe)
    assert m, exe[:2000]
    # exactly one SinglePartition exchange: the |sources|-row index frame
    assert exe.count("Exchange SinglePartition") == 1


def test_weighted_median_sorts_only_in_band(spark):
    """The per-row cumulative-weight window must run on the broadcast-
    filtered in-band slice, never the whole group: the plan has the
    band-table windows plus ONE row-level window whose input descends
    from a BroadcastHashJoin (the median-band filter)."""
    exe = (
        _q(spark, "q_weighted_median")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rowwin = [
        seg for seg in exe.split("+- Window ")[1:]
        if "v#" in seg.split("\n")[0]
    ]
    assert len(rowwin) == 1
    assert "BroadcastHashJoin" in rowwin[0], rowwin[0][:1200]


def test_theta_sketch_build_is_take_ordered(spark):
    """q_agg_theta's per-set k-minimum extraction must compile to
    TakeOrderedAndProject (per-partition top-k + k-row merge), never a
    global Sort before the limit — the property that keeps sketch
    building one pass at 100 TB."""
    plan = _plan(_q(spark, "q_agg_theta"))
    ops = _ops(plan)
    assert "TakeOrderedAndProject" in ops, plan[:2000]
    # no global sort anywhere: every orderBy in the query is a LIMIT k
    assert "Sort" not in ops, [o for o in ops if "Sort" in o]


def test_nb_classify_broadcasts_model_not_corpus(spark):
    """The NB model side (vocab x classes) must broadcast; the token
    stream must never be broadcast. Python stays out of the plan."""
    plan = _plan(_q(spark, "q_nb_classify"))
    ops = _ops(plan)
    assert "BroadcastHashJoin" in ops or "BroadcastNestedLoopJoin" in ops
    assert not any("Python" in o for o in ops), [o for o in ops if "Python" in o]


def test_regression_multi_is_one_aggregation_pass(spark):
    """Closed-form OLS: exactly one partial+final HashAggregate pair over
    the fact scan (the Gram matrix), with the solve a pure projection —
    no joins, no windows, no second pass."""
    plan = _plan(_q(spark, "q_regression_multi"))
    ops = _ops(plan)
    assert ops.count("HashAggregate") == 2, ops
    assert not any("Join" in o for o in ops), ops
    assert not any("Window" in o for o in ops), ops
