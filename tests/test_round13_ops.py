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


def test_rewrite_manifests_preserves_reads_history_and_deletes(spark, tmp_path):
    """Metadata-only manifest compaction: same rows, same delete
    effects, same per-file sequence numbers (equality-delete ordering),
    prior snapshots still readable, and a second run no-ops."""
    import os

    from pyspark.sql import functions as F

    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.sources.iceberg import (
        delete_where_iceberg,
        read_iceberg,
        rewrite_manifests,
        snapshot_iceberg,
        write_iceberg,
    )

    out = str(tmp_path / "t")
    o = table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for r in range(4):
        write_iceberg(
            spark,
            o.filter(F.col("o_orderkey") % 4 == r).repartition(2),
            out,
            mode="append",
        )
    delete_where_iceberg(spark, out, "o_totalprice > 250000")
    pre = snapshot_iceberg(out)
    rows_pre = sorted(
        r.o_orderkey for r in read_iceberg(spark, out).collect()
    )
    data_bytes = {
        p: os.path.getmtime(os.path.join(out, p)) for p in pre.files
    }

    stats = rewrite_manifests(out)
    assert (stats["manifests_before"], stats["manifests_after"]) == (4, 1)

    post = snapshot_iceberg(out)
    assert set(post.files) == set(pre.files)  # no data file moved
    assert post.files_seq == pre.files_seq  # delete ordering intact
    for p, mt in data_bytes.items():
        assert os.path.getmtime(os.path.join(out, p)) == mt
    rows_post = sorted(
        r.o_orderkey for r in read_iceberg(spark, out).collect()
    )
    assert rows_post == rows_pre
    # the pre-delete snapshot (id 4) still resolves through its own
    # (unreplaced) manifest list
    assert read_iceberg(spark, out, snapshot_id=4).count() == len(
        sorted(r.o_orderkey for r in o.collect())
    )
    # already consolidated -> no-op, same snapshot
    again = rewrite_manifests(out)
    assert again["entries"] == 0
    assert again["snapshot_id"] == stats["snapshot_id"]


def test_describe_detail_statless_file_reports_unknown_rows(spark, tmp_path):
    """A foreign re-add without stats makes the live ROW count
    unknowable; describe_detail must say None, never guess — the same
    honesty rule as the metadata-only aggregate pushdown."""
    from pyspark_excel_datasource_spark.catalog import table
    from pyspark_excel_datasource_spark.sources.deltalog import (
        _commit,
        describe_detail,
        snapshot,
        write_delta,
    )

    out = str(tmp_path / "t")
    o = table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_delta(spark, o.limit(20).repartition(1), out)
    d = describe_detail(out)
    assert d["num_rows"] == 20 and d["num_files"] == 1
    snap = snapshot(out)
    (rel,) = snap.files
    _commit(
        out,
        snap.version + 1,
        [
            {"commitInfo": {"operation": "EXTERNAL"}},
            {"add": {"path": rel, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": False}},
        ],
    )
    d2 = describe_detail(out)
    assert d2["num_rows"] is None
    assert d2["num_files"] == 1
    assert d2["n_commits"] == 2


def test_zorder_wide_integer_keys_grid_exact(spark, tmp_path):
    """ADVICE r12: integral z-order keys past 2^53 must grid EXACTLY.
    Keys at 2^60 + k have double spacing 256 — the old DOUBLE grid
    collapsed every 256 adjacent keys onto one cell, so the range-split
    rewrite could not separate them; the BIGINT grid keeps the layout
    key-disjoint and stats-prunable at any magnitude."""
    import os

    from pyspark.sql import functions as F

    from pyspark_excel_datasource_spark.sources.deltalog import (
        optimize,
        read_delta,
        snapshot,
        write_delta,
    )

    base = 1 << 60
    path = str(tmp_path / "widekeys")
    df = spark.range(1024).select(
        (F.col("id") + base).alias("a"), (F.col("id") % 97).alias("b")
    )
    write_delta(spark, df.repartition(8), path)
    optimize(spark, path, target_files=4, zorder_by=("a", "b"))
    got = read_delta(spark, path)
    assert got.count() == 1024
    assert got.agg(F.sum(F.col("a") - base)).first()[0] == 1023 * 1024 // 2
    # the rewritten files' stats must split the key range: a probe for
    # the lowest 1/8 of keys schedules fewer files than the table holds
    n_files = len(snapshot(path).files)
    assert n_files > 1
    pruned = read_delta(
        spark, path, stats_filter={"a": (None, base + 127)}
    )
    assert len(pruned.inputFiles()) < n_files
    assert pruned.filter(F.col("a") <= base + 127).count() == 128


def test_optimize_selective_binpack(spark, tmp_path):
    """small_file_bytes compaction: only under-threshold files (plus DV
    carriers) rewrite; large files stay byte-identical, time travel to
    the pre-optimize version still sees the old layout, and a pass with
    nothing under threshold is a version-preserving no-op."""
    import os

    from pyspark.sql import functions as F

    from pyspark_excel_datasource_spark.sources.deltalog import (
        delete_where,
        optimize,
        read_delta,
        snapshot,
        write_delta,
    )

    path = str(tmp_path / "binpack")
    big = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    write_delta(spark, big.coalesce(1), path)
    (big_rel,) = snapshot(path).files
    big_size = os.path.getsize(os.path.join(path, big_rel))
    for lo in (0, 1, 2):
        write_delta(
            spark,
            spark.range(lo * 10, lo * 10 + 10).select(
                (F.col("id") + 1_000_000).alias("k"),
                F.lit(9).cast("long").alias("g"),
            ).coalesce(1),
            path,
            mode="append",
        )
    v_before = snapshot(path).version
    assert len(snapshot(path).files) == 4
    assert optimize(spark, path, small_file_bytes=big_size) == v_before + 1
    snap = snapshot(path)
    assert big_rel in snap.files  # large file kept its add action
    assert os.path.getsize(os.path.join(path, big_rel)) == big_size
    assert len(snap.files) == 2  # three slivers packed into one
    assert read_delta(spark, path).count() == 200_030
    # pre-optimize version still shows the 4-file layout
    assert len(snapshot(path, v_before).files) == 4
    # DV carriers rewrite regardless of size: fold the big file's DV
    delete_where(spark, path, "k % 2 = 0 AND k < 100", mode="deletion-vectors")
    v = optimize(spark, path, small_file_bytes=1)  # nothing small…
    snap2 = snapshot(path)
    assert not snap2.dvs  # …but the DV carrier was selected and folded
    assert read_delta(spark, path).count() == 200_030 - 50
    # and with no smalls AND no DVs, selective optimize is a no-op
    assert optimize(spark, path, small_file_bytes=1) == v
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zorder_by"):
        optimize(spark, path, small_file_bytes=1, zorder_by=("k", "g"))


def test_cleanup_log_retention_and_guards(spark, tmp_path):
    """cleanup_log: newest checkpoint is the retained replay base;
    retention window keeps young files; checkpoint-less tables are
    untouched; snapshot/history/time travel behave as documented."""
    import os

    from pyspark.sql import functions as F

    from pyspark_excel_datasource_spark.sources.deltalog import (
        _list_log,
        cleanup_log,
        history,
        read_delta,
        snapshot,
        write_delta,
    )

    path = str(tmp_path / "logclean")
    for r in range(6):
        write_delta(
            spark,
            spark.range(r * 10, r * 10 + 10).selectExpr("id AS k").coalesce(1),
            path,
            mode="append" if r else "overwrite",
        )
    # retention window: nothing is old enough yet → no-op
    assert cleanup_log(path, retention_seconds=3600)["deleted_commits"] == 0
    res = cleanup_log(path)
    assert res == {"deleted_commits": 4, "deleted_checkpoints": 1, "cutoff": 4}
    js, cps = _list_log(path)
    assert js == [4, 5] and cps == [4]
    assert read_delta(spark, path).count() == 60  # latest replays fine
    assert snapshot(path, 4).version == 4  # at the base: still works
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="missing Delta log"):
        snapshot(path, 3)
    assert [h["version"] for h in history(path)] == [5, 4]
    # idempotent; and a checkpoint-less table is untouched
    assert cleanup_log(path)["deleted_commits"] == 0
    p2 = str(tmp_path / "nockpt")
    write_delta(
        spark,
        spark.range(3).selectExpr("id AS k"),
        p2,
        checkpoint_interval=0,
    )
    assert cleanup_log(p2) == {
        "deleted_commits": 0,
        "deleted_checkpoints": 0,
        "cutoff": None,
    }
