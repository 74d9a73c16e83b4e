"""Delta transaction-log source/sink: snapshot reconstruction, time
travel, checkpoints, log-level partition pruning, atomic commits."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pyspark_excel_datasource_spark.sources.deltalog import (
    DeltaConcurrentCommitError,
    DeltaProtocolError,
    delete_partitions,
    history,
    merge_delta,
    optimize,
    read_change_feed,
    read_delta,
    snapshot,
    write_delta,
)

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return spark.read.parquet(os.path.join(SF, "nation.parquet"))


@pytest.fixture()
def three_version_table(spark, tmp_path):
    """v0: regions 0-1 (append) · v1: regions 2-4 (append) · v2: DELETE
    partition n_regionkey=0. Partitioned by n_regionkey."""
    path = str(tmp_path / "nation_delta")
    n = _nation(spark)
    write_delta(
        spark, n.filter(F.col("n_regionkey") < 2), path,
        mode="append", partition_by=("n_regionkey",),
    )
    write_delta(
        spark, n.filter(F.col("n_regionkey") >= 2), path,
        mode="append", partition_by=("n_regionkey",),
    )
    delete_partitions(path, {"n_regionkey": "0"})
    return path


def test_versions_and_latest(spark, three_version_table):
    n = _nation(spark)
    total = n.count()
    r0 = n.filter(F.col("n_regionkey") == 0).count()
    latest = read_delta(spark, three_version_table)
    assert latest.count() == total - r0
    assert latest.filter(F.col("n_regionkey") == 0).count() == 0
    # full rows (including the log-attached partition column) match source
    got = {tuple(r) for r in latest.collect()}
    want = {
        tuple(r) for r in n.filter(F.col("n_regionkey") != 0)
        .select(*latest.columns).collect()
    }
    assert got == want


def test_time_travel_each_version(spark, three_version_table):
    n = _nation(spark)
    v0 = read_delta(spark, three_version_table, version=0)
    assert v0.count() == n.filter(F.col("n_regionkey") < 2).count()
    v1 = read_delta(spark, three_version_table, version=1)
    assert v1.count() == n.count()
    v2 = read_delta(spark, three_version_table, version=2)
    assert v2.count() == n.filter(F.col("n_regionkey") != 0).count()
    with pytest.raises(ValueError):
        read_delta(spark, three_version_table, version=3)


def test_checkpoint_is_used(spark, three_version_table):
    """v2 wrote a checkpoint; dropping the pre-checkpoint JSON commits
    must not affect the latest read (it starts from the checkpoint),
    while time travel BELOW the checkpoint now correctly fails."""
    log = os.path.join(three_version_table, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    last = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert last["version"] == 2
    n_latest = read_delta(spark, three_version_table).count()
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert read_delta(spark, three_version_table).count() == n_latest
    with pytest.raises(FileNotFoundError):
        read_delta(spark, three_version_table, version=1)


def test_snapshot_json_replay_matches_checkpoint(spark, three_version_table):
    """r15: snapshot() replays the raw JSON chain instead of reading the
    parquet checkpoint when the full short chain exists (saves a cold
    pyarrow import in the streaming source runner). The two paths must
    reconstruct identical state — a checkpoint IS the replay of the
    commits it covers."""
    import pyspark_excel_datasource_spark.sources.deltalog as dl

    assert dl._JSON_REPLAY_MAX >= 3
    via_json = dl.snapshot(three_version_table)  # short chain: JSON replay
    old = dl._JSON_REPLAY_MAX
    dl._JSON_REPLAY_MAX = 0  # force the checkpoint path
    try:
        via_ckpt = dl.snapshot(three_version_table)
    finally:
        dl._JSON_REPLAY_MAX = old
    assert via_json.version == via_ckpt.version
    assert via_json.files == via_ckpt.files
    assert via_json.dvs == via_ckpt.dvs
    assert via_json.stats == via_ckpt.stats
    assert via_json.protocol == via_ckpt.protocol
    # metadata: compare the fields readers consume (parquet structs may
    # materialize absent optional keys as None)
    for k in ("schemaString", "partitionColumns", "configuration", "id"):
        assert via_json.metadata.get(k) == via_ckpt.metadata.get(k), k


def test_log_level_partition_pruning(spark, three_version_table):
    pruned = read_delta(
        spark, three_version_table, partition_filter={"n_regionkey": {"3"}}
    )
    n = _nation(spark)
    assert pruned.count() == n.filter(F.col("n_regionkey") == 3).count()
    # pruning happened BEFORE the scan: only the matching files are read
    all_files = set(read_delta(spark, three_version_table).inputFiles())
    assert set(pruned.inputFiles()) < all_files
    snap = snapshot(three_version_table)
    live_r3 = [p for p, pv in snap.files.items() if pv["n_regionkey"] == "3"]
    assert len(pruned.inputFiles()) == len(live_r3)
    with pytest.raises(ValueError):
        read_delta(spark, three_version_table, partition_filter={"n_name": {"x"}})


def test_concurrent_commit_conflict(spark, tmp_path):
    """Two writers racing for the SAME version: the loser's O_EXCL
    create must fail (put-if-absent is the protocol's atomicity
    primitive). A later writer that snapshots first simply claims the
    next free version — that path is exercised everywhere else."""
    from pyspark_excel_datasource_spark.sources.deltalog import _commit

    path = str(tmp_path / "t")
    write_delta(spark, _nation(spark), path)
    with pytest.raises(DeltaConcurrentCommitError):
        _commit(path, 0, [{"commitInfo": {"operation": "WRITE"}}])


def test_unpartitioned_overwrite_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    v = write_delta(spark, n, path)
    assert v == 0
    v = write_delta(spark, n.limit(7), path, mode="overwrite")
    assert v == 1
    assert read_delta(spark, path).count() == 7
    assert read_delta(spark, path, version=0).count() == n.count()


def test_null_partition_value_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id int, k string"
    )
    write_delta(spark, df, path, partition_by=("k",))
    back = read_delta(spark, path)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, None), (3, "b")}
    snap = snapshot(path)
    assert any(pv["k"] is None for pv in snap.files.values())


def test_history_operations(spark, three_version_table):
    h = history(three_version_table)
    assert [r["version"] for r in h] == [2, 1, 0]
    assert [r["operation"] for r in h] == ["DELETE", "WRITE", "WRITE"]


def test_protocol_gate(spark, tmp_path):
    """Reader versions beyond 3, and v3 reader features this reader does
    not implement, are rejected; versions at-or-below the gate (1-2, and
    3 with only supported features) stay readable. (Column mapping moved
    v2 inside the gate in round 10 — see test_delta_column_mapping.py.)"""
    path = str(tmp_path / "t")
    write_delta(spark, _nation(spark), path)
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="v2Checkpoint"):
        read_delta(spark, path)
    # older versions stay readable
    assert read_delta(spark, path, version=0).count() > 0
    # a reader version beyond anything implemented fails even with no
    # feature list
    path2 = str(tmp_path / "t2")
    write_delta(spark, _nation(spark), path2)
    with open(os.path.join(path2, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 4}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="minReaderVersion 4"):
        read_delta(spark, path2)


def test_append_partitioning_mismatch_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark, _nation(spark), path, partition_by=("n_regionkey",))
    with pytest.raises(ValueError):
        write_delta(spark, _nation(spark), path, mode="append")


def test_change_feed_net_semantics(spark, three_version_table):
    n = _nation(spark)
    # v0→v2: inserts = regions 2-4 minus deleted region 0 (none of 2-4
    # is 0, so all of the v1 append); deletes = region-0 rows from v0
    cdf = read_change_feed(spark, three_version_table, 0, 2)
    ins = cdf.filter(F.col("_change_type") == "insert")
    dels = cdf.filter(F.col("_change_type") == "delete")
    assert ins.count() == n.filter(F.col("n_regionkey") >= 2).count()
    assert dels.count() == n.filter(F.col("n_regionkey") == 0).count()
    # adjacent range v1→v2 sees ONLY the delete
    cdf12 = read_change_feed(spark, three_version_table, 1, 2)
    assert cdf12.filter(F.col("_change_type") == "insert").count() == 0
    assert (
        cdf12.filter(F.col("_change_type") == "delete").count()
        == n.filter(F.col("n_regionkey") == 0).count()
    )
    # empty range
    assert read_change_feed(spark, three_version_table, 2, 2).count() == 0


def test_optimize_compacts_without_changing_data(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.repartition(4), path, partition_by=("n_regionkey",))
    write_delta(
        spark, n.repartition(4), path, mode="append",
        partition_by=("n_regionkey",),
    )
    before = snapshot(path)
    rows_before = {tuple(r) for r in read_delta(spark, path).collect()}
    v = optimize(spark, path)
    after = snapshot(path)
    assert after.version == v
    # one file per partition value, data identical
    per_part: dict[str, int] = {}
    for pv in after.files.values():
        per_part[pv["n_regionkey"]] = per_part.get(pv["n_regionkey"], 0) + 1
    assert set(per_part.values()) == {1}
    assert len(after.files) < len(before.files)
    assert {tuple(r) for r in read_delta(spark, path).collect()} == rows_before
    # time travel to the fragmented pre-OPTIMIZE version still works
    assert read_delta(spark, path, version=1).count() == read_delta(spark, path).count()
    assert [h["operation"] for h in history(path)][0] == "OPTIMIZE"


def test_merge_upsert_branches(spark, tmp_path):
    path = str(tmp_path / "t")
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id int, k string, v double"
    )
    write_delta(spark, target, path)
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (3, "c", 30.0)], "id int, k string, v double"
    )
    merge_delta(spark, source, path, on=["id"])
    got = {tuple(r) for r in read_delta(spark, path).collect()}
    assert got == {(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0)}
    # pre-merge version intact; history says MERGE
    assert read_delta(spark, path, version=0).count() == 2
    assert history(path)[0]["operation"] == "MERGE"
    with pytest.raises(ValueError):
        merge_delta(spark, source.drop("v"), path, on=["id"])


def test_vacuum_reclaims_only_dead_files(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import vacuum

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n, path)
    write_delta(spark, n.limit(5), path, mode="overwrite")
    latest_rows = {tuple(r) for r in read_delta(spark, path).collect()}
    removed = vacuum(path)
    assert removed > 0
    # latest snapshot untouched; pre-overwrite time travel now fails
    assert {tuple(r) for r in read_delta(spark, path).collect()} == latest_rows
    with pytest.raises(Exception):
        read_delta(spark, path, version=0).collect()
    # vacuum is idempotent
    assert vacuum(path) == 0


def test_stream_reads_appends_and_respects_offsets(spark, tmp_path):
    """pydelta stream: drains appends exactly once across restarts and
    skips dataChange=false OPTIMIZE commits."""
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        register_pydelta,
    )

    register_pydelta(spark)
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.filter(F.col("n_nationkey") < 10), path)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("pydelta")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    drain()
    assert spark.read.parquet(out).count() == 10
    # append + compact, then resume from the checkpoint: only the new
    # rows arrive (OPTIMIZE's dataChange=false rewrite adds nothing)
    write_delta(spark, n.filter(F.col("n_nationkey") >= 10), path, mode="append")
    optimize(spark, path)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == n.count()
    assert {r.n_nationkey for r in got.collect()} == {
        r.n_nationkey for r in n.collect()
    }


def test_stream_fails_on_delete_unless_ignored(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n, path, partition_by=("n_regionkey",))
    delete_partitions(path, {"n_regionkey": "0"})
    r = DeltaStreamReader(snapshot(path).schema, {"path": path})
    with pytest.raises(RuntimeError, match="append-only"):
        r.partitions({"version": -1}, {"version": 1})
    r2 = DeltaStreamReader(
        snapshot(path).schema, {"path": path, "ignoreDeletes": "true"}
    )
    parts = r2.partitions({"version": -1}, {"version": 1})
    assert len(parts) == len(snapshot(path, 0).files)


def test_schema_evolution_requires_opt_in(spark, tmp_path):
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.select("n_nationkey", "n_name"), path)
    widened = n.select("n_nationkey", "n_name", "n_regionkey")
    # silent column drop is forbidden
    with pytest.raises(ValueError, match="merge_schema"):
        write_delta(spark, widened, path, mode="append")
    # type change is always forbidden
    retyped = n.select(
        F.col("n_nationkey").cast("string").alias("n_nationkey"), "n_name"
    )
    with pytest.raises(ValueError, match="changes type"):
        write_delta(spark, retyped, path, mode="append", merge_schema=True)
    # with opt-in: schema widens, old rows read null for the new column
    write_delta(spark, widened.limit(3), path, mode="append", merge_schema=True)
    got = read_delta(spark, path)
    assert got.columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert got.filter(F.col("n_regionkey").isNull()).count() == n.count()
    assert got.filter(F.col("n_regionkey").isNotNull()).count() == 3


def test_delete_where_is_file_granular(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import delete_where

    path = str(tmp_path / "t")
    cust = spark.read.parquet(os.path.join(SF, "customer.parquet")).select(
        "c_custkey", "c_acctbal"
    )
    write_delta(spark, cust.repartitionByRange(4, "c_custkey"), path)
    before = snapshot(path)
    cut = cust.agg(F.expr("max(c_custkey) div 4")).collect()[0][0]
    v, rewritten, untouched = delete_where(spark, path, f"c_custkey <= {cut}")
    after = snapshot(path)
    # range clustering => the predicate touches only the low-range files
    assert rewritten >= 1 and untouched >= 1
    assert rewritten + untouched == len(before.files)
    # untouched files keep their exact paths across the commit
    assert len(set(before.files) & set(after.files)) == untouched
    got = read_delta(spark, path)
    assert got.count() == cust.filter(F.col("c_custkey") > cut).count()
    assert got.filter(F.col("c_custkey") <= cut).count() == 0
    # no matching rows => no-op, version unchanged
    v2, r2, u2 = delete_where(spark, path, f"c_custkey <= {cut}")
    assert (v2, r2) == (v, 0)
    assert history(path)[0]["operation"] == "DELETE"


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import delete_where

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id int, v double"
    )
    write_delta(spark, df, path)
    delete_where(spark, path, "v > 10")  # NULL > 10 is NULL -> row kept
    got = {r.id for r in read_delta(spark, path).collect()}
    assert got == {1, 2}


def test_txn_makes_commits_idempotent(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        last_txn_version,
        merge_delta,
    )

    path = str(tmp_path / "t")
    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double")
    write_delta(spark, target, path)
    src = spark.createDataFrame([(2, 99.0), (3, 30.0)], "id int, v double")
    v1 = merge_delta(spark, src, path, on=["id"], txn=("app", 0))
    assert last_txn_version(path, "app") == 0
    state = {tuple(r) for r in read_delta(spark, path).collect()}
    # replayed batch 0: no new version, no state change
    assert merge_delta(spark, src, path, on=["id"], txn=("app", 0)) == v1
    assert {tuple(r) for r in read_delta(spark, path).collect()} == state
    # a different app's ledger is independent
    assert last_txn_version(path, "other") == -1
    v2 = merge_delta(spark, src, path, on=["id"], txn=("other", 0))
    assert v2 == v1 + 1


def test_concurrent_appends_both_commit(spark, tmp_path):
    """Two appenders racing the same head: the version-race loser must
    retry at the next version (append conflicts with nothing), so both
    land and no rows are lost."""
    import threading

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.limit(0), path)
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def appender(lo: int, hi: int) -> None:
        try:
            barrier.wait()
            write_delta(
                spark,
                n.filter(
                    (F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < hi)
                ),
                path,
                mode="append",
            )
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    t1 = threading.Thread(target=appender, args=(0, 10))
    t2 = threading.Thread(target=appender, args=(10, 30))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    snap = snapshot(path)
    assert snap.version == 2
    assert read_delta(spark, path).count() == n.count()


def test_empty_partition_filter_returns_typed_empty(spark, three_version_table):
    df = read_delta(
        spark, three_version_table, partition_filter={"n_regionkey": {"99"}}
    )
    assert df.count() == 0
    assert "n_regionkey" in df.columns and "n_name" in df.columns


def test_zorder_optimize_clusters_disjoint_rectangles(spark, tmp_path):
    from pyspark_excel_datasource_spark.operators.scale import (
        _Z_BITS,
        _z_interleave_sql,
    )
    from pyspark_excel_datasource_spark.sources.deltalog import optimize

    path = str(tmp_path / "t")
    ev = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .select("event_id", "user_id", "event_type")
        .limit(4000)
    )
    write_delta(spark, ev.repartition(6), path)
    rows_before = read_delta(spark, path).count()
    v = optimize(spark, path, zorder_by=("user_id", "event_id"), target_files=4)
    snap = snapshot(path)
    assert snap.version == v and 1 < len(snap.files) <= 4
    assert read_delta(spark, path).count() == rows_before
    # per-file z ranges are disjoint (range partitioning by z-value) —
    # recomputed with the SAME range-normalized grid optimize uses
    # (since r12 columns are scaled into [0, 2^bits) by their min/max,
    # so wide-domain keys don't wrap and decorrelate)
    lim = (1 << _Z_BITS) - 1
    b = ev.agg(
        F.min(F.col("user_id").cast("double")).alias("alo"),
        F.max(F.col("user_id").cast("double")).alias("ahi"),
        F.min(F.col("event_id").cast("double")).alias("blo"),
        F.max(F.col("event_id").cast("double")).alias("bhi"),
    ).first()

    def _grid(col, lo, hi):
        scale = lim / (hi - lo)
        return (
            f"CAST(LEAST({lim}, GREATEST(0, FLOOR("
            f"(CAST({col} AS DOUBLE) - {lo!r}) * {scale!r}))) AS BIGINT)"
        )

    zexpr = _z_interleave_sql(
        _grid("user_id", b["alo"], b["ahi"]),
        _grid("event_id", b["blo"], b["bhi"]),
    )
    per_file = (
        spark.read.parquet(*[os.path.join(path, p) for p in snap.files])
        .withColumn("__z", F.expr(zexpr))
        .groupBy(F.col("_metadata.file_path").alias("f"))
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev_r, cur in zip(per_file, per_file[1:]):
        assert prev_r.hi <= cur.lo
    # zorder on a partitioned table is rejected
    p2 = str(tmp_path / "t2")
    write_delta(spark, ev, p2, partition_by=("event_type",))
    with pytest.raises(ValueError, match="unpartitioned"):
        optimize(spark, p2, zorder_by=("user_id", "event_id"))


def test_merge_source_null_clears_target_value(spark, tmp_path):
    """Matched-takes-source must hold when the source VALUE is null."""
    path = str(tmp_path / "t")
    write_delta(
        spark,
        spark.createDataFrame([(1, "keep"), (2, "stale")], "id int, v string"),
        path,
    )
    src = spark.createDataFrame([(2, None)], "id int, v string")
    merge_delta(spark, src, path, on=["id"])
    got = {tuple(r) for r in read_delta(spark, path).collect()}
    assert got == {(1, "keep"), (2, None)}


def test_change_feed_invisible_across_optimize(spark, tmp_path):
    """dataChange=false rewrites contribute NOTHING to the change feed."""
    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.repartition(4), path)
    v = optimize(spark, path)
    assert read_change_feed(spark, path, 0, v).count() == 0
    # an append after the optimize still streams normally
    write_delta(spark, n.limit(3), path, mode="append")
    cdf = read_change_feed(spark, path, v, v + 1)
    assert cdf.filter(F.col("_change_type") == "insert").count() == 3
    assert cdf.filter(F.col("_change_type") == "delete").count() == 0


def test_vacuum_retention_protects_recent_files(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import vacuum

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n, path)
    write_delta(spark, n.limit(5), path, mode="overwrite")
    # everything on disk is seconds old: a retention window spares it all
    assert vacuum(path, retention_seconds=3600) == 0
    assert vacuum(path) > 0  # explicit zero-retention reclaims


def test_delete_partitions_validates_keys(spark, three_version_table):
    with pytest.raises(ValueError, match="not partition columns"):
        delete_partitions(three_version_table, {"n_name": "x"})


def test_stream_rewrite_commit_needs_ignore_changes(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n, path)
    write_delta(spark, n.limit(5), path, mode="overwrite")  # removes + adds
    sch = snapshot(path).schema
    # ignoreDeletes alone is NOT enough: skipping only the removes would
    # half-apply the rewrite
    r = DeltaStreamReader(sch, {"path": path, "ignoreDeletes": "true"})
    with pytest.raises(RuntimeError, match="ignoreChanges"):
        r.partitions({"version": 0}, {"version": 1})
    # ignoreChanges streams the rewritten files
    r2 = DeltaStreamReader(sch, {"path": path, "ignoreChanges": "true"})
    parts = r2.partitions({"version": 0}, {"version": 1})
    assert len(parts) == len(snapshot(path, 1).files)


def test_stream_reads_pre_evolution_files_with_nulls(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.select("n_nationkey", "n_name"), path)
    write_delta(
        spark,
        n.select("n_nationkey", "n_name", "n_regionkey").limit(3),
        path,
        mode="append",
        merge_schema=True,
    )
    sch = snapshot(path).schema  # evolved: includes n_regionkey
    r = DeltaStreamReader(sch, {"path": path})
    rows = []
    for part in r.partitions({"version": -1}, {"version": 1}):
        for batch in r.read(part):
            rows.extend(batch.to_pylist())
    assert len(rows) == n.count() + 3
    # pre-evolution rows surface the new column as null, not a crash
    assert sum(1 for x in rows if x["n_regionkey"] is None) == n.count()


def test_partition_values_needing_uri_encoding_round_trip(spark, tmp_path):
    """Partition values whose hive-dir spelling the Hadoop Path URI
    percent-encodes (spaces, %, #, unicode) must survive the read's
    file-map join: the scan emits ENCODED paths while the log stores RAW
    ones, and a raw-only join key silently dropped every row of such
    partitions (round-9 finding: '4-NOT SPECIFIED' lost all rows)."""
    path = str(tmp_path / "enc")
    vals = ["plain", "has space", "pct%20literal", "uni_é", "x#y", "a+b"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, part string"
    )
    write_delta(spark, df, path, partition_by=("part",))
    got = read_delta(spark, path)
    assert got.count() == len(vals)
    assert {r.part for r in got.collect()} == set(vals)
    # log-level pruning still exact on an encoded value
    one = read_delta(spark, path, partition_filter={"part": {"has space"}})
    assert [r.id for r in one.collect()] == [1]


def test_scan_delta_pruned_plans_fraction_of_files(spark):
    """q_scan_delta_pruned's partition_filter must prune at the LOG
    level: the planned file set is the F partition's files only (~1/2
    of the live table after the P delete, exactly the F fraction)."""
    from pyspark_excel_datasource_spark.sources.delta_queries import (
        _materialize_orders_delta,
    )

    path = _materialize_orders_delta(spark, "/root/testdata/sf0.001")
    full = read_delta(spark, path)
    pruned = read_delta(
        spark, path, partition_filter={"o_orderstatus": {"F"}}
    )
    n_full, n_pruned = len(full.inputFiles()), len(pruned.inputFiles())
    assert 0 < n_pruned < n_full
    # live statuses after the P delete are F and O; F is one of two
    assert n_pruned <= n_full - n_pruned + 1, (n_pruned, n_full)


def test_fresh_stream_after_optimize_vacuum_fails_loudly(spark, tmp_path):
    """The Delta analog of the Iceberg compaction+expiry guard: OPTIMIZE
    rewrites files (dataChange=false, invisible to the stream), VACUUM
    then physically removes the originals — a FRESH stream can no longer
    attribute those rows to any offset, so partitions() must raise a
    clear planning-time error (never silently return fewer rows, never a
    worker FileNotFound)."""
    from pyspark_excel_datasource_spark.sources.delta_stream import (
        DeltaStreamReader,
    )
    from pyspark_excel_datasource_spark.sources.deltalog import vacuum

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n.repartition(4), path)
    optimize(spark, path)
    assert vacuum(path) > 0  # the original 4 files are gone
    r = DeltaStreamReader(snapshot(path).schema, {"path": path})
    with pytest.raises(RuntimeError, match="VACUUM"):
        r.partitions({"version": -1}, {"version": snapshot(path).version})
    # a stream starting at the current version is unaffected
    v = snapshot(path).version
    assert r.partitions({"version": v}, {"version": v}) == []


def test_delete_where_on_encoded_partition_values(spark, tmp_path):
    """Round-10 find: row-level DML on a partition whose hive-dir
    spelling is URI-encoded ("4-NOT SPECIFIED" → %20). The scan column
    emits the ENCODED spelling; the file_column consumers (COW removes,
    DV re-adds) must use the LOG key or the commit corrupts the
    snapshot (double-encoded remove / re-added ghost file)."""
    from pyspark_excel_datasource_spark.sources.deltalog import (
        delete_where,
        snapshot,
    )

    for mode in ("copy-on-write", "deletion-vectors"):
        path = str(tmp_path / f"enc_{mode}")
        df = spark.createDataFrame(
            [(i, "4-NOT SPECIFIED" if i % 2 else "1-URGENT") for i in range(10)],
            "k long, p string",
        )
        write_delta(spark, df, path, partition_by=("p",))
        delete_where(spark, path, "k >= 8", mode=mode)
        got = sorted(r.k for r in read_delta(spark, path).collect())
        assert got == list(range(8)), mode
        snap = snapshot(path)
        # every live key must be a RAW log key (no %25 double-encoding,
        # no encoded ghost duplicates)
        assert all("%2520" not in k and "%20" not in k for k in snap.files), (
            mode,
            sorted(snap.files),
        )


def test_update_where_is_file_granular(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import update_where

    path = str(tmp_path / "t")
    cust = spark.read.parquet(os.path.join(SF, "customer.parquet")).select(
        "c_custkey", "c_acctbal"
    )
    write_delta(spark, cust.repartitionByRange(4, "c_custkey"), path)
    before = snapshot(path)
    cut = cust.agg(F.expr("max(c_custkey) div 4")).collect()[0][0]
    v, rewritten, untouched = update_where(
        spark, path, f"c_custkey <= {cut}", {"c_acctbal": "c_acctbal + 1.0"}
    )
    after = snapshot(path)
    # range clustering => the predicate touches only the low-range files
    assert rewritten >= 1 and untouched >= 1
    assert rewritten + untouched == len(before.files)
    # untouched files keep their exact paths across the commit
    assert len(set(before.files) & set(after.files)) == untouched
    got = read_delta(spark, path)
    # row count preserved; matched rows bumped, carried rows verbatim
    assert got.count() == cust.count()
    exp_sum = cust.agg(
        F.sum(
            F.when(
                F.col("c_custkey") <= cut, F.col("c_acctbal") + 1.0
            ).otherwise(F.col("c_acctbal")).cast("decimal(18,2)")
        )
    ).collect()[0][0]
    assert (
        got.agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))).collect()[0][0]
        == exp_sum
    )
    # no matching rows => no-op, version unchanged
    v2, r2, _u2 = update_where(
        spark, path, "c_custkey < 0", {"c_acctbal": "0.0"}
    )
    assert (v2, r2) == (v, 0)
    assert history(path)[0]["operation"] == "UPDATE"


def test_update_where_null_predicate_keeps_rows(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import update_where

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id int, v double"
    )
    write_delta(spark, df, path)
    update_where(spark, path, "v > 10", {"id": "id + 100"})
    got = {(r.id, r.v) for r in read_delta(spark, path).collect()}
    # NULL > 10 is NULL -> row 2 untouched (SQL UPDATE semantics)
    assert got == {(1, 5.0), (2, None), (103, 50.0)}


def test_update_where_dv_writes_no_data_bytes(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import update_where

    path = str(tmp_path / "t")
    cust = spark.read.parquet(os.path.join(SF, "customer.parquet")).select(
        "c_custkey", "c_acctbal"
    )
    write_delta(spark, cust.repartitionByRange(4, "c_custkey"), path)
    before = snapshot(path)
    sizes_before = {
        rel: os.path.getsize(os.path.join(path, rel)) for rel in before.files
    }
    n_neg = cust.filter(F.col("c_acctbal") < 0).count()
    assert n_neg > 0
    v, touched, _ = update_where(
        spark, path, "c_acctbal < 0", {"c_acctbal": "-c_acctbal"},
        mode="deletion-vectors",
    )
    after = snapshot(path)
    # every pre-existing data file survives byte-identical
    for rel, size in sizes_before.items():
        assert rel in after.files
        assert os.path.getsize(os.path.join(path, rel)) == size
    # matched files carry DVs; updated rows arrived as appended files
    assert touched >= 1 and len(after.dvs) == touched
    assert set(before.files) <= set(after.files)
    assert len(after.files) > len(before.files)
    got = read_delta(spark, path)
    assert got.count() == cust.count()
    assert got.filter(F.col("c_acctbal") < 0).count() == 0
    # a later COW update on the DV'd table must not resurrect hidden rows
    update_where(spark, path, "c_acctbal >= 0", {"c_acctbal": "c_acctbal"})
    assert read_delta(spark, path).count() == cust.count()


def test_update_where_enforces_check_constraints(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        DeltaConstraintViolationError,
        add_check_constraint,
        update_where,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id int, v double")
    write_delta(spark, df, path)
    add_check_constraint(spark, path, "v_pos", "v > 0")
    v_before = snapshot(path).version
    with pytest.raises(DeltaConstraintViolationError):
        update_where(spark, path, "id = 1", {"v": "-v"})
    # aborted before any commit; table unchanged
    assert snapshot(path).version == v_before
    assert {r.v for r in read_delta(spark, path).collect()} == {5.0, 7.0}
    with pytest.raises(DeltaConstraintViolationError):
        update_where(
            spark, path, "id = 1", {"v": "-v"}, mode="deletion-vectors"
        )
    assert snapshot(path).version == v_before


def test_update_where_set_is_cast_to_column_type(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import update_where

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id int, v double")
    write_delta(spark, df, path)
    before_schema = read_delta(spark, path).schema
    # the SET expression is BIGINT; the column stays INT
    update_where(spark, path, "id = 2", {"id": "CAST(id AS BIGINT) + 40"})
    got = read_delta(spark, path)
    assert got.schema == before_schema
    assert {r.id for r in got.collect()} == {1, 42}


def test_update_where_moves_rows_across_partitions(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import update_where

    path = str(tmp_path / "t")
    n = _nation(spark)
    write_delta(spark, n, path, partition_by=("n_regionkey",))
    update_where(
        spark, path, "n_regionkey = 0", {"n_regionkey": "9"}
    )
    got = read_delta(spark, path)
    assert got.filter(F.col("n_regionkey") == 0).count() == 0
    assert (
        got.filter(F.col("n_regionkey") == 9).count()
        == n.filter(F.col("n_regionkey") == 0).count()
    )
    # moved rows landed under the new hive dir (partition col is
    # log-only, so the pv map is what must have moved)
    moved = {
        rel
        for rel, pv in snapshot(path).files.items()
        if pv.get("n_regionkey") == "9"
    }
    assert moved


def test_update_where_rejects_unknown_set_column(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import update_where

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 5.0)], "id int, v double")
    write_delta(spark, df, path)
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, path, "id = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="empty SET"):
        update_where(spark, path, "id = 1", {})


def test_clone_is_metadata_only_and_independent(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        clone_delta,
        delete_where,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    n = _nation(spark)
    write_delta(spark, n, src, partition_by=("n_regionkey",))
    clone_delta(src, tgt)
    # zero data files under the clone — pure metadata
    data_files = [
        f
        for root, _d, fs in os.walk(tgt)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in root
    ]
    assert data_files == []
    got = read_delta(spark, tgt)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in n.select(*got.columns).collect()
    }
    # divergence is one-directional
    delete_where(spark, tgt, "n_regionkey = 0")
    assert read_delta(spark, tgt).count() == n.filter("n_regionkey <> 0").count()
    assert read_delta(spark, src).count() == n.count()
    write_delta(spark, n.limit(3), src, mode="append", partition_by=("n_regionkey",))
    assert read_delta(spark, tgt).count() == n.filter("n_regionkey <> 0").count()


def test_clone_time_travel_and_guards(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        clone_delta,
        delete_where,
    )

    src = str(tmp_path / "src")
    n = _nation(spark)
    write_delta(spark, n.filter("n_regionkey < 2"), src)
    write_delta(spark, n.filter("n_regionkey >= 2"), src, mode="append")
    t0 = str(tmp_path / "t0")
    clone_delta(src, t0, version=0)
    assert read_delta(spark, t0).count() == n.filter("n_regionkey < 2").count()
    with pytest.raises(ValueError, match="already a Delta table"):
        clone_delta(src, t0)
    # DV'd sources refuse to clone (descriptors are table-root-relative)
    delete_where(spark, src, "n_regionkey = 4", mode="deletion-vectors")
    with pytest.raises(Exception, match="deletion vector|deletionVector"):
        clone_delta(src, str(tmp_path / "t2"))


def test_vacuum_on_clone_never_touches_source(spark, tmp_path):
    from pyspark_excel_datasource_spark.sources.deltalog import (
        clone_delta,
        vacuum,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    n = _nation(spark)
    write_delta(spark, n, src)
    clone_delta(src, tgt)
    # overwrite the clone so the absolute references become dead
    write_delta(spark, n.limit(5), tgt, mode="overwrite")
    before = sum(len(fs) for _r, _d, fs in os.walk(src))
    vacuum(tgt, retention_seconds=0.0)
    assert sum(len(fs) for _r, _d, fs in os.walk(src)) == before
    assert read_delta(spark, tgt).count() == 5
    assert read_delta(spark, src).count() == n.count()
