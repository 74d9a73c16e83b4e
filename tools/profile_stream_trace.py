"""Trace the pydelta stream runner's lifecycle: log wall time + pid at
each DataSourceStreamReader callback to find where the fixed ~2s of
q_stream_delta's drain goes (runner spawn? offset round trips? read
tasks?).  Writes /tmp/stream_trace.jsonl; prints a per-rep timeline.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.datasource import DataSource  # noqa: E402

from pyspark_excel_datasource_spark.session import get_session  # noqa: E402
from pyspark_excel_datasource_spark.sources.delta_queries import (  # noqa: E402
    _materialize_orders_delta,
)
from pyspark_excel_datasource_spark.sources import delta_stream as ds  # noqa: E402

TRACE = "/tmp/stream_trace.jsonl"


def _log(event: str) -> None:
    pid = os.getpid()
    try:
        with open(f"/proc/{pid}/stat") as fh:
            starttime_ticks = int(fh.read().split(")")[-1].split()[19])
        with open("/proc/uptime") as fh:
            uptime = float(fh.read().split()[0])
        hz = os.sysconf("SC_CLK_TCK")
        proc_age = uptime - starttime_ticks / hz
    except Exception:
        proc_age = -1.0
    with open(TRACE, "a") as fh:
        fh.write(
            json.dumps(
                {
                    "t": time.time(),
                    "pid": pid,
                    "proc_age": round(proc_age, 3),
                    "event": event,
                }
            )
            + "\n"
        )


class TracedReader(ds.DeltaStreamReader):
    def __init__(self, schema, options):
        _log("reader.__init__.enter")
        super().__init__(schema, options)
        _log("reader.__init__.exit")

    def initialOffset(self):
        _log("initialOffset")
        return super().initialOffset()

    def latestOffset(self):
        _log("latestOffset.enter")
        r = super().latestOffset()
        _log("latestOffset.exit")
        return r

    def partitions(self, start, end):
        _log("partitions.enter")
        r = super().partitions(start, end)
        _log("partitions.exit")
        return r

    def commit(self, end):
        _log("commit")
        return super().commit(end)

    def read(self, partition):
        _log("read.enter")
        yield from super().read(partition)
        _log("read.exit")


class TracedSource(DataSource):
    @classmethod
    def name(cls):
        return "pydelta_traced"

    def schema(self) -> T.StructType:
        _log("schema.enter")
        from pyspark_excel_datasource_spark.sources.deltalog import snapshot

        r = snapshot(self.options.get("path")).schema
        _log("schema.exit")
        return r

    def streamReader(self, schema):
        return TracedReader(schema, dict(self.options))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile-stream-trace")
    spark.dataSource.register(TracedSource)
    path = _materialize_orders_delta(spark, sf_dir)
    # JVM warmup
    spark.range(1000000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    for i in range(reps):
        if os.path.exists(TRACE):
            os.unlink(TRACE)
        sink = f"trace_{uuid.uuid4().hex[:8]}"
        marks = {}
        t0 = time.time()
        stream = (
            spark.readStream.format("pydelta_traced")
            .option("ignoreDeletes", "true")
            .load(path)
        )
        marks["load_done"] = time.time() - t0
        q = (
            stream.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        marks["start_done"] = time.time() - t0
        q.awaitTermination(120)
        marks["drain_done"] = time.time() - t0
        prog = [json.loads(p.json)["durationMs"] for p in q.recentProgress]
        q.stop()
        marks["stop_done"] = time.time() - t0
        spark.table(sink).groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
        ).write.format("noop").mode("overwrite").save()
        marks["census_done"] = time.time() - t0

        print(f"--- rep {i} ---", flush=True)
        for k, v in marks.items():
            print(f"  {k:<12} +{v:.3f}", flush=True)
        events = []
        with open(TRACE) as fh:
            for line in fh:
                events.append(json.loads(line))
        pid_first: dict[int, float] = {}
        for e in events:
            rel = e["t"] - t0
            extra = ""
            if e["pid"] not in pid_first:
                pid_first[e["pid"]] = rel
                extra = f"  [pid {e['pid']} age={e['proc_age']}s]"
            if e["event"] in ("read.enter", "read.exit") and len(
                [x for x in events if x["event"] == e["event"]]
            ) > 4:
                continue
            print(f"  {rel:+.3f}  {e['event']}{extra}", flush=True)
        print(f"  progress durationMs: {prog}", flush=True)


if __name__ == "__main__":
    main()
