"""Phase-profile q_stream_delta's data-size-invariant cost (VERDICT r14 #1).

Times each phase of the streaming drain separately — register, fixture
memo check, readStream.load (schema resolution), query start → first
progress, drain, stop, census — plus the per-batch durationMs breakdown
Spark records in StreamingQueryProgress. Run on a quiet host:

    python tools/profile_stream.py [n_reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_excel_datasource_spark.session import get_session  # noqa: E402
from pyspark_excel_datasource_spark.sources.delta_queries import (  # noqa: E402
    _materialize_orders_delta,
)
from pyspark_excel_datasource_spark.sources.delta_stream import (  # noqa: E402
    register_pydelta,
)


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def one_rep(spark, sf_dir: str) -> dict:
    t = {}
    t0 = time.perf_counter()
    register_pydelta(spark)
    t["register"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    path = _materialize_orders_delta(spark, sf_dir)
    t["fixture"] = time.perf_counter() - t0

    sink = f"prof_stream_{uuid.uuid4().hex[:10]}"
    t0 = time.perf_counter()
    stream = (
        spark.readStream.format("pydelta")
        .option("ignoreDeletes", "true")
        .load(path)
    )
    t["load_schema"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    t["start_call"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    q.awaitTermination(120)
    t["drain"] = time.perf_counter() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]

    t0 = time.perf_counter()
    q.stop()
    t["stop"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    materialize(
        spark.table(sink)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
    )
    t["census"] = time.perf_counter() - t0
    t["total"] = sum(t.values())
    t["_progress"] = [
        {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": p.get("durationMs"),
        }
        for p in progress
    ]
    return t


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile-stream")
    # warm the JVM the same way the bench does
    from pyspark_excel_datasource_spark.plans.registry import load_all_queries

    queries = load_all_queries()
    materialize(queries["q_flagship_pricing"](spark, sf_dir))

    for i in range(reps):
        r = one_rep(spark, sf_dir)
        prog = r.pop("_progress")
        print(
            f"rep {i}: " + "  ".join(f"{k}={v:.3f}" for k, v in r.items()),
            flush=True,
        )
        for p in prog:
            print(f"       batch {p['batchId']} rows={p['numInputRows']} "
                  f"durationMs={p['durationMs']}", flush=True)


if __name__ == "__main__":
    main()
