#!/usr/bin/env python
"""Round-12 streaming fixed-cost profiler (guide §1).

Runs two representative availableNow streaming scenarios exactly the way
`_run_available_now` does, but keeps the StreamingQuery handle and dumps
each micro-batch's `durationMs` breakdown (queryPlanning, getBatch,
walCommit, addBatch, commitOffsets, stateStore metrics) plus the
start->first-batch latency — so the trigger-scheduling overhead the
verdict flags is split into its actual parts. Optionally points the
checkpoint at an alternate directory (first CLI arg) to A/B checkpoint
I/O (e.g. /dev/shm vs /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scylla_migrator_spark.plans import queries as Q  # noqa: E402
from scylla_migrator_spark.session import get_spark  # noqa: E402

CKPT_ROOT = sys.argv[1] if len(sys.argv) > 1 else tempfile.gettempdir()


def run_one(spark, sf_dir, label, stream_df, output_mode):
    name = f"mem_{uuid.uuid4().hex[:12]}"
    with Q._stream_shuffle_partitions(spark):
        t0 = time.perf_counter()
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="sgs_prof_ckpt_", dir=CKPT_ROOT),
            )
            .trigger(availableNow=True)
            .start()
        )
        t_started = time.perf_counter() - t0
        q.awaitTermination()
        t_total = time.perf_counter() - t0
    print(f"\n=== {label}: start()={t_started:.3f}s total={t_total:.3f}s ===")
    for p in q.recentProgress:
        dm = p["durationMs"]
        print(
            f"  batch {p['batchId']}: rows={p['numInputRows']} "
            f"{json.dumps(dm)}"
        )
        for op in p.get("stateOperators", []):
            print(
                f"    state[{op.get('operatorName')}]: commitMs={op.get('allUpdatesTimeMs')}"
                f"/{op.get('commitTimeMs')} mem={op.get('memoryUsedBytes')}"
            )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    return t_total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    print(f"checkpoint root: {CKPT_ROOT}")
    for _ in range(2):  # second round shows warm-session numbers
        # windowed aggregation (1 stateful op)
        agg = (
            Q._events_stream(spark, sf_dir)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
        )
        run_one(spark, sf_dir, "windowed_counts", agg, "complete")

        # stream-stream join (2-sided state)
        s1 = Q._events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
        s2 = (
            Q._events_stream(spark, sf_dir)
            .withWatermark("ts", "1 hour")
            .select(
                F.col("event_id").alias("e2"),
                F.col("ts").alias("ts2"),
                F.col("user_id").alias("u2"),
            )
        )
        j = s1.join(
            s2,
            (s1["user_id"] == s2["u2"])
            & (s2["ts2"] >= s1["ts"])
            & (s2["ts2"] <= s1["ts"] + F.expr("INTERVAL 10 MINUTES")),
        ).select("event_id", "e2")
        run_one(spark, sf_dir, "stream_stream_join_like", j, "append")

    spark.stop()


if __name__ == "__main__":
    main()
