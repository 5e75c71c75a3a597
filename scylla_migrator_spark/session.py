"""SparkSession factory tuned for the engine.

Defaults are chosen for the local[$SPARK_GRAFT_CPUS] test harness but every
setting is the one we would ship on a 1000-executor cluster:

* AQE on (runtime coalescing, skew-join splitting, broadcast demotion)
* Arrow enabled for every pandas-UDF edge
* shuffle partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant as long as it is
  *high enough* (we set ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "scylla-migrator-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # executor Python workers must be able to import this package for the
    # mapInPandas/foreachPartition closures — the driver's sys.path does NOT
    # propagate to workers, so pin the repo root into PYTHONPATH before the
    # workers fork (on a real cluster this is a --py-files zip instead)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", str(cpus * 4))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash join when its size conditions
        # hold, and let AQE rewrite sort-merge to shuffled-hash at runtime
        # when every post-shuffle partition's build side fits a 64 MB local
        # map: the engine's joins are dominated by vocab-/stats-sized sides
        # where the SMJ sort is pure overhead. Scale posture: the 64 MB
        # per-partition cap (not a local[32] constant — it bounds build-map
        # memory per TASK, the same on a 1000-executor cluster) plus AQE
        # skew splitting keeps the build side bounded; oversized partitions
        # simply stay sort-merge. Measured on an 18-row join battery at
        # sf0.1: -15% (28.3 -> 24.1 s), no row slower than noise.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # read parquet TIMESTAMP(NANOS) as epoch-nanos LongType (Spark has no
        # nanosecond timestamp type) — the same widening posture as the
        # reference's CQL millis->LongType rule (Cassandra.scala:191-208)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # resilience posture mirrored from the reference (Migrator.scala:22-23)
        .config("spark.task.maxFailures", "4")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load the driver-provided parquet tables as DataFrames (lazy scans)."""
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
