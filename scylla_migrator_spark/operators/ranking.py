"""Distributed global ranking — row_number over a total order WITHOUT the
single-reducer window.

``Window.orderBy(...)`` with no partitionBy moves the whole dataset to one
task (Spark even warns); at 100 TB that is not a slow plan, it is a dead
one. The standard distributed construction used here:

1. ``repartitionByRange`` on the order key — Spark's range partitioner
   samples the key distribution and assigns contiguous, SORTED key ranges
   to partitions;
2. per-partition counts (one tiny aggregate: #partitions rows) cumsum to
   per-partition OFFSETS driver-side;
3. per-partition ``row_number`` (the window partitions by
   ``spark_partition_id()``, so every partition ranks in parallel) plus the
   broadcast offset.

The result is bit-identical to the global ``row_number`` for a TOTAL order
(make the key unique — pass a tiebreaker column), with max parallelism and
one range shuffle. This is the primitive behind sorted-neighborhood
blocking (dedup.sorted_neighborhood_pairs) and any "global rank/ntile at
scale" need.

Correctness-critical detail: the range-partitioned frame is materialized
ONCE (``localCheckpoint``) before the per-partition counts are collected.
Spark's RangePartitioner derives its boundaries from a reservoir SAMPLE
whose seed depends on the per-job RDD id — two independent executions of
the same ``repartitionByRange`` lineage are not guaranteed the same
boundaries once the sampler stops seeing every row. Without the
checkpoint, the offsets job and the consumer job could disagree on which
rows live in which partition and the "global" ranks would silently be
wrong at scale. The checkpoint pins one physical partitioning that both
jobs read; its storage cost is one pass over the ranked columns, which
the construction needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based global row number in ``order_cols`` order, computed
    with range partitioning + per-partition offsets instead of a
    single-partition window. ``order_cols`` must be a TOTAL order (include
    a unique tiebreaker) or ties land nondeterministically across the
    range boundaries."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Materialize the range partitioning ONCE so the offsets job and the
    # consumer job read the SAME physical partitions (see module docstring:
    # range boundaries are sample-derived per execution otherwise).
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # the partition-local sort below feeds the per-partition window; the
    # cross-partition order is already guaranteed by the range partitioner
    sizes = {
        r["__pid"]: r["c"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    # broadcast join, not a per-partition literal map: at 100k partitions a
    # literal map is a 100k-entry expression in every task's codegen.
    off_df = spark.createDataFrame(offsets, "__pid int, __off bigint")
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            out_col, F.row_number().over(w) + F.coalesce("__off", F.lit(0))
        )
        .drop("__pid", "__off")
    )
