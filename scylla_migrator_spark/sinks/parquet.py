"""Parquet sink (reference K5, writers/Parquet.scala:10-27).

Beyond the reference's plain write, the sink exposes the two physical-layout
controls that matter at 100 TB:

* ``partition_by`` — hive-style directory partitioning; downstream reads
  with a filter on the partition columns are partition-PRUNED (no file
  opens outside matching directories).
* ``repartition_columns`` — cluster rows into files by key before writing
  so each partition directory gets few large files instead of
  (tasks x partitions) small ones — the classic small-files failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "snappy",
    partition_by: list[str] | None = None,
    repartition_columns: list[str] | None = None,
) -> None:
    if repartition_columns:
        df = df.repartition(*[df[c] for c in repartition_columns])
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
