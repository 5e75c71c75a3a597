"""DynamoDB segment scan (fixture engine).

Reference parity — readers/DynamoDB.scala:31-195 (S7):
* parallel scan split into ``scan_segments`` segments; each Spark partition
  scans one segment (Segment/TotalSegments semantics)
* segment exclusion for resume (EXCLUDED_SCAN_SEGMENTS, :183-187 / F4):
  pruned from the segment list BEFORE planning — skipped segments are never
  scanned
* throughput rate limiting: RCU budget split across segments, enforced by a
  per-partition token bucket (:164-177 / Z8)
* ``max_map_tasks`` caps concurrent segment tasks (:145-162)

The fixture "table" is a parquet dataset; segment membership is a
deterministic hash of the key column — the same item->segment assignment a
real scan would produce. The scan body is ``mapInPandas`` so the rate
limiter acts on real Arrow batches exactly where a boto3 Scan loop would sit;
with no rate limit the path is a plain pruned DataFrame filter (no Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_migrator_spark.functions.throughput import TokenBucket, per_partition_rate


def segment_of(key_col: str, scan_segments: int):
    """Deterministic item->segment assignment (hash-partitioned like the
    service's internal partitioning)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(scan_segments)).cast("int")


def scan_table(
    spark: SparkSession,
    path: str,
    key_col: str,
    scan_segments: int = 8,
    skip_segments: list[int] | None = None,
    max_map_tasks: int | None = None,
    read_rate_limit: float | None = None,
    rcu_per_item: float = 0.5,
) -> DataFrame:
    """Segmented scan with resume pruning and optional RCU rate limiting.

    Returns the items plus a ``__segment`` column (progress tracking feeds
    savepoints.complete_segments)."""
    skip = set(skip_segments or [])
    live = [s for s in range(scan_segments) if s not in skip]
    if not live:
        raise ValueError("all segments excluded")

    df = spark.read.parquet(path).withColumn("__segment", segment_of(key_col, scan_segments))
    # resume pruning: excluded segments never leave the scan filter;
    # the filter is a partition-level predicate on a derived column, cheap
    df = df.filter(F.col("__segment").isin(live))

    # one task per segment (Segment/TotalSegments); max_map_tasks caps
    # concurrency exactly like the reference's maxMapTasks
    parts = min(len(live), max_map_tasks) if max_map_tasks else len(live)
    df = df.repartition(parts, F.col("__segment"))

    if read_rate_limit is None:
        return df

    rate = per_partition_rate(read_rate_limit, parts)
    schema = df.schema

    def limited(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate=rate)
        for pdf in batches:
            bucket.acquire(len(pdf) * rcu_per_item)
            yield pdf

    return df.mapInPandas(limited, schema)
