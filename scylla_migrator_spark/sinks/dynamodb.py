"""DynamoDB sink (fixture engine): batched puts / deletes via
foreachPartition with WCU rate limiting and renames.

Reference parity:
* K3 write — writers/DynamoDB.scala:79-131: saveAsHadoopDataset replaced by
  a foreachPartition batch writer (25-item batches = BatchWriteItem limit),
  rename map applied per item, WCU token bucket per partition
* K4 delete — writers/DynamoDB.scala:26-77: per-partition DeleteItem for
  each item's key projection
* K8 DDL replication — DynamoUtils.scala:217-335: driver-side create-if-absent

The client is pluggable: production would wrap boto3; tests and the fixture
engine use ``FileClient`` (JSON-lines per partition). The engine ships no AWS
dependency — the seam is the three-method protocol below."""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame

from scylla_migrator_spark.functions.throughput import TokenBucket, per_partition_rate

BATCH_WRITE_LIMIT = 25  # BatchWriteItem max items


class FileClient:
    """Fixture client: writes operations as JSON lines into a directory,
    one file per PARTITION — named deterministically from the task's
    partition id, so a retried task truncates and rewrites the same file
    instead of leaving the failed attempt's partial output beside a second
    copy (idempotent under task retry, like BatchWriteItem replays)."""

    def __init__(self, directory: str):
        self.directory = directory

    def open_for_partition(self, prefix: str = "part"):
        from pyspark import TaskContext

        os.makedirs(self.directory, exist_ok=True)
        ctx = TaskContext.get()
        if ctx is not None:
            name = f"{prefix}-{ctx.partitionId():05d}.jsonl"
        else:  # driver-side use (tests): fall back to a unique name
            name = f"{prefix}-{uuid.uuid4().hex}.jsonl"
        return open(os.path.join(self.directory, name), "w")


@dataclass
class TableDescription:
    """K8: the subset of DescribeTable the engine replicates."""

    name: str
    key_schema: list[tuple[str, str]]  # (attr, HASH|RANGE)
    provisioned_wcu: int | None = None
    provisioned_rcu: int | None = None

    def to_ddl_dict(self) -> dict:
        return {
            "TableName": self.name,
            "KeySchema": [{"AttributeName": a, "KeyType": k} for a, k in self.key_schema],
            "BillingMode": "PROVISIONED" if self.provisioned_wcu else "PAY_PER_REQUEST",
        }


def replicate_table_definition(target_catalog: dict, desc: TableDescription) -> bool:
    """Create the target table from the source description if absent
    (DynamoUtils.scala:217-335). ``target_catalog`` is the fixture catalog
    (dict name->ddl); returns True if created."""
    if desc.name in target_catalog:
        return False
    target_catalog[desc.name] = desc.to_ddl_dict()
    return True


def write_items(
    df: DataFrame,
    directory: str,
    renames: dict[str, str] | None = None,
    write_rate_limit: float | None = None,
    wcu_per_item: float = 1.0,
) -> None:
    """Batched PUTs with renames + WCU limiting. One output file per
    partition; items serialized as {"op": "PUT", "item": {...}}."""
    renames = renames or {}
    num_parts = df.rdd.getNumPartitions()
    rate = per_partition_rate(write_rate_limit, num_parts) if write_rate_limit else None
    client = FileClient(directory)

    def write_partition(rows) -> None:
        bucket = TokenBucket(rate=rate) if rate else None
        out = client.open_for_partition("put")
        batch = []
        try:
            for row in rows:
                item = {renames.get(k, k): v for k, v in row.asDict(recursive=True).items()}
                batch.append(item)
                if len(batch) >= BATCH_WRITE_LIMIT:
                    _flush(out, batch, bucket, wcu_per_item)
                    batch = []
            if batch:
                _flush(out, batch, bucket, wcu_per_item)
        finally:
            out.close()

    def _flush(out, batch, bucket, wcu):
        if bucket is not None:
            bucket.acquire(len(batch) * wcu)
        for item in batch:
            out.write(json.dumps({"op": "PUT", "item": item}, sort_keys=True, default=str) + "\n")

    df.foreachPartition(write_partition)


def delete_items(df: DataFrame, key_cols: list[str], directory: str) -> None:
    """Per-partition DeleteItem for each item's key projection (K4)."""
    client = FileClient(directory)
    keys_df = df.select(*key_cols)

    def delete_partition(rows) -> None:
        out = client.open_for_partition("del")
        try:
            for row in rows:
                out.write(
                    json.dumps({"op": "DELETE", "key": row.asDict()}, sort_keys=True, default=str)
                    + "\n"
                )
        finally:
            out.close()

    keys_df.foreachPartition(delete_partition)
