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


STREAM_VIEW_TYPES = frozenset({"NEW_IMAGE", "OLD_IMAGE", "NEW_AND_OLD_IMAGES", "KEYS_ONLY"})


def update_table_stream_spec(
    catalog: dict, table: str, view_type: str = "NEW_IMAGE", polls_until_enabled: int = 2
) -> None:
    """UpdateTable(StreamSpecification) analog on the fixture catalog (K9,
    DynamoUtils.enableDynamoStream's update half, DynamoUtils.scala:337-368).

    First call flips the table to ENABLING with a latest-stream ARN; a call
    on an already-enabled/enabling stream with the SAME view type is an
    idempotent no-op (re-running a migration must not reset the stream), and
    with a DIFFERENT view type it errors like the live API does."""
    if view_type not in STREAM_VIEW_TYPES:
        raise ValueError(f"invalid stream view type {view_type!r}")
    if table not in catalog:
        raise KeyError(f"ResourceNotFound: table {table!r}")
    desc = catalog[table]
    spec = desc.get("StreamSpecification")
    if spec and spec.get("StreamEnabled"):
        if spec["StreamViewType"] != view_type:
            raise ValueError(
                f"stream already enabled with view type {spec['StreamViewType']!r}; "
                "disable it before switching view types"
            )
        return
    desc["StreamSpecification"] = {"StreamEnabled": True, "StreamViewType": view_type}
    desc["LatestStreamArn"] = f"arn:fixture:dynamodb:{desc['TableName']}/stream/1"
    desc["_StreamStatus"] = {"status": "ENABLING", "polls_left": polls_until_enabled}


def describe_stream_status(catalog: dict, table: str) -> str:
    """DescribeStream analog: each poll advances the fixture's ENABLING
    countdown, reaching ENABLED after ``polls_until_enabled`` polls."""
    desc = catalog.get(table)
    if desc is None:
        raise KeyError(f"ResourceNotFound: table {table!r}")
    st = desc.get("_StreamStatus")
    if st is None:
        return "DISABLED"
    if st["status"] == "ENABLING":
        st["polls_left"] -= 1
        if st["polls_left"] <= 0:
            st["status"] = "ENABLED"
    return st["status"]


def enable_dynamo_stream(
    catalog: dict,
    table: str,
    view_type: str = "NEW_IMAGE",
    max_retries: int = 60,
    wait=None,
) -> str:
    """Enable the table's change stream and poll until ENABLED (K9,
    DynamoUtils.scala:337-401: UpdateTable(streamEnabled, NEW_IMAGE), then
    DescribeTable -> DescribeStream every 5s up to 60 retries).

    ``wait`` receives the inter-poll delay in seconds (None = don't sleep —
    the fixture transitions on polls, not wall time). Returns the latest
    stream ARN; raises TimeoutError after ``max_retries`` polls."""
    update_table_stream_spec(catalog, table, view_type)
    retries = 0
    while True:
        status = describe_stream_status(catalog, table)
        if status == "ENABLED":
            return catalog[table]["LatestStreamArn"]
        retries += 1
        if retries >= max_retries:
            raise TimeoutError(
                f"Timed out waiting for stream on table {table!r} to become ENABLED "
                f"(last status: {status}). Gave up after {max_retries} retries."
            )
        if wait is not None:
            wait(5)


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
