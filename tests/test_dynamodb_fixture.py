"""DynamoDB fixture source/sink + throughput governance tests
(reference S7/K3/K4/Z8, SkippedSegmentsTest semantics)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from scylla_migrator_spark.functions.throughput import TokenBucket, effective_rate, per_partition_rate
from scylla_migrator_spark.sinks.dynamodb import (
    TableDescription,
    delete_items,
    replicate_table_definition,
    write_items,
)
from scylla_migrator_spark.sources.dynamodb import scan_table, segment_of


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.slept = 0.0

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.t += s
        self.slept += s


def test_token_bucket_paces():
    clk = FakeClock()
    b = TokenBucket(rate=10, capacity=10, clock=clk)
    assert b.acquire(10) == 0.0  # initial burst free
    b.acquire(10)  # must wait ~1s for refill
    assert clk.slept == pytest.approx(1.0, abs=0.01)
    assert b.try_acquire(1) is False


def test_effective_rate_resolution():
    assert effective_rate(provisioned=1000, percent=0.5) == 500
    assert effective_rate(provisioned=None, percent=0.5) == 20000  # on-demand default
    assert effective_rate(provisioned=1000, percent=0.8, configured=200) == 160
    with pytest.raises(ValueError):
        effective_rate(1000, 0.0)
    assert per_partition_rate(100, 8) == 12.5


def test_segment_scan_and_exclusion(spark, sf_dir):
    path = f"{sf_dir}/orders.parquet"
    full = scan_table(spark, path, "o_orderkey", scan_segments=4)
    total = spark.read.parquet(path).count()
    assert full.count() == total
    segs = {r["__segment"] for r in full.select("__segment").distinct().collect()}
    assert segs == {0, 1, 2, 3}

    # resume: skip segments 0 and 2 (SkippedSegmentsTest shape, F9)
    partial = scan_table(spark, path, "o_orderkey", scan_segments=4, skip_segments=[0, 2])
    remaining = {r["__segment"] for r in partial.select("__segment").distinct().collect()}
    assert remaining == {1, 3}
    # complement property: partial + skipped == full
    skipped = scan_table(spark, path, "o_orderkey", scan_segments=4, skip_segments=[1, 3])
    assert partial.count() + skipped.count() == total

    with pytest.raises(ValueError):
        scan_table(spark, path, "o_orderkey", scan_segments=2, skip_segments=[0, 1])


def test_segment_assignment_deterministic(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = df.select(segment_of("o_orderkey", 8).alias("s")).collect()
    b = df.select(segment_of("o_orderkey", 8).alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]


def test_rate_limited_scan_returns_same_rows(spark, sf_dir):
    path = f"{sf_dir}/orders.parquet"
    fast = scan_table(spark, path, "o_orderkey", scan_segments=4)
    limited = scan_table(
        spark, path, "o_orderkey", scan_segments=4, read_rate_limit=1e9, rcu_per_item=0.5
    )
    assert limited.count() == fast.count()


def test_write_items_batches_and_renames(spark, tmp_path):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(60)], "pk bigint, foo string")
    out_dir = str(tmp_path / "ddb_out")
    write_items(df.repartition(2), out_dir, renames={"foo": "bar"})
    ops = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            ops += [json.loads(line) for line in f]
    assert len(ops) == 60
    assert all(o["op"] == "PUT" and "bar" in o["item"] and "foo" not in o["item"] for o in ops)


def test_delete_items_projects_keys(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 9.0), (2, "b", 8.0)], "pk bigint, sk string, v double")
    out_dir = str(tmp_path / "ddb_del")
    delete_items(df, ["pk", "sk"], out_dir)
    ops = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            ops += [json.loads(line) for line in f]
    assert len(ops) == 2
    assert all(o["op"] == "DELETE" and set(o["key"]) == {"pk", "sk"} for o in ops)


def test_table_ddl_replication():
    catalog = {}
    desc = TableDescription("t1", [("pk", "HASH"), ("sk", "RANGE")], provisioned_wcu=100)
    assert replicate_table_definition(catalog, desc) is True
    assert replicate_table_definition(catalog, desc) is False  # idempotent
    assert catalog["t1"]["KeySchema"][0] == {"AttributeName": "pk", "KeyType": "HASH"}


def test_write_items_idempotent_file_names(spark, tmp_path):
    """Retried/replayed partition writes land on the SAME file (deterministic
    per-partition name) — no duplicate operations accumulate."""
    import os

    from scylla_migrator_spark.sinks.dynamodb import write_items

    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "pk bigint, v string")
    out_dir = str(tmp_path / "idem")
    write_items(df.repartition(2), out_dir)
    first = sorted(os.listdir(out_dir))
    write_items(df.repartition(2), out_dir)  # replay
    assert sorted(os.listdir(out_dir)) == first
    assert all(f.startswith("put-") for f in first)
