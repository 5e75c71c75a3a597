"""Cassandra Murmur3 token ring (S1/Z2/E1 deepening): partitioner parity,
ring splitting, and token-range-unit resumable migration over the fixture
CQL source (readers/Cassandra.scala:342-441 tokenRangesToSkip;
CqlSavepointsManager.scala:39-83)."""

from __future__ import annotations

import pytest

from scylla_migrator_spark.sources.token_ring import (
    MAX_TOKEN,
    MIN_TOKEN,
    assign_token_ranges,
    full_ring_ranges,
    migrate_token_ranges,
    murmur3_token,
    range_index_of,
    serialize_pk_bigint,
    serialize_pk_composite,
    serialize_pk_text,
    token_of_bigint,
)


def test_murmur3_known_vectors():
    """Pin the Cassandra Murmur3Partitioner variant against publicly
    documented vectors (the DataStax python-driver's murmur3 unit tests):
    the signed-byte tail quirk makes or breaks these."""
    assert murmur3_token(b"123") == -7468325962851647638
    assert murmur3_token(b"key") == -6847573755651342660
    assert murmur3_token(b"") == 0
    # >= 16-byte keys exercise the block loop, not just the tail
    assert murmur3_token(b"123456789012345678") != murmur3_token(b"123456789012345679")
    # high-bit bytes are where unsigned implementations diverge
    t = murmur3_token(bytes([0xFF, 0x80, 0x01]))
    assert MIN_TOKEN < t <= MAX_TOKEN


def test_serializers():
    assert serialize_pk_bigint(1) == b"\x00\x00\x00\x00\x00\x00\x00\x01"
    assert serialize_pk_bigint(-1) == b"\xff" * 8
    assert serialize_pk_text("foo") == b"foo"
    # composite framing: 2-byte BE length + bytes + 0x00 per component
    assert (
        serialize_pk_composite([b"ab", b"c"])
        == b"\x00\x02ab\x00\x00\x01c\x00"
    )
    # deterministic: same key -> same token, distinct keys spread
    toks = {token_of_bigint(v) for v in range(1000)}
    assert len(toks) == 1000


def test_full_ring_ranges_cover_exactly_once():
    ranges = full_ring_ranges(7)
    assert ranges[0][0] == MIN_TOKEN and ranges[-1][1] == MAX_TOKEN
    # contiguous, no gaps or overlap
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2
    # every token owned by exactly one range, including the boundaries
    for t in [MIN_TOKEN + 1, -1, 0, 1, MAX_TOKEN, ranges[2][1], ranges[3][0] + 1]:
        owners = [i for i, (s, e) in enumerate(ranges) if s < t <= e]
        assert len(owners) == 1
        assert owners[0] == range_index_of(t, ranges)
    with pytest.raises(ValueError):
        range_index_of(MIN_TOKEN, ranges)  # the reserved minimum owns nothing


def test_assign_token_ranges_matches_driver_side(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    ranges = full_ring_ranges(8)
    stamped = assign_token_ranges(orders, "o_orderkey", ranges)
    rows = stamped.limit(200).collect()
    assert rows
    for r in rows:
        assert r["__token"] == token_of_bigint(r["o_orderkey"])
        assert r["__range"] == range_index_of(r["__token"], ranges)
    # ranges partition the table: per-range counts sum to the total
    per = stamped.groupBy("__range").count().collect()
    assert sum(x["count"] for x in per) == orders.count()
    assert len(per) > 1  # murmur3 spreads the keys across ranges


def test_migrate_token_ranges_kill_resume(spark, sf_dir, tmp_path):
    """The CQL-unit resumable loop: die after one chunk of token ranges,
    resume from the savepoint's skip_token_ranges, exact row parity and no
    duplicates (the file-unit twin is test_savepoints.py)."""
    from scylla_migrator_spark.config import MigratorConfig
    from scylla_migrator_spark.savepoints import SavepointsManager

    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": f"{sf_dir}/orders.parquet"},
            "target": {"type": "parquet", "path": str(tmp_path / "out")},
            "primaryKey": ["o_orderkey"],
            "savepoints": {"path": str(tmp_path / "sp"), "intervalSeconds": 3600},
        }
    )
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_src = src.count()

    partial = migrate_token_ranges(
        spark, cfg, n_ranges=8, ranges_per_chunk=2, stop_after_chunks=2
    )
    mgr = SavepointsManager.resume(str(tmp_path / "sp"))
    assert len(mgr.skip_token_ranges) == 4  # 2 chunks x 2 ranges recorded
    n_partial = partial.count()
    assert 0 < n_partial < n_src

    out = migrate_token_ranges(spark, cfg, n_ranges=8, ranges_per_chunk=2)
    assert out.count() == n_src
    assert out.select("o_orderkey").distinct().count() == n_src
    assert len(SavepointsManager.resume(str(tmp_path / "sp")).skip_token_ranges) == 8


def test_migrate_token_ranges_append_never_rewrites_done_ranges(spark, sf_dir, tmp_path):
    """Resume must not touch files of already-committed range partitions:
    the target is partitioned by __range and chunks append disjoint
    partitions (the token-range twin of the streaming upsert's
    byte-identical-untouched-buckets contract)."""
    import os

    from scylla_migrator_spark.config import MigratorConfig

    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": f"{sf_dir}/orders.parquet"},
            "target": {"type": "parquet", "path": str(tmp_path / "out")},
            "primaryKey": ["o_orderkey"],
            "savepoints": {"path": str(tmp_path / "sp"), "intervalSeconds": 3600},
        }
    )
    migrate_token_ranges(spark, cfg, n_ranges=6, ranges_per_chunk=3, stop_after_chunks=1)

    def snapshot(root):
        out = {}
        for r, _d, files in os.walk(root):
            for f in files:
                p = os.path.join(r, f)
                out[p] = (os.stat(p).st_mtime_ns, os.stat(p).st_size)
        return out

    done_dirs = [
        os.path.join(str(tmp_path / "out"), e)
        for e in os.listdir(str(tmp_path / "out"))
        if e.startswith("__range=")
    ]
    assert done_dirs
    before = {d: snapshot(d) for d in done_dirs}
    out = migrate_token_ranges(spark, cfg, n_ranges=6, ranges_per_chunk=3)
    assert {d: snapshot(d) for d in done_dirs} == before
    n_src = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert out.count() == n_src


def test_split_count_config_drives_ring(spark, sf_dir, tmp_path):
    """source.splitCount (SourceSettings.scala:74) sets the ring split count
    when the caller doesn't override n_ranges."""
    from scylla_migrator_spark.config import ConfigError, MigratorConfig
    from scylla_migrator_spark.savepoints import SavepointsManager

    cfg = MigratorConfig.from_dict(
        {
            "source": {
                "type": "parquet",
                "path": f"{sf_dir}/orders.parquet",
                "splitCount": 4,
            },
            "target": {"type": "parquet", "path": str(tmp_path / "out")},
            "primaryKey": ["o_orderkey"],
            "savepoints": {"path": str(tmp_path / "sp"), "intervalSeconds": 3600},
        }
    )
    migrate_token_ranges(spark, cfg, ranges_per_chunk=4)
    assert len(SavepointsManager.resume(str(tmp_path / "sp")).skip_token_ranges) == 4

    import pytest as _pt

    with _pt.raises(ConfigError, match="splitCount"):
        MigratorConfig.from_dict(
            {
                "source": {"type": "parquet", "path": "/x", "splitCount": 0},
                "target": {"type": "parquet", "path": "/y"},
            }
        )
