"""PathIO scheme dispatch + remote-scheme savepoints (reference
PathIO.scala:1-212 — local NIO vs Hadoop FileSystem behind one trait,
atomic staged writes, connector guidance for unconfigured schemes)."""

from __future__ import annotations

import uuid

import pytest

from scylla_migrator_spark import pathio
from scylla_migrator_spark.savepoints import SavepointsManager


@pytest.fixture()
def bucket():
    b = f"b{uuid.uuid4().hex[:10]}"
    yield b
    pathio.MemoryPathIO.reset(b)


def test_scheme_dispatch():
    assert pathio.for_path("/tmp/x") is pathio._local
    assert pathio.for_path("file:///tmp/x") is pathio._local
    assert pathio.for_path("memory://b/x") is pathio._memory
    with pytest.raises(ValueError, match="Hadoop AWS/S3A connector"):
        pathio.for_path("s3a://bucket/savepoints")
    with pytest.raises(ValueError, match="Hadoop GCS connector"):
        pathio.for_path("gs://bucket/savepoints")
    with pytest.raises(ValueError, match="connector for 'wasb'"):
        pathio.for_path("wasb://c@a/savepoints")


def test_local_file_scheme_paths(tmp_path):
    io = pathio.for_path(f"file://{tmp_path}")
    p = f"file://{tmp_path}/sub"
    io.create_directories(p)
    io.write_utf8_atomically(f"{p}/x.yaml", b"k: 1\n")
    assert io.exists(f"{p}/x.yaml")
    assert io.read_utf8(f"{p}/x.yaml") == "k: 1\n"
    assert io.list_file_names(p) == ["x.yaml"]


def test_savepoint_lifecycle_on_memory_scheme(bucket):
    """The full Z1-Z5 savepoint lifecycle against the fake object store:
    monotonic names, dump/resume round-trip, skip-set unions."""
    d = f"memory://{bucket}/sp"
    mgr = SavepointsManager(d, config={"source": {"type": "parquet"}})
    mgr.complete_files(["a.parquet"])
    p1 = mgr.dump()
    mgr.complete_files(["b.parquet"])
    mgr.complete_segments([0, 2])
    mgr.complete_token_ranges([(10, 20)])
    p2 = mgr.dump()
    assert p1.rsplit("/", 1)[1] < p2.rsplit("/", 1)[1]

    resumed = SavepointsManager.resume(d)
    assert resumed.skip_files == {"a.parquet", "b.parquet"}
    assert resumed.skip_segments == {0, 2}
    assert resumed.skip_token_ranges == {(10, 20)}
    assert resumed.config == {"source": {"type": "parquet"}}
    # resume from an empty remote dir is a fresh manager
    assert SavepointsManager.resume(f"memory://{bucket}/empty").skip_files == set()


def test_memory_write_failure_is_atomic(bucket):
    """A crash between the staged upload and the rename must leave the
    previous savepoint as the visible latest — never a truncated one."""
    d = f"memory://{bucket}/sp"
    mgr = SavepointsManager(d)
    mgr.complete_segments([1])
    mgr.dump()
    mgr.complete_segments([2])
    pathio.MemoryPathIO.fail_next_write = True
    with pytest.raises(IOError, match="injected"):
        mgr.dump()
    resumed = SavepointsManager.resume(d)
    assert resumed.skip_segments == {1}  # pre-crash savepoint intact
    names = pathio._memory.list_file_names(d)
    assert all(not n.endswith(".tmp") for n in names)


def test_periodic_dumper_on_memory_scheme(bucket):
    from scylla_migrator_spark.savepoints import PeriodicDumper

    d = f"memory://{bucket}/sp"
    mgr = SavepointsManager(d)
    mgr.complete_segments([7])
    with PeriodicDumper(mgr, interval_seconds=0.05) as dumper:
        import time

        time.sleep(0.2)
    assert dumper.dump_count >= 2  # periodic + terminal
    assert SavepointsManager.resume(d).skip_segments == {7}


def test_migrate_resumable_kill_resume_on_memory_scheme(spark, sf_dir, tmp_path, bucket):
    """The chunked migration's kill/resume protocol with its savepoints on
    the fake REMOTE store: die after one chunk, resume, exact row parity."""
    from scylla_migrator_spark.config import MigratorConfig
    from scylla_migrator_spark.plans.migrate import migrate_resumable

    src_dir = str(tmp_path / "orders6")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(6).write.parquet(src_dir)
    n_src = orders.count()

    sp = f"memory://{bucket}/sp"
    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src_dir},
            "target": {"type": "parquet", "path": str(tmp_path / "out")},
            "primaryKey": ["o_orderkey"],
            "savepoints": {"path": sp, "intervalSeconds": 3600},
        }
    )
    partial_df = migrate_resumable(spark, cfg, files_per_chunk=2, stop_after_chunks=1)
    assert len(SavepointsManager.resume(sp).skip_files) == 2
    assert 0 < partial_df.count() < n_src

    out = migrate_resumable(spark, cfg, files_per_chunk=2)
    assert out.count() == n_src
    assert out.select("o_orderkey").distinct().count() == n_src
    assert len(SavepointsManager.resume(sp).skip_files) == 6
