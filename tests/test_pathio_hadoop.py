"""HadoopPathIO: the JVM Hadoop FileSystem route (PathIO.scala:195-198 made
real), exercised against Hadoop's built-in LocalFileSystem via ``file:``
paths — the same code path a cluster uses for s3a:/gs:/hdfs:, minus the
remote connector this sandbox cannot reach."""

from __future__ import annotations

import json

import pytest

from scylla_migrator_spark import pathio
from scylla_migrator_spark.savepoints import SavepointsManager


@pytest.fixture
def hadoop_file_scheme(spark):
    """Route the ``file`` scheme through HadoopPathIO for the duration of a
    test (the register_pathio knob, mirroring Hadoop's fs.<scheme>.impl)."""
    io = pathio.HadoopPathIO(spark)
    pathio.register_pathio("file", io)
    try:
        yield io
    finally:
        pathio.register_pathio("file", None)


def test_hadoop_io_roundtrip_on_local_fs(spark, tmp_path):
    io = pathio.HadoopPathIO(spark)
    p = f"file:{tmp_path}/d"
    assert not io.exists(p)
    io.create_directories(p)
    assert io.exists(p)
    io.write_utf8_atomically(io.join(p, "x.yaml"), b"k: 1\n")
    assert io.read_utf8(f"{p}/x.yaml") == "k: 1\n"
    assert io.list_file_names(p) == ["x.yaml"]
    assert io.normalize(p).startswith("file:")
    # overwrite an existing target: Hadoop local-FS rename refuses an
    # existing destination, so this exercises the replace fallback
    io.write_utf8_atomically(io.join(p, "x.yaml"), b"k: 2\n")
    assert io.read_utf8(f"{p}/x.yaml") == "k: 2\n"
    assert io.list_file_names(p) == ["x.yaml"]  # no .tmp left behind


def test_for_path_routes_via_override(spark, hadoop_file_scheme):
    assert pathio.for_path("file:///tmp/x") is hadoop_file_scheme
    assert pathio.for_path("/tmp/x") is hadoop_file_scheme
    pathio.register_pathio("file", None)
    assert pathio.for_path("/tmp/x") is pathio._local


def test_savepoint_lifecycle_on_hadoop_filescheme(spark, tmp_path, hadoop_file_scheme):
    """The Z1-Z5 savepoint lifecycle with every filesystem touch going
    through the JVM Hadoop FileSystem (mirrors the memory-scheme suite)."""
    d = f"file:{tmp_path}/sp"
    mgr = SavepointsManager(d, config={"source": {"type": "parquet"}})
    assert isinstance(mgr._io, pathio.HadoopPathIO)
    mgr.complete_files(["a.parquet"])
    p1 = mgr.dump()
    mgr.complete_files(["b.parquet"])
    mgr.complete_segments([0, 2])
    p2 = mgr.dump()
    assert p1.rsplit("/", 1)[1] < p2.rsplit("/", 1)[1]

    resumed = SavepointsManager.resume(d)
    assert resumed.skip_files == {"a.parquet", "b.parquet"}
    assert resumed.skip_segments == {0, 2}
    assert resumed.config == {"source": {"type": "parquet"}}
    assert SavepointsManager.resume(f"file:{tmp_path}/empty").skip_files == set()


def test_migrate_resumable_kill_resume_on_hadoop_filescheme(
    spark, sf_dir, tmp_path, hadoop_file_scheme
):
    """Chunked migration kill/resume with savepoints on a file:-scheme
    Hadoop path: die after one chunk, resume, exact row parity."""
    from scylla_migrator_spark.config import MigratorConfig
    from scylla_migrator_spark.plans.migrate import migrate_resumable

    src_dir = str(tmp_path / "orders6")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(6).write.parquet(src_dir)
    n_src = orders.count()

    sp = f"file:{tmp_path}/sp"
    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src_dir},
            "target": {"type": "parquet", "path": str(tmp_path / "out")},
            "primaryKey": ["o_orderkey"],
            "savepoints": {"path": sp, "intervalSeconds": 3600},
        }
    )
    partial = migrate_resumable(spark, cfg, files_per_chunk=2, stop_after_chunks=1)
    assert len(SavepointsManager.resume(sp).skip_files) == 2
    assert 0 < partial.count() < n_src

    out = migrate_resumable(spark, cfg, files_per_chunk=2)
    assert out.count() == n_src
    assert len(SavepointsManager.resume(sp).skip_files) == 6


def test_curation_sidecar_on_filescheme_target(spark, tmp_path):
    """The provenance sidecar now goes through PathIO: a file:-scheme
    target (the case the old plain-open guard crashed on) gets the report
    next to the data."""
    from scylla_migrator_spark.plans.curate import CurationConfig, run_curation

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a b c d e f g h i j", "en"), (2, "x", "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    target = f"file://{tmp_path}/out"
    cfg = CurationConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src},
            "stages": [{"op": "length_filter", "minTokens": 5}],
            "target": {"type": "parquet", "path": target},
        }
    )
    counts = run_curation(spark, cfg)
    assert counts["stage01_length_filter"] == 1
    report = json.loads((tmp_path / "out" / "_curation_report.json").read_text())
    assert report["stage_counts"] == counts
    assert not (tmp_path / "out" / "_curation_report.json.tmp").exists()
