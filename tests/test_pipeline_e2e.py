"""End-to-end pipeline tests: the reference's flagship scenarios re-expressed
(CqlToParquetToScyllaTimestampRoundTripTest, CopyMissingRowsTest shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.config import MigratorConfig
from scylla_migrator_spark.operators.explode_timestamps import apply_exploded
from scylla_migrator_spark.plans.migrate import migrate
from scylla_migrator_spark.plans.validate import run_validation


def _ts_fixture(spark):
    # F2 shape: per-column (value, ttl, writetime) companions
    return spark.createDataFrame(
        [
            ("p1", 1, "av", 100, 1_000, 1.5, 100, 1_000),
            ("p2", 1, "av2", 100, 1_000, 2.5, 200, 2_000),
            ("p3", 1, "av3", 100, 1_000, 3.5, None, None),
        ],
        "pk string, ck int, a string, a_ttl int, a_writetime long, b double, b_ttl int, b_writetime long",
    )


def test_cql_to_parquet_to_scylla_timestamp_roundtrip(spark, tmp_path):
    """cassandra -> parquet (__meta_ prefixed) -> scylla (exploded write):
    re-assembled cell state must equal the original (round-trip test shape)."""
    src_path = str(tmp_path / "cql_src")
    _ts_fixture(spark).write.parquet(src_path)

    # leg 1: cql-fixture -> parquet; companions persisted as __meta_*
    mid_path = str(tmp_path / "mid")
    cfg1 = MigratorConfig.from_dict(
        {
            "source": {"type": "cql-fixture", "path": src_path, "preserve_timestamps": True},
            "target": {"type": "parquet", "path": mid_path},
            "primaryKey": ["pk", "ck"],
        }
    )
    migrate(spark, cfg1)
    mid = spark.read.parquet(mid_path)
    assert "__meta_a_ttl" in mid.columns and "a" in mid.columns

    # leg 2: parquet -> scylla-fixture with per-row (ttl, writetime) groups
    tgt_path = str(tmp_path / "tgt")
    cfg2 = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": mid_path},
            "target": {"type": "scylla-fixture", "path": tgt_path, "exploded_timestamp_write": True},
            "primaryKey": ["pk", "ck"],
        }
    )
    out = migrate(spark, cfg2)
    assert {"ttl", "writetime"} <= set(out.columns)

    # server-side apply: reassembled state == original fixture
    applied = apply_exploded(out, ["pk", "ck"])
    orig = {r["pk"]: r for r in _ts_fixture(spark).collect()}
    got = {r["pk"]: r for r in applied.collect()}
    for pk in ("p1", "p2"):
        assert got[pk]["a"] == orig[pk]["a"] and got[pk]["b"] == orig[pk]["b"]
        assert got[pk]["a_ttl"] == orig[pk]["a_ttl"]
    # p3's b sat in the dropped (null,null) group -> implicit null preserved
    assert got["p3"]["b"] is None


def test_preserve_timestamps_false_drops_companions(spark, tmp_path):
    src_path = str(tmp_path / "cql_src2")
    _ts_fixture(spark).write.parquet(src_path)
    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "cql-fixture", "path": src_path, "preserve_timestamps": False},
            "target": {"type": "parquet", "path": str(tmp_path / "out2")},
            "primaryKey": ["pk", "ck"],
        }
    )
    out = migrate(spark, cfg)
    assert set(out.columns) == {"pk", "ck", "a", "b"}


def test_config_driven_validation_with_repair(spark, sf_dir, tmp_path):
    """CopyMissingRowsTest shape: validate finds missing rows, repairs them,
    second validation is clean."""
    src_path = f"{sf_dir}/orders.parquet"
    tgt_path = str(tmp_path / "tgt_orders")
    spark.read.parquet(src_path).filter(F.col("o_orderkey") % 11 != 0).write.parquet(tgt_path)

    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src_path},
            "target": {"type": "parquet", "path": tgt_path},
            "primaryKey": ["o_orderkey"],
            "validation": {"copy_missing_rows": True},
        }
    )
    report = run_validation(spark, cfg)
    assert report.counts_by_kind["MissingTargetRow"] > 0
    assert report.repaired_rows == report.counts_by_kind["MissingTargetRow"]
    assert report.exit_code == 1

    report2 = run_validation(spark, cfg)
    assert report2.total_failures == 0 and report2.repaired_rows == 0
    assert report2.exit_code == 0


def test_validation_matches_migrate_null_pk_drop(spark, tmp_path):
    """run_validation must compare against the SAME transform pipeline
    migrate uses: rows migrate deliberately drops (null PK components) are
    not missing-target failures — a clean migration validates clean."""
    src_path = str(tmp_path / "src_nulls")
    spark.createDataFrame(
        [(1, "a"), (None, "dropped"), (3, "c"), (None, "dropped2")],
        "pk bigint, payload string",
    ).write.parquet(src_path)

    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src_path},
            "target": {"type": "parquet", "path": str(tmp_path / "tgt_nulls")},
            "primaryKey": ["pk"],
        }
    )
    out = migrate(spark, cfg)
    assert out.count() == 2  # null-PK rows dropped on write
    report = run_validation(spark, cfg)
    assert report.total_failures == 0 and report.exit_code == 0


def test_validation_handles_item_frame_renames(spark, tmp_path):
    """DynamoDB item frames rename MAP KEYS, not columns: run_validation on a
    migrated s3-export must go through the shared pipeline and validate
    clean instead of crashing in column-level apply_renames."""
    from pyspark.sql import functions as F

    from scylla_migrator_spark.sinks.s3export import write_s3_export

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(50)
    item_json = F.to_json(
        F.struct(
            F.struct(F.col("o_orderkey").cast("string").alias("N")).alias("k"),
            F.struct(F.col("o_orderstatus").alias("S")).alias("status"),
        )
    )
    src_root = str(tmp_path / "val_export_src")
    write_s3_export(orders.select(item_json.alias("item_json")), "item_json", src_root)

    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "dynamodb-s3-export", "path": src_root},
            "target": {"type": "parquet", "path": str(tmp_path / "val_export_tgt")},
            "renames": [{"from": "status", "to": "order_status"}],
            "primaryKey": ["item_json"],
        }
    )
    migrate(spark, cfg)
    report = run_validation(spark, cfg)
    assert report.total_failures == 0 and report.exit_code == 0


def test_s3export_to_s3export_migration_with_rename(spark, tmp_path):
    """Full export->export migration through the config-driven dispatch:
    read a DynamoDB S3 export, rename an item attribute, write a new export
    (Migrator dispatch analog for the s3export->alternator-style combos)."""
    from pyspark.sql import functions as F

    from scylla_migrator_spark.config import MigratorConfig, Rename
    from scylla_migrator_spark.plans.migrate import migrate
    from scylla_migrator_spark.sinks.s3export import write_s3_export
    from scylla_migrator_spark.sources.s3export import read_manifest_summary

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(200)
    item_json = F.to_json(
        F.struct(
            F.struct(F.col("o_orderkey").cast("string").alias("N")).alias("k"),
            F.struct(F.col("o_orderstatus").alias("S")).alias("status"),
        )
    )
    src_root = str(tmp_path / "export_src")
    write_s3_export(orders.select(item_json.alias("item_json")), "item_json", src_root)

    tgt_root = str(tmp_path / "export_tgt")
    cfg = MigratorConfig(
        source=__import__(
            "scylla_migrator_spark.config", fromlist=["SourceSettings"]
        ).SourceSettings(type="dynamodb-s3-export", path=src_root),
        target=__import__(
            "scylla_migrator_spark.config", fromlist=["TargetSettings"]
        ).TargetSettings(type="dynamodb-s3-export", path=tgt_root),
        renames=[Rename("status", "order_status")],
    )
    out = migrate(spark, cfg)
    assert out.count() == 200
    assert read_manifest_summary(tgt_root)["itemCount"] == 200
    keys = out.select(F.map_keys(F.col("item")).alias("ks")).head()["ks"]
    assert sorted(keys) == ["k", "order_status"]


def test_stream_source_migration(spark, tmp_path):
    """stream -> parquet migration: file-source replication drained with
    availableNow; renames apply to the streaming plan; checkpoint doubles as
    the savepoint."""
    from scylla_migrator_spark.config import (
        MigratorConfig,
        Rename,
        Savepoints,
        SourceSettings,
        TargetSettings,
    )
    from scylla_migrator_spark.plans.migrate import migrate

    cfg = MigratorConfig(
        source=SourceSettings(type="stream", path="/root/testdata/sf0.001/orders.parquet"),
        target=TargetSettings(type="parquet", path=str(tmp_path / "stream_out")),
        renames=[Rename("o_orderkey", "order_id")],
        savepoints=Savepoints(path=str(tmp_path / "ckpt")),
    )
    out = migrate(spark, cfg)
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert out.count() == src.count()
    assert "order_id" in out.columns and "o_orderkey" not in out.columns


def test_jdbc_url_hardening():
    """Dangerous JDBC driver properties are rejected at config decode,
    including URL-encoded and case-varied spellings (SourceSettings
    posture)."""
    import pytest as _pytest

    from scylla_migrator_spark.config import ConfigError, validate_jdbc_url

    assert validate_jdbc_url("jdbc:derby:memory:db;create=true")
    for bad in (
        "jdbc:mysql://h/db?allowLoadLocalInfile=true",
        "jdbc:mysql://h/db?ALLOWMULTIQUERIES=1",
        "jdbc:mysql://h/db?%61utoDeserialize=true",  # %-encoded
        "jdbc:mysql://h/db?socketFactory=evil.Cls",
        "mysql://h/db",  # missing jdbc: scheme
    ):
        with _pytest.raises(ConfigError):
            validate_jdbc_url(bad)


def test_host_port_validation():
    import pytest as _pytest

    from scylla_migrator_spark.config import ConfigError, validate_host_port

    assert validate_host_port("scylla-1.example.com:9042") == ("scylla-1.example.com", 9042)
    assert validate_host_port("10.0.0.7", default_port=9042) == ("10.0.0.7", 9042)
    for bad in ("host:", "host:0", "host:99999", "-bad-:9042", "h ost:9042"):
        with _pytest.raises(ConfigError):
            validate_host_port(bad, default_port=9042)


def test_source_host_validated_at_decode():
    import pytest as _pytest

    from scylla_migrator_spark.config import ConfigError, SourceSettings

    ok = SourceSettings(type="cql-fixture", path="/tmp/x", host="scylla-1:9042")
    assert ok.host == "scylla-1:9042"
    with _pytest.raises(ConfigError):
        SourceSettings(type="cql-fixture", path="/tmp/x", host="bad host:9042")
    with _pytest.raises(ConfigError):
        SourceSettings(type="cql-fixture", path="/tmp/x", host="h:99999")


def test_jdbc_blocklist_matches_keys_not_substrings():
    """A db/user name containing a blocked word is fine; only property KEYS
    are blocked (including %-encoded and ;-delimited spellings)."""
    import pytest as _pytest

    from scylla_migrator_spark.config import ConfigError, validate_jdbc_url

    assert validate_jdbc_url("jdbc:mysql://h/socketfactory_audit")
    assert validate_jdbc_url("jdbc:mysql://h/db?user=autodeserialize_fan")
    for bad in (
        "jdbc:mysql://h/db?allowLoadLocalInfile=true",
        "jdbc:sqlserver://h;autoDeserialize=true",
        "jdbc:mysql://h/db?a=1&%73ocketFactory=evil",
    ):
        with _pytest.raises(ConfigError):
            validate_jdbc_url(bad)


def test_host_port_ipv6():
    import pytest as _pytest

    from scylla_migrator_spark.config import ConfigError, validate_host_port

    assert validate_host_port("[::1]:9042") == ("::1", 9042)
    assert validate_host_port("2001:db8::1", default_port=9042) == ("2001:db8::1", 9042)
    with _pytest.raises(ConfigError):
        validate_host_port("[::1", default_port=1)
    with _pytest.raises(ConfigError):
        validate_host_port("h:²", default_port=1)  # non-ASCII digit: ConfigError, not ValueError
    with _pytest.raises(ConfigError):
        validate_host_port("[zz]:1")
