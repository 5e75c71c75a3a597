"""Real JDBC integration (S3/S4/S5) against embedded Derby — the only JDBC
engine shipped with Spark's jars. Covers the single-partition read, the
range-partitioned parallel read, and the WHERE-subquery pushdown."""

from __future__ import annotations

import pytest

from scylla_migrator_spark.config import ConfigError, SourceSettings
from scylla_migrator_spark.sources.jdbc import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory, sf_dir):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(2000)
        # Spark's JDBC writer quotes column names, making them case-sensitive
        # in Derby; uppercase quoted == unquoted-identifier resolution, so
        # plain `WHERE O_TOTALPRICE > x` works server-side
        .toDF("O_ORDERKEY", "O_CUSTKEY", "O_ORDERSTATUS", "O_TOTALPRICE")
    )
    (
        orders.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "ORDERS")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url, orders.count()


def test_jdbc_single_partition_read(spark, derby):
    url, n = derby
    src = SourceSettings(type="jdbc", table="ORDERS")
    out = read_jdbc(spark, src, url=url)
    assert out.count() == n
    assert out.rdd.getNumPartitions() == 1  # S3: whole table, one partition


def test_jdbc_partitioned_read(spark, derby):
    url, n = derby
    src = SourceSettings(
        type="jdbc",
        table="ORDERS",
        partition_column="O_ORDERKEY",
        lower_bound=0,
        upper_bound=100_000,
        num_partitions=4,
    )
    out = read_jdbc(spark, src, url=url)
    assert out.rdd.getNumPartitions() == 4  # S4: range-partitioned parallel read
    assert out.count() == n


def test_jdbc_where_subquery_pushdown(spark, derby):
    url, n = derby
    src = SourceSettings(type="jdbc", table="ORDERS", where="O_TOTALPRICE > 50000")
    out = read_jdbc(spark, src, url=url)
    assert 0 < out.count() < n
    assert out.filter("O_TOTALPRICE <= 50000").count() == 0


def test_jdbc_where_sanitizer_rejects_injection(spark, derby):
    url, _ = derby
    with pytest.raises(ConfigError):
        SourceSettings(type="jdbc", table="ORDERS", where="1=1; DROP TABLE ORDERS")


def test_jdbc_to_scylla_migration_and_validation(spark, derby, tmp_path):
    """The MySQL->Scylla analog end to end (MySQLToScyllaValidator shape):
    config-driven jdbc read -> rename -> null-PK guard -> fixture write,
    then the join-diff validator confirms a clean copy."""
    from scylla_migrator_spark.config import MigratorConfig
    from scylla_migrator_spark.plans.migrate import migrate
    from scylla_migrator_spark.plans.validate import validate

    url, n = derby
    cfg = MigratorConfig.from_dict(
        {
            "source": {"type": "jdbc", "table": "ORDERS", "url": url},
            "target": {"type": "scylla-fixture", "path": str(tmp_path / "tgt")},
            "renames": [{"from": "O_ORDERKEY", "to": "order_id"}],
            "primaryKey": ["order_id"],
        }
    )
    out = migrate(spark, cfg)
    assert out.count() == n
    src = spark.read.format("jdbc").options(
        url=url, dbtable="ORDERS", driver=DRIVER
    ).load().withColumnRenamed("O_ORDERKEY", "order_id")
    report = validate(src, out, ["order_id"])
    assert report.counts_by_kind == {}
    assert report.exit_code == 0
    # secrets never leak into rendered config
    assert cfg.rendered()["source"]["url"] == "<redacted>"
