"""JDBC source (reference S3/S4/S5: readers/MySQL.scala:612-709, bounds
validation readers/jdbc/JdbcPartitionBounds.scala:57-165).

Single-partition and range-partitioned parallel reads; the user WHERE filter
is embedded as a ``(SELECT * FROM t WHERE f) AS filtered_table`` subquery so
the predicate runs server-side with exact dialect control (MySQL.scala:635-651)
— Catalyst's JDBC pushdown would also work, but the subquery form matches the
reference's sanitizer-gated behavior.

Integration-tested against embedded Derby (the JDBC engine in Spark's own
jars): single-partition, range-partitioned, and WHERE-subquery reads
(tests/test_jdbc_integration.py).
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from scylla_migrator_spark.config import ConfigError, SourceSettings, validate_where_filter


def classify_partition_bound(value: Any) -> str:
    """Bound type classification (JdbcPartitionBounds.scala:57-76):
    integral, date, or timestamp partition columns are supported."""
    if isinstance(value, bool):
        raise ConfigError("boolean is not a valid partition bound")
    if isinstance(value, int):
        return "integral"
    if isinstance(value, dt.datetime):
        return "timestamp"
    if isinstance(value, dt.date):
        return "date"
    raise ConfigError(f"unsupported partition bound type: {type(value).__name__}")


def validate_bounds(lower: Any, upper: Any) -> str:
    kind = classify_partition_bound(lower)
    if classify_partition_bound(upper) != kind:
        raise ConfigError("lowerBound and upperBound must have the same type")
    if not lower < upper:
        raise ConfigError("lowerBound must be < upperBound")
    return kind


def build_dbtable(table: str, where: str | None) -> str:
    """WHERE pushdown as a named subquery (MySQL.scala:635-651)."""
    if where is None:
        return table
    validate_where_filter(where)
    return f"(SELECT * FROM {table} WHERE {where}) AS filtered_table"


def build_read_options(src: SourceSettings, url: str) -> dict[str, str]:
    opts: dict[str, str] = {
        "url": url,
        "dbtable": build_dbtable(src.table, src.where),
        "fetchsize": "1000",
    }
    if src.num_partitions:
        validate_bounds(src.lower_bound, src.upper_bound)
        opts.update(
            partitionColumn=src.partition_column,
            lowerBound=str(src.lower_bound),
            upperBound=str(src.upper_bound),
            numPartitions=str(src.num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, src: SourceSettings, url: str | None = None) -> DataFrame:
    if url is None:
        raise ConfigError("jdbc source requires a url")
    reader = spark.read.format("jdbc")
    for k, v in build_read_options(src, url).items():
        reader = reader.option(k, v)
    return reader.load()
