"""Filters: user WHERE, null-PK drop, resume skip predicates.

Reference parity:
* F1/F2 source ``where`` — pushed to the scan by Catalyst when the source
  supports it (readers/Cassandra.scala:387-390, readers/MySQL.scala:635-651)
* F6 null-PK drop with counted drops — writers/Scylla.scala:81-107; the count
  travels back via ``df.observe`` instead of a custom accumulator (SURVEY A3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.schema import resolve_columns

NULL_PK_OBSERVATION = "null_pk_drops"

_observation_seq = 0


def _next_observation_name() -> str:
    # observation names must be unique within one plan tree
    global _observation_seq
    _observation_seq += 1
    return f"{NULL_PK_OBSERVATION}_{_observation_seq}"


def apply_where(df: DataFrame, where: str | None) -> DataFrame:
    """User predicate as a Catalyst expression — pushdown is automatic for
    parquet/JDBC sources (visible as PushedFilters in .explain)."""
    if not where:
        return df
    return df.filter(F.expr(where))


def null_pk_condition(df: DataFrame, primary_key: list[str]):
    pk = resolve_columns(df.columns, primary_key)
    cond = F.lit(False)
    for c in pk:
        cond = cond | F.col(c).isNull()
    return cond


def drop_null_pk_rows(df: DataFrame, primary_key: list[str], observe: bool = True) -> DataFrame:
    """Filter rows with any null PK component; the dropped count is recorded
    as an observation metric named ``null_pk_drops`` readable from the
    QueryExecutionListener / ``Observation`` API (reference counts via
    LongAccumulator, writers/Scylla.scala:253-255)."""
    if not primary_key:
        return df
    cond = null_pk_condition(df, primary_key)
    if observe:
        df = df.observe(_next_observation_name(), F.sum(cond.cast("long")).alias("dropped"))
    return df.filter(~cond)


def auto_null_pk_filtering(source_type: str) -> bool:
    """Null PKs are impossible for CQL/DynamoDB sources (server enforces);
    possible for Parquet/MySQL — mirrored auto-enable rule
    (writers/Scylla.scala:31-73)."""
    return source_type in {"parquet", "jdbc"}
