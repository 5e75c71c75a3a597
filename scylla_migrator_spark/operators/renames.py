"""Column renames (reference P1/P2: writers/Scylla.scala:323-331,
writers/DynamoDB.scala:121-129).

Renames are schema-only (``toDF`` with new names) — zero-cost in the physical
plan; Catalyst aliases inside the projection, no data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.config import Rename, build_rename_map


def apply_renames(df: DataFrame, renames: list[Rename]) -> DataFrame:
    """Case-insensitive, collision-checked rename application."""
    if not renames:
        return df
    mapping = build_rename_map(renames, df.columns)
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def rename_map_keys(df: DataFrame, map_col: str, renames: list[Rename]) -> DataFrame:
    """Rename keys inside a map column (DynamoDB item rename, P2).

    Pure ``transform_keys`` — stays JVM-side."""
    if not renames:
        return df
    expr = F.col(map_col)
    for r in renames:
        def rekey(k, _v, _old=r.from_name, _new=r.to_name):
            return F.when(k == _old, _new).otherwise(k)

        # pyspark inspects the lambda arity, so bind via functools-style proxy
        expr = F.transform_keys(expr, (lambda fn: lambda k, v: fn(k, v))(rekey))
    return df.withColumn(map_col, expr)
