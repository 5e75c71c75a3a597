"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation join-diff at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented SURVEY §2 operator
with its DuckDB oracle (see scylla_migrator_spark/plans/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scylla_migrator_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validator's join-diff failure report on sf0.001."""
    return Q.QUERIES["validation_diff_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
