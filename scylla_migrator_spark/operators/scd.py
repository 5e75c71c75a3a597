"""Slowly-changing-dimension (SCD type 2) history builder.

The reference replicates a CDC change stream into a last-writer-wins target
(DynamoStreamReplication.scala:42-114 — op-type put/delete per item). The
analytics extension here keeps the *history* instead: collapse a change log
into versioned rows with [valid_from, valid_to) intervals — the standard
warehouse modeling of CDC output.

Scale shape: both window passes (change detection, interval close) share one
partitioning and ordering over the key, so the whole operator is a single
shuffle; no self-join, no global sort. State per key is bounded by the
number of *changes*, not events — consecutive rows with unchanged tracked
attributes are collapsed before the lead() pass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tie_col: str,
    tie_out: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 rows.

    One output row per run of consecutive (by ``ts_col``, tie-broken by
    ``tie_col``) records whose ``attr_cols`` are unchanged (null-safe
    comparison); ``valid_from`` is the run's first timestamp, ``valid_to``
    the next run's first timestamp (null for the current version).

    ``tie_out`` additionally carries the run-opening row's tie value in the
    output under that name — the incremental maintainer needs it so a
    served history row can be turned back into its change-log row
    ((valid_from, tie, attrs) is a sufficient statistic for re-collapse).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tie_col)
    is_first = F.lag(ts_col).over(w).isNull()
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in attr_cols],
    )
    changes = df.withColumn("__chg", is_first | changed).filter(F.col("__chg")).drop("__chg")
    # same partitioning+ordering as w: Catalyst reuses the exchange/sort
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, tie_col)
    extra = [F.col(tie_col).alias(tie_out)] if tie_out else []
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        *extra,
    ).withColumn("is_current", F.col("valid_to").isNull())
