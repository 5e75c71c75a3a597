"""Row explosion by per-column (TTL, WRITETIME) groups — the reference's
signature transform, re-expressed as pure Spark column expressions.

Reference parity — readers/Cassandra.scala:113-169 (`explodeRow`) and
:256-333 (`explodeRowsFromPerColumnMeta`):

* input: one wide row with per-column companions ``(c, c_ttl, c_writetime)``
* group regular columns by their ``(ttl, writetime)`` pair
* emit ONE output row per distinct pair: PK columns repeated, the pair's
  columns carrying their values, all other columns UNSET, plus trailing
  ``ttl`` / ``writetime`` columns
* tombstone-avoidance rule: when a row produces more than one group, the
  ``(null, null)`` group is dropped — its columns are implicit nulls on the
  write side and writing them would create tombstones (Cassandra.scala:145-150)
* tri-state cells: the reference carries ``CassandraOption.Value|Null|Unset``
  through an RDD because DataFrames can't encode tri-state. We encode it
  relationally instead: every regular column ``c`` gets a boolean companion
  ``c__set`` — (set=true, value) = Value, (set=true, null) = explicit Null,
  (set=false, *) = Unset. Writers must skip unset cells
  (scylla/ScyllaMigrator.scala:21-33, writers/Scylla.scala:160-276).

Scale notes: the whole transform is a single projection + one generator
(``explode``) — distinct-pair computation happens *inside the row* with
``array_distinct`` over an array of structs, so there is NO shuffle, no
groupBy, and no Python. Compare the reference's row-at-a-time ``flatMap``
closure; Catalyst keeps this inside WholeStageCodegen (generator breaks the
span but stays JVM-side and pipelined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.schema import TTL_SUFFIX, WRITETIME_SUFFIX, timestamp_companion_columns

SET_SUFFIX = "__set"
TTL_COL = "ttl"
WRITETIME_COL = "writetime"


def explode_by_timestamp_groups(df: DataFrame, primary_key: list[str]) -> DataFrame:
    """Explode a companioned frame into per-(ttl, writetime)-group rows.

    Output schema: ``pk..., (c, c__set) per regular column, ttl, writetime``.
    """
    companions = timestamp_companion_columns(df.columns, primary_key)
    if not companions:
        raise ValueError("no (c, c_ttl, c_writetime) companion triples found")

    pair_structs = [
        F.struct(F.col(ttl).cast("int").alias("t"), F.col(wt).cast("long").alias("w"))
        for (ttl, wt) in companions.values()
    ]
    pairs = F.array_distinct(F.array(*pair_structs))
    # drop the (null,null) group when >1 group (Cassandra.scala:145-150).
    # array_except (set semantics: struct nulls compare equal, so it removes
    # exactly the (null,null) element) instead of a filter() lambda — Spark
    # higher-order functions don't participate in whole-stage codegen, and
    # an interpreted lambda here put the whole explode stage on the
    # interpreted path (~1.6x slower end to end).
    null_pair = F.array(
        F.struct(F.lit(None).cast("int").alias("t"), F.lit(None).cast("long").alias("w"))
    )
    pairs = F.when(F.size(pairs) > 1, F.array_except(pairs, null_pair)).otherwise(pairs)

    # Stage the pairs array in a Project BELOW the Generate: GenerateExec
    # evaluates its generator argument interpreted, and the when/otherwise
    # above references the array_distinct subtree multiple times. In the
    # staged Project, codegen computes it once; the Generate then explodes
    # a bare column reference (and itself joins the codegen span).
    exploded = (
        df.withColumn("__pairs", pairs)
        .withColumn("__pair", F.explode(F.col("__pairs")))
        .drop("__pairs")
    )
    out_cols = [F.col(k) for k in primary_key]
    for c, (ttl, wt) in companions.items():
        in_group = F.col(ttl).cast("int").eqNullSafe(F.col("__pair.t")) & F.col(wt).cast(
            "long"
        ).eqNullSafe(F.col("__pair.w"))
        out_cols.append(F.when(in_group, F.col(c)).alias(c))
        out_cols.append(in_group.alias(c + SET_SUFFIX))
    out_cols.append(F.col("__pair.t").alias(TTL_COL))
    out_cols.append(F.col("__pair.w").alias(WRITETIME_COL))
    return exploded.select(*out_cols)


def apply_exploded(df: DataFrame, primary_key: list[str]) -> DataFrame:
    """Re-assemble exploded rows into final cell state — the semantics a CQL
    server applies on write: per cell, last-writer-wins by writetime; unset
    cells don't touch existing state (writers/Scylla.scala:160-276 write these
    groups as separate statements; this is the read-back equivalence used by
    the round-trip tests).

    One hash aggregation on the PK (map-side partial agg applies)."""
    value_cols = [
        c
        for c in df.columns
        if c not in primary_key
        and c not in (TTL_COL, WRITETIME_COL)
        and not c.endswith(SET_SUFFIX)
        and not c.endswith((TTL_SUFFIX, WRITETIME_SUFFIX))
    ]
    aggs = []
    for c in value_cols:
        ord_expr = F.when(F.col(c + SET_SUFFIX), F.coalesce(F.col(WRITETIME_COL), F.lit(-(2**62))))
        aggs.append(F.max_by(F.struct(F.col(c).alias("v")), ord_expr).getField("v").alias(c))
        aggs.append(
            F.max_by(F.struct(F.col(TTL_COL).alias("t")), ord_expr).getField("t").alias(c + TTL_SUFFIX)
        )
        aggs.append(
            F.max_by(F.struct(F.col(WRITETIME_COL).alias("w")), ord_expr)
            .getField("w")
            .alias(c + WRITETIME_SUFFIX)
        )
    return df.groupBy(*[F.col(k) for k in primary_key]).agg(*aggs)
