"""Incrementally-maintained dedup graph over a DOCUMENT stream — the
streaming companion of analytics/components.incremental_components_update
(T6 extension; same maintenance shape as streaming/scd_cdc.py, applied to
the near-dup component labelling instead of version history).

Pattern:

    readStream(documents) -> foreachBatch:
        fp      = simhash fingerprints of the batch's docs
        edges   = near-dup pairs touching a batch doc (batch x state)
        labels' = incremental_components_update(state labels, edges)
        state'  = state rows remapped + batch rows appended (atomic swap)

Correctness invariant (checked by the oracle): after any prefix of the
stream, the paired rows of the serving table equal the batch
connected-components labelling over all documents seen so far — because a
new batch can only create pairs that TOUCH a batch document (old-old pairs
were already present), which is exactly the contract
incremental_components_update requires.

Scale notes: per batch the fixpoint runs on the CONTRACTED graph (batch
edges + the component labels they touch), never the history; the serving
rewrite here is whole-table for simplicity — at 100 TB partition the state
by a component-hash bucket and rewrite only the buckets whose labels moved
(the streaming/rollup.py upsert shape; label remaps touch only merged
components).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics import dedup as D
from scylla_migrator_spark.analytics.components import (
    connected_components,
    incremental_components_update,
)


def components_upsert_batch(
    batch_df: DataFrame,
    serving_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    bits: int = 32,
    max_hamming: int = 8,
) -> None:
    """foreachBatch body: fold one micro-batch of documents into the served
    (id, source, sh, comp, paired) component table. A batch that already
    carries an ``sh`` fingerprint column (the upstream-encode shape — at
    scale the fingerprint stage runs where the text is ingested, and only
    8-byte hashes reach the graph maintainer) is used as-is; otherwise the
    batch is fingerprinted here."""
    spark = batch_df.sparkSession
    if "sh" in batch_df.columns:
        fp_b = batch_df.select(
            F.col(id_col).alias("id"), F.col(source_col).alias("source"), "sh"
        ).localCheckpoint(eager=True)
    else:
        fp_b = (
            D.simhash_fingerprints(
                batch_df.select(id_col, source_col, text_col),
                text_col,
                id_col,
                carry_cols=[source_col],
                bits=bits,
            )
            .select(
                F.col(id_col).alias("id"), F.col(source_col).alias("source"), "sh"
            )
            .localCheckpoint(eager=True)
        )
    state = None
    if os.path.isdir(serving_path):
        # materialize BEFORE the swap below: the state must not be a lazy
        # read of the very files this batch replaces
        state = spark.read.parquet(serving_path).localCheckpoint(eager=True)
    all_fp = (
        state.select("id", "source", "sh").unionByName(fp_b)
        if state is not None
        else fp_b
    )
    # BLOCKED batch×state edge generation (r8 verdict task #1): Manku
    # block-union candidates over DISTINCT fingerprints, star-contracted
    # onto per-group anchors — per-batch comparisons bounded by union-key
    # bucket population and edge count linear in batch size, never a
    # batch × full-served-state join keyed on source alone. The closure
    # (plus the induction this generator maintains) equals the all-pairs
    # touching set, so the full-corpus oracle invariant is unchanged.
    new_edges = D.simhash_blocked_edges_touching(
        fp_b,
        all_fp,
        id_col="id",
        sh_col="sh",
        group_col="source",
        bits=bits,
        blocks=max(10, max_hamming + 2),
        max_hamming=max_hamming,
    ).localCheckpoint(eager=True)
    if state is None:
        labels = connected_components(new_edges, "id_a", "id_b")
    else:
        labels = incremental_components_update(
            state.select("id", "comp"), new_edges, "id_a", "id_b"
        )
    labels = labels.select(F.col("id").alias("__lid"), F.col("comp").alias("__lc"))
    everts = (
        new_edges.select(F.col("id_a").alias("__vid"))
        .union(new_edges.select("id_b"))
        .distinct()
        .withColumn("__touched", F.lit(True))
    )
    rows = (
        state.select("id", "source", "sh", "paired")
        if state is not None
        else fp_b.select("id", "source", "sh", F.lit(False).alias("paired"))
    )
    if state is not None:
        rows = rows.unionByName(
            fp_b.select("id", "source", "sh", F.lit(False).alias("paired"))
        )
    new_state = (
        rows.join(labels, rows["id"] == labels["__lid"], "left_outer")
        .join(everts, rows["id"] == everts["__vid"], "left_outer")
        .select(
            "id",
            "source",
            "sh",
            F.coalesce("__lc", "id").alias("comp"),
            (F.col("paired") | F.coalesce("__touched", F.lit(False))).alias(
                "paired"
            ),
        )
    )
    nxt = serving_path + ".next"
    if os.path.exists(nxt):
        shutil.rmtree(nxt)
    new_state.write.parquet(nxt)
    if os.path.exists(serving_path):
        shutil.rmtree(serving_path)
    os.rename(nxt, serving_path)


def incremental_components_stream(
    stream: DataFrame,
    serving_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Drive a document stream into the incrementally-maintained component
    table; returns the started query. Read the labelling with
    ``spark.read.parquet(serving_path)`` (filter ``paired`` for the
    pair-graph vertex convention)."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda bdf, _bid: components_upsert_batch(
                bdf, serving_path, text_col, id_col, source_col
            )
        )
        .trigger(availableNow=True)
        .start()
    )
