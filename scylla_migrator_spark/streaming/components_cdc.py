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
edges + the component labels they touch), never the history; edge
generation is the blocked star-contracted generator
(dedup.simhash_blocked_edges_touching — Manku union keys over distinct
fingerprints, batch-linear edges); and the serving table is partitioned
by a component-hash bucket (the streaming/rollup.py layout) with each
batch swapping ONLY the buckets whose labels moved — write volume is
proportional to touched components, pinned by
test_components_serving_rewrites_only_moved_buckets. At 100 TB raise
``n_buckets`` so each bucket directory stays a few GB.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics import dedup as D
from scylla_migrator_spark.analytics.components import (
    connected_components,
    contracted_merge,
)
from scylla_migrator_spark.streaming.rollup import (
    BUCKET_COL,
    _bucket_expr,
    _table_buckets,
    _write_meta,
)

DEFAULT_COMPONENT_BUCKETS = 16  # fixture scale; thousands at 100 TB


def components_upsert_batch(
    batch_df: DataFrame,
    serving_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    bits: int = 32,
    max_hamming: int = 8,
    n_buckets: int = DEFAULT_COMPONENT_BUCKETS,
) -> list[int] | None:
    """foreachBatch body: fold one micro-batch of documents into the served
    (id, source, sh, comp, paired) component table, partitioned by a
    COMPONENT-hash bucket (``__bucket = pmod(xxhash64(comp), n_buckets)``,
    the streaming/rollup.py layout). A batch that already carries an
    ``sh`` fingerprint column (the upstream-encode shape — at scale the
    fingerprint stage runs where the text is ingested, and only 8-byte
    hashes reach the graph maintainer) is used as-is; otherwise the batch
    is fingerprinted here.

    Returns the list of bucket ids this batch rewrote (None for the first
    generation, which writes every bucket) — the write-volume contract
    the plan pin asserts: only buckets holding a label that MOVED (either
    side of the contracted merge remap, plus the batch's own labels) are
    swapped; every other bucket directory is untouched bytes on disk. A
    remapped row hops from bucket(old comp) to bucket(new comp); both are
    in the affected set by construction, and an affected bucket emptied
    by the hop is deleted rather than left stale."""
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
        state = (
            spark.read.parquet(serving_path)
            .select("id", "source", "sh", "comp", "paired")
            .localCheckpoint(eager=True)
        )
        n_buckets = _table_buckets(serving_path, n_buckets)
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
    everts = (
        new_edges.select(F.col("id_a").alias("__vid"))
        .union(new_edges.select("id_b"))
        .distinct()
        .withColumn("__touched", F.lit(True))
    )
    if state is None:
        # first generation: full write, bucketed layout from the start
        labels = connected_components(new_edges, "id_a", "id_b").select(
            F.col("id").alias("__lid"), F.col("comp").alias("__lc")
        )
        new_state = (
            fp_b.join(labels, fp_b["id"] == labels["__lid"], "left_outer")
            .join(everts, fp_b["id"] == everts["__vid"], "left_outer")
            .select(
                "id",
                "source",
                "sh",
                F.coalesce("__lc", "id").alias("comp"),
                F.coalesce("__touched", F.lit(False)).alias("paired"),
            )
        )
        nxt = serving_path + ".next"
        if os.path.exists(nxt):
            shutil.rmtree(nxt)
        new_state.withColumn(BUCKET_COL, _bucket_expr(["comp"], n_buckets)).repartition(
            F.col(BUCKET_COL)
        ).write.partitionBy(BUCKET_COL).parquet(nxt)
        if os.path.exists(serving_path):
            shutil.rmtree(serving_path)
        os.rename(nxt, serving_path)
        _write_meta(serving_path, n_buckets)
        return None
    # incremental generation: contract the batch onto the existing labels
    # and rewrite ONLY the buckets whose labels move. ``merged`` is the
    # contracted-fixpoint remap (batch-sized); a label absent from it is
    # untouched, so its bucket is untouched.
    merged = contracted_merge(
        state.select("id", "comp"), new_edges, "id_a", "id_b"
    ).localCheckpoint(eager=True)
    batch_rows = (
        fp_b.join(merged, fp_b["id"] == merged["__mid"], "left_outer")
        .join(everts, fp_b["id"] == everts["__vid"], "left_outer")
        .select(
            "id",
            "source",
            "sh",
            # a batch vertex enters the contracted graph under its own id
            F.coalesce("__mc", "id").alias("comp"),
            F.coalesce("__touched", F.lit(False)).alias("paired"),
        )
        .localCheckpoint(eager=True)
    )
    affected_comps = (
        merged.select(F.col("__mid").alias("c"))
        .unionByName(merged.select(F.col("__mc").alias("c")))
        .unionByName(batch_rows.select(F.col("comp").alias("c")))
        .distinct()
    )
    affected = sorted(
        r["b"]
        for r in affected_comps.select(
            _bucket_expr(["c"], n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    # prune the rewrite to affected buckets: a state row changes only if
    # its comp is remapped (comp in merged.__mid) or its paired flag flips
    # (a previously-unpaired row's comp IS its id, which the contracted
    # graph contains when it gains an edge) — both put bucket(comp) in
    # the affected set
    pruned = state.filter(
        _bucket_expr(["comp"], n_buckets).isin(affected)
        if affected
        else F.lit(False)
    )
    rewritten = (
        pruned.join(merged, pruned["comp"] == merged["__mid"], "left_outer")
        .join(everts, pruned["id"] == everts["__vid"], "left_outer")
        .select(
            "id",
            "source",
            "sh",
            F.coalesce("__mc", pruned["comp"]).alias("comp"),
            (F.col("paired") | F.coalesce("__touched", F.lit(False))).alias(
                "paired"
            ),
        )
        .unionByName(batch_rows)
    )
    tmp = f"{serving_path}__gen_{uuid.uuid4().hex[:8]}"
    rewritten.withColumn(BUCKET_COL, _bucket_expr(["comp"], n_buckets)).repartition(
        F.col(BUCKET_COL)
    ).write.partitionBy(BUCKET_COL).parquet(tmp)
    for b in affected:
        entry = f"{BUCKET_COL}={b}"
        src = os.path.join(tmp, entry)
        dst = os.path.join(serving_path, entry)
        old = f"{serving_path}__old_{b}_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(dst):
            os.replace(dst, old)
        if os.path.isdir(src):
            os.replace(src, dst)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return affected


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
