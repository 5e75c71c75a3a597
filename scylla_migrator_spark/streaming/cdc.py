"""Streaming CDC replication: change stream -> upsert/delete into the target.

Reference parity (§2.12, writers/DynamoStreamReplication.scala:42-164):
* T1 micro-batch cadence: ``Trigger.ProcessingTime("5 seconds")`` (tests use
  ``availableNow`` to drain deterministically)
* T2 initial position: file-source streams naturally replay from the start
  (TrimHorizon analog)
* T3 change model: an op column INSERT/MODIFY -> put, REMOVE -> delete
* T4 at-least-once + idempotent upserts: the merge keys on the PK and keeps
  the newest (ts, seq) version, so replayed batches are no-ops; Structured
  Streaming checkpointing replaces KCL lease checkpoints
* T5 snapshot-then-stream: ``snapshot_then_stream`` runs the batch copy
  first, then attaches the stream

The target here is the parquet fixture store; the merge is expressed as a
unionByName + max_by-per-key compaction (same plan a Delta MERGE compiles
to for a full-overwrite fixture). Per-op counters (put/delete accumulators,
DynamoStreamReplication.scala:50-51) are collected per batch via one
aggregation and exposed through ``metrics``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_COL = "op"
SEQ_COLS = ("ts", "event_id")  # version ordering: newest wins


@dataclass
class CdcReplicator:
    """foreachBatch-driven upsert/delete merge into a parquet-backed target."""

    target_path: str
    key_cols: list[str]
    value_cols: list[str]
    allow_schema_drift: bool = False
    metrics: list[dict] = field(default_factory=list)

    def _read_state(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.target_path):
            return None
        try:
            return spark.read.parquet(self.target_path)
        except Exception:
            return None

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        state = self._read_state(spark)
        drift_added: list[str] = []
        if self.allow_schema_drift and state is not None:
            # adopt columns earlier drift persisted into state BEFORE
            # computing this batch's drift: a restarted replicator (fresh
            # constructor value_cols) must not re-report long-known columns
            # as new drift, and the compact below must not drop them
            known = {*self.key_cols, *SEQ_COLS, OP_COL}
            persisted = [
                c
                for c in state.columns
                if c not in known and c not in self.value_cols
            ]
            if persisted:
                self.value_cols = [*self.value_cols, *persisted]
        if self.allow_schema_drift:
            # DynamoDB/Alternator items are SCHEMALESS: a stream batch may
            # carry attributes never declared up front, or omit declared
            # ones (a put replaces the WHOLE item, so an omitted attribute
            # means removed — newest-wins over the full row is the correct
            # image semantics). Widen the tracked value columns with
            # whatever arrives; missing columns null-fill via unionByName.
            known = {*self.key_cols, *SEQ_COLS, OP_COL}
            drift_added = [
                c
                for c in batch.columns
                if c not in known and c not in self.value_cols
            ]
            if drift_added:
                self.value_cols = [*self.value_cols, *drift_added]
            present = [c for c in self.value_cols if c in batch.columns]
            batch = batch.select(*self.key_cols, *SEQ_COLS, OP_COL, *present)
        else:
            cols = [*self.key_cols, *SEQ_COLS, OP_COL, *self.value_cols]
            batch = batch.select(*cols)

        # per-op accumulator counts (K7) in one pass
        counts = {
            r[OP_COL]: r["cnt"]
            for r in batch.groupBy(OP_COL).agg(F.count("*").alias("cnt")).collect()
        }
        entry = {"batch_id": batch_id, **counts}
        if drift_added:
            entry["drift_added"] = drift_added
        self.metrics.append(entry)

        merged = (
            batch
            if state is None
            else state.unionByName(
                batch, allowMissingColumns=self.allow_schema_drift
            )
        )

        # newest version per key wins (idempotent under replay; out-of-order
        # events within retention cannot regress state)
        avail_vals = [c for c in self.value_cols if c in merged.columns]
        ver = F.struct(*[F.col(c) for c in SEQ_COLS])
        pick = [
            F.max_by(F.struct(*[F.col(c) for c in (*SEQ_COLS, OP_COL, *avail_vals)]), ver).alias("r")
        ]
        # tombstones (op=REMOVE) are RETAINED in stored state so that a
        # late-arriving older event cannot resurrect a deleted key; they are
        # filtered out of the user-facing view by current()
        compact = merged.groupBy(*self.key_cols).agg(*pick).select(*self.key_cols, "r.*")
        tmp = self.target_path + ".staging"
        compact.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.target_path)

    def current(self, spark: SparkSession) -> DataFrame:
        """The live target view: tombstoned keys excluded."""
        state = self._read_state(spark)
        if state is None:
            raise FileNotFoundError(f"no CDC state at {self.target_path}")
        return state.filter(F.col(OP_COL) != "REMOVE").drop(OP_COL)

    def attach(self, stream: DataFrame, checkpoint: str, trigger_available_now: bool = True):
        writer = stream.writeStream.foreachBatch(self.apply_batch).option(
            "checkpointLocation", checkpoint
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="5 seconds")  # T1 cadence
        return writer.start()


def snapshot_then_stream(
    snapshot: DataFrame,
    stream: DataFrame,
    replicator: CdcReplicator,
    checkpoint: str,
    skip_initial_snapshot: bool = False,
    source_catalog: dict | None = None,
    source_table: str | None = None,
):
    """T5: enable the source change stream (K9), batch snapshot write, then
    continuous replication (AlternatorMigrator.scala:149-192 — the stream is
    enabled BEFORE the snapshot so changes during the copy are captured).

    ``source_catalog``/``source_table`` identify the fixture table whose
    stream must be ENABLED first (DynamoUtils.scala:337-401 poll loop);
    omitted = file-backed source whose stream needs no enablement."""
    if source_catalog is not None:
        from scylla_migrator_spark.sinks.dynamodb import enable_dynamo_stream

        if source_table is None:
            raise ValueError("source_table required when source_catalog is given")
        enable_dynamo_stream(source_catalog, source_table)
    if not skip_initial_snapshot:
        replicator.apply_batch(snapshot, batch_id=-1)
    return replicator.attach(stream, checkpoint)
