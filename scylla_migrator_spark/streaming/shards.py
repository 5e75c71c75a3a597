"""DynamoDB-Streams shard model: shard lineage, iterators, sequence-number
checkpointing, and a KCL-style resumable reader over a fixture shard store.

Reference parity (S9 deepening — the reference consumes DynamoDB Streams
through a patched KCL receiver,
spark-kinesis-dynamodb/src/main/scala/org/apache/spark/streaming/kinesis/
KinesisDynamoDBReceiver.scala:59-91,101-417 and
KinesisDynamoDBCheckpointer.scala): records arrive per SHARD in sequence
order; shards SPLIT over time (parent -> children) and a processor must
fully drain and checkpoint a parent before starting its children or
per-key ordering breaks; progress is the latest successfully-stored
sequence number per shard, checkpointed periodically, and a restarted
worker resumes from those checkpoints (absent a checkpoint, the configured
initial position — TRIM_HORIZON or LATEST).

The sandbox has no live stream, so the STORE is a fixture, but the
consumption protocol here is the real one:

* :class:`ShardStore` — shards with parent lineage and ordered
  ``(sequence_number, record)`` lists (the fixture analog of
  DescribeStream + GetShardIterator + GetRecords);
* :class:`ShardCheckpoints` — per-shard latest-stored sequence numbers
  (the KCL lease/checkpoint table analog, ``shardIdToLatestStoredSeqNum``
  at KinesisDynamoDBReceiver.scala:154);
* :func:`consume` — drains shards parent-before-child, yields bounded
  batches, checkpoints AFTER each batch is handed off (at-least-once:
  a crash between hand-off and checkpoint replays the batch — the
  downstream ``CdcReplicator`` upsert is idempotent, T4), resumes from
  checkpoints, honors TRIM_HORIZON vs LATEST when none exist.

At scale the per-shard draining maps onto one task per shard lease (the
KCL worker model); the fixture keeps the protocol single-process but the
ordering/checkpoint/resume semantics identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

TRIM_HORIZON = "TRIM_HORIZON"
LATEST = "LATEST"


@dataclass
class Shard:
    shard_id: str
    parent_id: str | None = None
    # ordered (sequence_number, record) — sequence numbers strictly increase
    records: list[tuple[int, dict[str, Any]]] = field(default_factory=list)
    closed: bool = False  # a split parent is closed (no more records)


class ShardStore:
    """Fixture shard store with lineage — DescribeStream analog."""

    def __init__(self) -> None:
        self.shards: dict[str, Shard] = {}

    def add_shard(self, shard_id: str, parent_id: str | None = None) -> Shard:
        if parent_id is not None and parent_id not in self.shards:
            raise ValueError(f"unknown parent shard {parent_id!r}")
        s = Shard(shard_id, parent_id)
        self.shards[shard_id] = s
        return s

    def put(self, shard_id: str, seq: int, record: dict[str, Any]) -> None:
        s = self.shards[shard_id]
        if s.closed:
            raise ValueError(f"shard {shard_id!r} is closed")
        if s.records and seq <= s.records[-1][0]:
            raise ValueError("sequence numbers must strictly increase per shard")
        s.records.append((seq, record))

    def split(self, shard_id: str, child_ids: tuple[str, str]) -> None:
        """Close a shard and open its children (re-shard event)."""
        self.shards[shard_id].closed = True
        for c in child_ids:
            self.add_shard(c, parent_id=shard_id)

    def get_records(
        self, shard_id: str, after_seq: int | None, limit: int
    ) -> list[tuple[int, dict[str, Any]]]:
        """GetRecords analog: records strictly after ``after_seq``."""
        recs = self.shards[shard_id].records
        if after_seq is None:
            start = 0
        else:
            start = next(
                (i for i, (q, _r) in enumerate(recs) if q > after_seq), len(recs)
            )
        return recs[start : start + limit]

    def max_seq(self, shard_id: str) -> int | None:
        recs = self.shards[shard_id].records
        return recs[-1][0] if recs else None


class ShardCheckpoints:
    """Per-shard latest-stored sequence numbers (the KCL checkpoint table)."""

    def __init__(self) -> None:
        self._seq: dict[str, int] = {}
        self._done: set[str] = set()  # shard fully drained AND closed

    def get(self, shard_id: str) -> int | None:
        return self._seq.get(shard_id)

    def set(self, shard_id: str, seq: int) -> None:
        prev = self._seq.get(shard_id)
        if prev is not None and seq < prev:
            raise ValueError("checkpoint must not move backwards")
        self._seq[shard_id] = seq

    def mark_done(self, shard_id: str) -> None:
        self._done.add(shard_id)

    def is_done(self, shard_id: str) -> bool:
        return shard_id in self._done


def _ready_shards(store: ShardStore, ckpt: ShardCheckpoints) -> list[str]:
    """Shards eligible for consumption: parent absent or fully drained
    (the KCL parent-before-child lease rule)."""
    out = []
    for sid, s in store.shards.items():
        if ckpt.is_done(sid):
            continue
        if s.parent_id is not None and not ckpt.is_done(s.parent_id):
            continue
        out.append(sid)
    return sorted(out)  # deterministic order


def consume(
    store: ShardStore,
    ckpt: ShardCheckpoints,
    batch_size: int = 100,
    initial_position: str = TRIM_HORIZON,
    on_batch: Callable[[str, list[dict[str, Any]]], None] | None = None,
    max_batches: int | None = None,
) -> Iterator[tuple[str, list[dict[str, Any]]]]:
    """Drain all ready shards in bounded batches, checkpointing after each
    hand-off; honors existing checkpoints (resume), else the initial
    position (KinesisDynamoDBReceiver.scala:78-80: TRIM_HORIZON replays the
    shard from the start, LATEST skips the backlog). ``max_batches`` lets
    tests kill the worker mid-drain and resume."""
    if initial_position not in (TRIM_HORIZON, LATEST):
        raise ValueError(f"unknown initial position {initial_position!r}")
    emitted = 0
    progress = True
    while progress:
        progress = False
        for sid in _ready_shards(store, ckpt):
            after = ckpt.get(sid)
            if after is None and initial_position == LATEST:
                last = store.max_seq(sid)
                if last is not None:
                    ckpt.set(sid, last)  # skip the backlog
                after = ckpt.get(sid)
            while True:
                if max_batches is not None and emitted >= max_batches:
                    return
                batch = store.get_records(sid, after, batch_size)
                if not batch:
                    break
                records = [r for (_q, r) in batch]
                if on_batch is not None:
                    on_batch(sid, records)  # hand-off BEFORE checkpoint
                yield sid, records
                after = batch[-1][0]
                ckpt.set(sid, after)  # at-least-once: ckpt after store
                emitted += 1
                progress = True
            # closed + drained -> done; children become ready next sweep
            s = store.shards[sid]
            drained = store.max_seq(sid) is None or ckpt.get(sid) == store.max_seq(sid)
            if s.closed and drained:
                ckpt.mark_done(sid)
                progress = True
    return
