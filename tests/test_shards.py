"""DynamoDB-Streams shard consumption protocol (S9 deepening —
KinesisDynamoDBReceiver.scala:59-91 block/sequence bookkeeping,
KinesisDynamoDBCheckpointer.scala lease semantics): parent-before-child
ordering, sequence checkpoint resume, TRIM_HORIZON vs LATEST."""

from __future__ import annotations

import pytest

from scylla_migrator_spark.streaming.shards import (
    LATEST,
    TRIM_HORIZON,
    ShardCheckpoints,
    ShardStore,
    consume,
)


def _store_with_split():
    st = ShardStore()
    st.add_shard("s0")
    for i in range(5):
        st.put("s0", 100 + i, {"k": i, "v": f"p{i}"})
    st.split("s0", ("s1", "s2"))
    for i in range(3):
        st.put("s1", 200 + i, {"k": 10 + i, "v": f"c1-{i}"})
        st.put("s2", 300 + i, {"k": 20 + i, "v": f"c2-{i}"})
    return st


def test_parent_drains_before_children():
    st = _store_with_split()
    ck = ShardCheckpoints()
    order = [sid for sid, _batch in consume(st, ck, batch_size=2)]
    # every s0 batch precedes any child batch
    first_child = order.index("s1") if "s1" in order else len(order)
    assert all(sid == "s0" for sid in order[:first_child - 0] if sid == "s0")
    assert max(i for i, s in enumerate(order) if s == "s0") < min(
        i for i, s in enumerate(order) if s in ("s1", "s2")
    )
    assert ck.is_done("s0")
    assert ck.get("s1") == 202 and ck.get("s2") == 302


def test_kill_and_resume_from_sequence_checkpoints():
    st = _store_with_split()
    ck = ShardCheckpoints()
    seen = []
    for sid, batch in consume(st, ck, batch_size=2, max_batches=2):
        seen.extend((sid, r["k"]) for r in batch)
    assert len(seen) == 4  # 2 batches x 2 records, all from the parent
    assert ck.get("s0") == 103 and not ck.is_done("s0")

    # resumed worker picks up exactly after the checkpoint, no re-delivery
    rest = []
    for sid, batch in consume(st, ck, batch_size=2):
        rest.extend((sid, r["k"]) for r in batch)
    ks = [k for (_s, k) in seen + rest]
    assert sorted(ks) == [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22]
    assert len(ks) == len(set(ks))  # zero duplicates across the kill


def test_latest_skips_backlog_trim_horizon_replays():
    st = ShardStore()
    st.add_shard("a")
    for i in range(4):
        st.put("a", i, {"k": i})
    ck_trim = ShardCheckpoints()
    got = [r["k"] for _s, b in consume(st, ck_trim, initial_position=TRIM_HORIZON) for r in b]
    assert got == [0, 1, 2, 3]

    ck_latest = ShardCheckpoints()
    got = [r["k"] for _s, b in consume(st, ck_latest, initial_position=LATEST) for r in b]
    assert got == []  # backlog skipped
    st.put("a", 10, {"k": 99})  # new arrival after the worker started
    got = [r["k"] for _s, b in consume(st, ck_latest, initial_position=LATEST) for r in b]
    assert got == [99]  # only post-attach records


def test_store_invariants():
    st = ShardStore()
    st.add_shard("a")
    st.put("a", 5, {"k": 1})
    with pytest.raises(ValueError, match="strictly increase"):
        st.put("a", 5, {"k": 2})
    st.split("a", ("b", "c"))
    with pytest.raises(ValueError, match="closed"):
        st.put("a", 9, {"k": 3})
    with pytest.raises(ValueError, match="unknown parent"):
        st.add_shard("x", parent_id="nope")
    ck = ShardCheckpoints()
    ck.set("a", 7)
    with pytest.raises(ValueError, match="backwards"):
        ck.set("a", 6)


def test_shard_feed_drives_cdc_replicator(spark, tmp_path):
    """End-to-end S9: shard batches feed the CdcReplicator's idempotent
    upsert; a re-delivered batch (at-least-once) changes nothing."""
    from scylla_migrator_spark.streaming.cdc import CdcReplicator

    st = ShardStore()
    st.add_shard("s0")
    st.put("s0", 1, {"user_id": 1, "ts": 10, "event_id": 1, "op": "INSERT", "value": 1.0})
    st.put("s0", 2, {"user_id": 2, "ts": 11, "event_id": 2, "op": "INSERT", "value": 2.0})
    st.put("s0", 3, {"user_id": 1, "ts": 12, "event_id": 3, "op": "REMOVE", "value": None})

    rep = CdcReplicator(
        target_path=str(tmp_path / "t"), key_cols=["user_id"], value_cols=["value"]
    )
    schema = "user_id bigint, ts bigint, event_id bigint, op string, value double"
    ck = ShardCheckpoints()
    batches = []
    for i, (_sid, batch) in enumerate(consume(st, ck, batch_size=2)):
        batches.append(batch)
        rep.apply_batch(spark.createDataFrame(batch, schema), i)
    assert [r["user_id"] for r in rep.current(spark).collect()] == [2]
    # crash-window re-delivery of the last batch: idempotent
    rep.apply_batch(spark.createDataFrame(batches[-1], schema), 99)
    assert [r["user_id"] for r in rep.current(spark).collect()] == [2]
