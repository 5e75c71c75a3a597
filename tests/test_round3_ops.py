"""Round-3 operators: SemDedup, the Python UDTF surface, and the
transformWithStateInPandas running-totals processor (+ its fallback)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.dedup import semdedup
from scylla_migrator_spark.streaming.stateful import (
    has_transform_with_state_runtime,
    running_user_totals,
)


def test_semdedup_prunes_near_identical_within_cluster(spark):
    # two near-identical vectors (1 keeps, 2 pruned), one orthogonal survivor
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # cos ~1 with id 1 -> pruned
        (3, [0.0, 1.0, 0.0, 0.0]),  # different cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = {r["vec_id"]: r for r in semdedup(df, "vec_id", "embedding", centroids, tau=0.9).collect()}
    assert out[1]["kept"] and out[3]["kept"] and not out[2]["kept"]
    assert out[1]["centroid_id"] == out[2]["centroid_id"] != out[3]["centroid_id"]


def test_semdedup_keeper_is_lowest_id(spark):
    # a chain of three near-identical vectors: only the lowest id survives
    rows = [(i, [1.0, float(i) * 1e-4]) for i in (7, 8, 9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, "vec_id", "embedding", [[1.0, 0.0]], tau=0.99)
    kept = sorted(r["vec_id"] for r in out.filter("kept").collect())
    assert kept == [7]


def test_udtf_sentence_split_lateral(spark):
    from scylla_migrator_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Alpha. Beta.. Gamma"), (2, None), (3, "...")],
        "doc_id long, text string",
    ).createOrReplaceTempView("__udtf_test_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars "
        "FROM __udtf_test_docs d, LATERAL split_sentences(d.text) s"
    ).collect()
    got = {(r["doc_id"], r["sent_idx"]): (r["sentence"], r["n_chars"]) for r in rows}
    # doc 1 splits to ['Alpha', ' Beta', '', ' Gamma']; blank part dropped
    assert got == {
        (1, 0): ("Alpha", 5),
        (1, 1): (" Beta", 5),
        (1, 3): (" Gamma", 6),
    }


def _run_totals(spark, tmp_path, frames):
    """Feed frames as separate micro-batches through running_user_totals."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    for i, pdf in enumerate(frames):
        pd.DataFrame(pdf).to_parquet(src / f"b{i}.parquet")
    schema = "user_id long, value_micros long"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = running_user_totals(stream, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("totals_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("totals_test").collect()


def test_running_totals_accumulates_across_batches(spark, tmp_path):
    rows = _run_totals(
        spark,
        tmp_path,
        [
            {"user_id": [1, 1, 2], "value_micros": [10, 20, 5]},
            {"user_id": [1, 2], "value_micros": [-7, 5]},
        ],
    )
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["upd"] > final[r["user_id"]]["upd"]:
            final[r["user_id"]] = r
    assert final[1]["n_events"] == 3 and final[1]["sum_micros"] == 23
    assert final[2]["n_events"] == 2 and final[2]["sum_micros"] == 10


@pytest.mark.skipif(
    not has_transform_with_state_runtime(),
    reason="transformWithStateInPandas needs the protobuf runtime",
)
def test_running_totals_uses_transform_with_state(spark, tmp_path):
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rows = _run_totals(
            spark, tmp_path, [{"user_id": [5], "value_micros": [100]}]
        )
        assert rows[0]["n_events"] == 1 and rows[0]["sum_micros"] == 100
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_allocate_token_budget_sums_exactly(spark):
    from scylla_migrator_spark.analytics.sampling import allocate_token_budget

    counts = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 1)], "source string, toks long"
    )
    out = {r["source"]: r["alloc_tokens"] for r in
           allocate_token_budget(counts, "source", "toks", budget=10).collect()}
    # shares 30/30/10 over total 7: bases 4/4/1, remainders 2/2/3 — the one
    # leftover seat goes to c (largest remainder)
    assert out == {"a": 4, "b": 4, "c": 2}
    assert sum(out.values()) == 10


def test_allocate_token_budget_zero_group(spark):
    from scylla_migrator_spark.analytics.sampling import allocate_token_budget

    counts = spark.createDataFrame([("a", 10), ("b", 0)], "source string, toks long")
    out = {r["source"]: r["alloc_tokens"] for r in
           allocate_token_budget(counts, "source", "toks", budget=7).collect()}
    assert out == {"a": 7, "b": 0}


def test_shard_layout_positions_contiguous(spark):
    from scylla_migrator_spark.analytics.sampling import shard_layout

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = shard_layout(df, "doc_id", n_shards=4).collect()
    assert len(out) == 100
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic: same layout on re-run
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in shard_layout(df, "doc_id", 4).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in out}


def test_allocate_token_budget_no_long_overflow(spark):
    """share = toks*budget at 100 TB corpus scale (1e14 tokens) must not
    overflow long arithmetic — decimal(38,0) path."""
    from scylla_migrator_spark.analytics.sampling import allocate_token_budget

    counts = spark.createDataFrame(
        [("web", 10**14), ("code", 3 * 10**13), ("books", 7 * 10**12)],
        "source string, toks long",
    )
    out = {r["source"]: r["alloc_tokens"] for r in
           allocate_token_budget(counts, "source", "toks", budget=100_000).collect()}
    assert sum(out.values()) == 100_000
    assert out["web"] > out["code"] > out["books"] > 0


def test_stratified_topn_exact_counts(spark):
    from scylla_migrator_spark.analytics.sampling import stratified_topn

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(60)], "doc_id long, source string"
    )
    out = stratified_topn(df, ["source"], "doc_id", n=4)
    per = {r["source"]: 0 for r in out.collect()}
    for r in out.collect():
        per[r["source"]] += 1
    assert per == {"s0": 4, "s1": 4, "s2": 4}


def test_incremental_scd2_matches_batch(spark, tmp_path):
    """Tail-append batches (intra-batch disorder allowed) fold into the
    same history the batch collapse produces: a same-type later event
    extends the open run instead of opening a version."""
    from scylla_migrator_spark.streaming.scd_cdc import scd2_upsert_batch

    serving = str(tmp_path / "scd2")
    b1 = spark.createDataFrame(
        [(1, "A", 10, 2), (1, "B", 5, 1)],  # disordered within the batch
        "user_id long, event_type string, ts_us long, event_id long",
    )
    b2 = spark.createDataFrame(
        [(1, "A", 15, 3), (1, "C", 20, 4), (2, "X", 7, 5)],
        "user_id long, event_type string, ts_us long, event_id long",
    )
    for b in (b1, b2):
        scd2_upsert_batch(b, serving, ["user_id"], "ts_us", ["event_type"], "event_id")
    rows = {
        (r["user_id"], r["valid_from"]): (r["event_type"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(serving).collect()
    }
    assert rows == {
        (1, 5): ("B", 10, False),
        (1, 10): ("A", 20, False),  # the t=15 'A' extended this run
        (1, 20): ("C", None, True),
        (2, 7): ("X", None, True),
    }


def test_incremental_scd2_null_key_replaced_not_duplicated(spark, tmp_path):
    """Null grouping keys must match their own history (null-safe joins):
    a second batch for the null key replaces its version instead of
    duplicating it."""
    from scylla_migrator_spark.streaming.scd_cdc import scd2_upsert_batch

    serving = str(tmp_path / "scd2_null")
    b1 = spark.createDataFrame(
        [(None, "A", 5, 1)], "user_id long, event_type string, ts_us long, event_id long"
    )
    b2 = spark.createDataFrame(
        [(None, "B", 10, 2)], "user_id long, event_type string, ts_us long, event_id long"
    )
    for b in (b1, b2):
        scd2_upsert_batch(b, serving, ["user_id"], "ts_us", ["event_type"], "event_id")
    rows = sorted(
        (r["valid_from"], r["event_type"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(serving).collect()
    )
    assert rows == [(5, "A", 10, False), (10, "B", None, True)]
