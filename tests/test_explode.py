"""Explode-by-timestamp-groups tests — FIXTURES.md F2 shapes
(reference ExplodeRowTest semantics, readers/Cassandra.scala:113-169)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.operators.explode_timestamps import (
    SET_SUFFIX,
    apply_exploded,
    explode_by_timestamp_groups,
)


def _fixture(spark):
    # (pk, ck, a, a_ttl, a_writetime, b, b_ttl, b_writetime)
    return spark.createDataFrame(
        [
            # same (ttl, wt) pair for a and b -> 1 exploded row
            ("p1", 1, "av", 100, 1_000, 1.5, 100, 1_000),
            # different pairs -> 2 exploded rows
            ("p2", 1, "av2", 100, 1_000, 2.5, 200, 2_000),
            # b has no metadata: (null,null) group dropped (>1 group)
            ("p3", 1, "av3", 100, 1_000, 3.5, None, None),
            # single all-null group survives (no drop when only 1 group)
            ("p4", 1, "av4", None, None, 4.5, None, None),
        ],
        "pk string, ck int, a string, a_ttl int, a_writetime long, b double, b_ttl int, b_writetime long",
    )


def test_explode_group_counts(spark):
    out = explode_by_timestamp_groups(_fixture(spark), ["pk", "ck"])
    counts = {r["pk"]: r["cnt"] for r in out.groupBy("pk").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"p1": 1, "p2": 2, "p3": 1, "p4": 1}


def test_explode_tri_state_cells(spark):
    out = explode_by_timestamp_groups(_fixture(spark), ["pk", "ck"])
    rows = {(r["pk"], r["ttl"], r["writetime"]): r for r in out.collect()}

    r = rows[("p1", 100, 1000)]
    assert r["a"] == "av" and r["a" + SET_SUFFIX] and r["b"] == 1.5 and r["b" + SET_SUFFIX]

    ra, rb = rows[("p2", 100, 1000)], rows[("p2", 200, 2000)]
    assert ra["a"] == "av2" and ra["a" + SET_SUFFIX]
    assert ra["b"] is None and not ra["b" + SET_SUFFIX]  # UNSET, not null-write
    assert rb["b"] == 2.5 and rb["b" + SET_SUFFIX] and not rb["a" + SET_SUFFIX]

    # p3: (null,null) group dropped -> b never written (implicit null, no tombstone)
    assert ("p3", None, None) not in rows
    r3 = rows[("p3", 100, 1000)]
    assert r3["a"] == "av3" and not r3["b" + SET_SUFFIX]

    # p4: single (null,null) group kept
    r4 = rows[("p4", None, None)]
    assert r4["a"] == "av4" and r4["b"] == 4.5


def test_explode_apply_roundtrip(spark):
    df = _fixture(spark)
    out = apply_exploded(explode_by_timestamp_groups(df, ["pk", "ck"]), ["pk", "ck"])
    src = {r["pk"]: r for r in df.collect()}
    got = {r["pk"]: r for r in out.collect()}
    assert set(got) == set(src)
    for pk in ("p1", "p2", "p4"):
        assert got[pk]["a"] == src[pk]["a"] and got[pk]["b"] == src[pk]["b"]
        assert got[pk]["a_ttl"] == src[pk]["a_ttl"]
        assert got[pk]["b_writetime"] == src[pk]["b_writetime"]
    # p3's b was in the dropped (null,null) group -> stays absent after apply
    assert got["p3"]["a"] == "av3" and got["p3"]["b"] is None


def test_last_writer_wins(spark):
    exploded = spark.createDataFrame(
        [
            ("p1", "old", True, 10, 1_000),
            ("p1", "new", True, 20, 2_000),
            ("p1", None, False, None, 3_000),  # unset: must not clobber
        ],
        f"pk string, a string, a{SET_SUFFIX} boolean, ttl int, writetime long",
    )
    got = apply_exploded(exploded, ["pk"]).collect()[0]
    assert got["a"] == "new" and got["a_writetime"] == 2_000 and got["a_ttl"] == 20
