"""Unit + plan-shape tests for the temporal operators (as-of join, bucketed
range join) — semantics the DuckDB oracle can't pin (left-join nulls,
tie-breaks, plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_migrator_spark.operators.asof import asof_join
from scylla_migrator_spark.operators.range_join import range_join_points


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 20, 2), ("B", 5, 3), ("B", 4, 4)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100, 50.0), ("A", 10, 101, 51.0), ("A", 10, 102, 52.0), ("B", 5, 103, 9.0)],
        "sym string, qt long, quote_id long, px double",
    )
    return trades, quotes


def test_asof_inclusive_and_tiebreak(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="qt", tiebreak="quote_id", how="inner"
    )
    rows = {r.trade_id: (r.quote_id, r.px) for r in out.collect()}
    # t=10 matches the equal-ts quote (inclusive); among the two qt=10 quotes
    # the max quote_id (102) wins
    assert rows[1] == (102, 52.0)
    assert rows[2] == (102, 52.0)
    assert rows[3] == (103, 9.0)  # equal ts inclusive
    assert 4 not in rows  # t=4 precedes every B quote -> dropped by inner


def test_asof_left_keeps_unmatched(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="qt", tiebreak="quote_id", how="left"
    )
    rows = {r.trade_id: r.quote_id for r in out.collect()}
    assert len(rows) == 4 and rows[4] is None


def test_asof_single_shuffle_plan(trades_quotes):
    """The union-sort as-of plan must shuffle each side once (the window's
    hash partitioning) — no join node, no cartesian/BNLJ anywhere."""
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Window") == 1


def test_asof_rejects_bad_how(trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="how"):
        asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt", how="full")


@pytest.fixture(scope="module")
def intervals_points(spark):
    iv = spark.createDataFrame(
        [("u1", 100, 200, 1), ("u1", 150, 250, 2), ("u2", 0, 50, 3)],
        "k string, s long, e long, iv_id long",
    )
    pts = spark.createDataFrame(
        [("u1", 100, 10), ("u1", 200, 11), ("u1", 225, 12), ("u1", 260, 13), ("u2", 50, 14)],
        "k string, p long, pt_id long",
    )
    return iv, pts


def test_range_join_containment_inclusive_no_dupes(intervals_points):
    iv, pts = intervals_points
    out = range_join_points(iv, pts, ["k"], "s", "e", "p", bucket_width=100)
    pairs = sorted((r.iv_id, r.pt_id) for r in out.collect())
    # boundaries inclusive on both ends; p=260 matches nothing; each pair once
    assert pairs == [(1, 10), (1, 11), (2, 11), (2, 12), (3, 14)]


@pytest.mark.parametrize("width", [1, 7, 1000])
def test_range_join_width_invariant(intervals_points, width):
    iv, pts = intervals_points
    out = range_join_points(iv, pts, ["k"], "s", "e", "p", bucket_width=width)
    pairs = sorted((r.iv_id, r.pt_id) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (2, 11), (2, 12), (3, 14)]


def test_range_join_is_equi_join(intervals_points):
    """The physical plan must be a hash/merge equi-join on the bucket key —
    never a nested-loop theta join."""
    iv, pts = intervals_points
    out = range_join_points(iv, pts, ["k"], "s", "e", "p", bucket_width=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_rejects_ambiguity_and_bad_width(intervals_points):
    iv, pts = intervals_points
    with pytest.raises(ValueError, match="bucket_width"):
        range_join_points(iv, pts, ["k"], "s", "e", "p", bucket_width=0)
    clash = pts.withColumnRenamed("p", "s")
    with pytest.raises(ValueError, match="ambiguous"):
        range_join_points(iv, clash, ["k"], "s", "e", "s", bucket_width=10)


def test_interval_overlap_no_antisym_excludes_identity_and_mirrors(spark):
    """With antisym_col omitted, each unordered overlapping pair appears
    exactly once (ordered by the full id tuple) and no interval pairs with
    itself."""
    from scylla_migrator_spark.operators.range_join import interval_overlap_pairs

    iv = spark.createDataFrame(
        [("u1", 1, 0, 100), ("u1", 2, 50, 150), ("u2", 1, 10, 20), ("u2", 2, 300, 400)],
        "uid string, sid long, t0 long, t1 long",
    )
    out = interval_overlap_pairs(iv, ["uid", "sid"], "t0", "t1", bucket_width=1000)
    rows = {(r.uid_a, r.sid_a, r.uid_b, r.sid_b): r.overlap_ns for r in out.collect()}
    # overlapping: (u1,1)x(u1,2) gap 50; (u1,1)x(u2,1); (u1,2)x(u2,1)? t0=50>t1=20 no
    assert rows == {
        ("u1", 1, "u1", 2): 50,
        ("u1", 1, "u2", 1): 10,
    }


class TestScd2History:
    def test_collapses_unchanged_runs(self, spark):
        from scylla_migrator_spark.operators.scd import scd2_history

        rows = [
            # key, ts, attr, tie
            (1, 10, "a", 1),
            (1, 20, "a", 2),   # unchanged -> collapsed into the first run
            (1, 30, "b", 3),   # change -> closes [10, 30)
            (1, 40, "a", 4),   # change back -> a reappears as a NEW version
            (2, 15, "x", 5),   # single-row key -> one open version
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "attr", "tie"])
        out = scd2_history(df, ["k"], "ts", ["attr"], "tie")
        got = sorted(
            (r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in out.collect()
        )
        assert got == [
            (1, "a", 10, 30, False),
            (1, "a", 40, None, True),
            (1, "b", 30, 40, False),
            (2, "x", 15, None, True),
        ]

    def test_null_attr_transitions(self, spark):
        from scylla_migrator_spark.operators.scd import scd2_history

        rows = [(1, 10, None, 1), (1, 20, None, 2), (1, 30, "v", 3)]
        df = spark.createDataFrame(rows, "k: bigint, ts: bigint, attr: string, tie: bigint")
        out = scd2_history(df, ["k"], "ts", ["attr"], "tie")
        got = sorted(
            ((r.attr, r.valid_from, r.valid_to) for r in out.collect()),
            key=lambda t: t[1],
        )
        # null==null is NOT a change (eqNullSafe); null->value is
        assert got == [(None, 10, 30), ("v", 30, None)]

    def test_single_shuffle_plan(self, spark, sf_dir):
        """Both window passes share one (key) hash partitioning — exactly
        one Exchange in the whole plan."""
        import io
        from contextlib import redirect_stdout

        from scylla_migrator_spark.plans import queries as Q

        df = Q.QUERIES["scd2_event_history"](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("simple")
        plan = buf.getvalue()
        assert plan.count("Exchange") == 1


def test_asof_join_strict_excludes_same_instant(spark):
    from scylla_migrator_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 100, "at-100"), (1, 150, "at-150")], "k long, rt long, tag string"
    )
    incl = {r["lt"]: r["tag"] for r in asof_join(
        left, right, ["k"], "lt", "rt", how="left").collect()}
    strict = {r["lt"]: r["tag"] for r in asof_join(
        left, right, ["k"], "lt", "rt", how="left", strict=True).collect()}
    # inclusive: the lt=100 row sees the rt=100 feature; strict: it must not
    assert incl == {100: "at-100", 200: "at-150"}
    assert strict == {100: None, 200: "at-150"}


@pytest.mark.slow
def test_asof_join_matches_bruteforce_random(spark):
    """Randomized equivalence vs an O(n^2) reference across all four mode
    combinations (inclusive/strict x inner/left), seeded for determinism.
    Covers duplicate timestamps, tie-breaks, keys with no rights."""
    import random

    from scylla_migrator_spark.operators.asof import asof_join

    rng = random.Random(42)
    for trial in range(4):
        lefts = [
            (rng.randint(1, 4), rng.randint(0, 20), i)  # key, ts, lid
            for i in range(rng.randint(3, 12))
        ]
        rights = [
            (rng.randint(1, 5), rng.randint(0, 20), 100 + i)  # key, ts, rid
            for i in range(rng.randint(3, 12))
        ]
        ldf = spark.createDataFrame(lefts, "k long, lt long, lid long")
        rdf = spark.createDataFrame(rights, "k long, rt long, rid long")

        def brute(strict):
            out = {}
            for k, lt, lid in lefts:
                cand = [
                    (rt, rid)
                    for (rk, rt, rid) in rights
                    if rk == k and (rt < lt if strict else rt <= lt)
                ]
                out[lid] = max(cand) if cand else None  # (rt, rid): max ts then max tie
            return out

        for strict in (False, True):
            expect = brute(strict)
            got_left = {
                r["lid"]: (None if r["rt"] is None else (r["rt"], r["rid"]))
                for r in asof_join(
                    ldf, rdf, ["k"], "lt", "rt", tiebreak="rid", how="left", strict=strict
                ).collect()
            }
            assert got_left == expect, f"trial={trial} strict={strict}"
            got_inner = {
                r["lid"]: (r["rt"], r["rid"])
                for r in asof_join(
                    ldf, rdf, ["k"], "lt", "rt", tiebreak="rid", how="inner", strict=strict
                ).collect()
            }
            assert got_inner == {k: v for k, v in expect.items() if v is not None}


def test_seasonal_decomposition_outage_day_gets_remainder_row(spark, tmp_path):
    """A zero-event day must enter the frame as n=0 via the calendar
    spine: the outage day itself gets a large-negative remainder (the
    alert row), and neighbors keep true 7-calendar-day windows."""
    import datetime as dt

    from scylla_migrator_spark.plans.queries import QUERIES

    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    for d in range(21):
        if d == 10:
            continue  # full outage day: zero events
        for _ in range(50):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=d), eid % 7, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "sfgap")
    (tmp_path / "sfgap").mkdir()
    df.write.parquet(f"{sf_dir}/events.parquet")

    out = {r["day"]: r for r in QUERIES["daily_seasonal_decomposition"](spark, sf_dir).collect()}
    outage_day = min(out) + (10 - 3)  # first 3 days lack a full window
    gap_days = [d for d, r in out.items() if r["n"] == 0]
    assert len(gap_days) == 1
    gap = out[gap_days[0]]
    # the outage row exists and its remainder is strongly negative
    assert gap["remainder"] < -20
    # neighbors' trend reflects the dip: 7-day mean drops from 50 to 300/7
    assert abs(out[gap_days[0]]["trend"] - 300 / 7) < 1e-6
    assert outage_day == gap_days[0]
