"""Bloom-filter join pruning and histogram quantile sketch properties.

Pins the two guarantees that make each operator safe to deploy at scale:
the Bloom filter NEVER drops a true member (so pruned+refined == the
unpruned semi-join exactly, at any bitmap size), and the histogram
quantile estimate is within one bin width of the exact discrete quantile
(the bound that justifies dropping the total sort at 100 TB).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_migrator_spark.functions import bloom as B


def _tables(spark, sf_dir):
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    return cust, orders


@pytest.mark.parametrize("num_bits", [128, 4096])
def test_bloom_no_false_negatives_any_bitmap_size(spark, sf_dir, num_bits):
    """Pruned-then-refined == unpruned semi-join even when the bitmap is
    deliberately undersized (128 bits -> heavy false positives)."""
    cust, orders = _tables(spark, sf_dir)
    words = B.build_bloom_bitmap(cust, "c_custkey", num_hashes=3, num_bits=num_bits)
    cand = B.bloom_prune(orders, "o_custkey", words, num_hashes=3, num_bits=num_bits)
    refined = cand.join(
        F.broadcast(cust), cand.o_custkey == cust.c_custkey, "left_semi"
    )
    truth = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
    )
    n_cand, n_refined, n_truth = cand.count(), refined.count(), truth.count()
    assert n_refined == n_truth  # zero false negatives
    assert n_cand >= n_truth  # superset property
    if num_bits == 128:
        assert n_cand > n_truth  # undersized bitmap must show false positives


def test_bloom_prune_is_scan_stage(spark, sf_dir):
    """The membership predicate is a pure column filter: no Exchange, no
    Python eval — the probe side never shuffles to be pruned."""
    cust, orders = _tables(spark, sf_dir)
    words = B.build_bloom_bitmap(cust, "c_custkey")
    plan = (
        B.bloom_prune(orders, "o_custkey", words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_bitmap_word_count_validated(spark, sf_dir):
    cust, orders = _tables(spark, sf_dir)
    words = B.build_bloom_bitmap(cust, "c_custkey", num_bits=4096)
    with pytest.raises(ValueError, match="words"):
        B.bloom_prune(orders, "o_custkey", words, num_bits=128)


def test_histogram_quantile_error_within_one_bin(spark, sf_dir):
    from scylla_migrator_spark.plans.queries import QUERIES

    rows = QUERIES["histogram_quantile_sketch"](spark, sf_dir).collect()
    assert {r["q"] for r in rows} == {25, 50, 75, 95}
    for r in rows:
        # interpolation lands inside the crossing bin (upper edge
        # inclusive: needed == cnt maps to the bin's top); the exact
        # discrete quantile lies in that same bin, so the gap is at most
        # one bin width
        assert abs(r["err"]) <= 2343.75, r


def test_bloom_negate_keeps_only_definite_non_members(spark, sf_dir):
    """Anti mode: every kept row is guaranteed novel — the kept set and
    the true member set are disjoint, at any bitmap size."""
    cust, orders = _tables(spark, sf_dir)
    words = B.build_bloom_bitmap(cust, "c_custkey", num_bits=256)
    kept = B.bloom_prune(orders, "o_custkey", words, num_bits=256, negate=True)
    members = kept.join(
        F.broadcast(cust), kept.o_custkey == cust.c_custkey, "left_semi"
    )
    assert members.count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    build=st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=30),
    probe=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), max_size=40
    ),
    num_bits=st.sampled_from([64, 256, 1024]),
    num_hashes=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_bloom_totality_no_false_negatives(spark, build, probe, num_bits, num_hashes):
    """TOTALITY over arbitrary key sets, bitmap sizes, and hash counts:
    every build-side key still probes as a member (no false negatives),
    and negate-mode keeps no member — including negative keys (the md5
    position math must stay in [0, num_bits) for them too)."""
    build_df = spark.createDataFrame([(k,) for k in build] or [(0,)], "k long")
    if not build:
        build_df = build_df.limit(0)
    probe_df = spark.createDataFrame(
        [(k,) for k in (probe or [0])], "k long"
    )
    if not probe:
        probe_df = probe_df.limit(0)
    words = B.build_bloom_bitmap(
        build_df, "k", num_hashes=num_hashes, num_bits=num_bits
    )
    kept = {
        r["k"]
        for r in B.bloom_prune(
            probe_df, "k", words, num_hashes=num_hashes, num_bits=num_bits
        ).collect()
    }
    anti = {
        r["k"]
        for r in B.bloom_prune(
            probe_df, "k", words, num_hashes=num_hashes, num_bits=num_bits,
            negate=True,
        ).collect()
    }
    members = set(probe) & build
    assert members <= kept          # no false negatives
    assert not (anti & build)       # negate keeps no member
    assert kept | anti == set(probe)  # the two modes partition the probe


@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=599999.0, allow_nan=False,
                  allow_infinity=False),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([25, 50, 75, 95]),
)
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_histogram_quantile_within_one_bin_any_distribution(spark, values, q):
    """The crossing+interpolation contract, property form: for ANY value
    distribution and any quantile, the histogram estimate lands inside
    the crossing bin, so |est - exact_disc| < one bin width."""
    from scylla_migrator_spark.plans.queries import _histogram_quantiles

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id long, v double"
    )
    rows = _histogram_quantiles(
        df, [], "v", "id", width=2343.75, nbins=256, qs=[q]
    ).collect()
    assert len(rows) == 1
    # inclusive: one value at a bin's lower edge puts the estimate at the
    # bin's upper edge - exactly one width away
    assert abs(rows[0]["err"]) <= 2343.75, rows[0]
