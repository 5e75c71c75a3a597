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
        # interpolation lands inside the crossing bin; the exact discrete
        # quantile lies in that same bin, so the gap is < one bin width
        assert abs(r["err"]) < 2343.75, r


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
