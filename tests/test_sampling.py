"""Deterministic hash-sampling properties: reproducibility, rate accuracy,
nesting, split stability, and the no-shuffle plan shape."""

from __future__ import annotations

import pytest

from scylla_migrator_spark.analytics import sampling as SAMP


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_deterministic_across_runs(docs):
    a = {r["doc_id"] for r in SAMP.deterministic_sample(docs, 0.3, "doc_id").collect()}
    b = {r["doc_id"] for r in SAMP.deterministic_sample(docs, 0.3, "doc_id").collect()}
    assert a == b and a


def test_rate_roughly_honored(docs):
    n = docs.count()
    kept = SAMP.deterministic_sample(docs, 0.5, "doc_id").count()
    assert abs(kept / n - 0.5) < 0.2  # 50 docs at sf0.001 — loose bound


def test_samples_nest_as_rate_grows(docs):
    small = {r["doc_id"] for r in SAMP.deterministic_sample(docs, 0.2, "doc_id").collect()}
    large = {r["doc_id"] for r in SAMP.deterministic_sample(docs, 0.6, "doc_id").collect()}
    assert small <= large


def test_weighted_mix_rates_per_group(docs):
    out = SAMP.weighted_mix(
        docs, {"src0": 1.0, "src1": 0.0}, group_col="source", key_col="doc_id",
        default_rate=0.5,
    )
    by_src = {r["source"]: r["cnt"] for r in out.groupBy("source").count()
              .withColumnRenamed("count", "cnt").collect()}
    total = {r["source"]: r["cnt"] for r in docs.groupBy("source").count()
             .withColumnRenamed("count", "cnt").collect()}
    assert by_src["src0"] == total["src0"]  # rate 1.0 keeps everything
    assert "src1" not in by_src  # rate 0.0 keeps nothing


def test_split_assignment_stable_under_row_changes(docs):
    full = {r["doc_id"]: r["split"] for r in SAMP.assign_splits(docs, "doc_id").collect()}
    half = {r["doc_id"]: r["split"]
            for r in SAMP.assign_splits(docs.filter("doc_id % 2 = 0"), "doc_id").collect()}
    # removing rows must not move anyone else's split
    assert all(full[k] == v for k, v in half.items())
    assert set(full.values()) <= {"train", "val", "test"}


def test_sample_plans_no_shuffle(docs):
    plan = (
        SAMP.weighted_mix(docs, {"src0": 0.5}, "source", "doc_id", 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure scan-stage filter
