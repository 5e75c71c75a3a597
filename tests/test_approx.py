"""Accuracy bounds for the approximate aggregates (rows-only in the driver
gate; here we pin them against exact answers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.plans import queries as Q


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    row = Q.QUERIES["approx_aggregates"](spark, sf_dir).head()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact_users = events.select("user_id").distinct().count()
    exact_p50, exact_p99 = events.selectExpr(
        "percentile(value, 0.5)", "percentile(value, 0.99)"
    ).head()
    assert abs(row["approx_users"] - exact_users) <= max(2, 0.03 * exact_users)
    assert abs(row["p50_value"] - exact_p50) <= 0.05 * (abs(exact_p50) + 1)
    assert abs(row["p99_value"] - exact_p99) <= 0.05 * (abs(exact_p99) + 1)


def test_fake_features_deterministic(spark, sf_dir):
    df = Q.QUERIES["multimodal_fake_features"](spark, sf_dir)
    a = {r["asset_id"]: r["f0_scaled"] for r in df.collect()}
    b = {r["asset_id"]: r["f0_scaled"] for r in df.collect()}
    assert a == b
    # f0_scaled = round(f0 * 1e6): md5-derived unit-interval feature, scaled
    assert all(0 <= v <= 1_000_000 for v in a.values())


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from scylla_migrator_spark.analytics import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 7").head()["embedding"]]
    exact = {r["vec_id"] for r in SIM.brute_force_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in SIM.ivf_topk(emb, qv, k=10).collect()}
    # IVF probes 4/16 partitions; recall@10 must stay useful
    assert len(exact & approx) >= 5
