"""Accuracy bounds for the approximate aggregates (rows-only in the driver
gate; here we pin them against exact answers)."""

from __future__ import annotations

import pytest

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


def test_quantize_int8_roundtrip_error_bounded(spark):
    """Reconstruction x~ = qmin + code*qscale/255 must be within half a
    quantization step of the original for every element (plus the <=1e-6
    slack from qmin/qscale being rounded to 6 dp for oracle determinism)."""
    from scylla_migrator_spark.analytics.similarity import quantize_int8
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_int8(emb, "vec_id", "embedding")
    joined = emb.join(q, "vec_id").select(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.transform("codes", lambda c: F.col("qmin") + c * F.col("qscale") / 255),
            lambda x, r: F.abs(x - r),
        ).alias("err"),
        (F.col("qscale") / 255 / 2 + 2e-6).alias("half_step"),
    )
    bad = joined.filter(F.array_max("err") > F.col("half_step")).count()
    assert bad == 0


def test_knn_graph_is_symmetric_on_mutual_neighbors(spark):
    """Every vector gets exactly k neighbors (blocks are larger than k) and
    neighbor ranks are 1..k with no duplicates."""
    from scylla_migrator_spark.analytics.similarity import knn_graph
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    g = knn_graph(emb, "vec_id", "embedding", "label", k=3)
    per = g.groupBy("vec_id").agg(
        F.count("*").alias("n"), F.collect_set("rank").alias("ranks")
    )
    assert per.filter("n <> 3").count() == 0
    assert per.filter(F.array_sort("ranks") != F.array(F.lit(1), F.lit(2), F.lit(3))).count() == 0


def test_sketch_merge_distinct_within_tolerance(spark, sf_dir):
    row = Q.QUERIES["sketch_merge_distinct"](spark, sf_dir).head()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = events.select("user_id").distinct().count()
    assert row["n_groups"] == events.select("event_type").distinct().count()
    assert row["total_events"] == events.count()
    assert abs(row["approx_distinct_users"] - exact) <= max(2, 0.03 * exact)


@pytest.mark.slow
def test_ivf_kmeans_recall_beats_seed_standin(spark):
    """The Lloyd's-trained centroids (iters=2) must give average recall@10
    at least as good as the old lowest-16-id stand-in (iters=0) over a
    fixed query panel — the honesty check for the IVF training step.
    Deterministic: no RNG anywhere in seeding, assignment, or updates."""
    import math

    from scylla_migrator_spark.analytics import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    queries = [0, 7, 42, 123, 200, 314, 400, 451]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(queries)).collect()
    }

    def cos_py(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    def total_recall(iters):
        cents = SIM.kmeans_centroids(emb, 16, iters)
        assigned = SIM.ivf_assign(emb, cents).cache()
        hits = 0
        for q in queries:
            qv = qvecs[q]
            probe = sorted(range(16), key=lambda i: -cos_py(cents[i], qv))[:4]
            exact = {r["vec_id"] for r in SIM.brute_force_topk(emb, qv, k=10).collect()}
            approx = {
                r["vec_id"]
                for r in SIM.brute_force_topk(
                    assigned.filter(F.col("centroid_id").isin(probe)), qv, k=10
                ).collect()
            }
            hits += len(exact & approx)
        assigned.unpersist()
        return hits

    standin, kmeans = total_recall(0), total_recall(2)
    assert kmeans >= standin
    assert kmeans >= 0.65 * 10 * len(queries)  # avg recall@10 >= 6.5
    emb.unpersist()


def test_pq_codes_match_per_subspace_ivf_assign(spark, sf_dir):
    """pq_assign is definitionally the per-subspace ivf_assign: encoding
    with the trained codebooks must equal slicing the vector and running
    the coarse assignment per subspace."""
    from pyspark.sql import functions as F

    from scylla_migrator_spark.analytics import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = SIM.pq_codebooks(emb, m=4, k=4, iters=1)
    got = {
        r["vec_id"]: [r[f"code_{s}"] for s in range(4)]
        for r in SIM.pq_assign(emb, books).collect()
    }
    assert got, "empty encode"
    v = F.col("embedding").cast("array<double>")
    for s in range(4):
        sliced = emb.select("vec_id", F.slice(v, s * 16 + 1, 16).alias("v"))
        want = {
            r["vec_id"]: r["centroid_id"]
            for r in SIM.ivf_assign(sliced, books[s], "vec_id", "v").collect()
        }
        assert {k: c[s] for k, c in got.items()} == want, f"subspace {s}"
    # codes land in [0, k)
    assert all(0 <= c < 4 for cs in got.values() for c in cs)


@pytest.mark.slow
def test_pq_adc_recall_beats_random(spark, sf_dir):
    """ADC@10 with m=4,k=4 (a 6-bit-ish code) is crude, but the approximate
    ranking must still be far better than chance: the exact cosine top-10
    should overlap the ADC top-30 head well above the random baseline
    (30/2000)."""
    from pyspark.sql import functions as F

    from scylla_migrator_spark.analytics import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    books = SIM.pq_codebooks(emb, m=4, k=4, iters=2)
    adc = {r["vec_id"] for r in SIM.pq_adc_topk(emb, books, qv, k=30).collect()}
    exact = [r["vec_id"] for r in SIM.brute_force_topk(emb, qv, k=10).collect()]
    recall = sum(1 for v in exact if v in adc) / len(exact)
    n = emb.count()
    random_expect = 30 / n
    assert recall >= 0.3, (recall, random_expect)
    assert recall > 2 * random_expect, (recall, random_expect)
