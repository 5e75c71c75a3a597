"""Round-5 honesty checks: SemDedup over a REAL trained quantizer.

The r4 verdict's one `weak` spot was semdedup_prune seeding centroids as
the 16 lowest-id vectors. These tests pin the replacement: (a) the trained
quantizer's pair-join cost (sum of squared cluster sizes — the thing that
bounds the candidate join at 100 TB) is no worse than the stand-in's, and
(b) prune RECALL against the brute-force all-pairs truth does not regress
vs the stand-in clustering. Both are deterministic — no RNG anywhere in
seeding, assignment, or updates."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


# --- streaming near-dedup gate --------------------------------------------


def _stream_two_batches(spark, df, tmpdir):
    """Replay df as two micro-batches (doc_id parity halves) via the
    canonical staging helper — no re-implemented file dance."""
    from scylla_migrator_spark.plans.queries import _write_half_files

    _write_half_files(
        tmpdir,
        [
            ("0", df.filter(F.col("doc_id") % 2 == 0)),
            ("1", df.filter(F.col("doc_id") % 2 == 1)),
        ],
    )
    schema = spark.read.parquet(tmpdir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmpdir)
        .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    )


def _run_stream(gated):
    from scylla_migrator_spark.plans.queries import _run_available_now

    return _run_available_now(gated, "append")


def test_stream_near_dedup_equals_batch_at_bands_1(spark, tmp_path):
    """The watermark-bounded stream gate must keep exactly one document per
    MinHash-signature group — the batch near_dedup candidate rule at
    bands=1 (any-band == full-signature there). Compared at group level:
    survivor signature sets equal, and batch survivors group-biject with
    stream survivors (keeper identity is arrival-order dependent, the
    group partition is not)."""
    from scylla_migrator_spark.plans.curate import CurationConfig, curate_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    cfg = CurationConfig.from_dict(
        {
            "source": {"type": "parquet", "path": str(tmp_path)},
            "stages": [
                {"op": "near_dedup", "numHashes": 16, "bands": 1,
                 "withinWatermark": "1 hour"},
            ],
        }
    )
    stream = _stream_two_batches(spark, docs, str(tmp_path))
    survivors = _run_stream(curate_stream(stream, cfg).select("doc_id", "text"))

    def sig_keys(frame):
        sig = D.minhash_signature_col(F.col("text"), num_hashes=16)
        key = F.sha2(
            F.concat_ws(",", F.transform(sig, lambda m: m.cast("string"))), 256
        )
        return {r["k"] for r in frame.select(key.alias("k")).collect()}

    # batch: pairwise keeper rule (drop id_b of every candidate pair)
    losers = (
        D.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=16, bands=1)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    batch_survivors = docs.join(losers, "doc_id", "left_anti")

    stream_keys, batch_keys, all_keys = (
        sig_keys(survivors),
        sig_keys(batch_survivors),
        sig_keys(docs),
    )
    assert stream_keys == all_keys  # one survivor per group, no group lost
    assert batch_keys == all_keys
    assert survivors.count() == len(all_keys)


def test_stream_near_dedup_config_validation(spark, tmp_path):
    """withinWatermark is required on streams; missing ts column is a
    decode-time-style ConfigError, not a runtime plan failure."""
    import pytest

    from scylla_migrator_spark.config import ConfigError
    from scylla_migrator_spark.plans.curate import CurationConfig, curate_stream

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a b c", None)], "doc_id long, text string, ts timestamp"
    ).write.parquet(src)
    base = {
        "source": {"type": "parquet", "path": src},
        "stages": [{"op": "near_dedup"}],
    }
    cfg = CurationConfig.from_dict(base)
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    with pytest.raises(ConfigError, match="withinWatermark"):
        curate_stream(stream, cfg)

    cfg2 = CurationConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src},
            "stages": [
                {"op": "near_dedup", "withinWatermark": "1 hour"},
            ],
        }
    )
    no_ts = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(ConfigError, match="event-time"):
        curate_stream(no_ts, cfg2)

    with pytest.raises(ConfigError, match="withinWatermark"):
        CurationConfig.from_dict(
            {
                "source": {"type": "parquet", "path": "/tmp/x"},
                "stages": [{"op": "near_dedup", "withinWatermark": 7}],
            }
        )


# --- cross-corpus LSH with overlapping id spaces --------------------------


def test_cross_corpus_lsh_overlapping_ids_do_not_merge(spark):
    """Two DIFFERENT documents sharing an id across corpora must keep
    separate signatures (side-salted internal key): doc 1 in A matches doc
    2 in B (same text); doc 1 in B is unrelated text and must not pollute
    either signature."""
    from scylla_migrator_spark.analytics.dedup import cross_corpus_lsh_candidates

    same = "alpha beta gamma delta epsilon zeta eta theta " * 4
    other = "one two three four five six seven eight nine ten " * 4
    a = spark.createDataFrame([(1, same)], ["doc_id", "text"])
    b = spark.createDataFrame([(1, other), (2, same)], ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in cross_corpus_lsh_candidates(a, b, "text", "doc_id").collect()
    }
    assert pairs == {(1, 2)}  # A:1 ~ B:2; A:1 !~ B:1 despite the shared id


def test_curation_report_surfaces_near_dedup_semantics(spark, tmp_path):
    """The provenance sidecar must state the pairwise keeper rule for
    near_dedup stages so sidecar consumers know which dedup semantics
    produced the corpus."""
    import json

    from scylla_migrator_spark.plans.curate import CurationConfig, run_curation

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "a b c d e f g h i j k l")],
        "doc_id long, text string",
    ).write.parquet(src)
    cfg = CurationConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src},
            "stages": [
                {"op": "length_filter", "minTokens": 2},
                {"op": "near_dedup", "numHashes": 8, "bands": 2},
            ],
            "target": {"type": "parquet", "path": str(tmp_path / "out")},
        }
    )
    run_curation(spark, cfg)
    report = json.loads((tmp_path / "out" / "_curation_report.json").read_text())
    by_op = {st["op"]: st for st in report["stages"]}
    assert "pairwise-lower-id-keeper" in by_op["near_dedup"]["semantics"]
    assert "semantics" not in by_op["length_filter"]


# --- scale-curve harness --------------------------------------------------


import os as _os

import pytest as _pytest


@_pytest.mark.skipif(
    not _os.environ.get("SGS_SCALE_CURVE"),
    reason="multi-minute 10x-corpus run; set SGS_SCALE_CURVE=1 "
    "(tools/scale_curve.py is the standalone form, results in "
    "SCALE_CURVE.json)",
)
def test_scale_curve_per_row_cost_bounded(spark):
    """Empirical no-hidden-quadratic check: per-row cost of the heaviest
    dedup pipelines must grow <= 2x when the corpus grows ~10x (token-
    salted replication preserves within-copy dup structure, destroys
    cross-copy similarity). The committed SCALE_CURVE.json records the
    sf0.1 ratios; this gated test reruns the harness at sf0.01."""
    import importlib

    sc_mod = importlib.import_module("tools.scale_curve")
    from pyspark.sql import functions as F2

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").head()[0])
    base = "/tmp/sgs_scale_curve_pytest"
    paths = {}
    for tag, c in (("1x", 1), ("10x", 10)):
        dp, ep = f"{base}/docs_{tag}", f"{base}/emb_{tag}"
        sc_mod.scaled_documents(docs, c).write.mode("overwrite").parquet(dp)
        sc_mod.scaled_embeddings(emb, c, dim).write.mode("overwrite").parquet(ep)
        paths[tag] = (dp, ep, c)
    results = {
        tag: sc_mod.run_pipelines(spark, dp, ep, c)
        for tag, (dp, ep, c) in paths.items()
    }
    for name in results["1x"]:
        ratio = results["10x"][name]["us_per_row"] / results["1x"][name]["us_per_row"]
        assert ratio <= 2.0, (name, ratio, results["10x"][name], results["1x"][name])


# --- dim-scalable centroid / PC updates -----------------------------------


def test_kmeans_and_top_pc_train_at_dim_512(spark):
    """The posexplode update forms must handle production embedding dims:
    a dim-512 synthetic table trains k-means and runs a power-iteration
    pass as ONE aggregation each (the per-dimension aggregate-list form
    stopped being plannable around here)."""
    from scylla_migrator_spark.analytics.linalg import power_iteration_top_pc

    dim = 512
    df = spark.range(0, 120).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {dim - 1}), "
        "j -> cast(pmod(xxhash64(id, j), 1000) AS double) / 1000.0) AS embedding",
    )
    cents = SIM.kmeans_centroids(df, n_centroids=4, iters=1)
    assert len(cents) == 4 and all(len(c) == dim for c in cents)
    # update actually moved the centroids off their seeds
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in df.orderBy("vec_id").limit(4).collect()
    ]
    assert cents != seeds

    pc = power_iteration_top_pc(df, "embedding", iters=1, dim=dim)
    assert len(pc) == dim
    # components are rounded to 6 dp, so the norm drifts ~dim * 1e-12
    assert abs(sum(c * c for c in pc) - 1.0) < 1e-4


# --- review-fix regressions ------------------------------------------------


def test_semdedup_tolerates_null_and_ragged_vectors(spark):
    """Rows with a null vector, null elements, or mismatched dims must flow
    through (kept) without crashing the Arrow pair scorer — the behavior
    the inline null-propagating cosine gave before the numpy rewrite."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.001]),        # near-dup of 1 -> pruned
        (3, None),                 # null vector
        (4, [1.0, None]),          # null element
        (5, [1.0, 0.0, 0.0]),      # ragged dim
        (6, [0.0, 0.0]),           # zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in
           D.semdedup(df, "vec_id", "embedding", [[1.0, 0.0]], tau=0.9).collect()}
    assert out[2] is False           # the only true prune
    assert all(out[k] for k in (1, 3, 4, 5, 6))


def test_lit_vec_and_ivf_assign_tolerate_non_finite(spark):
    """NaN/inf vector values have no SQL literal spelling; the fast parsed
    form must fall back to per-element literals instead of raising
    ParseException at plan build."""
    import math

    df = spark.range(1)
    v = df.select(SIM.lit_vec([1.0, float("nan"), float("inf")]).alias("v")).head()["v"]
    assert v[0] == 1.0 and math.isnan(v[1]) and math.isinf(v[2])

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = SIM.ivf_assign(emb, [[float("nan"), 0.0], [0.0, 1.0]]).collect()
    assert len(out) == 2  # plans and runs; NaN centroid scores never win


def test_hadoop_pathio_usable_from_background_thread(spark, tmp_path):
    """for_path binds the resolved SparkSession onto the returned instance:
    getActiveSession is thread-local, and savepoint dumps run on plain
    background threads (PeriodicDumper) — IO must keep working there."""
    import threading

    from scylla_migrator_spark import pathio

    io = pathio.HadoopPathIO(spark)
    p = f"file:{tmp_path}/bg"
    io.create_directories(p)
    errors = []

    def work():
        try:
            io.write_utf8_atomically(io.join(p, "x.txt"), b"bg")
            assert io.read_utf8(f"{p}/x.txt") == "bg"
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    t = threading.Thread(target=work)
    t.start()
    t.join()
    assert errors == []


def test_stream_ivf_ingest_layout_probes_equal_adhoc(spark, tmp_path):
    """The stream-ingested IVF layout must serve partition-pruned probes
    with exactly the ad-hoc (assign-per-query) results — index maintenance
    cannot change answers."""
    import tempfile

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = SIM.kmeans_centroids(emb, 8, 1)
    stage = str(tmp_path / "halves")
    from scylla_migrator_spark.plans.queries import _write_half_files

    _write_half_files(
        stage,
        [
            ("0", emb.filter(F.col("vec_id") % 2 == 0)),
            ("1", emb.filter(F.col("vec_id") % 2 == 1)),
        ],
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    layout = str(tmp_path / "ivf")
    q = SIM.ingest_ivf_stream(
        stream, cents, layout, tempfile.mkdtemp(prefix="ckpt_")
    )
    q.awaitTermination()

    qv = [float(x) for x in emb.filter("vec_id = 3").head()["embedding"]]
    served = SIM.ivf_topk_partitioned(spark, layout, cents, qv, k=5, nprobe=3)
    adhoc = SIM.ivf_topk(emb, qv, k=5, n_centroids=8, nprobe=3, centroids=cents)
    assert [tuple(r) for r in served.collect()] == [tuple(r) for r in adhoc.collect()]


def test_doc_clusters_group_similar_texts(spark):
    """Sanity beyond the oracle: duplicated texts must land in the same
    cluster (identical vectors -> identical argmax)."""
    from scylla_migrator_spark.analytics import text as TXT

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    emb = docs.select(
        "doc_id",
        TXT.hashed_bow_embedding(F.col("text"), dim=16).cast("array<double>").alias("v"),
    )
    cents = SIM.kmeans_centroids(emb, 4, 1, "doc_id", "v")
    assigned = SIM.ivf_assign(emb, cents, "doc_id", "v")
    joined = (
        docs.join(assigned.select("doc_id", "centroid_id"), "doc_id")
        .groupBy("text")
        .agg(F.count_distinct("centroid_id").alias("n_clusters"))
    )
    assert joined.filter("n_clusters > 1").count() == 0


def test_levenshtein_qgram_filter_loses_no_pairs(spark):
    """The q-gram count filter + short-fringe paths must find exactly the
    unblocked pair set: short keys (all-pairs fringe), a short-vs-long
    border pair, and randomized long keys with 1-3 scattered edits."""
    from scylla_migrator_spark.plans import queries as Q

    rows = [
        (1, "s", "abcdefg"),        # len 7 (band 1)
        (2, "s", "abcdefgh"),       # len 8 (band 2) -> dist 1 across bands
        (3, "s", "abcdefg!"),       # dist 1 to #2, dist 1 to #1
        (4, "s", "zzzzzzzz"),       # far from all
        (5, "t", "abcdefg"),        # other source: never paired
    ]
    import os
    import tempfile

    src = tempfile.mkdtemp(prefix="sgs_lev_")
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "documents.parquet"))
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in Q.QUERIES["levenshtein_near_pairs"](spark, src).collect()
    }
    assert out == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_levenshtein_qgram_filter_randomized_vs_unblocked(spark):
    """Randomized differential check: 80 long keys (> 16 chars) with 0-4
    random edits applied to copies; the filtered pipeline's pair set must
    equal the brute-force unblocked definition."""
    import os
    import random
    import tempfile

    from scylla_migrator_spark.plans import queries as Q

    rng = random.Random(20260814)
    alpha = "abcdefgh"
    rows, did = [], 0
    for _ in range(40):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(18, 40)))
        rows.append((did, "s", base)); did += 1
        # a mutated copy with 0-4 edits (insert/delete/substitute)
        m = list(base)
        for _ in range(rng.randint(0, 4)):
            op = rng.choice("ids")
            pos = rng.randrange(len(m)) if m else 0
            if op == "i":
                m.insert(pos, rng.choice(alpha))
            elif op == "d" and m:
                m.pop(pos)
            else:
                m[pos] = rng.choice(alpha)
        rows.append((did, "s", "".join(m))); did += 1
    src = tempfile.mkdtemp(prefix="sgs_lev_rand_")
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "documents.parquet"))

    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in Q.QUERIES["levenshtein_near_pairs"](spark, src).collect()
    }
    keys = {r[0]: r[2][:32].lower() for r in rows}
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {}
    for x, y in itertools.combinations(sorted(keys), 2):
        d = lev(keys[x], keys[y])
        if d <= 3:
            want[(x, y)] = d
    assert got == want


# --- stop-gram-capped edit-distance filter --------------------------------


def _lev_pairs_bruteforce(rows, k_max=3):
    """Unblocked definition: same-partition pairs within k_max edits."""
    import itertools

    def lev(a, b):
        if abs(len(a) - len(b)) > k_max:
            return k_max + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for (ia, pa, ka), (ib, pb, kb) in itertools.combinations(rows, 2):
        if pa != pb:
            continue
        d = lev(ka, kb)
        if d <= k_max:
            out.add((min(ia, ib), max(ia, ib), d))
    return out


def test_edit_distance_cap_is_lossless_when_shared_mass_is_all_hot(spark):
    """Adversarial stop-gram corpus: the target near-pair's q-gram mass is
    entirely 'aaaa' grams that the cap drops from the index. The pair can
    never meet in the visible join — only the per-string dropped-budget
    fringe can save it. The capped output must still equal the unblocked
    definition."""
    hot = "a" * 19  # 16 'aaaa' occurrences, all hot at cap=4
    rows = [(1, "s", hot + "b"), (2, "s", hot + "c")]  # dist 1, all-hot mass
    # enough distinct strings carrying the hot gram to push every
    # ('s','aaaa',occ) bucket over the cap
    rows += [(10 + i, "s", hot + f"-tail{i:02d}xyz"[: 32 - 19]) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string, key string")
    got = {
        tuple(r)
        for r in D.edit_distance_pairs(
            df, q=4, k_max=3, max_key_freq=4
        ).collect()
    }
    want = _lev_pairs_bruteforce(rows)
    assert (1, 2, 1) in want  # the adversarial pair really is a near-pair
    assert got == want


def test_edit_distance_cap_relaxed_bound_keeps_partial_hot_pairs(spark):
    """Strings with a hot PREFIX but informative tails stay on the
    filtered path (budget not exhausted); the least(drop_a, drop_b) bound
    relaxation must keep their pairs."""
    pre = "the " * 3  # 12-char hot prefix shared by everyone
    rows = [
        (1, "s", pre + "quick brown fox jump"),
        (2, "s", pre + "quick brown fox jumq"),  # dist 1 from doc 1
    ]
    rows += [(10 + i, "s", pre + f"unrelated tail {i:03d} word") for i in range(12)]
    rows = [(i, p, k[:32]) for i, p, k in rows]
    df = spark.createDataFrame(rows, "doc_id long, source string, key string")
    got = {
        tuple(r)
        for r in D.edit_distance_pairs(df, q=4, k_max=3, max_key_freq=4).collect()
    }
    want = _lev_pairs_bruteforce(rows)
    assert (1, 2, 1) in want
    assert got == want


def test_edit_distance_capped_matches_uncapped_on_fixture(spark, sf_dir):
    """On the real fixture corpus the cap fires (boilerplate prefixes are
    hot at max_key_freq=8) yet the pair set is unchanged — the machine
    check behind levenshtein_capped_pairs' oracle claim."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keys = docs.select(
        "doc_id",
        "source",
        F.lower(F.substring("text", 1, 32)).alias("key"),
    )
    uncapped = {
        tuple(r)
        for r in D.edit_distance_pairs(keys, q=4, k_max=3, max_key_freq=None).collect()
    }
    capped = {
        tuple(r)
        for r in D.edit_distance_pairs(keys, q=4, k_max=3, max_key_freq=8).collect()
    }
    assert capped == uncapped


def test_edit_distance_capped_randomized_differential(spark):
    """Seeded randomized differential: 24 adversarial corpora (tiny
    alphabet -> dense near-pairs, extreme stop-grams, empty/short/border
    keys) batched into ONE edit_distance_pairs call by encoding the
    corpus id in the partition column, compared corpus-by-corpus against
    the brute-force unblocked definition."""
    import random

    rng = random.Random(20260814)
    rows = []
    next_id = 0
    for c in range(24):
        alphabet = rng.choice(["ab", "abc", "ab "])
        for _ in range(rng.randint(5, 20)):
            klen = rng.choice([0, 1, rng.randint(2, 15), rng.randint(16, 32)])
            key = "".join(rng.choice(alphabet) for _ in range(klen))
            rows.append((next_id, f"p{c}", key))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, key string")
    got = {
        tuple(r)
        for r in D.edit_distance_pairs(df, q=4, k_max=3, max_key_freq=3).collect()
    }
    want = _lev_pairs_bruteforce(rows)
    assert want  # the corpora really produce near-pairs
    assert got == want


# --- prefix-filter Jaccard and winnowing properties -----------------------


def test_jaccard_prefix_randomized_differential(spark):
    """Seeded randomized differential for the prefix-filter join: small
    vocabularies force hot tokens (which the prefix order must exclude
    without losing pairs) and dense near-dup structure. Compared against
    brute-force token-set Jaccard per partition."""
    import itertools
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    next_id = 0
    for c in range(10):
        for _ in range(rng.randint(4, 12)):
            n = rng.randint(1, 10)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            rows.append((next_id, f"p{c}", text))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in D.jaccard_prefix_pairs(
            df, "text", "doc_id", block_col="source"
        ).collect()
    }
    want = set()
    for (ia, pa, ta), (ib, pb, tb) in itertools.combinations(rows, 2):
        if pa != pb:
            continue
        sa, sb = set(ta.split()), set(tb.split())
        inter = len(sa & sb)
        if inter * 2 >= (len(sa) + len(sb) - inter):
            want.add((min(ia, ib), max(ia, ib)))
    assert want  # the corpora really produce qualifying pairs
    assert got == want


def test_winnowing_shared_run_guarantee(spark):
    """The winnowing guarantee: two documents sharing a verbatim run of
    >= window + k - 1 tokens (here 6) MUST share at least one selected
    fingerprint — the property MinHash/SimHash sampling cannot promise.
    Randomized: a planted 6-token run inside otherwise-disjoint noise."""
    import random

    rng = random.Random(7)
    rows = []
    expected_pairs = set()
    for c in range(12):
        run = " ".join(f"shared{c}_{i}" for i in range(6))
        pre_a = " ".join(f"na{c}_{i}" for i in range(rng.randint(0, 8)))
        post_b = " ".join(f"nb{c}_{i}" for i in range(rng.randint(0, 8)))
        rows.append((2 * c, "s", f"{pre_a} {run}".strip()))
        rows.append((2 * c + 1, "s", f"{run} {post_b}".strip()))
        expected_pairs.add((2 * c, 2 * c + 1))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in D.winnowing_pairs(
            df, "text", "doc_id", "source", k=3, window=4
        ).collect()
    }
    assert expected_pairs <= got  # every planted run is detected


def test_overlap_pairs_capped_consistent_universe(spark):
    """With the stop-shingle cap engaged, overlap is computed over the
    RETAINED-shingle universe consistently: two identical documents keep
    overlap 1.0 (both lose the same hot shingles), and a doc sharing
    ONLY the hot boilerplate with others pairs with nobody."""
    boiler = "this license header is identical everywhere ok"
    rows = [(i, "s", boiler + f" unique tail {i} x y z") for i in range(10)]
    rows += [(100, "s", "alpha beta gamma delta epsilon zeta"),
             (101, "s", "alpha beta gamma delta epsilon zeta")]  # identical
    rows += [(200, "s", boiler)]  # pure boilerplate
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in D.overlap_pairs(
            df, "text", "doc_id", "source", n=3,
            threshold_num=4, threshold_den=5, max_doc_freq=3,
        ).collect()
    }
    assert got.get((100, 101)) == 1.0
    assert not any(200 in pair for pair in got)


def test_kneser_ney_matches_pure_python_reference(spark):
    """kneser_ney_bigram at min_count=1 pinned bigram-for-bigram against a
    direct pure-Python implementation of Chen & Goodman eq. 4.25, and the
    interpolated-KN mass identity: for each w1, the emitted probabilities
    plus the backoff mass routed to unseen continuations sum to exactly 1."""
    from scylla_migrator_spark.analytics import text as TXT

    corpus = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "the cat and the dog sat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["p_kn"])
        for r in TXT.kneser_ney_bigram(df, "text", min_count=1).collect()
    }

    # pure-Python reference
    from collections import Counter

    d = 0.75
    bigrams = Counter()
    for t in corpus:
        w = t.split()
        for i in range(len(w) - 1):
            bigrams[(w[i], w[i + 1])] += 1
    cp = Counter()
    n_fwd = Counter()
    n_bwd = Counter()
    for (w1, w2), c in bigrams.items():
        cp[w1] += c
        n_fwd[w1] += 1
        n_bwd[w2] += 1
    nbig = len(bigrams)
    for (w1, w2), c in bigrams.items():
        want = (c - d) / cp[w1] + d * n_fwd[w1] / cp[w1] * n_bwd[w2] / nbig
        assert got[(w1, w2)][0] == c
        assert abs(got[(w1, w2)][1] - want) < 1e-6, (w1, w2)
    assert set(got) == set(bigrams)

    # mass identity: observed mass + backoff-to-unseen mass == 1 per context
    for w1 in cp:
        obs = sum(
            (c - d) / cp[w1] + d * n_fwd[w1] / cp[w1] * n_bwd[w2] / nbig
            for (a, w2), c in bigrams.items()
            if a == w1
        )
        unseen = (
            d
            * n_fwd[w1]
            / cp[w1]
            * (1 - sum(n_bwd[w2] for (a, w2) in bigrams if a == w1) / nbig)
        )
        assert abs(obs + unseen - 1.0) < 1e-12, w1


def test_distribution_distance_identical_groups_zero_shift_exact(spark):
    """distribution_distance_diag: two groups drawn identically give
    distance 0; shifting one group by delta in every dimension gives
    exactly dims * delta^2 (means shift, variances unchanged)."""
    import random

    rng = random.Random(7)
    dims, n = 6, 40
    base = [[rng.uniform(-1, 1) for _ in range(dims)] for _ in range(n)]
    delta = 0.5
    rows = (
        [(0, v) for v in base]
        + [(1, list(v)) for v in base]
        + [(2, [x + delta for x in v]) for v in base]
    )
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        (r["label_a"], r["label_b"]): r["fid_diag"]
        for r in SIM.distribution_distance_diag(df).collect()
    }
    assert got[(0, 1)] == 0.0
    # float32 ingestion + decimal truncation keep ~1e-4 of dims*delta^2
    assert abs(got[(0, 2)] - dims * delta * delta) < 1e-3
    assert abs(got[(1, 2)] - dims * delta * delta) < 1e-3


def test_containment_pairs_lossless_and_directed(spark):
    """The probe-side prefix filter must lose nothing vs the direct
    pairwise definition, and containment is DIRECTED: the excerpt is
    contained in the page, not vice versa."""
    from scylla_migrator_spark.analytics.dedup import containment_pairs

    page = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10, 20))  # fully inside page
    rows = [
        (1, "s", page),
        (2, "s", excerpt),
        (3, "s", " ".join(f"z{i}" for i in range(12))),  # unrelated
        (4, "other", excerpt),  # same text, different block: no pair
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            df, "text", "doc_id", "source", threshold_num=9, threshold_den=10
        ).collect()
    }
    assert got == {(2, 1): 1.0}  # excerpt -> page only, directed

    # brute-force cross-check at a looser threshold on richer data
    import itertools

    rows2 = [
        (i, "s", " ".join(f"w{j}" for j in range(i, i + 12))) for i in range(8)
    ]
    df2 = spark.createDataFrame(rows2, ["doc_id", "source", "text"])
    got2 = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(
            df2, "text", "doc_id", "source", threshold_num=3, threshold_den=4
        ).collect()
    }
    toks = {i: set(t.split()) for i, _, t in rows2}
    want2 = {
        (a, b)
        for a, b in itertools.permutations(toks, 2)
        if len(toks[a] & toks[b]) * 4 >= len(toks[a]) * 3
    }
    assert got2 == want2
