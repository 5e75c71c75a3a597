"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: one broadcast of the
  query vector, one narrow projection, one global top-k (``orderBy+limit`` =
  per-partition top-k then driver merge via TakeOrderedAndProject — no full
  sort, no shuffle of the data).
* LSH-bucketed variant — random-hyperplane signatures; candidate set =
  bucket-equality join, then exact cosine re-rank of candidates only. This is
  the 100 TB path: the expensive exact cosine runs on a tiny candidate set.

All vector math is ``zip_with`` + ``aggregate`` over array<double> — JVM-side,
no UDF; deterministic left-to-right summation makes results oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def lit_vec(values: list[float]) -> Column:
    """Literal array<double> built as ONE parsed SQL expression instead of
    one py4j ``F.lit`` call per element — at dims 64-4096 the per-element
    form spends ~0.5 s of DRIVER time per vector on Python/py4j Column
    construction alone (measured: 18x slower than one parse). ``repr``
    round-trips doubles exactly (shortest-repr guarantee) and the ``D``
    suffix pins the SQL literal type, so the resulting Literal is
    bit-identical to the per-element form. Non-finite values have no SQL
    double-literal spelling (``repr`` gives unparseable ``nan``/``inf``),
    so those fall back to the per-element ``F.lit`` form — slower, but a
    NaN-carrying vector must not become a ParseException."""
    import math

    vals = [float(x) for x in values]
    if not all(math.isfinite(x) for x in vals):
        return F.array(*[F.lit(x) for x in vals])
    return F.expr("array(" + ",".join(repr(x) + "D" for x in vals) + ")")


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Ties broken by id for determinism. Output: (id, cos)."""
    q = lit_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


# deterministic pseudo-random hyperplanes: coefficient (i, j) derived from
# md5 so any engine can reproduce them
def _plane_coeff(plane: int, dim: int) -> list[float]:
    import hashlib

    coeffs = []
    for j in range(dim):
        h = int(hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[:8], 16)
        coeffs.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
    return coeffs


def lsh_bucket(vec: Column, dim: int, planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^planes-1) as int."""
    bucket = F.lit(0)
    for p in range(planes):
        coeffs = lit_vec(_plane_coeff(p, dim))
        side = (dot(vec.cast("array<double>"), coeffs) >= 0).cast("int")
        bucket = bucket * 2 + side
    return bucket


def query_lsh_bucket(query_vec: list[float], planes: int = 6) -> int:
    """The query vector's LSH bucket, computed driver-side with the SAME
    deterministic hyperplanes as :func:`lsh_bucket`."""
    qb = 0
    for p in range(planes):
        coeffs = _plane_coeff(p, len(query_vec))
        side = 1 if sum(c * float(v) for c, v in zip(coeffs, query_vec)) >= 0 else 0
        qb = qb * 2 + side
    return qb


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    This one-off form computes every row's bucket per query — fine for a
    single ad-hoc probe. For repeated queries at scale, materialize the
    layout once with :func:`write_lsh_bucketed` and probe with
    :func:`lsh_topk_bucketed`, which partition-prunes to 1 of 2^planes
    directories instead of rescanning the table."""
    dim = len(query_vec)
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), dim, planes).alias("bkt")
    )
    candidates = bucketed.filter(F.col("bkt") == query_lsh_bucket(query_vec, planes))
    return brute_force_topk(candidates, query_vec, id_col, vec_col, k)


def write_lsh_bucketed(
    df: DataFrame,
    path: str,
    dim: int,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus hive-partitioned by LSH bucket id.

    One pass computes each vector's bucket and writes
    ``path/bkt=<id>/...``; 2^planes directories. Repeated ANN probes then
    read exactly one partition (see :func:`lsh_topk_bucketed`) — the
    amortized layout that makes hyperplane LSH viable at 100 TB. The
    pre-write repartition clusters each bucket into one file instead of
    num_input_partitions small files per bucket dir."""
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), dim, planes).alias("bkt")
    )
    bucketed.repartition(F.col("bkt")).write.mode("overwrite").partitionBy("bkt").parquet(path)


def lsh_topk_bucketed(
    spark,
    path: str,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 6,
) -> DataFrame:
    """Probe a :func:`write_lsh_bucketed` layout: the bucket-id filter is a
    PARTITION filter, so Catalyst prunes all but 1 of 2^planes directories
    at planning time — no per-row bucket recompute, no full scan."""
    df = spark.read.parquet(path).filter(
        F.col("bkt") == query_lsh_bucket(query_vec, planes)
    )
    return brute_force_topk(df, query_vec, id_col, vec_col, k)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (max cosine). The centroid list is small (broadcast as literals); the
    argmax is one array expression — no join, no shuffle. At 100 TB, write
    the table partitioned by ``centroid_id`` so probes prune partitions.

    Two expression-level choices that halve-and-halve the per-row work:
    - argmax over ``dot(v, c)/|c|`` instead of full cosine — ``|v|`` is a
      common positive factor across centroids, so it cannot change the
      argmax and is never computed (|c| folds to a Python constant).
    - the score array is consumed exactly ONCE by a fold that carries
      (best_score, best_index); the naive
      ``array_position(sims, array_max(sims))`` references ``sims`` twice
      and Spark re-inlines the whole 16-cosine computation per reference."""
    v = F.col(vec_col).cast("array<double>")
    best = nearest_centroid_expr(v, centroids)
    return df.select(F.col(id_col), F.col(vec_col), best.cast("int").alias("centroid_id"))


def nearest_centroid_expr(v: Column, centroids: list[list[float]]) -> Column:
    """The argmax-centroid COLUMN EXPRESSION behind ivf_assign (and, per
    subspace, pq_assign): index of the centroid maximizing dot(v, c)/|c|.

    Two expression-level choices that halve-and-halve the per-row work:
    - argmax over ``dot(v, c)/|c|`` instead of full cosine — ``|v|`` is a
      common positive factor across centroids, so it cannot change the
      argmax and is never computed (|c| folds to a Python constant).
    - the score array is consumed exactly ONCE by a fold that carries
      (best_score, best_index); the naive
      ``array_position(sims, array_max(sims))`` references ``sims`` twice
      and Spark re-inlines the whole 16-cosine computation per reference.
    The centroid MATRIX is one literal expression and the scores come
    from ONE zip_with lambda instead of k separate dot-fold expressions:
    every k-means iteration plans a FRESH expression (new centroid
    literals), and Catalyst analysis/optimization of the per-centroid
    fold list costs ~2x the collapsed form (measured; results
    bit-identical — same product order, division after the fold)."""
    import math

    if all(math.isfinite(float(x)) for c in centroids for x in c):
        mat = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
                for c in centroids
            )
            + ")"
        )
    else:
        # non-finite centroid values have no SQL literal spelling;
        # lit_vec's per-element fallback keeps the plan buildable
        mat = F.array(*[lit_vec(c) for c in centroids])
    norms = lit_vec([(math.sqrt(sum(x * x for x in c)) or 1.0) for c in centroids])
    sims = F.zip_with(mat, norms, lambda c, n: dot(v, c) / n)
    pairs = F.zip_with(
        sims,
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda s, i: F.struct(s.alias("s"), i.alias("i")),
    )
    return F.aggregate(
        pairs,
        F.struct(F.lit(float("-inf")).alias("s"), F.lit(-1).alias("i")),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
    )["i"]


def _cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the same left-to-right summation order as the
    engine-side fold — shared by every probe-selection path so they can
    never diverge."""
    import math

    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb) if na and nb else 0.0


def _probe_centroids(
    centroids: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` centroid indices nearest the query (cosine, ties by
    index) — the single probe-selection rule for both IVF paths."""
    return sorted(
        range(len(centroids)), key=lambda i: -_cos_py(centroids[i], query_vec)
    )[:nprobe]


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's k-means over the embedding column, fully
    deterministic so an oracle can replay it:

    - seed: the ``n_centroids`` lowest-id vectors (reproducible, no RNG);
    - assignment: :func:`ivf_assign` (argmax dot/|c|, the cosine argmax);
    - update: per-(centroid, dim) mean with DECIMAL(18,9) partial sums —
      an associative-exact reduction, so the result is independent of
      shuffle order — rounded to 6 places (the cross-engine-stable form
      used throughout, cf. ``embedding_centroids``); empty clusters keep
      their previous centroid.

    Per iteration: one pass over the data (posexplode to (centroid, dim)
    then ONE map-side-combined aggregation — the shuffle carries
    n_centroids*dim partial sums per partition, and the plan stays a
    single aggregate expression at any dimension) and a collect of
    ``n_centroids * dim`` small rows. At 100 TB,
    ``iters`` passes is the genuine cost of IVF training; train on a
    deterministic sample (``pmod(xxhash64(id), s) = 0``) if even that is
    too much."""
    cent_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in cent_rows]
    dim = len(centroids[0])
    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col)
        # dim-scalable update: posexplode to (centroid, dim) and run ONE
        # aggregate expression instead of a dim-length aggregate list —
        # at production dims (768-4096) the per-dimension expression list
        # stops being plannable, while the exploded groupBy partial-aggs
        # map-side so the shuffle still carries n_centroids*dim partial
        # sums per partition, nothing row-shaped. Decimal partial sums
        # keep the reduction associative-exact (shuffle-order independent),
        # so the result is bit-identical to the per-dim-aggregate form.
        rows = (
            assigned.select(F.col("centroid_id"), F.posexplode(v).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.round(
                    F.sum(F.col("x").cast("decimal(18,9)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("m")
            )
            .collect()
        )
        means: dict[int, list[float]] = {}
        for r in rows:
            means.setdefault(r["centroid_id"], [0.0] * dim)[r["pos"]] = r["m"]
        centroids = [means.get(c, centroids[c]) for c in range(n_centroids)]
    return centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` centroid partitions
    nearest to the query, exact cosine re-rank inside them.

    Centroids come from :func:`kmeans_centroids` (deterministic Lloyd's,
    seeded from the ``n_centroids`` lowest ids) unless a pre-trained list
    is passed — the build-once path: train the quantizer once, share it
    across probes/consumers. The plan shape
    (assign -> partition-prune -> re-rank) is the production path — at
    100 TB, write the table partitioned by ``centroid_id`` once and the
    probe filter prunes to ``nprobe`` directories."""
    if centroids is None:
        centroids = kmeans_centroids(df, n_centroids, iters, id_col, vec_col)
    probe = _probe_centroids(centroids, query_vec, nprobe)
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    candidates = assigned.filter(F.col("centroid_id").isin(probe))
    return brute_force_topk(candidates, query_vec, id_col, vec_col, k)


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus hive-partitioned by ``centroid_id`` — the IVF
    index layout the ad-hoc :func:`ivf_topk` docstring promises at scale:
    assignment runs ONCE at build time, and every subsequent probe
    partition-prunes to ``nprobe`` of ``n_centroids`` directories instead of
    recomputing the argmax over the whole table. The pre-write repartition
    clusters each cell into one file (vs num_input_partitions small files
    per cell dir)."""
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    assigned.repartition(F.col("centroid_id")).write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(path)


def ingest_ivf_stream(
    stream_df: DataFrame,
    centroids: list[list[float]],
    path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """STREAMING maintenance of the :func:`write_ivf_partitioned` layout:
    every arriving vector is coarse-quantized by the stateless broadcast
    argmax (no state store — the assignment is a pure projection, so the
    streaming plan has zero stateful operators) and appended into its
    ``centroid_id=`` partition directory by a foreachBatch writer. Probes
    via :func:`ivf_topk_partitioned` keep partition-pruning as the index
    grows; centroids stay fixed between retrain cycles (the standard IVF
    posture — retrain + rebuild is a batch job, ingest is this stream).

    IDEMPOTENT under foreachBatch's at-least-once replay: each micro-batch
    writes under a second ``ingest_batch=<bid>`` partition level with
    DYNAMIC partition overwrite, so a batch replayed after a crash
    overwrites exactly its own partitions instead of appending duplicates
    — the layout always equals the exactly-once batch build. centroid_id
    stays the TOP partition level, so probe filters still prune at the
    first directory level. Returns the started query (callers await/stop
    it)."""
    assigned = ivf_assign(stream_df, centroids, id_col, vec_col)

    def _append(batch_df: DataFrame, bid: int) -> None:
        (
            batch_df.withColumn("ingest_batch", F.lit(int(bid)))
            .repartition(F.col("centroid_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid_id", "ingest_batch")
            .parquet(path)
        )

    return (
        assigned.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ivf_topk_partitioned(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a :func:`write_ivf_partitioned` layout: the centroid-id filter
    is a PARTITION filter, so Catalyst prunes all but ``nprobe`` cell
    directories at planning time — no per-row assignment, no full scan.
    ``centroids`` must be the same list the layout was built with (persist
    them next to the index in production)."""
    probe = _probe_centroids(centroids, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("centroid_id").isin(probe))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector scalar int8 quantization (asymmetric min/max): the standard
    compression step before shipping embeddings to an ANN index — 4x smaller
    than float32, reconstruction x ~= qmin + code * qscale / 255.

    Codes are computed as floor((x - min) / (max - min) * 255 + 0.5), a pure
    IEEE-double expression identical across engines (round-half-up without
    any decimal-representation dependence). Constant vectors (max == min)
    quantize to all-zero codes with qscale 0. One narrow projection: no
    shuffle, no UDF; at 100 TB this fuses into the scan stage."""
    v = F.col(vec_col).cast("array<double>")
    mn, mx = F.array_min(v), F.array_max(v)
    scale = mx - mn
    codes = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.floor((x - mn) / scale * 255 + F.lit(0.5)).cast("int")
        ),
    )
    return df.select(
        F.col(id_col),
        F.round(mn, 6).alias("qmin"),
        F.round(scale, 6).alias("qscale"),
        codes.alias("codes"),
    )


def knn_graph(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Blocked k-nearest-neighbor graph: for every vector, its top-k
    neighbors by cosine within its block (IVF cell / LSH bucket / label) —
    the candidate-generation step for graph-based ANN indexes (HNSW-style
    construction) and for kNN-classifier features.

    Blocking is the scale contract: the self-join is equi-keyed on
    ``block_col`` so work is sum(block_size^2), never corpus^2 — the caller
    chooses the blocking (coarse IVF cells from ivf_assign, or lsh_bucket).
    Vectors are L2-normalized ONCE before the join (O(N·d)), so each pair
    costs a single dot-product fold instead of dot+two norms (O(pairs·d) vs
    O(3·pairs·d) — measured 1.6x end-to-end at sf0.1). Ranking uses the
    cosine ROUNDED to 6 dp with id tie-break, making the neighbor order
    identical across engines (raw float ordering could flip on
    summation-order ulps). Top-k per vector is a window row_number over
    the pair frame — one shuffle on (block), one on (vec_id)."""
    from pyspark.sql import Window

    vd = F.col(vec_col).cast("array<double>")
    # norm is materialized once per ROW below the join (the per-pair
    # projection then costs one dot fold + two multiplies, not three folds)
    v = df.select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        vd.alias("__v"),
        norm(vd).alias("__n"),
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        on=[F.col("a.__blk") == F.col("b.__blk"), F.col(f"a.{id_col}") != F.col(f"b.{id_col}")],
    ).select(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        F.round(
            dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n") * F.col("b.__n")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def distribution_distance_diag(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    id_out: tuple[str, str] = ("label_a", "label_b"),
) -> DataFrame:
    """Diagonal-covariance Fréchet distance between the embedding
    distributions of every group pair (the FID family, Heusel et al.
    2017, restricted to per-dimension variances — the form that stays a
    pure aggregate at any scale):

        d²(A,B) = Σ_d [ (μ_Ad − μ_Bd)² + σ²_Ad + σ²_Bd − 2·sqrt(σ²_Ad·σ²_Bd) ]

    The corpus-slice drift detector in embedding space: how far apart two
    sources/labels/snapshots are as DISTRIBUTIONS, complementing the
    per-pair detectors (embedding_near_dup_pairs) and the scalar JS
    divergence over token space (source_js_divergence).

    Scale shape: ONE posexplode pass -> (group, dim) grid aggregate with
    map-side combine; per-dim sums and sums-of-squares accumulate as
    DECIMAL so the reduction is associative-exact (shuffle-order
    independent). The (group, dim) stats table is k·d rows — the pairwise
    stage is a broadcast self-join on dim, k²·d rows, trivial forever.
    Per-dim terms are computed in IEEE double from exact decimal inputs
    with a fixed expression tree, truncated to DECIMAL(28,12) so the
    final per-pair sum is again order-independent; rounded to 6 dp."""
    a_col, b_col = id_out
    vdec = F.col("v").cast("decimal(18,9)")
    stats = (
        df.select(F.col(group_col).alias("g"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("g", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.count("*").alias("n"),
            F.sum(vdec).alias("sv"),
            F.sum(vdec * vdec).alias("sq"),
        )
        .select(
            "g",
            "dim",
            (F.col("sv").cast("double") / F.col("n")).alias("mu"),
            F.greatest(
                F.col("sq").cast("double") / F.col("n")
                - (F.col("sv").cast("double") / F.col("n"))
                * (F.col("sv").cast("double") / F.col("n")),
                F.lit(0.0),
            ).alias("var"),
        )
    )
    a, b = stats.alias("a"), stats.alias("b")
    term = (
        (F.col("a.mu") - F.col("b.mu")) * (F.col("a.mu") - F.col("b.mu"))
        + F.col("a.var")
        + F.col("b.var")
        - F.lit(2.0) * F.sqrt(F.col("a.var") * F.col("b.var"))
    ).cast("decimal(28,12)")
    pairs = a.join(
        F.broadcast(b),
        on=[F.col("a.dim") == F.col("b.dim"), F.col("a.g") < F.col("b.g")],
    ).select(F.col("a.g").alias(a_col), F.col("b.g").alias(b_col), term.alias("term"))
    return pairs.groupBy(a_col, b_col).agg(
        F.round(F.sum("term").cast("double"), 6).alias("fid_diag")
    )


def pq_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebook training (Jegou et al. TPAMI 2011):
    split the D-dim embedding into ``m`` contiguous subspaces of D/m dims
    and train an independent deterministic Lloyd's k-means
    (:func:`kmeans_centroids` — lowest-id seed, decimal-exact mean
    updates) per subspace. A PQ code compresses a vector to ``m`` small
    ints (here m*2 bits-ish vs D*4 bytes) while distances remain
    computable per-subspace from k*m lookup tables — THE memory lever for
    billion-vector ANN: at 100 TB of embeddings the raw vectors don't fit
    hot storage, the PQ codes do.

    Returns ``m`` codebooks of ``k`` centroids each. Cost: m * iters
    passes, each identical in shape to one IVF training pass (slice is a
    scan-stage projection; the update shuffle carries k * D/m partial
    sums per partition). Train on a deterministic sample at extreme
    scale, like kmeans_centroids. Pass ``dim`` to skip the one-row
    dimension-probe job."""
    if dim is None:
        probe = df.select(vec_col).head()
        if probe is None or probe[0] is None:
            raise ValueError(
                f"pq_codebooks: input has no non-null {vec_col!r} rows — "
                "cannot infer the embedding dimension (pass dim= explicitly)"
            )
        dim = len(probe[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    v = F.col(vec_col).cast("array<double>")
    return [
        kmeans_centroids(
            df.select(F.col(id_col), F.slice(v, s * sub + 1, sub).alias("v")),
            n_centroids=k,
            iters=iters,
            id_col=id_col,
            vec_col="v",
        )
        for s in range(m)
    ]


def pq_assign(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector against trained PQ codebooks: one ``code_{s}``
    INT column per subspace (the argmax-cosine assignment of
    :func:`nearest_centroid_expr` on the sliced vector — the spherical-PQ
    variant matching this engine's cosine ANN family). Pure scan-stage
    column expressions: the codebooks ride the plan as literals, no join,
    no shuffle, no Python — the 100 TB encode is one narrow projection.
    Output: (id, code_0 .. code_{m-1})."""
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col),
        *[
            nearest_centroid_expr(F.slice(v, s * sub + 1, sub), book)
            .cast("int")
            .alias(f"code_{s}")
            for s, book in enumerate(codebooks)
        ],
    )


def pq_adc_topk(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """PQ asymmetric-distance top-k (the ADC of Jegou et al. 2011): score
    every vector from its PQ CODES alone — score = sum over subspaces of
    dot(query_slice_s, codeword[code_s]) — and take the k best by that
    inner-product approximation (ties by id).

    The m lookup tables (k entries each) are computed DRIVER-side from the
    trained codebooks and ride the plan as literal arrays; per row the
    scan does m integer lookups + an (m-1)-add fold. This is why PQ is
    the memory lever at 100 TB: the raw vectors never load — a corpus
    stored as (id, m codes) plus a k*m table answers ANN probes. Exact
    re-rank of the ADC top-k' against raw vectors (k' ~ 4k) is the
    standard refinement; this returns the pure-ADC ranking so the
    approximation itself is oracle-checkable. Summation is fixed-order
    (subspace 0..m-1), scores rounded to 6 dp."""
    sub = len(codebooks[0][0])
    tables = [
        [
            sum(float(q) * float(c) for q, c in zip(query_vec[s * sub : (s + 1) * sub], cw))
            for cw in book
        ]
        for s, book in enumerate(codebooks)
    ]
    codes = pq_assign(df, codebooks, id_col, vec_col)
    score = None
    for s, tab in enumerate(tables):
        term = F.element_at(lit_vec(tab), F.col(f"code_{s}") + 1)
        score = term if score is None else score + term
    return (
        codes.select(F.col(id_col), F.round(score, 6).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )


def pq_adc_rerank_topk(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    shortlist: int = 30,
) -> DataFrame:
    """The production PQ probe: ADC shortlist (codes only — raw vectors
    never load for the scan) then EXACT cosine re-rank of the shortlist
    against raw vectors. Refinement buys back the quantization error
    where it matters (the head) at the cost of ``shortlist`` random
    vector fetches — at 100 TB that's the difference between scanning
    codes (GBs) and scanning vectors (TBs), with exact top-k quality
    whenever the true top-k survives into the shortlist. The shortlist id
    set is tiny, so it broadcasts into a left-semi probe of the vector
    table (partition-prunable when the table is laid out by id)."""
    cand_ids = pq_adc_topk(
        df, codebooks, query_vec, id_col, vec_col, k=shortlist
    ).select(id_col)
    cands = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    return brute_force_topk(cands, query_vec, id_col, vec_col, k)


def rank_by(df: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic 1-based rank (score desc, id asc) — the
    shortlist-ranking helper for fusion. Meant for TOP-K SHORTLISTS
    (tens-hundreds of rows), where the single-partition window is free;
    never call it on a corpus-sized frame."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR 2009): combine ranked
    shortlists from heterogeneous retrievers —

        rrf(d) = sum_over_lists 1 / (c + rank_list(d))

    — the standard score-free fusion for hybrid retrieval (BM25 sparse +
    embedding dense), robust to incomparable score scales because only
    RANKS enter. Documents absent from a list contribute 0 for it.

    Each input must be a (id, rank) shortlist (see :func:`rank_by`);
    fusion is a chain of full-outer joins over k-bounded frames — tiny by
    construction, the corpus-sized work happened inside each retriever.
    Output: (id, rrf[6dp]) top-k, ties by id."""
    fused = None
    for i, r in enumerate(rankings):
        part = r.select(F.col(id_col), F.col("rank").alias(f"r{i}"))
        fused = part if fused is None else fused.join(part, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        t = F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col(f"r{i}")), F.lit(0.0)
        )
        score = t if score is None else score + t
    return (
        fused.select(F.col(id_col), F.round(score, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def radius_neighbors(
    df: DataFrame,
    query_vec: list[float],
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact RANGE search: every vector with cosine(v, query) >= tau —
    the radius complement of brute_force_topk (dedup wants "everything
    this close", not "the 10 closest"). One scan-stage projection +
    filter, NO shuffle and no ordering: the result is a set, and at
    100 TB a global sort on it would be pure waste — consumers that want
    order compose rank_by on the (small) result. Output: (id, cos)."""
    q = lit_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
    )
    return scored.filter(F.col("cos") >= tau)


def truncated_topk(
    df: DataFrame,
    query_vec: list[float],
    keep_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Matryoshka-style dimension truncation probe (Kusupati et al. 2022,
    MRL): rank by cosine over only the FIRST ``keep_dims`` dimensions of
    both the stored vectors and the query. With MRL-trained embeddings
    the prefix carries most of the signal, so serving can trade
    dimensions for cost; paired with an exact-ranking recall readout the
    truncation cost becomes measurable (the PQ/ADC posture applied to
    the simplest compressor there is — a slice). Scan-stage slice + the
    shared fold dot; TakeOrdered top-k, no shuffle."""
    if keep_dims < 1 or keep_dims > len(query_vec):
        raise ValueError(
            f"keep_dims must be in [1, {len(query_vec)}], got {keep_dims}"
        )
    q = lit_vec(query_vec[:keep_dims])
    scored = df.select(
        F.col(id_col),
        F.round(
            cosine(F.slice(F.col(vec_col).cast("array<double>"), 1, keep_dims), q), 6
        ).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
