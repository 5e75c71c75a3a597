"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design:
* exact dedup — hash aggregation on a digest of the text (shuffle carries the
  32-byte digest, not the document): ``groupBy(sha2(text)) -> min(doc_id)``
* MinHash+LSH — k independent min-hashes from one md5 base hash (h_i = a_i*h
  + b_i mod p), banded into b buckets; candidate pairs come from an equi-JOIN
  on (band_id, band_hash) — never an O(n^2) cross join. Verification joins
  only candidate pairs back to shingle sets.
* SimHash — 64-bit weighted-bit fingerprint; near-dup = hamming distance <= k
  over bucket-joined candidates.
* all of it built-ins; Python never sees a row.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.text import (
    AFFINE_COEFFS as _COEFFS,
)
from scylla_migrator_spark.analytics.text import (
    AFFINE_P as _P,
)
from scylla_migrator_spark.analytics.text import _md5_int, shingles, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: digest-grouped, keeper = min id.

    Output: (digest, keeper_id, dup_count). The shuffle key is the sha2
    digest — constant width regardless of document size."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep only the keeper row of each exact-duplicate group."""
    keepers = exact_dedup(df, text_col, id_col).select(F.col("keeper_id").alias(id_col))
    return df.join(keepers, on=id_col, how="left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """One row per document with its MinHash signature (array<long> of length
    ``num_hashes``).

    Computed as explode(shingles) -> md5 ONCE per (doc, shingle) -> groupBy
    doc with ``num_hashes`` min-aggregates of the affine family
    h_i = (a_i*h + b_i) mod p. One pass over the shingles, one shuffle on the
    doc id, and partial (map-side) min-combining — unlike a nested
    array_min(transform(...)) column expression, which Catalyst inlines per
    hash function and per downstream use, re-hashing every shingle dozens of
    times. Documents whose text yields no shingles get no signature (they can
    have no near-duplicates)."""
    ex = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("__sh"),
    )
    h = ex.select(id_col, _md5_int(F.col("__sh")).alias("__h"))
    aggs = [
        F.min((F.col("__h") * a + b) % F.lit(_P)).alias(f"__mh_{i}")
        for i, (a, b) in enumerate(_COEFFS[:num_hashes])
    ]
    return (
        h.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__mh_{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_signature_col(text_col: Column, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """Per-row MinHash signature as a pure COLUMN expression (array<long>,
    no shuffle) — the STREAMING form of :func:`minhash_signatures`: same
    distinct shingle set, same md5 hash, same affine family, so the values
    are identical to the aggregated batch signature. A scan-stage gate can
    attach it to a live stream where a groupBy signature pass cannot run
    (it would be a second stateful operator).

    The ``element_at(transform(array(hashes), ...), 1)`` wrapper binds the
    per-shingle hash array to a lambda variable so it is evaluated ONCE per
    row — referencing the hash expression inside the per-coefficient lambda
    directly would re-run the shingle+md5 subtree once per hash function."""
    hs = F.transform(
        F.array_distinct(shingles(text_col, shingle_n)), lambda g: _md5_int(g)
    )
    coeffs = F.expr(
        "array("
        + ",".join(
            f"named_struct('a', {a}L, 'b', {b}L)" for a, b in _COEFFS[:num_hashes]
        )
        + ")"
    )
    return F.element_at(
        F.transform(
            F.array(hs),
            lambda h_arr: F.transform(
                coeffs,
                lambda ab: F.array_min(
                    F.transform(h_arr, lambda h: (h * ab["a"] + ab["b"]) % F.lit(_P))
                ),
            ),
        ),
        1,
    )


def _banded(sig_df: DataFrame, keep_cols: list[str], num_hashes: int, bands: int) -> DataFrame:
    """Explode a signature table into (keep_cols..., band_id, band_hash) —
    the single definition of band hashing shared by the within-corpus and
    cross-corpus LSH joins (a drifted copy would silently desynchronize
    them and their SQL oracles)."""
    rows_per_band = num_hashes // bands
    return sig_df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.sha2(
                    F.concat_ws(
                        ",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    ),
                    256,
                ),
            )
        ).alias("band_id", "band_hash"),
    )


def _expand_fp_pairs(
    fp_pairs: DataFrame,
    members: DataFrame,
    extra_cols: list[str],
    emit: str = "pairs",
) -> DataFrame:
    """Expand distinct-fingerprint pairs (__fp_a, __fp_b, extra...) back to
    member id pairs, plus the intra-group (identical-fingerprint) pairs.

    ``members`` is (__mid, __msh). The two legs are disjoint by construction
    (cross pairs have __fp_a != __fp_b; intra pairs share one fingerprint),
    and each member id carries exactly one fingerprint, so the union needs
    no final distinct. Intra pairs get hamming/extra = 0 where applicable —
    identical fingerprints are distance zero in every banded-Hamming scheme
    this serves.

    ``emit="star"`` is the GRAPH-consumer mode (components / cluster
    builders): instead of the full pair semantics it returns a contracted
    edge set with identical transitive closure over the identical vertex
    set — each fingerprint group contributes member→representative (min
    member id) edges, LINEAR in group size, and each cross-fingerprint
    pair contributes one representative→representative edge. A
    10^6-member boilerplate group is 10^6−1 star edges instead of ~5×10^11
    pairs nobody reads; connected components, cluster membership, and the
    paired-vertex set are unchanged (every member of a ≥2 group appears in
    its star edge; a singleton group appears via its cross edges). Pair
    mode stays the default for pair-semantics queries."""
    if emit == "star":
        reps = members.groupBy("__msh").agg(F.min("__mid").alias("__rep"))
        # rep = min(group), so rep < member always: id ordering holds
        intra = (
            members.join(reps, "__msh")
            .filter(F.col("__mid") != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col("__mid").alias("id_b"),
                *[F.lit(0).cast("int").alias(c) for c in extra_cols],
            )
        )
        cross = (
            fp_pairs.join(reps.alias("ra"), F.col("__fp_a") == F.col("ra.__msh"))
            .join(reps.alias("rb"), F.col("__fp_b") == F.col("rb.__msh"))
            .select(
                F.least(F.col("ra.__rep"), F.col("rb.__rep")).alias("id_a"),
                F.greatest(F.col("ra.__rep"), F.col("rb.__rep")).alias("id_b"),
                *[F.col(c) for c in extra_cols],
            )
        )
        return cross.unionByName(intra)
    cross = (
        fp_pairs.join(
            members.alias("ma"), F.col("__fp_a") == F.col("ma.__msh")
        )
        .join(members.alias("mb"), F.col("__fp_b") == F.col("mb.__msh"))
        .select(
            F.least(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_a"),
            F.greatest(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_b"),
            *[F.col(c) for c in extra_cols],
        )
    )
    intra = (
        members.alias("ma")
        .join(
            members.alias("mb"),
            on=[
                F.col("ma.__msh") == F.col("mb.__msh"),
                F.col("ma.__mid") < F.col("mb.__mid"),
            ],
        )
        .select(
            F.col("ma.__mid").alias("id_a"),
            F.col("mb.__mid").alias("id_b"),
            *[F.lit(0).cast("int").alias(c) for c in extra_cols],
        )
    )
    return cross.unionByName(intra)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    max_band_freq: int | None = None,
    persisted_out: list | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH: rows sharing any band bucket.

    Hot-bucket governance (the 100 TB skew guard): the band self-join runs
    over DISTINCT signatures only. Exact-duplicate content — the dominant
    degenerate fingerprint at corpus scale (boilerplate, empty pages) —
    collapses to ONE row per band bucket before the join instead of m rows
    producing ~m^2/2 candidates; member pairs are recovered afterwards by
    two id-keyed expansion joins (identical-signature groups expand
    directly as guaranteed candidates, since equal signatures share every
    band). ``max_band_freq`` additionally caps residual hot buckets among
    DISTINCT signatures (near-constant but non-identical content): buckets
    whose distinct-signature frequency exceeds the cap are quarantined
    before the join — the ``max_doc_freq`` stop-shingle posture of
    _shingle_pair_intersections (identical-signature groups bypass the
    cap — they are guaranteed candidates and never enter the band join).

    Plan: signature (one shuffle, see minhash_signatures) -> distinct on the
    signature digest -> posexplode bands -> shuffle on (band_id, band_hash)
    -> self-equi-join within DISTINCT-signature buckets -> expand to member
    ids. No cross join ever materializes."""
    sig_df = minhash_signatures(df, text_col, id_col, num_hashes)
    # one materialization of the signature table: members, the distinct
    # collapse, and the expansion joins otherwise each re-run the minhash
    # transform (the simhash_blocked_pairs lesson). localCheckpoint, not
    # persist: re-ANALYZING the signature subtree per branch was the
    # fixed cost (planning, not execution — same A/B as the simhash
    # generators); the banded explode feeds both sides of the self-join,
    # so it is truncated too.
    keyed = sig_df.select(
        F.col(id_col), F.col("sig"), F.sha2(F.concat_ws(",", "sig"), 256).alias("__fp")
    ).localCheckpoint(eager=True)
    members = keyed.select(F.col(id_col).alias("__mid"), F.col("__fp").alias("__msh"))
    distinct_sigs = keyed.select("__fp", "sig").dropDuplicates(["__fp"])
    banded = _banded(distinct_sigs, ["__fp"], num_hashes, bands).localCheckpoint(
        eager=True
    )
    if max_band_freq is not None:
        keep = (
            banded.groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("__bf"))
            .filter(F.col("__bf") <= max_band_freq)
            .select("band_id", "band_hash")
        )
        banded = banded.join(keep, ["band_id", "band_hash"], "left_semi")
    left = banded.alias("l")
    right = banded.alias("r")
    fp_pairs = (
        left.join(
            right,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.__fp") < F.col("r.__fp"),
            ],
        )
        .select(F.col("l.__fp").alias("__fp_a"), F.col("r.__fp").alias("__fp_b"))
        .distinct()
    )
    return _expand_fp_pairs(fp_pairs, members, [])


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification step after LSH).

    Joins each pair side against the (small) candidate doc set; similarity is
    computed with array_intersect/array_union on distinct shingle sets."""
    sh = docs.select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), n)).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        df_pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )


def _shingle_pair_intersections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Shared inverted-index intersection core for the shingle-set pair
    family: (id_a, id_b, __sz_a, __sz_b, __n_inter) for every same-block
    pair with >= 1 shared distinct n-gram shingle. ngram_jaccard_pairs
    and overlap_pairs are readouts over this one plan.

    Plan: explode distinct shingles -> self-equi-join on (block, shingle) ->
    count shared shingles per (id_a, id_b) = |intersection| -> union from the
    per-doc set sizes. Work is proportional to the number of (pair,
    shared-shingle) co-occurrences — NOT to all-pairs x array-intersect like
    a blocked array join, which also re-evaluates the intersect per projected
    use.

    ``max_doc_freq`` is the 100 TB skew guard: a shingle appearing in d docs
    of one block contributes O(d^2) join rows, so one hot "stop shingle"
    (boilerplate, license headers) makes the join quadratic. With the cap
    set, shingles whose per-block document frequency exceeds it are pruned
    BEFORE the self-join, and Jaccard is computed consistently over the
    retained shingle universe (both set sizes recount retained shingles
    only). The freq count, the prune semi-join, and the pair join all hash
    on (block, shingle), so AQE reuses one shuffle partitioning across the
    three."""
    sh = df.select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("__s"),
    )
    if max_doc_freq is None:
        ex = sh.select(
            F.col(id_col), "__blk", F.size("__s").alias("__sz"), F.explode("__s").alias("__g")
        )
    else:
        from pyspark.sql import Window

        flat = sh.select(F.col(id_col), "__blk", F.explode("__s").alias("__g"))
        keep = (
            flat.groupBy("__blk", "__g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("__blk", "__g")
        )
        pruned = flat.join(keep, ["__blk", "__g"], "left_semi")
        # retained-set size per doc, without collapsing the exploded rows
        ex = pruned.withColumn(
            "__sz", F.count("*").over(Window.partitionBy("__blk", F.col(id_col)))
        )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.__blk") == F.col("b.__blk"),
                F.col("a.__g") == F.col("b.__g"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__sz").alias("__sz_a"),
            F.col("b.__sz").alias("__sz_b"),
        )
        .agg(F.count("*").alias("__n_inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for all same-block pairs with >=1 shared
    shingle — the symmetric readout over the shared inverted-index
    intersection core (see _shingle_pair_intersections for the plan and
    the max_doc_freq stop-shingle cap)."""
    inter = _shingle_pair_intersections(
        df, text_col, id_col, block_col, n, max_doc_freq
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("__n_inter")
            / (F.col("__sz_a") + F.col("__sz_b") - F.col("__n_inter")),
            6,
        ).alias("jaccard"),
    )


def overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-containment pairs: Szymkiewicz-Simpson overlap
    coefficient |A∩B| / min(|A|, |B|) >= threshold over distinct n-gram
    shingles — the quote/subset detector symmetric Jaccard misses (a
    short doc fully embedded in a long one has tiny Jaccard but overlap
    ~1). The rational threshold keeps the filter integer-exact.

    Same inverted-index intersection core as ngram_jaccard_pairs —
    including the ``max_doc_freq`` stop-shingle cap (with the cap set,
    overlap is computed consistently over the retained-shingle universe,
    exactly like the capped Jaccard). Output: (id_a, id_b, overlap)."""
    tn, td = threshold_num, threshold_den
    inter = _shingle_pair_intersections(
        df, text_col, id_col, block_col, n, max_doc_freq
    )
    least_sz = F.least(F.col("__sz_a"), F.col("__sz_b"))
    return inter.filter(F.col("__n_inter") * td >= tn * least_sz).select(
        "id_a",
        "id_b",
        F.round(F.col("__n_inter") / least_sz, 6).alias("overlap"),
    )


def winnowing_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Same-block document pairs sharing >= 1 selected winnowing
    fingerprint, with the shared count — the pair-level readout over
    winnowing_fingerprints (one equi-join on (block, fingerprint); the
    join key is the 60-bit selected minimum, so bucket population is
    bounded by how often a fingerprint is selected, ~2/window of window
    occurrences). Output: (id_a, id_b, shared_fps)."""
    fps = winnowing_fingerprints(
        df, text_col, id_col, k=k, window=window, carry_cols=[block_col]
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
                F.col("a.fp") == F.col("b.fp"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("shared_fps"))
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry_cols: list[str] | None = None,
    bits: int = 32,
    hash_hex: int = 8,
) -> DataFrame:
    """Per-document SimHash fingerprints via explode -> bit-vote aggregation.

    Same semantics as the ``simhash`` column expression, but each token is
    hashed ONCE and the per-bit majority vote is ``bits`` sum-aggregates over
    the exploded tokens. The aggregation is also an optimizer barrier: a
    downstream self-join sees a materialized ``sh`` column instead of
    re-inlining the whole fingerprint expression per candidate PAIR (measured
    72s -> ~2s at sf0.1 for the hamming-pair join).

    ``hash_hex`` is the md5 prefix width of the token hash in hex chars
    (8 → 32-bit, the default; 15 → 60-bit for WIDE fingerprints, the
    corpus-scale posture where blocked candidate keys need real entropy —
    15 hex stays under 2^60 so the BIGINT is positive in both engines).
    ``bits`` must be <= 4*hash_hex or the high bit-votes are vacuously 0."""
    if bits > 4 * hash_hex:
        raise ValueError(
            f"bits={bits} exceeds token-hash width {4 * hash_hex} "
            f"(raise hash_hex)"
        )
    carry = carry_cols or []
    # The bit-vote expression forest (``bits`` sum-aggregates + the
    # ``bits``-term reconstruction chain) is ~700 expression nodes built
    # through one py4j round-trip each — measured ~1.0 s of pure
    # driver-side plan construction PER CALL (the _block_union_keys
    # fixed-cost finding, guide §7.3 "planning time itself can become the
    # bottleneck"). The tree is a pure function of (bits, hash_hex) over
    # fixed internal column names, so build it ONCE per SparkContext and
    # reuse the Column objects (unresolved expressions are reusable; the
    # cache dies with the context).
    sc = df.sparkSession.sparkContext
    cache = getattr(sc, "_sgs_simhash_exprs", None)
    if cache is None:
        cache = {}
        sc._sgs_simhash_exprs = cache
    ckey = (bits, hash_hex)
    cached = cache.get(ckey)
    if cached is None:
        tok_hash = (
            _md5_int(F.col("__tok"))
            if hash_hex == 8
            else F.conv(
                F.substring(F.md5(F.col("__tok")), 1, hash_hex), 16, 10
            ).cast("long")
        )
        aggs = [
            F.sum(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1))).alias(f"__b{b}")
            for b in range(bits)
        ] + [F.count("*").alias("__n")]
        sh = None
        for b in range(bits):
            bit = F.when(
                F.col(f"__b{b}") * 2 > F.col("__n"), F.lit(1 << b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            sh = bit if sh is None else sh + bit
        cached = (tok_hash, aggs, sh.alias("sh"))
        cache[ckey] = cached
    tok_hash, aggs, sh_named = cached
    ex = df.select(F.col(id_col), *carry, F.explode(tokens(F.col(text_col))).alias("__tok"))
    h = ex.select(id_col, *carry, tok_hash.alias("__h"))
    agg = h.groupBy(id_col, *carry).agg(*aggs)
    return agg.select(F.col(id_col), *carry, sh_named)


def _simhash_banded_distinct(
    fp: DataFrame, sh_col: str, bits: int, bands: int
) -> DataFrame:
    """(__fp, band_id, band_val) over the DISTINCT fingerprints of ``fp`` —
    the band-join input. Split out so the skew test and the plan pin can
    assert the collapse directly: |rows| == |distinct fingerprints| * bands
    regardless of how many members share a fingerprint."""
    w = bits // bands
    mask = (1 << w) - 1
    return (
        fp.select(F.col(sh_col).alias("__fp"))
        .distinct()
        .select(
            "__fp",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.shiftright(F.col("__fp"), b * w)
                            .bitwiseAND(F.lit(mask))
                            .alias("band_val"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("__fp", "bb.band_id", "bb.band_val")
    )


def simhash_hot_bands(
    fp: DataFrame,
    sh_col: str = "sh",
    bits: int = 32,
    bands: int = 4,
    max_band_freq: int = 1024,
) -> DataFrame:
    """Quarantine report for simhash_banded_pairs' ``max_band_freq`` cap:
    (band_id, band_val, n_fingerprints) for every band bucket whose
    DISTINCT-fingerprint frequency exceeds the cap — the buckets the capped
    join excludes. The stop-shingle report posture (see
    _shingle_pair_intersections) applied to band space."""
    if bits % bands != 0:
        raise ValueError("bits must divide evenly into bands")
    return (
        _simhash_banded_distinct(fp, sh_col, bits, bands)
        .groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n_fingerprints"))
        .filter(F.col("n_fingerprints") > max_band_freq)
    )


def simhash_banded_pairs(
    fp: DataFrame,
    id_col: str,
    sh_col: str = "sh",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_band_freq: int | None = None,
    emit: str = "pairs",
    persisted_out: list | None = None,
) -> DataFrame:
    """Band-prefix LSH blocking for SimHash — the 100 TB candidate
    generator: split each ``bits``-bit fingerprint into ``bands`` equal
    bands; by pigeonhole, two fingerprints within hamming distance
    ``max_hamming < bands`` agree EXACTLY on at least one band, so the
    candidate set is a union of per-band equi-joins on (band_id, band
    value) — bucketed shuffle keys, never an all-pairs or whole-corpus
    block self-join. Candidates are then verified with the exact popcount.

    Hot-bucket governance: the band join runs over DISTINCT fingerprints
    (see _simhash_banded_distinct). Degenerate content — solid-color
    thumbnails, blank pages, exact duplicates — collapses to ONE
    fingerprint, which without the collapse would put m member rows in one
    band bucket and plan ~m^2/2 join candidates; here it contributes one
    row per band, and its member pairs come back through the expansion
    joins as hamming-0 pairs (identical fingerprints are trivially within
    any threshold). ``max_band_freq`` optionally quarantines residual hot
    buckets among the distinct fingerprints (near-constant but non-equal
    content, e.g. the all-dark/all-bright dHash neighborhoods); excluded
    buckets are reported by simhash_hot_bands. Intra-group (hamming-0)
    pairs are never quarantined — they bypass banding entirely.

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming <= max_hamming.
    Plan shape: distinct-fingerprint aggregate, one explode to (fp,
    band_id, band_val), one equi-join on the band key, popcount verify,
    distinct on the fingerprint pair, two id-keyed expansion joins plus the
    identical-fingerprint self-equi-join — bucket-then-verify like MinHash
    LSH, with the bucket population bounded by fingerprint diversity, not
    corpus size."""
    if bands <= max_hamming:
        raise ValueError(
            f"pigeonhole guarantee needs bands > max_hamming (got {bands} <= {max_hamming})"
        )
    if bits % bands != 0:
        raise ValueError("bits must divide evenly into bands")
    # one materialization of the thin (id, fingerprint) projection: the
    # band join, the expansion joins, and the intra self-join otherwise
    # each re-inline the caller's fingerprint pipeline (the
    # simhash_blocked_pairs lesson). localCheckpoint, not persist: the
    # fingerprint subtree would otherwise be re-ANALYZED per branch —
    # planning, not execution, was the fixed cost (see
    # simhash_blocked_pairs; same A/B). The banded explode feeds both
    # sides of the band self-join, so it is truncated too.
    members = fp.select(
        F.col(id_col).alias("__mid"), F.col(sh_col).alias("__msh")
    ).localCheckpoint(eager=True)
    banded = _simhash_banded_distinct(
        members.select(F.col("__msh").alias(sh_col)), sh_col, bits, bands
    ).localCheckpoint(eager=True)
    if max_band_freq is not None:
        keep = (
            banded.groupBy("band_id", "band_val")
            .agg(F.count("*").alias("__bf"))
            .filter(F.col("__bf") <= max_band_freq)
            .select("band_id", "band_val")
        )
        banded = banded.join(keep, ["band_id", "band_val"], "left_semi")
    a, b_ = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.__fp").bitwiseXOR(F.col("b.__fp"))).cast("int")
    # verify with the popcount BEFORE the pair-dedup: the filter is a cheap
    # per-candidate expression inside the join stage, and it shrinks the
    # rows entering the dropDuplicates exchange to the true matches (a pair
    # can surface from up to `bands` buckets); hamming is functional on the
    # fingerprint pair so deduping after the filter is equivalent
    fp_pairs = (
        a.join(
            b_,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.__fp") < F.col("b.__fp"),
            ],
        )
        .select(
            F.col("a.__fp").alias("__fp_a"),
            F.col("b.__fp").alias("__fp_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["__fp_a", "__fp_b"])
    )
    return _expand_fp_pairs(fp_pairs, members, ["hamming"], emit=emit)


def _block_union_keys(
    units: DataFrame,
    sh_col: str,
    bits: int,
    blocks: int,
    max_hamming: int,
    carry_cols: list[str],
) -> DataFrame:
    """Explode each fingerprint row into its C(blocks, blocks−max_hamming)
    Manku block-union probe keys (Manku, Jain & Das Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW'07 §3).

    The ``bits``-bit fingerprint is split into ``blocks`` contiguous blocks
    (widths differ by ≤1 when blocks ∤ bits). Two fingerprints within
    hamming distance h differ in at most h blocks, so they agree EXACTLY
    on at least blocks−h blocks — hence on at least one of the
    C(blocks, blocks−h) block subsets of that size. Each subset becomes a
    probe table: (combo_id, key_val) where key_val packs the selected
    block values into one long. An equi-join on (combo_id, key_val) is
    therefore a LOSSLESS candidate generator for hamming ≤ max_hamming —
    no pigeonhole band-count constraint like single-block banding
    (bands > h), which for h=8 over 32 bits would force ~3-bit bands and
    useless buckets. blocks=10, h=8 → 45 probe tables keyed on ~6-7 bit
    unions; one explode, one shuffle on the key.

    Output: (carry_cols..., combo_id, key_val).

    The C(blocks, k)-combo expression forest is ~600 expression nodes
    built through one py4j round-trip each — measured 1-3 s of pure
    driver-side plan construction PER CALL at micro-batch cadence (the
    r10 verdict's fixed-cost finding). The tree is a pure function of
    (sh_col, bits, blocks, max_hamming), so it is built ONCE per
    SparkContext and reused by every subsequent batch (cache keyed on
    the live context object: a restarted context rebuilds)."""
    sc = units.sparkSession.sparkContext
    cache = getattr(sc, "_sgs_union_key_exprs", None)
    if cache is None:
        cache = {}
        sc._sgs_union_key_exprs = cache
    ckey = (sh_col, bits, blocks, max_hamming)
    expr = cache.get(ckey)
    if expr is None:
        k = blocks - max_hamming
        base_w, rem = divmod(bits, blocks)
        widths = [base_w + 1 if i < rem else base_w for i in range(blocks)]
        offsets: list[int] = []
        off = 0
        for w in widths:
            offsets.append(off)
            off += w

        def block_val(i: int) -> Column:
            return F.shiftright(F.col(sh_col), offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1)
            )

        structs = []
        for j, combo in enumerate(combinations(range(blocks), k)):
            key: Column | None = None
            for i in combo:
                bv = block_val(i)
                key = bv if key is None else key * F.lit(1 << widths[i]) + bv
            structs.append(
                F.struct(
                    F.lit(j).alias("combo_id"), key.cast("long").alias("key_val")
                )
            )
        expr = F.explode(F.array(*structs))
        cache[ckey] = expr
    return units.select(
        *[F.col(c) for c in carry_cols], expr.alias("kk")
    ).select(*carry_cols, "kk.combo_id", "kk.key_val")


_UNION_KEY_GEOMS: dict[tuple[int, int, int], tuple] = {}


def union_key_geometry(
    bits: int, blocks: int, max_hamming: int
) -> tuple[list[int], list[int], list[tuple[int, ...]]]:
    """(widths, offsets, combos) of the Manku block-union key layout —
    the shared geometry between ``_block_union_keys`` (the Catalyst
    expression forest) and ``block_union_key_rows`` (its driver-side
    twin). Cached per (bits, blocks, max_hamming)."""
    geom = _UNION_KEY_GEOMS.get((bits, blocks, max_hamming))
    if geom is None:
        k = blocks - max_hamming
        base_w, rem = divmod(bits, blocks)
        widths = [base_w + 1 if i < rem else base_w for i in range(blocks)]
        offsets: list[int] = []
        off = 0
        for w in widths:
            offsets.append(off)
            off += w
        geom = (widths, offsets, list(combinations(range(blocks), k)))
        _UNION_KEY_GEOMS[(bits, blocks, max_hamming)] = geom
    return geom


def block_union_key_rows(
    sh: int, bits: int, blocks: int, max_hamming: int
) -> list[tuple[int, int]]:
    """Driver-side twin of ``_block_union_keys`` for ONE fingerprint:
    the C(blocks, blocks−max_hamming) ``(combo_id, key_val)`` probe keys,
    bit-identical to the Catalyst forest (same widths/offsets/packing;
    Python ``>>`` is arithmetic like Spark's shiftright, and packed keys
    stay under ``bits`` so the long arithmetic cannot overflow). Pinned
    against the Spark expression in tests/test_components_stage.py.
    Used by the maintainers' small-batch local path, where generating a
    micro-batch's keys in-process is cheaper than scheduling Spark jobs
    over a batch-sized local relation."""
    widths, offsets, combos = union_key_geometry(bits, blocks, max_hamming)
    out: list[tuple[int, int]] = []
    for j, combo in enumerate(combos):
        key = 0
        for i in combo:
            key = key * (1 << widths[i]) + (
                (sh >> offsets[i]) & ((1 << widths[i]) - 1)
            )
        out.append((j, key))
    return out


def simhash_hot_union_keys(
    fp: DataFrame,
    sh_col: str = "sh",
    bits: int = 32,
    blocks: int = 10,
    max_hamming: int = 8,
    group_col: str | None = None,
    max_key_freq: int = 1024,
) -> DataFrame:
    """Quarantine report for simhash_blocked_pairs' ``max_key_freq`` cap:
    ([group,] combo_id, key_val, n_fingerprints) for every block-union
    probe bucket whose DISTINCT-fingerprint frequency exceeds the cap —
    the buckets a capped blocked join would exclude. The
    simhash_hot_bands / stop-shingle report posture applied to the Manku
    union-key space: a 100 TB operator reads this BEFORE deciding the cap
    (and after, to audit what the cap dropped)."""
    grp_sel = [F.col(group_col).alias("__grp")] if group_col else []
    units = fp.select(*grp_sel, F.col(sh_col).alias("__sh")).distinct()
    carry = (["__grp"] if group_col else []) + ["__sh"]
    keys = _block_union_keys(units, "__sh", bits, blocks, max_hamming, carry)
    key_cols = (["__grp"] if group_col else []) + ["combo_id", "key_val"]
    out = (
        keys.groupBy(*key_cols)
        .agg(F.count("*").alias("n_fingerprints"))
        .filter(F.col("n_fingerprints") > max_key_freq)
    )
    if group_col:
        out = out.withColumnRenamed("__grp", group_col)
    return out


def simhash_blocked_pairs(
    fp: DataFrame,
    id_col: str,
    sh_col: str = "sh",
    bits: int = 32,
    blocks: int = 10,
    max_hamming: int = 8,
    group_col: str | None = None,
    emit: str = "pairs",
    max_key_freq: int | None = None,
    persisted_out: list | None = None,
) -> DataFrame:
    """Blocked, LOSSLESS hamming ≤ ``max_hamming`` pair generation via
    Manku block-union keys — the candidate generator for thresholds too
    large for single-block banding (bands > h is impossible at h=8 over 32
    bits without ~3-bit bands). Needs only blocks > max_hamming.

    Same bucket-then-verify + skew-governance shape as
    simhash_banded_pairs: the key join runs over DISTINCT
    (group, fingerprint) units (degenerate content collapses to one row
    per probe key, member pairs return through the expansion joins as
    hamming-0), candidates are verified with the exact popcount, and the
    result is EXACTLY the all-pairs scan's pair set — so oracles written
    against the unblocked join stay unchanged. ``group_col`` scopes pairs
    within a group (the within-source semantics) by adding the group to
    the join key; ``max_key_freq`` optionally quarantines residual hot
    union-key buckets among distinct fingerprints (losing losslessness,
    like ``max_band_freq``); ``emit="star"`` returns the contracted graph
    edges for components/cluster consumers (see _expand_fp_pairs).

    Returns (id_a, id_b, hamming) with id_a < id_b (pair mode).
    Plan: distinct-unit aggregate → one explode to C(blocks, blocks−h)
    keys → one equi-join on ([group,] combo_id, key_val) → popcount verify
    → pair-dedup → expansion joins. Candidate count is bounded by bucket
    population ~ |distinct fingerprints| / 2^|union key|, never corpus².
    All join/dedup keys are NUMERIC (the raw fingerprint longs plus the
    group column) — no concatenated-string pair digests in the hot path."""
    if blocks <= max_hamming:
        raise ValueError(
            f"need blocks > max_hamming for the block-union guarantee "
            f"(got {blocks} <= {max_hamming})"
        )
    if blocks > bits:
        raise ValueError(f"need blocks <= bits (got {blocks} > {bits})")
    grp = [group_col] if group_col else []
    # materialize the thin (id, group, fingerprint) projection ONCE: the
    # generator references it from five plan branches (units/explode,
    # popcount verify, both expansion joins, the intra self-join), and
    # column pruning makes the branches' aggregate subplans differ, so
    # exchange reuse cannot always dedupe the caller's fingerprint
    # pipeline across them (measured 23s -> 6s on the skew row).
    # localCheckpoint (eager), not persist: the caller's fingerprint
    # subtree (~800 Catalyst nodes for the 60-bit bit-vote aggregate)
    # would otherwise be ANALYZED AND OPTIMIZED once per branch — persist
    # dedupes execution but not planning, and planning was the larger
    # fixed cost (guide §3.3/§7.3; measured 3.2→2.3 s on the wide pair
    # row with identical results). AQE re-plans the post-shuffle joins
    # from runtime sizes, so broadcastability does not depend on the
    # severed statistics, and the RDD checkpoint is GC-collected —
    # no CacheManager strong reference to leak (persisted_out callers
    # simply see nothing to unpersist).
    members = fp.select(
        F.col(id_col).alias("__mid"), *grp, F.col(sh_col).alias("__msh")
    ).localCheckpoint(eager=True)
    units = members.select(*grp, F.col("__msh").alias("__sh")).distinct()
    carry = grp + ["__sh"]
    # the exploded key table feeds BOTH sides of the candidate self-join:
    # checkpoint it too, so the C(blocks,k) forest is planned and
    # executed once, and the self-join reads a leaf
    keys = _block_union_keys(
        units, "__sh", bits, blocks, max_hamming, carry
    ).localCheckpoint(eager=True)
    key_cols = grp + ["combo_id", "key_val"]
    if max_key_freq is not None:
        keep = (
            keys.groupBy(*key_cols)
            .agg(F.count("*").alias("__kf"))
            .filter(F.col("__kf") <= max_key_freq)
            .select(*key_cols)
        )
        keys = keys.join(keep, key_cols, "left_semi")
    a, b = keys.alias("a"), keys.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols]
    on.append(F.col("a.__sh") < F.col("b.__sh"))
    ham = F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).cast("int")
    fp_pairs = (
        a.join(b, on=on)
        .select(
            *[F.col(f"a.{c}").alias(c) for c in grp],
            F.col("a.__sh").alias("__sh_a"),
            F.col("b.__sh").alias("__sh_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(grp + ["__sh_a", "__sh_b"])
    )

    def mjoin(pairs: DataFrame, side: str, alias: str) -> list:
        cond = [F.col(f"__sh_{side}") == F.col(f"{alias}.__msh")]
        if group_col:
            cond.insert(0, pairs[group_col] == F.col(f"{alias}.{group_col}"))
        return cond

    if emit == "star":
        reps = members.groupBy(*grp, "__msh").agg(F.min("__mid").alias("__rep"))
        intra = (
            members.alias("m")
            .join(
                reps.alias("r"),
                on=[F.col(f"m.{c}") == F.col(f"r.{c}") for c in grp]
                + [F.col("m.__msh") == F.col("r.__msh")],
            )
            .filter(F.col("m.__mid") != F.col("r.__rep"))
            .select(
                F.col("r.__rep").alias("id_a"),
                F.col("m.__mid").alias("id_b"),
                F.lit(0).cast("int").alias("hamming"),
            )
        )
        ra, rb = reps.alias("ra"), reps.alias("rb")
        cross = (
            fp_pairs.join(ra, on=mjoin(fp_pairs, "a", "ra"))
            .join(rb, on=mjoin(fp_pairs, "b", "rb"))
            .select(
                F.least(F.col("ra.__rep"), F.col("rb.__rep")).alias("id_a"),
                F.greatest(F.col("ra.__rep"), F.col("rb.__rep")).alias("id_b"),
                "hamming",
            )
        )
        return cross.unionByName(intra)
    ma, mb = members.alias("ma"), members.alias("mb")
    cross = (
        fp_pairs.join(ma, on=mjoin(fp_pairs, "a", "ma"))
        .join(mb, on=mjoin(fp_pairs, "b", "mb"))
        .select(
            F.least(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_a"),
            F.greatest(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_b"),
            "hamming",
        )
    )
    intra = (
        ma.join(
            mb,
            on=[F.col(f"ma.{c}") == F.col(f"mb.{c}") for c in grp]
            + [
                F.col("ma.__msh") == F.col("mb.__msh"),
                F.col("ma.__mid") < F.col("mb.__mid"),
            ],
        )
        .select(
            F.col("ma.__mid").alias("id_a"),
            F.col("mb.__mid").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


def simhash_blocked_edges_touching(
    fp_probe: DataFrame,
    fp_all: DataFrame,
    id_col: str,
    sh_col: str = "sh",
    group_col: str = "source",
    bits: int = 32,
    blocks: int = 10,
    max_hamming: int = 8,
    persisted_out: list | None = None,
) -> DataFrame:
    """Star-contracted near-dup edges TOUCHING a probe batch — the
    incremental / streaming dedup-graph edge generator
    (components_cdc.py, incremental_components_update), replacing the
    batch×corpus all-pairs join with Manku block-union candidates over
    DISTINCT fingerprints (see _block_union_keys).

    Contract: ``fp_all`` contains every ``fp_probe`` row (state ∪ batch).
    Returns (id_a, id_b) whose transitive closure, together with the prior
    labelling's internal connectivity of identical-fingerprint groups,
    equals the closure of ALL hamming ≤ max_hamming pairs that touch a
    probe row — which is exactly what incremental_components_update needs
    to reproduce the full-corpus recompute. The inductive premise (state
    members sharing a (group, fingerprint) are already in one component)
    is maintained by this same generator: every batch stars its touched
    groups onto an anchor.

    Edge legs, both linear in batch size + touched-fingerprint pairs:
    * star — each (group, fp) with ≥1 probe member anchors its probe
      members to min(state members) if any state member exists, else
      min(probe members); state-side members are already connected to the
      anchor (induction), so the whole group is connected without
      re-emitting a mega-group's history.
    * cross — each candidate DISTINCT-fingerprint pair (blocked keys,
      popcount-verified, ≥1 side having probe members) contributes one
      anchor→anchor edge; each side's anchor is connected to all its
      members by the star/induction, so one edge merges the components.

    Every newly-paired vertex appears in some edge (probe members via
    star or their singleton-group cross edges; a previously-unpaired
    state vertex is its group's anchor), so the ``paired``-flag
    bookkeeping over the edge vertex set is unchanged."""
    if blocks <= max_hamming:
        raise ValueError(
            f"need blocks > max_hamming (got {blocks} <= {max_hamming})"
        )
    if blocks > bits:
        raise ValueError(f"need blocks <= bits (got {blocks} > {bits})")
    # thin projections materialized once (lazy checkpoint): each side is
    # referenced from several plan branches (anchors, star, key explode,
    # candidate join) — without the lineage cut the caller's fingerprint
    # pipeline re-inlines per branch (the simhash_blocked_pairs lesson)
    probe_m = fp_probe.select(
        F.col(id_col).alias("__mid"),
        F.col(group_col).alias("__grp"),
        F.col(sh_col).alias("__msh"),
    ).persist()
    all_m = fp_all.select(
        F.col(id_col).alias("__mid"),
        F.col(group_col).alias("__grp"),
        F.col(sh_col).alias("__msh"),
    ).persist()
    if persisted_out is not None:
        persisted_out.extend([probe_m, all_m])
    probe_ids = probe_m.select(F.col("__mid").alias("__pid")).distinct().withColumn(
        "__isp", F.lit(True)
    )
    anchors = (
        all_m.join(probe_ids, all_m["__mid"] == probe_ids["__pid"], "left")
        .groupBy("__grp", "__msh")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("__isp").isNull(), F.col("__mid"))),
                F.min("__mid"),
            ).alias("__anchor")
        )
    )
    star = (
        probe_m.join(anchors, ["__grp", "__msh"])
        .filter(F.col("__mid") != F.col("__anchor"))
        .select(
            F.least("__mid", "__anchor").alias("id_a"),
            F.greatest("__mid", "__anchor").alias("id_b"),
        )
    )

    def units(m: DataFrame) -> DataFrame:
        return m.select("__grp", F.col("__msh").alias("__sh")).distinct()

    carry = ["__grp", "__sh"]
    pk = _block_union_keys(units(probe_m), "__sh", bits, blocks, max_hamming, carry)
    ak = _block_union_keys(units(all_m), "__sh", bits, blocks, max_hamming, carry)
    p, o = pk.alias("p"), ak.alias("o")
    ham = F.bit_count(F.col("p.__sh").bitwiseXOR(F.col("o.__sh"))).cast("int")
    cand = (
        p.join(
            o,
            on=[
                F.col("p.__grp") == F.col("o.__grp"),
                F.col("p.combo_id") == F.col("o.combo_id"),
                F.col("p.key_val") == F.col("o.key_val"),
                F.col("p.__sh") != F.col("o.__sh"),
            ],
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("p.__grp").alias("__grp"),
            F.least(F.col("p.__sh"), F.col("o.__sh")).alias("__sh_a"),
            F.greatest(F.col("p.__sh"), F.col("o.__sh")).alias("__sh_b"),
        )
        .dropDuplicates(["__grp", "__sh_a", "__sh_b"])
    )
    cross = (
        cand.join(
            anchors.alias("ra"),
            on=[
                cand["__grp"] == F.col("ra.__grp"),
                F.col("__sh_a") == F.col("ra.__msh"),
            ],
        )
        .join(
            anchors.alias("rb"),
            on=[
                cand["__grp"] == F.col("rb.__grp"),
                F.col("__sh_b") == F.col("rb.__msh"),
            ],
        )
        .select(
            F.least(F.col("ra.__anchor"), F.col("rb.__anchor")).alias("id_a"),
            F.greatest(F.col("ra.__anchor"), F.col("rb.__anchor")).alias("id_b"),
        )
    )
    return star.unionByName(cross)


@dataclass
class StagedProbe:
    """Result of ``simhash_staged_probe`` — the batch-sized pieces a
    dedup-graph maintainer needs, with every full-state input replaced by
    the persistent union-key stage.

    edges          (id_a, id_b) star ∪ cross touching edges (see
                   simhash_blocked_edges_touching for the closure
                   contract — identical here).
    anchor_labels  (id, comp) for every STATE anchor appearing in
                   ``edges``, with comp = the stage's ``comp0`` (the
                   anchor's component label when its unit was appended).
                   Resolve through the merge journal before feeding
                   contracted_merge if the stage can be stale.
    new_units      (__grp, __sh, __anchor) units absent from the stage —
                   explode with ``staged_union_keys`` (after assigning
                   comp0 from this batch's fixpoint) and append.
    persisted      frames this probe .persist()ed — the caller MUST
                   unpersist them once the batch's outputs are
                   materialized (CacheManager holds strong references;
                   a streaming maintainer that skips this grows executor
                   storage without bound)."""

    edges: DataFrame
    anchor_labels: DataFrame
    new_units: DataFrame
    persisted: list
    # stage partitions the probe could touch (None when unpruned/no stage)
    probe_kbs: list | None = None


def simhash_staged_probe(
    fp_probe: DataFrame,
    staged_keys: DataFrame | None,
    id_col: str,
    sh_col: str = "sh",
    group_col: str = "source",
    bits: int = 32,
    blocks: int = 10,
    max_hamming: int = 8,
    key_bucket_col: str | None = None,
    n_key_buckets: int | None = None,
    materialize: str = "persist",
) -> StagedProbe:
    """Touching-edge generation against a PERSISTENT union-key stage —
    the per-batch core of the incremental / streaming dedup-graph
    maintainers, with the full-state re-explode of
    simhash_blocked_edges_touching replaced by a probe of an append-only
    staged table. Union keys are a pure function of the immutable
    fingerprint, so the stage is written once per unit and only APPENDED
    afterwards; a micro-batch's scan volume is the batch itself plus the
    stage partitions its probe keys hash into — never |state|.

    ``staged_keys`` schema (None ⇒ empty stage / first generation):
        grp, combo_id, key_val, sh, anchor, comp0
    where one unit = one distinct (grp, sh) fingerprint, ``anchor`` is
    the unit's first-seen member id (every member is starred onto it on
    arrival, so it is connected to all state members — the induction
    simhash_blocked_edges_touching documents), and ``comp0`` is the
    anchor's component label when the unit was appended. If
    ``key_bucket_col``/``n_key_buckets`` are given the stage read is
    partition-pruned to the buckets the batch's probe keys hash into
    (``pmod(xxhash64(combo_id, key_val), n)`` — the writer's layout).

    Edge families (all batch-bounded):
    * star  — every probe member → its unit's anchor (staged anchor for
      an existing unit, min batch member for a new one).
    * cross (batch×stage) — NEW batch units probe the stage's keys
      (broadcast batch side, popcount verify); one anchor→anchor edge
      per candidate unit pair. Pairs between two ALREADY-staged units
      were emitted when the later of them was introduced, so they are in
      the prior labelling and are not re-emitted.
    * cross (batch×batch) — new units self-join on their own keys.

    The closure of these edges together with the prior labelling equals
    the closure of ALL hamming ≤ max_hamming pairs touching a probe row
    (the simhash_blocked_edges_touching contract), and the edge vertex
    set preserves the ``paired``-flag bookkeeping: every batch member of
    a non-singleton unit gets a star edge, and a previously-unpaired
    state vertex is its unit's anchor."""
    if blocks <= max_hamming:
        raise ValueError(
            f"need blocks > max_hamming (got {blocks} <= {max_hamming})"
        )
    if blocks > bits:
        raise ValueError(f"need blocks <= bits (got {blocks} > {bits})")
    persisted: list = []

    def _pin(df: DataFrame) -> DataFrame:
        # multi-branch batch frames need a lineage cut either way;
        # "persist" keeps InMemoryRelation size stats (broadcastable
        # downstream) but the CALLER must unpersist (CacheManager holds a
        # strong reference until then — the streaming maintainer does so
        # at batch end); "checkpoint" trades the stats for ContextCleaner
        # GC-based cleanup, the right mode for one-shot plan builders
        # that hand the plan to a driver and never see the action.
        if materialize == "checkpoint":
            return df.localCheckpoint(eager=True)
        p = df.persist()
        persisted.append(p)
        return p

    grp, sh = F.col(group_col), F.col(sh_col)
    probe_m = _pin(
        fp_probe.select(
            F.col(id_col).alias("__mid"), grp.alias("__grp"), sh.alias("__msh")
        )
    )
    units_b = _pin(
        probe_m.groupBy("__grp", F.col("__msh").alias("__sh"))
        .agg(F.min("__mid").alias("__bmin"))
    )
    # pin the exploded probe keys too: the C(blocks, blocks-h)-combo
    # expression tree is large, and four consumers (kb pruning, stage
    # probe, batch self-join twice) would each re-optimize and re-execute
    # it — cached it is a leaf for all of them
    pk = _pin(
        _block_union_keys(
            units_b, "__sh", bits, blocks, max_hamming,
            ["__grp", "__sh", "__bmin"],
        )
    )

    probe_kbs: list | None = None
    if staged_keys is None:
        # typed empty frames derived from the batch (group type preserved)
        exact = units_b.select(
            "__grp", "__sh",
            F.col("__bmin").alias("anchor"),
            F.col("__bmin").alias("comp0"),
        ).limit(0)
        cand_sb = units_b.select(
            "__grp", "__sh",
            F.col("__bmin").alias("__oanchor"),
            F.col("__bmin").alias("__ocomp0"),
        ).limit(0)
    else:
        staged = staged_keys
        if key_bucket_col is not None and n_key_buckets is not None:
            # partition pruning: the batch's probe keys determine which
            # stage buckets can possibly match — collect their (few,
            # ≤ n_key_buckets) bucket ids and push the isin into the scan
            kbs = [
                r["__kb"]
                for r in pk.select(
                    F.pmod(
                        F.xxhash64("combo_id", "key_val"), F.lit(n_key_buckets)
                    )
                    .cast("int")
                    .alias("__kb")
                )
                .distinct()
                .collect()
            ]
            probe_kbs = sorted(kbs)
            staged = staged.filter(F.col(key_bucket_col).isin(kbs))
        p, s = pk.alias("p"), staged.alias("s")
        ham = F.bit_count(F.col("p.__sh").bitwiseXOR(F.col("s.sh"))).cast("int")
        # broadcast the batch side: the stage scan streams through the
        # (pruned) partitions with no shuffle of state. The verified match
        # table is pinned so its THREE consumers (exact units, candidates,
        # anchor labels) cost one stage scan, not one each.
        m = _pin(
            F.broadcast(p)
            .join(
                s,
                on=[
                    F.col("p.__grp") == F.col("s.grp"),
                    F.col("p.combo_id") == F.col("s.combo_id"),
                    F.col("p.key_val") == F.col("s.key_val"),
                ],
            )
            .filter(ham <= max_hamming)
            .select(
                "p.__grp", "p.__sh", "s.sh", "s.anchor", "s.comp0"
            )
        )
        exact = (
            m.filter(F.col("__sh") == F.col("sh"))
            .select("__grp", "__sh", "anchor", "comp0")
            .distinct()
        )
        cand_sb = (
            m.filter(F.col("__sh") != F.col("sh"))
            .select(
                "__grp",
                "__sh",
                F.col("anchor").alias("__oanchor"),
                F.col("comp0").alias("__ocomp0"),
            )
            .dropDuplicates(["__grp", "__sh", "__oanchor"])
        )
    new_units = units_b.join(
        exact.select("__grp", "__sh"), ["__grp", "__sh"], "left_anti"
    ).select("__grp", "__sh", F.col("__bmin").alias("__anchor"))
    unit_anchor = exact.select(
        "__grp", "__sh", F.col("anchor").alias("__anchor")
    ).unionByName(new_units)
    # string-qualified aliases throughout: unit_anchor/new_units derive
    # from probe_m, so bare dataframe["col"] predicates can resolve both
    # sides to the SAME attribute (trivially-true join)
    star = (
        probe_m.alias("pm")
        .join(
            unit_anchor.alias("ua"),
            on=[
                F.col("pm.__grp") == F.col("ua.__grp"),
                F.col("pm.__msh") == F.col("ua.__sh"),
            ],
        )
        .filter(F.col("pm.__mid") != F.col("ua.__anchor"))
        .select(
            F.least("pm.__mid", "ua.__anchor").alias("id_a"),
            F.greatest("pm.__mid", "ua.__anchor").alias("id_b"),
        )
    )
    # cross edges from NEW batch units only: an already-staged batch
    # unit's inter-unit pairs were emitted when the later unit arrived
    cross_sb = (
        cand_sb.join(new_units, ["__grp", "__sh"])
        .select(
            F.least("__anchor", "__oanchor").alias("id_a"),
            F.greatest("__anchor", "__oanchor").alias("id_b"),
        )
    )
    nk = pk.join(
        new_units.select("__grp", "__sh"), ["__grp", "__sh"], "left_semi"
    )
    a, b = nk.alias("a"), nk.alias("b")
    bb_ham = F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).cast("int")
    cand_bb = (
        a.join(
            b,
            on=[
                F.col("a.__grp") == F.col("b.__grp"),
                F.col("a.combo_id") == F.col("b.combo_id"),
                F.col("a.key_val") == F.col("b.key_val"),
                F.col("a.__sh") < F.col("b.__sh"),
            ],
        )
        .filter(bb_ham <= max_hamming)
        .select(
            F.col("a.__grp").alias("__grp"),
            F.col("a.__sh").alias("__sh_a"),
            F.col("b.__sh").alias("__sh_b"),
        )
        .dropDuplicates(["__grp", "__sh_a", "__sh_b"])
    )
    na = new_units.select("__grp", "__sh", "__anchor")
    cross_bb = (
        cand_bb.alias("cb")
        .join(
            na.alias("xa"),
            on=[
                F.col("cb.__grp") == F.col("xa.__grp"),
                F.col("cb.__sh_a") == F.col("xa.__sh"),
            ],
        )
        .join(
            na.alias("xb"),
            on=[
                F.col("cb.__grp") == F.col("xb.__grp"),
                F.col("cb.__sh_b") == F.col("xb.__sh"),
            ],
        )
        .select(
            F.least(F.col("xa.__anchor"), F.col("xb.__anchor")).alias("id_a"),
            F.greatest(F.col("xa.__anchor"), F.col("xb.__anchor")).alias("id_b"),
        )
    )
    edges = star.unionByName(cross_sb).unionByName(cross_bb)
    anchor_labels = (
        exact.select(F.col("anchor").alias("id"), F.col("comp0").alias("comp"))
        .unionByName(
            cand_sb.join(new_units.select("__grp", "__sh"), ["__grp", "__sh"], "left_semi")
            .select(
                F.col("__oanchor").alias("id"), F.col("__ocomp0").alias("comp")
            )
        )
        .distinct()
    )
    return StagedProbe(
        edges=edges,
        anchor_labels=anchor_labels,
        new_units=new_units,
        persisted=persisted,
        probe_kbs=probe_kbs,
    )


def staged_union_keys(
    units: DataFrame,
    bits: int,
    blocks: int,
    max_hamming: int,
) -> DataFrame:
    """Explode (__grp, __sh, __anchor, __comp0) units into the persistent
    union-key stage rows ``simhash_staged_probe`` consumes:
    (grp, combo_id, key_val, sh, anchor, comp0). The writer partitions by
    ``pmod(xxhash64(combo_id, key_val), n_key_buckets)`` so probes can
    prune; this helper only produces the rows."""
    if blocks <= max_hamming:
        raise ValueError(
            f"need blocks > max_hamming (got {blocks} <= {max_hamming})"
        )
    if blocks > bits:
        raise ValueError(f"need blocks <= bits (got {blocks} > {bits})")
    keys = _block_union_keys(
        units, "__sh", bits, blocks, max_hamming,
        ["__grp", "__sh", "__anchor", "__comp0"],
    )
    return keys.select(
        F.col("__grp").alias("grp"),
        "combo_id",
        "key_val",
        F.col("__sh").alias("sh"),
        F.col("__anchor").alias("anchor"),
        F.col("__comp0").alias("comp0"),
    )


def frame_sequence_pairs(
    df: DataFrame,
    id_col: str,
    frame_col: str,
    sh_col: str,
    max_shingle_freq: int | None = None,
    emit: str = "pairs",
) -> DataFrame:
    """Near-duplicate SEQUENCE assets (videos as sampled-frame perceptual
    hashes) by shingled frame-hash agreement: input is one row per
    (asset, frame index, frame hash); every pair of adjacent frames
    (``frame_col`` + 1) forms a 2-shingle ``"sh_f_sh_{f+1}"``, and two
    assets match when they share >= 1 distinct shingle — the winnowing /
    n-gram-Jaccard idea with frame hashes as the token stream, so a
    near-dup video must share a RUN of perceptually-equal frames, not
    just a bag of them. Output: (id_a, id_b, n_shared, jaccard) with
    jaccard over the distinct-shingle sets.

    Scale posture (the banded-LSH lessons applied from the start):
    identical hash SEQUENCES — re-uploads, the dominant video dup at
    corpus scale — are collapsed to one fingerprint before the shingle
    self-join (sha2 over the ordered hash run), so m copies contribute
    ONE row per shingle bucket instead of m rows and ~m^2/2 join
    candidates; member pairs come back through id-keyed expansion joins,
    identical sequences expanding directly with jaccard 1. Residual hot
    shingles ACROSS distinct sequences (a ubiquitous intro/outro frame
    run) are prunable with ``max_shingle_freq`` — the stop-shingle
    posture of _shingle_pair_intersections, with both set sizes recounted
    over the retained shingle universe so jaccard stays consistent.
    Assets with zero shingles (fewer than 2 consecutive sampled frames)
    cannot match and are excluded from both legs."""
    base = df.select(
        F.col(id_col).alias("__vid"),
        F.col(frame_col).cast("long").alias("__f"),
        F.col(sh_col).cast("long").alias("__sh"),
    )
    l, r = base.alias("l"), base.alias("r")
    shingles_by_id = (
        l.join(
            r,
            on=[
                F.col("l.__vid") == F.col("r.__vid"),
                F.col("r.__f") == F.col("l.__f") + F.lit(1),
            ],
        )
        .select(
            F.col("l.__vid").alias("__vid"),
            F.concat_ws("_", F.col("l.__sh"), F.col("r.__sh")).alias("__g"),
        )
        .distinct()
    )
    # materialize the two shared tables once (the pair-generator lesson:
    # localCheckpoint, so each consumer branch plans AND executes against a
    # leaf): seq_fp feeds fp_shingles + members, and fp_shingles feeds the
    # size aggregate plus BOTH sides of the shingle self-join — without the
    # cut the shingle join + distinct executes up to three times
    seq_fp = base.groupBy("__vid").agg(
        F.sha2(
            F.concat_ws(
                "_",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__f", "__sh"))),
                    lambda s: s["__sh"].cast("string"),
                ),
            ),
            256,
        ).alias("__fp")
    ).localCheckpoint(eager=True)
    fp_shingles = (
        shingles_by_id.join(seq_fp, "__vid").select("__fp", "__g").distinct()
    )
    if max_shingle_freq is not None:
        keep = (
            fp_shingles.groupBy("__g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_freq)
            .select("__g")
        )
        fp_shingles = fp_shingles.join(keep, ["__g"], "left_semi")
    fp_shingles = fp_shingles.localCheckpoint(eager=True)
    sz = fp_shingles.groupBy("__fp").agg(F.count("*").alias("__sz"))
    a, b = fp_shingles.alias("a"), fp_shingles.alias("b")
    inter = (
        a.join(
            b,
            on=[F.col("a.__g") == F.col("b.__g"), F.col("a.__fp") < F.col("b.__fp")],
        )
        .groupBy(F.col("a.__fp").alias("__fp_a"), F.col("b.__fp").alias("__fp_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    members = (
        seq_fp.alias("sq")
        .join(
            sz.alias("zz"), F.col("sq.__fp") == F.col("zz.__fp"), "left_semi"
        )
        .select(F.col("__vid").alias("__mid"), F.col("__fp").alias("__msh"))
    )
    if emit == "star":
        # graph-consumer mode (see _expand_fp_pairs): identical closure and
        # vertex set, member→rep edges linear in identical-sequence group
        # size; n_shared/jaccard are dropped — cluster builders never read
        # them, and the pair-semantics query keeps the default mode
        return _expand_fp_pairs(
            inter.select("__fp_a", "__fp_b"), members, [], emit="star"
        )
    cross = (
        inter.join(sz.alias("sa"), F.col("__fp_a") == F.col("sa.__fp"))
        .join(sz.alias("sb"), F.col("__fp_b") == F.col("sb.__fp"))
        .join(members.alias("ma"), F.col("__fp_a") == F.col("ma.__msh"))
        .join(members.alias("mb"), F.col("__fp_b") == F.col("mb.__msh"))
        .select(
            F.least(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_a"),
            F.greatest(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_b"),
            F.col("n_shared"),
            F.round(
                F.col("n_shared")
                / (F.col("sa.__sz") + F.col("sb.__sz") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )
    intra = (
        members.alias("ma")
        .join(
            members.alias("mb"),
            on=[
                F.col("ma.__msh") == F.col("mb.__msh"),
                F.col("ma.__mid") < F.col("mb.__mid"),
            ],
        )
        .join(sz, F.col("ma.__msh") == sz["__fp"])
        .select(
            F.col("ma.__mid").alias("id_a"),
            F.col("mb.__mid").alias("id_b"),
            F.col("__sz").alias("n_shared"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def simhash(col: Column, bits: int = 32) -> Column:
    """SimHash fingerprint over word tokens: per-bit vote of token hashes.

    Pure higher-order functions: for each bit position, count tokens whose
    md5-int has that bit set; bit is 1 when set-count > half the tokens."""
    hashes = F.transform(tokens(col), _md5_int)
    n = F.size(hashes)
    # shiftleft needs a literal count, but the bit index is a column inside
    # the lambda -> use pow(2, b) (exact in double up to 2^52)
    def mask(b):
        return F.pow(F.lit(2.0), b).cast("long")

    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask(b)) != 0)) * 2 > n,
            mask(b),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_votes, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def embedding_near_dup(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.99, *, block_col: Column
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    ``block_col`` is REQUIRED: the self-join is equi-keyed on it, so the
    caller must choose the blocking scheme (a label/partition column, or an
    LSH bucket from similarity.lsh_bucket for unlabeled corpora). There is
    deliberately no default — a silent single-block default would plan an
    O(n^2) all-pairs cross join at 100 TB. Callers who truly want all pairs
    on a small frame can pass ``F.lit(0)`` explicitly."""
    from scylla_migrator_spark.analytics.similarity import dot, norm

    if block_col is None:
        raise ValueError(
            "block_col is required: pass a blocking column (e.g. "
            "similarity.lsh_bucket(...)) or F.lit(0) explicitly for all-pairs"
        )
    # norms materialized BELOW the self-join: cosine(a,b) per pair would
    # re-fold |a| and |b| for every candidate — 3 array folds per pair
    # instead of 1 (the same trick as knn_graph; measured ~2.5x here)
    v = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        block_col.alias("blk"),
    ).withColumn("nrm", norm(F.col("v")))
    a, b = v.alias("a"), v.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, on=[F.col("a.blk") == F.col("b.blk"), F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def benchmark_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share >=
    ``min_hits`` distinct word n-gram shingles with an evaluation/benchmark
    set (the standard n-gram-overlap contamination check used before
    training-data release).

    Plan shape for 100 TB: the benchmark side is an eval set (thousands of
    documents, millions of distinct shingles at most) while the corpus side
    is the 100 TB table, so the distinct benchmark shingle set is explicitly
    ``broadcast()`` and the corpus-side explode joins against it map-side —
    no shuffle of corpus shingles at all. The output carries the distinct
    hit-shingle count per contaminated document so callers can threshold by
    severity.
    """
    bench_grams = (
        benchmark.select(F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("__g"))
        .distinct()
    )
    corpus_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("__g")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
        .filter(F.col("n_hit_grams") >= min_hits)
    )
    return hits


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    tau: float = 0.25,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings and pruning, within each cluster, every vector
    that is cosine-similar (>= ``tau``) to a lower-id cluster member — one
    survivor per semantic group, deterministic keeper rule.

    Plan shape (the at-scale design): centroid assignment is a broadcast
    argmax (ivf_assign — no shuffle), the candidate join is equi-keyed on
    ``centroid_id`` so pair work is sum of squared CLUSTER sizes, never the
    corpus square. At 100 TB: write assigned vectors partitioned by
    centroid_id, run per-partition joins with AQE skew splitting; cluster
    count scales with corpus size to bound cluster width (the paper uses
    ~0.1%% of n).

    Returns (id, centroid_id, kept): kept=false rows are the prune list."""
    from scylla_migrator_spark.analytics.similarity import ivf_assign, norm

    # persisted: the frame is referenced three times below (both self-join
    # sides + the final kept-join); uncached, each reference re-runs the
    # scan and the per-row centroid argmax. The norm is computed ONCE per
    # row here instead of inside the pair predicate — inline cosine() would
    # re-fold both norms per PAIR (|cluster| times per vector); the cached
    # value is the same norm(v) expression, so dot/(na*nb) is bit-identical
    # to cosine(a.v, b.v).
    assigned = ivf_assign(df, centroids, id_col, vec_col).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"), "centroid_id"
    ).withColumn("nv", norm(F.col("v"))).persist()
    try:
        # SINGLE assignment pass: eagerly checkpoint the slim
        # (id, centroid_id) projection (two small columns, never the
        # vectors) so the argmax runs exactly once — the eager action also
        # populates the cache the self-join below reads. The prune list is
        # checkpointed too (it is small — pruned ids only) so the cached
        # full frame can be RELEASED before returning: a bare .persist()
        # left here accumulates blocks across every caller in a long
        # session, and checkpointing the full output would write the whole
        # corpus (vectors included) to block storage. localCheckpoint
        # blocks are GC'd with the returned frame.
        slim = assigned.select(F.col(id_col), F.col("centroid_id")).localCheckpoint(
            eager=True
        )
        a, b = assigned.alias("a"), assigned.alias("b")
        cand = (
            a.join(
                b,
                on=[
                    F.col("a.centroid_id") == F.col("b.centroid_id"),
                    F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                ],
            )
            # null-safety BEFORE the Arrow edge, mirroring what the inline
            # cosine expression did implicitly: a null vector, a vector
            # containing null elements (either makes norm(v) null), or a
            # length-mismatched pair (zip_with null-pads -> null dot) all
            # evaluated to null >= tau == false and the pair dropped; the
            # numpy scorer would instead crash on ragged/None input
            .filter(
                F.col("a.nv").isNotNull()
                & F.col("b.nv").isNotNull()
                & (F.size(F.col("a.v")) == F.size(F.col("b.v")))
            )
            .select(
                F.col(f"b.{id_col}").alias(id_col),
                F.col("a.v").alias("__va"),
                F.col("b.v").alias("__vb"),
                F.col("a.nv").alias("__na"),
                F.col("b.nv").alias("__nb"),
            )
        )
        # the pair cosine runs at the Arrow edge (mapInPandas), vectorized
        # ACROSS pairs with a per-dimension accumulation loop so each
        # pair's sum is the same left-to-right ((0+p0)+p1)+... fold the
        # JVM dot() computes — bit-identical IEEE results (verified by the
        # DuckDB oracle), ~10x faster than the interpreted HOF fold the
        # pair volume (sum of squared cluster sizes) made the hot path
        id_type = assigned.schema[id_col].dataType.simpleString()

        def _score(batches):
            import numpy as np

            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf[[id_col]]
                    continue
                va = np.asarray(pdf["__va"].tolist(), dtype=np.float64)
                vb = np.asarray(pdf["__vb"].tolist(), dtype=np.float64)
                acc = np.zeros(len(pdf), dtype=np.float64)
                for j in range(va.shape[1]):
                    acc = acc + va[:, j] * vb[:, j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    # 0/0 (a zero-norm pair) -> nan, and nan >= tau is
                    # False — the same drop the JVM null division produced
                    cos = acc / (pdf["__na"].to_numpy() * pdf["__nb"].to_numpy())
                yield pdf.loc[cos >= tau, [id_col]]

        pruned = (
            cand.mapInPandas(_score, schema=f"{id_col} {id_type}")
            .distinct()
            .withColumn("__pruned", F.lit(True))
            .localCheckpoint(eager=True)
        )
    finally:
        assigned.unpersist()
    return slim.join(pruned, on=id_col, how="left").select(
        F.col(id_col),
        F.col("centroid_id"),
        F.col("__pruned").isNull().alias("kept"),
    )


def _md5_long60(col: Column) -> Column:
    """First 15 hex chars of md5 as a bigint — 60 bits of entropy, needed
    where hash EQUALITY is treated as content equality across a large
    window population (the 32-bit _md5_int birthday-collides from ~77k
    distinct values — fine for MinHash minima, fatal for verbatim-dup
    keys). 15 hex digits stay inside signed-64 range on both engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shared_windows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, pos, wh, n_docs) for every n-token window position: wh is the
    60-bit window hash, n_docs the number of DISTINCT documents containing
    that window — the shared substrate of substring_duplication and
    longest_shared_run. One shingle pass; the distinct-doc count collapses
    to (window, doc) partials map-side; the join back carries an 8-byte
    key + a count, never window text."""
    wins = df.select(
        F.col(id_col), F.posexplode(shingles(F.col(text_col), n)).alias("pos", "gram")
    ).select(id_col, "pos", _md5_long60(F.col("gram")).alias("wh"))
    freq = (
        wins.select("wh", id_col)
        .distinct()
        .groupBy("wh")
        .agg(F.count("*").alias("n_docs"))
    )
    return wins.join(freq, "wh")


def substring_duplication(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Exact-substring duplication signal (the window-granular form of Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    for each document, the fraction of its n-token windows that also occur
    verbatim in at least one OTHER document.

    Output: (id, n_windows, dup_windows, dup_frac) where dup_frac is rounded
    to 6 dp. Documents shorter than ``n`` tokens contribute their whole text
    as a single window (the shingles() short-doc rule), so every document
    gets a score.

    Scale shape: see _shared_windows — equi-join on a 60-bit window hash;
    no pair table is ever formed, unlike the Jaccard/MinHash family. This
    detects VERBATIM cross-document substrings, the suffix-array use case,
    at equi-join cost."""
    scored = _shared_windows(df, text_col, id_col, n).select(
        F.col(id_col), (F.col("n_docs") >= 2).cast("int").alias("is_dup")
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_windows"),
        F.sum("is_dup").alias("dup_windows"),
        F.round(F.sum("is_dup") / F.count("*"), 6).alias("dup_frac"),
    )


def longest_shared_run(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Longest duplicated-substring approximation: per document, the longest
    CONSECUTIVE run of n-token windows each shared verbatim with some other
    document — the window-granular stand-in for the suffix-array longest
    duplicated substring (a run of r shared windows certifies a shared
    substring of r+n-1 tokens when the sharing partner is the same; it is an
    upper-bound certificate otherwise).

    Plan: _shared_windows, then islands-and-gaps (pos - row_number, both
    per-doc window functions — AQE coalesces the doc-keyed shuffles).
    Output: (id, max_dup_run) with 0 for documents sharing no window."""
    from pyspark.sql import Window

    shared = (
        _shared_windows(df, text_col, id_col, n)
        .filter(F.col("n_docs") >= 2)
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = shared.select(
        F.col(id_col), (F.col("pos") - F.row_number().over(w)).alias("grp")
    )
    max_run = (
        runs.groupBy(id_col, "grp")
        .agg(F.count("*").alias("run"))
        .groupBy(id_col)
        .agg(F.max("run").alias("max_run"))
    )
    return df.select(id_col).join(max_run, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("max_run"), F.lit(0)).cast("long").alias("max_dup_run"),
    )


def intra_doc_duplication(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """WITHIN-document duplication: the fraction of a document's n-token
    windows that are repeats of an earlier window in the SAME document
    (copy-paste boilerplate, looping generations) — the intra-doc complement
    of substring_duplication's cross-doc signal.

    intra_dup_frac = 1 - distinct_windows / total_windows. Pure per-document
    column expression (array_distinct over the shingle array) — no shuffle,
    no join; runs in the scan stage at any scale."""
    sh = shingles(F.col(text_col), n)
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_windows"),
        distinct.cast("long").alias("n_distinct_windows"),
        F.round(F.lit(1) - distinct / total, 6).alias("intra_dup_frac"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, slide a
    window of ``window`` consecutive hashes, keep the minimum of each
    window. The guarantee that MinHash/SimHash lack: any shared run of
    at least ``window + k - 1`` tokens produces at least one IDENTICAL
    selected fingerprint in both documents — local plagiarism detection
    with POSITIONAL robustness, at a 1/~(window/2) sampling rate instead
    of all-windows (substring_duplication's denser variant).

    Output: (id, fp) — one row per DISTINCT selected fingerprint per
    document. Pure column expressions (transform/slice/array_min over
    the hash array); the explode emits only selected minima, so the
    shuffled volume is ~2/window of the window count. Documents shorter
    than k tokens hash their whole text (the shingles() short-doc rule);
    documents with fewer than ``window`` k-grams keep their single
    global minimum.

    Implementation note: the sliding minimum is an elementwise least()
    over ``window`` zipped SHIFTED SLICES of the hash array — the same
    trick shingles() uses — because an index-transform lambda
    ``i -> array_min(slice(hs, i, w))`` would re-evaluate the whole
    tokenizer+md5 subtree once per window (the documented HOF
    per-element tax)."""
    hs = F.transform(shingles(F.col(text_col), k), lambda g: _md5_long60(g))
    width = F.greatest(F.size(hs) - F.lit(window - 1), F.lit(0))
    shifted = [F.slice(hs, i + 1, width) for i in range(window)]
    wins = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.least(*[s[str(i)] for i in range(window)]),
    )
    fps = F.when(F.size(hs) < window, F.array(F.array_min(hs))).otherwise(wins)
    carry = [F.col(c) for c in (carry_cols or [])]
    return df.select(
        F.col(id_col), *carry, F.explode(F.array_distinct(fps)).alias("fp")
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Exact token-SET Jaccard similarity join by PREFIX FILTERING
    (All-Pairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): all same-block pairs with Jaccard(tokens_a, tokens_b) >= t,
    generated WITHOUT indexing every token.

    Under a global rare-first total order (document frequency asc, token
    asc), a set of size s only indexes its first ``s - ceil(t*s) + 1``
    tokens. If two sets satisfy the size filter (``t * max <= min``,
    itself implied by Jaccard >= t) and share NO prefix token, their
    smallest common token would have to sit in both suffixes — bounding
    the overlap below ``t * max`` and contradicting Jaccard >= t. So the
    prefix-prefix equi-join loses nothing (the standard prefix-filter
    lemma; machine-checked against the unblocked oracle).

    This is the scale complement to the plain inverted index
    (ngram_jaccard_pairs): FREQUENT tokens sort LAST and fall out of
    every prefix, so the stop-token join-bucket blowup never forms —
    the hot keys are exactly the ones never indexed. Work scales with
    co-occurrences of RARE tokens.

    The threshold is a rational ``threshold_num/threshold_den`` so every
    filter comparison (prefix length, size filter, final verification)
    is exact integer arithmetic — no float boundary can disagree with an
    oracle. Verification computes the true intersection by joining the
    candidate pairs back to full token sets. Output: (id_a, id_b,
    jaccard) with id_a < id_b, jaccard rounded to 6 dp."""
    tn, td = threshold_num, threshold_den
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    # the exploded token table feeds FOUR consumers (the df-count agg, the
    # ordered prefix, and both verification sides); materialize it once so
    # the corpus is tokenized once, not four times (measured 6.4 -> 5.4 s
    # at sf0.1 — the r7 bench drift was exactly these recomputes getting
    # slower with box state). Blocks are executor-local and token-row
    # sized — the same table the dfc and verify joins already shuffle.
    tok = base.select(
        "doc_id", "blk", "sz", F.explode("toks").alias("w")
    ).localCheckpoint(eager=True)
    dfc = tok.groupBy("w").agg(F.count("*").alias("dfc"))
    from pyspark.sql.window import Window

    ordered = tok.join(dfc, "w").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("dfc", "w")
        ),
    )
    # prefix length s - ceil(t*s) + 1, with ceil(n*s/d) = (n*s + d - 1) DIV d
    prefix = ordered.filter(
        F.col("pos")
        <= F.col("sz") - ((F.col("sz") * tn + (td - 1)) / td).cast("long") + 1
    ).select("doc_id", "blk", "sz", "w")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.w") == F.col("b.w"),
                F.col("a.doc_id") < F.col("b.doc_id"),
                # size filter: t * max <= min, exact in integers
                F.greatest(F.col("a.sz"), F.col("b.sz")) * tn
                <= F.least(F.col("a.sz"), F.col("b.sz")) * td,
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("id_a"), F.col("w"), F.col("sz").alias("sza"))
    tb = tok.select(F.col("doc_id").alias("id_b"), F.col("w"), F.col("sz").alias("szb"))
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "w"])
        .groupBy("id_a", "id_b", "sza", "szb")
        .agg(F.count("*").alias("o"))
    )
    # Jaccard >= t  <=>  o * d >= t_n * (sza + szb - o), integer-exact
    return inter.filter(
        F.col("o") * td >= (F.col("sza") + F.col("szb") - F.col("o")) * tn
    ).select(
        "id_a",
        "id_b",
        F.round(
            F.col("o") / (F.col("sza") + F.col("szb") - F.col("o")), 6
        ).alias("jaccard"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """Directed token-SET CONTAINMENT join by prefix filtering: all
    same-block ordered pairs (a, b), a != b, with

        C(a -> b) = |tokens_a INTERSECT tokens_b| / |tokens_a| >= t

    — the asymmetric complement of jaccard_prefix_pairs. Jaccard misses
    the quote/excerpt case entirely (a 50-token excerpt inside a
    5000-token page has Jaccard ~ 0.01 but containment 1.0); containment
    is the dedup-family operator for detecting EMBEDDED duplication:
    quoted passages, boilerplate-wrapped reposts, chunk-of-a-document
    training leaks.

    Prefix filter (directed form of the Bayardo/Xiao lemma): if
    C(a->b) >= t then a misses at most ``sz_a - ceil(t*sz_a)`` of its own
    tokens from b, so among a's first ``sz_a - ceil(t*sz_a) + 1`` tokens
    under the global rare-first order at least one is in b — the PROBE
    side indexes only that prefix, and loses nothing. The INDEXED side
    must carry its full token set (the denominator ignores b, so b's
    suffix can still hold a's prefix tokens); hot tokens therefore keep
    full posting lists on the b side, but they enter the join only
    through the rare-first PROBE prefixes, which is exactly where the
    global order makes them scarce. The size filter
    ``sz_b * td >= sz_a * tn`` (from |A∩B| <= sz_b) prunes
    small-b candidates before the verify. All threshold comparisons are
    exact integer arithmetic on the rational t = tn/td; the oracle is
    the unblocked pairwise definition, proving the filter lossless.
    Output: (id_a, id_b, overlap, containment[6 dp]) — DIRECTED, so a
    contained-in-b and b-contained-in-a are distinct rows."""
    tn, td = threshold_num, threshold_den
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    # five consumers of the exploded token table here (dfc, prefix, the
    # full indexed b side, both verification sides) — tokenize ONCE (the
    # jaccard_prefix_pairs rationale)
    tok = base.select(
        "doc_id", "blk", "sz", F.explode("toks").alias("w")
    ).localCheckpoint(eager=True)
    dfc = tok.groupBy("w").agg(F.count("*").alias("dfc"))
    from pyspark.sql.window import Window

    ordered = tok.join(dfc, "w").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("dfc", "w")),
    )
    # probe prefix: sz - ceil(t*sz) + 1 rare-first tokens, ceil in integers
    prefix = ordered.filter(
        F.col("pos")
        <= F.col("sz") - ((F.col("sz") * tn + (td - 1)) / td).cast("long") + 1
    ).select("doc_id", "blk", "sz", "w")
    a, b = prefix.alias("a"), tok.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.w") == F.col("b.w"),
                F.col("a.doc_id") != F.col("b.doc_id"),
                # |A INTERSECT B| <= sz_b, so need sz_b >= ceil(t*sz_a)
                F.col("b.sz") * td >= F.col("a.sz") * tn,
            ],
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("id_a"), "w", F.col("sz").alias("sza"))
    tb = tok.select(F.col("doc_id").alias("id_b"), "w")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "w"])
        .groupBy("id_a", "id_b", "sza")
        .agg(F.count("*").alias("overlap"))
    )
    return inter.filter(F.col("overlap") * td >= F.col("sza") * tn).select(
        "id_a",
        "id_b",
        "overlap",
        F.round(F.col("overlap") / F.col("sza"), 6).alias("containment"),
    )


def edit_distance_pairs(
    keys: DataFrame,
    *,
    id_col: str = "doc_id",
    key_col: str = "key",
    partition_col: str = "source",
    q: int = 4,
    k_max: int = 3,
    max_key_freq: int | None = None,
) -> DataFrame:
    """Blocked edit-distance near-dup over normalized string keys: all
    same-partition pairs with ``levenshtein(key_a, key_b) <= k_max``,
    without an all-pairs join.

    Candidate generation is the Gravano et al. (VLDB 2001) q-gram COUNT
    FILTER: one edit destroys at most q of a string's (len-q+1)
    overlapping character q-grams, so ``ed(a,b) <= K`` implies the
    MULTISET q-gram intersection is ``>= max(la, lb) - q + 1 - K*q``.
    Each gram is occurrence-RANKED (the k-th 'abcd' only matches the
    k-th 'abcd'), so a plain equi-join + COUNT(*) per pair computes
    exactly ``sum(min(tf_a, tf_b))``. Keys too short for a positive
    bound pair all-to-all within (partition, short) — a bounded fringe —
    plus the short-vs-length-adjacent-long border. Verification uses
    Spark's THRESHOLDED levenshtein (early-exit above K: O(min_len*K),
    not O(len^2)).

    ``max_key_freq`` is the STOP-GRAM control (the hot-key failure class
    ``ngram_jaccard_pairs`` caps with max_doc_freq): a (partition, gram,
    occ) index key held by more than ``max_key_freq`` strings would make
    its join bucket quadratic in corpus size, so it is dropped from the
    inverted index. Dropping is made LOSSLESS by a per-string dropped-gram
    budget:

    * a pair's VISIBLE intersection loses at most ``min(drop_a, drop_b)``
      gram-occurrences (a dropped key subtracts from the intersection only
      when BOTH strings held it), so the count bound is relaxed to
      ``shared_visible >= max(la, lb) - q + 1 - K*q - least(drop_a,
      drop_b)``;
    * a string whose own relaxed bound can no longer certify anything
      (``drop > len - q - K*q`` — even a full visible overlap elsewhere
      cannot reach the bound, and a true match might share ONLY dropped
      grams and never meet in the join) is routed to the bounded fringe
      and paired directly against its partition. The cap + budget choice
      keeps that fringe small: only strings made almost entirely of stop
      grams land there.

    With ``max_key_freq=None`` every drop count is zero and the plan
    degenerates exactly to the uncapped filter. Output: (id_a, id_b,
    dist) with id_a < id_b, dist <= k_max.
    """
    min_len_for_filter = k_max * q + q  # bound > 0 needs len - q + 1 - K*q >= 1
    # ks feeds SIX plan branches (long/short split, border, fringe, and both
    # key-attach joins): without a lineage cut Catalyst re-plans the key
    # projection per branch and the physical plan carries ~20 scans / ~50
    # exchanges of the same subtree (measured; exchange reuse dedupes
    # execution but not planning). Only ks is checkpointed — one row per
    # string, the generator materialization lesson from the simhash/minhash
    # pair family. `visible` (per-(doc, gram, occ) rows, both sides of the
    # candidate self-join) is deliberately NOT cut: its branches plan against
    # the ks leaf, and an eager job on the exploded table measured slower
    # than the exchange reuse it would replace.
    ks = (
        keys.select(
            F.col(id_col).alias("doc_id"),
            F.col(partition_col).alias("part"),
            F.col(key_col).alias("key"),
        )
        .withColumn("klen", F.length("key"))
        .localCheckpoint(eager=True)
    )

    long_keys = ks.filter(F.col("klen") >= min_len_for_filter)
    grams = long_keys.select(
        "doc_id",
        "part",
        "klen",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("klen") - (q - 1)),
                lambda i: F.col("key").substr(i, F.lit(q)),
            )
        ).alias("g"),
    )
    # occurrence rank turns the bag of grams into (gram, 1st), (gram, 2nd)...
    # so the self-equi-join computes the MULTISET intersection size
    ranked = (
        grams.groupBy("doc_id", "part", "klen", "g")
        .agg(F.count("*").alias("tf"))
        .select(
            "doc_id",
            "part",
            "klen",
            "g",
            F.explode(F.sequence(F.lit(1), F.col("tf"))).alias("occ"),
        )
    )

    if max_key_freq is not None:
        # both flags come from WINDOW counts over the ranked table (index
        # bucket population, then per-string dropped total) — the same
        # shuffle keys a groupBy+join-back would use, minus the joins
        from pyspark.sql.window import Window

        kf_w = Window.partitionBy("part", "g", "occ")
        doc_w = Window.partitionBy("doc_id")
        flagged = ranked.withColumn(
            "hot", (F.count("*").over(kf_w) > max_key_freq).cast("int")
        ).withColumn("dropped", F.sum("hot").over(doc_w))
        # budget: a string stays in the filtered path only while its own
        # relaxed bound is still positive against ANY partner
        visible = flagged.filter(
            (F.col("hot") == 0)
            & (F.col("dropped") <= F.col("klen") - q - k_max * q)
        ).select(
            "doc_id", "part", "klen", "g", "occ", F.col("dropped").alias("drop_n")
        )
        fringe_long = (
            flagged.filter(F.col("dropped") > F.col("klen") - q - k_max * q)
            .select("doc_id", "part")
            .distinct()
        )
    else:
        fringe_long = None
        visible = ranked.withColumn("drop_n", F.lit(0))

    a, b = visible.alias("a"), visible.alias("b")
    cand_long = (
        a.join(
            b,
            on=[
                F.col("a.part") == F.col("b.part"),
                F.col("a.g") == F.col("b.g"),
                F.col("a.occ") == F.col("b.occ"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.klen").alias("la"),
            F.col("b.klen").alias("lb"),
            F.col("a.drop_n").alias("da"),
            F.col("b.drop_n").alias("db"),
        )
        .agg(F.count("*").alias("shared"))
        .filter(
            F.col("shared")
            >= F.greatest(F.col("la"), F.col("lb"))
            - (q - 1)
            - k_max * q
            - F.least(F.col("da"), F.col("db"))
        )
        .select("id_a", "id_b")
    )

    short = ks.filter(F.col("klen") < min_len_for_filter)
    sa, sb = short.alias("a"), short.alias("b")
    cand_short = sa.join(
        sb,
        on=[
            F.col("a.part") == F.col("b.part"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        ],
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    # short-x-long pairs: lengths differing by > k_max cannot be within
    # k_max edits, so only the length-adjacent border is reachable
    border = sa.join(
        long_keys.alias("b"),
        on=[
            F.col("a.part") == F.col("b.part"),
            (F.col("b.klen") - F.col("a.klen")) <= k_max,
        ],
    ).select(
        F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
        F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
    )
    cand = cand_long.unionByName(cand_short).unionByName(border)
    if fringe_long is not None:
        # budget-exhausted strings pair directly against every long key in
        # their partition (short keys are already covered by the border)
        fl, al = fringe_long.alias("a"), long_keys.alias("b")
        cand_fringe = fl.join(
            al,
            on=[
                F.col("a.part") == F.col("b.part"),
                F.col("a.doc_id") != F.col("b.doc_id"),
            ],
        ).select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
        cand = cand.unionByName(cand_fringe)
    cand = cand.distinct()

    kk = ks.select("doc_id", "key")
    joined = (
        cand.join(
            kk.select(F.col("doc_id").alias("id_a"), F.col("key").alias("ka")),
            "id_a",
        )
        .join(
            kk.select(F.col("doc_id").alias("id_b"), F.col("key").alias("kb")),
            "id_b",
        )
        .withColumn(
            "dist", F.levenshtein(F.col("ka"), F.col("kb"), k_max).cast("int")
        )
    )
    return joined.filter(F.col("dist") >= 0).select("id_a", "id_b", "dist")


def cross_corpus_lsh_candidates(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidates BETWEEN two corpora: which documents of B look
    like documents of A — the cross-snapshot / cross-dataset near-dedup
    (e.g. new crawl vs existing training set, vendor dataset vs in-house
    corpus). The two id spaces may overlap: the union is keyed internally
    on a side-salted id (``a:<id>`` / ``b:<id>``), so two different
    documents that happen to share an id can never silently merge their
    shingle sets into one signature; the salt is stripped on output.

    Same banded MinHash join as minhash_lsh_candidates, but signatures are
    computed ONCE over the union and the bucket join keeps only cross-side
    pairs — no within-corpus pair ever materializes, and B never needs A's
    text (at scale, A's banded signature table is the precomputed index the
    new snapshot probes). Output: (id_a, id_b) with id_a from A, id_b
    from B."""
    tagged = df_a.select(
        F.col(id_col), F.col(text_col), F.lit("a").alias("__side")
    ).unionByName(
        df_b.select(F.col(id_col), F.col(text_col), F.lit("b").alias("__side"))
    ).withColumn(
        "__uid", F.concat(F.col("__side"), F.lit(":"), F.col(id_col).cast("string"))
    )
    sides = tagged.select("__uid", id_col, "__side")
    sig_df = minhash_signatures(tagged, text_col, "__uid", num_hashes).join(
        sides, "__uid"
    )
    banded = _banded(sig_df, [id_col, "__side"], num_hashes, bands)
    left = banded.filter(F.col("__side") == "a").alias("l")
    right = banded.filter(F.col("__side") == "b").alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_hash") == F.col("r.band_hash"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 16,
) -> DataFrame:
    """Segment-level (passage-level) corpus dedup with document
    reconstruction — the CCNet / Dolma "remove duplicated paragraphs,
    keep the document" operation (Wenzek et al. 2019 §3.1; exact dedup in
    the reference operates at whole-row granularity, ``Cassandra.scala``
    digest compare — this is its sub-document extension for training
    corpora).

    Each document is cut into NON-overlapping ``seg_tokens``-token
    segments (the last may be shorter); an occurrence of a segment is
    kept iff it is the corpus-wide FIRST occurrence of that segment text
    under the total order (doc_id, seg_idx) — later repeats, whether in
    other documents or later in the same document, are dropped. Each
    document is then re-assembled from its surviving segments in order.

    Output: one row per input document —
    (id_col, n_segments, kept_segments, cleaned_text), where
    ``cleaned_text`` is '' when every segment was a repeat.

    Scale shape: segmentation is text.chunk_documents at
    ``chunk_size == stride == seg_tokens`` (non-overlapping cover; one
    materialized-token scan-stage projection, no Python — and ONE
    segmentation implementation to maintain). Shuffle 1 hash-partitions
    segment occurrences by a 128-bit digest of the segment text to rank
    first-vs-repeat (the segment text rides along once — reconstruction
    needs it back, so carrying it here replaces a second join that would
    shuffle the same bytes anyway); shuffle 2 regroups kept segments by
    document. Both keys are high-cardinality and skew-free by
    construction (digests), and no pair table or cross join ever forms —
    cost is O(corpus segments), the same envelope CCNet runs at web
    scale."""
    from pyspark.sql import Window

    from scylla_migrator_spark.analytics.text import chunk_documents

    seg = chunk_documents(
        df, text_col, id_col, chunk_size=seg_tokens, stride=seg_tokens
    ).select(
        id_col,
        (F.col("chunk_idx") + F.lit(1)).alias("seg_idx"),
        F.col("chunk_text").alias("seg_text"),
    )
    w = Window.partitionBy(F.md5(F.col("seg_text"))).orderBy(id_col, "seg_idx")
    ranked = seg.withColumn("__rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("__rn") == 1, F.struct(F.col("seg_idx"), F.col("seg_text"))
    )
    return ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(kept_struct).alias("kept_segments"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s.getField("seg_text")
            ),
        ).alias("cleaned_text"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo SIGMOD'95
    merge/purge): sort records by a blocking key and emit every pair
    within ``window`` positions — the classic entity-resolution candidate
    generator that catches near-dups whose keys are lexicographically
    ADJACENT rather than token-identical (typos in the leading field,
    serial numbers, names), complementing the LSH/q-gram blockers.

    Scale shape: the global rank comes from
    operators/ranking.py::distributed_row_number (range partitioner +
    per-partition offsets — NEVER a single-reducer window), and the
    within-window pair join is an EQUI-join on the rank bucket
    ``rn div window`` (each left row probes its own and the next bucket,
    so a pair at gap <= window always shares a probed bucket) with the
    exact gap filter after — no inequality join. Output: (id_a, id_b,
    rank_gap), ordered pairs by rank; tie-safe because (key, id) is a
    total order."""
    from scylla_migrator_spark.operators.ranking import distributed_row_number

    ranked = distributed_row_number(
        df.select(F.col(id_col), F.col(key_col).alias("__key")),
        ["__key", id_col],
        "rn",
    )
    a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("rn").alias("rn_a"),
        F.explode(
            F.array(
                (F.col("rn") / window).cast("long"),
                (F.col("rn") / window).cast("long") + 1,
            )
        ).alias("bkt"),
    )
    b = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("rn").alias("rn_b"),
        (F.col("rn") / window).cast("long").alias("bkt"),
    )
    return (
        a.join(b, "bkt")
        .filter(
            (F.col("rn_b") - F.col("rn_a") >= 1)
            & (F.col("rn_b") - F.col("rn_a") <= window)
        )
        .select("id_a", "id_b", (F.col("rn_b") - F.col("rn_a")).alias("rank_gap"))
        .distinct()
    )
