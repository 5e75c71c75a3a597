"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — at 100 TB these run
inside WholeStageCodegen with zero Python; every operator is a narrow
projection (no shuffle).

Determinism contract: token hashing uses md5 (available in both Spark and
DuckDB) so every operator here is oracle-checkable with ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small fixed stopword list for quality scoring — deliberately tiny and
# deterministic (quality scoring, not linguistics)
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

# marker-word profiles for the language-ID heuristic (n-gram-style scoring
# over function words; profiles are data, not code)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(col), r"\s+")


def _stats_side(df: DataFrame, broadcast_stats: bool) -> DataFrame:
    """Join-side hint policy for VOCABULARY-SIZED statistics tables
    (unigram counts, bigram prefixes, document frequencies, continuation
    counts).

    These tables are small at test scale but unbounded at corpus scale —
    a 100 TB heterogeneous corpus has 10^8-10^9 distinct tokens, past
    Spark's broadcast limit and the driver's memory. A forced
    ``F.broadcast`` hint would remove Catalyst's freedom to fall back to
    a shuffle join, so the default here is NO hint: AQE measures the
    built side at runtime and broadcasts exactly when it is actually
    small (same plan as the hint at fixture scale, a sort-merge join at
    web scale). Callers that KNOW their vocabulary is bounded (e.g. a
    fixed tokenizer vocab) can pass ``broadcast_stats=True`` to pin the
    broadcast.

    One-row SCALAR tables (corpus totals, vocab size) keep their
    explicit ``F.broadcast`` at the call sites — a single row is safe at
    any scale and the hint avoids a pointless exchange."""
    return F.broadcast(df) if broadcast_stats else df


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy token count: word-chunks plus punctuation marks,
    approximating subword segmentation cost as ceil(chars/4) per word —
    the standard ~4-chars-per-token heuristic, computed exactly and
    deterministically."""
    words = tokens(col)
    per_word = F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("int"))
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document: length, token stats, stopword
    ratio, alpha ratio. Ratios are rounded to 6 dp for cross-engine
    determinism."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    return df.select(
        "*",
        F.length(t).alias("n_chars_computed"),
        n_tok.alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)) / n_tok, 6
        ).alias("avg_token_len"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(alpha_chars / F.length(t), 6).alias("alpha_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language ID: score each language profile by marker hits,
    pick the argmax (ties broken by profile order); 'und' when no marker
    hits. A 100 TB-friendly stand-in for n-gram language ID — one projection,
    no shuffle, no UDF."""
    toks = tokens(F.col(text_col))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # argmax by (score, profile order): array_max on struct compares fieldwise;
    # to keep profile-order tiebreak, reverse-index the profiles
    indexed = [
        F.struct(
            s.getField("score").alias("score"),
            F.lit(len(scores) - i).alias("prio"),
            s.getField("lang").alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*indexed))
    pred = F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def _md5_int(col: Column) -> Column:
    """First 8 hex chars of md5 as a bigint — a deterministic 32-bit hash
    expressible identically in DuckDB (both engines have md5 + conv)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# the affine rehash family shared by MinHash (dedup.py) and the count-min
# sketch below: h_i(x) = (x * (2i+1) + 7919*(i+1)) mod P, P a 32-bit prime.
# One definition — the SQL oracles hard-code the same constants by contract.
AFFINE_P = 4_294_967_311
AFFINE_COEFFS = [(2 * i + 1, 7919 * (i + 1)) for i in range(64)]


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles via zipped shifted slices (no UDF).

    Implementation note: an index-transform
    ``transform(sequence(...), i -> concat_ws(slice(toks, i+1, n)))`` puts the
    whole tokenizer subtree inside the lambda, and higher-order functions
    re-evaluate the lambda body per ELEMENT — the regex split would run once
    per shingle (~O(tokens^2) per row; measured ~7x slower). Zipping n shifted
    slices keeps the tokenizer at O(1) evaluations per row."""
    toks = tokens(col)
    width = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, width) for i in range(n)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
    )
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(grams)


# PII patterns kept to the regex subset Java regex and RE2 (DuckDB) share,
# so the redaction is oracle-checkable. Order matters: emails first (their
# domain could otherwise part-match the IP pattern), then IPs, then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """PII scrubbing for training corpora: emails / IPv4s / phone numbers
    replaced by typed placeholders, with per-kind match counts for audit.

    Pure chained ``regexp_replace`` + ``regexp_count`` column expressions —
    whole-stage codegen, no shuffle, no UDF; the pattern subset is chosen to
    behave identically under Java regex (Spark) and RE2 (DuckDB) so the
    operator is oracle-checkable. Counts are computed on the ORIGINAL text
    (before any replacement) so kinds don't mask each other."""
    t = F.col(text_col)
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(t, F.lit(pat)))
    red = t
    for _, pat, placeholder in PII_PATTERNS:
        red = F.regexp_replace(red, pat, placeholder)
    return out.withColumn(out_col, red)


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Sequence packing for training: concatenate each shard's documents in
    ``id_col`` order and chunk the token stream at ``capacity`` boundaries.

    Output per document: ``bin_id`` (which training sequence it starts in)
    and ``bin_offset`` (token offset within that bin). This is the
    concat-and-chunk packing used for LLM pretraining batches (documents
    flow across bin boundaries; no padding waste), not best-fit bin packing.

    Scale shape: ONE window cumsum partitioned by shard — each shard packs
    independently, so the window never globally sorts the corpus; shards
    are the parallelism unit exactly as in a sharded tokenizer run."""
    from pyspark.sql import Window

    tok = token_count(F.col(text_col))
    w = Window.partitionBy(shard_col).orderBy(id_col)
    offset_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        df.select(shard_col, id_col, tok.alias("n_tokens"))
        .withColumn("bin_id", F.floor(offset_before / capacity).cast("long"))
        .withColumn("bin_offset", (offset_before % capacity).cast("long"))
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", frac_cap: float = 0.2
) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of a document's
    word bigrams taken by its single most frequent bigram (Rae et al. 2021
    use top-n-gram character fraction; this is the word-count analog), plus
    an ``is_repetitive`` flag at ``frac_cap``.

    Shape: posexplode tokens -> lead() window forms bigrams -> two
    aggregations. Deliberately NOT a higher-order-function fold over the
    token array: transform+element_at re-inlines the split() per lambda
    element (O(n^2) re-evaluation — see simhash's history), while
    explode+window does O(n) work per document and parallelizes across the
    corpus. All three shuffles key on doc_id(+gram), so AQE coalesces them
    and no single document's work exceeds one task."""
    from pyspark.sql import Window

    base = df.select(id_col, tokens(F.col(text_col)).alias("t")).select(
        id_col, F.size("t").alias("n_tokens"), F.posexplode("t").alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = base.select(
        id_col,
        "n_tokens",
        F.concat_ws(" ", F.col("tok"), F.lead("tok").over(w)).alias("gram"),
        F.lead("tok").over(w).isNotNull().alias("complete"),
    ).filter("complete")
    counts = grams.groupBy(id_col, "n_tokens", "gram").agg(F.count("*").alias("cnt"))
    frac = F.round(F.max("cnt") / (F.col("n_tokens") - 1), 6)
    return (
        counts.groupBy(id_col, "n_tokens")
        .agg(
            F.max("cnt").alias("top_bigram_count"),
            frac.alias("top_bigram_frac"),
        )
        .withColumn("is_repetitive", F.col("top_bigram_frac") > F.lit(frac_cap))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: min md5-int over 3-word shingles (MinHash with a
    single hash function — a rolling-hash-style content fingerprint that is
    stable under document reordering of identical shingle sets)."""
    sh = shingles(F.col(text_col))
    hashes = F.transform(sh, _md5_int)
    return df.withColumn(out_col, F.array_min(hashes))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into fixed-size overlapping token chunks (context
    windows for LLM training / retrieval indexing).

    Chunks start at token offsets 1, 1+stride, 2*stride+1, ...; the final
    chunk may be shorter than ``chunk_size``. A start is emitted only if it
    is the first chunk or the previous chunk did not already reach the end
    of the document, so a doc with n <= chunk_size tokens yields exactly one
    chunk and no chunk is a suffix-duplicate of its predecessor.

    Plan shape: one narrow projection (sequence -> slice -> posexplode) with
    no shuffle and no Python; output rows ~= corpus_tokens / stride, each
    carrying only its own chunk text. At 100 TB this is a scan-stage map —
    chunking never becomes a bottleneck stage of its own. The token array
    is MATERIALIZED in its own projection before the per-start transform:
    inlining ``tokens(text)`` inside the lambda embeds the split subtree
    once per chunk, and the plan must not rely on codegen subexpression
    elimination to avoid O(tokens x chunks) re-tokenization on long
    documents."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    all_starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    starts = F.filter(
        all_starts,
        lambda s: (s == F.lit(1)) | (s - F.lit(stride) + F.lit(chunk_size) - F.lit(1) < n),
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_size))
    return toked.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
    ).select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", F.col("chunk_toks")).alias("chunk_text"),
        F.size("chunk_toks").alias("chunk_len"),
    )


def vocab_top_terms(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Corpus-level vocabulary statistics: the top-k tokens by total
    occurrence count with document frequency (tokenizer-training / corpus
    inspection stats).

    Plan shape: explode -> two-level aggregate. The per-(token, doc) count
    collapses map-side (partial aggregation) before the token-level shuffle,
    so the shuffle carries |vocab x docs-touched| rows, not corpus tokens;
    the final top-k is TakeOrderedAndProject (no global sort). Determinism:
    ties broken lexically by token."""
    per_doc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_occurrences"))
    )
    dfreq = (
        df.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        per_doc.join(dfreq, "tok")
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
        .limit(k)
    )


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_stats: bool = False,
) -> DataFrame:
    """Unigram negative-log-likelihood quality score: each document's mean
    -ln p(w) under the corpus's own unigram distribution — the simplest
    member of the perplexity-filter family (documents that "surprise" the
    corpus LM are outliers: boilerplate, noise, wrong language).

    Plan: explode tokens once; the vocab-sized count table joins back to
    the token stream with the ``_stats_side`` policy (AQE-chosen by
    default — broadcast when measured small, shuffle join at web-scale
    vocabularies); total-count is a broadcast one-row scalar. Per-token
    terms are truncated to DECIMAL(18,9) BEFORE the per-document sum so
    the reduction is associative-exact and cross-engine stable (ln
    differs by ulps between libms; 9 dp is far above ulp noise and far
    below any meaningful score difference)."""
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    cnt = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = cnt.agg(F.sum("c").alias("total"))
    scored = (
        toks.join(_stats_side(cnt, broadcast_stats), "w")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            (-F.log(F.col("c") / F.col("total"))).cast("decimal(18,9)").alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("avg_nll"),
    )


def bigram_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the word-bigram distribution — the
    diversity complement of repetition_stats (low entropy = templated /
    repetitive text; the top-bigram fraction only sees the single worst
    offender).

    Shape: shingle pass -> per-(doc, gram) count -> per-doc total -> one
    joined term projection. Per-term -(p ln p) truncates to DECIMAL(18,9)
    pre-sum (order-independent reduction), entropy rounded to 6 dp."""
    grams = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), 2)).alias("gram")
    )
    cnt = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    tot = cnt.groupBy(id_col).agg(F.sum("c").alias("m"))
    p = F.col("c") / F.col("m")
    terms = cnt.join(tot, id_col).select(
        F.col(id_col), (-p * F.log(p)).cast("decimal(18,9)").alias("term")
    )
    return terms.groupBy(id_col).agg(
        F.round(F.sum("term").cast("double"), 6).alias("bigram_entropy")
    )


def word_bigrams(col: Column) -> Column:
    """Array of (w1, w2) structs for adjacent word pairs — ONE zipped pass
    over two shifted slices of the token array (no per-element tokenizer
    re-evaluation; see the shingles() implementation note). Empty for
    texts with fewer than 2 tokens."""
    toks = tokens(col)
    width = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.arrays_zip(
        F.slice(toks, 1, width).alias("w1"), F.slice(toks, 2, width).alias("w2")
    )


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_stats: bool = False,
) -> DataFrame:
    """Conditional bigram-LM negative log likelihood per document: mean
    -ln p(w_i | w_{i-1}) under the corpus's own add-one-smoothed bigram LM —
    the next step up from unigram_nll toward the KenLM-style perplexity
    filters used in corpus curation (documents whose word TRANSITIONS
    surprise the corpus LM: shuffled text, spam, wrong language).

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V), with c(w1,·) the count of
    bigrams starting with w1 and V the unigram vocabulary size. Documents
    with fewer than 2 tokens have no bigrams and are excluded.

    Shape: one zipped-shifted-slices bigram pass (no per-element tokenizer
    re-evaluation). Neither the bigram-transition table nor the PREFIX
    count table gets a forced broadcast hint — both are unbounded at
    corpus scale (transitions grow toward corpus size, prefixes toward
    vocabulary size), so both joins are left to AQE via ``_stats_side``
    (broadcast when measured small, shuffle join when not); only the
    one-row vocab scalar broadcasts unconditionally. Per-term
    DECIMAL(18,9) truncation keeps the transcendental sum shuffle-order
    exact."""
    toks = tokens(F.col(text_col))
    bg = df.select(
        F.col(id_col), F.explode(word_bigrams(F.col(text_col))).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    c1 = c2.groupBy("w1").agg(F.sum("c").alias("cp"))
    vocab = df.select(F.explode(toks).alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    term = (-F.log((F.col("c") + 1) / (F.col("cp") + F.col("v")))).cast(
        "decimal(18,9)"
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(_stats_side(c1, broadcast_stats), "w1")
        .join(F.broadcast(vocab))
        .select(F.col(id_col), term.alias("nll"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("avg_bigram_nll"),
    )


def collocation_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Adjacent-token collocation mining: pointwise mutual information of
    each word bigram against its slot-marginal frequencies — the classic
    collocation-extraction statistic (Church & Hanks 1990). High-PMI
    pairs are multiword units ("new york", "et al"); boilerplate pairs
    score near zero. Used in curation to find templated collocations and
    to seed tokenizer merge candidates.

    PMI(w1, w2) = ln( c12 * M / (cL(w1) * cR(w2)) ) with M the total
    bigram count, cL/cR the first-/second-slot marginals — integer inputs
    throughout, one ln per surviving pair. ``min_count`` prunes the
    hapax tail (PMI is noise below a handful of observations, and the
    support filter is what bounds the output at corpus scale).

    Shape: ONE zipped-shifted-slices bigram pass; the pair table is
    aggregated map-side; slot marginals derive from the PAIR COUNTS (a
    second small aggregation, not a second corpus scan); marginals join
    back onto the min_count-filtered pairs under the ``_stats_side``
    policy (vocab-sized — AQE-chosen join strategy by default; only the
    one-row total broadcasts unconditionally). The min_count support
    filter runs BEFORE the marginal joins, so at corpus scale the probe
    side is the collocation head, not the hapax tail. No row ever
    carries text beyond the two words. Output: (w1, w2, pair_count,
    pmi)."""
    bg = df.select(
        F.col(id_col), F.explode(word_bigrams(F.col(text_col))).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    c_l = c12.groupBy("w1").agg(F.sum("pair_count").alias("cl"))
    c_r = c12.groupBy("w2").agg(F.sum("pair_count").alias("cr"))
    m = c12.agg(F.sum("pair_count").alias("m"))
    pmi = F.round(
        F.log(
            F.col("pair_count").cast("double")
            * F.col("m")
            / (F.col("cl").cast("double") * F.col("cr"))
        ),
        6,
    )
    return (
        c12.filter(F.col("pair_count") >= min_count)
        .join(_stats_side(c_l, broadcast_stats), "w1")
        .join(_stats_side(c_r, broadcast_stats), "w2")
        .join(F.broadcast(m))
        .select("w1", "w2", "pair_count", pmi.alias("pmi"))
    )


def flesch_score(col: Column) -> Column:
    """Flesch reading-ease as a pure column expression, with the
    deterministic approximations used across the engine: words =
    whitespace tokens, sentences = runs of [.!?] floored at 1,
    syllables = vowel-group runs in the lowercased text. Shared by the
    flesch_readability query and the curation readability_filter so the
    gate and the profile can never disagree."""
    n_words = F.size(tokens(col))
    n_sent = F.greatest(F.regexp_count(col, F.lit(r"[.!?]+")), F.lit(1))
    n_syl = F.regexp_count(F.lower(col), F.lit("[aeiouy]+"))
    return (
        F.lit(206.835)
        - F.lit(1.015) * n_words / n_sent
        - F.lit(84.6) * n_syl / n_words
    )


def type_token_ratio(col: Column) -> Column:
    """Per-row type-token ratio (distinct words / words) as a column
    expression — the scan-stage lexical-diversity gate (the
    lexical_diversity query computes the same ratio plus the hapax tail
    through the aggregation path). Blank text is explicitly NULL — the
    split-of-empty-string artifact (tokens('') = ['']) would otherwise
    score a perfect 1.0 — so empty docs drop under any >= threshold
    predicate instead of sailing through."""
    toks = tokens(col)
    return F.when(
        F.length(F.trim(col)) == 0, F.lit(None).cast("double")
    ).otherwise(F.try_divide(F.size(F.array_distinct(toks)), F.size(toks)))


def normalize_text(col: Column) -> Column:
    """Canonical text normalization for dedup keys: lowercase, strip
    punctuation (everything outside [a-z0-9] and whitespace), collapse
    whitespace runs, trim. The standard pre-dedup canonicalization — two
    documents differing only in case/punct/spacing normalize equal. Pure
    column expression; composes into any digest."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


# count-min sketch geometry: d deterministic affine hash rows (the first 4
# of the shared AFFINE family) over a fixed width — integer-exact, so unlike
# the HLL/quantile sketches this one is fully oracle-checkable
CMS_WIDTH = 1024
CMS_ROWS = tuple(AFFINE_COEFFS[:4])


def count_min_buckets(col: Column, row: int) -> Column:
    """The count-min bucket of a token under hash row ``row`` (affine rehash
    of the md5-int, mod width) — deterministic and SQL-replayable."""
    a, b = CMS_ROWS[row]
    return ((_md5_int(col) * a + b) % AFFINE_P) % CMS_WIDTH


def count_min_estimates(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Count-min sketch over the corpus token stream, evaluated on the k
    most frequent tokens: (w, true_count, cms_estimate).

    The sketch is the mergeable frequent-items counterpart of the HLL
    distinct-count path (approx_aggregates): d x width integer counters,
    built with ONE map-side-combined aggregation per hash row over the
    token counts (the shuffle carries (row, bucket, partial) — constant
    size regardless of corpus). Estimate = min over rows of the bucket
    counter; always >= true count (one-sided error), equality whenever no
    collision. Integer-exact, so the whole pipeline has a full value-hash
    oracle — the sketch PATTERN is verified, not just its output shape."""
    cnt = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )

    def rows_for(frame):
        # ONE guaranteed pass per frame: posexplode an array of (row, bucket)
        # structs instead of a d-way self-union (which re-plans the source
        # subtree d times and relies on ReuseExchange to dedup the scans)
        cells = F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    count_min_buckets(F.col("w"), i).alias("bucket"),
                )
                for i in range(len(CMS_ROWS))
            ]
        )
        return frame.select("w", "c", F.explode(cells).alias("cell")).select(
            "w", "c", F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
        )

    sketch = rows_for(cnt).groupBy("row", "bucket").agg(F.sum("c").alias("bc"))
    top = cnt.orderBy(F.desc("c"), F.asc("w")).limit(k)
    return (
        rows_for(top)
        .join(sketch, ["row", "bucket"])
        .groupBy("w", "c")
        .agg(F.min("bc").alias("cms_estimate"))
        .select("w", F.col("c").alias("true_count"), "cms_estimate")
    )


def _hash_sign(h: Column, dim: int) -> Column:
    """+1/-1 from the bit above the bucket bits of a 32-bit token hash —
    THE single sign definition shared by both feature-hashing embeddings
    (the SQL oracles hard-code the same ``(h // dim) % 2`` arithmetic by
    contract; a drifted copy would silently desynchronize them). ``h`` is
    non-negative, so the truncating double-divide cast equals floor
    division on both engines."""
    return F.when((h / dim).cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def hashed_bow_embedding(col: Column, dim: int = 64) -> Column:
    """Signed feature-hashing bag-of-words embedding (Weinberger et al.
    2009, "Feature Hashing for Large Scale Multitask Learning"): each token
    hashes to bucket ``h % dim`` with sign ``+1/-1`` from the next hash
    bit, summed as INTEGERS (array<long>) — a deterministic, model-free
    text -> fixed-dim vector bridge, so every embedding operator (ANN,
    kNN graph, SemDedup, centroids) applies to a raw text corpus with no
    external encoder. Integer accumulation makes the vector exactly
    replayable in SQL (no float summation order to pin).

    Pure scan-stage column expression: the per-token hash array is bound
    ONCE via the transform(array(...)) wrapper (same trick as
    dedup.minhash_signature_col), then each of the ``dim`` components is
    an integer fold over it — no shuffle, no Python."""
    hs = F.transform(tokens(col), lambda w: _md5_int(w))
    return F.element_at(
        F.transform(
            F.array(hs),
            lambda h_arr: F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.aggregate(
                    h_arr,
                    F.lit(0).cast("long"),
                    lambda acc, h: acc
                    + F.when(h % dim == j, _hash_sign(h, dim)).otherwise(F.lit(0)),
                ),
            ),
        ),
        1,
    )


def tfidf_hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    broadcast_stats: bool = False,
) -> DataFrame:
    """TF-IDF-weighted feature hashing: the corpus-aware variant of
    :func:`hashed_bow_embedding` — each token contributes
    ``sign(h) * ln(N / df)`` to bucket ``h % dim`` (boilerplate tokens
    that appear in every document weigh ~0; rare content dominates), the
    standard IR representation for similarity/clustering over text.

    Output is LONG form (id, bucket, w) for the non-empty buckets. Plan:
    ONE tokenize pass — the corpus collapses to the (doc, token, tf) table
    first, and both the document-frequency aggregate and the weighted terms
    derive from it (a second reference to the raw explode would re-tokenize
    the whole corpus); the vocab-sized df table joins back under the
    ``_stats_side`` policy (AQE-chosen by default — a web-scale
    vocabulary must not be force-broadcast). Each term is tf * sign * idf with the idf
    truncated to DECIMAL(18,9) BEFORE the integer multiply and the
    per-(doc, bucket) sum, so the reduction is associative-exact and
    cross-engine stable (the unigram_nll idiom — ln differs by ulps
    between libms), identical to summing sign*idf once per occurrence."""
    tok_counts = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("tf"))
    )
    dfw = tok_counts.groupBy("w").agg(F.count("*").alias("df"))
    n_total = df.select(F.count(F.lit(1)).alias("n"))
    h = F.col("h")
    terms = (
        tok_counts.join(_stats_side(dfw, broadcast_stats), "w")
        .join(F.broadcast(n_total))
        .select(
            F.col(id_col),
            F.col("tf"),
            _md5_int(F.col("w")).alias("h"),
            F.log(F.col("n") / F.col("df")).cast("decimal(18,9)").alias("idf"),
        )
        .select(
            F.col(id_col),
            (h % dim).cast("int").alias("bucket"),
            # signed tf is cast NARROW (decimal(10,0)) before the decimal
            # multiply: a bigint operand makes Spark's product exceed
            # precision 38 and silently ROUND the scale down to 8
            # (allowPrecisionLoss), which diverges from the oracle's exact
            # scale-9 arithmetic at the 9th decimal
            (
                (F.col("tf") * _hash_sign(h, dim)).cast("decimal(10,0)")
                * F.col("idf")
            ).alias("t"),
        )
    )
    return terms.groupBy(id_col, "bucket").agg(
        F.round(F.sum("t").cast("double"), 6).alias("w")
    )


# the eight "must contain >= 2 of these" words from the Gopher quality
# rules (Rae et al. 2021, arXiv 2112.11446 Appendix A1.1) — data, not code
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_rules(t: Column) -> dict[str, Column]:
    """The Gopher document-level statistics AND rule conditions, built ONCE
    and shared by the flag projection (``gopher_quality``) and the
    curation-stage predicate (``gopher_pass``) so both surfaces apply
    byte-identical rule arithmetic — and so the conjunction can never
    desynchronize from the individual flags.

    Every threshold comparison is evaluated on cross-multiplied INTEGERS
    (``total_chars >= 3 * n_words``; the ellipsis rule compares the raw
    replaced-char delta, 3x the occurrence count, against ``3 * n``), never
    on a floating quotient, so a document sitting exactly on a published
    boundary flags identically on every engine."""
    toks = tokens(t)
    n = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.filter(stop_arr, lambda m: F.array_contains(toks, m)))
    # symbol-to-word ratio: occurrence counts via replace-delta (replace is
    # left-to-right non-overlapping in both Spark and DuckDB, so '....'
    # counts one ellipsis in both)
    hash_delta = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipsis_delta = F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    return {
        "n": n,
        "total_chars": total_chars,
        "alpha_words": alpha_words,
        "stop_hits": stop_hits,
        "hash_count": hash_delta,
        "ellipsis_count": (ellipsis_delta / 3).cast("int"),
        "cond_word_count": (n >= 50) & (n <= 100000),
        "cond_mean_word_len": (total_chars >= F.lit(3) * n)
        & (total_chars <= F.lit(10) * n),
        "cond_alpha_words": F.lit(5) * alpha_words >= F.lit(4) * n,
        "cond_symbol_ratio": (F.lit(10) * hash_delta <= n)
        & (F.lit(10) * ellipsis_delta <= F.lit(3) * n),
        "cond_stopwords": stop_hits >= 2,
    }


_GOPHER_CONDS = (
    "cond_word_count",
    "cond_mean_word_len",
    "cond_alpha_words",
    "cond_symbol_ratio",
    "cond_stopwords",
)


def gopher_pass(col: Column) -> Column:
    """Boolean conjunction of the Gopher document-level rules (see
    ``gopher_quality``) — the keep-predicate form for curation pipelines:
    folds into the scan stage, no shuffle, no Python."""
    r = _gopher_rules(col)
    out = r[_GOPHER_CONDS[0]]
    for k in _GOPHER_CONDS[1:]:
        out = out & r[k]
    return out


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher rule-based document quality filter (Rae et al. 2021, arXiv
    2112.11446 Appendix A1.1), the companion to the statistical
    ``quality_features`` scorer: each published document-level rule becomes
    an integer-exact 0/1 flag plus the measured statistic, and
    ``pass_gopher`` is their conjunction (built from the SAME condition
    objects, so flags and verdict cannot drift apart).

    Rules implemented, at the paper's published thresholds (the LINE-level
    bullet/ellipsis rules are omitted because this corpus model is
    single-line text; the symbol-ratio rule below is the paper's
    document-level one):
    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - >= 80% of words contain at least one alphabetic character
    - symbol-to-word ratio <= 0.1 for '#' and for '...'
    - at least 2 of the 8 designated English stopwords appear

    Integer-exact thresholds: see ``_gopher_rules``. The quotients are
    emitted rounded to 6 dp for reporting only.

    Scale shape: one narrow whole-stage-codegen projection — no shuffle, no
    Python, no join; the flags fold into any downstream curation scan (the
    predicate form is ``gopher_pass`` / the ``gopher_filter`` curation
    stage)."""
    r = _gopher_rules(F.col(text_col))

    def _flag(cond) -> Column:
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int")

    pass_all = r[_GOPHER_CONDS[0]]
    for k in _GOPHER_CONDS[1:]:
        pass_all = pass_all & r[k]
    return df.select(
        "*",
        r["n"].alias("n_words"),
        F.round(r["total_chars"] / r["n"], 6).alias("mean_word_len"),
        F.round(r["alpha_words"] / r["n"], 6).alias("alpha_word_ratio"),
        r["hash_count"].alias("hash_count"),
        r["ellipsis_count"].alias("ellipsis_count"),
        r["stop_hits"].alias("stop_hits"),
        _flag(r["cond_word_count"]).alias("flag_word_count"),
        _flag(r["cond_mean_word_len"]).alias("flag_mean_word_len"),
        _flag(r["cond_alpha_words"]).alias("flag_alpha_words"),
        _flag(r["cond_symbol_ratio"]).alias("flag_symbol_ratio"),
        _flag(r["cond_stopwords"]).alias("flag_stopwords"),
        _flag(pass_all).alias("pass_gopher"),
    )


def kneser_ney_bigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    min_count: int = 5,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities (Kneser &
    Ney 1995; Chen & Goodman 1999 eq. 4.25) for the supported bigrams:

        P_KN(w2|w1) = (c(w1,w2) - d) / c(w1,.)
                      + d * N1+(w1,.) / c(w1,.) * N1+(.,w2) / N1+(.,.)

    with absolute discount d and the CONTINUATION unigram (how many
    distinct left-contexts a word follows, not how often it occurs) as
    the backoff mass — the distinction that stops high-count but
    single-context words ("Francisco") from soaking up backoff
    probability. This is the smoothing family behind the KenLM-style
    perplexity filters used in corpus curation (CCNet); bigram_nll is
    the add-one baseline, this is the production-grade estimator.

    Output is support-filtered (pair_count >= min_count) so the result
    is the collocation-sized head table, not the full transition matrix.

    Scale shape: ONE map-side-combined bigram count; every statistic
    (prefix totals, forward/backward continuation counts, the global
    distinct-bigram scalar) derives from that count table with
    vocab-sized aggregates. The min_count support filter runs BEFORE
    the statistic joins (the probe side is the head table), and the
    vocab-sized prefix/continuation tables join under the
    ``_stats_side`` policy — no forced broadcast; AQE picks broadcast
    vs shuffle from measured size (same posture as bigram_nll). Only
    the one-row distinct-bigram scalar broadcasts unconditionally.
    All probability arithmetic happens in
    IEEE double with a literally identical expression tree on the
    DuckDB oracle side — exact integer inputs, correctly-rounded ops,
    rounded to 6 dp."""
    d = F.lit(discount)
    bg = df.select(
        F.explode(word_bigrams(F.col(text_col))).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # four consumers (probe side + three statistics) derive from the count
    # table; localCheckpoint stops each branch re-tokenizing the corpus
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    pre = c2.groupBy("w1").agg(
        F.sum("c").alias("cp"), F.count("*").alias("n_fwd")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("n_bwd"))
    nbig = c2.agg(F.count("*").alias("nbig"))
    p_kn = (
        (F.col("c") - d) / F.col("cp")
        + d * F.col("n_fwd") / F.col("cp") * F.col("n_bwd") / F.col("nbig")
    )
    return (
        c2.filter(F.col("c") >= min_count)
        .join(_stats_side(pre, broadcast_stats), "w1")
        .join(_stats_side(cont, broadcast_stats), "w2")
        .join(F.broadcast(nbig))
        .select(
            "w1",
            "w2",
            F.col("c").alias("pair_count"),
            F.round(p_kn, 6).alias("p_kn"),
        )
    )


def word_trigrams(col: Column) -> Column:
    """Array of (w1, w2, w3) structs for adjacent word triples — ONE zipped
    pass over three shifted slices of the token array (the word_bigrams
    idiom one order up). Empty for texts with fewer than 3 tokens."""
    toks = tokens(col)
    width = F.greatest(F.size(toks) - F.lit(2), F.lit(0))
    return F.arrays_zip(
        F.slice(toks, 1, width).alias("w1"),
        F.slice(toks, 2, width).alias("w2"),
        F.slice(toks, 3, width).alias("w3"),
    )


def kneser_ney_trigram(
    df: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
    min_count: int = 5,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Interpolated trigram Kneser-Ney probabilities (Chen & Goodman 1999
    §4.1.6) for the supported trigrams — the estimator order used by the
    KenLM-style perplexity filters in CCNet-family curation pipelines:

        P_KN(w3|w1 w2) = (c(w1w2w3) - d) / c(w1w2·)
                         + d · N1+(w1w2·) / c(w1w2·) · P_KN(w3|w2)

    where the BIGRAM level uses continuation counts (how many distinct
    left contexts a bigram continues, not how often it occurs):

        P_KN(w3|w2) = (N1+(·w2w3) - d) / N1+(·w2·)
                      + d · N1+(w2·) / N1+(·w2·) · N1+(·w3) / N1+(··)

    All observed n-grams have count >= 1 > d, so no max(·,0) clamp is
    needed on the supported set. Output is support-filtered
    (trigram_count >= min_count): the collocation-sized head table, not
    the full transition tensor.

    Scale shape: ONE map-side-combined trigram count; every lower-order
    statistic (prefix totals, continuation bigrams, continuation
    marginals, the global distinct-continuation scalar) derives from that
    count table with vocab-sized aggregates. The support filter runs
    BEFORE the statistic joins, and all vocab-sized tables join under the
    ``_stats_side`` policy (AQE-chosen — no forced broadcast); only the
    one-row scalar broadcasts unconditionally. Probability arithmetic is
    a fixed IEEE-double expression tree, replayed identically by the
    DuckDB oracle, rounded to 6 dp."""
    d = F.lit(discount)
    tg = df.select(F.explode(word_trigrams(F.col(text_col))).alias("p")).select(
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )
    # six statistic tables derive from the trigram counts; without a
    # materialization Spark re-tokenizes and re-shingles the WHOLE corpus
    # once per derived branch (observed 8x wall-clock). localCheckpoint
    # pins the count table — vocab-scale rows of four small columns, the
    # corpus text never persists
    c3 = (
        tg.groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    # trigram-level prefix stats: c(w1w2.) and N1+(w1w2.)
    pre2 = c3.groupBy("w1", "w2").agg(
        F.sum("c").alias("cp2"), F.count("*").alias("n_fwd2")
    )
    # continuation bigrams: N1+(.w2w3) = distinct w1 per (w2,w3) = row
    # count of the (already-distinct) trigram table grouped by (w2,w3);
    # checkpointed for the same reason — three statistics derive from it
    c2c = (
        c3.groupBy("w2", "w3")
        .agg(F.count("*").alias("cc"))
        .localCheckpoint(eager=False)
    )
    # bigram-level continuation prefix: N1+(.w2.) and N1+(w2.)
    pre1 = c2c.groupBy("w2").agg(
        F.sum("cc").alias("cp1"), F.count("*").alias("n_fwd1")
    )
    # continuation unigram: N1+(.w3) and the global N1+(..)
    cont = c2c.groupBy("w3").agg(F.count("*").alias("n_bwd"))
    ntot = c2c.agg(F.count("*").alias("ncont"))
    p2 = (
        (F.col("cc") - d) / F.col("cp1")
        + d * F.col("n_fwd1") / F.col("cp1") * F.col("n_bwd") / F.col("ncont")
    )
    p3 = (F.col("c") - d) / F.col("cp2") + d * F.col("n_fwd2") / F.col("cp2") * p2
    return (
        c3.filter(F.col("c") >= min_count)
        .join(_stats_side(pre2, broadcast_stats), ["w1", "w2"])
        .join(_stats_side(c2c, broadcast_stats), ["w2", "w3"])
        .join(_stats_side(pre1, broadcast_stats), "w2")
        .join(_stats_side(cont, broadcast_stats), "w3")
        .join(F.broadcast(ntot))
        .select(
            "w1",
            "w2",
            "w3",
            F.col("c").alias("trigram_count"),
            F.round(p3, 6).alias("p_kn"),
        )
    )


def kn_doc_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Per-document Kneser-Ney NLL: mean -ln P_KN(w2|w1) over the
    document's bigrams under the corpus's own interpolated bigram KN LM
    (kneser_ney_bigram's estimator, unfiltered — scoring needs every
    observed transition, and on the training corpus itself every scored
    bigram IS observed, so P_KN > 0 always). This is the doc-level score
    the CCNet-style perplexity gate thresholds on: high NLL = the
    document's transitions surprise the corpus LM (shuffled text, spam,
    wrong language); bigram_nll is the add-one baseline of the same gate.

    Shape: two corpus passes — one builds the bigram count table (which
    localCheckpoints so its three derived statistics don't re-tokenize
    the corpus once each), one scores the per-doc bigram stream against
    it; vocab-sized stats join under ``_stats_side`` (AQE-chosen); the
    one-row scalar broadcasts. Each
    per-bigram term truncates to DECIMAL(18,9) BEFORE the per-document
    sum (order-independent transcendental reduction), mean rounded to
    6 dp. Documents with fewer than 2 tokens have no bigrams and are
    absent from the output — a perplexity gate must pass them through
    explicitly (see plans/curate.py::kn_perplexity_filter)."""
    d = F.lit(discount)
    bg = df.select(
        F.col(id_col), F.explode(word_bigrams(F.col(text_col))).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    pre = c2.groupBy("w1").agg(F.sum("c").alias("cp"), F.count("*").alias("n_fwd"))
    cont = c2.groupBy("w2").agg(F.count("*").alias("n_bwd"))
    nbig = c2.agg(F.count("*").alias("nbig"))
    p_kn = (
        (F.col("c") - d) / F.col("cp")
        + d * F.col("n_fwd") / F.col("cp") * F.col("n_bwd") / F.col("nbig")
    )
    # the NLL is a function of the bigram alone, so compute it once per
    # DISTINCT bigram on the vocab-bounded count table and send the
    # corpus-sized bigram stream through ONE join instead of four
    # (identical doubles: the same expression over the same stat values)
    nll_tab = (
        c2.join(_stats_side(pre, broadcast_stats), "w1")
        .join(_stats_side(cont, broadcast_stats), "w2")
        .join(F.broadcast(nbig))
        .select("w1", "w2", (-F.log(p_kn)).cast("decimal(18,9)").alias("nll"))
    )
    scored = bg.join(_stats_side(nll_tab, broadcast_stats), ["w1", "w2"]).select(
        F.col(id_col), "nll"
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("avg_kn_nll"),
    )


def kn3_doc_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Order-3 document perplexity: mean -ln P_KN(w3|w1 w2) per document
    under the corpus's own interpolated TRIGRAM Kneser-Ney LM
    (kneser_ney_trigram's estimator, unfiltered) — the order CCNet-grade
    filters actually score at; kn_doc_nll is the bigram form. On the
    training corpus every scored trigram is observed, so the interpolated
    probability is always positive.

    Shape: two corpus passes (count-table build + scoring), with the
    trigram count table and the continuation-bigram table both
    localCheckpointed — five statistics derive from them. Vocab-sized
    stats join under ``_stats_side`` (AQE-chosen); only the one-row
    scalar broadcasts. Per-trigram terms truncate to DECIMAL(18,9)
    pre-sum; mean rounded to 6 dp. Documents with fewer than 3 tokens
    are unscored (absent), like kn_doc_nll's contract."""
    d = F.lit(discount)
    tg = df.select(
        F.col(id_col), F.explode(word_trigrams(F.col(text_col))).alias("p")
    ).select(
        id_col,
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )
    c3 = (
        tg.groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    pre2 = c3.groupBy("w1", "w2").agg(
        F.sum("c").alias("cp2"), F.count("*").alias("n_fwd2")
    )
    c2c = (
        c3.groupBy("w2", "w3")
        .agg(F.count("*").alias("cc"))
        .localCheckpoint(eager=False)
    )
    pre1 = c2c.groupBy("w2").agg(
        F.sum("cc").alias("cp1"), F.count("*").alias("n_fwd1")
    )
    cont = c2c.groupBy("w3").agg(F.count("*").alias("n_bwd"))
    ntot = c2c.agg(F.count("*").alias("ncont"))
    p2 = (
        (F.col("cc") - d) / F.col("cp1")
        + d * F.col("n_fwd1") / F.col("cp1") * F.col("n_bwd") / F.col("ncont")
    )
    p3 = (F.col("c") - d) / F.col("cp2") + d * F.col("n_fwd2") / F.col("cp2") * p2
    # the NLL is a function of the trigram alone: compute it once per
    # DISTINCT trigram on the vocab-bounded count table and send the
    # corpus-sized trigram stream through ONE join instead of six
    # (identical doubles: the same expression over the same stat values)
    nll_tab = (
        c3.join(_stats_side(pre2, broadcast_stats), ["w1", "w2"])
        .join(_stats_side(c2c, broadcast_stats), ["w2", "w3"])
        .join(_stats_side(pre1, broadcast_stats), "w2")
        .join(_stats_side(cont, broadcast_stats), "w3")
        .join(F.broadcast(ntot))
        .select(
            "w1", "w2", "w3", (-F.log(p3)).cast("decimal(18,9)").alias("nll")
        )
    )
    scored = tg.join(
        _stats_side(nll_tab, broadcast_stats), ["w1", "w2", "w3"]
    ).select(F.col(id_col), "nll")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_trigrams"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("avg_kn3_nll"),
    )


def skipgram_cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Windowed skip-gram co-occurrence PMI — the word2vec/GloVe
    PREPROCESSING statistic: directed (center, context) counts for every
    offset 1..``window`` in both directions, with PMI against the center
    marginals. collocation_pmi is the window=1 adjacent special case;
    the window>=2 form is what SGNS negative-sampling tables and
    co-occurrence-factorization embeddings (Levy & Goldberg 2014: SGNS
    factorizes this exact shifted-PMI matrix) consume.

    Plan: ONE corpus scan — all 2*window shifted-slice zips concatenate
    into a single array and explode once (the shingles() lesson: never
    re-evaluate the tokenizer per offset); the pair table aggregates
    map-side; marginals derive from the pair table (no second scan);
    min_count filters BEFORE the marginal joins; vocab-sized marginals
    join under the ``_stats_side`` policy (AQE-chosen). Counts are exact
    integers, PMI is one 6 dp-rounded ln. Output: (w1, w2, cooc, pmi)
    with w1 < w2 (the directed matrix is symmetric, so the lower
    triangle carries everything; cooc is ONE orientation's directed
    count — the symmetric event count is exactly 2x, and PMI is
    invariant to that doubling because the total T doubles with it)."""
    toks = tokens(F.col(text_col))
    zips = []
    for o in range(1, window + 1):
        width = F.greatest(F.size(toks) - F.lit(o), F.lit(0))
        left, right = F.slice(toks, 1, width), F.slice(toks, o + 1, width)
        zips.append(
            F.zip_with(
                left, right, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
            )
        )
        zips.append(
            F.zip_with(
                right, left, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
            )
        )
    pairs = df.select(F.explode(F.concat(*zips)).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    cnt = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cooc"))
        .localCheckpoint(eager=False)
    )
    marg = cnt.groupBy("w1").agg(F.sum("cooc").alias("cm"))
    total = cnt.agg(F.sum("cooc").alias("t"))
    pmi = F.round(
        F.log(
            F.col("cooc").cast("double")
            * F.col("t")
            / (F.col("cma").cast("double") * F.col("cmb"))
        ),
        6,
    )
    return (
        cnt.filter((F.col("cooc") >= min_count) & (F.col("w1") < F.col("w2")))
        .join(
            _stats_side(marg.select(F.col("w1"), F.col("cm").alias("cma")), broadcast_stats),
            "w1",
        )
        .join(
            _stats_side(
                marg.select(F.col("w1").alias("w2"), F.col("cm").alias("cmb")),
                broadcast_stats,
            ),
            "w2",
        )
        .join(F.broadcast(total))
        .select("w1", "w2", "cooc", pmi.alias("pmi"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Okapi BM25 retrieval (Robertson-Sparck Jones family): score every
    document against a bag of query terms,

        score(d) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))
        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))    (the Lucene form)

    — the sparse half of a hybrid retrieval stack (the dense half is the
    ANN family; fuse with rrf_fuse). Term statistics are corpus-trained.

    Plan shape: the exploded token stream filters to the query terms AT
    THE SCAN (an isin over a handful of literals — the posting-list
    read), so everything downstream is sized by documents-containing-
    query-terms, not the corpus; per-(doc,term) tf aggregates map-side;
    df/doc-length statistics join back under ``_stats_side`` (the
    query-term df table is bounded by the query size and will always
    measure broadcastable — the hint freedom costs nothing); the final
    top-k is TakeOrderedAndProject. Per-term scores truncate to
    DECIMAL(18,9) pre-sum (order-independent transcendental reduction),
    final score rounded to 6 dp, ties by id."""
    terms = [t for t in query_terms if t]
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    lens = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("dl")
    )
    scalars = lens.agg(
        F.count("*").alias("n"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    qtoks = toks.filter(F.col("w").isin(terms))
    tf = qtoks.groupBy(id_col, "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = (
        idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    ).cast("decimal(18,9)")
    scored = (
        tf.join(_stats_side(dfreq, broadcast_stats), "w")
        .join(lens, id_col)
        .join(F.broadcast(scalars))
        .select(F.col(id_col), term_score.alias("ts"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("ts").cast("double"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
