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


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: min md5-int over 3-word shingles (MinHash with a
    single hash function — a rolling-hash-style content fingerprint that is
    stable under document reordering of identical shingle sets)."""
    sh = shingles(F.col(text_col))
    hashes = F.transform(sh, _md5_int)
    return df.withColumn(out_col, F.array_min(hashes))
