"""Tokenizer-training operators: distributed BPE (byte-pair encoding) merge
learning over a corpus.

BPE training (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") iterates: count adjacent symbol pairs over the
corpus -> merge the most frequent pair everywhere -> repeat. The classic
implementation is a single-machine dict loop; at 100 TB the corpus does not
fit, but the WORD-FREQUENCY table does shrink the problem by orders of
magnitude (pair counts only depend on the distinct-word table weighted by
word frequency), and each round is then:

* one map-side-combined aggregation over the word table (pair counts),
* a 1-row collect (the argmax pair),
* a narrow projection applying the merge to every word's symbol array with
  an ``F.aggregate`` fold — greedy left-to-right, exactly the reference BPE
  merge procedure — in whole-stage codegen, no Python per row.

The word table is cached once; rounds never rescan the corpus. At 100 TB
scale the one corpus pass (word counting) dominates and is a plain
shuffle-on-token count; every merge round afterwards is proportional to
|vocab|, not corpus size.

Determinism contract: ties in pair counts break lexicographically on
(p1, p2), so the learned merge sequence is engine- and shuffle-order
independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.text import tokens


def _chars(col: Column) -> Column:
    """Split a string into an array of single characters.

    Explicit substr-by-index rather than ``split(col, '')`` so the semantics
    can't drift with regex-engine edge cases around zero-width matches.
    The empty string maps to an empty array — ``sequence(1, 0)`` would step
    BACKWARD ([1, 0]), so it must be guarded, not relied on."""
    return F.when(F.length(col) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: col.substr(i, F.lit(1)),
        )
    )


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The distinct-word frequency table with initial character symbols —
    the compressed training state BPE iterates on.

    Columns: ``word`` (string), ``cnt`` (long), ``symbols`` (array<string>).
    One corpus pass (explode tokens -> count); everything after operates on
    |vocab| rows."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select("word", "cnt", _chars(F.col("word")).alias("symbols"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.

    Zipped shifted slices (the shingles trick — one evaluation of the symbol
    array per row, not per element) -> explode -> sum(cnt). The shuffle
    carries (p1, p2, partial-count) after map-side combine: bounded by the
    symbol-pair alphabet, not the corpus."""
    syms = F.col("symbols")
    width = F.greatest(F.size(syms) - F.lit(1), F.lit(0))
    zipped = F.arrays_zip(
        F.slice(syms, 1, width).alias("p1"),
        F.slice(syms, 2, width).alias("p2"),
    )
    return (
        words.select(F.col("cnt"), F.explode(zipped).alias("pair"))
        .select("cnt", F.col("pair.p1").alias("p1"), F.col("pair.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def top_pairs(words: DataFrame, k: int = 20) -> DataFrame:
    """The k most frequent adjacent symbol pairs (ties lexical on p1, p2) —
    the per-round argmax generalized to a top-k inspection query.
    TakeOrderedAndProject, no global sort."""
    return pair_counts(words).orderBy(
        F.desc("pair_count"), F.asc("p1"), F.asc("p2")
    ).limit(k)


def merge_pair(sym_col: Column, p1: str | Column, p2: str | Column) -> Column:
    """Apply one BPE merge rule to a symbol array: greedy left-to-right
    replacement of every adjacent (p1, p2) with the concatenated symbol,
    non-overlapping — e.g. rule (a, a) on [a,a,a] yields [aa, a], matching
    the reference implementation's scan order.

    A single ``F.aggregate`` fold: append each symbol unless the previous
    output symbol is exactly p1 and the current is p2, in which case the
    tail is replaced by the merged token. ``try_element_at`` keeps the
    empty-accumulator probe null-safe under ANSI mode. The pair may be
    given as Columns (per-row rules) or strings (one rule, the trainer's
    case)."""
    c1 = F.lit(p1) if isinstance(p1, str) else p1
    c2 = F.lit(p2) if isinstance(p2, str) else p2
    merged = F.concat(c1, c2)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == c1) & (s == c2),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(merged),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules over the corpus.

    Returns (merges, final_words): ``merges`` is the ordered rule list
    [(p1, p2, pair_count), ...]; ``final_words`` is the word table with
    post-merge symbol arrays (the segmentation a tokenizer built from these
    rules would produce on the training vocabulary).

    Driver work per round is ONE 1-row collect; all counting and merging is
    distributed. The word table is localCheckpointed every few rounds so the
    fold-on-fold lineage doesn't deepen unboundedly (same discipline as the
    connected-components fixpoint loop in analytics/components.py)."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    words = word_frequency_table(df, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for round_no in range(n_merges):
        best = (
            pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("p1"), F.asc("p2"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol — nothing left to merge
        p1, p2, cnt = best[0]["p1"], best[0]["p2"], int(best[0]["pair_count"])
        merges.append((p1, p2, cnt))
        words = words.select(
            "word", "cnt", merge_pair(F.col("symbols"), p1, p2).alias("symbols")
        )
        if (round_no + 1) % 4 == 0:
            words = words.localCheckpoint()
    return merges, words


def train_bpe_df(df: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """The merge-rule list as a DataFrame (merge_rank, p1, p2, pair_count) —
    the queries()-surface form of :func:`train_bpe`."""
    spark = df.sparkSession
    merges, _ = train_bpe(df, n_merges, text_col)
    return spark.createDataFrame(
        [(i + 1, p1, p2, cnt) for i, (p1, p2, cnt) in enumerate(merges)],
        "merge_rank INT, p1 STRING, p2 STRING, pair_count BIGINT",
    )


def segment_with_merges(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to segment documents: per-word char split,
    then each rule folded in training order (the standard BPE encoder,
    modulo the real encoders' rule-priority optimization). Output:
    (id, n_words, n_pieces) — the compression diagnostic for a learned
    vocabulary. Narrow projection; no shuffle."""
    words = tokens(F.col(text_col))
    piece_arrays = F.transform(words, lambda w: _chars(w))

    def _apply_rule(p1: str, p2: str):
        # closure factory: PySpark infers lambda arity from the signature,
        # so the rule must be bound via closure, not default args
        return lambda a: merge_pair(a, p1, p2)

    for rule in merges:
        piece_arrays = F.transform(piece_arrays, _apply_rule(rule[0], rule[1]))
    n_pieces = F.aggregate(
        F.transform(piece_arrays, lambda a: F.size(a)), F.lit(0), lambda acc, x: acc + x
    )
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        n_pieces.alias("n_pieces"),
    )
