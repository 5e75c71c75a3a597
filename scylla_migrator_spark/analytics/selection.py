"""Data-selection operators: importance-resampling scores for targeted
corpus selection.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") scores raw-pool documents by the log importance weight
log p_target(x) / log p_raw(x) under cheap hashed n-gram bag-of-words
models of a small target corpus and the raw pool, then samples proportional
to the weights. This module implements the unigram form (the hashed-feature
generalization changes only the token -> feature-id projection).

Scale shape: ONE explode pass over the corpus; the vocab-sized per-word
count table joins back to the token stream under the ``text._stats_side``
policy (no forced broadcast — AQE broadcasts when the measured vocabulary
is small, falls back to a shuffle join at web-scale vocabularies); the
per-document score is a decimal-truncated associative sum, so it is exact
under any shuffle order and replayable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.text import _stats_side, tokens


def dsir_log_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_stats: bool = False,
) -> DataFrame:
    """Per-document DSIR log importance weight under add-one-smoothed
    unigram LMs of the target slice vs the raw remainder.

    ``is_target`` is a boolean Column splitting the input into the target
    corpus (what we want more of) and the raw pool (what we are selecting
    from). Every document is scored; callers filter to the raw pool for
    selection. For each word w:

        lw(w) = ln((c_t(w)+1) / (T_t+V)) - ln((c_r(w)+1) / (T_r+V))

    with V the union vocabulary size — add-one smoothing keeps words unseen
    on one side finite. Document score = sum of lw over its token stream
    (with multiplicity), each term truncated to DECIMAL(18,9) pre-sum (the
    order-independent-reduction discipline, cf. text.unigram_nll).

    Output: (id, is_target, n_tokens, log_weight[6 dp])."""
    toks = df.select(
        F.col(id_col), is_target.cast("boolean").alias("__tgt"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    counts = toks.groupBy("w").agg(
        F.sum(F.col("__tgt").cast("long")).alias("c_t"),
        F.sum((~F.col("__tgt")).cast("long")).alias("c_r"),
    )
    scalars = counts.agg(
        F.sum("c_t").alias("t_t"),
        F.sum("c_r").alias("t_r"),
        F.count("*").alias("v"),
    )
    term = (
        F.log((F.col("c_t") + 1) / (F.col("t_t") + F.col("v")))
        - F.log((F.col("c_r") + 1) / (F.col("t_r") + F.col("v")))
    ).cast("decimal(18,9)")
    scored = (
        toks.join(_stats_side(counts, broadcast_stats), "w")
        .join(F.broadcast(scalars))
        .select(F.col(id_col), F.col("__tgt"), term.alias("lw"))
    )
    return scored.groupBy(id_col, "__tgt").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("lw").cast("double"), 6).alias("log_weight"),
    ).select(
        F.col(id_col),
        F.col("__tgt").alias("is_target"),
        "n_tokens",
        "log_weight",
    )


def dsir_select_topk(
    df: DataFrame,
    is_target: Column,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The k raw-pool documents most resembling the target slice by DSIR
    log weight (ties by id). Deterministic top-k selection — the greedy
    form of DSIR's weighted sampling (replace with Gumbel-top-k on
    log_weight + g_i for the sampled form; the score column is the same).
    TakeOrderedAndProject; no global sort."""
    w = dsir_log_weights(df, is_target, text_col, id_col)
    return (
        w.filter(~F.col("is_target"))
        .select(id_col, "n_tokens", "log_weight")
        .orderBy(F.desc("log_weight"), F.asc(id_col))
        .limit(k)
    )


def dsir_gumbel_topk(
    df: DataFrame,
    is_target: Column,
    k: int = 20,
    seed: str = "gumbel0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR's actual sampling rule: Gumbel-top-k over the log weights —
    sampling k documents WITHOUT replacement proportional to exp(log_weight)
    is exactly taking the top k of log_weight + Gumbel noise (Vieira 2014).

    The noise is derandomized the engine's standard way (cf.
    sampling.corpus_mixing_sample): u = (md5_32(id:seed) + 0.5) / 2^32 in
    (0,1), g = -ln(-ln(u)) — deterministic, replayable in SQL, and changing
    ``seed`` redraws the sample. The Gumbel term truncates to DECIMAL(18,9)
    before the add so the score is engine-exact. TakeOrdered; no global
    sort."""
    from scylla_migrator_spark.analytics.text import _md5_int

    w = dsir_log_weights(df, is_target, text_col, id_col)
    u = (
        _md5_int(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    g = (-F.log(-F.log(u))).cast("decimal(18,9)")
    return (
        w.filter(~F.col("is_target"))
        .select(
            F.col(id_col),
            "log_weight",
            F.round(F.col("log_weight") + g.cast("double"), 6).alias("gumbel_score"),
        )
        .orderBy(F.desc("gumbel_score"), F.asc(id_col))
        .limit(k)
    )


def source_js_divergence(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram distributions
    of every two sources — the corpus-mix drift/similarity matrix (which
    slices are near-duplicates of each other distribution-wise, which are
    genuinely distinct; nats, 0 <= JS <= ln 2).

    JS(p,q) = 0.5 KL(p||m) + 0.5 KL(q||m), m = (p+q)/2, with each KL term
    truncated to DECIMAL(18,9) pre-sum (shuffle-order exact). Terms where
    one side is absent contribute 0.5 p ln 2 exactly (m = p/2) — handled by
    coalescing the missing side to 0.

    Shape: ONE token pass -> per-(source, word) counts; the pair expansion
    joins the count table against the small distinct-source-pair frame, so
    its size is |pairs| x vocab — sources are few (corpus slices), vocab is
    bounded; never corpus-sized."""
    toks = df.select(F.col(source_col).alias("src"), F.explode(tokens(F.col(text_col))).alias("w"))
    cnt = toks.groupBy("src", "w").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    p = cnt.join(tot, "src").select(
        "src", "w", (F.col("c") / F.col("t")).alias("p")
    )
    srcs = p.select("src").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.src") < F.col("b.src"))
        .select(F.col("a.src").alias("sa"), F.col("b.src").alias("sb"))
    )
    # the word universe of each pair: words in either side. Two hash
    # equi-joins unioned — an OR-equality condition would force a broadcast
    # nested-loop join (S^3-ish comparisons with many sources)
    pw = p.select("src", "w")
    wp = (
        pairs.join(pw, F.col("src") == F.col("sa"))
        .select("sa", "sb", "w")
        .unionByName(
            pairs.join(pw, F.col("src") == F.col("sb")).select("sa", "sb", "w")
        )
        .distinct()
    )
    pa = p.select(F.col("src").alias("sa"), "w", F.col("p").alias("pa"))
    pb = p.select(F.col("src").alias("sb"), "w", F.col("p").alias("pb"))
    joined = (
        wp.join(pa, ["sa", "w"], "left")
        .join(pb, ["sb", "w"], "left")
        .select(
            "sa",
            "sb",
            F.coalesce("pa", F.lit(0.0)).alias("pv"),
            F.coalesce("pb", F.lit(0.0)).alias("qv"),
        )
    )
    m = (F.col("pv") + F.col("qv")) / 2
    term = (
        F.when(F.col("pv") > 0, 0.5 * F.col("pv") * F.log(F.col("pv") / m)).otherwise(F.lit(0.0))
        + F.when(F.col("qv") > 0, 0.5 * F.col("qv") * F.log(F.col("qv") / m)).otherwise(F.lit(0.0))
    ).cast("decimal(18,9)")
    return (
        joined.select("sa", "sb", term.alias("term"))
        .groupBy("sa", "sb")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("js_divergence"))
    )
