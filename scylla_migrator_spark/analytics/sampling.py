"""Deterministic corpus sampling for training-data pipelines.

All sampling here is hash-based (md5 of the row key + a salt), never
`DataFrame.sample`: at 100 TB the properties that matter are (a) no count
pass or shuffle — the filter evaluates per-row inside the scan stage and
pushes nothing to the driver; (b) reproducibility — the same row always
lands on the same side of the threshold, across runs, retries, and engines
(the construction replays exactly in the DuckDB oracles); (c) composability
— two samples with the same salt are nested (rate 0.1 is a subset of rate
0.5), which is what you want for progressive corpus scaling experiments.

The hash is the first 8 hex digits of md5 interpreted as a 32-bit integer,
compared against ``round(rate * 2**32)`` — integer arithmetic, no float
thresholds in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.text import _md5_int

_SCALE = 1 << 32


def _unit_hash(key: Column, salt: str) -> Column:
    """32-bit hash in [0, 2^32) of key||salt, identical under Spark and
    DuckDB (``CAST('0x' || substr(md5(k || salt), 1, 8) AS BIGINT)``)."""
    return _md5_int(F.concat(key.cast("string"), F.lit(salt)))


def shard_of(key: Column, n_shards: int, salt: str = "shuffle") -> Column:
    """The deterministic shard id of a key — the STATELESS projection both
    the batch writer (shard_layout) and streaming ingest share: a pure
    function of (key, salt, n_shards), so a stream can route rows into the
    same layout a batch shuffle produced without state or re-shuffling."""
    return (_unit_hash(key, salt) % F.lit(int(n_shards))).cast("int")


def threshold(rate: float) -> int:
    return round(rate * _SCALE)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Bernoulli(rate) sample, deterministic in ``key_col``. Plans as a plain
    filter in the scan stage — no shuffle, no count pass, reproducible."""
    return df.filter(_unit_hash(F.col(key_col), salt) < F.lit(threshold(rate)))


def weighted_mix(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixing downsample: each ``group_col`` value (source / domain /
    language) keeps its own deterministic fraction of rows. This is the
    standard corpus-mixture knob (e.g. upweight curated sources, downweight
    crawl) expressed as one codegen'd CASE filter — no per-group jobs, no
    shuffle, and the mixture is stable under retries and re-runs."""
    thr: Column = F.lit(threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(group_col) == value, F.lit(threshold(rate))).otherwise(thr)
    return df.filter(_unit_hash(F.col(key_col), salt) < thr)


def assign_splits(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment by hash range: [0, val) -> val,
    [val, val+test) -> test, rest -> train. Hash-range (not modulo) keeps the
    splits nested as fractions grow, and membership never depends on what
    other rows exist — documents can be added or removed without reshuffling
    anyone else's split."""
    h = _unit_hash(F.col(key_col), salt)
    t_val = F.lit(threshold(val_frac))
    t_test = F.lit(threshold(val_frac + test_frac))
    return df.withColumn(
        out_col,
        F.when(h < t_val, F.lit("val"))
        .when(h < t_test, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def allocate_token_budget(
    counts: DataFrame, group_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer token budget
    across groups, proportional to each group's token count — the corpus
    mixing step that decides how many tokens each source contributes to a
    training run.

    All-arithmetic and integer-exact: share = budget*toks, base = share DIV
    total, leftover seats go to the largest share-remainders (ties broken by
    group name) — so sum(alloc) == budget exactly and the result is
    reproducible across engines. The windows are over the GROUP frame (one
    row per source — tiny at any corpus scale; the heavy token count
    aggregation upstream is the distributed part).

    Arithmetic is decimal(38,0): share = toks*budget overflows a long at
    ~1e14 tokens x 100k budget (a real 100 TB corpus), and a double `/`
    rounds quotients above 2^53 across integer boundaries before a floor.
    Base is recovered as (share - rem)/total — an exactly-divisible decimal
    ratio, so the division is exact at any magnitude."""
    from pyspark.sql.window import Window

    total_w = Window.partitionBy()
    rank_w = Window.partitionBy().orderBy(F.desc("__rem"), F.asc(group_col))
    toks_dec = F.col(tokens_col).cast("decimal(38,0)")
    share = toks_dec * F.lit(int(budget)).cast("decimal(38,0)")
    with_total = counts.withColumn("__total", F.sum(toks_dec).over(total_w))
    rem = share % F.col("__total")
    based = with_total.withColumn("__rem", rem).withColumn(
        "__base", ((share - rem) / F.col("__total")).cast("long")
    )
    extra = based.withColumn("__extra_total", F.lit(int(budget)) - F.sum("__base").over(total_w))
    return (
        extra.withColumn("__rank", F.row_number().over(rank_w))
        .withColumn(
            "alloc_tokens",
            F.col("__base") + F.when(F.col("__rank") <= F.col("__extra_total"), 1).otherwise(0),
        )
        .select(group_col, F.col(tokens_col), "alloc_tokens")
    )


def shard_layout(
    df: DataFrame, key_col: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` shards: shard id and
    intra-shard position both derive from a salted md5 of the key, so the
    layout is reproducible, uniform, and independent of input order — the
    "shuffle the corpus once, stream shards sequentially" layout training
    jobs read.

    The only shuffle is the hash partition by shard id; position is a
    per-shard window (each shard sorts independently — no global sort, no
    single-partition bottleneck). At 100 TB: write with
    partitionBy(shard)/sortWithinPartitions(pos) so readers stream in
    order."""
    from pyspark.sql.window import Window

    h = _unit_hash(F.col(key_col), salt)
    pos_w = Window.partitionBy("shard").orderBy(F.asc("__h"), F.asc(key_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard_of(F.col(key_col), n_shards, salt))
        .withColumn("pos", F.row_number().over(pos_w).cast("long"))
        .drop("__h")
    )


def stratified_topn(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n: int,
    salt: str = "eval",
    rank_col: str = "rn",
) -> DataFrame:
    """Exactly ``n`` rows per stratum, chosen by salted md5 rank of the key
    — deterministic and engine-reproducible for a given input (fixed-N
    selection necessarily re-ranks when rows are added; use
    ``deterministic_sample`` when growth-stability matters more than exact
    counts). One hash-partitioned window per stratum, no global sort; at
    scale each stratum ranks independently across executors."""
    from pyspark.sql.window import Window

    h = _unit_hash(F.col(key_col), salt)
    w = Window.partitionBy(*strata_cols).orderBy(F.asc("__h"), F.asc(key_col))
    return (
        df.withColumn("__h", h)
        .withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= n)
        .drop("__h")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int = 20,
    seed: str = "wres0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis-Spirakis
    A-Res rule (IPL 2006): draw u_i ~ U(0,1) per row and take the top-k by
    u_i^(1/w_i) — exactly a weighted sample without replacement, the
    one-pass distributed form of "sample documents proportional to quality
    score / token count". Computed in log space (key = ln(u)/w, same
    ordering, no underflow at large weights).

    u is the salted md5 unit hash (derandomized — replayable in SQL and
    stable across runs/engines), the key is one scan-stage expression, and
    the selection is TakeOrderedAndProject (per-partition top-k + driver
    merge; no global sort) — one pass at any scale. Zero/negative weights
    are excluded (their inclusion probability is 0). Ties broken by id.
    Output: (id, weight, key[8 dp])."""
    w = F.col(weight_col).cast("double")
    u = (_unit_hash(F.col(id_col), seed) + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .select(F.col(id_col), w.alias("weight"), F.round(key, 8).alias("skey"))
        .orderBy(F.desc("skey"), F.asc(id_col))
        .limit(k)
    )


def weighted_stratified_topk(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    k: int = 5,
    seed: str = "wres0",
    id_col: str = "doc_id",
) -> DataFrame:
    """PER-STRATUM weighted sampling without replacement: the
    Efraimidis-Spirakis A-Res key of :func:`weighted_sample_topk`
    (log-space ln(u)/w with the derandomized md5 unit hash), selected
    top-k WITHIN each stratum via a stratum-partitioned window — the
    fixed-per-group form of "sample proportional to quality, balanced by
    source" a corpus-mixing pipeline draws eval/inspection sets with.

    Scale shape: one scan-stage key (no RNG state), one window
    partitioned BY STRATUM (the stratified_topn posture — never a global
    sort), ties by id. Zero/negative weights excluded. Output:
    (stratum, id, weight, key[8 dp])."""
    from pyspark.sql.window import Window

    w = F.col(weight_col).cast("double")
    u = (_unit_hash(F.col(id_col), seed) + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.log(u) / w
    keyed = df.filter(w > 0).select(
        F.col(stratum_col),
        F.col(id_col),
        w.alias("weight"),
        F.round(key, 8).alias("skey"),
    )
    win = Window.partitionBy(stratum_col).orderBy(F.desc("skey"), F.asc(id_col))
    return (
        keyed.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
