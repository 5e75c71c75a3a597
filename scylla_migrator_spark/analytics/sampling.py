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
