"""Deterministic broadcast Bloom filter for runtime join pruning.

Spark's adaptive runtime bloom filter (SPARK-32268,
``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects exactly this
shape automatically: hash the small side's join keys into a bitmap, ship
the bitmap to every probe-side task, and drop non-members at the SCAN
stage so the shuffle/join only ever sees rows that can match. This module
makes the technique explicit and *deterministic* — bit positions derive
from md5, which DuckDB can replay bit-for-bit — so the pruning itself is
oracle-checkable, and callers get the pruning statistics (candidate vs
exact counts → measured false-positive rate) that the built-in optimizer
hides.

Why this matters at 100 TB: a semi-join against a 1%-selective dim
normally shuffles the full fact table on the join key. A ``num_bits``-bit
bitmap (KBs) rides the broadcast instead, and ~99% of fact rows die at
the scan before any exchange. Bloom filters have NO false negatives by
construction, so following the pruned scan with the exact (broadcast)
semi-join gives a result identical to the unpruned join — the filter is
purely an early-exit, which ``bloom_semi_join_prune`` in
``plans/queries.py`` proves against its oracle.

Hash family (shared contract with the SQL oracles, same md5-derandomize
convention as ``analytics/text._md5_int``):

    pos_i(key) = conv(substr(md5(cast(key AS string) || ':' || i), 1, 8),
                      16, 10) % num_bits          for i in 0..num_hashes-1
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.text import _md5_int


def bit_positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """The k md5-derived bit positions for one key (column form)."""
    return [
        _md5_int(F.concat_ws(":", key.cast("string"), F.lit(str(i)))) % num_bits
        for i in range(num_hashes)
    ]


def build_bloom_bitmap(
    keys: DataFrame, key_col: str, *, num_hashes: int = 3, num_bits: int = 4096
) -> list[int]:
    """Aggregate the build side into a ``num_bits``-bit bitmap.

    Returns the bitmap as ``num_bits/64`` signed 64-bit words (SQL literal
    form). The collect is bounded BY CONSTRUCTION at ``num_bits`` distinct
    positions regardless of build-side cardinality — the set-bit list is
    distinct-ed on the cluster before it reaches the driver, so a
    billion-key build side still ships at most ``num_bits`` ints (the
    same bounded-collect discipline as the ≤16-row centroid fetches).
    """
    pos_rows = (
        keys.select(
            F.explode(
                F.array(*bit_positions(F.col(key_col), num_hashes, num_bits))
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * ((num_bits + 63) // 64)
    for r in pos_rows:
        p = int(r["pos"])
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prune(
    df: DataFrame,
    key_col: str,
    words: list[int],
    *,
    num_hashes: int = 3,
    num_bits: int = 4096,
    negate: bool = False,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` might be in the bitmap.

    The bitmap rides the plan as ONE parsed array literal (a py4j
    string, not per-element ``F.lit`` — the measured 18× driver-side
    build saving), and the membership test is a pure scan-stage column
    predicate: no shuffle, no Python, codegen-able. Guaranteed superset
    of the true member rows (no false negatives).

    ``negate=True`` keeps only DEFINITE non-members (at least one bit
    unset) — the anti-dedup form: every kept row is guaranteed novel;
    the cost is novel rows wrongly dropped at the false-positive rate.
    Works on streaming DataFrames too (stateless scan predicate)."""
    if len(words) != (num_bits + 63) // 64:
        raise ValueError(
            f"bitmap has {len(words)} words, expected {(num_bits + 63) // 64}"
        )
    bm_col = "__bloom_bm"
    tmp_cols = [bm_col] + [f"__bloom_p{i}" for i in range(num_hashes)]
    clash = [c for c in tmp_cols if c in df.columns]
    if clash:
        raise ValueError(
            f"bloom_prune: input already has internal column(s) {clash}; "
            "rename them"
        )
    key_sql = "`" + key_col.replace("`", "``") + "`"
    bitmap = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    probed = df.withColumn(bm_col, bitmap)
    terms = []
    for i in range(num_hashes):
        # each position is MATERIALIZED as one projected column so the
        # bit test (index + shift) references a computed value instead of
        # inlining the md5 expression twice per term — at k hashes that
        # would be up to 2k hash evaluations per probe row
        pos_col = f"__bloom_p{i}"
        probed = probed.withColumn(
            pos_col,
            F.expr(
                f"pmod(cast(conv(substring(md5(concat_ws(':', "
                f"cast({key_sql} as string), '{i}')), 1, 8), 16, 10) as "
                f"bigint), {num_bits})"
            ),
        )
        terms.append(
            f"((element_at({bm_col}, cast({pos_col} div 64 as int) + 1)"
            f" >> pmod({pos_col}, 64)) & 1) = 1"
        )
    predicate = " AND ".join(terms)
    if negate:
        predicate = f"NOT ({predicate})"
    return probed.filter(predicate).drop(*tmp_cols)
