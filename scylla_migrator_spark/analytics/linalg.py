"""Distributed linear algebra primitives over embedding columns.

Power iteration for the top principal component of the (uncentered) Gram
matrix X^T X: v_{k+1} = normalize(X^T (X v_k)) — each iteration is ONE pass
over the corpus (the matrix is never materialized; X^T X is dim², X v is a
per-row fold). This is the 100 TB shape for spectral statistics of an
embedding table: per-iteration cost is a map-side-combined aggregation of
``dim`` decimal sums, driver state is one dim-length vector.

Determinism contract (what makes the result oracle-replayable in SQL):
- start vector = all-ones (no RNG; sign is pinned by the start);
- every dot product is a sum of per-element products truncated to
  DECIMAL(18,9) BEFORE summation — an associative-exact reduction,
  independent of row order, shuffle, and engine;
- the normalized vector is rounded to 6 dp between iterations, so the
  literals fed into iteration k+1 are identical on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,9)"


def _dec_dot(x: Column, v: list[float]) -> Column:
    """Sum_j x[j] * v[j] with per-product DECIMAL(18,9) truncation — the
    order-exact dot product used on both the Spark and oracle sides."""
    from scylla_migrator_spark.analytics.similarity import lit_vec

    arr = lit_vec(v)
    prods = F.zip_with(x, arr, lambda a, b: (a * b).cast(_DEC))
    # the re-cast keeps the accumulator type stable across the fold; it is
    # lossless here (|product| < 1, <= a few thousand terms — far inside
    # decimal(18,9)'s integer range), so fold == plain decimal sum
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, p: (acc + p).cast(_DEC)
    )


def power_iteration_top_pc(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 2,
    dim: int | None = None,
) -> list[float]:
    """The dominant eigenvector of X^T X after ``iters`` power iterations
    from the all-ones start, as a Python list (rounded 6 dp per iteration).

    Per iteration: one distributed pass computing t_d = sum_i x_id (x_i·v)
    as a posexplode-to-(dim, term) decimal aggregation (map-side combined;
    the shuffle carries dim partial sums per partition, nothing
    row-shaped; a single aggregate expression at any dimension), then a
    driver-side normalize of a dim-length vector."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty input")
        dim = int(first["d"])
    x = F.col(vec_col).cast("array<double>")
    v = [1.0] * dim
    for _ in range(iters):
        # project the per-row dot ONCE, then aggregate over the projected
        # column — inlining _dec_dot into each of the dim aggregates would
        # evaluate the full dim-element fold dim times per row (O(dim^2))
        dotted = df.select(
            x.alias("__x"), _dec_dot(x, v).cast("double").alias("__dot")
        )
        # dim-scalable form: posexplode to (dim_pos, x*dot) and run ONE
        # aggregate grouped by position instead of a dim-length aggregate
        # list — at production dims (768-4096) the per-dimension expression
        # list stops being plannable; the exploded groupBy partial-aggs
        # map-side, so the shuffle still carries dim partial sums per
        # partition. Per-term decimal truncation is identical to the
        # per-dim-aggregate form, so the reduction stays associative-exact
        # and the result bit-identical.
        rows = (
            dotted.select(F.posexplode("__x").alias("pos", "xv"), "__dot")
            .groupBy("pos")
            .agg(F.sum((F.col("xv") * F.col("__dot")).cast(_DEC)).alias("t"))
            .collect()
        )
        if not rows:
            raise ValueError("empty input")
        by_pos = {r["pos"]: float(r["t"]) for r in rows}
        t = [by_pos[i] for i in range(dim)]
        nrm = math.sqrt(sum(c * c for c in t))
        if nrm == 0.0:
            raise ValueError("power iteration collapsed to the zero vector")
        v = [round(c / nrm, 6) for c in t]
    return v


def top_pc_df(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """:func:`power_iteration_top_pc` as a DataFrame (dim_idx, pc) — the
    queries()-surface form (1-based dim_idx to match SQL array indexing)."""
    spark = df.sparkSession
    v = power_iteration_top_pc(df, vec_col, iters, dim)
    return spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(v)], "dim_idx INT, pc DOUBLE"
    )


def project_onto(
    df: DataFrame,
    v: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "projection",
) -> DataFrame:
    """Projection of every vector onto a fixed direction (e.g. the learned
    top PC): the scan-stage scalar score used for spectral outlier filtering
    and ordering. Narrow projection, decimal-exact dot."""
    x = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col),
        F.round(_dec_dot(x, v).cast("double"), 6).alias(out_col),
    )
