"""Bin-bucketed interval/range join — points matched into intervals without
the O(|L|·|R|)-per-key explosion of a raw inequality join.

The reference has no range joins (all its joins are PK equi-joins); this is
part of the engine's analytics extension surface, built the way a large-scale
engine plans a range join: turn the inequality into an equi-join on a
synthetic bucket key so the shuffle machinery (and AQE) can handle it.

Scale design:

* each interval ``[start, end]`` is exploded into the buckets it covers
  (``sequence(floor(start/w), floor(end/w))``) — with ``w`` chosen >= the
  typical interval width this is 1-2 rows per interval, not a blowup;
* each point lands in exactly ONE bucket (``floor(ts/w)``), so after the
  equi-join on ``(keys..., bucket)`` and the exact containment filter the
  result needs NO dedup;
* the join is a plain shuffled equi-join: broadcastable when one side is
  small, AQE-skew-splittable, partition-prunable — everything a raw
  theta-join forfeits.

Pick ``bucket_width`` close to the 95th-percentile interval width: too small
explodes intervals into many buckets, too large inflates candidate pairs per
bucket before the filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_points"]

_BUCKET = "__range_bucket"


def range_join_points(
    intervals: DataFrame,
    points: DataFrame,
    on: list[str],
    start_col: str,
    end_col: str,
    point_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``points`` into ``intervals`` where
    ``start <= point <= end`` and the key columns match.

    Returns all interval columns plus all non-key point columns. Numeric
    (long) ts domains; cast timestamps to epoch micros first.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = (set(intervals.columns) & set(points.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    pt = points.withColumn(_BUCKET, F.floor(F.col(point_col) / bucket_width))
    return (
        iv.join(pt, on=[*on, _BUCKET])
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
        .drop(_BUCKET)
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_cols: list[str],
    t0_col: str = "t0",
    t1_col: str = "t1",
    bucket_width: int = 3_600_000_000_000,
    antisym_col: str | None = None,
) -> DataFrame:
    """INTERVAL-INTERVAL overlap join: all pairs of intervals with
    ``a.t0 <= b.t1 AND b.t0 <= a.t1`` — concurrency detection (overlapping
    sessions, co-active users, booking conflicts), the two-sided sibling
    of :func:`range_join_points`.

    Same scale design: both sides explode into the coarse buckets they
    span, candidates come from a plain equi-join on the bucket (shuffle
    machinery + AQE apply, no theta-join), the exact overlap predicate
    filters, and — because two long intervals can co-occupy several
    buckets — a DISTINCT on the pair identity dedups multi-bucket
    matches. ``antisym_col`` (e.g. the user id) orders the pair
    (a < b) so each overlap appears once; when omitted, the FULL
    ``id_cols`` tuple orders the pair instead (lexicographic struct
    comparison) — identity pairs are always excluded and each unordered
    pair appears exactly once either way. Output carries both sides' id
    columns plus ``overlap_ns`` (integer-exact:
    ``least(t1s) - greatest(t0s)``)."""
    lo, hi = F.col(t0_col), F.col(t1_col)
    bucketed = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(bucket_width)), F.floor(hi / F.lit(bucket_width))
            )
        ),
    )
    a = bucketed.select(
        F.col("__bkt"), *[F.col(c).alias(f"{c}_a") for c in (*id_cols, t0_col, t1_col)]
    )
    b = bucketed.select(
        F.col("__bkt"), *[F.col(c).alias(f"{c}_b") for c in (*id_cols, t0_col, t1_col)]
    )
    cond = [
        F.col(f"{t0_col}_a") <= F.col(f"{t1_col}_b"),
        F.col(f"{t0_col}_b") <= F.col(f"{t1_col}_a"),
    ]
    if antisym_col is not None:
        cond.append(F.col(f"{antisym_col}_a") < F.col(f"{antisym_col}_b"))
    else:
        # no caller-chosen ordering column: order by the full id tuple so
        # identity pairs drop and each unordered pair appears exactly once
        cond.append(
            F.struct(*[F.col(f"{c}_a") for c in id_cols])
            < F.struct(*[F.col(f"{c}_b") for c in id_cols])
        )
    pair_ids = [f"{c}_a" for c in id_cols] + [f"{c}_b" for c in id_cols]
    overlap = F.least(F.col(f"{t1_col}_a"), F.col(f"{t1_col}_b")) - F.greatest(
        F.col(f"{t0_col}_a"), F.col(f"{t0_col}_b")
    )
    return (
        a.join(b, on=[a["__bkt"] == b["__bkt"], *cond])
        .select(*pair_ids, overlap.cast("long").alias("overlap_ns"))
        .distinct()
    )
