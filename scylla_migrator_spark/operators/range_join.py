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
