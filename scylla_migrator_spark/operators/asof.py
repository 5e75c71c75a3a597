"""As-of (most-recent-match) join — a temporal operator the reference lacks
(its joins are all PK equi-joins, ScyllaValidator.scala:189-200) and Spark has
no built-in for; part of the engine's analytics extension surface.

Semantics: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` (inclusive backward as-of, the default) or
``right_ts < left_ts`` (``strict=True`` — the leakage-safe point-in-time
variant) within the same key group. Ties on ``right_ts`` resolve to the
greatest ``tiebreak`` value, making the result deterministic.

Scale design — the union-sort plan, NOT a range-exploded join:

* both sides are tagged and unioned, then sorted within each key partition by
  ``(ts, side, tiebreak)``; at equal timestamps rights order before lefts
  for inclusive semantics, after them for strict (the side constants flip);
* one running ``last(right_payload, ignorenulls=True)`` window carries the
  most recent right struct forward; left rows then just read it.

Cost: ONE shuffle by key + one sort — O(n log n) per partition, no
candidate-pair blowup, no skew amplification beyond the key distribution
itself (a hot key can additionally be salted upstream). The equivalent
inequality join would explode to O(|L|·|R|) per key before filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]

_SIDE = "__asof_side"
_TS = "__asof_ts"
_TIE = "__asof_tie"
_PAYLOAD = "__asof_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | Column | None = None,
    how: str = "inner",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: inclusive (``right_ts <= left_ts``) by default,
    strict (``right_ts < left_ts``) with ``strict=True``.

    Strict mode is the leakage-safe variant for point-in-time feature
    lookups: a feature recorded at exactly the prediction instant is NOT
    visible (same-instant data is "the future" for training purposes). The
    plan is identical — only the sort order of the two sides at equal
    timestamps flips.

    Returns the left columns plus every right column (except the key columns)
    from the as-of matched right row. ``how='left'`` keeps unmatched left rows
    with nulls; ``how='inner'`` drops them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")

    right_payload = [c for c in right.columns if c not in on]
    left_cols = list(left.columns)

    # inclusive: rights sort BEFORE lefts at equal ts (right side 0, left 1)
    # => a same-instant right is visible. strict: the order flips, so a
    # left row at ts t only sees rights with ts strictly below t.
    right_side, left_side = (1, 0) if strict else (0, 1)

    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        (F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak or F.lit(0)).alias(_TIE),
        F.struct(*[F.col(c) for c in right_payload]).alias(_PAYLOAD),
        F.lit(right_side).alias(_SIDE),
    ).withColumns({c: F.lit(None) for c in left_cols if c not in on})

    l = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(None).cast("long").alias(_TIE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(left_side).alias(_SIDE),
    )

    # among equal-ts rights the LAST one (max tiebreak) is carried forward
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE, _TIE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r.select(*l.columns)).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )

    matched = merged.filter(F.col(_SIDE) == left_side)
    if how == "inner":
        matched = matched.filter(F.col(_PAYLOAD).isNotNull())
    return matched.select(
        *left_cols,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_payload],
    )
