"""Tolerant-equality expression builder + failure taxonomy.

Reference parity (all semantics test-pinned upstream):
* numeric tolerant equality — validation/core/NumericComparison.scala:40-155:
  integral pairs compare EXACTLY (tolerance deliberately not applied,
  comment :81-85); fractional/decimal pairs compare ``|x-y| <= tol``;
  NaN == NaN; +/-Inf must sign-match (:86-113)
* type policies — Lenient / StrictType / DetectWiden (:40-79): StrictType
  requires identical declared types; DetectWiden allows Float->Double only
  when the widening is lossless (float value round-trips through double)
* timestamp tolerance — RowComparisonFailure.scala:281-290: ``|l-r| <=
  timestampMsTolerance`` ms, exact when tolerance = 0
* TTL/WRITETIME companions — RowComparisonFailure.scala:83-205: ``*_ttl``
  vs ``ttlToleranceMillis``; ``*_writetime`` vs
  ``writetimeToleranceMillis * 1000`` (writetimes are MICROseconds)
* binary equality — :300-306 (null-safe array equality)
* failure taxonomy — :49-74

Everything is a Catalyst column expression — the whole diff runs inside
WholeStageCodegen; no Python touches row values.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scylla_migrator_spark.config import Validation
from scylla_migrator_spark.schema import TTL_SUFFIX, WRITETIME_SUFFIX

# Failure taxonomy (RowComparisonFailure.scala:49-74)
MISSING_TARGET_ROW = "MissingTargetRow"
EXTRA_TARGET_ROW = "ExtraTargetRow"
MISMATCHED_COLUMN_COUNT = "MismatchedColumnCount"
MISMATCHED_COLUMN_NAMES = "MismatchedColumnNames"
DIFFERING_FIELD_VALUES = "DifferingFieldValues"
DIFFERING_TTLS = "DifferingTtls"
DIFFERING_WRITETIMES = "DifferingWritetimes"
NUMERIC_TYPE_MISMATCH = "NumericTypeMismatch"

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)


@dataclass(frozen=True)
class ColumnComparison:
    name: str
    kind: str  # failure kind emitted on mismatch
    equal: Column


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, (T.NumericType,))


def _fractional_equal(l: Column, r: Column, tol: float) -> Column:
    """NaN==NaN, signed-Inf match, else |l-r| <= tol (NumericComparison:86-113)."""
    both_nan = F.isnan(l) & F.isnan(r)
    inf = float("inf")
    pos_inf = (l == F.lit(inf)) & (r == F.lit(inf))
    neg_inf = (l == F.lit(-inf)) & (r == F.lit(-inf))
    finite = (
        ~F.isnan(l) & ~F.isnan(r)
        & (F.abs(l) != F.lit(inf)) & (F.abs(r) != F.lit(inf))
        & (F.abs(l - r) <= F.lit(tol))
    )
    return both_nan | pos_inf | neg_inf | finite


def numeric_equal(
    l: Column,
    r: Column,
    l_type: T.DataType,
    r_type: T.DataType,
    tolerance: float,
) -> Column:
    """Value-level numeric comparison after type-policy screening.

    Integral/integral -> exact (:81-85). Any fractional/decimal involvement ->
    tolerance compare with special-value handling. Cross-category pairs
    normalize via the wider representation (decimal when either side is
    decimal, else double)."""
    l_int, r_int = isinstance(l_type, _INTEGRAL), isinstance(r_type, _INTEGRAL)
    if l_int and r_int:
        return l == r
    l_dec, r_dec = isinstance(l_type, T.DecimalType), isinstance(r_type, T.DecimalType)
    if (l_dec or r_dec) and not isinstance(l_type, _FRACTIONAL) and not isinstance(r_type, _FRACTIONAL):
        # decimal-vs-decimal/integral: exact decimal arithmetic, no NaN/Inf
        wide = T.DecimalType(38, max(getattr(l_type, "scale", 0), getattr(r_type, "scale", 0)))
        return F.abs(l.cast(wide) - r.cast(wide)) <= F.lit(tolerance)
    return _fractional_equal(l.cast("double"), r.cast("double"), tolerance)


def check_type_policy(l_type: T.DataType, r_type: T.DataType, policy: str) -> bool:
    """Schema-level screening; False => NumericTypeMismatch
    (NumericComparison.scala:40-79, MySQLToScyllaValidator.scala:319-359).

    DetectWiden's value-level losslessness check is applied in
    :func:`equality_expr` when the pair is Float vs Double."""
    if policy == "lenient":
        return True
    if policy == "strict-type":
        return type(l_type) is type(r_type)
    # detect-widen: numeric widening allowed, category change not
    if type(l_type) is type(r_type):
        return True
    widen_ok = (
        (isinstance(l_type, _INTEGRAL) and isinstance(r_type, (_INTEGRAL, T.DecimalType)))
        or (isinstance(l_type, T.FloatType) and isinstance(r_type, T.DoubleType))
        or (isinstance(r_type, T.FloatType) and isinstance(l_type, T.DoubleType))
        or (isinstance(l_type, T.DecimalType) and isinstance(r_type, T.DecimalType))
    )
    return widen_ok


def _sorted_deep(col: Column, dt: T.DataType) -> Column:
    """Canonicalize set-typed arrays and maps for order-insensitive equality
    (reference set semantics §1.1; map comparison RowComparisonFailure:308-344)."""
    if isinstance(dt, T.ArrayType):
        # canonicalize elements first, then sort; scalar elements need no recursion
        if isinstance(dt.elementType, (T.ArrayType, T.MapType, T.StructType)):
            return F.array_sort(F.transform(col, lambda x: _sorted_deep(x, dt.elementType)))
        return F.array_sort(col)
    if isinstance(dt, T.MapType):
        entries = F.map_entries(col)
        if isinstance(dt.valueType, (T.ArrayType, T.MapType)):
            entries = F.transform(
                entries,
                lambda e: F.struct(
                    e.getField("key").alias("key"),
                    _sorted_deep(e.getField("value"), dt.valueType).alias("value"),
                ),
            )
        return F.array_sort(entries)
    return col


def equality_expr(
    l: Column,
    r: Column,
    l_type: T.DataType,
    r_type: T.DataType,
    v: Validation,
    is_set: bool = False,
) -> Column:
    """Null-safe tolerant equality for one column pair. Null==Null is equal;
    null vs value is a difference (RowComparisonFailure:274-299)."""
    both_null = l.isNull() & r.isNull()
    either_null = l.isNull() | r.isNull()

    if _is_numeric(l_type) and _is_numeric(r_type):
        eq = numeric_equal(l, r, l_type, r_type, v.floating_point_tolerance)
        if (
            v.numeric_type_policy == "detect-widen"
            and {type(l_type), type(r_type)} == {T.FloatType, T.DoubleType}
        ):
            # lossless-widening check: float value must round-trip
            f_side, d_side = (l, r) if isinstance(l_type, T.FloatType) else (r, l)
            eq = eq & (f_side.cast("double") == d_side)
    elif isinstance(l_type, T.TimestampType) and isinstance(r_type, T.TimestampType):
        if v.timestamp_ms_tolerance == 0:
            eq = l == r
        else:
            eq = F.abs(F.unix_millis(l) - F.unix_millis(r)) <= F.lit(v.timestamp_ms_tolerance)
    elif isinstance(l_type, (T.ArrayType, T.MapType)) and is_set:
        eq = _sorted_deep(l, l_type) == _sorted_deep(r, r_type)
    elif isinstance(l_type, T.MapType):
        eq = _sorted_deep(l, l_type) == _sorted_deep(r, r_type)
    else:
        # strings, binary, booleans, structs, order-sensitive arrays:
        # null-safe equal handles BinaryType correctly in Spark SQL (C8)
        return l.eqNullSafe(r)
    return both_null | (~either_null & eq)


def companion_equal(l: Column, r: Column, column: str, v: Validation) -> Column | None:
    """TTL / WRITETIME companion tolerance; None => skip comparison
    (compare_timestamps gate, RowComparisonFailure:151-189)."""
    if not v.compare_timestamps:
        return None
    if column.endswith(TTL_SUFFIX):
        tol = v.ttl_tolerance_millis
    elif column.endswith(WRITETIME_SUFFIX):
        tol = v.writetime_tolerance_millis * 1000  # writetime is µs
    else:
        return None
    both_null = l.isNull() & r.isNull()
    either_null = l.isNull() | r.isNull()
    return both_null | (~either_null & (F.abs(l.cast("long") - r.cast("long")) <= F.lit(tol)))


def build_column_comparisons(
    schema: T.StructType,
    src_prefix: str,
    tgt_prefix: str,
    primary_key: list[str],
    v: Validation,
    tgt_schema: T.StructType | None = None,
    set_columns: set[str] | None = None,
) -> tuple[list[ColumnComparison], list[str]]:
    """Per-column comparison expressions over a src_/tgt_-prefixed joined
    frame. Returns (comparisons, type_mismatch_columns)."""
    set_columns = set_columns or set()
    tgt_fields = {f.name: f for f in (tgt_schema or schema).fields}
    comparisons: list[ColumnComparison] = []
    type_mismatches: list[str] = []
    pk = set(primary_key)
    for f in schema.fields:
        if f.name in pk:
            continue
        if tgt_schema is not None and f.name not in tgt_fields:
            # column absent on the target side: reported as a schema-level
            # MismatchedColumnNames failure (RowComparisonFailure:96-117);
            # value comparison proceeds over the common columns only
            continue
        tgt_f = tgt_fields.get(f.name, f)
        l = F.col(src_prefix + f.name)
        r = F.col(tgt_prefix + f.name)
        comp = companion_equal(l, r, f.name, v)
        if comp is not None:
            kind = DIFFERING_TTLS if f.name.endswith(TTL_SUFFIX) else DIFFERING_WRITETIMES
            comparisons.append(ColumnComparison(f.name, kind, comp))
            continue
        if f.name.endswith((TTL_SUFFIX, WRITETIME_SUFFIX)) and not v.compare_timestamps:
            continue
        if _is_numeric(f.dataType) and _is_numeric(tgt_f.dataType):
            if not check_type_policy(f.dataType, tgt_f.dataType, v.numeric_type_policy):
                type_mismatches.append(f.name)
                continue
        eq = equality_expr(l, r, f.dataType, tgt_f.dataType, v, is_set=f.name in set_columns)
        comparisons.append(ColumnComparison(f.name, DIFFERING_FIELD_VALUES, eq))
    return comparisons, type_mismatches
