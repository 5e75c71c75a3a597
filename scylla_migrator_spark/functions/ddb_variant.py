"""DynamoDB item data model: the 10-type attribute ADT as a closed recursive
Spark struct ("variant"), with a canonical DynamoDB-JSON codec and
order-insensitive deep equality.

Reference parity:
* DdbValue ADT — alternator/DdbValue.scala:20-57: S, N (string-encoded
  arbitrary-precision number), B, BOOL, NULL, L, M, SS, NS, BS
* JSON decode — readers/DynamoDBS3Export.scala:240-292
* canonical JSON encode (sorted map keys; SS sorted lexically, NS sorted
  numerically, BS sorted by base64) — writers/DynamoDBS3Export.scala:166-219
* deep equality (sets order-insensitive, N compared as BigDecimal) —
  validation/RowComparisonFailure.scala:308-344

Design: DynamoDB nests to max depth 32; a closed recursive struct to that
depth would explode the schema, so we encode L and M values as JSON strings
at each level and expose depth-1 typed fields. Items round-trip losslessly
because the nested payloads stay canonical JSON. Comparison canonicalizes at
every depth via recursive Python only in tests; the engine path compares
canonical JSON strings — a single string equality per attribute.
"""

from __future__ import annotations

import base64
import json
from decimal import Decimal
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# depth-1 typed variant schema; L/M carry canonical JSON payloads
VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("S", T.StringType()),
        T.StructField("N", T.StringType()),  # string-encoded arbitrary precision
        T.StructField("B", T.StringType()),  # base64
        T.StructField("BOOL", T.BooleanType()),
        T.StructField("NULL", T.BooleanType()),
        T.StructField("L", T.StringType()),  # canonical JSON array
        T.StructField("M", T.StringType()),  # canonical JSON object
        T.StructField("SS", T.ArrayType(T.StringType())),
        T.StructField("NS", T.ArrayType(T.StringType())),
        T.StructField("BS", T.ArrayType(T.StringType())),
    ]
)

ITEM_SCHEMA = T.MapType(T.StringType(), VARIANT_SCHEMA)


def _canon_number(n: str) -> str:
    """Normalize a DynamoDB number string: '1.50' == '1.5' == '1.500'
    (BigDecimal compare, RowComparisonFailure.scala:308-314)."""
    d = Decimal(n)
    out = format(d.normalize(), "f")
    return out


def canonicalize_value(av: dict[str, Any]) -> dict[str, Any]:
    """Canonical form of one AttributeValue JSON: sorted map keys, sorted
    sets (SS lexical, NS numeric, BS by base64 bytes), normalized numbers.
    Recursion handles arbitrary nesting (driver/test-side Python; the engine
    compares the canonical strings)."""
    (tag, val), = av.items()
    if tag == "S":
        return {"S": val}
    if tag == "N":
        return {"N": _canon_number(val)}
    if tag == "B":
        return {"B": val}
    if tag == "BOOL":
        return {"BOOL": bool(val)}
    if tag == "NULL":
        return {"NULL": True}
    if tag == "L":
        return {"L": [canonicalize_value(v) for v in val]}
    if tag == "M":
        return {"M": {k: canonicalize_value(v) for k, v in sorted(val.items())}}
    if tag == "SS":
        return {"SS": sorted(set(val))}
    if tag == "NS":
        return {"NS": sorted({_canon_number(v) for v in val}, key=Decimal)}
    if tag == "BS":
        return {"BS": sorted(set(val), key=lambda b: base64.b64decode(b))}
    raise ValueError(f"unknown DynamoDB attribute tag {tag!r}")


def canonical_json(av: dict[str, Any]) -> str:
    """Deterministic JSON encoding (sort_keys at every level) — two items are
    deeply equal iff their canonical JSON strings are equal."""
    return json.dumps(canonicalize_value(av), sort_keys=True, separators=(",", ":"))


def item_to_canonical_json(item: dict[str, Any]) -> str:
    """Whole item (attribute name -> AttributeValue) canonical encoding
    (writers/DynamoDBS3Export.scala:172-219: item keys sorted)."""
    return json.dumps(
        {k: canonicalize_value(v) for k, v in sorted(item.items())},
        sort_keys=True,
        separators=(",", ":"),
    )


# ---------------------------------------------------------------------------
# Column-level codec: items as JSON-string columns <-> typed map columns
# ---------------------------------------------------------------------------


def parse_item(col: Column) -> Column:
    """DynamoDB-JSON item string -> map<string, variant> (depth-1 typed)."""
    return F.from_json(col, ITEM_SCHEMA)


def key_field(item: Column, attr: str, tag: str = "S") -> Column:
    """Project a key attribute out of an item map (e.g. partition key)."""
    return item.getItem(attr).getField(tag)


def item_canonical_sets(col: Column) -> Column:
    """Engine-side canonicalization of the set-typed fields of a depth-1
    variant map: SS sorted, NS normalized+sorted numerically, BS sorted by
    decoded bytes — pure column expressions (O3 sorted-encoding semantics,
    writers/DynamoDBS3Export.scala:172-219)."""
    def canon(v: Column) -> Column:
        ns = F.array_sort(
            F.transform(v.getField("NS"), lambda x: x.cast("decimal(38,10)"))
        )
        return F.struct(
            v.getField("S").alias("S"),
            v.getField("N").cast("decimal(38,10)").cast("string").alias("N"),
            v.getField("B").alias("B"),
            v.getField("BOOL").alias("BOOL"),
            v.getField("NULL").alias("NULL"),
            v.getField("L").alias("L"),
            v.getField("M").alias("M"),
            F.array_sort(v.getField("SS")).alias("SS"),
            F.transform(ns, lambda x: x.cast("string")).alias("NS"),
            F.array_sort(F.transform(v.getField("BS"), F.unbase64)).alias("BS_bytes"),
        )

    return F.transform_values(col, lambda _k, v: canon(v))


def items_deep_equal(l: Column, r: Column) -> Column:
    """Order-insensitive deep equality of two depth-1 variant item maps
    (V2/C9): keysets must match and every attribute's canonical form must
    match. Maps aren't directly comparable in Spark SQL -> compare sorted
    entry arrays."""
    lc, rc = item_canonical_sets(l), item_canonical_sets(r)
    return F.array_sort(F.map_entries(lc)) == F.array_sort(F.map_entries(rc))
