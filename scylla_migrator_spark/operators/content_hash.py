"""Content-hash digest for shuffle-volume reduction in validation.

Reference parity — validation/core/ContentHashJoiner.scala:16-65:
* per column: ``sha2(concat('0|', cast(c as string)), 256)`` with the null
  sentinel ``sha2('1|', 256)``; BinaryType goes through base64 first (:44-52)
* hashed columns sorted case-insensitively, combined with
  ``sha2(concat_ws('|', per_col...), 256)``
* the hashed payload columns are then DROPPED before the join — the shuffle
  carries one 64-char digest instead of N wide columns (:53-63). This is the
  one optimization Catalyst cannot invent; we keep it as an explicit plan
  choice (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTENT_HASH_COL = "__content_hash"


def _column_digest(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.BinaryType):
        rendered = F.base64(col)
    else:
        rendered = col.cast("string")
    present = F.sha2(F.concat(F.lit("0|"), rendered), 256)
    absent = F.sha2(F.lit("1|"), 256)
    return F.when(col.isNull(), absent).otherwise(present)


def add_content_hash(df: DataFrame, hash_columns: list[str], out_col: str = CONTENT_HASH_COL) -> DataFrame:
    """Append the combined digest and drop the hashed payload columns."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    ordered = sorted(hash_columns, key=str.lower)  # case-insensitive order (:37-40)
    digests = [_column_digest(F.col(c), fields[c]) for c in ordered]
    combined = F.sha2(F.concat_ws("|", *digests), 256)
    return df.withColumn(out_col, combined).drop(*hash_columns)
