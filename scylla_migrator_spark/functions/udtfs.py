"""Python UDTFs (Spark 4 user-defined table functions) — the declarative
twin of the reference's flatMap row explosion (SURVEY §2.13: explodeRow at
Cassandra.scala:113-169 is "the closest thing to a UDTF" the reference has).

A UDTF appears in SQL as a table factor (``..., LATERAL split_sentences(t.c)``),
so Catalyst plans column pruning and filter placement around it like any
other relation — unlike an RDD flatMap, which is opaque to the optimizer.
``useArrow=True`` ships rows in Arrow batches (the same transport as Pandas
UDFs), not pickled one at a time.

Scale notes: a UDTF runs once per input row inside the task that owns the
row — no shuffle is introduced; output cardinality is the explosion factor.
For hot paths expressible as built-ins (split + explode), prefer those; the
UDTF surface is for logic that genuinely needs Python (tokenizers, parsers)
while keeping SQL composability.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx int, sentence string, n_chars int", useArrow=True)
class SplitSentences:
    """Split a document into '.'-delimited sentences, one output row per
    non-blank part, with the part's index in the raw split (so the oracle's
    ``generate_subscripts(string_split(...))`` replays it exactly)."""

    def eval(self, text: str):  # noqa: ANN201 - Spark introspects the signature
        if text is None:
            return
        for i, part in enumerate(text.split(".")):
            # blank = ASCII space/tab/CR/LF only — the same character set the
            # oracle's trim(sentence, ' \t\n\r') uses; bare str.strip() would
            # also strip Unicode whitespace (e.g. NBSP) and diverge from SQL
            if part.strip(" \t\n\r"):
                yield i, part, len(part)


def register_udtfs(spark: SparkSession) -> None:
    """Register every engine UDTF in the session's function catalog."""
    spark.udtf.register("split_sentences", SplitSentences)
