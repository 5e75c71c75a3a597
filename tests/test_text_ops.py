"""Unit tests for the training-corpus text operators added for LLM-pipeline
coverage: PII redaction and sequence packing. Oracle parity is covered by
test_oracle_parity.py; these pin the operator semantics directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.analytics import text as TXT


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestRedactPII:
    def test_replaces_all_kinds_and_counts(self, spark):
        df = _docs(
            spark,
            [
                (1, "a", "mail me at bob.smith+x@example.co.uk or al@x.io today"),
                (2, "a", "server 10.0.255.7 then 192.168.1.1 rebooted"),
                (3, "a", "call 555-123-4567 or 555 987 6543 now"),
                (4, "a", "clean text, no pii at all"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in TXT.redact_pii(df, "text").collect()
        }
        assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 0
        assert out[1]["text_redacted"] == "mail me at [EMAIL] or [EMAIL] today"
        assert out[2]["n_ipv4"] == 2
        assert out[2]["text_redacted"] == "server [IP] then [IP] rebooted"
        assert out[3]["n_phone"] == 2
        assert out[3]["text_redacted"] == "call [PHONE] or [PHONE] now"
        assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
        assert out[4]["text_redacted"] == "clean text, no pii at all"

    def test_counts_on_original_text_kinds_dont_mask(self, spark):
        # a phone-shaped local part inside an email: the email replacement
        # consumes it, but counts are pinned to the ORIGINAL text, so the
        # phone is still audited even though [EMAIL] wins the redaction
        df = _docs(spark, [(1, "a", "reach 555-123-4567@example.com maybe")])
        row = TXT.redact_pii(df, "text").collect()[0]
        assert row["n_email"] == 1
        assert row["n_phone"] == 1
        assert row["text_redacted"] == "reach [EMAIL] maybe"


class TestPackSequences:
    def test_offsets_and_bins(self, spark):
        # token counts: 3, 4, 2  -> offsets 0, 3, 7 with capacity 5
        df = _docs(
            spark,
            [
                (10, "s1", "a b c"),
                (11, "s1", "d e f g"),
                (12, "s1", "h i"),
            ],
        )
        rows = {
            r["doc_id"]: r
            for r in TXT.pack_sequences(df, capacity=5, shard_col="source").collect()
        }
        assert (rows[10]["bin_id"], rows[10]["bin_offset"]) == (0, 0)
        assert (rows[11]["bin_id"], rows[11]["bin_offset"]) == (0, 3)
        assert (rows[12]["bin_id"], rows[12]["bin_offset"]) == (1, 2)

    def test_shards_pack_independently(self, spark):
        df = _docs(
            spark,
            [(1, "s1", "a b"), (2, "s2", "c d e"), (3, "s1", "f"), (4, "s2", "g")],
        )
        rows = {
            r["doc_id"]: r
            for r in TXT.pack_sequences(df, capacity=4, shard_col="source").collect()
        }
        # each shard restarts at offset 0
        assert rows[1]["bin_offset"] == 0 and rows[2]["bin_offset"] == 0
        assert rows[3]["bin_offset"] == 2  # after doc 1's two tokens
        assert rows[4]["bin_offset"] == 3  # after doc 2's three tokens

    def test_single_window_no_global_sort(self, spark):
        df = _docs(spark, [(1, "s1", "a b"), (2, "s2", "c")])
        plan = TXT.pack_sequences(df, capacity=4, shard_col="source")._jdf.queryExecution().executedPlan().toString()
        # partitioned window: hashpartitioning on the shard, never a global Sort
        assert plan.count("Exchange") <= 1
        assert "rangepartitioning" not in plan.lower()
