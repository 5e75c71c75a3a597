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


def test_chunk_documents_boundaries(spark):
    from scylla_migrator_spark.analytics.text import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(70))),  # 70 toks -> starts 1,25,49
        (2, " ".join(f"w{i}" for i in range(32))),  # exactly one chunk
        (3, " ".join(f"w{i}" for i in range(10))),  # short doc, one chunk
        (4, " ".join(f"w{i}" for i in range(33))),  # 2nd chunk adds token 33
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, "text", "doc_id", chunk_size=32, stride=24)
    got = {(r.doc_id, r.chunk_idx): (r.chunk_len, r.chunk_text.split()[0]) for r in out.collect()}
    assert got[(1, 0)] == (32, "w0")
    assert got[(1, 1)] == (32, "w24")
    assert got[(1, 2)] == (22, "w48")
    assert (1, 3) not in got
    # n <= chunk_size: exactly one chunk, no suffix-duplicate second chunk
    assert got[(2, 0)][0] == 32 and (2, 1) not in got
    assert got[(3, 0)][0] == 10 and (3, 1) not in got
    assert got[(4, 1)] == (9, "w24")


def test_vocab_top_terms_ties_and_counts(spark):
    from scylla_migrator_spark.analytics.text import vocab_top_terms

    df = spark.createDataFrame(
        [(1, "b a a"), (2, "b c"), (3, "c b")], ["doc_id", "text"]
    )
    out = vocab_top_terms(df, "text", k=2).collect()
    # b: 3 occurrences / 3 docs; a and c tie at 2 occurrences -> 'a' wins lexically
    assert [(r.tok, r.n_occurrences, r.n_docs) for r in out] == [("b", 3, 3), ("a", 2, 1)]


def test_benchmark_decontaminate_counts_distinct_hits(spark):
    from scylla_migrator_spark.analytics.dedup import benchmark_decontaminate

    bench = spark.createDataFrame([(100, "x y z w")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [
            (1, "x y z q"),        # shares shingle "x y z"
            (2, "q r s t"),        # clean
            (3, "x y z w extra"),  # shares "x y z" and "y z w"
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_hit_grams for r in
           benchmark_decontaminate(docs, bench, "text", "doc_id", n=3).collect()}
    assert out == {1: 1, 3: 2}


def test_normalize_text(spark):
    from pyspark.sql import functions as F

    from scylla_migrator_spark.analytics.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello,   WORLD!  ",), ("hello world",), ("Héllo wörld",)], ["t"]
    )
    out = [r["n"] for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
    assert out[0] == "hello world"
    assert out[0] == out[1]  # case/punct/spacing-insensitive equality
    assert out[2] == "hllo wrld"  # non-ascii letters stripped (documented)


def test_count_min_overestimates_only_and_exact_when_sparse(spark):
    from scylla_migrator_spark.analytics.text import count_min_estimates

    rows = [(i, "alpha " * (5 - i % 3) + f"uniq{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = count_min_estimates(df, "text", 5).collect()
    assert len(out) == 5
    for r in out:
        # one-sided error: the sketch can only overestimate
        assert r["cms_estimate"] >= r["true_count"]
    # with ~20 distinct tokens in 4x1024 counters, the top token is
    # collision-free and the estimate is exact
    top = max(out, key=lambda r: r["true_count"])
    assert top["w"] == "alpha" and top["cms_estimate"] == top["true_count"]


def test_hashed_bow_embedding_properties(spark):
    """Feature-hashing embedding: deterministic, dimension-correct, and
    additive — a doc repeated twice embeds to exactly 2x the single-doc
    vector (integer sums), and token order cannot matter."""
    from scylla_migrator_spark.analytics.text import hashed_bow_embedding

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"),
         (3, "alpha beta gamma alpha beta gamma"), (4, "")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: list(r["v"])
        for r in df.select(
            "doc_id", hashed_bow_embedding(F.col("text"), dim=8).alias("v")
        ).collect()
    }
    assert all(len(v) == 8 for v in out.values())
    assert out[1] == out[2]  # bag-of-words: order-free
    assert out[3] == [2 * x for x in out[1]]  # integer additivity
    assert sum(abs(x) for x in out[4]) == 1  # '' tokenizes to one token


def test_tfidf_hashed_features_weights_rare_tokens_higher(spark):
    """A token appearing in every doc gets idf ln(1)=0 (bucket weight 0 or
    absent); a rarer token carries ln(N/df) > 0 magnitude."""
    import math

    from scylla_migrator_spark.analytics.text import tfidf_hashed_features

    df = spark.createDataFrame(
        [(1, "common rare1"), (2, "common"), (3, "common"), (4, "common")],
        ["doc_id", "text"],
    )
    out = tfidf_hashed_features(df, "text", "doc_id", dim=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["w"]
    # 'common' (df=4/4): idf 0 -> every doc-2..4 bucket weight is exactly 0
    assert all(w == 0.0 for d in (2, 3, 4) for w in by_doc.get(d, {}).values())
    # doc 1 carries rare1's ln(4) in one bucket (sign aside)
    mags = sorted(abs(w) for w in by_doc[1].values())
    assert any(abs(m - round(math.log(4), 6)) < 1e-6 for m in mags)
