"""Round-5d operators: passage-level (segment) corpus dedup with document
reconstruction, and the Gopher rule-based quality filter.

Both also run under the full oracle-parity suite; these tests pin the edge
semantics the fixture corpus cannot exercise: keep-first ordering across and
within documents, short-document segmentation, full-repeat reconstruction to
'', and integer-exact boundary behaviour of the Gopher thresholds."""

from __future__ import annotations

from pyspark.sql import Row

from scylla_migrator_spark.analytics import dedup as D
from scylla_migrator_spark.analytics import text as TXT


def _seg(spark, rows, seg_tokens=2):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    out = D.segment_dedup(df, "text", "doc_id", seg_tokens=seg_tokens)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_segment_dedup_keeps_first_occurrence_across_docs(spark):
    # doc 0 owns "a b"; doc 1 repeats it and keeps only its novel tail
    got = _seg(spark, [(0, "a b c d"), (1, "a b x y")])
    assert got[0] == {
        "doc_id": 0, "n_segments": 2, "kept_segments": 2, "cleaned_text": "a b c d"
    }
    assert got[1] == {
        "doc_id": 1, "n_segments": 2, "kept_segments": 1, "cleaned_text": "x y"
    }


def test_segment_dedup_drops_repeat_within_one_doc(spark):
    got = _seg(spark, [(0, "a b a b c d")])
    assert got[0]["n_segments"] == 3
    assert got[0]["kept_segments"] == 2
    assert got[0]["cleaned_text"] == "a b c d"


def test_segment_dedup_full_repeat_reconstructs_empty(spark):
    got = _seg(spark, [(0, "a b"), (1, "a b")])
    assert got[1] == {
        "doc_id": 1, "n_segments": 1, "kept_segments": 0, "cleaned_text": ""
    }


def test_segment_dedup_short_doc_is_one_segment(spark):
    got = _seg(spark, [(0, "solo")], seg_tokens=8)
    assert got[0] == {
        "doc_id": 0, "n_segments": 1, "kept_segments": 1, "cleaned_text": "solo"
    }


def test_segment_dedup_order_is_doc_id_then_position(spark):
    # the shared segment sits LATE in doc 0 but doc 0 still wins it
    # (corpus order is (doc_id, seg_idx), not position alone)
    got = _seg(spark, [(0, "q r a b"), (1, "a b s t")])
    assert got[0]["cleaned_text"] == "q r a b"
    assert got[1]["cleaned_text"] == "s t"


def test_segment_dedup_rejects_nonpositive_segment_size(spark):
    import pytest

    df = spark.createDataFrame([Row(doc_id=0, text="a")])
    with pytest.raises(ValueError):
        D.segment_dedup(df, "text", "doc_id", seg_tokens=0)


def _gopher_one(spark, text):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    return TXT.gopher_quality(df, "text").collect()[0].asDict()


def test_gopher_boundaries_are_integer_exact(spark):
    # exactly 50 words of exactly 3 chars each, with 2 designated stopwords:
    # every rule sits ON its published boundary and must pass
    words = ["the", "and"] + ["abc"] * 48
    got = _gopher_one(spark, " ".join(words))
    assert got["n_words"] == 50
    assert got["flag_word_count"] == 1
    assert got["flag_mean_word_len"] == 1  # mean exactly 3.0
    assert got["flag_alpha_words"] == 1
    assert got["flag_stopwords"] == 1
    assert got["pass_gopher"] == 1


def test_gopher_one_word_under_minimum_fails_word_count_only(spark):
    words = ["the", "and"] + ["abc"] * 47  # 49 words
    got = _gopher_one(spark, " ".join(words))
    assert got["flag_word_count"] == 0
    assert got["flag_mean_word_len"] == 1
    assert got["pass_gopher"] == 0


def test_gopher_alpha_ratio_exact_eighty_percent_passes(spark):
    # the paper's threshold is 80% of words with an alphabetic character:
    # 40 alphabetic + 10 numeric of 50 = exactly 80% -> pass
    words = ["the", "and"] + ["abc"] * 38 + ["123"] * 10
    got = _gopher_one(spark, " ".join(words))
    assert got["flag_alpha_words"] == 1
    sub = ["the", "and"] + ["abc"] * 37 + ["123"] * 11  # 78%
    got2 = _gopher_one(spark, " ".join(sub))
    assert got2["flag_alpha_words"] == 0


def test_gopher_symbol_ratio_rule(spark):
    # symbol-to-word ratio > 0.1 for '#' or '...' fails the document;
    # exactly 0.1 (5 symbols / 50 words) sits ON the boundary and passes
    base = ["the", "and"] + ["abc"] * 48
    got = _gopher_one(spark, " ".join(base) + " " + "# " * 5)
    # 5 hashes over 55 words: 50 <= 55 -> passes
    assert got["hash_count"] == 5
    assert got["flag_symbol_ratio"] == 1
    many = " ".join(base) + " " + "# " * 7  # 70 > 57: fails
    got2 = _gopher_one(spark, many)
    assert got2["flag_symbol_ratio"] == 0
    assert got2["pass_gopher"] == 0
    ell = " ".join(base) + " ... ... ... ... ... ... ..."  # 7/57 > 0.1
    got3 = _gopher_one(spark, ell)
    assert got3["ellipsis_count"] == 7
    assert got3["flag_symbol_ratio"] == 0
    # '....' counts as ONE ellipsis under left-to-right replace semantics
    got4 = _gopher_one(spark, " ".join(base) + " ....")
    assert got4["ellipsis_count"] == 1
    assert got4["flag_symbol_ratio"] == 1


def test_gopher_stopword_rule_counts_distinct_markers(spark):
    # 'the' repeated 50 times is still only ONE designated stopword
    got = _gopher_one(spark, " ".join(["the"] * 50))
    assert got["stop_hits"] == 1
    assert got["flag_stopwords"] == 0


def test_gopher_mean_word_len_upper_bound(spark):
    words = ["the", "with"] + ["a" * 11] * 48  # mean > 10
    got = _gopher_one(spark, " ".join(words))
    assert got["flag_mean_word_len"] == 0
    assert got["pass_gopher"] == 0


def test_leakage_free_split_no_pair_straddles_splits(spark, sf_dir):
    """The whole point of the cluster-keyed split: for EVERY near-dup pair,
    both endpoints land in the same split (zero crossing pairs), while the
    doc-keyed hash split leaves that unguaranteed. Also checks the split is
    a total assignment (every doc, exactly once)."""
    from pyspark.sql import functions as F

    from scylla_migrator_spark.analytics import sampling as SAMP
    from scylla_migrator_spark.analytics.components import connected_components
    from scylla_migrator_spark.plans.queries import _simhash_pairs_staged, _t

    pairs = _simhash_pairs_staged(spark, sf_dir)
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grouped = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("gk")
    )
    assigned = SAMP.assign_splits(
        grouped, key_col="gk", val_frac=0.05, test_frac=0.05, salt="groupsplit"
    ).select("doc_id", "split")
    assert assigned.count() == docs.count()

    a = assigned.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sp_a")
    b = assigned.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sp_b")
    crossing = pairs.join(a, "id_a").join(b, "id_b").filter(F.col("sp_a") != F.col("sp_b"))
    assert crossing.count() == 0
