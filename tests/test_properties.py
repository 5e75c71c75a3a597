"""Property-based tests (hypothesis) for the pure-Python DynamoDB variant
codec — invariants the engine's comparisons depend on. No Spark session."""

from __future__ import annotations

import base64
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_migrator_spark.functions.ddb_variant import (
    canonical_json,
    canonicalize_value,
    item_to_canonical_json,
)

# strategy for DynamoDB AttributeValue JSON trees (bounded depth)
_number = st.decimals(
    allow_nan=False, allow_infinity=False, places=6, min_value=-10**12, max_value=10**12
).map(lambda d: str(d))
_b64 = st.binary(max_size=12).map(lambda b: base64.b64encode(b).decode())
_scalar = st.one_of(
    st.builds(lambda s: {"S": s}, st.text(max_size=12)),
    st.builds(lambda n: {"N": n}, _number),
    st.builds(lambda b: {"B": b}, _b64),
    st.builds(lambda v: {"BOOL": v}, st.booleans()),
    st.just({"NULL": True}),
    st.builds(lambda xs: {"SS": xs}, st.lists(st.text(max_size=8), min_size=1, max_size=4)),
    st.builds(lambda xs: {"NS": xs}, st.lists(_number, min_size=1, max_size=4)),
    st.builds(lambda xs: {"BS": xs}, st.lists(_b64, min_size=1, max_size=3)),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.builds(lambda xs: {"L": xs}, st.lists(children, max_size=3)),
        st.builds(
            lambda kv: {"M": dict(kv)},
            st.lists(st.tuples(st.text(max_size=6), children), max_size=3),
        ),
    ),
    max_leaves=8,
)


@given(_value)
@settings(max_examples=200, deadline=None)
def test_canonicalize_is_idempotent(av):
    once = canonicalize_value(av)
    twice = canonicalize_value(once)
    assert once == twice


@given(_value)
@settings(max_examples=200, deadline=None)
def test_canonical_json_is_deterministic_and_parseable(av):
    s = canonical_json(av)
    assert json.loads(s) == canonicalize_value(av)
    assert canonical_json(av) == s


@given(_value)
@settings(max_examples=100, deadline=None)
def test_set_order_never_matters(av):
    """Reversing every set's order yields the same canonical form (C9:
    order-insensitive set equality)."""

    def rev(v):
        (tag, val), = v.items()
        if tag in ("SS", "NS", "BS"):
            return {tag: list(reversed(val))}
        if tag == "L":
            return {"L": [rev(x) for x in val]}
        if tag == "M":
            return {"M": {k: rev(x) for k, x in val.items()}}
        return v

    assert canonical_json(av) == canonical_json(rev(av))


@given(st.lists(st.tuples(st.text(min_size=1, max_size=6), _value), max_size=4))
@settings(max_examples=100, deadline=None)
def test_item_key_order_never_matters(pairs):
    item = dict(pairs)
    shuffled = dict(reversed(list(item.items())))
    assert item_to_canonical_json(item) == item_to_canonical_json(shuffled)


@given(_number, st.integers(min_value=0, max_value=4))
@settings(max_examples=200, deadline=None)
def test_number_formatting_never_matters(n, pad):
    """'1.5', '1.50', '1.5000' canonicalize identically (BigDecimal compare,
    RowComparisonFailure.scala:308-314)."""
    padded = n + ("." if "." not in n else "") + "0" * pad if pad else n
    assert canonicalize_value({"N": n}) == canonicalize_value({"N": padded})


# ---------------------------------------------------------------------------
# Savepoint filename encoding (O4): lexical order == chronological order
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**13),
            st.integers(min_value=0, max_value=999_999),
        ),
        min_size=2,
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_savepoint_name_order_matches_numeric_order(pairs):
    from scylla_migrator_spark.savepoints import _decode_name, _encode_name

    names = [_encode_name(m, s) for m, s in pairs]
    assert sorted(names) == [_encode_name(m, s) for m, s in sorted(pairs)]
    for (m, s), n in zip(pairs, names):
        assert _decode_name(n) == (m, s)


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_decode_name_never_raises_on_junk(junk):
    from scylla_migrator_spark.savepoints import _decode_name

    _decode_name(junk)  # must return None or a tuple, never raise


# ---------------------------------------------------------------------------
# WHERE sanitizer (F8): dangerous constructs always rejected, accepted
# strings are returned stripped and unchanged
# ---------------------------------------------------------------------------


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_where_sanitizer_total_and_consistent(s):
    from scylla_migrator_spark.config import ConfigError, validate_where_filter

    try:
        out = validate_where_filter(s)
    except ConfigError:
        return
    assert out == s.strip()
    # anything accepted must be free of the dangerous constructs
    lowered = out.lower()
    for bad in (";", "--", "/*", "\\", "\x00"):
        assert bad not in out
    for kw in ("drop ", "delete ", "insert ", "update ", "grant "):
        assert kw not in lowered


@given(
    st.integers(min_value=1, max_value=4096),
    st.lists(st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1), min_size=1, max_size=50),
)
@settings(max_examples=200, deadline=None)
def test_ring_ranges_partition_every_token(n, tokens):
    """full_ring_ranges(n): any token in (MIN, MAX] is owned by exactly one
    range, for any split count."""
    from scylla_migrator_spark.sources.token_ring import (
        full_ring_ranges,
        range_index_of,
    )

    ranges = full_ring_ranges(n)
    assert len(ranges) == n
    for t in tokens:
        owners = [i for i, (s, e) in enumerate(ranges) if s < t <= e]
        assert owners == [range_index_of(t, ranges)]


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_murmur3_token_total_and_stable(data):
    """murmur3_token is total over arbitrary bytes, in-range, and
    deterministic (the signed-byte tail quirk must not raise on high-bit
    inputs of any length/alignment)."""
    from scylla_migrator_spark.sources.token_ring import (
        MAX_TOKEN,
        MIN_TOKEN,
        murmur3_token,
    )

    t = murmur3_token(data)
    assert MIN_TOKEN < t <= MAX_TOKEN  # reserved minimum never produced
    assert murmur3_token(data) == t


@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(-5, 5)), min_size=1, max_size=5
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=5, deadline=None)
@pytest.mark.slow
def test_upsert_sequence_equals_dict_semantics(spark_prop, batches):
    """Any sequence of partition-scoped upserts equals last-writer-wins dict
    application (the serving-table contract, independent of bucketing)."""
    import tempfile
    import uuid

    from scylla_migrator_spark.streaming.rollup import upsert_parquet

    path = tempfile.mkdtemp(prefix="sgs_prop_upsert_") + f"/t_{uuid.uuid4().hex[:6]}"
    expected: dict[int, int] = {}
    for batch in batches:
        # last occurrence of a key within a batch wins deterministically:
        # dedupe batch-side first (the streaming agg emits one row per key)
        dedup = {k: v for k, v in batch}
        upsert_parquet(
            spark_prop.createDataFrame(
                [(k, v) for k, v in dedup.items()], "k int, v int"
            ),
            path,
            ["k"],
            n_buckets=4,
        )
        expected.update(dedup)
    got = {r["k"]: r["v"] for r in spark_prop.read.parquet(path).collect()}
    assert got == expected


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark


@given(
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=200, deadline=None)
def test_jpeg_header_roundtrip_property(w, h, c):
    from scylla_migrator_spark.analytics.multimodal import (
        decode_jpeg,
        encode_jpeg_header,
    )

    m = decode_jpeg(encode_jpeg_header(w, h, c))
    assert (m["width"], m["height"], m["n_components"]) == (w, h, c)


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=32767),
    st.integers(min_value=1, max_value=32767),
)
@settings(max_examples=200, deadline=None)
def test_mp4_header_roundtrip_property(dur, w, h):
    from scylla_migrator_spark.analytics.multimodal import (
        decode_mp4,
        encode_mp4_header,
    )

    m = decode_mp4(encode_mp4_header(dur, w, h))
    assert (m["duration_ms"], m["width"], m["height"]) == (dur, w, h)


# --- GIF codec round-trip (pure Python, no Spark) --------------------------


@given(
    w=st.integers(min_value=0, max_value=65535),
    h=st.integers(min_value=0, max_value=65535),
    n=st.integers(min_value=0, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_gif_roundtrip_property(w, h, n):
    from scylla_migrator_spark.analytics.multimodal import decode_gif, encode_gif

    m = decode_gif(encode_gif(w, h, n))
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)


# --- BPE encoder / oracle-encoding properties (round 5) --------------------


def _greedy_merge(pieces: list, p1: str, p2: str) -> list:
    """Reference greedy left-to-right non-overlapping merge (the engine's
    merge_pair fold semantics)."""
    out = []
    for s in pieces:
        if out and out[-1] == p1 and s == p2:
            out[-1] = p1 + p2
        else:
            out.append(s)
    return out


_sym = st.text(alphabet="abc", min_size=1, max_size=3)


@given(
    st.text(alphabet="abc", min_size=0, max_size=12),
    st.lists(st.tuples(_sym, _sym), min_size=0, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_segment_word_rank_pointer_equals_sequential_fold(word, rules):
    """tokenizer._segment_word's rank-pointer shortcut must equal applying
    every rule once, in order, with the greedy merge — for arbitrary words
    and rule lists including duplicates and merged-symbol rules."""
    from scylla_migrator_spark.analytics.tokenizer import _segment_word

    expected = list(word)
    for p1, p2 in rules:
        expected = _greedy_merge(expected, p1, p2)

    ranks: dict = {}
    for i, pair in enumerate(rules):
        ranks.setdefault(pair, []).append(i)
    got = _segment_word(word, rules, {k: tuple(v) for k, v in ranks.items()})
    assert got == expected, (word, rules)


@given(
    st.lists(_sym, min_size=0, max_size=10),
    st.tuples(_sym, _sym),
)
@settings(max_examples=300, deadline=None)
def test_bpe_oracle_sentinel_encoding_equals_greedy_merge(pieces, rule):
    """The SQL oracle's merge is replace() over the ␂piece␁-framed string;
    Python str.replace has the same left-to-right non-overlapping scan as
    DuckDB replace, so this fuzzes the encoding against the greedy merge
    for arbitrary piece lists (including merged symbols like 'ab' next to
    'a','b' — the mid-symbol case a trailing-delimiter encoding got
    wrong)."""
    p1, p2 = rule
    enc = "".join(f"\x02{p}\x01" for p in pieces)
    merged_enc = enc.replace(f"\x02{p1}\x01\x02{p2}\x01", f"\x02{p1}{p2}\x01")
    expected = _greedy_merge(pieces, p1, p2)
    assert merged_enc == "".join(f"\x02{p}\x01" for p in expected), (pieces, rule)


# --- curation config decoder fuzz -----------------------------------------

_cfg_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
_cfg_value = st.recursive(
    _cfg_scalar,
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(st.text(max_size=8), kids, max_size=4),
    ),
    max_leaves=12,
)
_known_ops = st.sampled_from([
    "length_filter", "quality_filter", "lang_filter", "pii_redact",
    "repetition_filter", "intra_doc_repetition_filter", "exact_dedup",
    "near_dedup", "readability_filter", "diversity_filter", "gopher_filter",
])
_stage = st.one_of(
    _cfg_value,
    st.fixed_dictionaries(
        {"op": _known_ops},
        optional={
            "minTokens": _cfg_scalar, "maxTokens": _cfg_scalar,
            "minAlphaRatio": _cfg_scalar, "allow": _cfg_value,
            "maxTopBigramFrac": _cfg_scalar, "maxDupFrac": _cfg_scalar,
            "windowTokens": _cfg_scalar, "numHashes": _cfg_scalar,
            "bands": _cfg_scalar, "withinWatermark": _cfg_scalar,
            "minFlesch": _cfg_scalar, "maxFlesch": _cfg_scalar,
            "minTTR": _cfg_scalar, "bogus": _cfg_scalar,
        },
    ),
)
_raw_cfg = st.one_of(
    _cfg_value,
    st.fixed_dictionaries(
        {},
        optional={
            "source": st.one_of(
                _cfg_value,
                st.just({"type": "parquet", "path": "/tmp/x"}),
            ),
            "stages": st.one_of(_cfg_value, st.lists(_stage, max_size=4)),
            "target": _cfg_value,
            "idColumn": _cfg_scalar,
            "textColumn": _cfg_scalar,
        },
    ),
)


@given(_raw_cfg)
@settings(max_examples=300, deadline=None)
def test_curation_config_decoder_total(raw):
    """The decoder is TOTAL over arbitrary JSON-shaped input: every bad
    config raises ConfigError (the decode-time contract) — never
    KeyError/TypeError/AttributeError — and every accepted config has
    normalized stages with known ops."""
    from scylla_migrator_spark.config import ConfigError
    from scylla_migrator_spark.plans.curate import _OPS, CurationConfig

    try:
        cfg = CurationConfig.from_dict(raw)
    except ConfigError:
        return
    assert cfg.source_path
    for stg in cfg.stages:
        assert stg["op"] in _OPS


_exp_names = st.sampled_from([
    "not_null", "unique", "accepted_values", "range", "row_count", "reference",
])
_exp_stage = st.one_of(
    _cfg_value,
    st.fixed_dictionaries(
        {"expect": _exp_names},
        optional={
            "column": _cfg_scalar, "columns": _cfg_value,
            "values": _cfg_value, "minRatio": _cfg_scalar,
            "min": _cfg_scalar, "max": _cfg_scalar,
            "refPath": _cfg_scalar, "refColumn": _cfg_scalar,
            "maxOrphanRatio": _cfg_scalar, "bogus": _cfg_scalar,
        },
    ),
)
_raw_exp_cfg = st.one_of(
    _cfg_value,
    st.fixed_dictionaries(
        {},
        optional={
            "source": st.one_of(
                _cfg_value, st.just({"type": "parquet", "path": "/tmp/x"})
            ),
            "expectations": st.one_of(_cfg_value, st.lists(_exp_stage, max_size=4)),
            "extraTop": _cfg_scalar,
        },
    ),
)


@given(_raw_exp_cfg)
@settings(max_examples=300, deadline=None)
def test_expectations_config_decoder_total(raw):
    """Same totality contract as the curation decoder: arbitrary
    JSON-shaped input either decodes to normalized known expectations or
    raises ConfigError — never a KeyError/TypeError escape."""
    from scylla_migrator_spark.config import ConfigError
    from scylla_migrator_spark.plans.expect import _EXPECTS, ExpectationsConfig

    try:
        cfg = ExpectationsConfig.from_dict(raw)
    except ConfigError:
        return
    assert cfg.source_path
    for e in cfg.expectations:
        assert e["expect"] in _EXPECTS
