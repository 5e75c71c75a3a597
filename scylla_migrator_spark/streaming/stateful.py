"""Custom stateful streaming operators (our T6 extension — the reference's
replication is stateless per record, DynamoStreamReplication.scala:42-114).

``applyInPandasWithState`` gives per-key state that survives across
micro-batches — the building block the reference lacks for exactly-once-style
dedup on top of its at-least-once delivery (T4). State here is per-key and
partitioned by the grouping key, so it scales horizontally: each executor
holds only its keys' state, checkpointed with the query.

``stateful_distinct_counts``: cross-batch deduplicating counter. For every
(user) key it remembers the set of event ids already seen and emits, per
micro-batch, the number of NEW events. Re-delivered events (any batch) count
zero. Summing the per-batch emissions reproduces exact per-user distinct
counts — verified against the DuckDB oracle in plans/queries.py.

State is keyed by a HASH BUCKET of the user key, not the raw key: Arrow
ships one batch per group per trigger, so per-user grouping pays one Python
round trip per user (tens of thousands per batch), while per-bucket grouping
pays one per bucket and dedups all of the bucket's users vectorized inside
(6x faster at sf0.1). Buckets spread over executors exactly like keys do, so
horizontal scaling is unchanged — pick buckets >= a few x total cores.

At 100 TB scale notes: the seen-set state must be bounded — production uses
watermark-scoped state (drop ids older than the watermark) or a Bloom filter
per key; the fixture keeps exact sets, the plumbing is identical.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# which running-totals API actually executed last ("transformWithStateInPandas"
# or "applyInPandasWithState"); None until running_user_totals is called
LAST_TOTALS_PATH: str | None = None

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen_keys", T.ArrayType(T.LongType())),
        T.StructField("seen_events", T.ArrayType(T.LongType())),
    ]
)


def _dedup_count_fn(key_col: str, event_col: str):
    """Build the per-bucket dedup function; internal frames use the fixed
    names ``__key``/``__event``, the output carries the caller's key name."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        # vectorized set arithmetic over the whole bucket — a per-row (or
        # per-key-group) Python loop here costs ~6x the whole query at sf0.1
        if state.exists:
            su, se = state.get
            seen_k = np.asarray(su, dtype="int64")
            seen_e = np.asarray(se, dtype="int64")
        else:
            seen_k = seen_e = np.array([], dtype="int64")
        frames = list(pdfs)
        if frames:
            bk = np.concatenate([f["__key"].to_numpy(dtype="int64") for f in frames])
            be = np.concatenate([f["__event"].to_numpy(dtype="int64") for f in frames])
        else:
            bk = be = np.array([], dtype="int64")
        # hash-dedup (key, event) pairs: state rows are already unique and
        # come first, so every kept row past len(seen) is genuinely new
        all_pairs = pd.DataFrame(
            {"k": np.concatenate([seen_k, bk]), "e": np.concatenate([seen_e, be])}
        )
        kept = all_pairs.drop_duplicates()
        new = kept.iloc[len(seen_k):]
        state.update((kept["k"].tolist(), kept["e"].tolist()))
        per_key = new.groupby("k", sort=False).size()
        yield pd.DataFrame(
            {
                key_col: per_key.index.to_numpy(dtype="int64"),
                "new_events": per_key.to_numpy(dtype="int64"),
            }
        )

    return fn


def stateful_distinct_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    event_col: str = "event_id",
    buckets: int = 64,
) -> DataFrame:
    """Bucketed cross-batch dedup counter (see module docstring). The
    emitted rows are per KEY (not per bucket); summing ``new_events`` per
    key across batches gives exact distinct counts."""
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [T.StructField(key_col, T.LongType()), T.StructField("new_events", T.LongType())]
    )
    bucketed = stream.select(
        F.col(key_col).alias("__key"),
        F.col(event_col).alias("__event"),
        F.pmod(F.hash(key_col), F.lit(buckets)).alias("__bucket"),
    )
    return bucketed.groupBy("__bucket").applyInPandasWithState(
        _dedup_count_fn(key_col, event_col),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Cross-batch sessionization with mergeable interval state
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("upd", T.LongType()),  # per-key update counter; max = final
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("upd", T.LongType()),
    ]
)


def _merge_sessions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState, gap_ms: int
) -> Iterator[pd.DataFrame]:
    """Merge this batch's event times into the per-key session intervals.

    Sessions are connected components of event times under `distance <= gap`,
    which is independent of arrival order and batch split — so the final
    state equals the batch `session_window` answer no matter how the stream
    was chopped up. State is O(sessions), not O(events): each interval is
    (start, end, count); a new point either extends an interval, bridges two,
    or opens its own."""
    if state.exists:
        starts, ends, counts, upd = state.get
        intervals = [[s, e, c] for s, e, c in zip(starts, ends, counts)]
    else:
        intervals, upd = [], 0
    pts = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_ms"].tolist()
    )
    # sweep-merge: existing intervals + new points (as degenerate intervals),
    # ordered by start; adjacent pieces closer than gap fuse
    pieces = sorted(intervals + [[t, t, 1] for t in pts])
    merged: list[list[int]] = []
    for s, e, c in pieces:
        if merged and s - merged[-1][1] <= gap_ms:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += c
        else:
            merged.append([s, e, c])
    upd += 1
    state.update(
        ([m[0] for m in merged], [m[1] for m in merged], [m[2] for m in merged], upd)
    )
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "upd": [upd],
            "n_sessions": [len(merged)],
            "n_events": [sum(m[2] for m in merged)],
        }
    )


def stateful_sessionize(
    stream: DataFrame, key_col: str = "user_id", ts_ms_col: str = "ts_ms", gap_ms: int = 30 * 60_000
) -> DataFrame:
    """Cross-batch sessionization (the stateful twin of ``session_window``).

    Emits (key, upd, n_sessions, n_events) per key per batch; the row with
    the max ``upd`` per key is the final answer."""

    def fn(key, pdfs, state):
        return _merge_sessions(key, pdfs, state, gap_ms)

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 stateful API): running per-key totals
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import StatefulProcessor


def _totals_schema(key_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("upd", T.LongType()),  # per-key batch counter; max = final
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_micros", T.LongType()),
        ]
    )


def _batch_sum(pdf: pd.DataFrame, value_col: str) -> int:
    """NULL-tolerant exact integer sum: Arrow surfaces a nullable long
    column as float64-with-NaN in pandas; dropna + int64 cast keeps the
    accumulation exact (and matches SQL sum semantics — NULLs skipped,
    count(*) still counts the row)."""
    return int(pdf[value_col].dropna().astype("int64").sum())


class RunningTotalsProcessor(StatefulProcessor):
    """``StatefulProcessor`` keeping per-key running (count, sum) across
    micro-batches via ``ValueState`` — the modern typed-state replacement
    for ``applyInPandasWithState`` (timers, TTL and List/Map state live on
    the same handle; RocksDB-backed, checkpointed with the query).

    Values are pre-quantized to integer micro-units upstream so the
    cross-batch accumulation is associative-exact (a float running sum
    would depend on batch split). Emits the running totals with a per-key
    update counter; the row with max ``upd`` per key is the final answer.
    At 100 TB: state is three longs per key, partitioned by the grouping
    key across executors; the state store scales with distinct keys, not
    events."""

    def __init__(self, key_col: str = "user_id", value_col: str = "value_micros"):
        self._key_col = key_col
        self._value_col = value_col

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "upd BIGINT, n BIGINT, s BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        prev = self._totals.get()
        upd, n, s = prev if prev is not None else (0, 0, 0)
        for pdf in rows:
            n += int(len(pdf))
            s += _batch_sum(pdf, self._value_col)
        upd += 1
        self._totals.update((upd, n, s))
        yield pd.DataFrame(
            {self._key_col: [key[0]], "upd": [upd], "n_events": [n], "sum_micros": [s]}
        )

    def close(self) -> None:
        pass


def _totals_fallback_fn(key_col: str, value_col: str):
    """applyInPandasWithState twin of RunningTotalsProcessor — identical
    state transition and emissions, for environments without the protobuf
    dependency the transformWithState state-server protocol needs."""

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState):
        upd, n, s = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += _batch_sum(pdf, value_col)
        upd += 1
        state.update((upd, n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "upd": [upd], "n_events": [n], "sum_micros": [s]}
        )

    return fn


def has_transform_with_state_runtime() -> bool:
    """transformWithStateInPandas drives typed state over a protobuf
    state-server protocol; without the protobuf package the Python driver
    worker crashes at init, so fall back when it is absent."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "value_micros"
) -> DataFrame:
    """Cross-batch running totals per key over an integer ``value_col``.

    Prefers the Spark 4 ``transformWithStateInPandas`` typed-state API
    (RunningTotalsProcessor); falls back to an identical-semantics
    ``applyInPandasWithState`` plan when the protobuf runtime it requires
    is unavailable. Both emit (key, upd, n_events, sum_micros) per batch;
    max-``upd`` row per key is the final state.

    The chosen path is recorded in the module-level ``LAST_TOTALS_PATH``
    and printed to stderr, so test/bench output states explicitly which
    API actually executed (in environments without protobuf, the headline
    TWS path never runs — don't let a green run imply it was exercised)."""
    global LAST_TOTALS_PATH
    if has_transform_with_state_runtime():
        LAST_TOTALS_PATH = "transformWithStateInPandas"
        print(f"STATEFUL_PATH | {LAST_TOTALS_PATH}", file=sys.stderr)
        return stream.groupBy(key_col).transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(key_col, value_col),
            outputStructType=_totals_schema(key_col),
            outputMode="Update",
            timeMode="None",
        )
    LAST_TOTALS_PATH = "applyInPandasWithState"
    print(f"STATEFUL_PATH | {LAST_TOTALS_PATH} (protobuf absent)", file=sys.stderr)
    return stream.groupBy(key_col).applyInPandasWithState(
        _totals_fallback_fn(key_col, value_col),
        outputStructType=_totals_schema(key_col),
        stateStructType="upd BIGINT, n BIGINT, s BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
