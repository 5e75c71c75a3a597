"""Streaming observability: ``df.observe`` metrics + a
``StreamingQueryListener`` — the Structured Streaming half of the
reference's accumulator surface (A3: IntSet/StringSet/Long accumulators
populated per task and merged on the driver,
m/alternator/IntSetAccumulator.scala:12-36, m/writers/Scylla.scala:253-255).

Batch plans already use ``df.observe`` (operators/filters.py null-PK
counts); streams report the same observed expressions per micro-batch
through ``QueryProgressEvent.observedMetrics``, which a listener collects
on the driver — no accumulator classes, no race-prone merge logic, and the
numbers arrive batch-scoped (the reference's accumulators only ever grow,
so per-interval rates need driver-side deltas; observed metrics are
per-batch by construction).

Scale notes: observed expressions ride the existing aggregation physical
plan (no extra pass over the data); the listener runs on the driver's
listener bus — keep the handler O(1) per event and hand heavy processing
off the bus thread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects every named observation from each micro-batch's progress
    event into ``self.metrics`` as {observation_name: [per-batch row
    dicts]}. Attach with ``spark.streams.addListener`` (and remove after —
    listeners are session-global)."""

    def __init__(self) -> None:
        self.metrics: dict[str, list[dict]] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802 - Spark API names
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        observed = event.progress.observedMetrics or {}
        for name, row in observed.items():
            self.metrics.setdefault(name, []).append(row.asDict())

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def observe_stream(stream: DataFrame, name: str, **exprs: Column) -> DataFrame:
    """Attach named observed metrics to a streaming DataFrame; each
    micro-batch reports one row of the aggregate expressions, delivered to
    any registered listener's ``onQueryProgress``."""
    aliased = [c.alias(a) for a, c in exprs.items()]
    return stream.observe(name, *aliased)
