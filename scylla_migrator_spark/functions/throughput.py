"""Throughput governance: token-bucket rate limiting for RCU/WCU-bounded
sources and sinks.

Reference parity (Z8): read/write capacity derived from the table description
or configured explicitly, scaled by throughputReadPercent/WritePercent
(DynamoUtils.scala:556-582, readers/DynamoDB.scala:164-177,
writers/DynamoDB.scala:100-114); the per-partition rate is the table rate
divided by the number of concurrent partitions (maxRatePerPartition style).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class TokenBucket:
    """Thread-local token bucket: ``acquire(n)`` blocks until n tokens are
    available. Used INSIDE a partition function — one bucket per task, rate =
    table_rate / partitions, so cluster-wide consumption approximates the
    table budget without any cross-executor coordination."""

    rate: float  # tokens/sec
    capacity: float | None = None
    clock: object = time  # injectable for tests
    _tokens: float = field(init=False, default=0.0)
    _last: float = field(init=False, default=0.0)

    def __post_init__(self) -> None:
        if self.rate <= 0:
            raise ValueError("rate must be > 0")
        if self.capacity is None:
            self.capacity = self.rate  # 1-second burst
        self._tokens = self.capacity
        self._last = self.clock.monotonic()

    def _refill(self) -> None:
        now = self.clock.monotonic()
        self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
        self._last = now

    def try_acquire(self, n: float = 1.0) -> bool:
        self._refill()
        if self._tokens >= n:
            self._tokens -= n
            return True
        return False

    def acquire(self, n: float = 1.0) -> float:
        """Block until n tokens are granted; returns seconds slept."""
        slept = 0.0
        while True:
            self._refill()
            if self._tokens >= n:
                self._tokens -= n
                return slept
            need = (n - self._tokens) / self.rate
            self.clock.sleep(need)
            slept += need


def effective_rate(
    provisioned: int | None, percent: float, configured: int | None = None, default: int = 40_000
) -> float:
    """Table throughput resolution (DynamoUtils.scala:556-582): explicit
    config wins; else provisioned capacity; else on-demand default — scaled
    by the configured percentage."""
    base = configured if configured is not None else (provisioned or default)
    if not 0 < percent <= 1:
        raise ValueError("throughput percent must be in (0, 1]")
    return base * percent


def per_partition_rate(table_rate: float, num_partitions: int) -> float:
    return max(table_rate / max(num_partitions, 1), 1e-9)
