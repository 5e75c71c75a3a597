"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

At 100 TB a single hot key (one customer with 10% of all events, one
null-heavy join column) serializes a whole stage onto one task. AQE's skew
handling splits skewed *shuffle partitions* for joins, but a skewed groupBy
key still funnels into one reducer. These helpers implement the classic
manual remedies as plan rewrites with identical results:

* ``salted_aggregate`` — phase 1 aggregates on (key, salt) spreading the hot
  key over N buckets; phase 2 combines the partials. Works for any
  decomposable aggregate (sum/count/min/max; avg = sum+count).
* ``salted_broadcast_join`` — replicate the broadcast side per salt value so
  the probe side can distribute a hot key over N tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, object]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs``: output name -> (phase-1 aggregate column, phase-2 combiner fn);
    e.g. ``{"cnt": (F.count("*"), F.sum), "mx": (F.max("x"), F.max)}``. The
    phase-2 fn must be the aggregate's combiner (sum for count/sum, max for
    max, ...)."""
    salted = df.withColumn(SALT_COL, F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[col.alias(f"__p1_{name}") for name, (col, _) in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[comb(F.col(f"__p1_{name}")).alias(name) for name, (_, comb) in aggs.items()]
    )
    return phase2


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side against a small side by replicating the small
    side ``salt_buckets`` times; each big-side row picks one salt, so a hot
    join key spreads over ``salt_buckets`` tasks. Result identical to the
    direct join."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    small_rep = small.withColumn(SALT_COL, salts)
    big_salted = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int")
    )
    out = big_salted.join(F.broadcast(small_rep), on=[*on, SALT_COL], how=how)
    return out.drop(SALT_COL)
