#!/usr/bin/env python
"""Round-12 long-tail fixed-cost profiler (guide §1: measure first).

For a sample of long-tail registry scenarios, split one bench-style timed
call into (a) DataFrame CONSTRUCTION (python + py4j + reader/schema work)
and (b) the count() ACTION (analysis + optimization + codegen + jobs), and
measure the raw cost of the repeated `spark.read.parquet` every `_t()`
call pays today. Run AFTER any concurrent Spark work has finished.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scylla_migrator_spark.plans import queries as Q  # noqa: E402
from scylla_migrator_spark.session import get_spark  # noqa: E402

SAMPLE = [
    # plain migration/validation/agg rows (the §2.x core surface)
    "migrate_rename_filter",
    "null_pk_drop",
    "validation_diff_counts",
    "agg_pricing_summary",
    "distinct_supp_per_flag",
    "semi_join_probe",
    "except_setop",
    "cdc_last_state",
    "strip_trailing_zeros",
    "ddb_number_canon",
    # window/rollup/join rows
    "window_top_order_per_cust",
    "rollup_sales_region_nation",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "asof_click_purchase",
    # text/statistics long tail
    "lexical_diversity",
    "flesch_readability",
    "zipf_law_fit",
    "benford_first_digit",
    "cohort_retention",
    "weekly_event_drift",
    "zscore_value_outliers",
    # ANN / embedding long tail
    "ann_cosine_topk",
    "hashed_ann_topk",
    "lsh_recall_at_k",
    "embedding_dim_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-longtail")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm as bench.py
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # raw reader cost: what every _t() call pays
    for label, fn in [
        ("read.parquet(orders)", lambda: spark.read.parquet(f"{sf_dir}/orders.parquet")),
        ("read.schema(s).parquet(orders)", None),  # filled below
        ("conf.set x2", lambda: (spark.conf.set("spark.sql.session.timeZone", "UTC"),
                                 spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))),
    ]:
        if fn is None:
            s = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
            fn = lambda: spark.read.schema(s).parquet(f"{sf_dir}/orders.parquet")  # noqa: E731
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(20):
            fn()
        dt = (time.perf_counter() - t0) / 20
        print(f"RAW | {label}: {dt*1000:.1f} ms/call")

    print(f"{'scenario':38s} {'build1':>7s} {'count1':>7s} {'build2':>7s} {'count2':>7s}")
    tot = {"b1": 0.0, "c1": 0.0, "b2": 0.0, "c2": 0.0}
    for name in SAMPLE:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        b1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.count()
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        df2 = fn(spark, sf_dir)
        b2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        df2.count()
        c2 = time.perf_counter() - t0
        tot["b1"] += b1
        tot["c1"] += c1
        tot["b2"] += b2
        tot["c2"] += c2
        print(f"{name:38s} {b1:7.3f} {c1:7.3f} {b2:7.3f} {c2:7.3f}")
    n = len(SAMPLE)
    print(
        f"{'MEAN':38s} {tot['b1']/n:7.3f} {tot['c1']/n:7.3f} "
        f"{tot['b2']/n:7.3f} {tot['c2']/n:7.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
