"""Simulate the driver's correctness gate with a VANILLA SparkSession.

The round-1 failure mode was queries silently depending on confs set by our
own session builder (nanosAsLong, UTC). This script builds the plainest
possible session -- mirroring the driver harness -- and runs every
``queries()`` entry against its ``oracle_sql()`` on DuckDB at sf0.01,
comparing row count, column names, and order-insensitive canonical values.

Usage: python tools/driver_sim.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    # Faithful to the driver's gate: sort columns by name, then sort ROWS
    # with pandas sort_values — which (intentionally, matching the driver)
    # raises TypeError on container cells. Round-5 lesson: an array-valued
    # output column passed a lenient canon here but ERRORed in the driver;
    # the sim must reproduce the driver's comparator, not improve on it.
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append("NaN" if math.isnan(v) else f"{v:.9g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Vanilla session: no legacy confs, no timezone pin -- like the driver's.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("driver-sim")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                results[name] = {"status": "rows_only", "rows": len(sdf)}
            else:
                ddf = con.sql(oracles[name]).df()
                cols_ok = sorted(sdf.columns) == sorted(ddf.columns)
                rows_ok = len(sdf) == len(ddf)
                vals_ok = False
                detail = None
                if cols_ok and rows_ok:
                    s, d = canon(sdf), canon(ddf)
                    bad = [(a, b) for a, b in zip(s, d) if a != b]
                    vals_ok = not bad
                    if bad:
                        detail = f"{len(bad)} row mismatches; first: {bad[0]}"
                elif not cols_ok:
                    detail = f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
                else:
                    detail = f"rows {len(sdf)} vs {len(ddf)}"
                ok = cols_ok and rows_ok and vals_ok
                results[name] = {
                    "status": "pass" if ok else "FAIL",
                    "rows": len(sdf),
                    "detail": detail,
                }
        except Exception:
            results[name] = {"status": "ERROR", "detail": traceback.format_exc()[-1500:]}
        results[name]["sec"] = round(time.time() - t0, 2)
        print(f"{results[name]['status']:9s} {name} ({results[name]['sec']}s)", flush=True)

    fails = {k: v for k, v in results.items() if v["status"] in ("FAIL", "ERROR")}
    print(f"\n{len(results) - len(fails)}/{len(results)} pass")
    for k, v in fails.items():
        print(f"\n=== {k}: {v['status']}\n{v.get('detail', '')[:2000]}")
    with open("/tmp/driver_sim_results.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
