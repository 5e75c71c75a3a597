"""Dump .explain('formatted') for registry queries to files.

Usage: python tools/dump_plans.py <repo_root> <sf_dir> <out_dir> <suffix> name...

Runs each registry query's builder and writes the formatted physical plan
of the returned DataFrame to <out_dir>/<name>_<suffix>.txt. Queries whose
builders materialize state (the maintenance family) still produce a plan
for the DataFrame they return — the readout over the maintained state.
"""
import sys


def main() -> int:
    repo, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo)
    from scylla_migrator_spark.session import get_spark
    from scylla_migrator_spark.plans import queries as Q

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"ERROR building/explaining {name}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
