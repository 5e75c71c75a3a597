"""Data-expectations module (plans/expect.py): one-pass standalone table
validation — decode-time rigor, exact-ratio verdicts, per-reference orphan
checks, CLI exit semantics."""

from __future__ import annotations

import json

import pytest

from scylla_migrator_spark.config import ConfigError
from scylla_migrator_spark.plans.expect import ExpectationsConfig, run_expectations


@pytest.fixture()
def table(spark, tmp_path):
    rows = [
        (1, 100, "O", 10.0),
        (2, 100, "F", 250.5),
        (3, 200, "O", 0.0),
        (4, None, "P", -5.0),   # null FK, negative price
        (5, 999, "X", 42.0),    # orphan FK, bad status
        (5, 200, "O", 1.0),     # duplicate key 5
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
    )
    path = str(tmp_path / "orders")
    df.write.parquet(path)
    parent = spark.createDataFrame([(100,), (200,)], "c_custkey long")
    ppath = str(tmp_path / "customer")
    parent.write.parquet(ppath)
    return path, ppath


def test_expectations_report(spark, table):
    src, ref = table
    cfg = ExpectationsConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src},
            "expectations": [
                {"expect": "row_count", "min": 5, "max": 10},
                {"expect": "not_null", "column": "o_custkey", "minRatio": 0.8},
                {"expect": "not_null", "column": "o_custkey"},  # strict: fails
                {"expect": "unique", "columns": ["o_orderkey"]},  # dup 5: fails
                {"expect": "accepted_values", "column": "o_orderstatus",
                 "values": ["O", "F", "P"]},  # X: fails
                {"expect": "accepted_values", "column": "o_orderstatus",
                 "values": ["O", "F", "P"], "minRatio": 0.8},  # 5/6: passes
                {"expect": "range", "column": "o_totalprice", "min": 0},  # -5: fails
                {"expect": "range", "column": "o_totalprice", "min": -10, "max": 1000},
                {"expect": "reference", "column": "o_custkey",
                 "refPath": ref, "refColumn": "c_custkey"},  # orphan 999: fails
                {"expect": "reference", "column": "o_custkey",
                 "refPath": ref, "refColumn": "c_custkey",
                 "maxOrphanRatio": 0.25},  # 1/5 orphans: passes
            ],
        }
    )
    report = run_expectations(spark, cfg)
    verdicts = [r["passed"] for r in report["results"]]
    assert verdicts == [True, True, False, False, False, True, False, True, False, True]
    assert report["passed"] is False
    by_kind = report["results"]
    assert by_kind[1] == {"expect": "not_null", "column": "o_custkey",
                          "total": 6, "passing": 5, "passed": True}
    assert by_kind[3]["distinct"] == 5 and by_kind[3]["total"] == 6
    assert by_kind[8]["orphans"] == 1 and by_kind[8]["total"] == 5  # nulls excluded


def test_expectations_all_pass_and_vacuous(spark, tmp_path):
    df = spark.createDataFrame([(1, None)], "id long, v double")
    src = str(tmp_path / "t")
    df.write.parquet(src)
    cfg = ExpectationsConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src},
            "expectations": [
                # v is entirely null: range population is vacuous -> passes
                {"expect": "range", "column": "v", "min": 0},
                {"expect": "unique", "columns": ["id"]},
            ],
        }
    )
    report = run_expectations(spark, cfg)
    assert report["passed"] is True


@pytest.mark.parametrize(
    "exp, msg",
    [
        ({"expect": "nope"}, "unknown expect"),
        ({"expect": "not_null"}, "column"),
        ({"expect": "not_null", "column": "c", "minRatio": 2}, "minRatio"),
        ({"expect": "unique", "columns": []}, "columns"),
        ({"expect": "accepted_values", "column": "c", "values": [{"m": 1}]}, "scalars"),
        ({"expect": "range", "column": "c"}, "min and/or max"),
        ({"expect": "range", "column": "c", "min": 5, "max": 1}, "never pass"),
        ({"expect": "row_count"}, "min and/or max"),
        ({"expect": "reference", "column": "c"}, "refPath"),
        ({"expect": "not_null", "column": "c", "bogus": 1}, "unexpected"),
    ],
)
def test_expectations_decode_errors(exp, msg):
    with pytest.raises(ConfigError, match=msg):
        ExpectationsConfig.from_dict(
            {"source": {"type": "parquet", "path": "/x"}, "expectations": [exp]}
        )


def test_expectations_unknown_column_fails_fast(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long")
    src = str(tmp_path / "t")
    df.write.parquet(src)
    cfg = ExpectationsConfig.from_dict(
        {
            "source": {"type": "parquet", "path": src},
            "expectations": [{"expect": "not_null", "column": "ghost"}],
        }
    )
    with pytest.raises(ConfigError, match="ghost"):
        run_expectations(spark, cfg)


@pytest.mark.slow
def test_expect_cli_exit_codes(spark, table, tmp_path):
    """expect subcommand in a subprocess: exit 1 on failed expectations
    with the JSON report on stdout; exit 0 when all pass."""
    import os
    import subprocess
    import sys

    import yaml

    src, ref = table
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo, "SPARK_GRAFT_CPUS": "8"}

    def run(expectations):
        cfg_path = tmp_path / "exp.yaml"
        cfg_path.write_text(
            yaml.safe_dump(
                {"source": {"type": "parquet", "path": src},
                 "expectations": expectations}
            )
        )
        return subprocess.run(
            [sys.executable, "-m", "scylla_migrator_spark", "expect", str(cfg_path)],
            capture_output=True, text=True, env=env, timeout=300,
        )

    ok = run([{"expect": "row_count", "min": 1}])
    assert ok.returncode == 0, ok.stderr[-2000:]
    assert json.loads(ok.stdout.strip().splitlines()[-1])["passed"] is True

    bad = run([{"expect": "unique", "columns": ["o_orderkey"]}])
    assert bad.returncode == 1, bad.stderr[-2000:]
    report = json.loads(bad.stdout.strip().splitlines()[-1])
    assert report["passed"] is False


def test_expectations_yaml_example_runs(spark):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = ExpectationsConfig.load(os.path.join(repo, "expectations.yaml.example"))
    report = run_expectations(spark, cfg)
    assert report["passed"] is True  # the fixture satisfies its own contract


def _run_one(spark, src, stage):
    cfg = ExpectationsConfig.from_dict(
        {"source": {"type": "parquet", "path": src}, "expectations": [stage]}
    )
    return run_expectations(spark, cfg)


def test_expression_expectation_pass_fail(spark, table):
    src, _ = table
    # 5 of 6 rows have o_totalprice >= 0
    rep = _run_one(
        spark, src,
        {"expect": "expression", "expression": "o_totalprice >= 0",
         "minRatio": 0.8},
    )
    assert rep["passed"] and rep["results"][0]["passing"] == 5
    rep = _run_one(
        spark, src,
        {"expect": "expression", "expression": "o_totalprice >= 0"},
    )
    assert not rep["passed"]  # default minRatio 1.0


def test_expression_null_counts_as_not_passing(spark, table):
    src, _ = table
    # o_custkey > 0 is NULL for the null-FK row: 5 TRUE, 1 NULL -> 5/6
    rep = _run_one(
        spark, src, {"expect": "expression", "expression": "o_custkey > 0"}
    )
    r = rep["results"][0]
    assert r["passing"] == 5 and r["total"] == 6 and not r["passed"]


def test_expression_compound_predicate(spark, table):
    src, _ = table
    rep = _run_one(
        spark, src,
        {"expect": "expression",
         "expression": "o_totalprice >= 0 AND o_orderstatus IN ('O','F','P')",
         "minRatio": 0.6},
    )
    assert rep["passed"] and rep["results"][0]["passing"] == 4


def test_expression_injection_rejected_at_decode(table):
    for bad in [
        "1=1; DROP TABLE x",
        "1=1 -- comment",
        "a\\'b",
        "x' = y",
        # Spark-specific escape hatches past the MySQL-shaped sanitizer
        "reflect('java.lang.System', 'getenv', 'PATH') is not null",
        "java_method('java.lang.Runtime', 'getRuntime') is not null",
        "(select count(*) from parquet.`/etc/hostname`) >= 0",
        "a > rand()",
        "`a` > 0",
    ]:
        with pytest.raises(ConfigError):
            ExpectationsConfig.from_dict(
                {"source": {"type": "parquet", "path": "/tmp/x"},
                 "expectations": [{"expect": "expression", "expression": bad}]}
            )


def test_expression_unresolvable_column_is_config_error(spark, table):
    src, _ = table
    with pytest.raises(ConfigError, match="does not resolve"):
        _run_one(
            spark, src,
            {"expect": "expression", "expression": "no_such_column > 0"},
        )


def test_empty_table_ratio_checks_vacuously_pass(spark, tmp_path):
    df = spark.createDataFrame([], "a long, b string")
    path = str(tmp_path / "empty_tbl")
    df.write.parquet(path)
    cfg = ExpectationsConfig.from_dict(
        {
            "source": {"type": "parquet", "path": path},
            "expectations": [
                {"expect": "not_null", "column": "a"},
                {"expect": "expression", "expression": "a > 0"},
                {"expect": "unique", "columns": ["a"]},
            ],
        }
    )
    rep = run_expectations(spark, cfg)
    assert rep["passed"]  # 0-row populations are vacuous, not a crash
