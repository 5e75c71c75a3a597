"""Config-driven data expectations: standalone table validation.

The validator (`plans/validate.py`) diffs a MIGRATED table against its
source — it needs both sides. This module is the other half a migration
engine needs: assert properties of ONE table (the freshly-landed target,
an incoming vendor drop, a curated corpus) against a declared contract —
the dbt-tests / Great-Expectations shape, engine-side:

    expectations:
      - expect: row_count
        min: 1000
      - expect: not_null
        column: o_custkey
        minRatio: 0.999
      - expect: unique
        columns: [o_orderkey]
      - expect: accepted_values
        column: o_orderstatus
        values: [F, O, P]
      - expect: range
        column: o_totalprice
        min: 0
      - expect: reference
        column: o_custkey
        refPath: /data/customer
        refColumn: c_custkey

Scale design:
* every ROW-LEVEL expectation (not_null, accepted_values, range,
  row_count) compiles to sum/count expressions in ONE aggregate over one
  scan — map-side combined, no shuffle carries rows; auditing ten
  expectations costs the same single pass as one;
* ``unique`` rides the same aggregate as a count_distinct (the one
  shuffle-bearing metric — exact by contract, this is a validation gate);
* ``reference`` checks are per-reference left joins that project ONLY the
  two key columns (parent build side never carries payload; AQE
  broadcasts small parents) and reduce to a 1-row orphan count each;
* unknown expectation names / bad params fail at DECODE time
  (ConfigError), before any cluster time — the MigratorConfig posture.

Ratios compare in exact integer arithmetic (``passing * 10**9 >=
ceil(minRatio * 10**9) * total``) so a float boundary can never flip a
verdict between runs or engines.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_migrator_spark.config import ConfigError

_RATIO_SCALE = 10**9


def _require_number(params: dict, key: str, lo: float, hi: float) -> float:
    v = params.get(key)
    if not isinstance(v, (int, float)) or isinstance(v, bool) or not lo <= v <= hi:
        raise ConfigError(
            f"expectation param {key!r} must be a number in [{lo}, {hi}], got {v!r}"
        )
    return float(v)


def _require_str(params: dict, key: str) -> str:
    v = params.get(key)
    if not isinstance(v, str) or not v.strip():
        raise ConfigError(f"expectation param {key!r} must be a non-empty string")
    return v


def _reject_extras(params: dict, known: set[str]) -> None:
    extra = set(params) - known - {"expect"}
    if extra:
        raise ConfigError(
            f"unexpected params {sorted(extra)} for {params['expect']}"
        )


def _v_not_null(p: dict) -> dict:
    _reject_extras(p, {"column", "minRatio"})
    out = {"column": _require_str(p, "column"), "min_ratio": 1.0}
    if "minRatio" in p:
        out["min_ratio"] = _require_number(p, "minRatio", 0.0, 1.0)
    return out


def _v_unique(p: dict) -> dict:
    _reject_extras(p, {"columns"})
    cols = p.get("columns")
    if (
        not isinstance(cols, list)
        or not cols
        or not all(isinstance(c, str) and c.strip() for c in cols)
    ):
        raise ConfigError("unique needs columns: [<col>, ...]")
    return {"columns": cols}


def _v_accepted_values(p: dict) -> dict:
    _reject_extras(p, {"column", "values", "minRatio"})
    vals = p.get("values")
    if not isinstance(vals, list) or not vals:
        raise ConfigError("accepted_values needs values: [<v>, ...]")
    if not all(isinstance(v, (str, int, float, bool)) for v in vals):
        raise ConfigError("accepted_values values must be scalars")
    out = {
        "column": _require_str(p, "column"),
        "values": vals,
        "min_ratio": 1.0,
    }
    if "minRatio" in p:
        out["min_ratio"] = _require_number(p, "minRatio", 0.0, 1.0)
    return out


def _v_range(p: dict) -> dict:
    _reject_extras(p, {"column", "min", "max", "minRatio"})
    out: dict = {"column": _require_str(p, "column"), "min_ratio": 1.0}
    if "min" not in p and "max" not in p:
        raise ConfigError("range needs min and/or max")
    if "min" in p:
        out["min"] = _require_number(p, "min", -1e18, 1e18)
    if "max" in p:
        out["max"] = _require_number(p, "max", -1e18, 1e18)
    if out.get("min", -math.inf) > out.get("max", math.inf):
        raise ConfigError("range: min > max can never pass")
    if "minRatio" in p:
        out["min_ratio"] = _require_number(p, "minRatio", 0.0, 1.0)
    return out


def _v_row_count(p: dict) -> dict:
    _reject_extras(p, {"min", "max"})
    out: dict = {}
    if "min" not in p and "max" not in p:
        raise ConfigError("row_count needs min and/or max")
    if "min" in p:
        out["min"] = int(_require_number(p, "min", 0, 1e18))
    if "max" in p:
        out["max"] = int(_require_number(p, "max", 0, 1e18))
    if out.get("min", 0) > out.get("max", 10**18):
        raise ConfigError("row_count: min > max can never pass")
    return out


def _v_reference(p: dict) -> dict:
    _reject_extras(p, {"column", "refPath", "refColumn", "maxOrphanRatio"})
    out = {
        "column": _require_str(p, "column"),
        "ref_path": _require_str(p, "refPath"),
        "ref_column": _require_str(p, "refColumn"),
        "max_orphan_ratio": 0.0,
    }
    if "maxOrphanRatio" in p:
        out["max_orphan_ratio"] = _require_number(p, "maxOrphanRatio", 0.0, 1.0)
    return out


import re as _re

# the JDBC WHERE sanitizer targets MySQL; an expression evaluated by SPARK
# has extra escape hatches a row predicate never needs — JVM invocation
# (reflect/java_method), scalar subqueries over arbitrary files
# (select ... from parquet.`/any/path`), backtick identifiers (the file
# path syntax), and non-deterministic functions that would make a
# contract verdict unrepeatable. Blocklist them at DECODE time.
_SPARK_EXPR_FORBIDDEN = _re.compile(
    r"\b(select|from|reflect|java_method|input_file_name|current_user|"
    r"session_user|current_database|rand|randn|shuffle|uuid|"
    r"monotonically_increasing_id|current_timestamp|current_date|now|"
    r"unix_timestamp|localtimestamp|current_timezone)\b",
    _re.IGNORECASE,
)

_QUOTED_LITERAL = _re.compile(r"'[^']*'|\"[^\"]*\"")


def _v_expression(p: dict) -> dict:
    _reject_extras(p, {"expression", "minRatio"})
    from scylla_migrator_spark.config import validate_where_filter

    expr = p.get("expression")
    if not isinstance(expr, str):
        raise ConfigError("expression needs expression: <boolean SQL over the table>")
    # the JDBC WHERE sanitizer first (comment/terminator/control-char/
    # backslash rejection, balanced quotes, SQL keyword blocklist) ...
    expr = validate_where_filter(expr)
    # ... then the Spark-specific hatches it cannot know about: JVM
    # invocation, subqueries, backtick identifiers (the parquet-path
    # syntax), and non-deterministic or TIME-DEPENDENT functions (a
    # contract verdict must be repeatable on unchanged data). String
    # LITERALS are stripped before the keyword scan so data values like
    # event_type IN ('select', 'click') stay expressible — the sanitizer
    # already guaranteed quotes are balanced.
    if "`" in expr:
        raise ConfigError("expression must not contain backtick identifiers")
    code_only = _QUOTED_LITERAL.sub("''", expr)
    m = _SPARK_EXPR_FORBIDDEN.search(code_only)
    if m:
        raise ConfigError(
            f"expression contains forbidden construct {m.group(0)!r} "
            "(subqueries, JVM invocation, and non-deterministic or "
            "time-dependent functions are not allowed in a contract "
            "predicate)"
        )
    out = {"expression": expr, "min_ratio": 1.0}
    if "minRatio" in p:
        out["min_ratio"] = _require_number(p, "minRatio", 0.0, 1.0)
    return out


_EXPECTS: dict[str, Any] = {
    "not_null": _v_not_null,
    "unique": _v_unique,
    "accepted_values": _v_accepted_values,
    "range": _v_range,
    "row_count": _v_row_count,
    "reference": _v_reference,
    "expression": _v_expression,
}


@dataclass
class ExpectationsConfig:
    source_path: str
    expectations: list[dict]

    @staticmethod
    def from_dict(raw: dict) -> "ExpectationsConfig":
        if not isinstance(raw, dict):
            raise ConfigError("expectations config must be a mapping")
        src = raw.get("source")
        if (
            not isinstance(src, dict)
            or src.get("type") != "parquet"
            or not isinstance(src.get("path"), str)
            or not src["path"].strip()
        ):
            raise ConfigError("source must be {type: parquet, path: ...}")
        exps_raw = raw.get("expectations")
        if not isinstance(exps_raw, list) or not exps_raw:
            raise ConfigError("expectations must be a non-empty list")
        known_top = {"source", "expectations"}
        extra_top = set(raw) - known_top
        if extra_top:
            raise ConfigError(f"unexpected top-level keys {sorted(extra_top)}")
        exps = []
        for i, e in enumerate(exps_raw):
            if not isinstance(e, dict) or "expect" not in e:
                raise ConfigError(f"expectation {i} must be a mapping with 'expect'")
            name = e["expect"]
            if name not in _EXPECTS:
                raise ConfigError(
                    f"expectation {i}: unknown expect {name!r} "
                    f"(supported: {sorted(_EXPECTS)})"
                )
            exps.append({"expect": name, **_EXPECTS[name](e)})
        return ExpectationsConfig(source_path=src["path"], expectations=exps)

    @staticmethod
    def load(path: str) -> "ExpectationsConfig":
        import yaml

        with open(path) as f:
            return ExpectationsConfig.from_dict(yaml.safe_load(f))


def _i(row, key: str) -> int:
    """Aggregate cell as int; F.sum over an EMPTY table yields NULL."""
    v = row[key]
    return 0 if v is None else int(v)


def _ratio_pass(passing_col: str, total_col: str, min_ratio: float):
    """passing/total >= min_ratio in exact integer arithmetic; a vacuous
    (total == 0) population passes."""
    threshold = math.ceil(min_ratio * _RATIO_SCALE)

    def check(row) -> bool:
        total = _i(row, total_col)
        if total == 0:
            return True
        return _i(row, passing_col) * _RATIO_SCALE >= threshold * total

    return check


def run_expectations(spark: SparkSession, cfg: ExpectationsConfig) -> dict:
    """Evaluate every expectation and return the report:

    ``{"passed": bool, "results": [{"expect": ..., "passed": bool,
    <metrics>}, ...]}`` — results in config order. One aggregate pass
    over the table for all row-level + unique expectations; one tiny
    keyed join per ``reference``."""
    df = spark.read.parquet(cfg.source_path)
    missing = {
        e["column"]
        for e in cfg.expectations
        if "column" in e and e["column"] not in df.columns
    } | {
        c
        for e in cfg.expectations
        if e["expect"] == "unique"
        for c in e["columns"]
        if c not in df.columns
    }
    if missing:
        raise ConfigError(
            f"expectation columns not in table: {sorted(missing)} "
            f"(table has {df.columns})"
        )

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, e in enumerate(cfg.expectations):
        kind = e["expect"]
        if kind == "not_null":
            aggs.append(
                F.sum(F.col(e["column"]).isNotNull().cast("long")).alias(f"nn_{i}")
            )
        elif kind == "accepted_values":
            c = F.col(e["column"])
            aggs.append(F.sum(c.isNotNull().cast("long")).alias(f"avt_{i}"))
            aggs.append(
                F.sum((c.isNotNull() & c.isin(e["values"])).cast("long")).alias(
                    f"avp_{i}"
                )
            )
        elif kind == "range":
            c = F.col(e["column"])
            cond = c.isNotNull()
            if "min" in e:
                cond = cond & (c >= e["min"])
            if "max" in e:
                cond = cond & (c <= e["max"])
            aggs.append(
                F.sum(F.col(e["column"]).isNotNull().cast("long")).alias(f"rgt_{i}")
            )
            aggs.append(F.sum(cond.cast("long")).alias(f"rgp_{i}"))
        elif kind == "expression":
            # dbt-style free-form check: the fraction of rows where the
            # boolean SQL holds. Three-valued logic counts NULL as NOT
            # passing (an expectation you cannot evaluate is not met).
            # Resolution errors (bad syntax past the sanitizer, unknown
            # columns) surface as ConfigError BEFORE the aggregate runs.
            try:
                cond = F.expr(e["expression"])
                resolved = df.select(cond.alias("__cond"))  # eager analysis
            except ConfigError:
                raise
            except Exception as exc:
                raise ConfigError(
                    f"expression expectation does not resolve against the "
                    f"table: {e['expression']!r} ({exc})"
                ) from exc
            from pyspark.sql.types import BooleanType

            dtype = resolved.schema[0].dataType
            if not isinstance(dtype, BooleanType):
                # requiring BooleanType (not casting) avoids both ANSI
                # CAST crashes mid-aggregate and silent nonzero->true
                # coercion for numeric expressions
                raise ConfigError(
                    f"expression must be BOOLEAN, got {dtype.simpleString()}: "
                    f"{e['expression']!r}"
                )
            aggs.append(
                F.sum(F.coalesce(cond, F.lit(False)).cast("long")).alias(f"ex_{i}")
            )
        elif kind == "unique":
            aggs.append(
                F.count_distinct(*[F.col(c) for c in e["columns"]]).alias(f"uq_{i}")
            )
            # count_distinct skips all-null tuples; compare against rows
            # where at least one key column is non-null
            any_nn = F.lit(False)
            for c in e["columns"]:
                any_nn = any_nn | F.col(c).isNotNull()
            aggs.append(F.sum(any_nn.cast("long")).alias(f"uqt_{i}"))
    row = df.agg(*aggs).collect()[0]
    n_rows = int(row["__rows"])

    results: list[dict] = []
    overall = True
    for i, e in enumerate(cfg.expectations):
        kind = e["expect"]
        res: dict = {"expect": kind}
        if kind == "not_null":
            res.update(column=e["column"], total=n_rows, passing=_i(row, f"nn_{i}"))
            res["passed"] = _ratio_pass(f"nn_{i}", "__rows", e["min_ratio"])(row)
        elif kind == "accepted_values":
            res.update(
                column=e["column"],
                total=_i(row, f"avt_{i}"),
                passing=_i(row, f"avp_{i}"),
            )
            res["passed"] = _ratio_pass(f"avp_{i}", f"avt_{i}", e["min_ratio"])(row)
        elif kind == "range":
            res.update(
                column=e["column"],
                total=_i(row, f"rgt_{i}"),
                passing=_i(row, f"rgp_{i}"),
            )
            res["passed"] = _ratio_pass(f"rgp_{i}", f"rgt_{i}", e["min_ratio"])(row)
        elif kind == "expression":
            res.update(
                expression=e["expression"],
                total=n_rows,
                passing=_i(row, f"ex_{i}"),
            )
            res["passed"] = _ratio_pass(f"ex_{i}", "__rows", e["min_ratio"])(row)
        elif kind == "unique":
            distinct, considered = _i(row, f"uq_{i}"), _i(row, f"uqt_{i}")
            res.update(columns=e["columns"], distinct=distinct, total=considered)
            res["passed"] = distinct == considered
        elif kind == "row_count":
            res.update(rows=n_rows)
            res["passed"] = n_rows >= e.get("min", 0) and n_rows <= e.get(
                "max", 10**18
            )
        elif kind == "reference":
            child = df.select(F.col(e["column"]).alias("__fk"))
            parent_full = spark.read.parquet(e["ref_path"])
            if e["ref_column"] not in parent_full.columns:
                raise ConfigError(
                    f"refColumn {e['ref_column']!r} not in {e['ref_path']} "
                    f"(has {parent_full.columns})"
                )
            parent = parent_full.select(F.col(e["ref_column"]).alias("__pk"))
            counts = (
                child.join(parent, child["__fk"] == parent["__pk"], "left")
                .agg(
                    F.sum(F.col("__fk").isNotNull().cast("long")).alias("t"),
                    F.sum(
                        (F.col("__fk").isNotNull() & F.col("__pk").isNull()).cast(
                            "long"
                        )
                    ).alias("o"),
                )
                .collect()[0]
            )
            total, orphans = int(counts["t"] or 0), int(counts["o"] or 0)
            res.update(
                column=e["column"],
                ref_path=e["ref_path"],
                total=total,
                orphans=orphans,
            )
            threshold = math.ceil(e["max_orphan_ratio"] * _RATIO_SCALE)
            res["passed"] = (
                total == 0 or orphans * _RATIO_SCALE <= threshold * total
            )
        results.append(res)
        overall = overall and res["passed"]
    return {"passed": overall, "results": results}
