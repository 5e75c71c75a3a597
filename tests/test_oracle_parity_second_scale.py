"""Cross-SCALE oracle parity: the same Spark-vs-DuckDB gate as
test_oracle_parity, but at a SECOND scale (sf0.01 — conftest's default
is sf0.001) — catches fixture-size assumptions (hardcoded counts, seeds
that only exist at one scale, window tie patterns) a single-scale gate
would miss. Skips itself if the two directories coincide (zero added
coverage then).

ON by default since round 6 (it carries the ``parity`` marker, so the
fast loop still excludes it — see pytest.ini): an off-by-default gate
let scale assumptions land silently between rounds. Opt OUT with
SGS_PARITY_SECOND_SCALE=0."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.test_oracle_parity import TABLES, _canon

pytestmark = pytest.mark.parity

SF_DIR = "/root/testdata/sf0.01"

from tests.conftest import SF_DIR as _DEFAULT_SF_DIR

# a second full-registry pass: on unless explicitly disabled, and only
# when it adds a genuinely different scale than the main gate's
# directory. When disabled, the parameter list is empty so the module
# reports ONE skip instead of one per query.
_ENABLED = os.environ.get("SGS_PARITY_SECOND_SCALE", "1") not in (
    "0",
    "false",
) and os.path.realpath(SF_DIR) != os.path.realpath(_DEFAULT_SF_DIR)


@pytest.fixture(scope="module")
def duck_second():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.queries()) if _ENABLED else [])
def test_query_matches_oracle_at_second_scale(spark, duck_second, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    spark_df = q(spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(spark_df) >= 0
        return
    duck_df = duck_second.sql(oracles[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns)
    assert len(spark_df) == len(duck_df)
    s, d = _canon(spark_df), _canon(duck_df)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches, first: {mismatches[:3]}"
