"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB, compare row count, column names, and
(order-insensitively) values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.parity

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df):
    """Sort columns by name, rows by stringified values (order-insensitive)."""
    import numpy as np

    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            # list columns arrive as numpy arrays from DuckDB's .df() and
            # from Arrow toPandas, but as Python lists from a non-Arrow
            # Spark session — normalize before stringifying so the canon
            # does not depend on which session built the frame
            if isinstance(v, np.ndarray):
                v = v.tolist()
            if isinstance(v, float):
                if math.isnan(v):
                    cells.append("NaN")
                else:
                    cells.append(f"{v:.9g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return sorted(rows)


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, sf_dir)
    # output contract: no container-typed columns (the driver's pandas
    # canonicalizer cannot sort list cells) — plan-only twin of
    # tests/test_registry_lint.py, applied here to streaming entries too
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"query {name!r} emits container-typed column(s) {bad}"
    spark_df = sdf.toPandas()
    if name not in oracles:
        assert len(spark_df) >= 0  # rows-only check for non-SQL ops
        return
    duck_df = duck.sql(oracles[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"column mismatch: {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df)
    s, d = _canon(spark_df), _canon(duck_df)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches, first: {mismatches[:3]}"
