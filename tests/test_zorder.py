"""Z-order clustering (operators/zorder.py): files get narrow min/max
envelopes in BOTH dimensions, so point/range filters on EITHER column touch
a small fraction of files."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.operators.zorder import zorder_by

N_FILES = 16


def _files_touched(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    return df.select(F.input_file_name().alias("f")).distinct().count()


def test_zorder_skips_files_on_both_dimensions(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    zpath = str(tmp_path / "zorders")
    zorder_by(orders, "o_custkey", "o_totalprice", n_files=N_FILES).write.parquet(zpath)
    rpath = str(tmp_path / "rnd")
    orders.repartition(N_FILES).write.parquet(rpath)  # round-robin control

    # a ~10%-selectivity range predicate on EACH dimension (enough matching
    # rows that the round-robin control is forced to touch every file)
    for pred in (
        (F.col("o_custkey") >= 10) & (F.col("o_custkey") < 25),
        (F.col("o_totalprice") >= 123_000) & (F.col("o_totalprice") < 170_000),
    ):
        z_files = _files_touched(spark, zpath, pred)
        r_files = _files_touched(spark, rpath, pred)
        # control layout spreads matches everywhere; z-order confines them
        assert z_files <= N_FILES // 2 < r_files, (z_files, r_files)

    # same rows either way
    assert spark.read.parquet(zpath).count() == orders.count()


def test_zorder_is_expression_only(spark, sf_dir):
    """The clustering plan must stay JVM-side: no Python eval, no global
    single-partition sort (the range exchange samples instead)."""
    import io
    from contextlib import redirect_stdout

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    z = zorder_by(orders, "o_custkey", "o_totalprice", n_files=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        z.explain("simple")
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    assert "rangepartitioning" in plan.lower()
    assert "Window" not in plan
