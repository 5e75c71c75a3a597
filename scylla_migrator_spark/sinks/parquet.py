"""Parquet sink (reference K5, writers/Parquet.scala:10-27)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy") -> None:
    df.write.mode(mode).option("compression", compression).parquet(path)
