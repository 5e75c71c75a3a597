"""Binary-file ingest for multimodal corpora.

How an image/audio/video corpus actually arrives at 100 TB: millions of
raw files in an object store, not rows in a table. Spark's built-in
``binaryFile`` source reads them distributed — each file becomes one row
``(path, modificationTime, length, content)`` with the scan split across
executors by ``spark.sql.files.maxPartitionBytes`` (many small files pack
into one task; the driver never touches file bytes).

This module bridges that source into the asset-struct convention of
``analytics/multimodal.py``, so the existing decode / feature-extract
pipeline (Arrow ``mapInPandas`` codecs) runs unchanged on real files:

    read_binary_assets(spark, dir, kind="audio", mime="audio/wav")
      -> (path, length, asset_id, asset{data, meta})
      -> multimodal.decode_assets_meta(...)  /  extract_features(...)

Scale notes:

* ``max_bytes`` becomes a filter on the source's ``length`` column, which
  the binaryFile source PUSHES DOWN to the file index — oversized blobs
  are skipped without reading a byte of content (pinned in pytest).
* ``pathGlobFilter`` / ``recursiveFileLookup`` prune at listing time.
* ``asset_id`` is the xxhash64 of the file path: deterministic,
  collision-resistant at corpus scale, and computable without reading
  content. The path rides along for lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.multimodal import empty_meta_struct


def read_binary_assets(
    spark: SparkSession,
    path: str,
    *,
    kind: str,
    mime: str,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Distributed raw-file scan -> multimodal asset table."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path)
    if max_bytes is not None:
        # pushed to the binaryFile source: skipped files are never read
        files = files.where(F.col("length") <= max_bytes)
    return files.select(
        "path",
        "length",
        F.xxhash64("path").alias("asset_id"),
        F.struct(
            F.col("content").alias("data"),
            empty_meta_struct(kind, mime).alias("meta"),
        ).alias("asset"),
    )
