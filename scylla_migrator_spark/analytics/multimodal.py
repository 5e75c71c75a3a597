"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is the real deliverable at 100 TB:
* an asset = ``struct<data: binary, meta: struct<kind, mime, width, height,
  duration_ms, sample_rate>>`` — metadata is columnar (filterable/prunable
  WITHOUT touching bytes; a filter on ``meta.kind`` never deserializes data)
* decode / feature-extract run as ``mapInPandas`` over Arrow batches — the
  iterator-of-DataFrames shape keeps peak memory at one batch per core, and
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch size for
  large blobs
* repartitioning by a size-aware key before heavy decode balances skew
  (one 4 GB video next to thousands of thumbnails)

The actual codec libraries are not installed in this container, so the
decode body is STUBBED: ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (size-derived
pseudo-pixels) exercises the full Spark plumbing — schema, batching,
partitioning — for real."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def make_asset_table(df: DataFrame, id_col: str, data_col: str, kind: str, mime: str) -> DataFrame:
    """Wrap a binary column into the asset struct convention."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.struct(
            F.col(data_col).alias("data"),
            F.struct(
                F.lit(kind).alias("kind"),
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ).alias("asset"),
    )


def _fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: dim pseudo-features from
    byte statistics. Replaces PIL/ffmpeg (not installed here)."""
    if not data:
        return [0.0] * dim
    return [float(sum(data[i::dim]) % 997) / 997.0 for i in range(dim)]


def extract_features(df: DataFrame, fake: bool = False, batch_hint: int = 256) -> DataFrame:
    """Decode + featurize assets via mapInPandas (Arrow batches).

    ``fake=False`` raises NotImplementedError inside the UDF — the container
    has no codec libraries; the Spark plumbing (schema, batch iteration,
    size-aware repartition) is real and tested with ``fake=True``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries (PIL/ffmpeg); "
                    "run with fake=True for the deterministic stub"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": [m["kind"] for m in pdf["asset"].map(lambda a: a["meta"])],
                    "n_bytes": [len(a["data"]) if a["data"] is not None else 0 for a in pdf["asset"]],
                    "feature": [_fake_decode(a["data"] or b"") for a in pdf["asset"]],
                }
            )
            yield out

    # size-aware salt: large assets spread across partitions before decode
    salted = df.withColumn(
        "__salt", (F.length(F.col("asset.data")) % F.lit(64)).cast("int")
    ).repartition(F.col("__salt")).drop("__salt")
    return salted.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: emits (asset_id, frame_ts_ms)
    rows WITHOUT decoding — the timestamp grid comes from metadata, so the
    expensive decode can be partitioned per frame downstream."""
    return (
        df.filter(F.col("asset.meta.kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("asset.meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
