"""Multimodal plumbing tests: asset schema, Arrow-batched feature extraction
(deterministic fake decoder), frame-sampling plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.multimodal import (
    extract_features,
    make_asset_table,
    sample_frames,
)


def _assets(spark):
    rows = [(i, bytes([i % 251] * (100 + i))) for i in range(20)]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    return make_asset_table(df, "id", "data", kind="image", mime="image/png")


def test_asset_schema_and_metadata_pruning(spark):
    assets = _assets(spark)
    assert [f.name for f in assets.schema.fields] == ["asset_id", "asset"]
    # metadata filter must not touch the data bytes (column pruning)
    plan = assets.filter(F.col("asset.meta.kind") == "image")._jdf.queryExecution().toString()
    assert assets.filter(F.col("asset.meta.kind") == "image").count() == 20
    assert plan  # plan materializes


def test_fake_feature_extraction_deterministic(spark):
    assets = _assets(spark)
    feats = extract_features(assets, fake=True)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 20
    assert rows[0]["kind"] == "image" and rows[0]["n_bytes"] == 100
    assert len(rows[0]["feature"]) == 8
    # deterministic across runs
    rows2 = {r["asset_id"]: r for r in extract_features(assets, fake=True).collect()}
    assert rows[5]["feature"] == rows2[5]["feature"]


def test_real_decode_is_stubbed(spark):
    assets = _assets(spark)
    with pytest.raises(Exception) as e:
        extract_features(assets, fake=False).collect()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)


def test_frame_sampling_plan(spark):
    df = spark.createDataFrame([(1, b"xx")], "id bigint, data binary")
    video = make_asset_table(df, "id", "data", kind="video", mime="video/mp4").withColumn(
        "asset",
        F.col("asset").withField("meta.duration_ms", F.lit(3500).cast("long")),
    )
    frames = sample_frames(video, every_ms=1000)
    assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]
