"""binaryFile ingest -> multimodal asset pipeline, on real files on disk.

The ingest path a real 100 TB media corpus takes: raw files -> distributed
binaryFile scan -> asset structs -> the existing Arrow codec pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_migrator_spark.analytics import multimodal as MM
from scylla_migrator_spark.sources.binary_assets import read_binary_assets


def _write_wavs(tmp_path):
    rates = {"a.wav": 8000, "b.wav": 16000, "c.wav": 44100}
    for name, rate in rates.items():
        payload = bytes(range(100))
        (tmp_path / name).write_bytes(MM.encode_wav(payload, rate))
    (tmp_path / "ignore.txt").write_bytes(b"not audio")
    (tmp_path / "huge.wav").write_bytes(MM.encode_wav(bytes(200) * 50, 8000))
    return rates


def test_binary_ingest_decodes_real_files(spark, tmp_path):
    rates = _write_wavs(tmp_path)
    assets = read_binary_assets(
        spark, str(tmp_path), kind="audio", mime="audio/wav", glob="*.wav"
    )
    meta = MM.decode_assets_meta(assets).join(
        assets.select("asset_id", "path"), "asset_id"
    )
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in meta.collect()}
    assert set(rows) == {"a.wav", "b.wav", "c.wav", "huge.wav"}
    for name, rate in rates.items():
        assert rows[name]["kind"] == "audio"
        assert rows[name]["sample_rate"] == rate
        assert rows[name]["n_samples"] == 100


def test_binary_ingest_glob_and_size_prune(spark, tmp_path):
    _write_wavs(tmp_path)
    small = read_binary_assets(
        spark,
        str(tmp_path),
        kind="audio",
        mime="audio/wav",
        glob="*.wav",
        max_bytes=2000,
    )
    names = {r["path"].rsplit("/", 1)[-1] for r in small.select("path").collect()}
    assert names == {"a.wav", "b.wav", "c.wav"}  # huge.wav and ignore.txt pruned
    # the length predicate reaches the binaryFile source (skipped files are
    # never read), and the scan stays JVM-side
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "length" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asset_ids_deterministic_and_distinct(spark, tmp_path):
    _write_wavs(tmp_path)
    a1 = read_binary_assets(
        spark, str(tmp_path), kind="audio", mime="audio/wav", glob="*.wav"
    )
    ids1 = sorted(r["asset_id"] for r in a1.select("asset_id").collect())
    ids2 = sorted(r["asset_id"] for r in a1.select("asset_id").collect())
    assert ids1 == ids2 and len(set(ids1)) == 4


def test_ingested_assets_run_feature_extraction(spark, tmp_path):
    _write_wavs(tmp_path)
    assets = read_binary_assets(
        spark, str(tmp_path), kind="audio", mime="audio/wav", glob="*.wav",
        max_bytes=2000,
    )
    feats = MM.extract_features(assets).collect()
    assert len(feats) == 3
    for r in feats:
        assert r["kind"] == "audio" and len(r["feature"]) == 8
