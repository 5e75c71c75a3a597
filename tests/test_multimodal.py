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


def test_real_decode_unsupported_container_raises(spark):
    # raw non-container bytes (no RIFF/P6/PNG magic) still raise
    assets = _assets(spark)
    with pytest.raises(Exception) as e:
        extract_features(assets, fake=False).collect()
    assert "NotImplementedError" in str(e.value) or "unsupported" in str(e.value)


# --------------------------------------------------------------------------
# Real stdlib decoders (WAV / PPM / PNG)
# --------------------------------------------------------------------------


def test_wav_roundtrip_local():
    from scylla_migrator_spark.analytics.multimodal import decode_wav, encode_wav

    payload = bytes(range(200))
    wav = encode_wav(payload, sample_rate=8000)
    m = decode_wav(wav)
    assert m["sample_rate"] == 8000 and m["n_channels"] == 1 and m["bits"] == 8
    assert m["n_samples"] == 200
    assert m["amp_sum"] == sum(payload)
    assert m["duration_ms"] == 200 * 1000 // 8000
    # odd-length payload exercises the word-alignment pad
    m2 = decode_wav(encode_wav(b"\x01\x02\x03", 44100))
    assert m2["n_samples"] == 3 and m2["amp_sum"] == 6


def test_wav_16bit_pcm():
    import struct

    from scylla_migrator_spark.analytics.multimodal import decode_wav

    samples = [-32768, -1, 0, 1, 1000]
    pcm = struct.pack("<5h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    m = decode_wav(wav)
    assert m["bits"] == 16 and m["sample_rate"] == 16000
    assert m["amp_sum"] == sum(abs(s) for s in samples)


def test_ppm_roundtrip_with_comment():
    from scylla_migrator_spark.analytics.multimodal import decode_ppm, encode_ppm

    pixels = bytes(range(2 * 3 * 3))  # 2x3 RGB
    m = decode_ppm(encode_ppm(2, 3, pixels))
    assert (m["width"], m["height"]) == (2, 3)
    assert m["pixel_sum"] == sum(pixels)
    # comments in header are part of the netpbm spec
    commented = b"P6\n# a comment\n2 3\n255\n" + pixels
    assert decode_ppm(commented)["pixel_sum"] == sum(pixels)


def _make_png(width, height, rows, color_type=2, filters=None):
    """Hand-assemble a real PNG (8-bit) with chosen per-row filter types."""
    import struct
    import zlib

    channels = {0: 1, 2: 3}[color_type]
    filters = filters or [0] * height
    raw = b"".join(bytes([filters[y]]) + bytes(rows[y]) for y in range(height))

    def chunk(ctype, body):
        c = struct.pack(">I", len(body)) + ctype + body
        return c + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    from scylla_migrator_spark.analytics.multimodal import decode_png

    # 4x1-pixel RGB rows; filter types 0 (none), 1 (sub), 2 (up), 4 (paeth)
    width, height = 4, 4
    flat = [[(x * 17 + y * 31) % 256 for x in range(width * 3)] for y in range(height)]
    # encode each row under its filter against the true previous row
    enc = []
    for y, ftype in enumerate([0, 1, 2, 4]):
        row, out = flat[y], []
        prev = flat[y - 1] if y else [0] * (width * 3)
        for x in range(width * 3):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                out.append(row[x])
            elif ftype == 1:
                out.append((row[x] - a) % 256)
            elif ftype == 2:
                out.append((row[x] - b) % 256)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[x] - pred) % 256)
        enc.append(out)
    png = _make_png(width, height, enc, color_type=2, filters=[0, 1, 2, 4])
    m = decode_png(png)
    assert (m["width"], m["height"]) == (width, height)
    assert m["pixel_sum"] == sum(sum(r) for r in flat)


def test_real_decode_wav_in_spark(spark):
    from scylla_migrator_spark.analytics.multimodal import (
        decode_assets_meta,
        encode_wav,
        make_asset_table,
    )

    rows = [(i, encode_wav(bytes([i % 7] * (50 + i)), 8000 + i * 100)) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    assets = make_asset_table(df, "id", "data", kind="audio", mime="audio/wav")
    meta = {r["asset_id"]: r for r in decode_assets_meta(assets).collect()}
    assert meta[3]["sample_rate"] == 8300
    assert meta[3]["n_samples"] == 53
    assert meta[3]["amp_sum"] == (3 % 7) * 53
    # real-decode featurization path (fake=False) no longer raises on WAV
    feats = extract_features(assets, fake=False)
    got = {r["asset_id"]: r["feature"] for r in feats.collect()}
    assert len(got) == 10 and len(got[0]) == 8
    assert got[2][0] == pytest.approx((2 % 7) / 255.0)


def test_frame_sampling_plan(spark):
    df = spark.createDataFrame([(1, b"xx")], "id bigint, data binary")
    video = make_asset_table(df, "id", "data", kind="video", mime="video/mp4").withColumn(
        "asset",
        F.col("asset").withField("meta.duration_ms", F.lit(3500).cast("long")),
    )
    frames = sample_frames(video, every_ms=1000)
    assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]


def test_resize_ppm_nearest_neighbor_exact(spark):
    from scylla_migrator_spark.analytics.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_ppm_nn,
    )

    # 2x2 image with distinct per-pixel colors; 2->1 keeps pixel (0,0)
    pix = bytes([10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42])
    df = spark.createDataFrame([(1, encode_ppm(2, 2, pix))], "id bigint, data binary")
    assets = make_asset_table(df, "id", "data", kind="image", mime="image/x-portable-pixmap")
    out = resize_ppm_nn(assets, out_w=1, out_h=1).collect()[0]
    m = decode_ppm(out["data"])
    assert (m["width"], m["height"]) == (1, 1)
    assert m["pixels"] == bytes([10, 11, 12])

    # 2x2 -> 4x4 upsample replicates each source pixel into a 2x2 block
    up = resize_ppm_nn(assets, out_w=4, out_h=4).collect()[0]
    mu = decode_ppm(up["data"])
    assert (mu["width"], mu["height"]) == (4, 4)
    assert mu["pixels"][0:3] == bytes([10, 11, 12])      # top-left block
    assert mu["pixels"][6:9] == bytes([20, 21, 22])      # right half row 0
    assert mu["pixels"][-3:] == bytes([40, 41, 42])      # bottom-right


def test_jpeg_header_roundtrip_and_marker_walk():
    """decode_jpeg parses a genuine T.81 marker stream: geometry round-trips
    through SOF0, fill bytes and standalone markers are skipped, progressive
    (SOF2) is flagged, and junk input is rejected."""
    import struct as _s

    from scylla_migrator_spark.analytics.multimodal import (
        decode_asset,
        decode_jpeg,
        encode_jpeg_header,
    )

    m = decode_jpeg(encode_jpeg_header(640, 480, 3))
    assert (m["width"], m["height"], m["n_components"]) == (640, 480, 3)
    assert m["bits"] == 8 and m["kind"] == "image" and m["progressive"] is False
    # dispatch through the sniffing decoder too
    assert decode_asset(encode_jpeg_header(31, 7, 1))["width"] == 31

    # hand-build: SOI, fill bytes, a COM segment, then SOF2 (progressive)
    sof = _s.pack(">BHHB", 8, 33, 44, 3) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    data = (
        b"\xff\xd8"
        + b"\xff\xff"  # fill byte before marker
        + b"\xff\xfe" + _s.pack(">H", 2 + 5) + b"hello"  # COM
        + b"\xff\xc2" + _s.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )
    m2 = decode_jpeg(data)
    assert (m2["width"], m2["height"], m2["progressive"]) == (44, 33, True)

    import pytest as _pt

    with _pt.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    with _pt.raises(ValueError, match="no SOF"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_mp4_header_roundtrip_and_v1_boxes():
    """decode_mp4 parses genuine 14496-12 box streams: v0 round-trip via the
    builder, hand-built v1 mvhd/tkhd (64-bit times), largesize boxes, and
    junk rejection."""
    import struct as _s

    from scylla_migrator_spark.analytics.multimodal import (
        decode_asset,
        decode_mp4,
        encode_mp4_header,
    )

    m = decode_mp4(encode_mp4_header(90_500, 1280, 720))
    assert (m["duration_ms"], m["width"], m["height"]) == (90500, 1280, 720)
    assert decode_asset(encode_mp4_header(10, 2, 2))["kind"] == "video"

    def box(btype, body):
        return _s.pack(">I4s", 8 + len(body), btype) + body

    # version-1 mvhd: 64-bit ctime/mtime/duration, 32-bit timescale
    mvhd1 = box(b"mvhd", _s.pack(">B3xQQIQ", 1, 0, 0, 90000, 90000 * 7) + b"\x00" * 80)
    # version-1 tkhd: width at body offset 88
    # body: 36 (times/id/duration) + 8 reserved + 8 layer/alt/vol/rsv
    # + 36 matrix = 88, width/height close it at 96
    tkhd1_body = _s.pack(">B3xQQI4xQ", 1, 0, 0, 1, 0) + b"\x00" * 52 + _s.pack(
        ">II", 640 << 16, 480 << 16
    )
    trak1 = box(b"trak", box(b"tkhd", tkhd1_body))
    data = box(b"ftyp", b"isom\x00\x00\x02\x00") + box(b"moov", mvhd1 + trak1)
    m1 = decode_mp4(data)
    assert (m1["duration_ms"], m1["width"], m1["height"]) == (7000, 640, 480)

    import pytest as _pt

    with _pt.raises(ValueError, match="ftyp"):
        decode_mp4(b"\x00\x00\x00\x08free")
    with _pt.raises(ValueError, match="no moov"):
        decode_mp4(box(b"ftyp", b"isom") + box(b"free", b""))


def test_gif_header_roundtrip_and_block_walk():
    from scylla_migrator_spark.analytics.multimodal import (
        decode_asset,
        decode_gif,
        encode_gif,
    )

    m = decode_gif(encode_gif(640, 480, 1))
    assert (m["width"], m["height"], m["n_frames"]) == (640, 480, 1)
    # multi-frame animation: one frame per image descriptor
    assert decode_gif(encode_gif(12, 7, 9))["n_frames"] == 9
    # zero frames: header + trailer only is structurally valid
    assert decode_gif(encode_gif(5, 5, 0))["n_frames"] == 0
    # magic dispatch
    assert decode_asset(encode_gif(3, 4, 2))["n_frames"] == 2
    # GIF87a accepted, wrong magic rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_gif(b"GIF90a" + b"\x00" * 16)
    hdr87 = bytearray(encode_gif(2, 2, 1))
    hdr87[3:6] = b"87a"
    assert decode_gif(bytes(hdr87))["width"] == 2


def test_gif_with_global_and_local_color_tables():
    import struct as _s

    from scylla_migrator_spark.analytics.multimodal import decode_gif

    # hand-build: GCT of 4 entries (packed 0x81), one frame with an LCT of
    # 2 entries (packed 0x80), interleaved with a comment extension
    buf = bytearray(b"GIF89a")
    buf += _s.pack("<HHBBB", 10, 11, 0x81, 0, 0)
    buf += b"\x00" * (3 * 4)  # global color table
    buf += bytes([0x21, 0xFE, 0x03]) + b"abc" + bytes([0x00])  # comment ext
    buf += bytes([0x2C]) + _s.pack("<HHHH", 0, 0, 10, 11) + bytes([0x80])
    buf += b"\x00" * (3 * 2)  # local color table
    buf += bytes([0x02, 0x01, 0x44, 0x00])  # lzw min + 1 sub-block + term
    buf += bytes([0x3B])
    m = decode_gif(bytes(buf))
    assert (m["width"], m["height"], m["n_frames"]) == (10, 11, 1)


def test_decode_gif_truncated_raises_valueerror():
    """Truncated streams must raise ValueError (the corrupt-input contract
    shared by every decoder here), never IndexError/struct.error — cut the
    stream at every prefix length and at mid-descriptor boundaries."""
    import pytest

    from scylla_migrator_spark.analytics.multimodal import decode_gif, encode_gif

    full = encode_gif(16, 8, 2)
    for cut in range(6, len(full)):  # prefixes keeping the magic intact
        # a cut at a clean block boundary parses (fewer frames, no
        # trailer); every other cut must be a ValueError — and NO cut may
        # leak IndexError/struct.error
        try:
            m = decode_gif(full[:cut])
            assert 0 <= m["n_frames"] <= 2
        except ValueError:
            pass
    # mid-image-descriptor cut (the exact ADVICE case) must raise
    desc = full.index(b"\x2c")
    with pytest.raises(ValueError):
        decode_gif(full[: desc + 5])
    # truncated global color table: GCT flag set, table bytes missing
    hdr = bytearray(b"GIF89a") + bytearray(
        __import__("struct").pack("<HHBBB", 2, 2, 0x80, 0, 0)
    )
    with pytest.raises(ValueError):
        decode_gif(bytes(hdr) + b"\x00\x00")


def test_image_dhash_known_grid_and_banded_near_dup(spark):
    """dHash bit semantics pinned against a hand-computed 8x8 grid, then a
    1-pixel perturbation must surface as a small-Hamming banded pair."""
    from scylla_migrator_spark.analytics.dedup import simhash_banded_pairs
    from scylla_migrator_spark.analytics.multimodal import (
        encode_ppm,
        image_dhash_fingerprints,
    )

    # gray(i) = i for pixel index i (r=g=b=i): every row strictly increases,
    # so all 56 bits are set
    ramp = bytes(b for i in range(64) for b in (i, i, i))
    # flip one gradient: make pixel (y=0, x=3) brighter than (y=0, x=4)
    bumped = bytearray(ramp)
    bumped[3 * 3] = bumped[3 * 3 + 1] = bumped[3 * 3 + 2] = 200
    df = spark.createDataFrame(
        [(1, encode_ppm(8, 8, ramp)), (2, encode_ppm(8, 8, bytes(bumped)))],
        "asset_id long, data binary",
    )
    fp = {r["asset_id"]: r["sh"] for r in image_dhash_fingerprints(df).collect()}
    assert fp[1] == (1 << 56) - 1
    # bumping pixel 3 flips bits (y=0,x=2): gray 2<200 stays 1... and
    # (y=0,x=3): gray 200<4 now 0 -> exactly one bit differs
    assert bin(fp[1] ^ fp[2]).count("1") == 1
    pairs = simhash_banded_pairs(
        image_dhash_fingerprints(df), "asset_id", sh_col="sh",
        bits=56, bands=8, max_hamming=4,
    ).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 1)]


def test_image_dhash_rejects_wrong_grid(spark):
    from scylla_migrator_spark.analytics.multimodal import (
        encode_ppm,
        image_dhash_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, encode_ppm(4, 4, bytes(48)))], "asset_id long, data binary"
    )
    with pytest.raises(Exception, match="8x8"):
        image_dhash_fingerprints(df).collect()


def test_audio_energy_hash_known_pcm_and_banded_pair(spark):
    """Energy-gradient bit semantics pinned on hand-built PCM, then a
    small perturbation surfaces as a banded Hamming pair."""
    from scylla_migrator_spark.analytics.dedup import simhash_banded_pairs
    from scylla_migrator_spark.analytics.multimodal import (
        audio_energy_fingerprints,
        encode_wav,
        make_asset_table,
    )

    # 29 frames x 2 samples; frame f has samples (128, 128+f) -> energy f^2,
    # strictly increasing -> all 28 bits set
    ramp = bytes(b for f in range(29) for b in (128, 128 + f))
    # kill frame 1's energy (both samples 128): e0=0, e1=0 -> bit0 (e0<e1)
    # flips OFF; bit1 (e1<e2) stays on -> exactly one bit differs
    bumped = bytearray(ramp)
    bumped[3] = 128
    df = spark.createDataFrame(
        [(1, encode_wav(ramp, 8000)), (2, encode_wav(bytes(bumped), 8000))],
        "asset_id long, data binary",
    )
    assets = make_asset_table(df, "asset_id", "data", kind="audio", mime="audio/wav")
    fp = {r["asset_id"]: r["sh"] for r in audio_energy_fingerprints(assets).collect()}
    assert fp[1] == (1 << 28) - 1
    assert bin(fp[1] ^ fp[2]).count("1") == 1
    pairs = simhash_banded_pairs(
        audio_energy_fingerprints(assets), "asset_id", sh_col="sh",
        bits=28, bands=4, max_hamming=3,
    ).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 1)]


def test_perceptual_banding_is_lossless_at_threshold(spark, sf_dir):
    """The pigeonhole guarantee, verified empirically: the banded Hamming
    join returns EXACTLY the pairs an unblocked all-pairs popcount scan
    finds at the threshold — for both the image dHash (8 bands, h<=4) and
    the audio energy hash (4 bands, h<=3)."""
    from pyspark.sql import functions as F

    from scylla_migrator_spark.analytics.dedup import simhash_banded_pairs
    from scylla_migrator_spark.analytics.multimodal import (
        audio_energy_fingerprints,
        image_dhash_fingerprints,
        make_asset_table,
        resize_ppm_nn,
        synth_ppm_assets,
        synth_wav_assets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.encode(F.substring("text", 1, 61), "UTF-8").alias("payload"),
        F.encode(
            F.substring(F.repeat(F.substring("text", 1, 61), 8), 1, 464), "UTF-8"
        ).alias("tiled"),
        F.lit(8000).cast("int").alias("rate"),
    )
    ppm = synth_ppm_assets(docs, "doc_id", "payload", width=16, height=16)
    img_fp = image_dhash_fingerprints(
        resize_ppm_nn(
            make_asset_table(ppm, "asset_id", "data", "image", "image/x-portable-pixmap"),
            8,
            8,
        )
    ).localCheckpoint()
    wav = synth_wav_assets(
        docs.select("doc_id", F.col("tiled").alias("payload"), "rate"),
        "doc_id",
        "payload",
        "rate",
    )
    aud_fp = audio_energy_fingerprints(
        make_asset_table(wav, "asset_id", "data", "audio", "audio/wav")
    ).localCheckpoint()

    for fp, bits, bands, h in ((img_fp, 56, 8, 4), (aud_fp, 28, 4, 3)):
        banded = {
            (r["id_a"], r["id_b"])
            for r in simhash_banded_pairs(
                fp, "asset_id", sh_col="sh", bits=bits, bands=bands, max_hamming=h
            ).collect()
        }
        a, b = fp.alias("a"), fp.alias("b")
        exact = {
            (r["id_a"], r["id_b"])
            for r in a.join(b, F.col("a.asset_id") < F.col("b.asset_id"))
            .select(
                F.col("a.asset_id").alias("id_a"),
                F.col("b.asset_id").alias("id_b"),
                F.bit_count(
                    F.col("a.sh").bitwiseXOR(F.col("b.sh"))
                ).alias("ham"),
            )
            .filter(F.col("ham") <= h)
            .collect()
        }
        assert banded == exact and exact, f"bits={bits}: banding lost pairs"


def test_perceptual_queries_survive_degenerate_docs(spark, tmp_path):
    """r7 ADVICE regression: documents too short to fill one audio frame
    (text < 4 chars) used to abort audio_phash_dup_pairs with a ValueError
    mid-job, and empty docs relied on DuckDB NULL-on-mod-zero in the image
    oracle. Both engines now EXCLUDE degenerate payloads by an explicit
    identical rule — verified by running engine AND oracle on a corpus
    that contains them."""
    import duckdb

    from scylla_migrator_spark.plans import queries as Q

    rows = [
        (1, ""),  # empty: image + audio excluded
        (2, "ab"),  # 2 bytes -> tiled 16 < 29: audio excluded, image kept
        (3, "xyz"),  # 3 bytes -> tiled 24 < 29: audio excluded, image kept
        (4, "the quick brown fox jumps over the lazy dog padding padding"),
        (5, "the quick brown fox jumps over the lazy dog padding padding"),
        (6, "ab"),  # duplicate of 2: image hamming-0 partner
    ]
    sf_dir = str(tmp_path / "sfdeg")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in ("image_phash_dup_pairs", "audio_phash_dup_pairs"):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in Q.QUERIES[name](spark, sf_dir).collect()
        }
        want = {
            (a, b, h)
            for a, b, h in con.execute(Q.ORACLES[name]).fetchall()
        }
        assert got == want, name
        assert all(1 not in (a, b) for a, b, _ in got), f"{name} kept the empty doc"
    # the exact-duplicate pair of short-but-image-valid docs survives the
    # image path (hamming 0) and is absent from audio (both excluded there)
    img = {
        (r["id_a"], r["id_b"])
        for r in Q.QUERIES["image_phash_dup_pairs"](spark, sf_dir).collect()
    }
    assert (2, 6) in img
    aud = {
        (r["id_a"], r["id_b"])
        for r in Q.QUERIES["audio_phash_dup_pairs"](spark, sf_dir).collect()
    }
    assert all(a not in (1, 2, 3, 6) and b not in (1, 2, 3, 6) for a, b in aud)


def test_frame_sequence_pairs_semantics_and_collapse(spark):
    """Shingled frame-hash matching: identical sequences (re-uploads) pair
    at jaccard 1 through the collapse leg; partial runs share shingles
    proportionally; single-frame videos (no shingle) never match; and the
    collapse keeps the shingle-join input sequence-diversity-sized."""
    from scylla_migrator_spark.analytics.dedup import frame_sequence_pairs

    rows = []
    # A (1) and B (2): identical 4-frame sequences -> 3 shingles, jacc 1
    for vid in (1, 2):
        for f, sh in enumerate([10, 20, 30, 40]):
            rows.append((vid, f, sh))
    # C (3): shares A's last run 20,30,40 but starts differently
    for f, sh in enumerate([99, 20, 30, 40]):
        rows.append((3, f, sh))
    # D (4): disjoint hashes
    for f, sh in enumerate([7, 8, 9]):
        rows.append((4, f, sh))
    # E (5): single frame -> zero shingles -> excluded
    rows.append((5, 0, 10))
    df = spark.createDataFrame(rows, "vid long, f long, sh long")
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
        for r in frame_sequence_pairs(df, "vid", "f", "sh").collect()
    }
    # A-B identical: 3 shared of 3 -> 1.0 (intra/collapse leg)
    # A-C and B-C: shingles {10_20,20_30,30_40} vs {99_20,20_30,30_40}
    #   share 2 of 4 distinct -> 0.5
    assert got == {
        (1, 2): (3, 1.0),
        (1, 3): (2, 0.5),
        (2, 3): (2, 0.5),
    }


def test_frame_sequence_pairs_hot_shingle_cap(spark):
    """max_shingle_freq prunes a shingle shared by too many DISTINCT
    sequences (ubiquitous intro/outro), with set sizes recounted over the
    retained universe; identical-sequence pairs survive the cap."""
    from scylla_migrator_spark.analytics.dedup import frame_sequence_pairs

    rows = []
    # five DISTINCT sequences all opening with the hot run 1,2 (shingle
    # "1_2"), then diverging
    for vid in range(10, 15):
        for f, sh in enumerate([1, 2, vid * 100, vid * 100 + 1]):
            rows.append((vid, f, sh))
    # plus an exact re-upload of vid 10
    for f, sh in enumerate([1, 2, 1000, 1001]):
        rows.append((20, f, sh))
    df = spark.createDataFrame(rows, "vid long, f long, sh long")
    capped = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
        for r in frame_sequence_pairs(
            df, "vid", "f", "sh", max_shingle_freq=3
        ).collect()
    }
    # "1_2" appears in 5 distinct sequences > 3 -> pruned; the divergent
    # tails share nothing, so only the re-upload pair survives (jacc 1,
    # n_shared recounted over the RETAINED universe: 2, not 3)
    assert capped == {(10, 20): (2, 1.0)}
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in frame_sequence_pairs(df, "vid", "f", "sh").collect()
    }
    assert len(uncapped) == 5 * 4 // 2 + 5  # all cross pairs + the re-upload


def test_frame_sequence_pairs_empty_and_single_video(spark):
    """Degenerate inputs: an empty frame table and a corpus of only
    sub-shingle videos both yield an empty pair frame with the schema
    contract intact."""
    from scylla_migrator_spark.analytics.dedup import frame_sequence_pairs

    empty = spark.createDataFrame([], "vid long, f long, sh long")
    out = frame_sequence_pairs(empty, "vid", "f", "sh")
    assert out.columns == ["id_a", "id_b", "n_shared", "jaccard"]
    assert out.count() == 0
    singles = spark.createDataFrame(
        [(1, 0, 10), (2, 0, 10)], "vid long, f long, sh long"
    )
    assert frame_sequence_pairs(singles, "vid", "f", "sh").count() == 0


def test_frame_sequence_star_matches_pairs_components(spark):
    """emit='star' on the video shingle matcher must yield the identical
    connected-component labelling as pair mode, with identical-sequence
    groups contributing member->rep edges linear in group size."""
    from scylla_migrator_spark.analytics.components import connected_components
    from scylla_migrator_spark.analytics.dedup import frame_sequence_pairs

    rows = []
    for vid in range(1, 31):  # 30 identical re-uploads (one sequence group)
        for f in range(5):
            rows.append((vid, f, 100 + f))
    for vid in range(31, 41):  # shares a frame run with the group
        for f in range(5):
            rows.append((vid, f, (100 + f) if f < 3 else 900 + vid * 10 + f))
    for vid in range(41, 46):  # unrelated sequences
        for f in range(5):
            rows.append((vid, f, vid * 1000 + f))
    df = spark.createDataFrame(rows, "vid long, f long, sh long")
    pairs = frame_sequence_pairs(df, "vid", "f", "sh").select("id_a", "id_b")
    star = frame_sequence_pairs(df, "vid", "f", "sh", emit="star").select(
        "id_a", "id_b"
    )
    star_rows = star.collect()
    intra_hot = [r for r in star_rows if r["id_b"] <= 30]
    assert len(intra_hot) == 29 and all(r["id_a"] == 1 for r in intra_hot)
    lab_p = {
        (r["id"], r["comp"])
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    lab_s = {
        (r["id"], r["comp"])
        for r in connected_components(star, "id_a", "id_b").collect()
    }
    assert lab_p == lab_s
