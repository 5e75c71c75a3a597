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

Decode support: three container formats are decoded for REAL with stdlib
``struct``/``zlib`` (public file-format specs — RIFF/WAVE, netpbm P6, PNG):
header metadata (dimensions, sample rate, duration) plus raw-sample
features for WAV (8/16-bit PCM) and PPM (raw pixels). Formats that need a
full codec stack (JPEG, H.264, ...) raise NotImplementedError; ``fake=True``
keeps the deterministic stand-in decoder for plumbing tests."""

from __future__ import annotations

import struct
import zlib
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


def empty_meta_struct(kind: str, mime: str):
    """The typed-metadata struct with only kind/mime known (pre-decode)."""
    return F.struct(
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


def make_asset_table(df: DataFrame, id_col: str, data_col: str, kind: str, mime: str) -> DataFrame:
    """Wrap a binary column into the asset struct convention."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.struct(
            F.col(data_col).alias("data"),
            empty_meta_struct(kind, mime).alias("meta"),
        ).alias("asset"),
    )


# --------------------------------------------------------------------------
# Real decoders (public file-format specs, stdlib only)
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE container (PCM 8- or 16-bit) and decode samples.

    Returns metadata (sample_rate, n_channels, bits, duration_ms, n_samples)
    plus ``amp_sum`` — the exact integer sum of unsigned sample magnitudes —
    and ``samples`` as floats in [0, 1] for featurization.
    """
    if len(data) < 44 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(f"only PCM 8/16-bit supported, got fmt={audio_format} bits={bits}")
    if bits == 8:
        raw = list(pcm)  # unsigned 8-bit
        scale = 255.0
    else:
        raw = [abs(v) for v in struct.unpack(f"<{len(pcm) // 2}h", pcm[: len(pcm) // 2 * 2])]
        scale = 32768.0
    n_frames = len(raw) // max(n_channels, 1)
    return {
        "kind": "audio",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_samples": len(raw),
        "duration_ms": (n_frames * 1000) // sample_rate if sample_rate else 0,
        "amp_sum": sum(raw),
        "raw": raw,  # exact integer magnitudes (8-bit: unsigned bytes)
        "samples": [v / scale for v in raw],
    }


def encode_wav(samples: bytes, sample_rate: int, n_channels: int = 1) -> bytes:
    """Build a real 8-bit PCM RIFF/WAVE file from raw unsigned sample bytes."""
    byte_rate = sample_rate * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(samples)) + samples
    if len(samples) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_ppm(data: bytes) -> dict:
    """Parse a binary netpbm P6 image: ASCII header, then raw RGB bytes."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens (comments starting with '#' allowed), then ONE whitespace byte.
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    pixels = data[pos : pos + width * height * 3]
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixel_sum": sum(pixels),
        "pixels": pixels,
        "samples": [b / maxval for b in pixels],
    }


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Build a real P6 PPM from raw RGB bytes (len == width*height*3)."""
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def _ppm_raw(data: bytes) -> tuple[int, int, int, bytes]:
    """Header parse + raw pixel slice of a P6 PPM: (width, height, maxval,
    pixels). Same tokenizer as :func:`decode_ppm` (comments included) but
    skips the per-pixel ``samples``/``pixel_sum`` materialization — the
    resize/dhash hot paths only consume geometry and the raw bytes, and the
    float-list construction was the dominant per-frame cost there."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1
    width, height, maxval = tokens
    return width, height, maxval, data[pos : pos + width * height * 3]


def decode_png(data: bytes) -> dict:
    """Parse PNG IHDR for dimensions; decompress IDAT and reverse per-row
    filters for 8-bit grayscale/RGB(A) (the common training-data cases)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, width = len(_PNG_MAGIC), None
    idat = b""
    while pos + 8 <= len(data):
        size, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack_from(">IIBB", body, 0)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # size + type + crc
    if width is None:
        raise ValueError("missing IHDR")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    out = {"kind": "image", "width": width, "height": height, "bits": bit_depth}
    if channels is None or bit_depth != 8 or not idat:
        return out  # header-only for exotic color types
    raw = zlib.decompress(idat)
    stride, bpp = width * channels, channels
    pixels = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype, row = raw[off], bytearray(raw[off + 1 : off + 1 + stride])
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ftype == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ftype == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        pixels += row
        prev = row
    out["pixel_sum"] = sum(pixels)
    out["samples"] = [v / 255.0 for v in pixels]
    return out


def decode_jpeg(data: bytes) -> dict:
    """Parse a JPEG stream's marker segments for header metadata (public
    ITU T.81 / JFIF spec, stdlib only): walk FFxx segments to the first
    start-of-frame (SOF0-SOF15 minus DHT/JPG/DAC), which carries sample
    precision, dimensions and component count; SOF2 marks progressive
    encoding. Entropy-coded pixel decode (the DCT/Huffman stack) is out of
    scope without a codec library — this intentionally covers the metadata
    path (dimensions/components/progressive), the part a 100 TB curation
    filter needs before deciding to ship bytes to a GPU decode stage."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    _SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers have no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        size = struct.unpack_from(">H", data, pos + 2)[0]
        if marker in _SOF:
            precision, height, width, n_comp = struct.unpack_from(
                ">BHHB", data, pos + 4
            )
            return {
                "kind": "image",
                "width": width,
                "height": height,
                "bits": precision,
                "n_components": n_comp,
                "progressive": marker == 0xC2,
            }
        if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
            break
        pos += 2 + size
    raise ValueError("no SOF marker found")


def encode_jpeg_header(width: int, height: int, n_components: int = 3) -> bytes:
    """Build a structurally valid baseline-JPEG prefix (SOI + JFIF APP0 +
    SOF0 + EOI) for the given geometry — a genuine T.81 marker stream the
    header decoder parses, without an entropy-coded scan (tests/oracles
    need the metadata path, not pixels)."""
    app0 = b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 2, 0, 72, 72, 0, 0)
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_components)
    )
    sof = struct.pack(">BHHB", 8, height, width, n_components) + sof_comps
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )


def decode_mp4(data: bytes) -> dict:
    """Parse an ISO BMFF / MP4 box structure for header metadata (public
    ISO 14496-12 spec, stdlib only): walk top-level boxes to ``moov``,
    read ``mvhd`` (timescale + duration -> duration_ms) and the first
    video ``trak``'s ``tkhd`` (16.16 fixed-point presentation width and
    height). Sample decode (the H.264/AAC codec stack) is out of scope
    without codec libraries — like JPEG, this covers the curation-filter
    metadata path (duration/dimensions before shipping bytes to a GPU
    transcode stage)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF/MP4 file (missing ftyp)")

    def boxes(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            size, btype = struct.unpack_from(">I4s", buf, pos)
            if size == 1:  # 64-bit largesize
                size = struct.unpack_from(">Q", buf, pos + 8)[0]
                body_off = pos + 16
            else:
                body_off = pos + 8
            if size < 8 or pos + size > end:
                break
            yield btype, body_off, pos + size
            pos += size

    out = {"kind": "video", "duration_ms": None, "width": None, "height": None}
    for btype, off, bend in boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ctype, coff, cend in boxes(data, off, bend):
            if ctype == b"mvhd":
                version = data[coff]
                if version == 1:
                    timescale, duration = struct.unpack_from(">IQ", data, coff + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", data, coff + 12)
                if timescale:
                    out["duration_ms"] = (duration * 1000) // timescale
            elif ctype == b"trak" and out["width"] is None:
                for ttype, toff, _tend in boxes(data, coff, cend):
                    if ttype == b"tkhd":
                        version = data[toff]
                        # 16.16 fixed width/height close the tkhd body:
                        # v0 body = 84 bytes (width at 76), v1 = 96 (at 88)
                        fixed_off = toff + (88 if version == 1 else 76)
                        w16, h16 = struct.unpack_from(">II", data, fixed_off)
                        if w16 and h16:  # audio tracks carry 0x0
                            out["width"] = w16 >> 16
                            out["height"] = h16 >> 16
        return out
    raise ValueError("no moov box found")


def encode_mp4_header(duration_ms: int, width: int, height: int) -> bytes:
    """Build a structurally valid ISO BMFF prefix (ftyp + moov{mvhd,
    trak{tkhd}}) for the given duration/geometry — a genuine 14496-12 box
    stream the header decoder parses, without media samples (tests/oracles
    need the metadata path, not frames)."""
    timescale = 1000

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(body), btype) + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, duration_ms)
        # rate, volume, reserved(2+8), matrix(36), predefined(24), next id
        + struct.pack(">iH2x8x36x7I", 0x00010000, 0x0100, *([0] * 6 + [2])),
    )
    tkhd_body = (
        struct.pack(">B3xIIII", 0, 0, 0, 1, 0)  # ver/flags ctime mtime id rsv
        + struct.pack(">I8x", duration_ms)  # duration + reserved(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer altgroup volume rsv
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16)
    )
    trak = box(b"trak", box(b"tkhd", tkhd_body))
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def decode_gif(data: bytes) -> dict:
    """Parse a GIF87a/GIF89a stream for header metadata (public GIF spec,
    stdlib only): logical-screen dimensions from the screen descriptor and
    the ANIMATION FRAME COUNT by walking the block structure (extensions'
    length-prefixed sub-blocks skipped, one frame per image descriptor,
    local color tables sized from the packed field). LZW pixel decode is out
    of scope — like JPEG/MP4 this covers the curation-filter metadata path
    (a frame-sampling plan needs n_frames, not pixels)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a stream")
    # bounds-checked reads throughout: a stream truncated mid-descriptor
    # must raise ValueError (the corrupt-input contract every decoder here
    # follows), never IndexError/struct.error
    if len(data) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    width, height, packed = struct.unpack_from("<HHB", data, 6)
    pos = 13  # header(6) + logical screen descriptor(7)
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (packed & 0x07))
        if pos > len(data):
            raise ValueError("truncated GIF global color table")

    def skip_subblocks(p: int) -> int:
        while p < len(data) and data[p] != 0:
            p += 1 + data[p]
        if p >= len(data):
            raise ValueError("truncated GIF data sub-blocks")
        return p + 1  # past the 0x00 terminator

    n_frames = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: introducer + label, then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated GIF image descriptor")
            ipacked = data[pos + 9]
            pos += 10  # separator + left/top/w/h (4x u16 LE) + packed
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= len(data):
                raise ValueError("truncated GIF local color table")
            pos = skip_subblocks(pos + 1)  # LZW min-code byte, then data
            n_frames += 1
        else:
            raise ValueError(f"corrupt GIF block 0x{block:02x} at {pos}")
    return {"kind": "image", "width": width, "height": height, "n_frames": n_frames}


def encode_gif(width: int, height: int, n_frames: int) -> bytes:
    """Build a structurally valid GIF89a stream with ``n_frames`` frames —
    real header + screen descriptor + per-frame graphic-control extension
    and image descriptor with a minimal LZW data block (tests/oracles need
    the block-walk metadata path, not pixels)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x00, 0, 0)  # no GCT
    for i in range(n_frames):
        # graphic control extension: delay varies per frame (structural
        # realism; the decoder skips it as sub-blocks)
        out += bytes([0x21, 0xF9, 0x04, 0x00]) + struct.pack("<H", 10 * (i + 1)) + bytes([0x00, 0x00])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height) + bytes([0x00])
        out += bytes([0x02, 0x02, 0x44, 0x01, 0x00])  # LZW min code + 1 sub-block
    out += bytes([0x3B])
    return bytes(out)


def synth_gif_assets(
    df: DataFrame, id_col: str, w_col: str, h_col: str, frames_col: str
) -> DataFrame:
    """Build REAL GIF89a streams from integer geometry/frame-count columns
    (mapInPandas) — genuine containers from table data, no media files in
    the repo."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "data": [
                        encode_gif(int(w), int(h), int(n))
                        for w, h, n in zip(pdf[w_col], pdf[h_col], pdf[frames_col])
                    ],
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), w_col, h_col, frames_col
    ).mapInPandas(run, schema)


def decode_asset(data: bytes) -> dict:
    """Sniff the container magic and dispatch to the matching real decoder."""
    if data[:4] == b"RIFF":
        return decode_wav(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:4] == b"GIF8":
        return decode_gif(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return decode_mp4(data)
    raise NotImplementedError(
        "unsupported container (supported: WAV PCM, PPM P6, PNG, JPEG "
        "headers, MP4/ISO-BMFF headers, GIF headers); sample/frame decode needs codec "
        "libraries not present in this environment"
    )


def _featurize(samples: list[float], dim: int = 8) -> list[float]:
    """Banded mean-amplitude feature from decoded samples."""
    if not samples:
        return [0.0] * dim
    return [
        (sum(samples[i::dim]) / len(samples[i::dim])) if samples[i::dim] else 0.0
        for i in range(dim)
    ]


def _fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: dim pseudo-features from
    byte statistics. Replaces PIL/ffmpeg (not installed here)."""
    if not data:
        return [0.0] * dim
    return [float(sum(data[i::dim]) % 997) / 997.0 for i in range(dim)]


def extract_features(df: DataFrame, fake: bool = False, batch_hint: int = 256) -> DataFrame:
    """Decode + featurize assets via mapInPandas (Arrow batches).

    ``fake=False`` runs the REAL stdlib decoders (WAV PCM / PPM / PNG —
    see :func:`decode_asset`) and featurizes the decoded samples; containers
    needing a full codec stack raise NotImplementedError. ``fake=True`` keeps
    the deterministic byte-statistics stand-in used by the plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for a in pdf["asset"]:
                data = a["data"] or b""
                if fake:
                    feats.append(_fake_decode(data))
                else:
                    feats.append(_featurize(decode_asset(data).get("samples", [])))
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": [m["kind"] for m in pdf["asset"].map(lambda a: a["meta"])],
                    "n_bytes": [len(a["data"]) if a["data"] is not None else 0 for a in pdf["asset"]],
                    "feature": feats,
                }
            )
            yield out

    # size-aware salt: large assets spread across partitions before decode
    salted = df.withColumn(
        "__salt", (F.length(F.col("asset.data")) % F.lit(64)).cast("int")
    ).repartition(F.col("__salt")).drop("__salt")
    return salted.mapInPandas(run, FEATURE_SCHEMA)


DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_assets_meta(df: DataFrame) -> DataFrame:
    """Real header+sample decode to typed metadata columns (Arrow batches).

    The output is fully columnar — downstream filters on e.g. duration or
    dimensions run JVM-side with no further byte access. ``amp_sum`` is the
    exact integer sum of decoded sample magnitudes (an oracle-checkable
    witness that the PCM/pixel payload was actually decoded)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, a in zip(pdf["asset_id"], pdf["asset"]):
                m = decode_asset(a["data"] or b"")
                rows.append(
                    {
                        "asset_id": aid,
                        "kind": m["kind"],
                        "width": m.get("width"),
                        "height": m.get("height"),
                        "sample_rate": m.get("sample_rate"),
                        "duration_ms": m.get("duration_ms"),
                        "n_samples": m.get("n_samples", len(m.get("samples", [])) or None),
                        "amp_sum": m.get("amp_sum", m.get("pixel_sum")),
                        "n_components": m.get("n_components"),
                        "n_frames": m.get("n_frames"),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_META_SCHEMA.fields])

    return df.mapInPandas(run, DECODED_META_SCHEMA)


def synth_wav_assets(df: DataFrame, id_col: str, payload_col: str, rate_col: str) -> DataFrame:
    """Build REAL 8-bit PCM WAV containers from a binary payload column
    (mapInPandas — file construction is imperative byte work). Used by tests
    and the oracle-checked decode query to create genuine assets without
    shipping media files in the repo."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "data": [
                        encode_wav(bytes(p or b""), int(r))
                        for p, r in zip(pdf[payload_col], pdf[rate_col])
                    ],
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col), payload_col, rate_col
    )
    return src.mapInPandas(run, schema)


def synth_ppm_assets(
    df: DataFrame, id_col: str, payload_col: str, width: int, height: int
) -> DataFrame:
    """Build REAL P6 PPM images by tiling a binary payload to width*height*3
    RGB bytes (mapInPandas). Like synth_wav_assets: genuine containers from
    table data, no media files shipped in the repo."""
    need = width * height * 3
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "data": [
                        encode_ppm(
                            width, height, (bytes(p or b"\x00") * (need // max(len(p or b"x"), 1) + 1))[:need]
                        )
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), payload_col).mapInPandas(
        run, schema
    )


def synth_jpeg_assets(
    df: DataFrame, id_col: str, w_col: str, h_col: str, comp_col: str
) -> DataFrame:
    """Build REAL baseline-JPEG marker streams (SOI/APP0/SOF0/EOI) from
    integer geometry columns (mapInPandas). Same posture as
    synth_wav_assets: genuine containers from table data, no media files in
    the repo."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "data": [
                        encode_jpeg_header(int(w), int(h), int(c))
                        for w, h, c in zip(pdf[w_col], pdf[h_col], pdf[comp_col])
                    ],
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), w_col, h_col, comp_col
    ).mapInPandas(run, schema)


def synth_mp4_assets(
    df: DataFrame, id_col: str, dur_col: str, w_col: str, h_col: str
) -> DataFrame:
    """Build REAL ISO BMFF box streams (ftyp + moov{mvhd, trak{tkhd}}) from
    integer duration/geometry columns (mapInPandas) — genuine containers
    from table data, no media files in the repo."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "data": [
                        encode_mp4_header(int(d), int(w), int(h))
                        for d, w, h in zip(pdf[dur_col], pdf[w_col], pdf[h_col])
                    ],
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), dur_col, w_col, h_col
    ).mapInPandas(run, schema)


def resize_ppm_nn(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize for P6 PPM assets: decode, sample source
    pixel (x*W//out_w, y*H//out_h) per output pixel, re-encode. Imperative
    byte work -> Arrow-batched mapInPandas; output is again an asset frame so
    resize composes with decode_assets_meta / extract_features downstream."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for a in pdf["asset"]:
                w, h, _maxval, pix = _ppm_raw(a["data"])
                # vectorized NN sample: identical index math to the scalar
                # loop (sy = y*h//out_h, sx = x*w//out_w, 3 bytes per pixel)
                arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
                sy = (np.arange(out_h) * h) // out_h
                sx = (np.arange(out_w) * w) // out_w
                out.append(encode_ppm(out_w, out_h, arr[sy][:, sx].tobytes()))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "data": out})

    return df.select("asset_id", "asset").mapInPandas(run, schema)


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

def image_dhash_fingerprints(df: DataFrame, grid: int = 8) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprints over decoded PPM
    pixels: per image, grayscale the ``grid`` x ``grid`` pixel grid
    ((r+g+b)//3 — integer-exact) and emit one bit per horizontally adjacent
    pair (``1`` where left < right), LSB = (y=0, x=0). The gradient
    direction survives brightness/contrast shifts, which is what makes
    dHash the standard cheap image near-dup key.

    Input is the flat ``(asset_id, data)`` frame that
    :func:`resize_ppm_nn` emits — compose ``synth/ingest -> resize(grid,
    grid) -> dhash``. Output: ``(asset_id, sh)`` where ``sh`` packs
    ``(grid-1)*grid`` bits into a non-negative long (grid=8 -> 56 bits,
    inside the sign bit), ready for dedup.simhash_banded_pairs' banded
    Hamming join — the same bucket-then-verify LSH shape the text SimHash
    path uses, now over images. Imperative byte work lives in one
    Arrow-batched ``mapInPandas``; the hash itself is 8 bytes per image,
    so the pair join never shuffles pixels."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("sh", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # bit weights of the scalar loop: bit (y*(grid-1)+x) for the
        # horizontal neighbor pair at (y, x); max bit 54 for grid=8, safely
        # inside int64
        weights = np.left_shift(
            np.int64(1), np.arange(grid * (grid - 1), dtype=np.int64)
        ).reshape(grid, grid - 1)
        for pdf in batches:
            mats = []
            for data in pdf["data"]:
                w, h, _maxval, pix = _ppm_raw(bytes(data))
                if w != grid or h != grid:
                    raise ValueError(
                        f"dhash expects a {grid}x{grid} image (resize first), "
                        f"got {w}x{h}"
                    )
                mats.append(np.frombuffer(pix, dtype=np.uint8))
            if mats:
                # one vectorized pass over the whole Arrow batch:
                # gray = (r+g+b)//3 per pixel (uint16 sum cannot overflow),
                # one bit per horizontally adjacent pair where left < right
                px = np.stack(mats).astype(np.uint16).reshape(-1, grid, grid, 3)
                gray = px.sum(axis=3) // 3
                bits = gray[:, :, :-1] < gray[:, :, 1:]
                hashes = (bits * weights).sum(axis=(1, 2)).astype(np.int64)
            else:
                hashes = []
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "sh": hashes})

    return df.select("asset_id", "data").mapInPandas(run, schema)

def audio_energy_fingerprints(df: DataFrame, frames: int = 29) -> DataFrame:
    """Perceptual AUDIO fingerprints — the dHash idea on the time axis:
    decode the WAV (REAL RIFF/WAVE parse), split the sample stream into
    ``frames`` equal frames of ``n // frames`` samples (remainder
    dropped), compute each frame's INTEGER energy sum((s-128)^2) for
    8-bit PCM, and emit one bit per adjacent-frame energy gradient
    (``1`` where left < right), LSB = frame 0. The energy ENVELOPE
    survives uniform gain shifts that exact byte hashing does not —
    the audio sibling of :func:`image_dhash_fingerprints`.

    Output: ``(asset_id, sh)`` with ``frames - 1`` bits packed into a
    long (29 frames -> 28 bits -> 4x7 Hamming bands), ready for
    dedup.simhash_banded_pairs — same bucket-then-verify LSH shape as
    the text and image blockers. Energies are exact integers, so the
    fingerprint is byte-replayable with no float order to pin."""
    schema = T.StructType(
        [T.StructField("asset_id", T.LongType()), T.StructField("sh", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for a in pdf["asset"]:
                m = decode_wav(a["data"])
                if m["bits"] != 8:
                    raise NotImplementedError("energy hash expects 8-bit PCM")
                raw = m["raw"]
                w = len(raw) // frames
                if w < 1:
                    raise ValueError(
                        f"need >= {frames} samples for {frames} frames, got {len(raw)}"
                    )
                en = [
                    sum((s - 128) * (s - 128) for s in raw[f * w : (f + 1) * w])
                    for f in range(frames)
                ]
                sh = 0
                for f in range(frames - 1):
                    if en[f] < en[f + 1]:
                        sh |= 1 << f
                hashes.append(sh)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "sh": hashes})

    return df.select("asset_id", "asset").mapInPandas(run, schema)
