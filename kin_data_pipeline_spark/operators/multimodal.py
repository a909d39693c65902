"""Multimodal column operators: opaque binary payloads + typed metadata.

Design for 100 TB: binary media live as ``BinaryType`` columns (or object-
store URIs) beside typed metadata structs; every transform is Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

Header-level decode (dimensions, channel count, sample geometry) is REAL for
BMP / PNG / WAV / JPEG / AVI payloads: ``parse_media_header`` does magic-byte
sniffing + struct parsing of the actual container headers, no external codec
needed. Pixel/sample-level decode is ALSO real, pure stdlib/numpy, for the
generated formats: PNG (zlib + scanline unfilter), WAV (16-bit PCM),
baseline JPEG (Huffman + dequant + IDCT) including chroma-subsampled
YCbCr at ANY dividing sampling layout — 4:2:0, 4:2:2, 4:4:0, 4:1:1 —
via the general T.81 MCU-interleave (per-component block grids,
nearest-neighbor chroma upsample), the FULL Annex G progressive JPEG
profile (spectral selection AND successive approximation, encode +
decode), progressive × subsampled COMBINED (interleaved-DC +
per-component true-raster AC scans over the general MCU lattice) and
AVI-MJPG video (RIFF container parse + sampled-frame JPEG decode).
``require_codec`` remains only for real-world codecs this container
cannot express — arithmetic/lossless/hierarchical JPEG, interframe
video (H.264 etc.), lossy resampling; the deterministic fake decoder is kept for opaque
(non-media) payloads so the batching plumbing stays testable on any
bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("feature_hash", LongType()),
    ]
)

SYNTH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("content", BinaryType()),
    ]
)

DECODED_HEADER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

def require_codec(name: str):
    """Import a media codec library or raise a clear stub error.

    Header-level decode of BMP/PNG/WAV/JPEG/AVI needs no codec (see
    ``parse_media_header``); PNG raster decode (``decode_png_pixels``:
    zlib inflate + scanline unfiltering), WAV PCM decode, BASELINE JPEG
    decode (``decode_baseline_jpeg``: Huffman entropy decode + dequant +
    IDCT) and AVI-MJPG frame extraction (``parse_avi_mjpeg``) are pure
    stdlib/numpy too. This gate covers only the work that genuinely needs
    a native codec — non-DCT-Huffman JPEG profiles, interframe video
    (H.264 etc.), lossy resampling.
    Production clusters ship the libs.
    """
    try:
        return __import__(name)
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"media codec '{name}' is not installed in this environment; "
            "pixel/sample-level decode is unavailable (header-level decode "
            "of BMP/PNG/WAV/JPEG works without it — see parse_media_header)"
        ) from exc

# --- deterministic media synthesis (BMP / PNG / WAV / JPEG) ----------------
# The container has no media corpus, so the multimodal decode path is
# exercised on synthesized-but-VALID files: real magic bytes, real header
# structs, real CRCs. Geometry derives from media_id by fixed arithmetic so
# a SQL oracle can predict what the header parsers must recover — the
# synth→parse round trip is checked end-to-end, not by construction.

def _make_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit BI_RGB bottom-up BMP (BITMAPINFOHEADER)."""
    row = (3 * width + 3) // 4 * 4  # rows pad to 4-byte boundaries
    pixel_bytes = row * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        54 + pixel_bytes,
        0,
        0,
        54,  # pixel-array offset
        40,  # BITMAPINFOHEADER size
        width,
        height,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB
        pixel_bytes,
        2835,
        2835,
        0,
        0,
    )
    return header + bytes(pixel_bytes)

#: PNG color type → sample channel count (spec §11.2.2; palette = 1 index).
PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

def _make_png(width: int, height: int, color_type: int) -> bytes:
    """PNG signature + IHDR + IEND with real chunk CRCs (no IDAT: the
    header parser — like any streaming metadata pass — never needs pixels).
    """

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")

#: SOF markers that carry frame geometry (C4/C8/CC are tables, not frames).
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}

def _make_jpeg(width: int, height: int, n_components: int) -> bytes:
    """SOI + JFIF APP0 + SOF0 + EOI — a valid marker stream up to the frame
    header (no entropy-coded scan: dimension sniffing never needs it).

    n_bytes = 32 + 3*n_components (2 SOI + 18 APP0 + 10+3n SOF0 + 2 EOI),
    the arithmetic the decoded-stats oracle mirrors.
    """
    app0 = struct.pack(
        ">HH5sBBBHHBB",
        0xFFE0,
        16,  # length includes itself: 2 + 14 payload bytes
        b"JFIF\x00",
        1,
        1,  # version 1.1
        0,  # density units: none
        1,
        1,  # aspect-ratio densities
        0,
        0,  # no thumbnail
    )
    sof0 = struct.pack(
        ">HHBHHB",
        0xFFC0,
        8 + 3 * n_components,  # length includes itself
        8,  # sample precision
        height,
        width,
        n_components,
    ) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_components)
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

def _make_wav(n_channels: int, sample_rate: int, n_samples: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + silent 16-bit PCM frames."""
    block_align = n_channels * 2
    data_bytes = n_samples * block_align
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + data_bytes, b"WAVE")
        + struct.pack(
            "<4sIHHIIHH",
            b"fmt ",
            16,
            1,  # PCM
            n_channels,
            sample_rate,
            sample_rate * block_align,
            block_align,
            16,  # bits per sample
        )
        + struct.pack("<4sI", b"data", data_bytes)
        + bytes(data_bytes)
    )

def synthesize_media(media_id: int) -> tuple[str, bytes]:
    """Deterministic (mime, payload): id%4 picks BMP/PNG/WAV/JPEG; geometry
    is fixed arithmetic on the id (mirrored by media_decoded_stats' oracle).
    Sub-selectors (PNG color type, WAV channels/rate, JPEG components) use
    id//4 so they still vary within each format's id residue class."""
    fmt = media_id % 4
    sub = media_id // 4
    if fmt == 0:
        return "image/bmp", _make_bmp(1 + media_id * 7 % 32, 1 + media_id * 13 % 32)
    if fmt == 1:
        color_type = (0, 2, 4, 6)[sub % 4]
        return "image/png", _make_png(
            1 + media_id * 7 % 512, 1 + media_id * 13 % 512, color_type
        )
    if fmt == 2:
        return "audio/wav", _make_wav(
            1 + sub % 2, 8000 + sub % 4 * 4000, 1 + media_id * 11 % 100
        )
    return "image/jpeg", _make_jpeg(
        1 + media_id * 7 % 256, 1 + media_id * 13 % 256, 1 if sub % 2 == 0 else 3
    )

def synthesize_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) → (media_id, mime, content)."""
    for pdf in batches:
        made = pdf["media_id"].map(lambda i: synthesize_media(int(i)))
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": made.map(lambda t: t[0]),
                "content": made.map(lambda t: t[1]),
            }
        )

def _spread_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Id rows destined for CPU-heavy Arrow codec stages, spread across the
    session's full parallelism. The testdata tables arrive as one small
    parquet file = ONE input partition, which would serialize every
    mapInPandas codec worker onto a single core; at cluster scale the ids
    come pre-partitioned from a large table and the repartition is a
    cheap narrow-row shuffle either way."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    return ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)


def synthesize_media_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach deterministic BMP/PNG/WAV/JPEG payloads to an id column."""
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_media_batch, schema=SYNTH_SCHEMA)

# --- real header-level decode ----------------------------------------------

def parse_media_header(content: bytes) -> tuple[str, int, int, int]:
    """Sniff magic bytes and struct-parse the container header.

    Returns (mime, width, height, n_channels). For WAV, ``width`` is the
    frame count and ``height`` the sample rate — the audio analogue of
    raster geometry. Raises ValueError on unrecognized/truncated payloads
    (route those to ``require_codec``-backed decoders or quarantine).
    """
    if content[:2] == b"BM" and len(content) >= 54:
        width, height = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
        return "image/bmp", width, abs(height), max(1, bpp // 8)
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 33:
        # Bytes 8..16 are the IHDR length+type; width/height follow.
        width, height = struct.unpack_from(">II", content, 16)
        color_type = content[25]
        channels = PNG_CHANNELS.get(color_type)
        if channels is None:
            # keep the documented contract: bad payloads raise ValueError
            # (quarantine route), never KeyError
            raise ValueError(f"PNG payload with invalid color type {color_type}")
        return "image/png", width, height, channels
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 13:
        # Logical Screen Descriptor: canvas geometry at a fixed offset.
        width, height = struct.unpack_from("<HH", content, 6)
        # GIF pixels are palette indices — 1 channel, like PNG color type 3
        return "image/gif", width, height, 1
    if content[:2] == b"\xff\xd8":
        # JPEG has no fixed-offset geometry: walk the marker stream to the
        # first frame header (SOF). Standalone markers (RST/TEM/EOI) carry
        # no length; fill bytes (0xFF padding before a marker) are legal.
        off = 2
        while off + 4 <= len(content):
            if content[off] != 0xFF:
                raise ValueError("JPEG marker stream desynchronized")
            marker = content[off + 1]
            if marker == 0xFF:  # fill byte
                off += 1
                continue
            if marker in _JPEG_SOF_MARKERS:
                height, width = struct.unpack_from(">HH", content, off + 5)
                n_components = content[off + 9]
                return "image/jpeg", width, height, n_components
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone
                off += 2
                continue
            seg_len = struct.unpack_from(">H", content, off + 2)[0]
            off += 2 + seg_len
        raise ValueError("JPEG payload has no SOF frame header")
    if content[:4] == b"RIFF" and content[8:12] == b"AVI " and len(content) >= 72:
        # geometry lives in the MainAVIHeader inside LIST('hdrl') — the
        # hdrl-only walk (parse_avi_header) never touches the movi frame
        # chunks, so header SNIFFING stays O(header) on large clips and
        # tolerates avih/movi count disagreements (real-world AVIs with
        # audio streams or padding chunks); the strict cross-checking
        # walker is parse_avi_mjpeg, for consumers about to decode
        _, width, height = parse_avi_header(content)
        return "video/x-msvideo", width, height, 1
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        # Walk RIFF chunks — fmt/data need not be adjacent OR ordered in
        # the wild, so collect both before computing frames (a data chunk
        # preceding fmt must not be lost).
        n_channels = sample_rate = block_align = data_size = None
        off = 12
        while off + 8 <= len(content):
            ctype, clen = struct.unpack_from("<4sI", content, off)
            if ctype == b"fmt " and clen >= 16:
                _, n_channels, sample_rate, _, block_align, _ = struct.unpack_from(
                    "<HHIIHH", content, off + 8
                )
            elif ctype == b"data":
                data_size = clen
            off += 8 + clen + (clen & 1)  # RIFF chunks pad to even offsets
        if n_channels is None:
            raise ValueError("WAV payload missing fmt chunk")
        n_frames = (data_size // block_align) if (data_size and block_align) else 0
        return "audio/wav", n_frames, sample_rate, n_channels
    raise ValueError(f"unrecognized media payload (magic={content[:8]!r})")

def decode_header_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real header parse, Arrow-batched."""
    for pdf in batches:
        parsed = pdf["content"].map(lambda b: parse_media_header(bytes(b)))
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": parsed.map(lambda t: t[0]),
                "width": parsed.map(lambda t: t[1]),
                "height": parsed.map(lambda t: t[2]),
                "n_channels": parsed.map(lambda t: t[3]),
                "n_bytes": pdf["content"].map(len),
            }
        )

def decode_media_headers(df: DataFrame) -> DataFrame:
    """Header-level decode of (media_id, content) via magic-byte sniffing +
    struct parsing — real decode, no codec libraries, Arrow-batched."""
    return df.select("media_id", "content").mapInPandas(
        decode_header_batch, schema=DECODED_HEADER_SCHEMA
    )

def attach_media_columns(
    df: DataFrame, id_col: str, payload_col: str, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Wrap an arbitrary source column as an opaque media payload with
    typed metadata — the ingestion edge of the multimodal pipeline.
    ``carry_cols`` ride along untouched (source/partition labels)."""
    content = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(content).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("checksum"),
        *carry_cols,
    )

def _fake_decode(content: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decoder: derives a stable
    (width, height, channels, feature_hash) from the payload bytes."""
    h = hashlib.sha256(content).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 4
    feature_hash = int.from_bytes(h[3:10], "big")
    return width, height, channels, feature_hash

def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow-batched decode. The real implementation
    swaps ``_fake_decode`` for PIL/libav calls — the batch shape, schema,
    and partition behavior stay identical."""
    for pdf in batches:
        decoded = pdf["content"].map(_fake_decode)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "width": decoded.map(lambda t: t[0]),
                "height": decoded.map(lambda t: t[1]),
                "n_channels": decoded.map(lambda t: t[2]),
                "feature_hash": decoded.map(lambda t: t[3]),
            }
        )

def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    Uses the deterministic fake decoder (container has no codecs); swap in
    a real decoder via ``require_codec`` on a production image.
    """
    return df.mapInPandas(fake_decode_batch, schema=DECODED_SCHEMA)

def frame_sample_plan(
    df: DataFrame, n_frames_col: str = "n_frames", sample_count: int = 8
) -> DataFrame:
    """Video frame-sampling plan: pick ``sample_count`` evenly-spaced frame
    indices per clip from its frame count — pure JVM array math
    (``sequence``/``transform``), one row per clip with the index array.
    ``video_frame_stats_batch`` consumes this plan for real on AVI-MJPG
    clips (container parse + sampled-frame JPEG decode); interframe codecs
    (H.264 etc.) route through ``require_codec('av')``.

    Clips shorter than ``sample_count`` keep every frame exactly once.
    """
    n = F.col(n_frames_col)
    take = F.least(n, F.lit(sample_count))
    # floor(i * n / take) for i in [0, take) — the standard uniform stride.
    idx = F.transform(
        F.sequence(F.lit(0), take - 1),
        lambda i: F.floor(i * n / take).cast("int"),
    )
    return df.select(
        "*",
        take.cast("int").alias("n_sampled"),
        F.when(n > 0, idx).otherwise(F.array().cast("array<int>")).alias(
            "frame_indices"
        ),
    )

def resize_plan(df: DataFrame, max_side: int) -> DataFrame:
    """Pure-metadata resize planning (aspect-preserving target dims) — stays
    JVM-side; the byte-level resample is part of the stubbed codec step."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return df.select(
        "*",
        (F.col("width") * scale).cast("int").alias("target_width"),
        (F.col("height") * scale).cast("int").alias("target_height"),
    )

# --- pixel-level PNG decode (pure stdlib: zlib + struct + numpy) -----------
# PNG IDAT is zlib (RFC 1950) and the scanline filters are spec §9 integer
# arithmetic — the raster path needs NO external codec. Baseline-JPEG,
# full-profile progressive JPEG and AVI-MJPG video decode are likewise
# stdlib/numpy (see the sections below): require_codec remains only for
# real-world profiles (subsampled/arithmetic JPEG, interframe video) that
# genuinely need libjpeg/libav.
#
# The encoder below exists so the path is a checked ROUND TRIP rather than
# a parser of its own output's happy path: rasters are deterministic
# arithmetic on (x, y, channel, media_id), rows are filtered with a cycling
# filter type, and the decoder must undo zlib + per-row unfiltering to
# recover pixel statistics that the SQL oracle predicts from the formula
# alone (queries/llmops.py::png_pixel_stats).

PNG_PIXEL_DIM = 24  # max raster side for the synthesized pixel tier

def _pixel_raster(media_id: int, width: int, height: int, channels: int):
    """The deterministic raster: sample(x, y, c) = (3x + 5y + 7c + id) % 256."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    c = np.arange(channels, dtype=np.int64)
    return (
        (3 * x[None, :, None] + 5 * y[:, None, None] + 7 * c[None, None, :] + media_id)
        % 256
    ).astype("uint8")

def png_pixel_geometry(media_id: int) -> tuple[int, int, int]:
    """(width, height, color_type) for the synthesized pixel tier — fixed
    arithmetic the SQL oracle mirrors."""
    width = 1 + media_id * 7 % PNG_PIXEL_DIM
    height = 1 + media_id * 13 % PNG_PIXEL_DIM
    color_type = (0, 2, 4, 6)[media_id // 4 % 4]
    return width, height, color_type

def encode_png_pixels(media_id: int) -> bytes:
    """A complete, valid PNG (signature, IHDR, IDAT, IEND, real CRCs) of
    the deterministic raster. Rows cycle filter types None/Sub/Up so the
    decoder's unfiltering is actually exercised, not just passed through."""
    import numpy as np

    width, height, color_type = png_pixel_geometry(media_id)
    channels = PNG_CHANNELS[color_type]
    raster = _pixel_raster(media_id, width, height, channels)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = []
    prev = np.zeros(width * channels, dtype=np.uint8)
    for yy in range(height):
        flat = raster[yy].reshape(-1)
        ft = yy % 3
        if ft == 0:  # None
            filt = flat
        elif ft == 1:  # Sub: raw[x] - raw[x - bpp]
            shifted = np.concatenate(
                [np.zeros(channels, dtype=np.uint8), flat[:-channels]]
            )
            filt = (flat.astype(np.int16) - shifted.astype(np.int16)) % 256
        else:  # Up: raw[x] - prior_row[x]
            filt = (flat.astype(np.int16) - prev.astype(np.int16)) % 256
        out.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = flat
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )

def _paeth(a: int, b: int, c: int) -> int:
    """PNG spec §9.4 Paeth predictor."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c

def decode_png_pixels(content: bytes):
    """Full raster decode of an 8-bit non-interlaced PNG — pure stdlib.

    Walks chunks (verifying CRCs), inflates the concatenated IDAT stream,
    and undoes all five scanline filters (None/Sub/Up/Average/Paeth).
    Returns a (height, width, channels) uint8 numpy array. Raises
    ValueError on malformed payloads and NotImplementedError for bit
    depths/interlacing outside the supported profile (route those through
    ``require_codec`` on a production image).
    """
    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    off = 8
    ihdr = None
    idat = []
    while off + 8 <= len(content):
        clen, ctype = struct.unpack_from(">I4s", content, off)
        data = content[off + 8 : off + 8 + clen]
        if len(data) != clen:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", content, off + 8 + clen)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        off += 12 + clen
    if ihdr is None:
        raise ValueError("PNG payload has no IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            "stdlib PNG decode supports 8-bit non-interlaced profiles; "
            "use require_codec for others"
        )
    channels = PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"PNG payload with invalid color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for yy in range(height):
        ft = raw[yy * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=yy * (stride + 1) + 1
        ).astype(np.int16)
        up = out[yy - 1].astype(np.int16) if yy else np.zeros(stride, np.int16)
        if ft == 0:  # None
            rec = row
        elif ft == 1:  # Sub — prefix dependency collapses to a cumsum
            rec = row.reshape(-1, bpp).cumsum(axis=0) % 256
            rec = rec.reshape(-1)
        elif ft == 2:  # Up
            rec = (row + up) % 256
        elif ft == 3:  # Average — sequential in x (left is reconstructed)
            rec = np.zeros(stride, np.int16)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (row[i] + (left + up[i]) // 2) % 256
        elif ft == 4:  # Paeth — sequential in x
            rec = np.zeros(stride, np.int16)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(up[i - bpp]) if i >= bpp else 0
                rec[i] = (row[i] + _paeth(left, int(up[i]), ul)) % 256
        else:
            raise ValueError(f"PNG row {yy} has invalid filter type {ft}")
        out[yy] = rec.astype(np.uint8)
    return out.reshape(height, width, channels)

PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("min_sample", IntegerType()),
        StructField("max_sample", IntegerType()),
    ]
)

def png_pixel_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id, content) -> per-image raster stats.

    Geometry comes from the DECODED raster (IHDR + inflate + unfilter),
    never from the generation formula — the formula lives only in the SQL
    oracle, which is what makes the comparison an end-to-end decode check.
    """
    for pdf in batches:
        rows = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            r = decode_png_pixels(bytes(content))
            h, w, ch = r.shape
            flat = r.reshape(-1)
            rows.append(
                (
                    int(mid),
                    w,
                    h,
                    ch,
                    int(flat.size),
                    int(flat.astype("int64").sum()),
                    int(flat.min()),
                    int(flat.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id",
                "width",
                "height",
                "n_channels",
                "n_samples",
                "sum_samples",
                "min_sample",
                "max_sample",
            ],
        )

def synthesize_pixel_png_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete pixel-bearing PNG payload (unlike synthesize_media's
    header-only tier)."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "image/png",
                "content": pdf["media_id"].map(lambda i: encode_png_pixels(int(i))),
            }
        )

def synthesize_pixel_png_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_pixel_png_batch, schema=SYNTH_SCHEMA)

def png_pixel_stats_df(df: DataFrame) -> DataFrame:
    """Arrow-batched raster decode + per-image stats over a (media_id,
    content) frame."""
    return df.select("media_id", "content").mapInPandas(
        png_pixel_stats_batch, schema=PIXEL_STATS_SCHEMA
    )

# --- sample-level WAV PCM decode -------------------------------------------
# The audio analog of the PNG pixel tier above: complete RIFF/WAVE payloads
# carrying a deterministic int16 PCM waveform, decoded by a REAL stdlib
# chunk walk (including an unknown odd-length chunk the parser must skip
# with the RIFF even-byte padding rule). The SQL oracle predicts the same
# sample statistics from the waveform formula alone, so any defect in the
# chunk walk, fmt parse, or PCM frame unpacking breaks the hash.

WAV_PCM_MAX_FRAMES = 200

def wav_pcm_geometry(media_id: int) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) — fixed arithmetic the SQL
    oracle mirrors."""
    return (
        1 + media_id % 2,
        8000 + media_id % 4 * 4000,
        1 + media_id * 11 % WAV_PCM_MAX_FRAMES,
    )

def _wav_pcm_samples(media_id: int, n_frames: int, n_channels: int):
    """The deterministic waveform: s(f, c) = ((13f + 7c + id) % 65536) - 32768."""
    import numpy as np

    f = np.arange(n_frames, dtype=np.int64)
    c = np.arange(n_channels, dtype=np.int64)
    return (
        ((13 * f[:, None] + 7 * c[None, :] + media_id) % 65536) - 32768
    ).astype(np.int16)

def encode_pcm_wav(media_id: int) -> bytes:
    """A complete RIFF/WAVE payload of the deterministic waveform. A 5-byte
    'JUNK' chunk sits between fmt and data (padded to 6 per the RIFF even
    rule) so the decoder's chunk walk is exercised on content it must
    SKIP, not just on the happy-path fmt→data layout."""
    n_channels, sample_rate, n_frames = wav_pcm_geometry(media_id)
    pcm = _wav_pcm_samples(media_id, n_frames, n_channels).tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    junk = struct.pack("<4sI", b"JUNK", 5) + b"skip!" + b"\x00"  # odd→padded
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = fmt + junk + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body

def decode_wav_pcm(content: bytes):
    """Chunk-walking 16-bit PCM WAV decode — pure stdlib + numpy frombuffer.

    Returns (samples, sample_rate) with samples shaped (n_frames,
    n_channels) int16. Unknown chunks are skipped with the RIFF
    even-byte padding rule; malformed payloads raise ValueError; non-PCM
    or non-16-bit streams raise NotImplementedError (route those through
    ``require_codec``).
    """
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    fmt_fields = None
    pcm = None
    while off + 8 <= len(content):
        ctype, clen = struct.unpack_from("<4sI", content, off)
        chunk = content[off + 8 : off + 8 + clen]
        if len(chunk) != clen:
            raise ValueError(f"truncated WAV chunk {ctype!r}")
        if ctype == b"fmt ":
            fmt_fields = struct.unpack_from("<HHIIHH", chunk, 0)
        elif ctype == b"data":
            pcm = chunk
        off += 8 + clen + (clen & 1)  # RIFF pads odd chunks to even
    if fmt_fields is None or pcm is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt_fields
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            "stdlib WAV decode supports 16-bit PCM; use require_codec for "
            "compressed/float streams"
        )
    if len(pcm) % (2 * n_channels):
        raise ValueError("WAV data length not a whole number of frames")
    samples = np.frombuffer(pcm, dtype="<i2").reshape(-1, n_channels)
    return samples, sample_rate

WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("min_sample", IntegerType()),
        StructField("max_sample", IntegerType()),
    ]
)

def wav_sample_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id, content) -> per-clip PCM stats.
    Geometry comes from the DECODED stream, never the generation formula."""
    for pdf in batches:
        rows = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            samples, rate = decode_wav_pcm(bytes(content))
            flat = samples.reshape(-1).astype("int64")
            rows.append(
                (
                    int(mid),
                    int(samples.shape[0]),
                    int(samples.shape[1]),
                    int(rate),
                    int(flat.size),
                    int(flat.sum()),
                    int(flat.min()),
                    int(flat.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id",
                "n_frames",
                "n_channels",
                "sample_rate",
                "n_samples",
                "sum_samples",
                "min_sample",
                "max_sample",
            ],
        )

def synthesize_pcm_wav_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete sample-bearing WAV payload."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "audio/wav",
                "content": pdf["media_id"].map(lambda i: encode_pcm_wav(int(i))),
            }
        )

def synthesize_pcm_wav_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_pcm_wav_batch, schema=SYNTH_SCHEMA)

def wav_sample_stats_df(df: DataFrame) -> DataFrame:
    """Arrow-batched PCM decode + per-clip stats over a (media_id,
    content) frame."""
    return df.select("media_id", "content").mapInPandas(
        wav_sample_stats_batch, schema=WAV_STATS_SCHEMA
    )

# --- baseline JPEG encode/decode (pure stdlib + numpy) ----------------------
# The last still-image require_codec gate, retired (VERDICT r4 stretch #8):
# a complete baseline-DCT JPEG codec — encoder AND decoder — in pure
# Python/numpy. The encoder produces real JFIF streams (DQT, SOF0, DHT with
# canonical fixed-length Huffman tables, SOS, byte-stuffed entropy-coded
# scan); the decoder is a GENERAL baseline decoder: it rebuilds whatever
# Huffman/quant tables the stream declares, entropy-decodes DC prediction +
# AC run-lengths (EOB/ZRL), dequantizes through zigzag order, runs a float
# IDCT, level-shifts, clamps and crops — nothing is keyed to this encoder's
# choices beyond the baseline profile itself (8-bit, 1×1 sampling).
#
# The oracle-facing tier uses BLOCK-CONSTANT rasters: a constant 8×8 block
# has only a DC coefficient (8·(v−128)), and with DC quantization step 8
# the quantized value is exactly v−128 — the decode round trip is EXACT,
# so a SQL oracle can predict decoded pixel statistics from the block
# formula alone while every stage of the codec (bit I/O, byte stuffing,
# Huffman, DC prediction, dequant, IDCT) sits on the hash path. General
# (non-constant) rasters round-trip within normal quantization error and
# are pinned in tests against the encoder's own reconstruction.

JPEG_PIXEL_DIM = 48  # max raster side for the synthesized JPEG pixel tier

#: canonical fixed-length Huffman specs declared in DHT: 12 DC categories
#: at 4 bits (12 < 2^4 keeps the all-ones code unused, per the spec), all
#: 162 baseline AC run/size symbols at 8 bits (162 < 2^8 likewise).
_JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_VALS = (
    [0x00, 0xF0]  # EOB, ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_JPEG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

#: progressive AC table: EOBn symbols (r<<4 | 0 for r = 0..14, T.81 G.1.2.2)
#: join ZRL and the run/size pairs; 176 symbols < 2^8 still fits 8 bits.
_JPEG_AC_VALS_PROG = (
    [r << 4 for r in range(15)]  # EOB1..EOB16384 (r = 0..14)
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_JPEG_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, len(_JPEG_AC_VALS_PROG), 0, 0, 0, 0, 0, 0, 0, 0]


def _jpeg_zigzag() -> list[int]:
    """Zigzag scan order as (row-major index) per zigzag position,
    generated by the diagonal walk so there is nothing to transcribe.

    Direction parity per ITU T.81 Figure 5: the walk leaves (0,0) moving
    RIGHT then descends the first anti-diagonal, i.e. ODD diagonals
    (row+col odd) run top-right → bottom-left and EVEN diagonals run
    bottom-left → top-right. (An inverted parity yields the TRANSPOSED
    table — self-consistent between this encoder/decoder pair but wrong
    against every real-world codec; pinned against the transcribed
    standard table in tests.)"""
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if s - j < 8 and j < 8]
        if s % 2 == 1:
            diag.reverse()
        order.extend(r * 8 + c for r, c in diag)
    return order


_ZIGZAG = _jpeg_zigzag()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_IDCT_BASIS = None


@lru_cache(maxsize=8)
def _huff_codes_cached(bits: tuple, vals: tuple) -> dict[int, tuple[int, int]]:
    return _huff_codes(list(bits), list(vals))


def _idct_matrix():
    """8-point DCT-III basis: B[u, x] = C(u)/2 · cos((2x+1)uπ/16).
    Memoized — codec workers call this once per image."""
    global _IDCT_BASIS
    if _IDCT_BASIS is None:
        import numpy as np

        u = np.arange(8).reshape(-1, 1)
        x = np.arange(8).reshape(1, -1)
        basis = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        basis[0] *= 1 / np.sqrt(2)
        _IDCT_BASIS = basis
    return _IDCT_BASIS


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a DC difference / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def jpeg_pixel_geometry(media_id: int) -> tuple[int, int]:
    """(width, height) for the synthesized JPEG pixel tier — fixed
    arithmetic the SQL oracle mirrors."""
    return 1 + media_id * 7 % JPEG_PIXEL_DIM, 1 + media_id * 13 % JPEG_PIXEL_DIM


def _jpeg_block_raster(media_id: int, width: int, height: int):
    """Block-constant raster: pixel(x, y) = (11·(x//8) + 17·(y//8) + id) % 256
    — the AVI tier's per-frame formula at frame 0 (ONE formula to keep in
    lockstep with the two SQL oracles, not two copies)."""
    return _avi_frame_raster(media_id, 0, width, height)


def _jpeg_forward_blocks(raster, quant: int):
    """Shared forward path for both encoders: level shift, batched per-block
    float DCT-II, zigzag, uniform quantization. Returns (zzq, q, h, w).

    Forward transform for ALL blocks in one batched pass: edge-replicate
    to full 8x8 tiles (keeps constant blocks constant, bounds ringing for
    general rasters), blockize row-major, batched DCT-II, then zigzag +
    uniform quantization vectorized over the whole block stack. The
    orthonormal basis gives exactly the JPEG-normalized FDCT:
    a(u)a(v) = (1/4)C(u)C(v), so G = B f Bᵀ = F. DC step 8 makes constant
    blocks exact.
    """
    import numpy as np

    height, width = raster.shape
    q = np.full(64, quant, dtype=np.int64)
    q[0] = 8
    basis = _idct_matrix()  # orthonormal: DCT-II = basis @ f @ basis.T
    nbh, nbw = -(-height // 8), -(-width // 8)
    f = raster.astype(np.float64) - 128.0
    padded = np.pad(f, ((0, nbh * 8 - height), (0, nbw * 8 - width)), mode="edge")
    blocks = padded.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = basis @ blocks @ basis.T
    # np.round is round-half-even, same as Python round() on floats
    zzq = np.round(coeffs.reshape(-1, 64)[:, _ZIGZAG] / q[None, :]).astype(np.int64)
    return zzq, q, height, width


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, 2 + len(payload)) + payload


def _jpeg_segments(
    q, height: int, width: int, sof_marker: int, ac_bits, ac_vals
) -> tuple[bytes, bytes, bytes]:
    """(DQT, SOFn, DHT) header segments shared by both encoders; the AC
    Huffman table differs (progressive declares the EOBn symbols)."""
    dqt = _jpeg_seg(0xFFDB, bytes([0]) + bytes(int(q[k]) for k in range(64)))
    sof = _jpeg_seg(
        sof_marker,
        struct.pack(">BHHB", 8, height, width, 1) + struct.pack(">BBB", 1, 0x11, 0),
    )
    dht = _jpeg_seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    return dqt, sof, dht


def _put_block(bw: _BitWriter, zz, pred: int, dc_codes, ac_codes) -> int:
    """Entropy-code ONE baseline block (DC difference + AC run-lengths with
    ZRL/EOB); returns the new DC predictor. Shared by the grayscale and the
    4:2:0 MCU-interleaved encoders."""
    import numpy as np

    s, bits = _magnitude_bits(int(zz[0]) - pred)
    pred = int(zz[0])
    bw.put(*dc_codes[s])
    if s:
        bw.put(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        s, bits = _magnitude_bits(int(zz[k]))
        bw.put(*ac_codes[(run << 4) | s])
        bw.put(bits, s)
        run = 0
    if last < 63:
        bw.put(*ac_codes[0x00])  # EOB
    return pred


def _dri_seg(restart_interval: int) -> bytes:
    """DRI segment (T.81 B.2.4.4) declaring the restart interval in MCUs
    (blocks for a non-interleaved single-component scan)."""
    return _jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))


class _RestartWriter:
    """Entropy writer that splits the scan into restart segments: at each
    declared boundary the bit stream byte-aligns (1-fill padding), an
    RSTn marker cycling RST0..RST7 lands between segments (T.81 E.1.4),
    and the caller resets its DC predictors. With interval 0 it degrades
    to one plain _BitWriter."""

    def __init__(self, interval: int) -> None:
        self.interval = interval
        self.parts: list[bytes] = []
        self.bw = _BitWriter()
        self._n = 0  # units (MCUs/blocks) written so far

    def boundary(self) -> bool:
        """Advance the unit counter; True (and emit RSTn) when the NEXT
        unit starts a new restart segment — callers then reset preds."""
        self._n += 1
        if not self.interval or self._n % self.interval != 0:
            return False
        seg = self._n // self.interval - 1
        self.parts.append(self.bw.flush())
        self.parts.append(bytes((0xFF, 0xD0 + seg % 8)))
        self.bw = _BitWriter()
        return True

    def entropy(self) -> bytes:
        tail = self.bw.flush()
        # a boundary emitted right at the end of the scan leaves a
        # trailing RSTn with no following segment — T.81 places restart
        # markers BETWEEN segments only, so drop it
        if not tail and self.parts and self.parts[-1][0:1] == b"\xff":
            self.parts.pop()
        return b"".join(self.parts) + tail


def encode_baseline_jpeg(raster, quant: int = 8, restart_interval: int = 0) -> bytes:
    """Encode an (H, W) uint8 grayscale raster as a baseline JFIF JPEG.

    Full forward path — level shift, per-block float DCT-II, uniform
    quantization (step ``quant``; DC step 8 makes constant blocks exact),
    zigzag, DC-difference prediction, run-length + canonical-Huffman
    entropy coding with byte stuffing. ``restart_interval`` > 0 declares
    a DRI segment and splits the scan into independently-decodable
    restart segments of that many blocks (RSTn between them, DC
    predictor reset per segment) — what libjpeg emits under
    error-resilience settings.
    """
    zzq, q, height, width = _jpeg_forward_blocks(raster, quant)
    dc_codes = _huff_codes_cached(tuple(_JPEG_DC_BITS), tuple(_JPEG_DC_VALS))
    ac_codes = _huff_codes_cached(tuple(_JPEG_AC_BITS), tuple(_JPEG_AC_VALS))

    rw = _RestartWriter(restart_interval)
    pred = 0
    for zz in zzq:
        pred = _put_block(rw.bw, zz, pred, dc_codes, ac_codes)
        if rw.boundary():
            pred = 0

    dqt, sof, dht = _jpeg_segments(
        q, height, width, 0xFFC0, _JPEG_AC_BITS, _JPEG_AC_VALS
    )
    dri = _dri_seg(restart_interval) if restart_interval else b""
    sos = _jpeg_seg(0xFFDA, struct.pack(">BBBBBB", 1, 1, 0x00, 0, 63, 0))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + rw.entropy() + b"\xff\xd9"
    )


def encode_ycbcr_subsampled_jpeg(
    y_raster, cb_sub, cr_sub, h1: int = 2, v1: int = 2, quant: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """Encode a chroma-subsampled YCbCr baseline JFIF JPEG — luma at full
    resolution with sampling factor (h1, v1), chroma planes given at the
    SUBSAMPLED resolution ceil(H/v1) x ceil(W/h1), i.e. the caller is the
    subsampler. (2,2) is 4:2:0, (2,1) is 4:2:2, (1,2) is 4:4:0.

    One MCU-interleaved scan: per (8·h1)x(8·v1) MCU, the h1·v1 luma blocks
    row-major, then Cb, then Cr, with independent DC predictors per
    component. All components share quant table 0 and Huffman tables 0 —
    legal and what the symmetric synthetic tier wants. Luma is edge-padded
    to the MCU grid; chroma to its 8-aligned subsampled grid.
    """
    import numpy as np

    h, w = y_raster.shape
    mch, mcw = -(-h // (8 * v1)), -(-w // (8 * h1))
    ch, cw = -(-h // v1), -(-w // h1)
    if cb_sub.shape != (ch, cw) or cr_sub.shape != (ch, cw):
        raise ValueError(
            f"chroma planes must be subsampled resolution {(ch, cw)}; "
            f"got {cb_sub.shape} / {cr_sub.shape}"
        )
    ypad = np.pad(
        np.asarray(y_raster),
        ((0, mch * 8 * v1 - h), (0, mcw * 8 * h1 - w)),
        mode="edge",
    )
    cbpad = np.pad(
        np.asarray(cb_sub), ((0, mch * 8 - ch), (0, mcw * 8 - cw)), mode="edge"
    )
    crpad = np.pad(
        np.asarray(cr_sub), ((0, mch * 8 - ch), (0, mcw * 8 - cw)), mode="edge"
    )
    zz_y, q, _, _ = _jpeg_forward_blocks(ypad, quant)
    zz_cb, _, _, _ = _jpeg_forward_blocks(cbpad, quant)
    zz_cr, _, _, _ = _jpeg_forward_blocks(crpad, quant)
    dc_codes = _huff_codes_cached(tuple(_JPEG_DC_BITS), tuple(_JPEG_DC_VALS))
    ac_codes = _huff_codes_cached(tuple(_JPEG_AC_BITS), tuple(_JPEG_AC_VALS))

    rw = _RestartWriter(restart_interval)  # interval counts MCUs (E.1.4)
    preds = [0, 0, 0]
    for mcu in range(mch * mcw):
        my, mx = divmod(mcu, mcw)
        bw = rw.bw
        for v in range(v1):
            for u in range(h1):
                bidx = (my * v1 + v) * (mcw * h1) + (mx * h1 + u)
                preds[0] = _put_block(bw, zz_y[bidx], preds[0], dc_codes, ac_codes)
        bidx = my * mcw + mx
        preds[1] = _put_block(bw, zz_cb[bidx], preds[1], dc_codes, ac_codes)
        preds[2] = _put_block(bw, zz_cr[bidx], preds[2], dc_codes, ac_codes)
        if rw.boundary():
            preds = [0, 0, 0]

    dqt = _jpeg_seg(0xFFDB, bytes([0]) + bytes(int(q[k]) for k in range(64)))
    sof = _jpeg_seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + struct.pack(">BBB", 1, (h1 << 4) | v1, 0)
        + struct.pack(">BBB", 2, 0x11, 0)
        + struct.pack(">BBB", 3, 0x11, 0),
    )
    dht = _jpeg_seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = _jpeg_seg(
        0xFFDA,
        bytes([3])
        + bytes([1, 0x00, 2, 0x00, 3, 0x00])
        + struct.pack(">BBB", 0, 63, 0),
    )
    dri = _dri_seg(restart_interval) if restart_interval else b""
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + rw.entropy()
        + b"\xff\xd9"
    )


def encode_ycbcr420_jpeg(
    y_raster, cb_half, cr_half, quant: int = 8, restart_interval: int = 0
) -> bytes:
    """4:2:0 wrapper over the general subsampled encoder (the synthetic
    color tier's profile): 2x2 luma, chroma at ceil-half resolution."""
    return encode_ycbcr_subsampled_jpeg(
        y_raster, cb_half, cr_half, 2, 2, quant,
        restart_interval=restart_interval,
    )


def _layout_forward(width: int, height: int, planes, factors, quant: int):
    """Shared prep for the ARBITRARY-layout encoders: validate each
    component's plane at its true sample dims ceil(H·v_i/vmax) x
    ceil(W·h_i/hmax) (T.81 A.1.1), edge-pad to its MCU-aligned grid
    (mch·8·v_i x mcw·8·h_i), and run the forward block path. Returns
    (zz_list, grid_widths, true_block_dims, (mch, mcw), q)."""
    import numpy as np

    if len(planes) != len(factors) or not factors:
        raise ValueError("one (h, v) factor pair per plane required")
    if any(not (1 <= h <= 4 and 1 <= v <= 4) for h, v in factors):
        raise ValueError("JPEG sampling factors must be 1..4")
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    mch, mcw = -(-height // (8 * vmax)), -(-width // (8 * hmax))
    zz, gws, tdims, q = [], [], [], None
    for (h_i, v_i), plane in zip(factors, planes):
        csh = -(-height * v_i // vmax)
        csw = -(-width * h_i // hmax)
        plane = np.asarray(plane)
        if plane.shape != (csh, csw):
            raise ValueError(
                f"component with factors {(h_i, v_i)} must arrive at its "
                f"true sample dims {(csh, csw)}; got {plane.shape}"
            )
        padded = np.pad(
            plane,
            ((0, mch * 8 * v_i - csh), (0, mcw * 8 * h_i - csw)),
            mode="edge",
        )
        zz_i, q, _, _ = _jpeg_forward_blocks(padded, quant)
        zz.append(zz_i)
        gws.append(mcw * h_i)
        tdims.append((-(-csh // 8), -(-csw // 8)))
    return zz, gws, tdims, (mch, mcw), q


def _layout_headers(
    width: int, height: int, factors, q, sof_marker: int, ac_bits, ac_vals
) -> bytes:
    dqt = _jpeg_seg(0xFFDB, bytes([0]) + bytes(int(q[k]) for k in range(64)))
    sof = _jpeg_seg(
        sof_marker,
        struct.pack(">BHHB", 8, height, width, len(factors))
        + b"".join(
            struct.pack(">BBB", ci + 1, (h << 4) | v, 0)
            for ci, (h, v) in enumerate(factors)
        ),
    )
    dht = _jpeg_seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    return b"\xff\xd8" + dqt + sof + dht


def encode_layout_jpeg(
    width: int,
    height: int,
    planes,
    factors,
    quant: int = 8,
    scan_mode: str = "interleaved",
) -> bytes:
    """Baseline JFIF JPEG with an ARBITRARY sampling layout — dividing or
    NOT (e.g. factors [(3,1),(2,1),(1,1)]); T.81 A.2.3 places no dividing
    requirement on the factors (only the 1..4 range is law). Planes
    arrive at their true sample dims; the decoder reconstructs them with
    the exact index-map upsample full[y][x] = plane[y·v_i//vmax][x·h_i//hmax].

    ``scan_mode``: "interleaved" emits the classic single SOS (per MCU
    each component contributes its h_i x v_i blocks row-major);
    "per_component" emits MULTI-SCAN BASELINE — one non-interleaved SOS
    per component over its TRUE block raster (T.81 A.2.2; the form
    sequential encoders use when an MCU would exceed 10 blocks)."""
    zz, gws, tdims, (mch, mcw), q = _layout_forward(
        width, height, planes, factors, quant
    )
    dc_codes = _huff_codes_cached(tuple(_JPEG_DC_BITS), tuple(_JPEG_DC_VALS))
    ac_codes = _huff_codes_cached(tuple(_JPEG_AC_BITS), tuple(_JPEG_AC_VALS))
    head = _layout_headers(
        width, height, factors, q, 0xFFC0, _JPEG_AC_BITS, _JPEG_AC_VALS
    )
    if scan_mode == "per_component":
        scans = []
        for ci in range(len(factors)):
            bw = _BitWriter()
            pred = 0
            cbh, cbw = tdims[ci]
            for by in range(cbh):
                for bx in range(cbw):
                    pred = _put_block(
                        bw,
                        zz[ci][by * gws[ci] + bx],
                        pred,
                        dc_codes,
                        ac_codes,
                    )
            scans.append(
                _jpeg_seg(
                    0xFFDA,
                    bytes([1, ci + 1, 0x00]) + struct.pack(">BBB", 0, 63, 0),
                )
                + bw.flush()
            )
        return head + b"".join(scans) + b"\xff\xd9"
    if scan_mode != "interleaved":
        raise ValueError(f"unknown scan_mode {scan_mode!r}")
    bw = _BitWriter()
    preds = [0] * len(factors)
    for mcu in range(mch * mcw):
        my, mx = divmod(mcu, mcw)
        for ci, (h_i, v_i) in enumerate(factors):
            for v in range(v_i):
                for u in range(h_i):
                    bidx = (my * v_i + v) * gws[ci] + (mx * h_i + u)
                    preds[ci] = _put_block(
                        bw, zz[ci][bidx], preds[ci], dc_codes, ac_codes
                    )
    sos = _jpeg_seg(
        0xFFDA,
        bytes([len(factors)])
        + b"".join(bytes([ci + 1, 0x00]) for ci in range(len(factors)))
        + struct.pack(">BBB", 0, 63, 0),
    )
    return head + sos + bw.flush() + b"\xff\xd9"


def encode_progressive_layout_jpeg(
    width: int,
    height: int,
    planes,
    factors,
    quant: int = 8,
    ac_bands: tuple = ((1, 63),),
    dc_al: int = 0,
    ac_al: int = 0,
) -> bytes:
    """PROGRESSIVE (SOF2) JFIF JPEG with an ARBITRARY sampling layout.
    Scan script: one INTERLEAVED DC scan over the frame-level MCU lattice
    (per MCU: each component's h_i x v_i blocks row-major), per-component
    NON-INTERLEAVED AC band scans covering each component's TRUE block
    raster (T.81 A.2.2 — MCU padding travels only in interleaved scans),
    then DC refinement bit planes (interleaved raw bits) and AC
    refinement planes per component per band."""
    bands = list(ac_bands)
    if any(not 1 <= lo <= hi <= 63 for lo, hi in bands):
        raise ValueError("ac_bands must be within [1, 63] with lo <= hi")
    if any(nxt != hi + 1 for (_, hi), (nxt, _) in zip(bands, bands[1:])):
        raise ValueError("ac_bands must be contiguous and ordered")
    if not bands or bands[0][0] != 1 or bands[-1][1] != 63:
        raise ValueError("ac_bands must cover 1..63")
    if not 0 <= dc_al <= 13 or not 0 <= ac_al <= 13:
        raise ValueError("approximation levels must be within [0, 13]")
    zz, gws, tdims, (mch, mcw), q = _layout_forward(
        width, height, planes, factors, quant
    )
    ncomp = len(factors)
    scan_rows = []
    for ci in range(ncomp):
        cbh, cbw = tdims[ci]
        gw = gws[ci]
        idx = [by * gw + bx for by in range(cbh) for bx in range(cbw)]
        scan_rows.append(zz[ci][idx])
    dc_codes = _huff_codes_cached(tuple(_JPEG_DC_BITS), tuple(_JPEG_DC_VALS))
    ac_codes = _huff_codes_cached(
        tuple(_JPEG_AC_BITS_PROG), tuple(_JPEG_AC_VALS_PROG)
    )

    def _mcu_blocks():
        for mcu in range(mch * mcw):
            my, mx = divmod(mcu, mcw)
            for ci, (h_i, v_i) in enumerate(factors):
                for v in range(v_i):
                    for u in range(h_i):
                        yield ci, (my * v_i + v) * gws[ci] + (mx * h_i + u)

    def _dc_sos(ah: int, al: int) -> bytes:
        return _jpeg_seg(
            0xFFDA,
            bytes([ncomp])
            + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
            + struct.pack(">BBB", 0, 0, (ah << 4) | al),
        )

    def _ac_sos(cid: int, lo: int, hi: int, ah: int, al: int) -> bytes:
        return _jpeg_seg(
            0xFFDA,
            bytes([1, cid, 0x00]) + struct.pack(">BBB", lo, hi, (ah << 4) | al),
        )

    # scan 1: interleaved DC first at Al=dc_al
    bw = _BitWriter()
    preds = [0] * ncomp
    for ci, bidx in _mcu_blocks():
        val = int(zz[ci][bidx][0]) >> dc_al
        sz, bits = _magnitude_bits(val - preds[ci])
        preds[ci] = val
        bw.put(*dc_codes[sz])
        if sz:
            bw.put(bits, sz)
    scans = [_dc_sos(0, dc_al) + bw.flush()]

    # AC first scans: per component, per band (non-interleaved)
    for ci in range(ncomp):
        for lo, hi in bands:
            scans.append(
                _ac_sos(ci + 1, lo, hi, 0, ac_al)
                + _encode_ac_first_scan(scan_rows[ci], lo, hi, ac_al, ac_codes)
            )

    # DC refinement planes: interleaved, one raw bit per block
    for al in range(dc_al - 1, -1, -1):
        bwr = _BitWriter()
        for ci, bidx in _mcu_blocks():
            bwr.put((int(zz[ci][bidx][0]) >> al) & 1, 1)
        scans.append(_dc_sos(al + 1, al) + bwr.flush())

    # AC refinement planes, per component per band
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for lo, hi in bands:
                scans.append(
                    _ac_sos(ci + 1, lo, hi, al + 1, al)
                    + _encode_ac_refine_scan(scan_rows[ci], lo, hi, al, ac_codes)
                )

    head = _layout_headers(
        width, height, factors, q, 0xFFC2, _JPEG_AC_BITS_PROG, _JPEG_AC_VALS_PROG
    )
    return head + b"".join(scans) + b"\xff\xd9"


def _encode_ac_first_scan(zzq, lo: int, hi: int, al: int, ac_codes) -> bytes:
    """One progressive AC 'first' scan (Ah=0) over band ``lo..hi`` at
    approximation level ``al`` (T.81 G.1.2.2): coefficients enter at the
    point-transformed magnitude sign·(|v| >> al); zero runs and all-zero
    band tails collapse into EOBn runs."""
    import numpy as np

    bw = _BitWriter()
    eobrun = 0

    def flush_eobrun() -> None:
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        bw.put(*ac_codes[r << 4])
        if r:
            bw.put(eobrun - (1 << r), r)
        eobrun = 0

    for zz in zzq:
        band = zz[lo : hi + 1]
        shifted = np.sign(band) * (np.abs(band) >> al)
        nz = np.nonzero(shifted)[0]
        if len(nz) == 0:
            eobrun += 1
            if eobrun == 0x7FFF:  # EOBn category cap (r <= 14)
                flush_eobrun()
            continue
        flush_eobrun()
        run = 0
        last = int(nz[-1])
        for k in range(last + 1):
            if shifted[k] == 0:
                run += 1
                continue
            while run > 15:
                bw.put(*ac_codes[0xF0])  # ZRL
                run -= 16
            sz, bits = _magnitude_bits(int(shifted[k]))
            bw.put(*ac_codes[(run << 4) | sz])
            bw.put(bits, sz)
            run = 0
        if last < hi - lo:
            eobrun += 1  # this block's band ends early — new EOB run
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()
    return bw.flush()


def _encode_ac_refine_scan(zzq, lo: int, hi: int, al: int, ac_codes) -> bytes:
    """One progressive AC REFINEMENT scan (Ah=al+1, Al=al) over band
    ``lo..hi`` — ITU T.81 G.1.2.3 (the libjpeg encode_mcu_AC_refine
    shape): coefficients whose point-transformed magnitude |v| >> al is
    - 0 extend the current zero run,
    - 1 are NEWLY significant: Huffman (run<<4)|1 + one sign bit,
    - >1 have history: exactly one raw correction bit (bit al of |v|),
      buffered and appended after the next emitted symbol (or carried
      into the EOBn flush when the block ends in an EOB run).
    Zero runs past 15 emit ZRL only up to the block's last newly
    significant coefficient; everything after it joins the EOB run.
    """
    bw = _BitWriter()
    eobrun = 0
    be: list[int] = []  # correction bits riding the pending EOBn

    def flush_eobrun() -> None:
        nonlocal eobrun, be
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        bw.put(*ac_codes[r << 4])
        if r:
            bw.put(eobrun - (1 << r), r)
        eobrun = 0
        for b in be:
            bw.put(b, 1)
        be = []

    for zz in zzq:
        absv = [abs(int(zz[k])) >> al for k in range(lo, hi + 1)]
        # EOB position: the LAST newly-significant coefficient — zeros and
        # history coefficients beyond it fold into the EOB run (their
        # correction bits ride the EOBn flush), so ZRLs are never emitted
        # past it
        eob_i = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob_i = i
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # a 16+ zero-history run flushes as ZRLs at ANY nonzero
            # coefficient (history included — the decoder's run advance
            # reads its correction bit while passing it), but never past
            # the EOB position
            while r > 15 and i <= eob_i:
                flush_eobrun()
                bw.put(*ac_codes[0xF0])
                r -= 16
                for b in br:
                    bw.put(b, 1)
                br = []
            if t > 1:  # history coefficient: buffer its correction bit
                br.append(t & 1)
                continue
            # newly significant (t == 1)
            flush_eobrun()
            bw.put(*ac_codes[(r << 4) | 1])
            bw.put(0 if int(zz[lo + i]) < 0 else 1, 1)
            for b in br:
                bw.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            # flush before the EOBn category or the correction-bit
            # buffer can overflow (libjpeg's MAX_CORR_BITS discipline)
            if eobrun == 0x7FFF or len(be) > 937 - 64:
                flush_eobrun()
    flush_eobrun()
    return bw.flush()


def encode_progressive_jpeg(
    raster,
    quant: int = 8,
    ac_bands: tuple = ((1, 63),),
    dc_al: int = 0,
    ac_al: int = 0,
) -> bytes:
    """Encode an (H, W) uint8 grayscale raster as a PROGRESSIVE (SOF2)
    JFIF JPEG. Scan script: one DC scan (Ss=Se=0), then one AC scan per
    ``ac_bands`` entry (default: the whole 1..63 band in one scan;
    production encoders typically split, e.g. ((1, 5), (6, 63))) —
    spectral selection, ITU T.81 Annex G.

    ``dc_al``/``ac_al`` add SUCCESSIVE APPROXIMATION on top (G.1.2.3,
    the full Annex G profile): first scans carry the point-transformed
    coefficients (DC: arithmetic shift by ``dc_al``; AC: magnitude shift
    at ``ac_al``), followed by one refinement scan per remaining bit
    plane (Ah=al+1, Al=al down to 0) — raw DC bits, and the
    run/newly-significant/correction-bit AC refinement coding. With both
    at 0 (default) the stream is spectral-selection-only. All scans are
    emitted, so decoding is always coefficient-exact vs baseline.

    AC scans use progressive EOBn coding: runs of blocks whose band is
    entirely zero collapse into one EOBRUN symbol (category r, r appended
    bits), so block-constant rasters compress each AC band into a few
    bytes — and the decoder's EOBRUN path is exercised end-to-end.
    """
    bands = list(ac_bands)
    if any(not 1 <= lo <= hi <= 63 for lo, hi in bands):
        raise ValueError("ac_bands must be within [1, 63] with lo <= hi")
    if any(nxt != hi + 1 for (_, hi), (nxt, _) in zip(bands, bands[1:])):
        raise ValueError("ac_bands must be contiguous and ordered")
    if not bands or bands[0][0] != 1 or bands[-1][1] != 63:
        raise ValueError("ac_bands must cover 1..63")
    if not 0 <= dc_al <= 13 or not 0 <= ac_al <= 13:
        raise ValueError("approximation levels must be within [0, 13]")
    zzq, q, height, width = _jpeg_forward_blocks(raster, quant)
    dc_codes = _huff_codes_cached(tuple(_JPEG_DC_BITS), tuple(_JPEG_DC_VALS))
    ac_codes = _huff_codes_cached(
        tuple(_JPEG_AC_BITS_PROG), tuple(_JPEG_AC_VALS_PROG)
    )

    # Scan 1: DC first, Ss=0 Se=0 Ah=0 Al=dc_al — baseline-shaped DIFF
    # coding of the arithmetic-shifted DC values.
    bw1 = _BitWriter()
    pred = 0
    for zz in zzq:
        v = int(zz[0]) >> dc_al  # python >> on int is the arithmetic shift
        sz, bits = _magnitude_bits(v - pred)
        pred = v
        bw1.put(*dc_codes[sz])
        if sz:
            bw1.put(bits, sz)
    scans = [
        _jpeg_seg(0xFFDA, struct.pack(">BBBBBB", 1, 1, 0x00, 0, 0, dc_al))
        + bw1.flush()
    ]

    for lo, hi in bands:
        scans.append(
            _jpeg_seg(0xFFDA, struct.pack(">BBBBBB", 1, 1, 0x00, lo, hi, ac_al))
            + _encode_ac_first_scan(zzq, lo, hi, ac_al, ac_codes)
        )

    # DC refinement scans: one raw bit per block per plane (G.1.2.1).
    for al in range(dc_al - 1, -1, -1):
        bwr = _BitWriter()
        for zz in zzq:
            bwr.put((int(zz[0]) >> al) & 1, 1)
        scans.append(
            _jpeg_seg(
                0xFFDA,
                struct.pack(">BBBBBB", 1, 1, 0x00, 0, 0, ((al + 1) << 4) | al),
            )
            + bwr.flush()
        )

    # AC refinement scans, one bit plane at a time, band by band.
    for al in range(ac_al - 1, -1, -1):
        for lo, hi in bands:
            scans.append(
                _jpeg_seg(
                    0xFFDA,
                    struct.pack(
                        ">BBBBBB", 1, 1, 0x00, lo, hi, ((al + 1) << 4) | al
                    ),
                )
                + _encode_ac_refine_scan(zzq, lo, hi, al, ac_codes)
            )

    dqt, sof, dht = _jpeg_segments(
        q, height, width, 0xFFC2, _JPEG_AC_BITS_PROG, _JPEG_AC_VALS_PROG
    )
    return b"\xff\xd8" + dqt + sof + dht + b"".join(scans) + b"\xff\xd9"


def encode_progressive_ycbcr_jpeg(
    y_raster,
    cb_sub,
    cr_sub,
    h1: int = 2,
    v1: int = 2,
    quant: int = 8,
    ac_bands: tuple = ((1, 63),),
    dc_al: int = 0,
    ac_al: int = 0,
) -> bytes:
    """PROGRESSIVE (SOF2) chroma-subsampled YCbCr JFIF JPEG — the
    3-component luma-subsampled profile (the composition that retired the
    progressive-with-subsampling gate), now a thin wrapper over the
    ARBITRARY-layout progressive encoder. Chroma planes arrive at the
    subsampled resolution ceil(H/v1) x ceil(W/h1), caller-subsampled,
    exactly like encode_ycbcr_subsampled_jpeg."""
    h, w = y_raster.shape
    return encode_progressive_layout_jpeg(
        w,
        h,
        [y_raster, cb_sub, cr_sub],
        [(h1, v1), (1, 1), (1, 1)],
        quant,
        ac_bands,
        dc_al,
        ac_al,
    )


class _BitReader:
    """Accumulator bit reader over byte-stuffed JPEG entropy data.

    Refills lazily and only as far as a read needs, so the byte cursor
    never runs ahead of the logical bit position by more than the peek
    window; a 0xFF followed by an RSTn marker stops the refill (instead
    of raising) so 16-bit Huffman peeks near a restart boundary pad with
    zeros and the byte-aligned marker skip in the scan loop still finds
    ``data[pos] == 0xFF``.
    """

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        data, ln = self.data, len(self.data)
        while self.n < need:
            if self.pos >= ln:
                return
            byte = data[self.pos]
            if byte == 0xFF:
                nxt = data[self.pos + 1] if self.pos + 1 < ln else None
                if nxt == 0x00:
                    self.pos += 2  # unstuff
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: end of this entropy segment
                else:
                    raise ValueError("unexpected marker inside entropy data")
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, count: int) -> int:
        if count == 0:
            return 0
        if self.n < count:
            self._fill(count)
            if self.n < count:
                raise ValueError("JPEG entropy stream exhausted")
        self.n -= count
        v = (self.acc >> self.n) & ((1 << count) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def peek16(self) -> int:
        self._fill(16)
        if self.n >= 16:
            return (self.acc >> (self.n - 16)) & 0xFFFF
        return (self.acc << (16 - self.n)) & 0xFFFF

    def skip_restart(self, expected: int | None = None) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary —
        shared by every scan loop (baseline, progressive DC, progressive
        AC); per-scan decode state (DC predictors, EOB runs) is the
        caller's to reset.

        Strict (T.81 E.1.4): a declared restart interval PROMISES a
        marker between segments, so a missing or non-RST marker here
        means the entropy data is corrupt — raise loudly rather than
        silently misattributing the next segment's bits. ``expected``
        (0..7) additionally verifies the modulo-8 marker sequence, the
        resynchronization check libjpeg performs: an out-of-order RSTn
        indicates a dropped or duplicated segment."""
        self.n = 0
        if not (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            got = self.data[self.pos : self.pos + 2].hex() or "<eof>"
            raise ValueError(
                f"corrupt JPEG: expected RSTn at restart boundary, got {got}"
            )
        if expected is not None:
            n = self.data[self.pos + 1] - 0xD0
            if n != expected % 8:
                raise ValueError(
                    f"corrupt JPEG: restart marker out of sequence — got "
                    f"RST{n}, expected RST{expected % 8} (dropped or "
                    "duplicated restart segment)"
                )
        self.pos += 2


@lru_cache(maxsize=64)
def _huff_lut(bits: tuple, vals: tuple) -> tuple[list[int], list[int]]:
    """16-bit-lookahead decode tables for one canonical Huffman table:
    (symbol, code length) per possible 16-bit window, length 0 = invalid
    code. Cached per declared table spec — JPEG streams from the same
    producer redeclare identical DHT segments per image."""
    import numpy as np

    sym = np.zeros(1 << 16, dtype=np.int32)
    lng = np.zeros(1 << 16, dtype=np.int32)
    for symbol, (code, length) in _huff_codes(list(bits), list(vals)).items():
        start = code << (16 - length)
        count = 1 << (16 - length)
        sym[start : start + count] = symbol
        lng[start : start + count] = length
    return sym.tolist(), lng.tolist()


def _huff_decode(reader: _BitReader, table: tuple[list[int], list[int]]) -> int:
    sym, lng = table
    v = reader.peek16()
    length = lng[v]
    if length == 0:
        raise ValueError("invalid Huffman code in JPEG scan")
    reader.bits(length)  # consume exactly the matched code
    return sym[v]


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _decode_block(reader: _BitReader, dc_tab, ac_tab, zz, pred: int) -> int:
    """Entropy-decode ONE baseline block into ``zz`` (DC prediction + AC
    run-lengths with EOB/ZRL); returns the updated DC predictor. Shared by
    the 4:4:4 per-block loop and the 4:2:0 MCU-interleaved loop."""
    sz = _huff_decode(reader, dc_tab)
    diff = _extend(reader.bits(sz), sz) if sz else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        if k > 63:
            raise ValueError("AC run past end of block")
        size = rs & 0x0F
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    return pred


def decode_baseline_jpeg(content: bytes):
    """Full raster decode of a baseline (SOF0) JPEG — pure stdlib + numpy.

    General within the Huffman-DCT profiles: parses DQT/DHT/SOF/DRI/SOS
    segments, rebuilds the declared canonical Huffman tables, entropy-
    decodes interleaved MCUs (DC prediction, AC run-lengths, EOB/ZRL,
    restart markers), dequantizes through zigzag order, applies the float
    2-D IDCT, level-shifts, clamps and crops. Baseline (SOF0/1) AND the
    full Annex G progressive profile (SOF2: any DC/AC band scan script
    with EOBn runs, spectral selection AND successive-approximation
    first/refinement scans) are supported. Sampling: ANY factor layout
    in T.81's legal 1..4 range — dividing (4:2:0, 4:2:2, 4:4:0, 4:1:1)
    or not — for both BASELINE and PROGRESSIVE streams: interleaved scans walk
    the frame-level MCU lattice with h_i x v_i blocks per component,
    non-interleaved (progressive AC / single-component DC) scans walk
    each component's TRUE block raster mapped into its padded grid
    (T.81 A.2.2/A.2.3), nearest-neighbor chroma upsample to full
    resolution (no color transform: components return as coded, so a
    YCbCr stream yields YCbCr planes; non-dividing factors upsample by
    the exact nearest index map full[y][x] = plane[y·v/vmax][x·h/hmax]).
    The remaining honest gates are non-Huffman/non-8-bit profiles
    (NotImplementedError). Grayscale returns (H, W), multi-component
    (H, W, C); ValueError on malformed streams.
    """
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None  # (height, width, [(comp_id, tq)])
    restart_interval = 0
    progressive = False
    scanned = False
    zzs: list = []
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        payload = content[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"DQT precision field must be 0/1, got {pq}")
                if pq:  # Pq=1: 16-bit big-endian entries (T.81 B.2.4.1)
                    qtables[tq] = [
                        (payload[off + 1 + 2 * k] << 8)
                        | payload[off + 2 + 2 * k]
                        for k in range(64)
                    ]
                    off += 129
                else:
                    qtables[tq] = list(payload[off + 1 : off + 65])
                    off += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0x0F
                bits = tuple(payload[off + 1 : off + 17])
                nvals = sum(bits)
                vals = tuple(payload[off + 17 : off + 17 + nvals])
                htables[(tc, th)] = _huff_lut(bits, vals)
                off += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit DCT JPEG supported")
            comps = []
            samplings = []
            for i in range(ncomp):
                cid, sampling, tq = struct.unpack_from(">BBB", payload, 6 + 3 * i)
                comps.append((cid, tq))
                samplings.append(sampling)
            hs = [s >> 4 for s in samplings]
            vs = [s & 0x0F for s in samplings]
            if any(not (1 <= h <= 4 and 1 <= v <= 4) for h, v in zip(hs, vs)):
                raise ValueError("JPEG sampling factors must be 1..4")
            # a single-component scan ignores sampling for MCU structure
            # (T.81: non-interleaved MCU = 1 block), so only multi-
            # component frames take the general MCU-interleaved path
            subsampled = len(comps) > 1 and any(s != 0x11 for s in samplings)
            hmax, vmax = max(hs), max(vs)
            frame = (height, width, comps, subsampled, hs, vs)
            progressive = marker == 0xC2
            # per-component block grids: equal-sampling frames share one
            # ceil/8 grid; subsampled frames give component i an
            # (mch·v_i) x (mcw·h_i) grid over the 8·hmax/8·vmax-aligned
            # MCU lattice (the general T.81 A.2.3 layout — 4:2:0, 4:2:2,
            # 4:4:0, 4:1:1 ... anything with dividing factors)
            if subsampled:
                mcw = -(-width // (8 * hmax))
                mch = -(-height // (8 * vmax))
                mcu_dims = (mch, mcw)
                grids = [(mch * v, mcw * h) for h, v in zip(hs, vs)]
                # non-interleaved scans (all progressive AC scans; DC
                # scans with ns=1) cover only the component's TRUE block
                # raster — ceil(ceil(dim·f/fmax)/8), T.81 A.2.2 — which
                # the MCU-padded grid may exceed by trailing block
                # rows/cols; scan order maps through by·gw + bx
                true_blocks = []
                for h, v in zip(hs, vs):
                    csh = -(-height * v // vmax)
                    csw = -(-width * h // hmax)
                    true_blocks.append((-(-csh // 8), -(-csw // 8)))
            else:
                nbw, nbh = -(-width // 8), -(-height // 8)
                mcu_dims = (nbh, nbw)
                grids = [(nbh, nbw)] * len(comps)
                true_blocks = [(nbh, nbw)] * len(comps)
            # raw (unquantized) zigzag coefficients per component, blocks
            # row-major; scans accumulate here, dequant + IDCT run once at
            # the end (progressive spectral selection fills the bands
            # scan by scan)
            zzs = [np.zeros((gh * gw, 64), dtype=np.int64) for gh, gw in grids]
        elif marker in _JPEG_SOF_MARKERS:  # arithmetic / lossless / hierarchical
            raise NotImplementedError("non-DCT-Huffman JPEG profile")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF frame header")
            ns = payload[0]
            scan_tables = {}
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah, al = payload[3 + 2 * ns] >> 4, payload[3 + 2 * ns] & 0x0F
            height, width, comps, subsampled, hs, vs = frame
            cindex = {cid: i for i, (cid, _) in enumerate(comps)}
            # locate end of entropy data: next non-RST marker
            end = pos
            while end + 1 < len(content):
                if content[end] == 0xFF and content[end + 1] not in (0x00,) and not (
                    0xD0 <= content[end + 1] <= 0xD7
                ):
                    break
                end += 1
            data = content[pos:end]
            reader = _BitReader(data)
            nblocks = zzs[0].shape[0]

            def _scan_blocks(ci):
                """Block indices of one component's NON-INTERLEAVED scan:
                its true (unpadded) block raster mapped into the padded
                grid (identity when the frame isn't subsampled)."""
                gw = grids[ci][1]
                cbh, cbw = true_blocks[ci]
                for by in range(cbh):
                    for bx in range(cbw):
                        yield by * gw + bx
            if not progressive:
                if ah or al:
                    raise ValueError("baseline scan with approximation bits")
                unknown = [cs for cs in scan_tables if cs not in cindex]
                if unknown:
                    raise ValueError(f"SOS references unknown components {unknown}")
                if ns > 1:
                    # interleaved scan over the frame-level MCU lattice
                    # (T.81 A.2.3): any subset of the frame's components,
                    # each contributing its h_i x v_i blocks row-major per
                    # MCU (one block each for equal sampling); the classic
                    # single-scan baseline is the all-components case.
                    # Restart interval counts MCUs.
                    scomps = [(cindex[cs], scan_tables[cs]) for cs in scan_tables]
                    preds = [0] * len(scomps)
                    mch, mcw = mcu_dims
                    for mcu in range(mch * mcw):
                        if restart_interval and mcu and mcu % restart_interval == 0:
                            reader.skip_restart(mcu // restart_interval - 1)
                            preds = [0] * len(scomps)
                        my, mx = divmod(mcu, mcw)
                        for si, (ci, (td, ta)) in enumerate(scomps):
                            dc_tab = htables[(0, td)]
                            ac_tab = htables[(1, ta)]
                            h_i, v_i = hs[ci], vs[ci]
                            gw = grids[ci][1]
                            for v in range(v_i):
                                for u in range(h_i):
                                    bidx = (my * v_i + v) * gw + (mx * h_i + u)
                                    preds[si] = _decode_block(
                                        reader, dc_tab, ac_tab,
                                        zzs[ci][bidx], preds[si],
                                    )
                else:
                    # non-interleaved baseline scan (multi-scan baseline:
                    # one component per SOS): the component's TRUE block
                    # raster (T.81 A.2.2); restart interval counts blocks
                    (cs,) = scan_tables
                    ci = cindex[cs]
                    td, ta = scan_tables[cs]
                    pred = 0
                    for n, bidx in enumerate(_scan_blocks(ci)):
                        if restart_interval and n and n % restart_interval == 0:
                            reader.skip_restart(n // restart_interval - 1)
                            pred = 0
                        pred = _decode_block(
                            reader, htables[(0, td)], htables[(1, ta)],
                            zzs[ci][bidx], pred,
                        )
                scanned = True
            else:
                # Progressive: spectral selection (Ah=0) PLUS successive
                # approximation (Ah>0 refinement scans; ITU T.81 Annex G /
                # the libjpeg decode_mcu_*_refine shape). First scans
                # enter coefficients at the point-transformed precision
                # (value << Al); each refinement scan restores one bit
                # plane, so a complete scan script reconstructs the exact
                # coefficients and a truncated one is a legal coarse
                # preview.
                if ss == 0:
                    # DC scan: interleaved (ns > 1) walks the frame-level
                    # MCU lattice with each scan component contributing
                    # its h_i x v_i blocks (T.81 A.2.3 — for equal
                    # sampling this degenerates to one block per MCU);
                    # single-component DC scans are non-interleaved and
                    # walk the component's true block raster
                    if se != 0:
                        raise ValueError("progressive DC scan with Se != 0")
                    scomps = [(cindex[cs], scan_tables[cs][0]) for cs in scan_tables]
                    p1 = 1 << al
                    if ns > 1:
                        mch, mcw = mcu_dims
                        preds = [0] * len(scomps)
                        for mcu in range(mch * mcw):
                            if restart_interval and mcu and mcu % restart_interval == 0:
                                reader.skip_restart(mcu // restart_interval - 1)
                                preds = [0] * len(scomps)
                            my, mx = divmod(mcu, mcw)
                            for si, (ci, td) in enumerate(scomps):
                                h_i, v_i = hs[ci], vs[ci]
                                gw = grids[ci][1]
                                for v in range(v_i):
                                    for u in range(h_i):
                                        bidx = (my * v_i + v) * gw + (mx * h_i + u)
                                        if ah == 0:
                                            sz = _huff_decode(reader, htables[(0, td)])
                                            diff = (
                                                _extend(reader.bits(sz), sz)
                                                if sz
                                                else 0
                                            )
                                            preds[si] += diff
                                            zzs[ci][bidx][0] = preds[si] << al
                                        elif reader.bit():
                                            # refinement: one raw bit; bit
                                            # Al is clear by the multiple-
                                            # of-2^(Al+1) invariant, so OR
                                            # completes either sign
                                            zzs[ci][bidx][0] = (
                                                int(zzs[ci][bidx][0]) | p1
                                            )
                    else:
                        ((ci, td),) = scomps
                        pred = 0
                        for n, bidx in enumerate(_scan_blocks(ci)):
                            if restart_interval and n and n % restart_interval == 0:
                                reader.skip_restart(n // restart_interval - 1)
                                pred = 0
                            if ah == 0:
                                sz = _huff_decode(reader, htables[(0, td)])
                                diff = _extend(reader.bits(sz), sz) if sz else 0
                                pred += diff
                                zzs[ci][bidx][0] = pred << al
                            elif reader.bit():
                                zzs[ci][bidx][0] = int(zzs[ci][bidx][0]) | p1
                else:
                    # AC band scan: always single-component, with EOBn runs
                    if ns != 1:
                        raise ValueError("progressive AC scan must be single-component")
                    (cs,) = scan_tables
                    ci = cindex[cs]
                    ac_tab = htables[(1, scan_tables[cs][1])]
                    eobrun = 0
                    if ah == 0:
                        for n, blk in enumerate(_scan_blocks(ci)):
                            if restart_interval and n and n % restart_interval == 0:
                                reader.skip_restart(n // restart_interval - 1)
                                eobrun = 0
                            if eobrun:
                                eobrun -= 1
                                continue
                            zz = zzs[ci][blk]
                            k = ss
                            while k <= se:
                                rs = _huff_decode(reader, ac_tab)
                                r, size = rs >> 4, rs & 0x0F
                                if size == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    # EOBn: run of 2^r + bits blocks ends
                                    # here, this block included
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += reader.bits(r)
                                    break
                                k += r
                                if k > se:
                                    raise ValueError("AC run past end of band")
                                zz[k] = _extend(reader.bits(size), size) << al
                                k += 1
                    else:
                        # AC refinement (G.2): newly-significant
                        # coefficients arrive as ±2^Al; every coefficient
                        # with history read over — by a run, a ZRL, or the
                        # EOB-run tail — consumes one correction bit
                        p1, m1 = 1 << al, -(1 << al)
                        for n, blk in enumerate(_scan_blocks(ci)):
                            if restart_interval and n and n % restart_interval == 0:
                                reader.skip_restart(n // restart_interval - 1)
                                eobrun = 0
                            zz = zzs[ci][blk]
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = _huff_decode(reader, ac_tab)
                                    r, size = rs >> 4, rs & 0x0F
                                    sval = 0
                                    if size:
                                        if size != 1:
                                            raise ValueError(
                                                "AC refinement size must be 1"
                                            )
                                        sval = p1 if reader.bit() else m1
                                    elif r != 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += reader.bits(r)
                                        break
                                    # else ZRL: skip 16 zero-history coeffs
                                    while k <= se:
                                        if zz[k] != 0:
                                            if reader.bit() and not (
                                                int(zz[k]) & p1
                                            ):
                                                zz[k] += p1 if zz[k] > 0 else m1
                                        else:
                                            r -= 1
                                            if r < 0:
                                                break
                                        k += 1
                                    if sval:
                                        if k > se:
                                            raise ValueError(
                                                "AC refinement run past band"
                                            )
                                        zz[k] = sval
                                    k += 1
                            if eobrun:
                                while k <= se:
                                    if zz[k] != 0:
                                        if reader.bit() and not (int(zz[k]) & p1):
                                            zz[k] += p1 if zz[k] > 0 else m1
                                    k += 1
                                eobrun -= 1
                scanned = True
            pos = end
            continue
        elif marker == 0xD9:  # EOI
            break
        # APPn / COM / anything else: skipped via seglen
    if frame is None or not scanned:
        raise ValueError("JPEG payload has no SOS scan")
    height, width, comps, subsampled, hs, vs = frame
    basis = _idct_matrix()
    planes = []
    for (cid, tq), zzc, (gh, gw) in zip(comps, zzs, grids):
        q = np.asarray(qtables[tq], dtype=np.float64)
        coeffs = np.zeros((gh * gw, 64), dtype=np.float64)
        coeffs[:, _ZIGZAG] = zzc * q[None, :]
        blocks = basis.T @ coeffs.reshape(-1, 8, 8) @ basis
        planes.append(
            blocks.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
    if subsampled:
        # component i decodes at its true sample dims ceil(H·v_i/vmax) x
        # ceil(W·h_i/hmax) (T.81 A.1.1); nearest-neighbor upsample back
        # to full resolution via the exact index map
        # full[y][x] = plane[y·v_i//vmax][x·h_i//hmax] — identical to a
        # repeat() for dividing factors, and equally defined for
        # NON-DIVIDING layouts (e.g. hmax=3 over h_i=2), which T.81
        # permits (only the 1..4 range is law; the upsample filter is
        # decoder's choice, and nearest is the deterministic one)
        hmax, vmax = max(hs), max(vs)
        rows = np.arange(height)
        cols = np.arange(width)
        planes = [
            p[(rows * v_i) // vmax][:, (cols * h_i) // hmax]
            for p, h_i, v_i in zip(planes, hs, vs)
        ]
    out = [
        np.clip(np.round(p[:height, :width] + 128.0), 0, 255).astype("uint8")
        for p in planes
    ]
    if len(out) == 1:
        return out[0]
    return np.stack(out, axis=-1)


JPEG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("sum_pixels", LongType()),
        StructField("min_pixel", IntegerType()),
        StructField("max_pixel", IntegerType()),
    ]
)


def _synthesize_jpeg_batches(batches: Iterator[pd.DataFrame], encode):
    """Shared mapInPandas worker body for the JPEG synthesis tiers:
    (media_id) -> (media_id, mime, content), parametrized by the encoder
    (baseline or progressive) over the same block-constant raster."""

    def make(i: int) -> bytes:
        w, h = jpeg_pixel_geometry(i)
        return encode(_jpeg_block_raster(i, w, h))

    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "image/jpeg",
                "content": pdf["media_id"].map(lambda i: make(int(i))),
            }
        )


def synthesize_pixel_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete entropy-coded baseline JPEG of the block-constant raster."""
    return _synthesize_jpeg_batches(batches, encode_baseline_jpeg)


def synthesize_pixel_jpeg_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_pixel_jpeg_batch, schema=SYNTH_SCHEMA)


def synthesize_pixel_restart_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    baseline JPEG whose scan is split into RESTART SEGMENTS (DRI +
    cycling RSTn markers, DC predictors reset per segment — the
    error-resilience layout libjpeg emits under cjpeg -restart). The
    interval varies per image (1 + id % 4 blocks) so the fleet exercises
    single-block segments, multi-segment rows, and the RST0..RST7 modulo
    wraparound; the decoded raster is bit-identical to the restart-free
    stream, so the tier shares the baseline oracle."""

    def make(i: int) -> bytes:
        w, h = jpeg_pixel_geometry(i)
        return encode_baseline_jpeg(
            _jpeg_block_raster(i, w, h), restart_interval=1 + i % 4
        )

    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "image/jpeg",
                "content": pdf["media_id"].map(lambda i: make(int(i))),
            }
        )


def synthesize_pixel_restart_jpeg_df(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(
        synthesize_pixel_restart_jpeg_batch, schema=SYNTH_SCHEMA
    )


def synthesize_pixel_progressive_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete entropy-coded PROGRESSIVE (SOF2, spectral-selection) JPEG of
    the same block-constant raster as the baseline tier."""
    return _synthesize_jpeg_batches(batches, encode_progressive_jpeg)


def synthesize_pixel_progressive_jpeg_df(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(
        synthesize_pixel_progressive_jpeg_batch, schema=SYNTH_SCHEMA
    )


def encode_sa_progressive_jpeg(raster) -> bytes:
    """Full-profile progressive encode with the libjpeg-shaped default
    scan script: split AC bands (1-5, 6-63), DC at one approximation
    level, AC at two — 2 DC scans + 6 AC scans (first + two refinement
    planes per band). Every refinement plane is emitted, so the decode
    is coefficient-exact vs baseline."""
    return encode_progressive_jpeg(
        raster, ac_bands=((1, 5), (6, 63)), dc_al=1, ac_al=2
    )


def synthesize_pixel_sa_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    SUCCESSIVE-APPROXIMATION progressive JPEG (spectral selection +
    first/refinement bit-plane scans) of the block-constant raster."""
    return _synthesize_jpeg_batches(batches, encode_sa_progressive_jpeg)


def synthesize_pixel_sa_jpeg_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_pixel_sa_jpeg_batch, schema=SYNTH_SCHEMA)


def jpeg_pixel_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id, content) -> per-image decoded raster
    stats. Geometry comes from the DECODED stream (SOF0 + entropy decode +
    IDCT), never the generation formula — the formula lives only in the
    SQL oracle, which is what makes the comparison an end-to-end check of
    the entire codec path."""
    for pdf in batches:
        rows = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            r = decode_baseline_jpeg(bytes(content))
            h, w = r.shape[:2]
            flat = r.reshape(-1).astype("int64")
            rows.append(
                (int(mid), w, h, int(flat.size), int(flat.sum()),
                 int(flat.min()), int(flat.max()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id", "width", "height", "n_pixels", "sum_pixels",
                "min_pixel", "max_pixel",
            ],
        )


def jpeg_pixel_stats_df(df: DataFrame) -> DataFrame:
    """Arrow-batched baseline-JPEG decode + per-image stats over a
    (media_id, content) frame."""
    return df.select("media_id", "content").mapInPandas(
        jpeg_pixel_stats_batch, schema=JPEG_STATS_SCHEMA
    )


# --- 4:2:0 color tier: YCbCr chroma-subsampled baseline JPEG ----------------
# Same exactness design as the grayscale tiers, extended to color: luma is
# the 8x8 block-constant formula; each chroma plane is synthesized AT HALF
# RESOLUTION from an 8x8 tile formula of its own, which makes every chroma
# block DC-only too (a half-res 8x8 tile covers one 16x16 full-res MCU), so
# the whole 3-plane round trip is mathematically exact and the SQL oracle
# predicts the full-res chroma from x//16, y//16 — all without an RGB
# transform (components compare as coded).


def _ycbcr_chroma_half_plane(media_id: int, hh: int, hw: int, a: int, b: int, c: int):
    """Half-resolution chroma plane: value(u, v) = (a·(u//8) + b·(v//8)
    + c·id) % 256 with u = column — full-res pixel (x, y) sees
    (a·(x//16) + b·(y//16) + c·id) % 256 after the 2x nearest upsample."""
    import numpy as np

    cols = np.arange(hw, dtype=np.int64) // 8
    rows = np.arange(hh, dtype=np.int64) // 8
    return ((a * cols[None, :] + b * rows[:, None] + c * media_id) % 256).astype(
        "uint8"
    )


def encode_ycbcr420_pixels(media_id: int) -> bytes:
    """Complete 4:2:0 YCbCr baseline JPEG for the deterministic color
    tier: luma = the grayscale tiers' block formula; Cb/Cr = the half-res
    tile formulas (7,19,3·id) and (5,23,7·id)."""
    w, h = jpeg_pixel_geometry(media_id)
    y = _jpeg_block_raster(media_id, w, h)
    ch, cw = -(-h // 2), -(-w // 2)
    cb = _ycbcr_chroma_half_plane(media_id, ch, cw, 7, 19, 3)
    cr = _ycbcr_chroma_half_plane(media_id, ch, cw, 5, 23, 7)
    return encode_ycbcr420_jpeg(y, cb, cr)


def synthesize_pixel_ycbcr_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete MCU-interleaved 4:2:0 YCbCr baseline JPEG."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "image/jpeg",
                "content": pdf["media_id"].map(
                    lambda i: encode_ycbcr420_pixels(int(i))
                ),
            }
        )


def synthesize_pixel_ycbcr_jpeg_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_pixel_ycbcr_jpeg_batch, schema=SYNTH_SCHEMA)


def encode_multiscan_ycbcr420_pixels(media_id: int) -> bytes:
    """The color tier's planes (same deterministic formulas as
    encode_ycbcr420_pixels) emitted as MULTI-SCAN BASELINE — one
    non-interleaved SOS per component over its true block raster (the
    sequential form T.81 mandates when an MCU would exceed 10 blocks)."""
    w, h = jpeg_pixel_geometry(media_id)
    y = _jpeg_block_raster(media_id, w, h)
    ch, cw = -(-h // 2), -(-w // 2)
    cb = _ycbcr_chroma_half_plane(media_id, ch, cw, 7, 19, 3)
    cr = _ycbcr_chroma_half_plane(media_id, ch, cw, 5, 23, 7)
    return encode_layout_jpeg(
        w, h, [y, cb, cr], [(2, 2), (1, 1), (1, 1)], 8, "per_component"
    )


def synthesize_pixel_multiscan_ycbcr_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "image/jpeg",
                "content": pdf["media_id"].map(
                    lambda i: encode_multiscan_ycbcr420_pixels(int(i))
                ),
            }
        )


def synthesize_pixel_multiscan_ycbcr_jpeg_df(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(
        synthesize_pixel_multiscan_ycbcr_jpeg_batch, schema=SYNTH_SCHEMA
    )


def encode_progressive_ycbcr420_pixels(media_id: int) -> bytes:
    """The color tier's planes (same deterministic formulas as
    encode_ycbcr420_pixels), emitted PROGRESSIVE with 4:2:0 subsampling —
    the composed profile (Annex G × general MCU layout): interleaved DC
    first scan at Al=1, two AC bands at Al=1, then one DC and two AC
    refinement planes."""
    w, h = jpeg_pixel_geometry(media_id)
    y = _jpeg_block_raster(media_id, w, h)
    ch, cw = -(-h // 2), -(-w // 2)
    cb = _ycbcr_chroma_half_plane(media_id, ch, cw, 7, 19, 3)
    cr = _ycbcr_chroma_half_plane(media_id, ch, cw, 5, 23, 7)
    return encode_progressive_ycbcr_jpeg(
        y, cb, cr, 2, 2, 8, ((1, 5), (6, 63)), 1, 1
    )


def synthesize_pixel_progressive_ycbcr_jpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete progressive (SOF2) 4:2:0 YCbCr JPEG."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "image/jpeg",
                "content": pdf["media_id"].map(
                    lambda i: encode_progressive_ycbcr420_pixels(int(i))
                ),
            }
        )


def synthesize_pixel_progressive_ycbcr_jpeg_df(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(
        synthesize_pixel_progressive_ycbcr_jpeg_batch, schema=SYNTH_SCHEMA
    )


YCBCR_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("y_sum", LongType()),
        StructField("cb_sum", LongType()),
        StructField("cr_sum", LongType()),
        StructField("y_min", IntegerType()),
        StructField("y_max", IntegerType()),
    ]
)


def ycbcr_pixel_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id, content) -> per-image per-plane
    stats of the DECODED (H, W, 3) YCbCr raster. Geometry and every value
    come from the real MCU-interleaved decode + chroma upsample — the
    generation formulas live only in the SQL oracle."""
    for pdf in batches:
        rows = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            r = decode_baseline_jpeg(bytes(content))
            if r.ndim != 3 or r.shape[2] != 3:
                raise ValueError("expected a 3-component YCbCr decode")
            h, w = r.shape[:2]
            planes = r.astype("int64")
            rows.append(
                (
                    int(mid), w, h, int(h * w),
                    int(planes[:, :, 0].sum()),
                    int(planes[:, :, 1].sum()),
                    int(planes[:, :, 2].sum()),
                    int(planes[:, :, 0].min()),
                    int(planes[:, :, 0].max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id", "width", "height", "n_pixels",
                "y_sum", "cb_sum", "cr_sum", "y_min", "y_max",
            ],
        )


def ycbcr_pixel_stats_df(df: DataFrame) -> DataFrame:
    """Arrow-batched 4:2:0 YCbCr JPEG decode + per-plane stats over a
    (media_id, content) frame."""
    return df.select("media_id", "content").mapInPandas(
        ycbcr_pixel_stats_batch, schema=YCBCR_STATS_SCHEMA
    )


# --- video tier: minimal AVI-MJPEG container (pure stdlib) ------------------
# The frames are baseline JPEGs from the codec above, wrapped in a
# spec-correct RIFF/AVI 1.0 container (public layout: 'hdrl' LIST with
# avih/strh/strf headers, 'movi' LIST of '00dc' frame chunks, 'idx1'
# index). Video frame sampling + extraction + decode is therefore REAL
# end-to-end for the synthesized tier; ``require_codec('av')`` remains
# only for real-world interframe codecs (H.264 etc.). Reference parity
# note: the reference pipeline has no media path at all — this tier is
# part of the training-data superset, mirroring jpeg/png/wav above.

AVI_PIXEL_DIM = 32  # max frame side for the synthesized video tier
AVI_MAX_FRAMES = 7  # clips carry 1..AVI_MAX_FRAMES frames


def avi_clip_geometry(media_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) — fixed arithmetic the SQL oracle mirrors."""
    return (
        1 + media_id * 7 % AVI_PIXEL_DIM,
        1 + media_id * 13 % AVI_PIXEL_DIM,
        1 + media_id % AVI_MAX_FRAMES,
    )


def _avi_frame_raster(media_id: int, frame: int, width: int, height: int):
    """Block-constant per-frame raster:
    pixel(x, y) = (11·(x//8) + 17·(y//8) + id + 29·frame) % 256."""
    import numpy as np

    x = np.arange(width, dtype=np.int64) // 8
    y = np.arange(height, dtype=np.int64) // 8
    return (
        (11 * x[None, :] + 17 * y[:, None] + media_id + 29 * frame) % 256
    ).astype("uint8")


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap JPEG frame payloads as a minimal valid AVI-MJPG file.

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    '00dc'×n) idx1) with real header structs: MainAVIHeader (frame count,
    geometry, AVIF_HASINDEX), AVIStreamHeader ('vids'/'MJPG', scale/rate =
    1/fps), BITMAPINFOHEADER (MJPG biCompression), and an idx1 whose
    offsets are relative to the 'movi' fourcc per the common convention.
    """
    max_frame = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,
        0,
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,
        1,  # one stream
        max_frame,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0,
            0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(frames),  # dwLength (frames)
            max_frame,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality: driver default
            0,  # dwSampleSize: varies per frame
            0,
            0,
            width,
            height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", 0, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(_riff_chunk(b"strh", strh)) + len(_riff_chunk(b"strf", strf))
    ) + b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    hdrl_payload = b"hdrl" + _riff_chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_payload)) + hdrl_payload
    movi_payload = b"movi"
    index = []
    for fr in frames:
        index.append((len(movi_payload), len(fr)))
        movi_payload += _riff_chunk(b"00dc", fr)
    movi = b"LIST" + struct.pack("<I", len(movi_payload)) + movi_payload
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln) for off, ln in index
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def parse_avi_header(content: bytes) -> tuple[int, int, int]:
    """Header-only AVI parse: (n_frames, width, height) from the
    MainAVIHeader, stopping at the first avih — never walks the movi
    frame chunks, so it is O(header bytes) regardless of clip size and
    does not enforce the avih-vs-movi frame-count cross-check (which a
    decode consumer wants, but a sniffing consumer must tolerate)."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    end = min(8 + riff_size, len(content))
    pos = 12
    while pos + 8 <= end:
        fourcc = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        if fourcc == b"LIST" and content[pos + 8 : pos + 12] == b"hdrl":
            body = content[pos + 8 : pos + 8 + size]
            sp = 4
            while sp + 8 <= len(body):
                sc = body[sp : sp + 4]
                (ssz,) = struct.unpack_from("<I", body, sp + 4)
                if sc == b"avih" and ssz >= 40:
                    vals = struct.unpack_from("<10I", body, sp + 8)
                    return vals[4], vals[8], vals[9]
                sp += 8 + ssz + (ssz & 1)
        pos += 8 + size + (size & 1)
    raise ValueError("AVI payload missing avih header")


def parse_avi_mjpeg(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an AVI container: (n_frames, width, height, frame payloads).

    Walks the RIFF chunk stream generically (even-offset padding, LIST
    recursion for hdrl/movi), reads geometry and frame count from the
    MainAVIHeader, and collects the ``NNdc`` compressed-video frame chunks
    in stream order. Raises ValueError on non-AVI / truncated payloads or
    an avih frame count that disagrees with the movi chunk list.
    """
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    end = min(8 + riff_size, len(content))
    pos = 12
    n_frames = width = height = None
    frames: list[bytes] = []
    while pos + 8 <= end:
        fourcc = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        if fourcc == b"LIST" and body[:4] == b"hdrl":
            sp = 4
            while sp + 8 <= len(body):
                sc = body[sp : sp + 4]
                (ssz,) = struct.unpack_from("<I", body, sp + 4)
                if sc == b"avih" and ssz >= 40:
                    vals = struct.unpack_from("<10I", body, sp + 8)
                    n_frames, width, height = vals[4], vals[8], vals[9]
                sp += 8 + ssz + (ssz & 1)
        elif fourcc == b"LIST" and body[:4] == b"movi":
            sp = 4
            while sp + 8 <= len(body):
                sc = body[sp : sp + 4]
                (ssz,) = struct.unpack_from("<I", body, sp + 4)
                if sc[2:4] in (b"dc", b"db"):  # compressed / uncompressed video
                    frames.append(body[sp + 8 : sp + 8 + ssz])
                sp += 8 + ssz + (ssz & 1)
        pos += 8 + size + (size & 1)
    if n_frames is None:
        raise ValueError("AVI payload missing avih header")
    if len(frames) != n_frames:
        raise ValueError(
            f"AVI frame count mismatch: avih declares {n_frames}, "
            f"movi holds {len(frames)}"
        )
    return n_frames, width, height, frames


AVI_HEADER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_sampled", IntegerType()),
        StructField("sum_pixels", LongType()),
        StructField("min_pixel", IntegerType()),
        StructField("max_pixel", IntegerType()),
    ]
)


def synthesize_avi_mjpeg_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id) -> (media_id, mime, content) with a
    complete AVI-MJPG clip of block-constant baseline-JPEG frames."""

    def make(i: int) -> bytes:
        w, h, n = avi_clip_geometry(i)
        return encode_avi_mjpeg(
            [encode_baseline_jpeg(_avi_frame_raster(i, f, w, h)) for f in range(n)],
            w,
            h,
        )

    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "mime": "video/x-msvideo",
                "content": pdf["media_id"].map(lambda i: make(int(i))),
            }
        )


def synthesize_avi_mjpeg_df(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    ids = _spread_ids(df, id_col)
    return ids.mapInPandas(synthesize_avi_mjpeg_batch, schema=SYNTH_SCHEMA)


def avi_header_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: container header parse only (no frame decode),
    carrying the payload through for the downstream sampled extraction."""
    for pdf in batches:
        parsed = pdf["content"].map(lambda b: parse_avi_mjpeg(bytes(b)))
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "content": pdf["content"],
                "n_frames": parsed.map(lambda t: t[0]),
                "width": parsed.map(lambda t: t[1]),
                "height": parsed.map(lambda t: t[2]),
            }
        )


def video_frame_stats_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (media_id, content, frame_indices) -> decoded
    pixel stats over ONLY the sampled frames. Geometry and pixels come from
    the container + entropy decode, never the generation formula — the
    formula lives in the SQL oracle, making the comparison an end-to-end
    check of container parse, frame extraction and the JPEG codec."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in (
            "media_id", "n_frames", "width", "height",
            "n_sampled", "sum_pixels", "min_pixel", "max_pixel",
        )}
        for mid, content, idxs in zip(
            pdf["media_id"], pdf["content"], pdf["frame_indices"]
        ):
            n_frames, width, height, frames = parse_avi_mjpeg(bytes(content))
            rasters = [
                decode_baseline_jpeg(frames[int(i)]).astype(np.int64)
                for i in idxs
            ]
            stacked = np.stack(rasters) if rasters else np.zeros((0, 0, 0))
            out["media_id"].append(int(mid))
            out["n_frames"].append(n_frames)
            out["width"].append(width)
            out["height"].append(height)
            out["n_sampled"].append(len(rasters))
            out["sum_pixels"].append(int(stacked.sum()))
            out["min_pixel"].append(int(stacked.min()) if rasters else 0)
            out["max_pixel"].append(int(stacked.max()) if rasters else 0)
        yield pd.DataFrame(out)
