"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode / feature-extract as Arrow-batched pandas
functions over ``mapInPandas``.

Header decode is REAL: ``decode_image_header`` parses PNG IHDR / JPEG SOF /
GIF logical-screen / BMP DIB / WebP (VP8, VP8L, VP8X) dimensions from the
raw bytes with stdlib ``struct`` — no image library needed for metadata
extraction. Full PIXEL decode is real for PNG via the vendored stdlib
codec (``operators/pngcodec.py``, zlib + all five scanline filters —
driver-hash-verified end-to-end by the mm-pixels query); other formats'
pixel decode still needs PIL/ffmpeg at deploy time and falls back to
``_fake_decode`` for unrecognized bytes so the batch plumbing stays
testable on arbitrary blobs. The reference's analog is the per-file
ffprobe subprocess fan-out (itdbmetadata.py:135-157) whose JSON output
lands in a relational column.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """Deterministic fallback for bytes with no recognizable image header:
    metadata derived from byte length. Replace with PIL / ffprobe for real
    pixel decode when the libs are available."""
    n = len(content)
    return (64 + n % 577, 64 + n % 331, "png" if n % 2 == 0 else "jpeg")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG ext,
# CC=DAC are table/extension segments, not frames).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def decode_image_header(content: bytes) -> tuple[int, int, str] | None:
    """REAL header parse, stdlib-only: (width, height, format) from PNG
    IHDR, JPEG SOFn, or GIF logical-screen descriptor; None when the bytes
    carry none of those signatures (caller picks the fallback)."""
    if content[:8] == _PNG_SIG and len(content) >= 24 and content[12:16] == b"IHDR":
        w, h = struct.unpack(">II", content[16:24])
        return (w, h, "png")
    if content[:2] == b"\xff\xd8":
        i = 2
        n = len(content)
        while i < n:
            if content[i] != 0xFF:
                return None  # desynced marker stream
            # runs of 0xFF are legal fill/padding before any marker — skip
            # them, or a padded real-world JPEG silently falls back to the
            # fabricated _fake_decode dimensions.
            j = i + 1
            while j < n and content[j] == 0xFF:
                j += 1
            if j >= n:
                return None
            marker = content[j]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
                i = j + 1
                continue
            if marker in (0xD9, 0xDA):
                # EOI / SOS carry no length: entropy-coded data (or nothing)
                # follows — no SOF was seen, stop rather than desync.
                return None
            if j + 3 > n:
                return None  # truncated before the length field
            (seg_len,) = struct.unpack(">H", content[j + 1 : j + 3])
            if marker in _JPEG_SOF:
                if j + 8 > n:
                    return None  # truncated SOF payload
                h, w = struct.unpack(">HH", content[j + 4 : j + 8])
                return (w, h, "jpeg")
            if seg_len < 2:
                return None  # length must cover itself; 0/1 would loop
            i = j + 1 + seg_len
        return None
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return (w, h, "gif")
    if content[:2] == b"BM" and len(content) >= 26:
        # BMP: DIB header size at offset 14 selects the geometry layout
        (dib,) = struct.unpack("<I", content[14:18])
        if dib >= 40:  # BITMAPINFOHEADER and successors: i32 w, i32 h
            w, h = struct.unpack("<ii", content[18:26])
            # negative height = top-down row order, same pixel grid
            return (w, abs(h), "bmp")
        if dib == 12 and len(content) >= 22:  # BITMAPCOREHEADER: u16 w/h
            w, h = struct.unpack("<HH", content[18:22])
            return (w, h, "bmp")
        return None
    if (
        content[:4] == b"RIFF"
        and len(content) >= 16
        and content[8:12] == b"WEBP"
    ):
        # WebP: one geometry-bearing chunk right after the RIFF header —
        # VP8 (lossy), VP8L (lossless), or VP8X (extended/canvas)
        fourcc = content[12:16]
        body = 20  # 12-byte RIFF/WEBP + 4-byte fourcc + 4-byte chunk size
        if fourcc == b"VP8 " and len(content) >= body + 10:
            # 3-byte frame tag, then the 9D 01 2A sync code, then
            # 14-bit width/height (upper 2 bits are scaling hints)
            if content[body + 3 : body + 6] != b"\x9d\x01\x2a":
                return None
            w, h = struct.unpack("<HH", content[body + 6 : body + 10])
            return (w & 0x3FFF, h & 0x3FFF, "webp")
        if fourcc == b"VP8L" and len(content) >= body + 5:
            if content[body] != 0x2F:  # lossless signature byte
                return None
            (bits,) = struct.unpack("<I", content[body + 1 : body + 5])
            return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp")
        if fourcc == b"VP8X" and len(content) >= body + 10:
            # 24-bit little-endian canvas dimensions, stored minus one
            w = int.from_bytes(content[body + 4 : body + 7], "little") + 1
            h = int.from_bytes(content[body + 7 : body + 10], "little") + 1
            return (w, h, "webp")
        return None
    return None


def decode_binary_metadata(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """binary column → typed metadata via mapInPandas (Arrow batches):
    real PNG/JPEG/GIF header parse, ``_fake_decode`` for anything else.

    Scale: runs once per Arrow batch per partition — per-row Python overhead
    amortized; binary bytes never shuffle (narrow transformation)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_image_header(bytes(c)) or _fake_decode(c) for c in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in metas], dtype="int32"),
                    "height": pd.Series([m[1] for m in metas], dtype="int32"),
                    "format": [m[2] for m in metas],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_manifest(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4
) -> DataFrame:
    """Frame-sampling plan for video-like blobs: one row per (doc, frame_idx)
    — pure relational explode; the actual frame extraction happens in the
    decode UDF at deploy time."""
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("duration_s", T.LongType(), True),
        T.StructField("fps", T.IntegerType(), True),
    ]
)


def probe_container_header(content: bytes) -> tuple[int, int] | None:
    """Parse (duration_s, fps) from the 10-byte FAKV stand-in container
    header (magic + u32be seconds + u16be fps) — the stub standing where
    an ffprobe/mp4 box walk goes at deploy time; the parse itself is a
    real byte-level decode the oracle verifies arithmetically."""
    if len(content) >= 10 and content[:4] == b"FAKV":
        duration = struct.unpack(">I", content[4:8])[0]
        fps = struct.unpack(">H", content[8:10])[0]
        return duration, fps
    return None


def probe_binary_duration(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """binary column → (doc_id, duration_s, fps) via mapInPandas — the
    video-probe twin of decode_binary_metadata; unknown containers yield
    nulls rather than fabricated values."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [probe_container_header(bytes(c)) for c in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "duration_s": pd.Series(
                        [m[0] if m else None for m in metas], dtype="Int64"
                    ),
                    "fps": pd.Series(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(probe, PROBE_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_sum", T.LongType(), False),
        T.StructField("bin0", T.LongType(), False),
        T.StructField("bin1", T.LongType(), False),
        T.StructField("bin2", T.LongType(), False),
        T.StructField("bin3", T.LongType(), False),
    ]
)


def extract_byte_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """binary column → byte-level feature vector (total, sum, 4-bin
    64-wide histogram) computed with REAL vectorized numpy over Arrow
    batches — the feature-extraction slot of the multimodal quartet.
    A deploy version swaps the kernel for an image/audio embedding
    model; the batch shape (one numpy pass per Arrow batch, no per-row
    Python) is exactly what that model inherits."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[bin_col]):
                a = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(a >> 6, minlength=4)
                rows.append(
                    (
                        int(doc_id),
                        int(a.size),
                        int(a.sum()),
                        int(hist[0]),
                        int(hist[1]),
                        int(hist[2]),
                        int(hist[3]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.select(id_col, bin_col).mapInPandas(feats, FEATURES_SCHEMA)


def decode_wav_header(content: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits, data_size) from a RIFF/WAVE blob —
    a REAL chunk walk, not a fixed-offset read: after the 12-byte RIFF
    header, chunks are (fourcc, u32le size, payload [+ pad byte when the
    size is odd — RIFF word alignment]) in ANY order; we take fmt and
    the FIRST data chunk and skip everything else (LIST, fact, cue...).
    Truncated or non-RIFF blobs yield None rather than garbage, and a
    data size that overruns the actual payload is clamped — the same
    defensive posture as the JPEG segment walker above."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(content):
        fourcc = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = pos + 8
        if fourcc == b"fmt " and size >= 16 and body + 16 <= len(content):
            _, channels, rate = struct.unpack("<HHI", content[body:body + 8])
            (bits,) = struct.unpack("<H", content[body + 14:body + 16])
            fmt = (channels, rate, bits)
        elif fourcc == b"data" and data_size is None:
            data_size = min(size, len(content) - body)
        pos = body + size + (size % 2)  # odd sizes pad to word boundary
    if fmt is None or data_size is None:
        return None
    channels, rate, bits = fmt
    if channels == 0 or rate == 0 or bits == 0:
        return None
    return channels, rate, bits, data_size


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("start_sample", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("start_byte", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("rate", T.IntegerType(), False),
    ]
)


def audio_chunk_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    chunk_ms: int = 1000,
) -> DataFrame:
    """binary WAV column → one row per fixed-duration chunk with FRAME-
    ALIGNED sample/byte geometry — the loader manifest an audio-training
    pipeline slices PCM with (the audio twin of pack_chunks' slice
    geometry). All integer arithmetic: samples_per_chunk =
    chunk_ms·rate/1000 (exact for the rates used), total frames =
    data_size // frame_bytes, last chunk truncates. Fan-out per doc is
    bounded by its own duration, never corpus size; parse + emit run in
    one Arrow-batched mapInPandas with no shuffle at all (the chunk
    explode happens inside the batch)."""

    def chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[bin_col]):
                meta = decode_wav_header(bytes(content))
                if meta is None:
                    continue
                channels, rate, bits, data_size = meta
                frame_bytes = channels * (bits // 8)
                spc = chunk_ms * rate // 1000
                if frame_bytes == 0 or spc == 0:
                    # sub-byte sample formats (4-bit ADPCM) or a chunk
                    # window shorter than one sample period: skip like
                    # an undecodable blob rather than ZeroDivisionError
                    # inside the executor (code-review finding)
                    continue
                total = data_size // frame_bytes
                n_chunks = (total + spc - 1) // spc
                for c in range(n_chunks):
                    s0 = c * spc
                    n = min(spc, total - s0)
                    rows.append(
                        (int(doc_id), c, s0, n,
                         s0 * frame_bytes, n * frame_bytes, rate)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "chunk_id", "start_sample",
                    "n_samples", "start_byte", "n_bytes", "rate",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(chunks, AUDIO_CHUNK_SCHEMA)
