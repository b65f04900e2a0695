"""Sample-level media statistics — native WAV PCM decode, PNG pixel
stats, and perceptual-hash image near-dup.

Reference parity: snoop2 ships audio/video blobs to external services
(``/root/reference/snoop/data/analyzers/thumbnails.py:346-443``) and
images to an object-detection HTTP service
(``image_classification.py:128-181``); it never decodes samples itself.
This module goes one honest step further than the header-only plumbing
in :mod:`.multimodal`: the two formats whose codecs are fully
public-spec and stdlib-implementable — RIFF/WAVE PCM and PNG — are
decoded to real samples/pixels (GIF joins them via
:mod:`..functions.gif_codec`), so the "multimodal feature extraction"
story has at least one end-to-end-real path per modality.  JPEG, which
needs a DCT codec, keeps the honest ``media_decoder_missing`` reason.

Scale notes: every operator here is a single ``mapInPandas`` pass over
Arrow batches — embarrassingly parallel, no shuffle.  The perceptual
near-dup joins banded 16-bit substrings of the 64-bit pHash (4 bands →
hamming ≤ 3 guaranteed recall ≥ 1 band equal by pigeonhole), an
equi-join shuffle on the band key — never an all-pairs comparison, the
same shape as the simhash block join in :mod:`.dedup`.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.raster import decode_raster


class WavError(ValueError):
    """Malformed/unsupported WAV input; mapped to broken_reason."""


# ---------------------------------------------------------------- WAV codec


def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal RIFF/WAVE PCM writer (mono or interleaved 2-D input) for
    fixtures and the synthetic corpus; public RIFF spec."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
    elif bits == 8:
        # 8-bit WAV is unsigned, biased by 128
        payload = (arr.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise WavError(f"wav_bits_unsupported:{bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM decoder → ``(sample_rate, n_channels, samples)``
    with samples as int32, shape (n_frames, n_channels).

    Walks the chunk list properly (fmt need not be first; LIST/fact
    chunks are skipped), supports PCM 8-bit (unsigned, rebased to
    signed) and 16-bit little-endian.  Anything else raises
    :class:`WavError` with a stable reason string."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not_wav")
    fmt = None
    payload = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise WavError("wav_truncated")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise WavError(f"wav_codec_unsupported:{audio_format}")
    if n_channels < 1:
        raise WavError("wav_truncated")
    if bits == 16:
        arr = np.frombuffer(
            payload[: len(payload) - (len(payload) % 2)], dtype="<i2"
        ).astype(np.int32)
    elif bits == 8:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise WavError(f"wav_bits_unsupported:{bits}")
    n_frames = len(arr) // n_channels
    return sample_rate, n_channels, arr[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


# ------------------------------------------------------------ audio stats

AUDIO_STATS_SCHEMA = (
    "sha3_256 string, sample_rate int, n_channels int, n_samples bigint, "
    "sum_abs bigint, max_abs int, duration_ms bigint, "
    "status string, broken_reason string"
)


def audio_stats_map_in_pandas():
    """mapInPandas body over (sha3_256, data): decode PCM and emit exact
    integer statistics — integer sums are bit-stable across engines,
    unlike float means (NOTES.md 'last-ulp drift')."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                base = dict(
                    sha3_256=sha, sample_rate=None, n_channels=None,
                    n_samples=None, sum_abs=None, max_abs=None,
                    duration_ms=None, status="broken", broken_reason=None,
                )
                if data is None or len(data) == 0:
                    base["broken_reason"] = "empty_blob"
                    rows.append(base)
                    continue
                try:
                    rate, nch, samples = decode_audio(bytes(data))
                except WavError as e:
                    base["broken_reason"] = str(e)
                    rows.append(base)
                    continue
                n = int(samples.shape[0])
                a = np.abs(samples.astype(np.int64))
                base.update(
                    sample_rate=rate, n_channels=nch, n_samples=n,
                    sum_abs=int(a.sum()), max_abs=int(a.max()) if n else 0,
                    duration_ms=(n * 1000) // rate if rate else 0,
                    status="ok",
                )
                rows.append(base)
            yield pd.DataFrame(
                rows,
                columns=[
                    "sha3_256", "sample_rate", "n_channels", "n_samples",
                    "sum_abs", "max_abs", "duration_ms", "status",
                    "broken_reason",
                ],
            )

    return fn


def audio_stats(df: DataFrame, data_col: str = "data") -> DataFrame:
    src = df.select("sha3_256", df[data_col].alias("data"))
    return src.mapInPandas(audio_stats_map_in_pandas(), schema=AUDIO_STATS_SCHEMA)


def synth_wav_map_in_pandas(aiff_from: int | None = None):
    """(doc_id) → deterministic mono 16-bit audio whose samples are a
    pure integer function of (doc_id, i) so an SQL oracle can recompute
    every statistic from ``generate_series`` (queries.q69).  Docs with
    ``doc_id >= aiff_from`` encode as big-endian AIFF instead of WAV —
    identical samples, so the oracle certifies the AIFF decoder (byte
    order, 80-bit rate, SSND offset) under the same formulas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 1000 + (d % 10) * 500
                rate = 8000 + (d % 4) * 4000
                i = np.arange(n, dtype=np.int64)
                samples = ((i * 7919 + d * 104729) % 65536) - 32768
                shas.append(str(d))
                enc = (
                    aiff_encode
                    if aiff_from is not None and d >= aiff_from
                    else wav_encode
                )
                blobs.append(enc(samples.astype(np.int16), rate))
            yield pd.DataFrame({"sha3_256": shas, "data": blobs})

    return fn


# ------------------------------------------------------------ image stats

IMAGE_STATS_SCHEMA = (
    "sha3_256 string, width int, height int, n_pixels bigint, "
    "sum_r bigint, sum_g bigint, sum_b bigint, "
    "status string, broken_reason string"
)


def image_stats_map_in_pandas():
    """mapInPandas body over (sha3_256, data): native PNG decode → exact
    integer per-channel sums (PNG is lossless, so the decoded pixels are
    the generator's pixels bit-for-bit)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                base = dict(
                    sha3_256=sha, width=None, height=None, n_pixels=None,
                    sum_r=None, sum_g=None, sum_b=None,
                    status="broken", broken_reason=None,
                )
                if data is None or len(data) == 0:
                    base["broken_reason"] = "empty_blob"
                    rows.append(base)
                    continue
                rgb, reason = decode_raster(bytes(data))
                if rgb is None:
                    base["broken_reason"] = reason
                    rows.append(base)
                    continue
                h, w = rgb.shape[:2]
                sums = rgb.astype(np.int64).sum(axis=(0, 1))
                base.update(
                    width=int(w), height=int(h), n_pixels=int(w) * int(h),
                    sum_r=int(sums[0]), sum_g=int(sums[1]),
                    sum_b=int(sums[2]), status="ok",
                )
                rows.append(base)
            yield pd.DataFrame(
                rows,
                columns=[
                    "sha3_256", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b", "status", "broken_reason",
                ],
            )

    return fn


def image_stats(df: DataFrame, data_col: str = "data") -> DataFrame:
    src = df.select("sha3_256", df[data_col].alias("data"))
    return src.mapInPandas(image_stats_map_in_pandas(), schema=IMAGE_STATS_SCHEMA)


# ------------------------------------------------------- perceptual hash

#: pHash geometry: resize to 32x32 luma, DCT-II, keep the 8x8
#: low-frequency block (minus DC), threshold at the median.
_PHASH_SIDE = 32
_PHASH_BLOCK = 8


def _resize_exact(rgb: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """Exact integer-box area average to an arbitrary (ow, oh) — the
    non-aspect-preserving sibling of png_codec.resize_box, same
    deterministic integral-image arithmetic.  Upscaling (source smaller
    than the target, e.g. a 10px icon pHashed at 32x32) maps several
    output boxes onto the same source row/column (nearest-style) —
    ``y1 = max(y0+1, natural)`` keeps every box non-empty in both
    directions and reduces to the old strictly-increasing boundaries
    whenever the source is at least target-sized (pinned hash values
    unchanged)."""
    h, w = rgb.shape[:2]
    integ = np.zeros((h + 1, w + 1, 3), dtype=np.float64)
    integ[1:, 1:] = rgb.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    y0 = (np.arange(oh) * h) // oh
    y1 = np.maximum(y0 + 1, (np.arange(1, oh + 1) * h) // oh)
    x0 = (np.arange(ow) * w) // ow
    x1 = np.maximum(x0 + 1, (np.arange(1, ow + 1) * w) // ow)
    area = (y1 - y0)[:, None].astype(np.float64) * (x1 - x0)[None, :]
    s = (
        integ[y1][:, x1]
        - integ[y0][:, x1]
        - integ[y1][:, x0]
        + integ[y0][:, x0]
    )
    return np.floor(s / area[:, :, None] + 0.5).astype(np.uint8)


_DCT_M = None


def _dct_matrix(n: int) -> np.ndarray:
    global _DCT_M
    if _DCT_M is None or _DCT_M.shape[0] != n:
        k = np.arange(n, dtype=np.float64)
        _DCT_M = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    return _DCT_M


def phash64(rgb: np.ndarray) -> int:
    """64-bit perceptual hash (classic pHash construction: 32x32 luma →
    2-D DCT-II → 8x8 low-frequency block → median threshold).  Brightness
    shifts and small local noise flip few bits; distinct images differ in
    ~32.  Bit order: row-major over the 8x8 block, MSB first, DC term
    replaced by the luma-mean parity so the hash stays 64 bits."""
    small = _resize_exact(rgb, _PHASH_SIDE, _PHASH_SIDE)
    # integer ITU-R BT.601 luma; exact, no float reassociation
    luma = (
        299 * small[:, :, 0].astype(np.int64)
        + 587 * small[:, :, 1].astype(np.int64)
        + 114 * small[:, :, 2].astype(np.int64)
    ) // 1000
    m = _dct_matrix(_PHASH_SIDE)
    d = m @ luma.astype(np.float64) @ m.T
    block = d[:_PHASH_BLOCK, :_PHASH_BLOCK].copy().ravel()
    med = float(np.median(block[1:]))
    # strict margin: a coefficient numerically AT the median (the median
    # is itself a block element) picks up ~1e-12 jitter under uniform
    # brightness shifts (the all-ones DCT column cancels only in exact
    # math); 1e-6 absolute tolerance keeps those bits stable while being
    # far below any real coefficient difference
    bits = (block - med) > 1e-6
    bits[0] = (int(luma.mean()) & 1) == 1
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's-complement into signed 64-bit (Spark LongType)
    return val - (1 << 64) if val >= (1 << 63) else val


PHASH_SCHEMA = "sha3_256 string, phash bigint, status string, broken_reason string"


def image_phash_map_in_pandas():
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                base = dict(sha3_256=sha, phash=None, status="broken",
                            broken_reason=None)
                if data is None or len(data) == 0:
                    base["broken_reason"] = "empty_blob"
                    rows.append(base)
                    continue
                rgb, reason = decode_raster(bytes(data))
                if rgb is None:
                    base["broken_reason"] = reason
                    rows.append(base)
                    continue
                base.update(phash=phash64(rgb), status="ok")
                rows.append(base)
            yield pd.DataFrame(
                rows, columns=["sha3_256", "phash", "status", "broken_reason"]
            )

    return fn


def image_phash(df: DataFrame, data_col: str = "data") -> DataFrame:
    src = df.select("sha3_256", df[data_col].alias("data"))
    return src.mapInPandas(image_phash_map_in_pandas(), schema=PHASH_SCHEMA)


def synth_gif_map_in_pandas():
    """(doc_id) → deterministic 32-color palette GIF; pixel channels are
    pure integer functions of (doc_id, x, y) so q68's SQL oracle can
    recompute the exact sums for GIF-decoded docs too:
    ``i=(3y+x)%32 → R=(17i)%256, G=(31i)%256, B=(7i)%256``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.gif_codec import gif_encode

        for pdf in batches:
            shas, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 40 + (d % 11) * 30
                h = 20 + (d % 5) * 50
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                idx = (np.add.outer(y * 3, x) % 32).astype(np.uint8)
                palette = np.stack(
                    [
                        (np.arange(32) * 17) % 256,
                        (np.arange(32) * 31) % 256,
                        (np.arange(32) * 7) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                shas.append(str(d))
                blobs.append(gif_encode(palette[idx], interlace=d % 2 == 1))
            yield pd.DataFrame({"sha3_256": shas, "data": blobs})

    return fn


def synth_bmp_map_in_pandas():
    """(doc_id) → deterministic 24-bpp BMP; pixels are pure integer
    functions of (doc_id, x, y) so q68's SQL oracle certifies the BMP
    decoder too: ``R=(5y+3x)%256, G=(2R)%256, B=255-R``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.bmp_codec import bmp_encode

        for pdf in batches:
            shas, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 30 + (d % 9) * 25
                h = 20 + (d % 6) * 35
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                r = np.add.outer(y * 5, x * 3) % 256
                rgb = np.stack(
                    [r, (r * 2) % 256, 255 - r], axis=2
                ).astype(np.uint8)
                shas.append(str(d))
                blobs.append(bmp_encode(rgb))
            yield pd.DataFrame({"sha3_256": shas, "data": blobs})

    return fn


def synth_tiff_map_in_pandas():
    """(doc_id) → deterministic TIFF across the codec's full decode
    matrix; ``doc_id % 5`` picks the compression/layout — 0 raw strips,
    1 PackBits, 2 LZW, 3 LZW + horizontal-differencing Predictor 2,
    4 LZW over 16×16 tiles — and ids % 3 == 0 are big-endian.  The
    decoded pixels are identical in every leg, so q68's closed-form
    oracle (``R=(7y+x)%256, G=(R+128)%256, B=(3R)%256``) certifies
    each variant without a SQL change: a wrong LZW code width, missed
    predictor cumsum, or tile-stitch offset shifts a channel sum and
    hash-fails."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.tiff_codec import tiff_encode

        for pdf in batches:
            shas, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 25 + (d % 8) * 20
                h = 15 + (d % 7) * 30
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                r = np.add.outer(y * 7, x) % 256
                rgb = np.stack(
                    [r, (r + 128) % 256, (r * 3) % 256], axis=2
                ).astype(np.uint8)
                variant = d % 5
                shas.append(str(d))
                blobs.append(
                    tiff_encode(
                        rgb,
                        order=">" if d % 3 == 0 else "<",
                        packbits=variant == 1,
                        lzw=variant in (2, 3, 4),
                        predictor=2 if variant == 3 else 1,
                        tile=(16, 16) if variant == 4 else None,
                        rows_per_strip=max(1, h // 3),
                    )
                )
            yield pd.DataFrame({"sha3_256": shas, "data": blobs})

    return fn


def synth_phash_png_map_in_pandas():
    """(doc_id) → 1-2 deterministic PNGs: a per-doc sawtooth pattern
    (frequency varies with doc_id so pHashes separate) and, for
    ``doc_id % 4 == 0``, a brightness-shifted near-duplicate (``+3`` on
    every channel — base pixels cap at 249 so the shift never clips,
    leaving every AC DCT coefficient untouched; at most the luma-mean
    parity bit differs, so planted pairs land at hamming ≤ 1)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.png_codec import png_encode

        for pdf in batches:
            shas, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 64 + (d % 5) * 16
                h = 64 + (d % 3) * 16
                fx = 1 + d % 7
                fy = 1 + (d // 7) % 7
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                base = (np.add.outer(y * fy, x * fx) * 8) % 250
                rgb = np.stack(
                    [base, (base + d * 37) % 250, (base * 3 + d) % 250],
                    axis=2,
                ).astype(np.uint8)
                shas.append(f"b{d:03d}")
                blobs.append(png_encode(rgb))
                if d % 4 == 0:
                    shas.append(f"v{d:03d}")
                    blobs.append(png_encode((rgb + 3).astype(np.uint8)))
            yield pd.DataFrame({"sha3_256": shas, "data": blobs})

    return fn


def phash_near_dups(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs by banded pHash — the image analog of
    the simhash block join (dedup.py): split the 64-bit hash into 4
    16-bit bands; any pair within hamming ``max_hamming`` ≤ 3 shares at
    least one identical band (pigeonhole), so a band equi-self-join finds
    every candidate with ONE shuffle and no all-pairs scan; ``bit_count``
    verifies the true distance JVM-side."""
    h = hashes.where(F.col("status") == "ok").select("sha3_256", "phash")
    bands = h.select(
        "sha3_256",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("phash"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("sha3_256", "phash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sha3_256") < F.col("b.sha3_256")),
        )
        .select(
            F.col("a.sha3_256").alias("left_sha"),
            F.col("b.sha3_256").alias("right_sha"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# ------------------------------------------------------------- AIFF codec

def aiff_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal AIFF writer (mono/interleaved 16-bit PCM, big-endian;
    Apple AIFF-C spec's plain AIFF profile) for fixtures.  The sample
    rate is an 80-bit IEEE 754 extended float — encoded exactly for
    integer rates."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    payload = arr.astype(">i2").tobytes()
    # 80-bit extended: sign(1) exponent(15, bias 16383) mantissa(64,
    # explicit leading 1); integer rates encode exactly
    r = int(sample_rate)
    e = r.bit_length() - 1
    mant = r << (63 - e)
    ext = struct.pack(">H", 16383 + e) + struct.pack(">Q", mant)
    comm = struct.pack(">hIh", n_channels, n_frames, 16) + ext
    ssnd = struct.pack(">II", 0, 0) + payload
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def aiff_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """AIFF PCM decoder → (sample_rate, n_channels, int32 frames) —
    the big-endian sibling of :func:`wav_decode`, same chunk-walk
    tolerance (word alignment, unknown chunks skipped)."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise WavError("not_aiff")
    comm = None
    payload = None
    little_endian = False
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"COMM" and len(body) >= 18:
            n_channels, n_frames, bits = struct.unpack(">hIh", body[:8])
            (exp,) = struct.unpack(">H", body[8:10])
            (mant,) = struct.unpack(">Q", body[10:18])
            e = (exp & 0x7FFF) - 16383
            rate = int(mant >> (63 - e)) if 0 <= e <= 63 else 0
            if len(body) > 18 and data[8:12] == b"AIFC":
                ctype = body[18:22]
                if ctype == b"sowt":
                    little_endian = True  # AIFF-C little-endian PCM
                elif ctype != b"NONE":
                    raise WavError(
                        f"aiff_codec_unsupported:{ctype.decode('ascii', 'replace')}"
                    )
            comm = (n_channels, n_frames, bits, rate)
        elif cid == b"SSND" and len(body) >= 8:
            (offset,) = struct.unpack(">I", body[:4])
            payload = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if comm is None or payload is None:
        raise WavError("aiff_truncated")
    n_channels, n_frames, bits, rate = comm
    if n_channels < 1 or rate <= 0:
        raise WavError("aiff_truncated")
    if bits != 16:
        raise WavError(f"aiff_bits_unsupported:{bits}")
    arr = np.frombuffer(
        payload[: len(payload) - (len(payload) % 2)],
        dtype="<i2" if little_endian else ">i2",
    ).astype(np.int32)
    # SSND may carry block-alignment slack — COMM's numSampleFrames is
    # the authoritative count (phantom tail samples otherwise inflate
    # every statistic with status ok)
    frames = min(len(arr) // n_channels, n_frames)
    return rate, n_channels, arr[: frames * n_channels].reshape(
        frames, n_channels
    )


def decode_audio(data: bytes) -> tuple[int, int, np.ndarray]:
    """Magic dispatch: RIFF/WAVE, FORM/AIFF, or fLaC → (rate, channels,
    frames); anything else raises WavError('not_audio').  FLAC decode is
    sample-exact (lossless), so its stats land on the same contract as
    the PCM paths; FLAC errors re-surface as typed WavError reasons."""
    if data[:4] == b"RIFF":
        return wav_decode(data)
    if data[:4] == b"FORM":
        return aiff_decode(data)
    if data[:4] == b"fLaC":
        from ..functions.flac_codec import FlacError, flac_decode

        try:
            return flac_decode(data)
        except FlacError as e:
            raise WavError(str(e)) from e
    raise WavError("not_audio")


# ------------------------------------------------------------ mp3 headers
# MPEG audio is lossy (no sample-exact decode here, like JPEG's lossy
# sibling VP8); what the pipeline needs from it is deterministic HEADER
# stats: rate / channels / duration / bitrate from the frame-header walk.
# Layer III only (the overwhelmingly common web case); Layers I/II refuse
# with a typed reason.

#: MPEG-1 Layer III bitrate table (kbps), index 1-14; 0=free, 15=bad
_MP3_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112,
                    128, 160, 192, 224, 256, 320]
#: MPEG-2/2.5 Layer III bitrate table
_MP3_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64,
                    80, 96, 112, 128, 144, 160]
#: sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_MP3_RATES = {
    0b00: [11025, 12000, 8000],
    0b10: [22050, 24000, 16000],
    0b11: [44100, 48000, 32000],
}


class Mp3Error(ValueError):
    """Malformed/unsupported MPEG audio; maps to broken_reason."""


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    return 10 + size


def mp3_stats(data: bytes) -> tuple[int, int, int, int, int]:
    """Frame-header walk → (sample_rate, n_channels, duration_ms,
    avg_bitrate_kbps, n_frames).  Tolerates an ID3v2 prefix and trailing
    junk (ID3v1 tag); a stream whose first sync is not Layer III raises
    typed."""
    pos = _skip_id3v2(data)
    n_frames = 0
    total_samples = 0
    total_kbps = 0
    rate = 0
    channels = 0
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing junk / ID3v1 after the last frame
            raise Mp3Error("mp3_bad_sync")
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version == 0b01:
            raise Mp3Error("mp3_bad_version")
        if layer != 0b01:  # 01 = Layer III
            raise Mp3Error("mp3_layer_unsupported")
        bri = (b2 >> 4) & 0xF
        sri = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        mode = (b3 >> 6) & 0x3
        if bri in (0, 15) or sri == 3:
            raise Mp3Error("mp3_bad_header")
        table = _MP3_BITRATES_V1 if version == 0b11 else _MP3_BITRATES_V2
        kbps = table[bri]
        srate = _MP3_RATES[version][sri]
        spf = 1152 if version == 0b11 else 576
        frame_len = (spf // 8) * kbps * 1000 // srate + padding
        if frame_len <= 4:
            raise Mp3Error("mp3_bad_header")
        if rate == 0:
            rate = srate
            channels = 1 if mode == 0b11 else 2
        n_frames += 1
        total_samples += spf
        total_kbps += kbps
        pos += frame_len
    if n_frames == 0:
        raise Mp3Error("mp3_no_frames")
    duration_ms = int(total_samples * 1000 / rate)
    return rate, channels, duration_ms, total_kbps // n_frames, n_frames


def mp3_encode_fixture(n_frames: int, *, version: int = 0b11,
                       bitrate_index: int = 9, rate_index: int = 0,
                       mono: bool = False, id3_pad: int = 0) -> bytes:
    """Spec-valid Layer III frame headers with zeroed payloads (the walk
    never decodes audio) — fixture generator for tests and oracles."""
    out = bytearray()
    if id3_pad:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
             (id3_pad >> 7) & 0x7F, id3_pad & 0x7F]) + b"\x00" * id3_pad
    table = _MP3_BITRATES_V1 if version == 0b11 else _MP3_BITRATES_V2
    kbps = table[bitrate_index]
    srate = _MP3_RATES[version][rate_index]
    spf = 1152 if version == 0b11 else 576
    for i in range(n_frames):
        padding = i % 2  # exercise the padding byte
        frame_len = (spf // 8) * kbps * 1000 // srate + padding
        hdr = bytes([
            0xFF,
            0xE0 | (version << 3) | (0b01 << 1) | 1,  # layer III, no CRC
            (bitrate_index << 4) | (rate_index << 2) | (padding << 1),
            (0b11 if mono else 0b00) << 6,
        ])
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


# ------------------------------------------------------------ ogg headers
# Ogg's duration lives in the granule position of the final page (sample
# index at stream rate for Vorbis; 48 kHz units minus pre-skip for Opus)
# — header-only like the MP3 walk; payload decode stays out of scope
# (lossy codecs, reference parity).


def ogg_duration_ms(data: bytes) -> tuple[str, int, int, int]:
    """Page-walk → (codec, sample_rate, n_channels, duration_ms).
    Raises Mp3Error-style typed reasons via :class:`WavError`."""
    if data[:4] != b"OggS":
        raise WavError("not_ogg")
    head = data[:2048]
    codec, rate, channels, preskip = "", 0, 0, 0
    i = head.find(b"OpusHead")
    if i >= 0 and i + 16 <= len(head):
        codec = "opus"
        channels = head[i + 9]
        preskip = struct.unpack("<H", head[i + 10:i + 12])[0]
        rate = struct.unpack("<I", head[i + 12:i + 16])[0]
    else:
        i = head.find(b"\x01vorbis")
        if i >= 0 and i + 16 <= len(head):
            codec = "vorbis"
            channels = head[i + 11]
            rate = struct.unpack("<I", head[i + 12:i + 16])[0]
    if not codec:
        raise WavError("ogg_codec_unknown")
    pos = 0
    last_granule = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            raise WavError("ogg_bad_page")
        granule = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        nsegs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise WavError("ogg_truncated")
        if granule >= 0:
            last_granule = granule
        pos += 27 + nsegs + sum(seg_table)
    if codec == "opus":
        # granule is always 48 kHz units; duration excludes pre-skip
        samples = max(0, last_granule - preskip)
        dur = int(samples * 1000 / 48000)
    else:
        dur = int(last_granule * 1000 / rate) if rate else 0
    return codec, rate, channels, dur
