"""Multimodal (image/audio/video) column plumbing.

The reference fans image blobs out to HTTP services for thumbnails, object
detection and classification (thumbnails.py:379-417,
image_classification.py:128-181) — external services we deliberately do not
reproduce.  What IS first-class here is the Spark-side plumbing a 100-TB
multimodal corpus needs:

- media rows are opaque ``binary`` columns + typed metadata struct,
- decode / feature-extract run as ``mapInPandas`` over Arrow batches with
  the same size-class repartitioning as text blobs,
- the actual pixel/sample decode is STUBBED (image/audio libs absent in
  this container): ``decode_stub=True`` produces a deterministic fake
  (dimensions parsed from PNG/JPEG/GIF headers — real header parsing, fake
  pixel features); ``decode_stub=False`` raises NotImplementedError at the
  kernel level, marking rows ``broken='media_decoder_missing'``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "sha3_256 string, media_type string, width int, height int, "
    "n_frames int, sample_rate int, n_channels int, duration_ms bigint, "
    "feature array<float>, status string, broken_reason string"
)

#: feature vector length of the stub extractor
FEATURE_DIM = 8


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """Real header parsing for PNG / GIF / JPEG dimensions (public format
    specs); returns (kind, width, height) or None."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if data[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", 0, 0
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from ..functions.webp_codec import webp_dims

        dims = webp_dims(data)
        if dims is not None:
            _, w, h = dims
            return "webp", w, h
        return "webp", 0, 0
    if len(data) >= 12 and data[4:8] == b"ftyp" and data[8:12] in (
        b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1",
    ):
        kind = "avif" if data[8:12] in (b"avif", b"avis") else "heic"
        w, h = _ispe_dims(data)
        return kind, w, h
    if (len(data) >= 70 and data[0] == 0x0A and data[2] in (0, 1)
            and data[1] in (0, 2, 3, 4, 5)):
        # PCX (image/vnd.zbrush.pcx in the reference's Tika list):
        # dims from the window coordinates
        xmin, ymin, xmax, ymax = struct.unpack_from("<4H", data, 4)
        if xmax >= xmin and ymax >= ymin:
            return "pcx", xmax - xmin + 1, ymax - ymin + 1
    if data[-18:] == b"TRUEVISION-XFILE.\x00" and len(data) >= 18:
        # TGA 2.0 footer (image/x-tga); width/height u16 LE at 12/14
        if len(data) >= 18 + 18:
            w, h = struct.unpack_from("<HH", data, 12)
            return "tga", w, h
        return "tga", 0, 0
    from ..functions.magic import svg_root_tag

    svg = svg_root_tag(data)
    if svg is not None:
        return ("svg",) + _svg_dims(svg)
    return None


def _svg_dims(tag: bytes) -> tuple[int, int]:
    """Integer pixel dims from width/height attributes (unitless or px),
    falling back to the viewBox, else (0, 0)."""

    def attr(name: bytes) -> int | None:
        m = re.search(name + rb"""\s*=\s*["']\s*(\d+(?:\.\d+)?)\s*(?:px)?\s*["']""",
                      tag, re.IGNORECASE)
        return int(float(m.group(1))) if m else None

    w, h = attr(rb"\bwidth"), attr(rb"\bheight")
    if w is not None and h is not None:
        return w, h
    m = re.search(
        rb"""viewBox\s*=\s*["']\s*[-\d.]+[\s,]+[-\d.]+[\s,]+(\d+(?:\.\d+)?)"""
        rb"""[\s,]+(\d+(?:\.\d+)?)\s*["']""", tag, re.IGNORECASE)
    if m:
        return int(float(m.group(1))), int(float(m.group(2)))
    return w or 0, h or 0


def _ispe_dims(data: bytes) -> tuple[int, int]:
    """AVIF/HEIC pixel dimensions: ISO-BMFF walk meta (a FULL box — 4
    version/flags bytes after the header) → iprp → ipco → ispe, whose
    payload is version/flags + width + height (ISO/IEC 23008-12 §6.5.3).
    Returns (0, 0) when absent/truncated — header-only, never raises."""

    def walk(pos: int, end: int, want: bytes) -> tuple[int, int] | None:
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos:pos + 4])
            btype = data[pos + 4:pos + 8]
            if size < 8:
                return None
            if btype == want:
                return pos + 8, min(end, pos + size)
            pos += size
        return None

    span = walk(0, len(data), b"meta")
    if span is None:
        return 0, 0
    pos, end = span
    pos += 4  # meta is a full box: version/flags
    for container in (b"iprp", b"ipco"):
        span = walk(pos, end, container)
        if span is None:
            return 0, 0
        pos, end = span
    span = walk(pos, end, b"ispe")
    if span is None:
        return 0, 0
    pos, end = span
    if pos + 12 > len(data):
        return 0, 0
    w, h = struct.unpack(">II", data[pos + 4:pos + 12])
    return w, h


def parse_audio_header(data: bytes) -> tuple[str, int, int] | None:
    """(kind, sample_rate, n_channels) for WAV; deterministic header-only
    parse (public RIFF/WAVE spec) — the audio analog of the image path."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE" and len(data) >= 36:
        # fmt chunk normally at offset 12
        if data[12:16] == b"fmt ":
            n_channels = struct.unpack("<H", data[22:24])[0]
            sample_rate = struct.unpack("<I", data[24:28])[0]
            return "wav", sample_rate, n_channels
        return "wav", 0, 0
    if data[:4] == b"fLaC":
        from ..functions.flac_codec import FlacError, flac_duration_ms

        try:
            rate, channels, _ = flac_duration_ms(data)
            return "flac", rate, channels
        except FlacError:
            return "flac", 0, 0
    if (len(data) >= 7 and data[0] == 0xFF and (data[1] & 0xF6) == 0xF0
            and ((data[2] >> 2) & 0xF) < 13):
        # ADTS AAC (audio/x-aac, Tika :1177): layer bits 00 keep this
        # disjoint from the MP3 branch below (Layer III is 01)
        rates = (96000, 88200, 64000, 48000, 44100, 32000, 24000,
                 22050, 16000, 12000, 11025, 8000, 7350)
        channels = ((data[2] & 1) << 2) | (data[3] >> 6)
        return "aac", rates[(data[2] >> 2) & 0xF], channels
    if data[:3] == b"ID3" or (
        len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        from .media_stats import Mp3Error, mp3_stats

        try:
            rate, channels, _, _, _ = mp3_stats(bytes(data))
            return "mp3", rate, channels
        except Mp3Error:
            return "mp3", 0, 0
    if data[:4] == b"OggS":
        # codec ID header lives in the first page's first packet
        head = data[:2048]
        i = head.find(b"OpusHead")
        if i >= 0 and i + 16 <= len(head):
            channels = head[i + 9]
            rate = struct.unpack("<I", head[i + 12:i + 16])[0]
            return "ogg-opus", rate, channels
        i = head.find(b"\x01vorbis")
        if i >= 0 and i + 16 <= len(head):
            channels = head[i + 11]
            rate = struct.unpack("<I", head[i + 12:i + 16])[0]
            return "ogg-vorbis", rate, channels
        return "ogg", 0, 0
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        # AIFF (audio/x-aiff, Tika :1179): COMM chunk; the sample rate
        # is an 80-bit extended float per the public AIFF-1.3 spec
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (csize,) = struct.unpack(">I", data[pos + 4:pos + 8])
            if cid == b"COMM" and pos + 8 + 18 <= len(data):
                (channels,) = struct.unpack(">h", data[pos + 8:pos + 10])
                exp_raw, = struct.unpack(">H", data[pos + 16:pos + 18])
                (mant,) = struct.unpack(">Q", data[pos + 18:pos + 26])
                exp = (exp_raw & 0x7FFF) - 16383 - 63
                rate = int(mant * (2.0 ** exp)) if mant else 0
                return "aiff", rate, channels
            pos += 8 + csize + (csize & 1)
        return "aiff", 0, 0
    if data[:4] == b".snd" and len(data) >= 24:
        # Sun AU (audio/basic, Tika :1062)
        rate, channels = struct.unpack(">II", data[16:24])
        return "au", rate, channels
    if data[:4] == b"MThd" and len(data) >= 14:
        # Standard MIDI (audio/midi, Tika :1107): no PCM rate; the
        # track count rides the channels column
        (ntrks,) = struct.unpack(">H", data[10:12])
        return "midi", 0, ntrks
    if data[:6] == b"#!AMR\n" or data[:9] == b"#!AMR-WB\n":
        # AMR narrowband/wideband (audio/amr + amr-wb, Tika :1058-1059);
        # fixed rates per RFC 4867
        wb = data[:9] == b"#!AMR-WB\n"
        return ("amr-wb" if wb else "amr"), (16000 if wb else 8000), 1
    return None


def parse_video_header(data: bytes) -> tuple[str, int, int] | None:
    """(kind, duration_ms, n_tracks) for MP4/ISO-BMFF (box walk → moov/
    mvhd timescale+duration, trak count) and EBML containers (MKV/WebM
    detected by DocType); header-only, public format specs."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        duration_ms = 0
        n_tracks = 0
        pos = 0
        while pos + 8 <= len(data):
            (size,) = struct.unpack(">I", data[pos:pos + 4])
            btype = data[pos + 4:pos + 8]
            if size < 8:
                break
            if btype == b"moov":
                end = min(len(data), pos + size)
                q = pos + 8
                while q + 8 <= end:
                    (bsz,) = struct.unpack(">I", data[q:q + 4])
                    bt = data[q + 4:q + 8]
                    if bsz < 8:
                        break
                    if bt == b"mvhd" and q + 28 <= len(data):
                        ver = data[q + 8]
                        ts = dur = 0
                        if ver == 0:
                            ts, dur = struct.unpack(">II", data[q + 20:q + 28])
                        elif q + 40 <= len(data):
                            # version 1: 64-bit times; the v0 length guard
                            # above is not enough — a truncated v1 mvhd
                            # must yield duration 0, not a struct.error
                            # that fails the whole Spark task
                            ts, = struct.unpack(">I", data[q + 28:q + 32])
                            dur, = struct.unpack(">Q", data[q + 32:q + 40])
                        duration_ms = int(dur * 1000 / ts) if ts else 0
                    elif bt == b"trak":
                        n_tracks += 1
                    q += bsz
                return "mp4", duration_ms, n_tracks
            pos += size
        return "mp4", 0, 0
    if data[:4] == b"\x1a\x45\xdf\xa3":
        kind = "webm" if b"webm" in data[:64] else "mkv"
        return kind, _ebml_duration_ms(data), 0
    return None


def _ebml_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos) for one EBML variable-length integer; element
    IDs keep the length-marker bit, sizes strip it."""
    if pos >= len(data):
        raise ValueError("ebml_truncated")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml_bad_vint")
    n = 8 - first.bit_length() + 1
    if pos + n > len(data):
        raise ValueError("ebml_truncated")
    v = first if keep_marker else first & ((1 << (8 - n)) - 1)
    for i in range(1, n):
        v = (v << 8) | data[pos + i]
    return v, pos + n


def _ebml_duration_ms(data: bytes) -> int:
    """Matroska/WebM duration: Segment → Info → TimecodeScale (ns per
    tick, default 1_000_000) × Duration (float ticks).  Header-only,
    returns 0 when absent or malformed — never raises."""
    try:
        pos = 0
        # skip the EBML header element, find the Segment
        while pos < len(data):
            eid, p = _ebml_vint(data, pos, True)
            size, p = _ebml_vint(data, p, False)
            if eid == 0x18538067:  # Segment
                seg_end = min(len(data), p + size)
                return _ebml_info_duration(data, p, seg_end)
            pos = p + size
    except ValueError:
        pass
    return 0


def _ebml_info_duration(data: bytes, pos: int, end: int) -> int:
    scale = 1_000_000
    duration_ticks = None
    while pos < end:
        eid, p = _ebml_vint(data, pos, True)
        size, p = _ebml_vint(data, p, False)
        if eid == 0x1549A966:  # Info: recurse into it
            info_end = min(end, p + size)
            q = p
            while q < info_end:
                ceid, cp = _ebml_vint(data, q, True)
                csize, cp = _ebml_vint(data, cp, False)
                body = data[cp:cp + csize]
                if ceid == 0x2AD7B1 and csize <= 8:  # TimecodeScale uint
                    scale = int.from_bytes(body, "big") or scale
                elif ceid == 0x4489:  # Duration float32/64
                    if csize == 4:
                        duration_ticks = struct.unpack(">f", body)[0]
                    elif csize == 8:
                        duration_ticks = struct.unpack(">d", body)[0]
                q = cp + csize
            break
        pos = p + size
    if duration_ticks is None:
        return 0
    return int(duration_ticks * scale / 1_000_000_000 * 1000)


def _stub_feature(data: bytes) -> list[float]:
    """Deterministic fake feature: byte-histogram moments.  Stands in for a
    real embedding model; the Spark plumbing (schema, batching, skew) is
    identical either way."""
    if not data:
        return [0.0] * FEATURE_DIM
    step = max(1, len(data) // 4096)
    sample = data[::step]
    out = []
    for b in range(FEATURE_DIM):
        bucket = sample[b::FEATURE_DIM]
        out.append(round(sum(bucket) / (255.0 * max(1, len(bucket))), 6))
    return out


def media_map_in_pandas(decode_stub: bool = True):
    """mapInPandas body factory over (sha3_256, data) batches."""

    BASE = dict(media_type=None, width=None, height=None, n_frames=None,
                sample_rate=None, n_channels=None, duration_ms=None,
                feature=None, status=None, broken_reason=None)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                data = data or b""
                row = dict(BASE, sha3_256=sha)
                img = parse_image_header(data)
                aud = parse_audio_header(data) if img is None else None
                vid = (
                    parse_video_header(data)
                    if img is None and aud is None else None
                )
                if img is not None:
                    if img[0] == "gif":
                        from ..functions.gif_codec import gif_frame_count

                        nf = gif_frame_count(data)
                    elif img[0] == "webp":
                        from ..functions.webp_codec import webp_frame_count

                        nf = webp_frame_count(data)
                    else:
                        nf = 1
                    row.update(media_type=img[0], width=img[1],
                               height=img[2], n_frames=nf)
                elif aud is not None:
                    row.update(media_type=aud[0], sample_rate=aud[1],
                               n_channels=aud[2])
                    if aud[0] == "midi":
                        from .midi_stats import MidiError, midi_stats

                        try:
                            _f, _n, dur = midi_stats(bytes(data))
                            row.update(duration_ms=dur)
                        except MidiError:
                            pass
                elif vid is not None:
                    row.update(media_type=vid[0], duration_ms=vid[1],
                               n_frames=vid[2] or None)
                else:
                    row.update(status="skipped", broken_reason="not_media")
                    rows.append(row)
                    continue
                if not decode_stub:
                    row.update(status="broken",
                               broken_reason="media_decoder_missing")
                else:
                    row.update(feature=_stub_feature(data), status="success")
                rows.append(row)
            yield pd.DataFrame(rows)

    return fn


FRAME_SCHEMA = (
    "sha3_256 string, frame_no int, frame_offset bigint, "
    "feature array<float>, status string, broken_reason string"
)


def frame_sample_map_in_pandas(n_frames: int = 4, decode_stub: bool = True):
    """Video frame sampling as a mapInPandas flatMap: one input blob → up
    to ``n_frames`` frame rows with (stubbed) per-frame features.

    The Spark plumbing is the deliverable: schema, row expansion, batch
    shape.  Real decode would replace ``_stub_feature`` with an ffmpeg/
    codec call per sampled offset; in this container the decode is a
    deterministic fake over evenly-spaced byte windows (RIFF/AVI
    recognized by header; other bytes are 'not_media')."""
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                data = data or b""
                if not (data[:4] == b"RIFF" and data[8:12] in (b"AVI ", b"WAVE")):
                    rows.append(dict(sha3_256=sha, frame_no=None,
                                     frame_offset=None, feature=None,
                                     status="skipped", broken_reason="not_media"))
                    continue
                if not decode_stub:
                    rows.append(dict(sha3_256=sha, frame_no=None,
                                     frame_offset=None, feature=None,
                                     status="broken",
                                     broken_reason="media_decoder_missing"))
                    continue
                step = max(1, len(data) // n_frames)
                for i in range(min(n_frames, max(1, len(data) // step))):
                    off = i * step
                    rows.append(dict(sha3_256=sha, frame_no=i,
                                     frame_offset=off,
                                     feature=_stub_feature(data[off:off + step]),
                                     status="success", broken_reason=None))
            yield pd.DataFrame(rows)

    return fn


def sample_video_frames(
    df: DataFrame, data_col: str = "data", n_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """(sha3_256, data) → frame rows; heavy blobs spread before the UDF."""
    from ..plans.skew import repartition_by_size_class

    src = df.select("sha3_256", F.col(data_col).alias("data"))
    src = repartition_by_size_class(src, data_col="data", key="sha3_256").drop("_salt")
    return src.mapInPandas(
        frame_sample_map_in_pandas(n_frames, decode_stub), schema=FRAME_SCHEMA
    )


def extract_media_features(
    df: DataFrame, data_col: str = "data", decode_stub: bool = True
) -> DataFrame:
    """(sha3_256, data) → media metadata + stub features, size-class
    repartitioned like every other blob stage."""
    from ..plans.skew import repartition_by_size_class

    src = df.select("sha3_256", F.col(data_col).alias("data"))
    src = repartition_by_size_class(src, data_col="data", key="sha3_256").drop("_salt")
    return src.mapInPandas(media_map_in_pandas(decode_stub), schema=MEDIA_SCHEMA)
