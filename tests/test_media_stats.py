"""WAV codec, image/audio sample stats, and pHash near-dup tests."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.png_codec import png_encode
from hoover_snoop2_spark.operators.media_stats import (
    WavError,
    audio_stats,
    image_phash,
    image_stats,
    phash64,
    phash_near_dups,
    synth_phash_png_map_in_pandas,
    synth_wav_map_in_pandas,
    wav_decode,
    wav_encode,
)

# ---------------------------------------------------------------- WAV codec


def test_wav_roundtrip_16bit():
    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    rate, nch, out = wav_decode(wav_encode(samples, 44100))
    assert (rate, nch) == (44100, 1)
    assert out.shape == (6, 1)
    assert out[:, 0].tolist() == samples.astype(int).tolist()


def test_wav_roundtrip_8bit():
    samples = np.array([-128, -1, 0, 1, 127], dtype=np.int16)
    rate, nch, out = wav_decode(wav_encode(samples, 8000, bits=8))
    assert rate == 8000
    assert out[:, 0].tolist() == samples.astype(int).tolist()


def test_wav_stereo_interleave():
    samples = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    rate, nch, out = wav_decode(wav_encode(samples, 22050))
    assert nch == 2
    assert out.tolist() == samples.astype(int).tolist()


def test_wav_chunk_walk_skips_list_chunk():
    """fmt/data need not be adjacent — LIST/fact chunks are skipped and
    odd-size chunks consume their pad byte (RIFF word alignment)."""
    samples = np.array([5, -5, 7], dtype=np.int16)
    wav = wav_encode(samples, 16000)
    # splice a LIST chunk with an odd body length between WAVE and fmt
    body = wav[12:]
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"
    spliced = b"RIFF" + struct.pack("<I", 4 + len(odd) + len(body) - 4) + b"WAVE" + odd + body
    rate, nch, out = wav_decode(spliced)
    assert rate == 16000
    assert out[:, 0].tolist() == [5, -5, 7]


def test_wav_broken_reasons():
    with pytest.raises(WavError, match="not_wav"):
        wav_decode(b"RIFFxxxxAVI ")
    with pytest.raises(WavError, match="wav_truncated"):
        wav_decode(b"RIFF\x04\x00\x00\x00WAVE")
    good = wav_encode(np.array([1], dtype=np.int16), 8000)
    # flip audioFormat to 0xFFFE (extensible) — unsupported, stable reason
    bad = bytearray(good)
    bad[20:22] = struct.pack("<H", 0xFFFE)
    with pytest.raises(WavError, match="wav_codec_unsupported"):
        wav_decode(bytes(bad))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1,
             max_size=200),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(vals, rate):
    samples = np.array(vals, dtype=np.int16)
    r, nch, out = wav_decode(wav_encode(samples, rate))
    assert r == rate and out[:, 0].tolist() == [int(v) for v in vals]


# ------------------------------------------------------------ stats kernels


def test_image_stats_exact_sums(spark):
    rgb = np.zeros((2, 3, 3), dtype=np.uint8)
    rgb[:, :, 0] = [[1, 2, 3], [4, 5, 6]]
    rgb[:, :, 1] = 10
    rgb[:, :, 2] = [[0, 0, 0], [0, 0, 255]]
    df = spark.createDataFrame([("a", bytearray(png_encode(rgb)))],
                               "sha3_256 string, data binary")
    row = image_stats(df).collect()[0]
    assert (row.width, row.height, row.n_pixels) == (3, 2, 6)
    assert (row.sum_r, row.sum_g, row.sum_b) == (21, 60, 255)
    assert row.status == "ok"


def test_image_stats_broken_rows(spark):
    df = spark.createDataFrame(
        [
            ("empty", bytearray(b"")),
            ("jpeg", bytearray(b"\xff\xd8\xff\xe0rest")),
            ("junk", bytearray(b"plain text")),
            ("corrupt", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)),
        ],
        "sha3_256 string, data binary",
    )
    rows = {r.sha3_256: r for r in image_stats(df).collect()}
    assert rows["empty"].broken_reason == "empty_blob"
    assert rows["jpeg"].broken_reason.startswith("jpeg_")
    assert rows["junk"].broken_reason == "not_image"
    assert rows["corrupt"].status == "broken"


def test_audio_stats_exact(spark):
    samples = np.array([100, -200, 300, -32768], dtype=np.int16)
    df = spark.createDataFrame(
        [("a", bytearray(wav_encode(samples, 8000)))],
        "sha3_256 string, data binary",
    )
    row = audio_stats(df).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_samples) == (8000, 1, 4)
    assert row.sum_abs == 100 + 200 + 300 + 32768
    assert row.max_abs == 32768
    assert row.duration_ms == 0  # 4 samples at 8 kHz
    r2 = audio_stats(
        spark.createDataFrame(
            [("b", bytearray(b"not audio")), ("c", bytearray(b""))],
            "sha3_256 string, data binary",
        )
    ).collect()
    reasons = {r.sha3_256: r.broken_reason for r in r2}
    assert reasons == {"b": "not_audio", "c": "empty_blob"}


def test_synth_wav_matches_formula(spark):
    """The synthetic corpus decodes back to the generator formula —
    the invariant q69's SQL oracle relies on."""
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    pdfs = docs.mapInPandas(
        synth_wav_map_in_pandas(), schema="sha3_256 string, data binary"
    ).collect()
    for r in pdfs:
        d = int(r.sha3_256)
        rate, nch, out = wav_decode(bytes(r.data))
        n = 1000 + (d % 10) * 500
        i = np.arange(n, dtype=np.int64)
        expect = ((i * 7919 + d * 104729) % 65536) - 32768
        assert rate == 8000 + (d % 4) * 4000
        assert out[:, 0].tolist() == expect.tolist()


# ------------------------------------------------------------------ pHash


def _pattern(d):
    w = 64 + (d % 5) * 16
    h = 64 + (d % 3) * 16
    fx = 1 + d % 7
    fy = 1 + (d // 7) % 7
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    base = (np.add.outer(y * fy, x * fx) * 8) % 250
    return np.stack(
        [base, (base + d * 37) % 250, (base * 3 + d) % 250], axis=2
    ).astype(np.uint8)


def test_phash_brightness_invariance():
    """Uniform +3 never clips (pixels ≤ 249) → every AC DCT coefficient
    is untouched; at most the parity bit differs."""
    for d in (0, 5, 17):
        rgb = _pattern(d)
        a, b = phash64(rgb), phash64((rgb + 3).astype(np.uint8))
        assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 1


def test_phash_separates_patterns():
    hashes = [phash64(_pattern(d)) for d in range(12)]
    dists = []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            dists.append(
                bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            )
    # distinct sawtooth frequencies → far-apart hashes
    assert min(dists) > 3


def test_phash_signed_64bit_range():
    vals = [phash64(_pattern(d)) for d in range(8)]
    for v in vals:
        assert -(1 << 63) <= v < (1 << 63)


def test_phash_near_dups_finds_planted_pairs(spark):
    docs = spark.range(32).withColumnRenamed("id", "doc_id")
    pngs = docs.mapInPandas(
        synth_phash_png_map_in_pandas(), schema="sha3_256 string, data binary"
    )
    pairs = phash_near_dups(image_phash(pngs), max_hamming=3).collect()
    got = {(r.left_sha, r.right_sha) for r in pairs}
    planted = {(f"b{d:03d}", f"v{d:03d}") for d in range(0, 32, 4)}
    assert planted <= got
    for r in pairs:
        if (r.left_sha, r.right_sha) in planted:
            assert r.hamming <= 1
    # no unexpected cross-pattern pairs at this threshold
    assert got == planted


def test_phash_near_dups_plan_no_cartesian(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    pngs = docs.mapInPandas(
        synth_phash_png_map_in_pandas(), schema="sha3_256 string, data binary"
    )
    plan = phash_near_dups(image_phash(pngs))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_small_image_no_crash():
    """Images smaller than the 32x32 pHash grid upscale via repeated
    boxes instead of crashing (regression: IndexError in _resize_exact
    killed the whole Spark task for any <32px image)."""
    for w, h in ((1, 1), (10, 10), (31, 5), (5, 31), (40, 8)):
        rgb = np.full((h, w, 3), 200, dtype=np.uint8)
        v = phash64(rgb)
        assert -(1 << 63) <= v < (1 << 63)
    # flat image of any size hashes like its 32x32 self (all-AC-zero)
    a = phash64(np.full((10, 10, 3), 77, dtype=np.uint8))
    b = phash64(np.full((64, 64, 3), 77, dtype=np.uint8))
    assert a == b


# ------------------------------------------------------------------ AIFF


def test_aiff_roundtrip():
    from hoover_snoop2_spark.operators.media_stats import (
        aiff_decode,
        aiff_encode,
    )

    samples = np.array([0, 1, -1, 32767, -32768, 777], dtype=np.int16)
    for rate in (8000, 22050, 44100, 48000):
        r, nch, out = aiff_decode(aiff_encode(samples, rate))
        assert (r, nch) == (rate, 1)
        assert out[:, 0].tolist() == samples.astype(int).tolist()


def test_aiff_broken_and_dispatch():
    from hoover_snoop2_spark.operators.media_stats import (
        aiff_encode,
        decode_audio,
    )

    with pytest.raises(WavError, match="not_audio"):
        decode_audio(b"OggS...")
    with pytest.raises(WavError, match="not_aiff"):
        from hoover_snoop2_spark.operators.media_stats import aiff_decode

        aiff_decode(b"FORM\x00\x00\x00\x04WAVE")
    good = aiff_encode(np.array([5], dtype=np.int16), 8000)
    r, nch, out = decode_audio(good)
    assert (r, out[0, 0]) == (8000, 5)
    # truncated COMM
    with pytest.raises(WavError, match="aiff_truncated"):
        from hoover_snoop2_spark.operators.media_stats import aiff_decode

        aiff_decode(good[:20])


def test_aiff_fuzz_typed_errors():
    import random

    from hoover_snoop2_spark.operators.media_stats import (
        aiff_encode,
        decode_audio,
    )

    rng = random.Random(91)
    enc = aiff_encode(np.arange(-500, 500, 9, dtype=np.int16), 16000)
    for _ in range(800):
        data = bytearray(enc)
        for _ in range(rng.randint(1, 8)):
            op = rng.random()
            if op < 0.5:
                data[rng.randrange(len(data))] = rng.randrange(256)
            elif op < 0.8 and len(data) > 4:
                del data[rng.randrange(len(data))]
            else:
                data.insert(rng.randrange(len(data) + 1), rng.randrange(256))
        if rng.random() < 0.3:
            data = data[: rng.randrange(len(data) + 1)]
        try:
            decode_audio(bytes(data))
        except WavError:
            pass


def test_audio_stats_accepts_aiff(spark):
    from hoover_snoop2_spark.operators.media_stats import aiff_encode

    samples = np.array([100, -200, 300], dtype=np.int16)
    df = spark.createDataFrame(
        [("a", bytearray(aiff_encode(samples, 22050)))],
        "sha3_256 string, data binary",
    )
    row = audio_stats(df).collect()[0]
    assert (row.sample_rate, row.n_samples, row.sum_abs) == (22050, 3, 600)
    assert row.status == "ok"


def test_pcx_dims():
    import struct
    from hoover_snoop2_spark.operators.multimodal import parse_image_header
    from hoover_snoop2_spark.functions.magic import sniff_bytes

    pcx = bytearray(128)
    pcx[0] = 0x0A
    pcx[1] = 5
    pcx[2] = 1
    pcx[3] = 8
    struct.pack_into("<4H", pcx, 4, 10, 20, 329, 219)
    blob = bytes(pcx) + b"\x00" * 64
    assert parse_image_header(blob) == ("pcx", 320, 200)
    assert sniff_bytes(blob)[0] == "image/vnd.zbrush.pcx"


def test_tga_dims_footer():
    import struct
    from hoover_snoop2_spark.operators.multimodal import parse_image_header
    from hoover_snoop2_spark.functions.magic import sniff_bytes

    tga = bytearray(18)
    tga[2] = 2
    struct.pack_into("<HH", tga, 12, 640, 480)
    blob = bytes(tga) + b"\x00" * 40 + b"TRUEVISION-XFILE.\x00"
    assert parse_image_header(blob) == ("tga", 640, 480)
    assert sniff_bytes(blob)[0] == "image/x-tga"


def test_aiff_au_midi_headers():
    import math
    import struct
    from hoover_snoop2_spark.functions.magic import sniff_bytes
    from hoover_snoop2_spark.operators.multimodal import parse_audio_header

    def ext80(rate):
        exp = math.floor(math.log2(rate))
        mant = int(rate * (2 ** (63 - exp)))
        return struct.pack(">HQ", exp + 16383, mant)

    comm = struct.pack(">hIh", 2, 1000, 16) + ext80(44100)
    aiff = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm)) + b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm)
    assert sniff_bytes(aiff)[0] == "audio/x-aiff"
    assert parse_audio_header(aiff) == ("aiff", 44100, 2)

    au = b".snd" + struct.pack(">IIIII", 24, 100, 1, 8000, 1) + b"\x00" * 64
    assert sniff_bytes(au)[0] == "audio/basic"
    assert parse_audio_header(au) == ("au", 8000, 1)

    midi = (b"MThd" + struct.pack(">IHHH", 6, 1, 3, 480)
            + b"MTrk" + struct.pack(">I", 4) + b"\x00\xff\x2f\x00")
    assert sniff_bytes(midi)[0] == "audio/midi"
    assert parse_audio_header(midi) == ("midi", 0, 3)


def test_elf_refinement():
    import struct
    from hoover_snoop2_spark.functions.magic import sniff_bytes

    def elf(e_type, endian=1):
        e = "<" if endian == 1 else ">"
        return (b"\x7fELF" + bytes([2, endian, 1, 0]) + b"\x00" * 8
                + struct.pack(e + "HH", e_type, 0x3E) + b"\x00" * 40)

    assert sniff_bytes(elf(2))[0] == "application/x-elf"
    assert sniff_bytes(elf(3))[0] == "application/x-sharedlib"
    assert sniff_bytes(elf(3, endian=2))[0] == "application/x-sharedlib"


def test_amr_and_adts_aac_headers():
    from hoover_snoop2_spark.functions.magic import sniff_bytes
    from hoover_snoop2_spark.operators.multimodal import parse_audio_header

    nb = b"#!AMR\n" + b"\x3c" + b"\x00" * 31
    wb = b"#!AMR-WB\n" + b"\x00" * 20
    assert sniff_bytes(nb)[0] == "audio/amr"
    assert parse_audio_header(nb) == ("amr", 8000, 1)
    assert sniff_bytes(wb)[0] == "audio/amr-wb"
    assert parse_audio_header(wb) == ("amr-wb", 16000, 1)

    # ADTS: MPEG-4, layer 00, sfi=4 (44100), channel config 2
    hdr = bytes([0xFF, 0xF1, (1 << 6) | (4 << 2), 2 << 6, 0x01, 0x7F, 0xFC])
    blob = hdr + b"\x00" * 64
    assert sniff_bytes(blob)[0] == "audio/x-aac"
    assert parse_audio_header(blob) == ("aac", 44100, 2)
    # layer-III sync must still be MP3, not AAC
    mp3 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 64
    assert sniff_bytes(mp3)[0] == "audio/mpeg"
