"""FLAC codec tests (subframe types, stereo decorrelation, Rice
partitions, CRCs) and MP3 header-walk stats, plus their audio-path
integration."""

import numpy as np
import pytest

from hoover_snoop2_spark.functions.flac_codec import (
    FlacError,
    crc8,
    crc16,
    flac_decode,
    flac_duration_ms,
    flac_encode,
)
from hoover_snoop2_spark.operators.media_stats import (
    Mp3Error,
    WavError,
    decode_audio,
    mp3_encode_fixture,
    mp3_stats,
)


def _sig(n, ch=1, amp=1000):
    t = np.arange(n)
    base = (amp * np.sin(t / 7.0) + 50 * np.sin(t / 3.0)).astype(np.int64)
    if ch == 1:
        return base
    return np.stack([base, base // 2 + 13], axis=1)


@pytest.mark.parametrize("mode", [
    "constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
    "fixed4", "lpc",
])
def test_subframe_roundtrip(mode):
    x = np.full(512, 77, np.int64) if mode == "constant" else _sig(512)
    rate, ch, out = flac_decode(flac_encode(x, 44100, mode=mode,
                                            block_size=256))
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(out[:, 0], x)


@pytest.mark.parametrize("stereo", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_stereo_decorrelation(stereo):
    x = _sig(512, 2)
    rate, ch, out = flac_decode(flac_encode(x, 48000, mode="fixed2",
                                            stereo=stereo, block_size=256))
    assert ch == 2
    assert np.array_equal(out, x)


def test_rice_partitions_escape_wasted_and_coded_numbers():
    x = _sig(2048)
    for kw in (dict(porder=2), dict(porder=3), dict(escape_raw=14)):
        out = flac_decode(flac_encode(x, 32000, mode="fixed1",
                                      block_size=512, **kw))[2]
        assert np.array_equal(out[:, 0], x), kw
    xw = _sig(512) & ~7  # low 3 bits zero -> wasted-bits path
    out = flac_decode(flac_encode(xw, 32000, mode="verbatim",
                                  block_size=256, wasted=3))[2]
    assert np.array_equal(out[:, 0], xw)
    # 200 frames: frame numbers cross the 1-byte coded-number boundary
    x = _sig(256 * 200)
    data = flac_encode(x, 44100, mode="fixed2", block_size=256)
    assert np.array_equal(flac_decode(data)[2][:, 0], x)
    assert flac_duration_ms(data) == (44100, 1, int(256 * 200 * 1000 / 44100))


def test_crc_detects_corruption():
    data = bytearray(flac_encode(_sig(512), 44100, block_size=256))
    # STREAMINFO is 4 magic + 4 header + 34 body + ... frames after;
    # flip one byte inside the first frame's payload
    data[60] ^= 0x40
    with pytest.raises(FlacError, match="crc_mismatch|flac_"):
        flac_decode(bytes(data))
    assert crc8(b"123456789") == 0xF4  # CRC-8/SMBUS check value
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (poly 0x8005) check


def test_decode_audio_dispatch_flac():
    x = _sig(512)
    rate, ch, out = decode_audio(flac_encode(x, 16000, block_size=256))
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(out[:, 0], x)
    with pytest.raises(WavError, match="flac_"):
        decode_audio(b"fLaC" + b"\x00" * 4)


def test_multimodal_flac_header():
    from hoover_snoop2_spark.operators.multimodal import parse_audio_header

    data = flac_encode(_sig(512, 2), 22050, block_size=256)
    assert parse_audio_header(data) == ("flac", 22050, 2)


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


def test_mp3_stats_walk():
    d = mp3_encode_fixture(38, id3_pad=100)
    assert mp3_stats(d) == (44100, 2, int(38 * 1152 * 1000 / 44100),
                            128, 38)
    d2 = mp3_encode_fixture(10, version=0b10, bitrate_index=5,
                            rate_index=1, mono=True)
    assert mp3_stats(d2) == (24000, 1, 240, 40, 10)
    # trailing ID3v1 tag tolerated after the last frame
    assert mp3_stats(d2 + b"TAG" + b"x" * 125)[4] == 10


def test_mp3_typed_failures():
    with pytest.raises(Mp3Error, match="mp3_bad_sync"):
        mp3_stats(b"\x00\x01\x02\x03")
    # layer II header refuses typed
    bad = bytearray(mp3_encode_fixture(1))
    bad[1] = (bad[1] & ~0x06) | (0b10 << 1)
    with pytest.raises(Mp3Error, match="mp3_layer_unsupported"):
        mp3_stats(bytes(bad))


def test_mp3_sniff_and_header():
    from hoover_snoop2_spark.functions.magic import sniff_bytes
    from hoover_snoop2_spark.operators.multimodal import parse_audio_header

    bare = mp3_encode_fixture(3)
    assert sniff_bytes(bare)[0] == "audio/mpeg"
    assert parse_audio_header(bare) == ("mp3", 44100, 2)
    tagged = mp3_encode_fixture(3, id3_pad=64)
    assert sniff_bytes(tagged)[0] == "audio/mpeg"
    assert parse_audio_header(tagged) == ("mp3", 44100, 2)
    # a JPEG still sniffs as a JPEG (0xFF 0xD8 fails the layer check)
    assert sniff_bytes(b"\xff\xd8\xff\xe0rest")[0] == "image/jpeg"
