"""Multimodal plumbing: real header parsing, stubbed decode, Spark wiring."""

import struct

from hoover_snoop2_spark.operators.multimodal import (
    extract_media_features,
    parse_image_header,
)


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", w, h) + bytes(16)
    )


def test_png_header():
    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)


def test_gif_header():
    data = b"GIF89a" + struct.pack("<HH", 12, 34) + bytes(8)
    assert parse_image_header(data) == ("gif", 12, 34)


def test_jpeg_header():
    # minimal SOF0 segment
    data = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 480, 640) + bytes(10)
    )
    assert parse_image_header(data) == ("jpeg", 640, 480)


def test_not_media():
    assert parse_image_header(b"hello") is None


def test_spark_media_stage(spark):
    rows = [("a", _png(10, 20)), ("b", b"not media")]
    df = spark.createDataFrame(rows, "sha3_256 string, data binary")
    got = {r["sha3_256"]: r for r in extract_media_features(df).collect()}
    assert got["a"]["status"] == "success"
    assert (got["a"]["width"], got["a"]["height"]) == (10, 20)
    assert len(got["a"]["feature"]) == 8
    assert got["b"]["status"] == "skipped"
    assert got["b"]["broken_reason"] == "not_media"


def test_decode_stub_off_marks_broken(spark):
    rows = [("a", _png(10, 20))]
    df = spark.createDataFrame(rows, "sha3_256 string, data binary")
    got = extract_media_features(df, decode_stub=False).collect()[0]
    assert got["status"] == "broken"
    assert got["broken_reason"] == "media_decoder_missing"


def _mp4(duration_s=7, timescale=1000, n_tracks=2):
    import struct

    mvhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
            + struct.pack(">II", timescale, duration_s * timescale))
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    trak_box = struct.pack(">I", 8) + b"trak"
    moov_body = mvhd_box + trak_box * n_tracks
    moov = struct.pack(">I", 8 + len(moov_body)) + b"moov" + moov_body
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_parse_video_header_mp4_and_ebml():
    from hoover_snoop2_spark.operators.multimodal import parse_video_header

    assert parse_video_header(_mp4(duration_s=7, n_tracks=2)) == ("mp4", 7000, 2)
    assert parse_video_header(b"\x1a\x45\xdf\xa3" + b"\x00" * 20 + b"webm" + bytes(8)) == ("webm", 0, 0)
    assert parse_video_header(b"\x1a\x45\xdf\xa3" + b"matroska" + bytes(40))[0] == "mkv"
    assert parse_video_header(b"not a video") is None


def test_media_features_video_and_audio_rows(spark):
    import struct

    from hoover_snoop2_spark.operators.multimodal import (
        extract_media_features,
    )

    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16))
    rows = [("v1", _mp4(duration_s=3, n_tracks=1)), ("a1", wav)]
    df = spark.createDataFrame(rows, "sha3_256 string, data binary")
    got = {r["sha3_256"]: r for r in extract_media_features(df).collect()}
    assert got["v1"]["media_type"] == "mp4"
    assert got["v1"]["duration_ms"] == 3000
    assert got["v1"]["n_frames"] == 1  # 1 trak
    assert got["a1"]["media_type"] == "wav"
    assert got["a1"]["sample_rate"] == 44100
    assert got["a1"]["n_channels"] == 2
    assert got["v1"]["status"] == got["a1"]["status"] == "success"


def test_parse_video_header_truncated_v1_mvhd():
    """A version-1 (64-bit times) mvhd cut short by the header-prefix read
    must yield duration 0, not a struct.error that fails the Spark task."""
    import struct

    from hoover_snoop2_spark.operators.multimodal import parse_video_header

    # v1 mvhd claims 32 bytes of body but the buffer ends mid-timestamps
    mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 10   # truncated
    mvhd_box = struct.pack(">I", 8 + 32) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    out = parse_video_header(ftyp + moov)
    assert out is not None and out[0] == "mp4" and out[1] == 0


def _avif_bytes(brand=b"avif", w=640, h=480):
    import struct as _s

    ftyp = _s.pack(">I", 16) + b"ftyp" + brand + b"\x00\x00\x00\x00"
    ispe = _s.pack(">I", 20) + b"ispe" + b"\x00\x00\x00\x00" \
        + _s.pack(">II", w, h)
    ipco = _s.pack(">I", 8 + len(ispe)) + b"ipco" + ispe
    iprp = _s.pack(">I", 8 + len(ipco)) + b"iprp" + ipco
    meta = _s.pack(">I", 12 + len(iprp)) + b"meta" + b"\x00\x00\x00\x00" \
        + iprp
    return ftyp + meta


def test_avif_heic_dims():
    from hoover_snoop2_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_avif_bytes()) == ("avif", 640, 480)
    assert parse_image_header(_avif_bytes(b"heic", 31, 17)) == (
        "heic", 31, 17)
    assert parse_image_header(_avif_bytes(b"mif1", 8, 9)) == ("heic", 8, 9)
    # truncated after ftyp: typed (0, 0), never an exception
    assert parse_image_header(_avif_bytes()[:16]) == ("avif", 0, 0)


def test_bmff_brand_sniffing():
    from hoover_snoop2_spark.functions.magic import sniff_bytes

    assert sniff_bytes(_avif_bytes())[0] == "image/avif"
    assert sniff_bytes(_avif_bytes(b"heix"))[0] == "image/heic"
    import struct as _s
    mp4 = _s.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    assert sniff_bytes(mp4)[0] == "video/mp4"
    qt = _s.pack(">I", 16) + b"ftyp" + b"qt  " + b"\x00\x00\x00\x00"
    assert sniff_bytes(qt)[0] == "video/quicktime"


def _ogg_page(granule, payload, seq, flags=0):
    import struct as _s

    segs = []
    n = len(payload)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    hdr = b"OggS" + bytes([0, flags]) + _s.pack("<q", granule) \
        + _s.pack("<I", 1) + _s.pack("<I", seq) + b"\x00\x00\x00\x00" \
        + bytes([len(segs)]) + bytes(segs)
    return hdr + payload


def test_ogg_headers_and_duration():
    import struct as _s

    from hoover_snoop2_spark.operators.multimodal import parse_audio_header
    from hoover_snoop2_spark.operators.media_stats import ogg_duration_ms

    vorbis_id = b"\x01vorbis" + _s.pack("<I", 0) + bytes([2]) \
        + _s.pack("<I", 44100) + b"\x00" * 9
    data = _ogg_page(-1, vorbis_id, 0, flags=2) \
        + _ogg_page(44100 * 3, b"x" * 10, 1, flags=4)
    assert parse_audio_header(data) == ("ogg-vorbis", 44100, 2)
    assert ogg_duration_ms(data) == ("vorbis", 44100, 2, 3000)

    opus_id = b"OpusHead" + bytes([1, 2]) + _s.pack("<H", 312) \
        + _s.pack("<I", 48000) + b"\x00" * 3
    data = _ogg_page(-1, opus_id, 0, flags=2) \
        + _ogg_page(48000 * 2 + 312, b"y" * 5, 1, flags=4)
    assert parse_audio_header(data) == ("ogg-opus", 48000, 2)
    # opus duration excludes the pre-skip samples
    assert ogg_duration_ms(data) == ("opus", 48000, 2, 2000)


def test_gif_and_webp_frame_counts():
    import numpy as np

    from hoover_snoop2_spark.functions.gif_codec import (
        gif_encode,
        gif_frame_count,
    )
    from hoover_snoop2_spark.functions.webp_codec import (
        webp_encode_lossless,
        webp_frame_count,
    )

    img = np.zeros((4, 5, 3), np.uint8)
    single = gif_encode(img)
    assert gif_frame_count(single) == 1
    # splice a second image block before the trailer -> 2 frames
    # (fixture has a 2-entry global color table: descriptor starts at 19)
    body, trailer = single[:-1], single[-1:]
    second = single[19:-1]
    assert gif_frame_count(body + second + trailer) == 2

    still = webp_encode_lossless(img)
    assert webp_frame_count(still) == 1


def test_mkv_webm_duration():
    import struct as _s

    from hoover_snoop2_spark.operators.multimodal import parse_video_header

    def ebml(eid_bytes, payload):
        # 1-byte size marker (0x80 | len) is enough for small payloads
        return eid_bytes + bytes([0x80 | len(payload)]) + payload

    # Info: TimecodeScale = 1_000_000 ns, Duration = 2500.0 ticks (f32)
    tcs = ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
    dur = ebml(b"\x44\x89", _s.pack(">f", 2500.0))
    info = ebml(b"\x15\x49\xa9\x66", tcs + dur)
    seg = ebml(b"\x18\x53\x80\x67", info)
    head = ebml(b"\x1a\x45\xdf\xa3", b"webm")
    out = parse_video_header(head + seg)
    assert out == ("webm", 2500, 0)
    # f64 duration + non-default scale (2 ms ticks)
    tcs = ebml(b"\x2a\xd7\xb1", (2_000_000).to_bytes(3, "big"))
    dur = ebml(b"\x44\x89", _s.pack(">d", 1000.0))
    info = ebml(b"\x15\x49\xa9\x66", tcs + dur)
    seg = ebml(b"\x18\x53\x80\x67", info)
    head = ebml(b"\x1a\x45\xdf\xa3", b"mkv!")
    assert parse_video_header(head + seg) == ("mkv", 2000, 0)
    # truncated segment: duration 0, never an exception
    assert parse_video_header(head + seg[:6])[1] == 0


def test_svg_dims_and_sniff():
    from hoover_snoop2_spark.functions.magic import sniff_bytes
    from hoover_snoop2_spark.operators.multimodal import parse_image_header

    svg = (b'<?xml version="1.0"?>\n<!-- c -->\n<!DOCTYPE svg>\n'
           b'<svg width="120px" height="80" xmlns="x"><rect/></svg>')
    assert sniff_bytes(svg)[0] == "image/svg+xml"
    assert parse_image_header(svg) == ("svg", 120, 80)
    vb = b'<svg viewBox="0 0 300 150"></svg>'
    assert sniff_bytes(vb)[0] == "image/svg+xml"
    assert parse_image_header(vb) == ("svg", 300, 150)
    # inline svg inside an html page stays html
    page = b'<html><body><svg width="9" height="9"></svg></body></html>'
    assert sniff_bytes(page)[0] == "text/html"
    assert parse_image_header(page) is None


def test_svg_text_extraction():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    svg = (b'<svg width="10" height="10"><style>.a{fill:red}</style>'
           b'<title>Chart of &amp; things</title>'
           b'<text x="1" y="2">Revenue <tspan>2024</tspan></text></svg>')
    rows = analyze_blob("k", svg)
    digest = rows[0]
    assert digest["mime_type"] == "image/svg+xml"
    assert digest["text"] == "Chart of & things Revenue 2024"
    assert digest["status"] == "success"
