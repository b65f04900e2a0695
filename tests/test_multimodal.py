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
