"""EXIF extraction (exif.py:61-99 semantics) + PGP armor flag
(pgp.py:13-46, email.py:134-136)."""

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.email_parse import email_meta, parse_email_bytes
from hoover_snoop2_spark.operators.exif_extract import (
    ExifBroken,
    build_exif_jpeg,
    extract_exif,
)


def test_exif_round_trip():
    jpg = build_exif_jpeg(
        lat_dms=[(52, 1), (31, 1), (1234, 100)], lat_ref="N",
        lon_dms=[(13, 1), (24, 1), (5678, 100)], lon_ref="E",
        dt_original="2023:06:15 14:30:00",
    )
    got = extract_exif(jpg)
    assert got["location"] == f"{52 + 31/60 + 12.34/3600}, {13 + 24/60 + 56.78/3600}"
    assert got["date-created"] == "2023-06-15T14:30:00Z"


def test_exif_south_west_sign():
    jpg = build_exif_jpeg([(10, 1), (0, 1), (0, 1)], "S",
                          [(20, 1), (30, 1), (0, 1)], "W",
                          "2020:01:01 00:00:00")
    assert extract_exif(jpg)["location"] == "-10.0, -20.5"


def test_exif_zero_division_broken():
    jpg = build_exif_jpeg([(10, 0), (0, 1), (0, 1)], "N",
                          [(20, 1), (0, 1), (0, 1)], "E",
                          "2020:01:01 00:00:00")
    with pytest.raises(ExifBroken) as e:
        extract_exif(jpg)
    assert e.value.reason == "exifread_gps_zero_division_error"


def test_exif_in_analyze_kernel():
    jpg = build_exif_jpeg([(1, 1), (0, 1), (0, 1)], "N",
                          [(2, 1), (0, 1), (0, 1)], "E",
                          "2021:02:03 04:05:06")
    digest = analyze_blob("x", jpg)[0]
    assert digest["mime_type"] == "image/jpeg"
    assert digest["exif_location"] == "1.0, 2.0"
    assert digest["exif_date"] == "2021-02-03T04:05:06Z"


def test_pgp_flag():
    eml = (
        b"From: a@x.example\r\nTo: b@y.example\r\nSubject: secret\r\n"
        b"Content-Type: text/plain\r\n\r\n"
        b"-----BEGIN PGP MESSAGE-----\r\nhQEMA...\r\n-----END PGP MESSAGE-----\r\n"
    )
    meta = email_meta(parse_email_bytes(eml))
    assert meta["pgp"] is True
    assert "text" not in meta  # encrypted body yields no text
    digest = analyze_blob("x", eml)[0]
    assert digest["pgp"] is True
