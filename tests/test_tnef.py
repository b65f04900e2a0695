"""TNEF (winmail.dat) decode — [MS-OXTNEF] attribute walk, checksum
enforcement, the three body carriers, MAPI prop parsing, and the
analyze-dispatch fan-out (the reference Tika-parses
application/vnd.ms-tnef, _tika_mime_types.py:526)."""

import struct

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.tnef_extract import (
    TnefBroken,
    build_tnef,
    looks_like_tnef,
    parse_mapi_props,
    parse_tnef,
)


def _tnef(**kw):
    kw.setdefault("subject", "Weekly sync")
    kw.setdefault("body", "Agenda attached, see you Monday.")
    kw.setdefault("sender", "pm@corp.example")
    kw.setdefault("attachments", [("agenda.txt", b"1. status 2. risks")])
    kw.setdefault("date", (2021, 6, 7, 9, 30, 0))
    return build_tnef(**kw)


def test_round_trip_plain():
    got = parse_tnef(_tnef())
    assert got["subject"] == "Weekly sync"
    assert got["text"] == "Agenda attached, see you Monday."
    assert got["from"] == ["pm@corp.example"]
    assert got["date"] == "2021-06-07T09:30:00Z"
    assert got["attachments"] == [("agenda.txt", b"1. status 2. risks")]


@pytest.mark.parametrize("mode", ["html", "rtf"])
def test_round_trip_rich_bodies(mode):
    # html/rtf bodies travel ONLY in MAPI props (PidTagHtml / LZFu
    # PidTagRtfCompressed) — the carrier priority parse_msg uses
    got = parse_tnef(_tnef(body="Rich body with ünïcode.", body_mode=mode))
    assert got["text"] == "Rich body with ünïcode."


def test_long_filename_overrides_title():
    # attAttachTitle carries the 8.3 short name; the attAttachment MAPI
    # PidTagAttachLongFilename must win
    data = _tnef(attachments=[("quarterly report final.docx", b"x" * 10)])
    got = parse_tnef(data)
    assert got["attachments"][0][0] == "quarterly report final.docx"


def test_checksum_enforced():
    raw = bytearray(_tnef())
    raw[-10] ^= 0x40  # flip a data byte inside the last attribute
    with pytest.raises(TnefBroken) as e:
        parse_tnef(bytes(raw))
    assert e.value.reason == "tnef_checksum"


def test_truncation_typed():
    raw = _tnef()
    for cut in (5, 7, len(raw) // 2, len(raw) - 1):
        with pytest.raises(TnefBroken) as e:
            parse_tnef(raw[:cut])
        assert e.value.reason.startswith("tnef_")


def test_bad_signature():
    assert not looks_like_tnef(b"\x00" * 16)
    with pytest.raises(TnefBroken) as e:
        parse_tnef(b"\x00" * 16)
    assert e.value.reason == "tnef_bad_signature"


def test_mapi_named_property_skipped():
    # a named property (pid >= 0x8000) precedes the one we care about;
    # the GUID+kind header must be stepped over, not mis-read as values
    guid = bytes(range(16))
    blob = struct.pack("<I", 2)
    blob += struct.pack("<I", (0x8123 << 16) | 0x0003) + guid
    blob += struct.pack("<III", 0, 0x99, 0x42)  # kind=0, dispid, value 0x42
    body = "named props ok".encode("cp1252") + b"\x00"
    blob += struct.pack("<I", (0x1000 << 16) | 0x001E)
    blob += struct.pack("<II", 1, len(body)) + body + b"\x00" * (-len(body) % 4)
    props = parse_mapi_props(blob)
    assert props[0x1000] == "named props ok"
    assert props[0x8123] == 0x42


def test_unknown_mapi_type_is_typed():
    blob = struct.pack("<I", 1) + struct.pack("<I", (0x1000 << 16) | 0x00FE)
    with pytest.raises(TnefBroken) as e:
        parse_mapi_props(blob)
    assert e.value.reason == "tnef_mapi_type_00fe"


def test_analyze_routes_tnef():
    data = _tnef()
    rows = analyze_blob("k", data)
    digest = rows[0]
    assert digest["mime_type"] == "application/vnd.ms-tnef"
    assert digest["subject"] == "Weekly sync"
    assert digest["email_from"] == ["pm@corp.example"]
    assert digest["text"] == "Agenda attached, see you Monday."
    assert rows[1]["child_name"] == "agenda.txt"
    assert rows[1]["child_data"] == b"1. status 2. risks"


def test_attachment_recursion_through_analyze():
    # a TNEF attachment that is ITSELF a parseable document (html) must
    # surface as a child that the pipeline can recurse into
    inner = b"<html><body><p>Inner page text.</p></body></html>"
    rows = analyze_blob("k", _tnef(attachments=[("page.html", inner)]))
    child = rows[1]
    inner_rows = analyze_blob("k2", child["child_data"])
    assert inner_rows[0]["mime_type"] == "text/html"
    assert "Inner page text." in inner_rows[0]["text"]
