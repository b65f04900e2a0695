"""Outlook .msg extraction via the in-process CFB reader (replaces the
reference's msgconvert subprocess, email.py:281-307)."""

import hashlib

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.cfb import CompoundFile
from hoover_snoop2_spark.operators.msg_extract import (
    build_msg,
    looks_like_msg,
    parse_msg,
)


def _msg():
    return build_msg(
        subject="Quarterly numbers",
        body="Hello team, please find attached.",
        sender="ceo@corp.example",
        to=["a@corp.example", "b@corp.example"],
        attachments=[("report.txt", b"the report body")],
    )


def test_parse_round_trip():
    got = parse_msg(_msg())
    assert got["subject"] == "Quarterly numbers"
    assert got["from"] == ["ceo@corp.example"]
    assert got["to"] == ["a@corp.example", "b@corp.example"]
    assert got["attachments"] == [("report.txt", b"the report body")]


def test_cfb_paths():
    cf = CompoundFile(_msg())
    paths = cf.paths()
    assert "__substg1.0_0037001F" in paths
    assert any(p.startswith("__attach_version1.0_#00000000/") for p in paths)


def test_analyze_routes_msg():
    data = _msg()
    rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
    digest = rows[0]
    assert digest["mime_type"] == "application/vnd.ms-outlook"
    assert digest["subject"] == "Quarterly numbers"
    assert digest["email_from"] == ["ceo@corp.example"]
    assert digest["text"] == "Hello team, please find attached."
    # attachment fans out as a child doc
    assert rows[1]["child_name"] == "report.txt"
    assert rows[1]["child_data"] == b"the report body"


def test_plain_ole_not_msg():
    # OLE magic but no MAPI streams → stays ms-excel, no crash
    fake = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(1024)
    assert not looks_like_msg(fake)
    digest = analyze_blob("x", fake)[0]
    assert digest["mime_type"] == "application/vnd.ms-excel"
    assert digest["status"] in ("success", "broken")


def test_lzfu_roundtrip_and_edge_cases():
    """[MS-OXRTFCP] codec: greedy compressor exercises dictionary
    references (including the pre-loaded RTF prefix); decoder verifies
    CRC and honors the MELA uncompressed variant."""
    import struct

    import pytest

    from hoover_snoop2_spark.operators.msg_extract import (
        LzfuError,
        compress_lzfu,
        decompress_lzfu,
    )

    samples = [
        b"",
        b"{\\rtf1\\ansi hello}",
        b"{\\rtf1\\ansi " + b"repeat me! " * 300 + b"}",
        bytes(range(256)) * 20,
        b"a" * 9000,
    ]
    for s in samples:
        assert decompress_lzfu(compress_lzfu(s)) == s
    # the prefix-dictionary savings are real: an RTF-ish payload
    # compresses below raw size
    rtf = b"{\\rtf1\\ansi\\deff0 the quick brown fox}" * 50
    assert len(compress_lzfu(rtf)) < len(rtf)
    # MELA uncompressed variant
    raw = b"{\\rtf1 plain}"
    mela = struct.pack("<4I", len(raw) + 12, len(raw), 0x414C454D, 0) + raw
    assert decompress_lzfu(mela) == raw
    # corrupted CRC refuses
    enc = bytearray(compress_lzfu(b"{\\rtf1 x}"))
    enc[12] ^= 0xFF
    with pytest.raises(LzfuError):
        decompress_lzfu(bytes(enc))
    with pytest.raises(LzfuError):
        decompress_lzfu(b"\x00\x01")


def test_msg_html_and_rtf_bodies():
    """Rich-text .msg (the Outlook default) stores the body as
    PidTagHtml or LZFu PidTagRtfCompressed instead of PidTagBody — both
    must extract the same text (reference parity: msgconvert feeds these
    through the eml path, email.py:281-307)."""
    for mode in ("html", "rtf"):
        data = build_msg(
            subject="Rich",
            body="the rich body text with diacritics și gânduri",
            sender="x@corp.example",
            to=["y@corp.example"],
            body_mode=mode,
        )
        got = parse_msg(data)
        assert got["text"] == "the rich body text with diacritics și gânduri", mode
    # plain PidTagBody wins over rich streams when present (priority)
    plain = build_msg("s", "plain body", "a@x", ["b@y"], body_mode="plain")
    assert parse_msg(plain)["text"] == "plain body"
