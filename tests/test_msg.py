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
