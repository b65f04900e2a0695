"""Legacy .ppt extraction ([MS-PPT] text atoms over CFB)."""

import hashlib

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.ppt_extract import (
    build_ppt,
    is_ppt,
    ppt_to_text,
)


def test_round_trip_ascii_and_unicode():
    blocks = ["Hello slide one", "Gädget slide — two", "third"]
    ppt = build_ppt(blocks)
    assert is_ppt(ppt)
    assert ppt_to_text(ppt) == "Hello slide one\n\nGädget slide — two\n\nthird"


def test_analyze_routes_ppt():
    ppt = build_ppt(["title text", "body text"])
    rows = analyze_blob(hashlib.sha3_256(ppt).hexdigest(), ppt)
    digest = rows[0]
    assert digest["mime_type"] == "application/vnd.ms-powerpoint"
    assert digest["text"] == "title text\n\nbody text"
    assert digest["status"] == "success"


def test_non_ppt_ole_not_claimed():
    fake = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(1024)
    assert not is_ppt(fake)


def test_empty_document_stream():
    ppt = build_ppt([])
    assert ppt_to_text(ppt) == ""
