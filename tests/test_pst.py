"""PST mailbox unpacking ([MS-PST] NDB/LTP/messaging subset over raw
bytes; reference unpacks via readpst, archives.py:155-170)."""

import hashlib
import struct
from datetime import datetime, timezone

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.pst_extract import (
    PstBroken,
    PstFile,
    build_pst,
    is_pst,
    unpack_pst,
)

MSGS = {
    "Inbox": [
        {"subject": "Hello", "body": "First body.\n\nSecond para.",
         "sender_name": "Jane Doe", "sender_email": "jane@example.com",
         "to": "Bob <bob@example.com>",
         "when": datetime(2024, 3, 1, 10, 0, tzinfo=timezone.utc)},
        {"subject": "Gädget — ünïcode", "body": "Ünïcode body",
         "sender_name": "Jo", "sender_email": "jo@x.example",
         "to": "a@b.example"},
    ],
    "Sent Items": [
        {"subject": "out", "body": "sent body", "sender_name": "Me",
         "sender_email": "me@example.com", "to": "you@example.com"},
    ],
}


def test_round_trip_folders_and_messages():
    pst = build_pst(MSGS)
    assert is_pst(pst)
    kids = unpack_pst(pst)
    names = [n for n, _ in kids]
    assert names == ["Inbox/1.eml", "Inbox/2.eml", "Sent Items/1.eml"]
    eml = kids[0][1].decode("utf-8")
    assert "From: Jane Doe <jane@example.com>" in eml
    assert "Subject: Hello" in eml
    assert "Date: Fri, 01 Mar 2024 10:00:00 +0000" in eml
    assert eml.endswith("First body.\n\nSecond para.\r\n")
    uni = kids[1][1].decode("utf-8")
    assert "Gädget — ünïcode" in uni


def test_analyze_routes_pst_and_extracts_children():
    pst = build_pst(MSGS)
    rows = analyze_blob(hashlib.sha3_256(pst).hexdigest(), pst)
    digest = rows[0]
    assert digest["mime_type"] == "application/x-hoover-pst"
    assert digest["status"] == "success"
    assert digest["n_children"] == 3
    child_names = [r["child_name"] for r in rows[1:]]
    assert child_names == ["Inbox/1.eml", "Inbox/2.eml", "Sent Items/1.eml"]


def test_pst_eml_children_parse_as_email():
    pst = build_pst(MSGS)
    kids = unpack_pst(pst)
    eml_rows = analyze_blob("x", kids[0][1])
    d = eml_rows[0]
    assert d["mime_type"] == "message/rfc822"
    assert d["subject"] == "Hello"
    assert d["text"] == "First body.\n\nSecond para."
    assert d["email_from"] and "jane@example.com" in d["email_from"][0]


def test_crypt_rejected():
    pst = bytearray(build_pst(MSGS))
    enc = bytearray(pst)
    enc[513] = 2  # NDB_CRYPT_CYCLIC — the one crypt mode still unsupported
    with pytest.raises(PstBroken) as e:
        PstFile(bytes(enc))
    assert e.value.reason == "pst_crypt_unsupported"


def test_garbage_is_broken_not_crash():
    assert not is_pst(b"plainly not a pst")
    with pytest.raises(PstBroken):
        PstFile(b"!BDN" + bytes(2000))


def test_subject_prefix_convention():
    """A stored SUBJECT with the 0x01 prefix byte is normalized; other
    string properties keep a leading 0x01 verbatim ([MS-PST] 2.5.3.1.1.1
    applies to PidTagSubject only)."""
    from hoover_snoop2_spark.operators.pst_extract import PT_UNICODE, _prop_str

    raw = (PT_UNICODE, "\x01\x05Hello".encode("utf-16-le"))
    assert _prop_str(raw, subject_prefix=True) == "Hello"
    assert _prop_str(raw) == "\x01\x05Hello"


def test_multi_block_heap_large_body():
    """Bodies past the HN block budget spill into a second heap block
    behind an XBLOCK data tree; HIDs carry the block index."""
    big_body = ("paragraph of text here. " * 300).strip()  # ~7 KB utf-16
    pst = build_pst({"Big": [
        {"subject": "large", "body": big_body,
         "sender_name": "A", "sender_email": "a@x.example", "to": "b@x.example"},
    ]})
    kids = unpack_pst(pst)
    assert kids[0][0] == "Big/1.eml"
    text = kids[0][1].decode("utf-8")
    assert text.endswith(big_body + "\r\n")
    assert "Subject: large" in text


def test_body_via_subnode_nid():
    """NID-typed HNID values resolve through the subnode BTree (the path
    Outlook uses for very large properties)."""
    body = "subnode body content " * 40
    pst = build_pst({"S": [
        {"subject": "via subnode", "body": body, "body_via_subnode": True,
         "sender_name": "A", "sender_email": "a@x.example",
         "to": "b@x.example"},
    ]})
    kids = unpack_pst(pst)
    assert len(kids) == 1
    text = kids[0][1].decode("utf-8")
    assert "Subject: via subnode" in text
    assert text.endswith(body + "\r\n")


def test_permute_crypt_round_trip():
    """NDB_CRYPT_PERMUTE (Outlook's default, [MS-PST] §5.1): an encoded
    PST extracts byte-identically to its NDB_CRYPT_NONE twin."""
    folders = {"Inbox": [
        {"subject": "Permuted", "body": "secret body text " * 50,
         "sender_name": "alice", "sender_email": "a@example.com",
         "to": "b@example.com"},
        {"subject": "Second", "body": "x", "body_via_subnode": True},
    ]}
    plain = build_pst(folders)
    encoded = build_pst(folders, crypt=1)
    assert plain != encoded                       # bytes actually differ
    assert encoded[513] == 1
    assert unpack_pst(encoded) == unpack_pst(plain)


def test_permute_tables_are_inverse_permutations():
    from hoover_snoop2_spark.operators.pst_extract import _MPBB_I, _MPBB_R

    assert sorted(_MPBB_R) == list(range(256))
    assert bytes(range(256)).translate(_MPBB_R).translate(_MPBB_I) == bytes(range(256))


def test_cyclic_crypt_still_honest():
    data = bytearray(build_pst({"Inbox": [{"subject": "s", "body": "b"}]}))
    data[513] = 2  # NDB_CRYPT_CYCLIC
    import pytest as _pytest

    from hoover_snoop2_spark.operators.pst_extract import PstBroken
    with _pytest.raises(PstBroken) as ei:
        unpack_pst(bytes(data))
    assert ei.value.reason == "pst_crypt_unsupported"


def test_attachments_extracted_as_mime_children():
    """Attachment subnode objects (PidTagAttachDataBinary + filenames)
    come out as multipart .eml parts, which the email fan-out re-explodes
    as byte-identical children — readpst's .eml-with-attachments →
    create_attachment_files chain (archives.py:155-170,
    filesystem.py:441-478)."""
    payload = b"%PDF-1.4 fake attachment bytes \x00\x01\x02" * 20
    folders = {"Inbox": [
        {"subject": "with files", "body": "see attached",
         "sender_name": "A", "sender_email": "a@x.example",
         "to": "b@x.example",
         "attachments": [
             {"name": "report.pdf", "mime": "application/pdf",
              "data": payload},
             {"name": "notes.txt", "mime": "text/plain",
              "data": b"attached note text"},
         ]},
        {"subject": "plain", "body": "no attachments"},
    ]}
    for crypt in (0, 1):
        pst = build_pst(folders, crypt=crypt)
        kids = unpack_pst(pst)
        assert [n for n, _ in kids] == ["Inbox/1.eml", "Inbox/2.eml"]
        eml = kids[0][1]
        assert b"multipart/mixed" in eml
        # the email fan-out path recovers the attachment bytes exactly
        rows = analyze_blob("k", eml)
        digest = rows[0]
        assert digest["mime_type"] == "message/rfc822"
        assert digest["text"].startswith("see attached")
        by_name = {r["child_name"]: r["child_data"] for r in rows[1:]}
        assert by_name["report.pdf"] == payload
        assert by_name["notes.txt"] == b"attached note text"
        # plain message unchanged by the feature
        plain_rows = analyze_blob("k", kids[1][1])
        assert plain_rows[0]["n_children"] == 0


def test_large_attachment_multiblock_heap():
    """An attachment past the HN split spills into a multi-block heap
    behind an XBLOCK — same path as large bodies."""
    payload = bytes(range(256)) * 40  # 10 KB
    pst = build_pst({"F": [
        {"subject": "big att", "body": "b",
         "attachments": [{"name": "blob.bin", "data": payload}]},
    ]})
    eml = unpack_pst(pst)[0][1]
    rows = analyze_blob("k", eml)
    by_name = {r["child_name"]: r["child_data"] for r in rows[1:]}
    assert by_name["blob.bin"] == payload


def test_ansi_format_round_trip():
    """ANSI (wVer 15, 32-bit NDB) mailboxes extract identically to their
    Unicode twins — header offsets, page trailers, entry widths, XBLOCK
    bids, and SLBLOCK layout all differ ([MS-PST] 2.2.2.6-2.2.2.8)."""
    pst = build_pst(MSGS, ansi=True)
    assert pst[10] == 15  # wVer ANSI
    assert unpack_pst(pst) == unpack_pst(build_pst(MSGS))


def test_ansi_permute_attachments_and_multiblock():
    """ANSI x PERMUTE x attachments x multi-block heap — every structural
    variant at once."""
    big_body = ("ansi paragraph text. " * 300).strip()
    folders = {"Inbox": [
        {"subject": "full fat", "body": big_body,
         "sender_name": "A", "sender_email": "a@x.example",
         "to": "b@x.example",
         "attachments": [{"name": "data.bin",
                          "data": bytes(range(256)) * 8}]},
        {"subject": "sub", "body": "via subnode", "body_via_subnode": True},
    ]}
    ref = unpack_pst(build_pst(folders))
    for crypt in (0, 1):
        got = unpack_pst(build_pst(folders, crypt=crypt, ansi=True))
        assert got == ref
    rows = analyze_blob("k", got[0][1])
    by_name = {r["child_name"]: r["child_data"] for r in rows[1:]}
    assert by_name["data.bin"] == bytes(range(256)) * 8
