"""Encrypted .doc ([MS-DOC] §2.2.6 RC4, both ladders) through the piece-
table extractor, plus typed detection of encrypted .ppt.

The reference routes encrypted legacy Office to Tika/POI
(snoop/data/analyzers/tika.py), which tries the VelvetSweatshop default
transparently — parity mirrors test_xls_crypto.py.
"""

import hashlib
import struct

import pytest

from hoover_snoop2_spark.functions.archive_crypto import set_archive_password
from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.doc_crypto import (
    DocCryptoBroken,
    decrypt_doc_streams,
    doc_is_encrypted,
    encrypt_doc,
)
from hoover_snoop2_spark.operators.doc_extract import (
    DocBroken,
    build_doc_file,
    doc_to_text,
    is_word_doc,
)

PARAS = [
    "Hello wörld.",
    "Second paragraph long enough to cross the 512-byte Word re-key "
    "boundary. " + "pad " * 200,
]


@pytest.fixture(autouse=True)
def _no_worker_password():
    set_archive_password(None)
    yield
    set_archive_password(None)


def _plain(compressed=False):
    return build_doc_file(PARAS, compressed=compressed)


@pytest.mark.parametrize(
    "variant,key_bits",
    [("rc4", 128), ("capi", 40), ("capi", 128)],
)
def test_round_trip_matches_plain_path(variant, key_bits):
    plain = _plain()
    want = doc_to_text(plain)
    enc = encrypt_doc(plain, "VelvetSweatshop", variant=variant,
                      key_bits=key_bits)
    assert enc != plain and is_word_doc(enc)
    assert doc_to_text(enc) == want


def test_compressed_cp1252_pieces_round_trip():
    plain = _plain(compressed=True)
    enc = encrypt_doc(plain, "VelvetSweatshop", variant="capi", key_bits=40)
    assert doc_to_text(enc) == doc_to_text(plain)


def test_custom_password_and_typed_wrong_password():
    plain = _plain()
    enc = encrypt_doc(plain, "hunter2", variant="rc4")
    with pytest.raises(DocBroken) as ei:
        doc_to_text(enc)
    assert ei.value.reason == "doc_bad_password"
    set_archive_password("hunter2")
    assert doc_to_text(enc) == doc_to_text(plain)


def test_doc_is_encrypted_flag():
    from hoover_snoop2_spark.operators.cfb import CompoundFile

    plain = _plain()
    assert not doc_is_encrypted(
        CompoundFile(plain).read(CompoundFile(plain).paths()["WordDocument"]))
    enc = encrypt_doc(plain, "x")
    cf = CompoundFile(enc)
    assert doc_is_encrypted(cf.read(cf.paths()["WordDocument"]))


def test_decrypt_passthrough_when_plain():
    wd = bytearray(68)
    struct.pack_into("<H", wd, 0x0A, 0)
    assert decrypt_doc_streams(bytes(wd), b"tbl", None) == \
        (bytes(wd), b"tbl", None)


def test_xor_obfuscated_refused_typed():
    wd = bytearray(68)
    struct.pack_into("<H", wd, 0x0A, 0x0100 | 0x8000)
    with pytest.raises(DocCryptoBroken) as ei:
        decrypt_doc_streams(bytes(wd), b"\x00" * 64, "pw")
    assert ei.value.reason == "doc_xor_unsupported"


def test_analyze_routes_encrypted_doc():
    enc = encrypt_doc(_plain(), "VelvetSweatshop")
    digest = analyze_blob(hashlib.sha3_256(enc).hexdigest(), enc)[0]
    assert digest["mime_type"] == "application/msword"
    assert "Hello wörld." in (digest.get("text") or "")


def test_analyze_encrypted_doc_bad_password_broken():
    enc = encrypt_doc(_plain(), "s3cret")
    digest = analyze_blob(hashlib.sha3_256(enc).hexdigest(), enc)[0]
    assert digest["status"] == "broken"
    assert digest["broken_reason"] == "doc_bad_password"


def test_encrypted_ppt_typed():
    from hoover_snoop2_spark.operators.ppt_extract import (
        PptBroken,
        build_ppt,
        ppt_to_text,
    )
    from hoover_snoop2_spark.operators.cfb import CompoundFile
    from hoover_snoop2_spark.operators.doc_extract import _build_cfb

    plain = build_ppt(["slide text"])
    assert ppt_to_text(plain) == "slide text"
    cf = CompoundFile(plain)
    stream = cf.read(cf.paths()["PowerPoint Document"])
    # prepend a DocumentEncryptionAtom record header (0x2F14) — recVer
    # 0xF per [MS-PPT] §2.3.5.1 (container-shaped), the real-file shape
    # for decks with no readable Current User stream
    atom = struct.pack("<HHI", 0x000F, 0x2F14, 4) + b"\x00" * 4
    enc = _build_cfb([("PowerPoint Document", atom + stream)])
    with pytest.raises(PptBroken) as ei:
        ppt_to_text(enc)
    assert ei.value.reason == "ppt_encrypted"
