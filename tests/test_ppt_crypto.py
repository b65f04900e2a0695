"""Encrypted .ppt ([MS-PPT] §2.3.5 persist-object CryptoAPI RC4) through
the text-atom extractor — completes the legacy-Office crypto triad."""

import hashlib
import struct

import pytest

from hoover_snoop2_spark.functions.archive_crypto import set_archive_password
from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.ppt_crypto import (
    TOKEN_ENCRYPTED,
    TOKEN_PLAIN,
    PptCryptoBroken,
    build_encrypted_ppt,
    current_user_token,
    decrypt_ppt_stream,
    ppt_is_encrypted,
)
from hoover_snoop2_spark.operators.ppt_extract import (
    PptBroken,
    build_ppt,
    is_ppt,
    ppt_to_text,
)

BLOCKS = ["First slide text", "Zwëite Folie", "third " + "pad " * 300]


@pytest.fixture(autouse=True)
def _no_worker_password():
    set_archive_password(None)
    yield
    set_archive_password(None)


@pytest.mark.parametrize("key_bits", [40, 128])
def test_round_trip_matches_plain_path(key_bits):
    want = ppt_to_text(build_ppt(BLOCKS))
    enc = build_encrypted_ppt(BLOCKS, "VelvetSweatshop", key_bits=key_bits)
    assert is_ppt(enc)
    assert ppt_to_text(enc) == want
    # both atom encodings survived (latin-1 TextBytes + utf-16 TextChars)
    assert "Zwëite Folie" in ppt_to_text(enc)


def test_custom_password_and_typed_wrong_password():
    enc = build_encrypted_ppt(BLOCKS, "hunter2")
    with pytest.raises(PptBroken) as ei:
        ppt_to_text(enc)
    assert ei.value.reason == "ppt_bad_password"
    set_archive_password("hunter2")
    assert ppt_to_text(enc) == ppt_to_text(build_ppt(BLOCKS))


def test_current_user_token():
    from hoover_snoop2_spark.operators.cfb import CompoundFile

    enc = build_encrypted_ppt(BLOCKS, "x")
    cf = CompoundFile(enc)
    cu = cf.read(cf.paths()["Current User"])
    assert current_user_token(cu) == TOKEN_ENCRYPTED
    assert ppt_is_encrypted(cu)
    # plain-token stream passes through undecrypted
    plain_cu = bytearray(cu)
    struct.pack_into("<I", plain_cu, 12, TOKEN_PLAIN)
    assert not ppt_is_encrypted(bytes(plain_cu))
    assert decrypt_ppt_stream(b"raw", bytes(plain_cu), "x") == b"raw"


def test_malformed_persist_chain_typed():
    from hoover_snoop2_spark.operators.cfb import CompoundFile

    enc = build_encrypted_ppt(BLOCKS, "x")
    cf = CompoundFile(enc)
    cu = bytearray(cf.read(cf.paths()["Current User"]))
    struct.pack_into("<I", cu, 16, 2 ** 30)  # offsetToCurrentEdit → junk
    with pytest.raises(PptCryptoBroken) as ei:
        decrypt_ppt_stream(cf.read(cf.paths()["PowerPoint Document"]),
                           bytes(cu), "x")
    assert ei.value.reason == "ppt_crypt_malformed"


def test_analyze_routes_encrypted_ppt():
    enc = build_encrypted_ppt(BLOCKS, "VelvetSweatshop")
    digest = analyze_blob(hashlib.sha3_256(enc).hexdigest(), enc)[0]
    assert digest["mime_type"] == "application/vnd.ms-powerpoint"
    assert "First slide text" in (digest.get("text") or "")


def test_analyze_encrypted_ppt_bad_password_broken():
    enc = build_encrypted_ppt(BLOCKS, "s3cret")
    digest = analyze_blob(hashlib.sha3_256(enc).hexdigest(), enc)[0]
    assert digest["status"] == "broken"
    assert digest["broken_reason"] == "ppt_bad_password"
