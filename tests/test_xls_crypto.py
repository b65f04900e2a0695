"""Encrypted .xls (FILEPASS RC4) — [MS-XLS] §2.2.10 / [MS-OFFCRYPTO]
§2.3.5-2.3.6 over the BIFF8 extractor.

The reference pipes encrypted .xls through Tika/POI, which auto-tries
Excel's default password VelvetSweatshop (snoop/data/analyzers/tika.py
surface); parity here is: default-password workbooks extract with no
configuration, custom passwords ride the worker-local channel, wrong
passwords surface typed broken reasons.
"""

import hashlib

import pytest

from hoover_snoop2_spark.functions.archive_crypto import set_archive_password
from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.xls_crypto import (
    XlsCryptoBroken,
    decrypt_workbook_stream,
    encrypt_xls,
    parse_filepass,
)
from hoover_snoop2_spark.operators.xls_extract import (
    XlsBroken,
    build_xls,
    is_xls,
    xls_to_table,
)

HEADER = ["name", "qty"]
ROWS = [["widget", "3"], ["gädget", "7"], ["x" * 2000, "9"]]


@pytest.fixture(autouse=True)
def _no_worker_password():
    set_archive_password(None)
    yield
    set_archive_password(None)


def _plain():
    return build_xls(HEADER, ROWS)


@pytest.mark.parametrize(
    "variant,key_bits",
    [("rc4", 128), ("capi", 40), ("capi", 128)],
)
def test_round_trip_matches_plain_path(variant, key_bits):
    plain = _plain()
    want = xls_to_table(plain)
    enc = encrypt_xls(plain, "VelvetSweatshop", variant=variant,
                      key_bits=key_bits)
    assert enc != plain and is_xls(enc)
    assert xls_to_table(enc) == want


def test_default_password_opens_without_configuration():
    # Excel's "encrypt with default" — Tika/POI parity: no password set,
    # still extracts
    enc = encrypt_xls(_plain(), "VelvetSweatshop")
    info, _kids = xls_to_table(enc)
    assert info["table-columns"] == HEADER


def test_custom_password_via_worker_channel():
    enc = encrypt_xls(_plain(), "hunter2", variant="capi", key_bits=128)
    with pytest.raises(XlsBroken) as ei:
        xls_to_table(enc)
    assert ei.value.reason == "xls_bad_password"
    set_archive_password("hunter2")
    info, _ = xls_to_table(enc)
    assert info["table-row-count"] == len(ROWS) + 1


def test_wrong_password_typed():
    enc = encrypt_xls(_plain(), "secret", variant="rc4")
    set_archive_password("not-it")
    with pytest.raises(XlsBroken) as ei:
        xls_to_table(enc)
    assert ei.value.reason == "xls_bad_password"


def test_xor_obfuscation_refused_typed():
    import struct

    with pytest.raises(XlsCryptoBroken) as ei:
        parse_filepass(struct.pack("<HHH", 0, 0xABCD, 0x1234))
    assert ei.value.reason == "xls_xor_unsupported"


def test_block_boundary_rekey():
    # the 2000-char cell pushes the SST payload across the 1024-byte
    # re-key boundary: value must survive intact
    enc = encrypt_xls(_plain(), "VelvetSweatshop", variant="capi",
                      key_bits=40)
    # (explode_row caps cell text ~1KiB; 1000 x's prove the decrypt
    # crossed the boundary intact — the SST record itself is >1024B)
    _info, kids = xls_to_table(enc)
    assert any("x" * 1000 in text for _n, text in kids)
    assert xls_to_table(enc) == xls_to_table(_plain())


def test_unencrypted_stream_passthrough():
    from hoover_snoop2_spark.operators.cfb import CompoundFile

    cf = CompoundFile(_plain())
    wb = cf.read(cf.paths()["Workbook"])
    assert decrypt_workbook_stream(wb, None) == wb


def test_analyze_routes_encrypted_xls():
    enc = encrypt_xls(_plain(), "VelvetSweatshop")
    rows = analyze_blob(hashlib.sha3_256(enc).hexdigest(), enc)
    digest = rows[0]
    assert digest["mime_type"] == "application/vnd.ms-excel"
    assert digest["table_row_count"] == len(ROWS) + 1
    assert rows[1]["child_name"] == "1.txt"
    assert b"name = widget" in rows[1]["child_data"]


def test_analyze_encrypted_xls_bad_password_broken():
    enc = encrypt_xls(_plain(), "s3cret")
    digest = analyze_blob(hashlib.sha3_256(enc).hexdigest(), enc)[0]
    assert digest["status"] == "broken"
    assert digest["broken_reason"] == "xls_bad_password"
