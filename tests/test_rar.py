"""RAR container parsing (public RAR4/RAR5 block formats; stored members
only — the reference shells to `7z x`, archives.py:173-203)."""

import hashlib

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.rar_extract import (
    RarBroken,
    build_rar4,
    build_rar5,
    is_rar,
    unpack_rar,
)

MEMBERS = [
    ("docs/a.txt", b"alpha text " * 30),
    ("b.bin", bytes(range(256))),
    ("nested/deep/c.txt", b"third"),
]


@pytest.mark.parametrize("build", [build_rar4, build_rar5])
def test_stored_round_trip(build):
    data = build(MEMBERS)
    assert is_rar(data)
    assert unpack_rar(data) == MEMBERS


@pytest.mark.parametrize("build", [build_rar4, build_rar5])
def test_compressed_method_honest(build):
    data = build(MEMBERS, method=3)
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_method_unsupported"


def test_rar4_encrypted_flag():
    data = bytearray(build_rar4([("x", b"y")]))
    # set the PASSWORD flag on the file block and re-checksum is not
    # needed (reader does not verify header CRCs)
    idx = data.find(b"x", 7) - 41  # block start: 2 crc before type byte
    # simpler: rebuild with flag by patching flags of the file block
    from hoover_snoop2_spark.operators import rar_extract as rx

    blk = rx._r4_block(rx._R4_FILE, rx._R4_FLAG_ADD_SIZE | rx._R4_FLAG_PASSWORD,
                       bytes(25) + b"x")
    raw = rx._SIG4 + rx._r4_block(rx._R4_MAIN, 0, bytes(6)) + blk
    with pytest.raises(RarBroken) as e:
        unpack_rar(raw)
    assert e.value.reason == "rar_encrypted"


def test_analyze_routes_rar():
    data = build_rar5(MEMBERS)
    rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
    digest = rows[0]
    assert digest["mime_type"] == "application/x-rar"
    assert digest["status"] == "success"
    assert digest["n_children"] == 3
    assert [r["child_name"] for r in rows[1:]] == [n for n, _ in MEMBERS]
    assert rows[2]["child_data"] == MEMBERS[1][1]


def test_analyze_compressed_rar_broken_reason():
    data = build_rar4(MEMBERS, method=3)
    rows = analyze_blob("k", data)
    assert rows[0]["status"] == "broken"
    assert rows[0]["broken_reason"] == "rar_method_unsupported"


def test_truncated_rar_is_broken():
    """Truncation inside a file block (header or payload) is an error;
    truncation at an exact block boundary just ends the listing."""
    data = build_rar4(MEMBERS)
    with pytest.raises(RarBroken):
        unpack_rar(data[:40])  # inside the first file header/payload
