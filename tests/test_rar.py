"""RAR container parsing (public RAR4/RAR5 block formats; RAR5 and
RAR4/RAR29-LZ compressed members decode natively via
functions/rar5_codec.py and functions/rar29_codec.py — the reference
shells to `7z x`, archives.py:173-203)."""

import hashlib
import random

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


def test_rar4_compressed_method_honest():
    """An out-of-range method claim (not store, not 0x31-0x35) refuses
    typed rather than guessing a decoder."""
    data = build_rar4(MEMBERS, method=3)
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_method_unsupported"


@pytest.mark.parametrize("method", [1, 3, 5])
def test_rar5_compressed_round_trip(method):
    """All RAR5 method values decode through the one LZ scheme."""
    data = build_rar5(MEMBERS, method=method)
    assert unpack_rar(data) == MEMBERS
    assert len(data) < sum(len(b) for _, b in MEMBERS) + 200


def test_rar5_corrupt_stream_never_silent():
    """A flipped payload byte surfaces as a typed error (structure or
    CRC), never as silently-wrong member bytes."""
    rng = random.Random(1)
    payload = bytes(rng.randrange(256) for _ in range(2000)) * 2
    base = build_rar5([("m.bin", payload)], method=3)
    for flip in (len(base) // 2, len(base) - 20):
        data = bytearray(base)
        data[flip] ^= 0xFF
        try:
            got = unpack_rar(bytes(data))
        except RarBroken as e:
            assert e.reason in ("rar_error", "rar_crc_mismatch",
                                "rar_method_unsupported")
        else:
            # flip landed outside this member's stream/crc coverage
            assert got == [("m.bin", payload)]


def test_rar5_solid_refused():
    """comp_info solid bit (0x40) → typed refusal: the member's LZ
    window starts inside the PREVIOUS member; decoding standalone would
    be silently wrong."""
    from hoover_snoop2_spark.operators import rar_extract as rx

    data = bytearray(build_rar5([("a.txt", b"payload bytes")], method=1))
    # comp_info vint in the file block: locate by rebuilding with the
    # solid bit via the writer internals
    import struct
    import zlib

    from hoover_snoop2_spark.functions.rar5_codec import rar5_compress

    payload = b"payload bytes"
    packed = rar5_compress(payload)
    body = (
        rx._vint(0x0004)
        + rx._vint(len(payload))
        + rx._vint(0)
        + struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
        + rx._vint((1 << 7) | 0x40 | (5 << 10))  # method 1 + SOLID
        + rx._vint(0)
        + rx._vint(len(b"a.txt"))
        + b"a.txt"
    )
    raw = (rx._SIG5 + rx._r5_block(rx._R5_MAIN, 0, rx._vint(0))
           + rx._r5_block(rx._R5_FILE, 0x0002, body, packed)
           + rx._r5_block(rx._R5_END, 0, rx._vint(0)))
    with pytest.raises(RarBroken) as e:
        unpack_rar(raw)
    assert e.value.reason == "rar_solid_unsupported"


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


@pytest.mark.parametrize("method", [0x31, 0x33, 0x35])
def test_rar4_compressed_round_trip(method):
    """RAR4 LZ (RAR29) members decode natively; PPMd/VM halves refuse
    typed (test_rar29_codec.py)."""
    data = build_rar4(MEMBERS, method=method)
    assert unpack_rar(data) == MEMBERS
    assert len(data) < sum(len(b) for _, b in MEMBERS) + 200


def test_rar4_old_scheme_version_refused():
    data = build_rar4(MEMBERS, method=0x33, unp_ver=20)  # RAR 2.0
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_method_unsupported"


def test_rar4_solid_refused():
    from hoover_snoop2_spark.operators import rar_extract as rx
    from hoover_snoop2_spark.functions.rar29_codec import rar29_compress
    import struct
    import zlib

    payload = b"solid member payload"
    packed = rar29_compress(payload)
    body = struct.pack(
        "<IIBIIBBHI",
        len(packed), len(payload), 0,
        zlib.crc32(payload) & 0xFFFFFFFF, 0, 29, 0x33,
        len(b"a.txt"), 0x20,
    ) + b"a.txt"
    raw = (rx._SIG4 + rx._r4_block(rx._R4_MAIN, 0, bytes(6))
           + rx._r4_block(rx._R4_FILE,
                          rx._R4_FLAG_ADD_SIZE | 0x0010, body)  # SOLID
           + packed + rx._r4_block(rx._R4_END, 0, b""))
    with pytest.raises(RarBroken) as e:
        unpack_rar(raw)
    assert e.value.reason == "rar_solid_unsupported"


def test_rar4_compressed_corrupt_never_silent():
    import random as _r

    rng = _r.Random(4)
    payload = bytes(rng.randrange(256) for _ in range(2000)) * 2
    base = build_rar4([("m.bin", payload)], method=0x33)
    for flip in (len(base) // 2, len(base) - 30):
        data = bytearray(base)
        data[flip] ^= 0xFF
        try:
            got = unpack_rar(bytes(data))
        except RarBroken as e:
            assert e.reason in ("rar_error", "rar_crc_mismatch",
                                "rar_method_unsupported",
                                "rar_ppmd_unsupported",
                                "rar_filter_unsupported",
                                "rar_solid_unsupported")
        else:
            assert got == [("m.bin", payload)]


# --- RAR5 file-data encryption (r5) ---------------------------------------


@pytest.fixture
def _pw():
    from hoover_snoop2_spark.functions import archive_crypto as C

    C.set_archive_password(None)
    yield C
    C.set_archive_password(None)


@pytest.mark.parametrize("method", [0, 3])
def test_rar5_encrypted_round_trip(method, _pw):
    data = build_rar5(MEMBERS, method=method, password="hunter2",
                      kdf_log2=12)
    _pw.set_archive_password("hunter2")
    assert unpack_rar(data) == MEMBERS


def test_rar5_encrypted_no_password_typed(_pw):
    data = build_rar5(MEMBERS, password="hunter2", kdf_log2=12)
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_encrypted"


def test_rar5_encrypted_wrong_password_typed(_pw):
    data = build_rar5(MEMBERS, password="hunter2", kdf_log2=12)
    _pw.set_archive_password("not it")
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_bad_password"


def test_rar5_encrypted_macd_checksum_guards_decode(_pw):
    """The stored checksum of an encrypted file is the HMAC'd variant —
    a flipped ciphertext byte must surface typed even though the
    password check passes."""
    data = bytearray(build_rar5([("m.bin", bytes(range(256)) * 8)],
                                password="pw", kdf_log2=12))
    _pw.set_archive_password("pw")
    data[len(data) - 40] ^= 0xFF  # inside the encrypted data area
    with pytest.raises(RarBroken) as e:
        unpack_rar(bytes(data))
    assert e.value.reason in ("rar_crc_mismatch", "rar_error")


def test_rar5_kdf_continuation_is_pbkdf2():
    """The base key must equal stdlib PBKDF2 at 2^count iterations —
    the hash-key/check values are the same block CONTINUED 16+16
    iterations further."""
    import hashlib

    from hoover_snoop2_spark.operators.rar_extract import _rar5_kdf

    key, hash_key, check_full = _rar5_kdf("pw", b"s" * 16, 10)
    assert key == hashlib.pbkdf2_hmac("sha256", b"pw", b"s" * 16, 1 << 10)
    assert key != hash_key != check_full


# --- RAR4 (RAR3-scheme) file-data encryption (r5) -------------------------


@pytest.mark.parametrize("method", [0x30, 0x33])
def test_rar4_encrypted_round_trip(method, _pw):
    data = build_rar4(MEMBERS, method=method, password="hunter2")
    _pw.set_archive_password("hunter2")
    assert unpack_rar(data) == MEMBERS


def test_rar4_encrypted_no_password_typed(_pw):
    data = build_rar4(MEMBERS, password="hunter2")
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_encrypted"


@pytest.mark.parametrize("method", [0x30, 0x33])
def test_rar4_encrypted_wrong_password_typed(method, _pw):
    """No check value in RAR3 crypto: a wrong key is caught by the CRC
    (stored) or by the decoder's structure checks (compressed) — both
    report rar_bad_password."""
    data = build_rar4(MEMBERS, method=method, password="hunter2")
    _pw.set_archive_password("not it")
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_bad_password"


def test_rar3_kdf_iv_comes_from_running_digest():
    """Pin the KDF's shape: same password+salt reproduces; different
    salt changes both key and iv; iv bytes are drawn at 2^14 strides."""
    from hoover_snoop2_spark.operators.rar_extract import _rar3_keys

    k1, iv1 = _rar3_keys("pw", b"saltsalt")
    k2, iv2 = _rar3_keys("pw", b"saltsalt")
    k3, iv3 = _rar3_keys("pw", b"SALTSALT")
    assert (k1, iv1) == (k2, iv2)
    assert k1 != k3 and iv1 != iv3
    assert len(k1) == 16 and len(iv1) == 16


@pytest.mark.parametrize("method", [0, 3])
def test_rar5_header_encrypted_round_trip(method, _pw):
    """-hp layout: ENCRYPTION block + every subsequent block header
    wrapped as IV + AES-256-CBC; file data carries its own record."""
    data = build_rar5(MEMBERS, method=method, password="hunter2",
                      kdf_log2=12, encrypt_headers=True)
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)  # no password
    assert e.value.reason == "rar_encrypted"
    _pw.set_archive_password("wrong")
    with pytest.raises(RarBroken) as e:
        unpack_rar(data)
    assert e.value.reason == "rar_bad_password"
    _pw.set_archive_password("hunter2")
    assert unpack_rar(data) == MEMBERS


def test_rar5_corrupt_extra_size_no_negative_index(_pw):
    """A corrupted extra_size must not wrap to Python negative indexing
    inside the extra-area walk (fuzz-found in r5) — typed error only."""
    import random as _r

    rng = _r.Random(5)
    _pw.set_archive_password("pw")
    bases = [
        build_rar5([("a", b"q" * 300)], method=3, password="pw",
                   kdf_log2=10),
        build_rar5([("a", b"q" * 300)], password="pw", kdf_log2=10,
                   encrypt_headers=True),
    ]
    for base in bases:
        for _ in range(300):
            m = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                unpack_rar(bytes(m))
            except RarBroken:
                pass
