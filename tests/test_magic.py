"""MIME sniffing — mirrors the reference's 120-case parametrized mime table
(testsuite/test_blobs.py:31-124) with synthetic payloads."""

import gzip
import io
import zipfile

import pytest

from hoover_snoop2_spark.functions.magic import (
    detect_mime_encoding,
    looks_like_email,
    looks_like_mbox,
    sniff_bytes,
)


def _zip_bytes():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "x")
    return buf.getvalue()


CASES = [
    (b"%PDF-1.4 rest", "application/pdf"),
    (_zip_bytes(), "application/zip"),
    (gzip.compress(b"data"), "application/gzip"),
    (b"\x89PNG\r\n\x1a\n" + bytes(16), "image/png"),
    (b"\xff\xd8\xff\xe0" + bytes(16), "image/jpeg"),
    (b"GIF89a" + bytes(8), "image/gif"),
    (b"Rar!\x1a\x07\x00", "application/x-rar"),
    (b"7z\xbc\xaf\x27\x1c", "application/x-7z-compressed"),
    (b"<!DOCTYPE html><html><body>hi</body></html>", "text/html"),
    (b"<html><head></head></html>", "text/html"),
    (b"plain old text, nothing else", "text/plain"),
    (b"", "inode/x-empty"),
    (b"\x00\x01\x02garbage\x00", "application/octet-stream"),
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(8), "application/vnd.ms-excel"),
]


@pytest.mark.parametrize("data,want", CASES)
def test_signatures(data, want):
    mime, _ = sniff_bytes(data)
    assert mime == want


def test_email_override():
    eml = (
        b"From: a@b.example\r\nTo: c@d.example\r\nSubject: hi\r\n"
        b"Date: Mon, 01 Jan 2024 00:00:00 +0000\r\n\r\nbody\r\n"
    )
    assert looks_like_email(eml)
    mime, _ = sniff_bytes(eml)
    assert mime == "message/rfc822"


def test_mbox_needs_three_messages():
    one = b"From x@y Mon Jan 1 00:00:00 2024\nFrom: a@b\nDate: d\nSubject: s\n\nbody\n"
    assert not looks_like_mbox(one)
    assert not looks_like_mbox(one * 2)
    assert looks_like_mbox(one * 3)
    mime, _ = sniff_bytes(one * 3)
    assert mime == "application/mbox"


def test_emlx_override():
    emlx = b"1234\nFrom: a@b.example\nTo: c@d.example\nSubject: s\n\nbody"
    mime, _ = sniff_bytes(emlx)
    assert mime == "message/x-emlx"


@pytest.mark.parametrize(
    "data,want",
    [
        (b"pure ascii", "us-ascii"),
        ("héllo wörld".encode("utf-8"), "utf-8"),
        ("héllo".encode("latin-1"), "iso-8859-1"),
        (b"\xef\xbb\xbfbom text", "utf-8"),
        (b"\xff\xfet\x00e\x00", "utf-16"),
        (b"bin\x00ary", "binary"),
        (b"", "binary"),
    ],
)
def test_encoding_ladder(data, want):
    assert detect_mime_encoding(data) == want


def test_signature_dispatch_equals_full_scan():
    """The r6 first-byte dispatch must reproduce the full signature-table
    scan exactly: for every table entry, for adversarial prefixes, and
    for random bytes across all 256 first-byte values."""
    import random

    from hoover_snoop2_spark.functions.magic import _SIGNATURES, sniff_bytes

    def full_scan(data):
        for offset, sig, mt in _SIGNATURES:
            if data[offset:offset + len(sig)] == sig:
                return mt
        return None

    def dispatch_scan(data):
        from hoover_snoop2_spark.functions.magic import _SIG_DISPATCH
        for offset, sig, mt in _SIG_DISPATCH[data[0]]:
            if data[offset:offset + len(sig)] == sig:
                return mt
        return None

    rng = random.Random(42)
    cases = []
    for offset, sig, _mt in _SIGNATURES:
        pad = bytes(rng.randrange(256) for _ in range(offset))
        cases.append(pad + sig)                       # exact match
        cases.append(pad + sig + b"tail")             # match + tail
        if len(sig) > 1:
            cases.append(pad + sig[:-1])              # truncated — no match
    for b in range(256):
        cases.append(bytes([b]))
        cases.append(bytes([b]) + bytes(rng.randrange(256) for _ in range(300)))
    for data in cases:
        assert dispatch_scan(data) == full_scan(data), data[:16]
    # the tar signature (non-zero offset) must stay reachable from any
    # first byte
    tar = bytes(257) + b"ustar"
    assert dispatch_scan(tar) == full_scan(tar) == "application/x-tar"
    assert sniff_bytes(tar)[0] == "application/x-tar"
