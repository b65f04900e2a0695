"""Encrypted PDFs (operators/pdf_crypto.py) through the span pipeline.

Ground truth: the in-repo corpus PDF writer's golden text must come out
of the ENCRYPTED document identically — over the real extraction path —
for every handler revision; the U-entry verification gates the KDF the
same way the office/7z verifiers do (wrong password or divergence →
typed broken, never garbage).  No PDF tooling exists in this container,
so R2-R4/R6 are additionally pinned by spec-vector structure tests
(padded-password MD5 chain, owner-password unwrap, AESV2 sAlT key,
Algorithm 2.B loop termination).
"""

import hashlib

import pytest

from hoover_snoop2_spark.corpus import render_pdf
from hoover_snoop2_spark.functions.archive_crypto import (
    set_archive_password,
)
from hoover_snoop2_spark.operators.pdf_crypto import (
    PdfCryptoBroken,
    PdfDecryptor,
    encrypt_pdf,
    rc4,
)
from hoover_snoop2_spark.operators.pdf_spans import (
    PdfBroken,
    extract_pdf_page_spans,
    pdf_image_children,
    pdf_to_text,
)


@pytest.fixture(autouse=True)
def _no_default_password():
    set_archive_password(None)
    yield
    set_archive_password(None)


def _golden(doc_id=11):
    data, golden, _ = render_pdf(doc_id, "en")
    return data, golden


MODES = [
    dict(rev=3, aes=False),
    dict(rev=4, aes=False),
    dict(rev=4, aes=True),
    dict(rev=6, aes=True),
]


def test_rc4_known_vector():
    # public RC4 test vector (key "Key", plaintext "Plaintext")
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


@pytest.mark.parametrize("mode", MODES)
def test_empty_user_password_extracts(mode):
    """Owner-protected documents (empty user pw) extract with NO
    configured password — reference pdftotext parity."""
    data, golden = _golden()
    plain_text, _, _ = pdf_to_text(data)
    enc = encrypt_pdf(data, user_pw="", owner_pw="s3cret", **mode)
    text, pages, broken = pdf_to_text(enc)
    assert broken is None
    assert text == plain_text
    assert golden.split("\n\n")[0].split()[0] in text


@pytest.mark.parametrize("mode", MODES)
def test_user_password_required_and_accepted(mode):
    data, golden = _golden(12)
    plain_text, _, _ = pdf_to_text(data)
    enc = encrypt_pdf(data, user_pw="letmein", owner_pw="s3cret", **mode)
    # no password: typed broken
    text, pages, broken = pdf_to_text(enc)
    assert broken == "pdf_encrypted" and text is None
    # wrong password: typed broken
    set_archive_password("wrong")
    _, _, broken = pdf_to_text(enc)
    assert broken == "pdf_bad_password"
    # right password (user slot)
    set_archive_password("letmein")
    text, _, broken = pdf_to_text(enc)
    assert broken is None and text == plain_text


@pytest.mark.parametrize("mode", [m for m in MODES if m["rev"] < 5])
def test_owner_password_unwraps_user(mode):
    """R2-R4: the owner password RC4-unwraps /O into the user pw."""
    data, _ = _golden(13)
    plain_text, _, _ = pdf_to_text(data)
    enc = encrypt_pdf(data, user_pw="userpw", owner_pw="ownerpw", **mode)
    set_archive_password("ownerpw")
    text, _, broken = pdf_to_text(enc)
    assert broken is None and text == plain_text


def test_r6_owner_password_path():
    data, _ = _golden(14)
    plain_text, _, _ = pdf_to_text(data)
    enc = encrypt_pdf(data, user_pw="userpw", owner_pw="ownerpw", rev=6,
                      aes=True)
    set_archive_password("ownerpw")
    text, _, broken = pdf_to_text(enc)
    assert broken is None and text == plain_text


@pytest.mark.parametrize("mode", MODES)
def test_page_spans_decrypt(mode):
    data, _ = _golden(15)
    plain = extract_pdf_page_spans(data)
    enc = encrypt_pdf(data, user_pw="", owner_pw="s3cret", **mode)
    assert extract_pdf_page_spans(enc) == plain


def test_image_children_decrypt():
    # doc_id % 3 == 1 embeds a JPEG XObject
    data, _, _ = render_pdf(16, "en")
    plain_kids = pdf_image_children(data)
    assert plain_kids, "fixture must embed an image"
    enc = encrypt_pdf(data, user_pw="", owner_pw="s3cret", rev=4, aes=True)
    kids = pdf_image_children(enc)
    assert kids == plain_kids


def test_obj_key_aesv2_salt():
    """AESV2 per-object key appends sAlT ([PDF 1.7] Algorithm 1)."""
    d = PdfDecryptor(4, b"k" * 16, True)
    import struct

    want = hashlib.md5(
        b"k" * 16 + struct.pack("<I", 7)[:3] + struct.pack("<I", 0)[:2]
        + b"sAlT").digest()[:16]
    assert d._obj_key(7, 0) == want


def test_unsupported_handler_typed():
    data, _ = _golden(17)
    enc = encrypt_pdf(data, rev=3)
    bad = enc.replace(b"/Filter /Standard", b"/Filter /Custom00")
    with pytest.raises(PdfBroken) as ei:
        pdf_to_text_raise(bad)
    assert ei.value.reason == "pdf_crypt_unsupported"


def pdf_to_text_raise(data):
    text, pages, broken = pdf_to_text(data)
    if broken:
        raise PdfBroken(broken)
    return text


def test_pipeline_extracts_encrypted_pdf(spark, tmp_path):
    """e2e: an owner-protected PDF (empty user pw) extracts with no
    password; a user-protected one needs the closure-carried password."""
    from datetime import datetime, timezone

    import pyarrow as pa

    from hoover_snoop2_spark.corpus import PAGES_PA_SCHEMA
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    data, _, _ = render_pdf(21, "en")
    plain_text, _, _ = pdf_to_text(data)
    owner_only = encrypt_pdf(data, user_pw="", owner_pw="s3cret",
                             rev=4, aes=True)
    user_locked = encrypt_pdf(data, user_pw="letmein", owner_pw="s3cret",
                              rev=6, aes=True)
    t = pa.Table.from_pydict(
        {
            "url": ["https://x.example/owner.pdf",
                    "https://x.example/locked.pdf"],
            "warc_ts": [datetime(2024, 1, 1, tzinfo=timezone.utc)] * 2,
            "html": [owner_only, user_locked],
            "text": ["", ""],
            "lang": ["en", "en"],
        },
        schema=PAGES_PA_SCHEMA,
    )
    pages = spark.createDataFrame(t.to_pandas())
    out, _ = run_extraction(spark, pages,
                            checkpoint_dir=str(tmp_path / "ck"),
                            archive_password="letmein")
    rows = {r["url"]: r for r in out.collect()}
    assert rows["https://x.example/owner.pdf"]["text"] == plain_text
    assert rows["https://x.example/locked.pdf"]["text"] == plain_text


def test_plain_pdf_mentioning_encrypt_not_misclassified():
    """A document whose TEXT contains '/Encrypt 5 0 R' is not encrypted."""
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (/Encrypt 5 0 R) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"trailer\n<< /Root 9 0 R >>\n%%EOF\n")
    text, pages, broken = pdf_to_text(pdf)
    assert broken is None
    assert "/Encrypt 5 0 R" in text
