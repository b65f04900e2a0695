"""[MS-OFFCRYPTO] Agile-encrypted OOXML (operators/office_crypto.py).

No Office/msoffcrypto tooling exists in this container, so the ground
truth is structural: the verifier-hash chain ties decoder and writer to
the spec'd KDF (a divergence in either fails the password check), and
the inner bytes must parse as a real OOXML zip — on real files any
residual divergence degrades to a typed broken, never silent garbage.
"""

import io
import zipfile

import pytest

from hoover_snoop2_spark.functions.archive_crypto import (
    set_archive_password,
)
from hoover_snoop2_spark.operators.office_crypto import (
    OfficeCryptoBroken,
    decrypt_office,
    encrypt_office,
    is_encrypted_office,
)

PW = "open sesame"


@pytest.fixture(autouse=True)
def _no_default_password():
    set_archive_password(None)
    yield
    set_archive_password(None)


def _docx(marker: str = "hello encrypted doc") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", (
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types"><Default Extension="xml" ContentType="applicat'
            'ion/xml"/><Override PartName="/word/document.xml" ContentType'
            '="application/vnd.openxmlformats-officedocument.wordprocessin'
            'gml.document.main+xml"/></Types>'))
        z.writestr("word/document.xml", (
            '<w:document xmlns:w="http://schemas.openxmlformats.org/wordpr'
            f'ocessingml/2006/main"><w:body><w:p><w:r><w:t>{marker}</w:t>'
            '</w:r></w:p></w:body></w:document>'))
    return buf.getvalue()


@pytest.mark.parametrize("kw", [
    {}, {"key_bits": 128}, {"key_bits": 192},
    {"hash_alg": "SHA256"}, {"hash_alg": "SHA1"}, {"hash_alg": "SHA384"},
    {"spin": 1}, {"spin": 5000},
])
def test_roundtrip_matrix(kw):
    pkg = _docx()
    enc = encrypt_office(pkg, PW, **kw)
    assert is_encrypted_office(enc)
    assert not is_encrypted_office(pkg)
    assert decrypt_office(enc, PW) == pkg


def test_wrong_password_typed():
    enc = encrypt_office(_docx(), PW)
    with pytest.raises(OfficeCryptoBroken) as ei:
        decrypt_office(enc, "not it")
    assert ei.value.reason == "office_bad_password"


def test_multi_segment_package():
    pkg = _docx("x" * 9000)  # > 4096 after zip, multiple CBC segments
    big = pkg + bytes(10000)
    enc = encrypt_office(big, PW)
    assert decrypt_office(enc, PW) == big


@pytest.mark.parametrize("key_bits", [128, 192, 256])
def test_standard_binary_roundtrip(key_bits):
    """Office-2007 binary Standard descriptor: SHA-1 x50000 KDF,
    AES-ECB verifier + package."""
    from hoover_snoop2_spark.operators.office_crypto import (
        encrypt_office_standard)

    pkg = _docx("standard encrypted body")
    enc = encrypt_office_standard(pkg, PW, key_bits=key_bits)
    assert is_encrypted_office(enc)
    assert decrypt_office(enc, PW) == pkg
    with pytest.raises(OfficeCryptoBroken) as ei:
        decrypt_office(enc, "wrong")
    assert ei.value.reason == "office_bad_password"


def test_unknown_descriptor_typed():
    import struct

    enc = bytearray(encrypt_office(_docx(), PW))
    # EncryptionInfo begins at the first data sector (offset 512 in the
    # fixture CFB); overwrite its version with an unknown 5.4
    assert enc[512:514] == struct.pack("<H", 4)
    enc[512:514] = struct.pack("<H", 5)
    with pytest.raises(OfficeCryptoBroken) as ei:
        decrypt_office(bytes(enc), PW)
    assert ei.value.reason == "office_crypt_unsupported"


def test_analyze_blob_routes_protected():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    enc = encrypt_office(_docx(), PW)
    rows = analyze_blob("k", enc)
    digest = rows[0]
    assert digest["mime_type"] == "application/x-tika-ooxml-protected"
    assert digest["broken_reason"] == "office_encrypted"
    assert len(rows) == 1
    set_archive_password(PW)
    rows = analyze_blob("k", enc)
    assert rows[0].get("broken_reason") is None
    kids = [r for r in rows if r.get("kind") == "child"]
    assert [k["child_name"] for k in kids] == ["package"]
    assert kids[0]["child_data"][:2] == b"PK"


def test_pipeline_extracts_protected_docx(spark, tmp_path):
    """e2e: the child row re-analyzes as docx and yields the text."""
    from datetime import datetime, timezone

    import pyarrow as pa

    from hoover_snoop2_spark.corpus import PAGES_PA_SCHEMA
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    enc = encrypt_office(_docx("sealed document body"), PW)
    t = pa.Table.from_pydict(
        {
            "url": ["https://x.example/secret.docx"],
            "warc_ts": [datetime(2024, 1, 1, tzinfo=timezone.utc)],
            "html": [enc],
            "text": [""],
            "lang": ["en"],
        },
        schema=PAGES_PA_SCHEMA,
    )
    pages = spark.createDataFrame(t.to_pandas())
    out, _ = run_extraction(spark, pages,
                            checkpoint_dir=str(tmp_path / "ck"),
                            archive_password=PW)
    rows = {r["url"]: r for r in out.collect()}
    child = rows["https://x.example/secret.docx//package"]
    assert "sealed document body" in (child["text"] or "")
