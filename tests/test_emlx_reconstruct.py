"""`.partial.emlx` sibling reconstruction (emlx.py:14-58 semantics)."""

from hoover_snoop2_spark.operators.email_parse import email_meta, parse_email_bytes
from hoover_snoop2_spark.operators.emlx_reconstruct import (
    reconstruct_emlx,
    reconstruct_emlx_bytes,
)


def _partial_emlx():
    body = (
        b"From: a@x.example\r\n"
        b"To: b@y.example\r\n"
        b"Subject: apple mail\r\n"
        b'Content-Type: multipart/mixed; boundary="B"\r\n\r\n'
        b"--B\r\n"
        b"Content-Type: text/plain\r\n\r\n"
        b"visible body text\r\n"
        b"--B\r\n"
        b"Content-Type: application/octet-stream\r\n"
        b'Content-Disposition: attachment; filename="big.bin"\r\n'
        b"X-Apple-Content-Length: 11\r\n\r\n"
        b"\r\n"
        b"--B--\r\n"
    )
    emlx = str(len(body)).encode() + b"\n" + body + b"<plist/>"
    parts = {"7.2.emlxpart": b"PAYLOAD-BYTES"}
    return emlx, parts


def test_reconstruct_bytes():
    emlx, parts = _partial_emlx()
    fixed = reconstruct_emlx_bytes("7.partial.emlx", emlx, parts)
    meta = email_meta(parse_email_bytes(fixed))
    assert meta["text"] == "visible body text"
    assert b"PAYLOAD-BYTES" in fixed


def test_missing_part_skipped():
    emlx, _ = _partial_emlx()
    fixed = reconstruct_emlx_bytes("7.partial.emlx", emlx, {})
    assert b"PAYLOAD-BYTES" not in fixed  # logged+skipped, not an error
    assert b"visible body text" in fixed


def test_spark_grouped_reconstruct(spark):
    emlx, parts = _partial_emlx()
    rows = [
        ("mail/INBOX/7.partial.emlx", emlx),
        ("mail/INBOX/7.2.emlxpart", parts["7.2.emlxpart"]),
        ("mail/Other/unrelated.txt", b"zzz"),
    ]
    df = spark.createDataFrame(rows, "path string, data binary")
    got = reconstruct_emlx(df).collect()
    assert len(got) == 1
    assert got[0]["path"] == "mail/INBOX/7.partial.emlx"
    assert b"PAYLOAD-BYTES" in bytes(got[0]["data"])
