"""Container unpack — mirrors the reference's exact-listing assertions
(test_archives.py:11-73) over synthetic archives."""

import gzip
import io
import tarfile
import zipfile

import pytest

from hoover_snoop2_spark.operators.archive_unpack import (
    UnpackBroken,
    emlx_strip,
    unpack_bytes,
    unpack_children,
)


def _zip(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in members:
            z.writestr(name, data)
    return buf.getvalue()


def test_zip_listing():
    data = _zip([("docs/a.txt", b"alpha"), ("docs/b.txt", b"beta"), ("d/", b"")])
    got = unpack_bytes(data, "application/zip")
    assert got == [("docs/a.txt", b"alpha"), ("docs/b.txt", b"beta")]


def test_tar_gz_recurses_into_tar():
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w") as tf:
        ti = tarfile.TarInfo("x.txt")
        ti.size = 5
        tf.addfile(ti, io.BytesIO(b"hello"))
    data = gzip.compress(inner.getvalue())
    got = unpack_bytes(data, "application/gzip")
    assert got == [("x.txt", b"hello")]


def test_plain_gzip_single_member():
    got = unpack_bytes(gzip.compress(b"payload"), "application/gzip")
    assert got == [("data", b"payload")]


def test_mbox_split():
    msg = (
        "From a@b Mon Jan  1 00:00:0{i} 2024\n"
        "From: u{i}@m.example\nSubject: s{i}\n\nbody {i}\n"
    )
    data = "".join(msg.format(i=i) for i in range(3)).encode()
    got = unpack_bytes(data, "application/mbox")
    assert len(got) == 3
    assert got[0][0] == "1.eml"
    assert b"body 0" in got[0][1]
    assert b"From a@b" not in got[0][1]  # envelope line stripped


def test_truncated_zip_broken():
    data = _zip([("a.txt", b"x" * 100)])[:30]
    with pytest.raises(UnpackBroken) as e:
        unpack_bytes(data, "application/zip")
    assert e.value.reason == "7z_error"


def test_native_format_parse_reasons():
    # PST, 7z and RAR are unpacked natively now; garbage surfaces their
    # own parse reasons instead of the old blanket tool-missing
    with pytest.raises(UnpackBroken) as e:
        unpack_bytes(b"whatever", "application/x-rar")
    assert e.value.reason == "rar_error"
    with pytest.raises(UnpackBroken) as e:
        unpack_bytes(b"whatever", "application/x-hoover-pst")
    assert e.value.reason == "pst_parse_error"
    with pytest.raises(UnpackBroken) as e:
        unpack_bytes(b"whatever", "application/x-7z-compressed")
    assert e.value.reason == "7z_error"


def test_unpack_children_url_convention():
    data = _zip([("inner/a.txt", b"alpha")])
    children, broken = unpack_children("https://s.example/x.zip", data, "application/zip")
    assert broken is None
    assert children[0][0] == "https://s.example/x.zip//inner/a.txt"


def test_emlx_strip():
    body = b"From: a@b\nSubject: s\n\nhello"
    emlx = str(len(body)).encode() + b"\n" + body + b"<plist>trailing</plist>"
    assert emlx_strip(emlx) == body
    # non-emlx passes through
    assert emlx_strip(b"not emlx") == b"not emlx"


def test_undecodable_member_names_survive():
    """A tar member whose name bytes are not UTF-8 (tarfile surrogate-
    escapes them) must produce a valid-UTF-8, lossless child name."""
    import hashlib
    import io
    import tarfile

    from hoover_snoop2_spark.operators.analyze import analyze_blob
    from hoover_snoop2_spark.operators.archive_unpack import safe_member_name

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("caf\udce9_latin1.txt")  # 0xE9 undecodable
        payload = b"contents"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    data = buf.getvalue()

    rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
    child_name = rows[1]["child_name"]
    child_name.encode("utf-8")  # must not raise
    assert child_name == "caf%E9_latin1.txt"
    assert rows[1]["child_data"] == b"contents"

    # clean names pass through untouched
    assert safe_member_name("docs/ünïcode.txt") == "docs/ünïcode.txt"
