"""cpio / ar / RPM / compress-.Z native readers (operators/unix_archives).

The reference unpacks these via `7z x` (archives.py:41-55 accepted
extensions); here each is a pure-bytes parser.  Round-trips use the
module's deterministic fixture writers; the .Z decoder is additionally
pinned against an independently hand-packed code stream (so the encoder
cannot mask a shared misunderstanding of the bit layout).
"""

import pytest

from hoover_snoop2_spark.functions.magic import sniff_bytes
from hoover_snoop2_spark.operators.archive_unpack import unpack_bytes
from hoover_snoop2_spark.operators.unix_archives import (
    UnixArchiveBroken,
    build_ar,
    build_cpio,
    build_rpm,
    compress_z,
    decompress_z,
    unpack_ar,
    unpack_cpio,
    unpack_rpm,
)

MEMBERS = [
    ("docs/readme.txt", b"hello cpio world"),
    ("bin/data.bin", bytes(range(256))),
    ("empty.txt", b""),
]


@pytest.mark.parametrize("fmt", ["newc", "odc", "bin"])
def test_cpio_roundtrip_all_dialects(fmt):
    arc = build_cpio(MEMBERS, fmt)
    assert unpack_cpio(arc) == MEMBERS
    mime, _ = sniff_bytes(arc)
    assert mime == "application/x-cpio"
    assert unpack_bytes(arc, mime) == MEMBERS


def test_cpio_truncated_raises():
    arc = build_cpio(MEMBERS, "newc")
    with pytest.raises(UnixArchiveBroken) as e:
        unpack_cpio(arc[: len(arc) // 2])
    assert e.value.reason == "cpio_truncated"


def test_ar_short_and_gnu_long_names():
    members = [
        ("short.txt", b"one"),
        ("a-very-long-member-name-over-16-chars.txt", b"two"),
        ("odd", b"x"),  # odd-size body exercises the newline pad
    ]
    arc = build_ar(members)
    assert unpack_ar(arc) == members
    mime, _ = sniff_bytes(arc)
    assert mime == "application/x-archive"
    assert unpack_bytes(arc, mime) == members


def test_ar_bsd_long_name():
    # hand-build a BSD-style member: "#1/<len>" with the name in the data
    name = b"bsd-style-long-name.o"
    body = b"payload"
    hdr = b"%-16s%-12d%-6d%-6d%-8o%-10d`\n" % (
        b"#1/%d" % len(name), 0, 0, 0, 0o644, len(name) + len(body)
    )
    data = b"!<arch>\n" + hdr + name + body
    if (len(name) + len(body)) & 1:
        data += b"\n"
    assert unpack_ar(data) == [(name.decode(), body)]


def test_deb_shape_members_sniff_onward():
    """A .deb is ar(control.tar.gz, data.tar.gz) — the members must come
    out byte-exact and sniff as gzip so the pipeline recursion unpacks
    them on the next round."""
    import gzip as _gzip
    import io
    import tarfile

    def tgz(name, body):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
        return buf.getvalue()

    members = [
        ("debian-binary", b"2.0\n"),
        ("control.tar.gz", tgz("control", b"Package: demo\n")),
        ("data.tar.gz", tgz("usr/share/doc/demo", b"demo text")),
    ]
    arc = build_ar(members)
    out = unpack_ar(arc)
    assert out == members
    for name, body in out[1:]:
        assert sniff_bytes(body)[0] == "application/gzip"
        inner = _gzip.decompress(body)
        assert inner[257:262] == b"ustar"


@pytest.mark.parametrize("comp", ["gzip", "xz", "bzip2", "none"])
def test_rpm_payload_compressors(comp):
    arc = build_rpm(MEMBERS, comp)
    assert unpack_rpm(arc) == MEMBERS
    mime, _ = sniff_bytes(arc)
    assert mime == "application/x-rpm"
    assert unpack_bytes(arc, mime) == MEMBERS


def test_rpm_zstd_payload():
    # zstd payloads now decode via the in-repo RFC 8878 codec
    # (Fedora/RHEL9 default compressor); a corrupt zstd stream still
    # surfaces a typed reason
    arc = build_rpm(MEMBERS, "zstd")
    assert unpack_rpm(arc) == MEMBERS
    idx = arc.index(b"\x28\xb5\x2f\xfd")
    bad = arc[:idx] + b"\x28\xb5\x2f\xfd\xff\xff\xff"
    with pytest.raises(UnixArchiveBroken) as e:
        unpack_rpm(bad)
    assert e.value.reason == "rpm_payload_corrupt"


# ---------------------------------------------------------------------------
# compress(1) .Z
# ---------------------------------------------------------------------------


def _pack_codes(codes, maxbits=16, block_mode=True):
    """Independent bit-packer implementing the compress(1) layout: 9-bit
    codes growing after the 256th code of a width segment... — kept
    deliberately simple: only valid while no width change occurs (few
    codes), so each test stream stays in 9-bit codes."""
    out = bytearray(b"\x1f\x9d" + bytes([(0x80 if block_mode else 0) | maxbits]))
    bitbuf = 0
    pos = 0
    for c in codes:
        bitbuf |= c << pos
        pos += 9
    out += bitbuf.to_bytes((pos + 7) // 8, "little")
    return bytes(out)


def test_z_decode_hand_packed_9bit_stream():
    # 'aaaa' compresses to codes [97, 257, 97]: emit 'a', add aa=257,
    # match aa, emit 257, add aaa=258, emit trailing 'a'
    data = _pack_codes([97, 257, 97])
    assert decompress_z(data) == b"aaaa"
    assert compress_z(b"aaaa") == data


def test_z_decode_clear_code_burns_slot_256():
    # A,B,CLEAR,C,D,257 — after the clear, the first add burns slot 256
    # (ncompress numbering), so 257 means the post-clear pair 'CD'.
    # The clear also realigns the stream to an 8-code group boundary:
    # 3 codes consumed (27 bits) -> skip to bit 72 of the segment.
    head = [65, 66, 256]
    bitbuf = 0
    pos = 0
    for c in head:
        bitbuf |= c << pos
        pos += 9
    pos = 72  # group realignment after CLEAR
    for c in [67, 68, 257]:
        bitbuf |= c << pos
        pos += 9
    data = b"\x1f\x9d\x90" + bitbuf.to_bytes((pos + 7) // 8, "little")
    assert decompress_z(data) == b"ABCDCD"


def test_z_kwkwk_case():
    # classic KwKwK trigger: decoder sees a code equal to free_ent
    raw = b"abababababab"
    assert decompress_z(compress_z(raw)) == raw


@pytest.mark.parametrize("maxbits", [9, 10, 12, 16])
def test_z_roundtrip_across_width_changes(maxbits):
    # enough distinct pairs to push free_ent past several width bumps
    # and (for maxbits=9/10) to fill the table completely
    raw = bytes((i * 7 + (i >> 8)) & 0xFF for i in range(40000))
    z = compress_z(raw, maxbits=maxbits)
    assert decompress_z(z) == raw


def test_z_tar_recursion_via_dispatch():
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("inner/file.txt")
        body = b"tar.Z payload text"
        info.size = len(body)
        tf.addfile(info, io.BytesIO(body))
    z = compress_z(buf.getvalue())
    mime, _ = sniff_bytes(z)
    assert mime == "application/x-compress"
    out = unpack_bytes(z, mime)
    assert ("inner/file.txt", b"tar.Z payload text") in out


def test_z_plain_payload_named_data():
    z = compress_z(b"just text " * 100)
    assert unpack_bytes(z, "application/x-compress") == [
        ("data", b"just text " * 100)
    ]


def test_z_bad_magic():
    with pytest.raises(UnixArchiveBroken):
        decompress_z(b"\x1f\x8bnot lzw")
