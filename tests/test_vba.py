"""[MS-OVBA] VBA macro extraction: compression codec round-trips, a
hand-worked copy-token vector, dir-stream walk, and the analyze-level
fan-out for docm/xlsm and OLE-hosted projects."""
import io
import random
import struct
import zipfile

import pytest

from hoover_snoop2_spark.operators.vba_extract import (
    VbaBroken,
    build_vba_project,
    compress_vba,
    decompress_vba,
    vba_modules_from_ole,
    vba_modules_from_zip,
)


def test_hand_worked_copy_token():
    # container: signature 0x01; one compressed chunk, body =
    # flags 0b00000010, literal 'a', copy token (offset 1, length 7).
    # At position 1 the offset bit split is 4 bits (minimum), so
    # token = ((1-1) << 12) | (7-3) = 0x0004 — hand-derived from the
    # [MS-OVBA] 2.4.1.3.19.3 split, independent of the compressor.
    body = bytes([0b00000010, ord("a"), 0x04, 0x00])
    header = struct.pack("<H", (len(body) + 2 - 3) | 0x3000 | 0x8000)
    assert decompress_vba(b"\x01" + header + body) == b"a" * 8


def test_roundtrip_shapes():
    rng = random.Random(3)
    shapes = [
        b"",
        b"x",
        b"a" * 4096,          # exactly one chunk of one run
        b"a" * 4097,          # run crossing the chunk boundary
        b"abc" * 3000,        # periodic, multi-chunk
        bytes(rng.randrange(256) for _ in range(5000)),   # incompressible
        (b"Sub Foo()\r\n  Call Bar(1, 2)\r\nEnd Sub\r\n") * 150,
        bytes(range(256)) * 20,
    ]
    for s in shapes:
        assert decompress_vba(compress_vba(s)) == s, len(s)


def test_roundtrip_random_fuzz():
    rng = random.Random(17)
    alphabet = b"abcdefgh \r\n"
    for _ in range(30):
        n = rng.randrange(0, 9000)
        s = bytes(rng.choice(alphabet) for _ in range(n))
        assert decompress_vba(compress_vba(s)) == s


def test_typed_broken_reasons():
    with pytest.raises(VbaBroken) as ei:
        decompress_vba(b"\x02junk")
    assert ei.value.reason == "vba_bad_signature"
    with pytest.raises(VbaBroken):
        decompress_vba(b"\x01\xff")          # truncated header
    # copy token pointing before the chunk start
    body = bytes([0b00000001, 0x00, 0x00])
    header = struct.pack("<H", (len(body) + 2 - 3) | 0x3000 | 0x8000)
    with pytest.raises(VbaBroken) as ei:
        decompress_vba(b"\x01" + header + body)
    assert ei.value.reason == "vba_bad_copy_token"


def test_project_walk_roundtrip():
    mods = [
        ("Module1", "Sub A()\r\nEnd Sub\r\n"),
        ("ThisDocument", "Private Sub Document_Open()\r\nEnd Sub\r\n"),
        ("Utilidades", "' comentario con acentos: áé\r\n"),
    ]
    blob = build_vba_project(mods)
    assert vba_modules_from_ole(blob) == mods


def test_project_walk_large_module():
    # compressed module stream big enough to need a regular FAT chain
    src = "".join(f"Sub M{i}()\r\n  X{i} = {i * 7}\r\nEnd Sub\r\n"
                  for i in range(800))
    blob = build_vba_project([("Big", src)])
    assert vba_modules_from_ole(blob) == [("Big", src)]


def test_non_vba_ole_returns_empty():
    from hoover_snoop2_spark.operators.cfb import build_cfb

    blob = build_cfb([("SomeStream", b"data")])
    assert vba_modules_from_ole(blob) == []
    assert vba_modules_from_ole(b"not ole at all") == []


def _inject_vba(zip_bytes: bytes, arcname: str, project: bytes) -> bytes:
    out = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zin, \
         zipfile.ZipFile(out, "w") as zout:
        for n in zin.namelist():
            zout.writestr(n, zin.read(n))
        zout.writestr(arcname, project)
    return out.getvalue()


def test_analyze_docm_fanout():
    from hoover_snoop2_spark.corpus import render_docx
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    docx, golden = render_docx(5, "en")
    mods = [("Module1", "Sub AutoOpen()\r\nMsgBox 1\r\nEnd Sub\r\n")]
    docm = _inject_vba(docx, "word/vbaProject.bin", build_vba_project(mods))
    out = analyze_blob("k", docm)
    assert out[0]["mime_type"] == \
        "application/vnd.ms-word.document.macroEnabled.12"
    assert out[0]["status"] == "success"
    assert out[0]["text"] == golden  # body text unchanged by macros
    assert [(c["child_name"], c["child_data"]) for c in out[1:]] == [
        ("macros/Module1.bas", mods[0][1].encode("utf-8"))
    ]


def test_analyze_xlsm_fanout():
    from hoover_snoop2_spark.corpus import render_xlsx
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    xlsx = render_xlsx(9)[0]
    mods = [("Mod", "Sub T()\r\nEnd Sub\r\n")]
    xlsm = _inject_vba(xlsx, "xl/vbaProject.bin", build_vba_project(mods))
    out = analyze_blob("k", xlsm)
    assert out[0]["mime_type"] == \
        "application/vnd.ms-excel.sheet.macroenabled.12"
    assert out[0]["status"] == "success"
    names = [c["child_name"] for c in out[1:]]
    assert "macros/Mod.bas" in names


def test_analyze_corrupt_project_typed():
    from hoover_snoop2_spark.corpus import render_docx
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    docx, _ = render_docx(5, "en")
    docm = _inject_vba(docx, "word/vbaProject.bin",
                       build_vba_project([("M", "Sub A()\r\nEnd Sub\r\n")]))
    # corrupt the vbaProject member: flip the compression signature
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(docm)) as zin, \
         zipfile.ZipFile(buf, "w") as zout:
        for n in zin.namelist():
            payload = zin.read(n)
            if n.endswith("vbaProject.bin"):
                # break the dir stream's compressed container signature
                from hoover_snoop2_spark.operators.cfb import (
                    CompoundFile, build_cfb)
                cf = CompoundFile(payload)
                paths = cf.paths()
                streams = []
                for p, e in paths.items():
                    raw = cf.read(e)
                    if p.endswith("VBA/dir"):
                        raw = b"\x7f" + raw[1:]
                    streams.append((p, raw))
                vba = [(p.split("/", 1)[1], r) for p, r in streams
                       if p.startswith("VBA/")]
                top = [(p, r) for p, r in streams if "/" not in p]
                payload = build_cfb(top, [("VBA", vba)])
            zout.writestr(n, payload)
    out = analyze_blob("k", buf.getvalue())
    assert out[0]["status"] == "broken"
    assert out[0]["broken_reason"] == "vba_bad_signature"
