"""Visio: vsdx page/shape text, vsdm macro fan-out, legacy .vsd OLE
refinement, StuffIt typed refusal."""
from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.visio_extract import (
    build_vsdx,
    is_vsd,
    vsdx_to_text,
)


def test_vsdx_text_page_order():
    blob = build_vsdx([["First shape", "Second shape"], ["Page two note"]])
    assert vsdx_to_text(blob) == "First shape\n\nSecond shape\n\nPage two note"


def test_analyze_vsdx():
    blob = build_vsdx([["Flow start", "Flow end"]])
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/vnd.ms-visio.drawing"
    assert out[0]["status"] == "success"
    assert "Flow start" in out[0]["text"]


def test_analyze_vsdm_macro_fanout():
    from hoover_snoop2_spark.operators.vba_extract import build_vba_project

    mods = [("Mod1", "Sub V()\r\nEnd Sub\r\n")]
    blob = build_vsdx([["Diagram"]], vba_project=build_vba_project(mods))
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == \
        "application/vnd.ms-visio.drawing.macroenabled.12"
    assert [(c["child_name"], c["child_data"]) for c in out[1:]] == [
        ("macros/Mod1.bas", mods[0][1].encode("utf-8"))
    ]


def test_legacy_vsd_refinement():
    from hoover_snoop2_spark.operators.cfb import build_cfb

    blob = build_cfb([("VisioDocument", b"\x00" * 64), ("Misc", b"x")])
    assert is_vsd(blob)
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/vnd.visio"
    assert out[0]["status"] == "success"
    assert not is_vsd(b"not ole")


def test_stuffit_typed_refusal():
    for head in (b"StuffIt (c)1997-2002 Aladdin", b"SIT!\x00\x12rest"):
        out = analyze_blob("k", head + b"\x00" * 64)
        assert out[0]["mime_type"] == "application/x-stuffit"
        assert out[0]["status"] == "broken"
        assert out[0]["broken_reason"] == "stuffit_unsupported"


def test_wordperfect_typed_refusal():
    blob = b"\xffWPC" + b"\x10\x00\x00\x00" + b"\x01\x0a\x02\x01" + b"\x00" * 64
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/vnd.wordperfect"
    assert out[0]["status"] == "broken"
    assert out[0]["broken_reason"] == "wordperfect_unsupported"
