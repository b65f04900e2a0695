"""PDF page-row expansion + audio header parsing."""

import struct

from hoover_snoop2_spark.corpus import render_pdf
from hoover_snoop2_spark.operators.multimodal import parse_audio_header
from hoover_snoop2_spark.operators.pdf_spans import explode_pdf_pages


def test_explode_pdf_pages(spark):
    rows = []
    goldens = {}
    for doc_id in (9, 27, 84):
        data, golden, _kids = render_pdf(doc_id, "en")
        url = f"https://x.example/{doc_id}.pdf"
        rows.append((url, data))
        goldens[url] = golden.split("\n\n")
    df = spark.createDataFrame(rows, "url string, html binary")
    got = explode_pdf_pages(df).collect()
    by_url: dict[str, list] = {}
    for r in got:
        assert r["broken_reason"] is None
        by_url.setdefault(r["url"], []).append((r["page"], r["page_text"]))
    for url, pages in goldens.items():
        mine = [t for _, t in sorted(by_url[url])]
        assert mine == pages, url


def test_explode_broken_pdf(spark):
    df = spark.createDataFrame(
        [("https://x.example/bad.pdf", b"not a pdf")], "url string, html binary"
    )
    got = explode_pdf_pages(df).collect()
    assert got[0]["broken_reason"] == "pdf_not_pdf"


def test_wav_header():
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
    )
    assert parse_audio_header(wav) == ("wav", 44100, 2)
    assert parse_audio_header(b"not audio") is None


def test_video_frame_sampling(spark):
    import struct

    from hoover_snoop2_spark.operators.multimodal import sample_video_frames

    avi = b"RIFF" + struct.pack("<I", 200) + b"AVI " + bytes(range(200)) 
    rows = [("v1", avi), ("v2", b"not a video")]
    df = spark.createDataFrame(rows, "sha3_256 string, data binary")
    got = sample_video_frames(df, n_frames=4).collect()
    frames = [r for r in got if r["sha3_256"] == "v1"]
    assert len(frames) == 4
    assert [f["frame_no"] for f in sorted(frames, key=lambda r: r["frame_no"])] == [0, 1, 2, 3]
    assert all(len(f["feature"]) == 8 for f in frames)
    other = [r for r in got if r["sha3_256"] == "v2"][0]
    assert other["status"] == "skipped"


def test_video_decoder_missing(spark):
    import struct

    from hoover_snoop2_spark.operators.multimodal import sample_video_frames

    avi = b"RIFF" + struct.pack("<I", 20) + b"AVI " + bytes(20)
    df = spark.createDataFrame([("v", avi)], "sha3_256 string, data binary")
    got = sample_video_frames(df, decode_stub=False).collect()[0]
    assert got["status"] == "broken"
    assert got["broken_reason"] == "media_decoder_missing"
