"""Native first-page PDF layout previews (operators/thumbnails.py) —
the in-engine replacement for the reference's external pdf-preview
service (snoop/data/analyzers/pdf_preview.py): span boxes rasterized
onto a US-Letter-scaled canvas through the in-repo PNG codec."""

import numpy as np
import pytest

from hoover_snoop2_spark.corpus import render_pdf
from hoover_snoop2_spark.functions.png_codec import png_decode
from hoover_snoop2_spark.operators.pdf_spans import extract_pdf_page_spans
from hoover_snoop2_spark.operators.thumbnails import (
    PDF_PREVIEW_WIDTH,
    generate_pdf_previews,
    render_pdf_preview,
)


def _expected_dark(pdf: bytes, w: int, h: int) -> int:
    """Independent recomputation of the rasterized span area."""
    scale = w / 612.0
    ph = 792.0
    boxes = np.zeros((h, w), bool)
    for s in extract_pdf_page_spans(pdf):
        if s["page"] != 1:
            continue
        size = s["size"] or 10.0
        left = int(s["x"] * scale + 0.5)
        top = int((ph - s["y"] - size) * scale + 0.5)
        right = min(w, left + max(1, int(0.5 * size * len(s["text"]) * scale + 0.5)))
        bottom = min(h, top + max(1, int(size * scale + 0.5)))
        boxes[max(0, top):bottom, max(0, left):right] = True
    return int(boxes.sum())


@pytest.mark.parametrize("doc_id", [0, 1, 7, 9])
def test_preview_dark_area_matches_span_table(doc_id):
    pdf, _, _ = render_pdf(doc_id, "en")
    png, w, h, n_spans = render_pdf_preview(pdf)
    assert (w, h) == (PDF_PREVIEW_WIDTH, 259)  # 792/612 * 200 rounded
    img = png_decode(png)
    assert img.shape == (h, w, 3)
    dark = int((img[:, :, 0] == 64).sum())
    assert dark == _expected_dark(pdf, w, h)
    assert n_spans >= 3  # corpus pages carry 3-6 lines


def test_preview_deterministic_bytes():
    pdf, _, _ = render_pdf(4, "en")
    assert render_pdf_preview(pdf)[0] == render_pdf_preview(pdf)[0]


def test_preview_broken_pdf_surfaces_reason(spark):
    rows = [("good", render_pdf(2, "en")[0]), ("bad", b"not a pdf at all")]
    df = spark.createDataFrame(rows, "sha3_256 string, data binary")
    got = {r["sha3_256"]: r for r in generate_pdf_previews(df).collect()}
    assert got["good"]["status"] == "success"
    assert got["good"]["n_spans"] >= 3
    assert png_decode(bytes(got["good"]["preview"])).shape[1] == PDF_PREVIEW_WIDTH
    assert got["bad"]["status"] == "broken"
    assert got["bad"]["broken_reason"] == "pdf_not_pdf"
    assert got["bad"]["preview"] is None
