"""Thumbnail generation operator.

Reference parity: ``snoop.data.analyzers.thumbnails`` creates three
thumbnails per document at 100/200/400 px (``models.py:1243-1246``
``Thumbnail.SizeChoices``), POSTing the blob to an external
preview-service for the large one and ImageMagick-resizing the smaller
two *from the large thumbnail* (``thumbnails.py:397-443``), gated on a
mime allowlist and a 32 MiB truncation cap (``thumbnails.py:25-29,340``).

Spark-first re-expression: one ``mapInPandas`` pass over ``(sha3_256,
data)`` Arrow batches emits up to three rows per document — ``(size,
thumbnail_png)``.  For PNG, GIF and baseline JPEG inputs the
decode/resize/encode is fully native (:mod:`..functions.png_codec`,
:mod:`..functions.gif_codec`, :mod:`..functions.jpeg_codec` via
:func:`..functions.raster.decode_raster`); unsupported variants surface
honest ``jpeg_*_unsupported`` / ``not_image`` reasons, never a fake.
Output format deviation: the reference emits JPEG (its service + convert
default); we emit PNG — lossless and bit-deterministic, which the
correctness harness needs.

Scale notes: thumbnails are embarrassingly parallel (no shuffle in the
operator itself); the caller repartitions by size class exactly like the
text-extraction path so one 30 MiB scan doesn't skew a partition.  The
32 MiB cap is applied to the *input* bytes, mirroring the reference's
truncate-before-send.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.png_codec import (
    make_thumbnail_png,
    png_encode,
    resize_box,
)
from ..functions.raster import decode_raster

#: reference models.py:1243-1246 (SizeChoices SMALL/MEDIUM/LARGE)
THUMBNAIL_SIZES = (100, 200, 400)

#: reference thumbnails.py:25 — truncate/skip beyond 32 MiB
THUMBNAIL_TRUNCATE_FILE_SIZE = 32 * (2**20)

THUMB_SCHEMA = (
    "sha3_256 string, size int, thumbnail binary, width int, height int, "
    "status string, broken_reason string"
)


def _rows_for_blob(sha: str, data: bytes, sizes) -> list[dict]:
    if data is None or len(data) == 0:
        return [
            dict(sha3_256=sha, size=None, thumbnail=None, width=None,
                 height=None, status="broken", broken_reason="empty_blob")
        ]
    data = data[:THUMBNAIL_TRUNCATE_FILE_SIZE]
    rgb, reason = decode_raster(bytes(data))
    if rgb is None:
        return [
            dict(sha3_256=sha, size=None, thumbnail=None, width=None,
                 height=None, status="broken", broken_reason=reason)
        ]
    # large first, then the smaller sizes derived FROM the large thumbnail
    # (reference thumbnails.py:404-421 create_resized(source=large))
    ordered = sorted(sizes, reverse=True)
    large = resize_box(rgb, ordered[0])
    out = []
    for i, size in enumerate(ordered):
        img = large if i == 0 else resize_box(large, size)
        out.append(
            dict(
                sha3_256=sha,
                size=size,
                thumbnail=png_encode(img),
                width=int(img.shape[1]),
                height=int(img.shape[0]),
                status="ok",
                broken_reason=None,
            )
        )
    return out


def thumbnail_map_in_pandas(sizes=THUMBNAIL_SIZES):
    """mapInPandas body over (sha3_256, data) batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                rows.extend(_rows_for_blob(sha, data, sizes))
            yield pd.DataFrame(
                rows,
                columns=[
                    "sha3_256", "size", "thumbnail", "width", "height",
                    "status", "broken_reason",
                ],
            )

    return fn


def synth_png_map_in_pandas():
    """mapInPandas body: (doc_id) → deterministic gradient PNG per doc.

    Image dims derive from doc_id by pure integer arithmetic so an SQL
    oracle can predict the whole resize ladder's geometry without being
    able to decode PNG (queries.q67)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            shas, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 50 + (d % 13) * 40
                h = 30 + (d % 7) * 60
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                rgb = np.stack(
                    [
                        (np.add.outer(y * 5, x * 3) % 256).astype(np.uint8),
                        (np.add.outer(y * 2, x * 7) % 256).astype(np.uint8),
                        (np.add.outer(y * 11, x) % 256).astype(np.uint8),
                    ],
                    axis=2,
                )
                shas.append(str(d))
                blobs.append(png_encode(rgb))
            yield pd.DataFrame({"sha3_256": shas, "data": blobs})

    return fn


def generate_thumbnails(
    df: DataFrame, data_col: str = "data", sizes=THUMBNAIL_SIZES
) -> DataFrame:
    """(sha3_256, data) → up to ``len(sizes)`` thumbnail rows per blob.

    PNG inputs produce real thumbnails; other formats produce one broken
    row with a stable reason (mirrors the reference's SnoopTaskBroken
    surface, thumbnails.py:366-377)."""
    src = df.select("sha3_256", df[data_col].alias("data"))
    return src.mapInPandas(thumbnail_map_in_pandas(sizes), schema=THUMB_SCHEMA)


# ---------------------------------------------------------------------------
# PDF preview — native layout raster
#
# Reference parity: ``snoop.data.analyzers.pdf_preview`` POSTs the blob to
# an external pdf-preview service and stores the returned first-page PNG
# (pdf_preview.py; gated on mime == application/pdf and the same size cap).
# The service (and any full glyph rasterizer) is absent in this sandbox, so
# instead of a stub this renders a REAL first-page layout preview from the
# span geometry the native PDF parser already extracts: each text span
# becomes a filled box at its (x, y) with height = its Tf font size and
# width = 0.5 em per glyph (the classic average-advance approximation) —
# the kind of layout thumbnail a search UI shows for hit context.  The
# output is deterministic (integer box arithmetic + the in-repo PNG
# encoder), so tests can assert the exact dark-pixel area from the span
# table independently.

PDF_PREVIEW_WIDTH = 200

PDF_PREVIEW_SCHEMA = (
    "sha3_256 string, preview binary, width int, height int, n_spans int, "
    "status string, broken_reason string"
)


def render_pdf_preview(
    data: bytes, width: int = PDF_PREVIEW_WIDTH
) -> tuple[bytes, int, int, int]:
    """PDF bytes → (first-page layout PNG, width, height, n_spans).

    Page geometry comes from the first /MediaBox (default US Letter);
    PDF origin is bottom-left, raster origin top-left.  Raises PdfBroken
    exactly like the text path (same filter-skip rules)."""
    import re

    import numpy as np

    from .pdf_spans import extract_pdf_page_spans

    spans = [s for s in extract_pdf_page_spans(data) if s["page"] == 1]
    m = re.search(
        rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)"
        rb"\s+([\d.+-]+)", data,
    )
    x0, y0, pw, ph = 0.0, 0.0, 612.0, 792.0
    if m:
        x0, y0, x1, y1 = (float(g) for g in m.groups())
        pw, ph = x1 - x0, y1 - y0
    if pw <= 0 or ph <= 0:
        pw, ph = 612.0, 792.0
    scale = width / pw
    height = max(1, int(ph * scale + 0.5))
    img = np.full((height, width, 3), 255, np.uint8)
    for s in spans:
        size = s["size"] or 10.0
        left = int((s["x"] - x0) * scale + 0.5)
        top = int((ph - (s["y"] - y0) - size) * scale + 0.5)
        right = min(width, left + max(1, int(0.5 * size * len(s["text"]) * scale + 0.5)))
        bottom = min(height, top + max(1, int(size * scale + 0.5)))
        left, top = max(0, left), max(0, top)
        if left < right and top < bottom:
            img[top:bottom, left:right] = (64, 64, 64)
    return png_encode(img), width, height, len(spans)


def pdf_preview_map_in_pandas(width: int = PDF_PREVIEW_WIDTH):
    from .pdf_spans import PdfBroken

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, data in zip(pdf["sha3_256"], pdf["data"]):
                data = bytes(data)[:THUMBNAIL_TRUNCATE_FILE_SIZE]
                try:
                    png, w, h, n = render_pdf_preview(data, width)
                    rows.append({"sha3_256": sha, "preview": png,
                                 "width": w, "height": h, "n_spans": n,
                                 "status": "success",
                                 "broken_reason": None})
                except PdfBroken as e:
                    rows.append({"sha3_256": sha, "preview": None,
                                 "width": None, "height": None,
                                 "n_spans": None, "status": "broken",
                                 "broken_reason": e.reason})
            yield pd.DataFrame(
                rows,
                columns=["sha3_256", "preview", "width", "height",
                         "n_spans", "status", "broken_reason"],
            )

    return fn


def generate_pdf_previews(
    df: DataFrame, data_col: str = "data", width: int = PDF_PREVIEW_WIDTH
) -> DataFrame:
    """(sha3_256, pdf bytes) → one first-page layout-preview row per blob.

    Embarrassingly parallel like thumbnails; callers repartition by size
    class the same way (blob bytes never shuffle on the common path)."""
    src = df.select("sha3_256", df[data_col].alias("data"))
    return src.mapInPandas(
        pdf_preview_map_in_pandas(width), schema=PDF_PREVIEW_SCHEMA
    )
