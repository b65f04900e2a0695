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
