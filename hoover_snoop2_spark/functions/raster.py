"""Magic-dispatched raster decode shared by the thumbnail and image
feature operators: PNG, GIF, baseline JPEG, uncompressed BMP,
baseline TIFF, and lossless WebP decode natively (:mod:`.png_codec`,
:mod:`.gif_codec`, :mod:`.jpeg_codec`, :mod:`.bmp_codec`,
:mod:`.tiff_codec`, :mod:`.webp_codec`); unsupported variants surface
their specific ``*_unsupported`` reason, and anything unrecognized is
``not_image``."""

from __future__ import annotations

import numpy as np

from .raster_common import MAX_PIXELS, composite_over_white  # noqa: F401

from .bmp_codec import BmpError, bmp_decode, ico_decode
from .gif_codec import GifError, gif_decode
from .jpeg_codec import JpegError, jpeg_decode
from .png_codec import PngError, png_decode
from .tiff_codec import TiffError, tiff_decode
from .webp_codec import WebpError, webp_decode

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_raster(data: bytes) -> tuple[np.ndarray | None, str | None]:
    """Returns ``(rgb, None)`` on success or ``(None, broken_reason)``."""
    if data[:8] == PNG_SIG:
        try:
            return png_decode(data), None
        except PngError as e:
            return None, str(e)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return gif_decode(data), None
        except GifError as e:
            return None, str(e)
    if data[:3] == b"\xff\xd8\xff":
        try:
            return jpeg_decode(data), None
        except JpegError as e:
            return None, str(e)
    if data[:2] == b"BM":
        try:
            return bmp_decode(data), None
        except BmpError as e:
            return None, str(e)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            return tiff_decode(data), None
        except TiffError as e:
            return None, str(e)
    if data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00") and len(data) >= 6:
        try:
            return ico_decode(data), None
        except BmpError as e:
            return None, str(e)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        try:
            return webp_decode(data), None
        except WebpError as e:
            return None, str(e)
    return None, "not_image"
