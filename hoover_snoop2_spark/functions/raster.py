"""Magic-dispatched raster decode shared by the thumbnail and image
feature operators: PNG and GIF decode natively
(:mod:`.png_codec`, :mod:`.gif_codec`); JPEG keeps the honest
``media_decoder_missing`` reason (DCT codec out of scope), everything
else is ``not_image``."""

from __future__ import annotations

import numpy as np

from .gif_codec import GifError, gif_decode
from .png_codec import PngError, png_decode

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
        return None, "media_decoder_missing"
    return None, "not_image"
