"""Constants and kernels every raster codec shares (leaf module — the
codecs import this, :mod:`.raster` imports the codecs)."""

from __future__ import annotations

import numpy as np

#: shared decompression/allocation-bomb guard: no raster may declare
#: more pixels than this before its pixel data is validated
MAX_PIXELS = 64_000_000


def composite_over_white(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Flatten an alpha channel over white with ``floor(x + 0.5)``
    rounding — the single compositing convention every codec shares
    (rgb: (h, w, 3) int-like; alpha: (h, w) in 0..255)."""
    a = alpha.astype(np.int64)[:, :, None]
    out = (rgb.astype(np.int64) * a + 255 * (255 - a) + 127) // 255
    return out.astype(np.uint8)
