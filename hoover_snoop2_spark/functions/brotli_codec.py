"""Brotli (RFC 7932) decode via the system ``libbrotlidec``, when present.

``Content-Encoding: br`` is the second most common web text coding
after gzip.  Unlike zstd (whose RFC-complete decoder lives in
:mod:`.zstd_codec`), brotli's format leans on a 122 KB static
dictionary plus 121 word transforms, so a from-scratch reimplementation
would mean embedding that corpus verbatim; the engineering call here is
the same one the stdlib makes for zlib/lzma — bind the system library.
Everything is gated behind availability: with no ``libbrotlidec`` on
the machine, :func:`brotli_available` is False and callers keep their
documented pass-through behavior (``sources/warc._decode_content``
returns the original bytes — a wrong guess must never lose payload).

The encoder binding exists for tests only (round-trip ground truth).
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = ["brotli_available", "brotli_decompress", "BrotliError"]


class BrotliError(ValueError):
    """Malformed brotli input (or decode attempted with no library)."""


def _load(names: list[str]):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    found = ctypes.util.find_library(names[0].split(".")[0].lstrip("lib"))
    if found:
        try:
            return ctypes.CDLL(found)
        except OSError:
            pass
    return None


_dec = _load(["libbrotlidec.so", "libbrotlidec.so.1", "libbrotlidec.dylib"])
_enc = _load(["libbrotlienc.so", "libbrotlienc.so.1", "libbrotlienc.dylib"])

if _dec is not None:
    _dec.BrotliDecoderDecompress.restype = ctypes.c_int
    _dec.BrotliDecoderDecompress.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]
if _enc is not None:
    _enc.BrotliEncoderCompress.restype = ctypes.c_int
    _enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]


def brotli_available() -> bool:
    return _dec is not None


def brotli_decompress(data: bytes, max_output: int = 1 << 30) -> bytes:
    """One-shot decode.  BrotliDecoderDecompress needs the output size
    upfront; grow geometrically from 4x the input until it fits (bounded
    by ``max_output`` — the zip-bomb guard every decode kernel here
    carries)."""
    if _dec is None:
        raise BrotliError("brotli_library_missing")
    if not data:
        raise BrotliError("brotli_truncated")
    size = min(max(4 * len(data), 1 << 16), max_output)
    while True:
        out = ctypes.create_string_buffer(size)
        out_len = ctypes.c_size_t(size)
        rc = _dec.BrotliDecoderDecompress(
            len(data), data, ctypes.byref(out_len), out
        )
        if rc == 1:  # BROTLI_DECODER_RESULT_SUCCESS
            return out.raw[: out_len.value]
        if size >= max_output:
            # the one-shot API reports corruption and insufficient
            # output identically (rc=0); at the cap both are refusals
            raise BrotliError("brotli_corrupt_or_too_large")
        size = min(size * 4, max_output)


def brotli_compress(data: bytes, quality: int = 5) -> bytes:
    """Encoder binding for tests (ground truth for the decode path)."""
    if _enc is None:  # pragma: no cover - encoder always ships with dec
        raise BrotliError("brotli_library_missing")
    size = len(data) + (len(data) >> 1) + 1024
    out = ctypes.create_string_buffer(size)
    out_len = ctypes.c_size_t(size)
    rc = _enc.BrotliEncoderCompress(
        quality, 22, 0, len(data), data, ctypes.byref(out_len), out
    )
    if rc != 1:  # pragma: no cover
        raise BrotliError("brotli_encode_failed")
    return out.raw[: out_len.value]
