"""Dependency-free raster codec: 24-bit uncompressed BMP (BI_RGB).

The multimodal operators need ONE real codec so the ``use_real_codecs``
branch — decode → resample → re-encode inside ``mapInPandas`` — is
executable and testable in an environment with no PIL/av/soundfile.  BMP
is the honest choice: the format is a public, fixed-layout spec (14-byte
BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + bottom-up BGR rows padded
to 4 bytes), decodable with ``struct`` + numpy slicing, no compression,
no entropy coding.  A production deployment swaps these three functions
for PIL/libav calls; every Spark-side contract (binary in/out, Arrow
batching, schema, no shuffle) is identical.

All functions are deterministic: same bytes in, same bytes out, on every
executor — which is what lets the DuckDB oracle pin the real-decode
path's metadata arithmetic bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")
_HEADERS_LEN = _FILE_HEADER.size + _INFO_HEADER.size  # 14 + 40 = 54


def row_stride(width: int) -> int:
    """Bytes per stored row: 3*width padded up to a multiple of 4."""
    return (3 * width + 3) // 4 * 4


def bmp_size(width: int, height: int) -> int:
    """Exact encoded size in bytes — the arithmetic the oracles reproduce."""
    return _HEADERS_LEN + height * row_stride(width)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8 array, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    stride = row_stride(w)
    image_size = h * stride
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BMP stores bottom-up BGR: flip the row order, reverse the channels
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    file_header = _FILE_HEADER.pack(b"BM", _HEADERS_LEN + image_size, 0, 0, _HEADERS_LEN)
    info_header = _INFO_HEADER.pack(40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (H, W, 3) uint8 RGB array.

    Strict on the subset :func:`encode_bmp` emits (plus top-down rows,
    which real encoders produce too); anything else raises ``ValueError``
    — a decoder that silently mis-reads bytes is worse than one that
    refuses them.
    """
    if len(data) < _HEADERS_LEN:
        raise ValueError("truncated BMP: missing headers")
    magic, _fsize, _r1, _r2, offset = _FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    hdr_size, w, h, planes, bpp, compression = _INFO_HEADER.unpack_from(data, 14)[:6]
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size}, planes={planes})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    stride = row_stride(w)
    if len(data) < offset + h * stride:
        raise ValueError("truncated BMP: missing pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB, contiguous


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index math
    (``src = floor((dst + 0.5) * src_size / dst_size)``, the standard
    pixel-center mapping), deterministic, no interpolation state."""
    h, w = pixels.shape[:2]
    yy = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xx = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return pixels[yy[:, None], xx[None, :]]
