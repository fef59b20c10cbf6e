"""Dependency-free media codecs: 24-bit uncompressed BMP (BI_RGB) and
16-bit PCM WAV (RIFF/WAVE).

The multimodal operators need real codecs so the ``use_real_codecs``
branch — decode → resample → re-encode inside ``mapInPandas`` — is
executable and testable in an environment with no PIL/av/soundfile.
BMP and canonical PCM WAV are the honest choices: both are public,
fixed-layout specs (BMP: 14-byte BITMAPFILEHEADER + 40-byte
BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes; WAV: 12-byte
RIFF header + ``fmt `` chunk + ``data`` chunk of little-endian int16
frames), decodable with ``struct`` + numpy slicing, no compression, no
entropy coding.  A production deployment swaps these functions for
PIL/libav/soundfile calls; every Spark-side contract (binary in/out,
Arrow batching, schema, no shuffle) is identical.

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


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, 16-bit PCM) — the audio modality through the same
# contract: encode/decode/resample, strict on the canonical subset.
# ---------------------------------------------------------------------------

_RIFF_HEADER = struct.Struct("<4sI4s")  # 'RIFF', riff size, 'WAVE'
_CHUNK_HEADER = struct.Struct("<4sI")  # chunk id, chunk size
_FMT_PCM16 = struct.Struct("<HHIIHH")  # fmt, channels, rate, byte rate, align, bits
WAV_HEADERS_LEN = 12 + 8 + 16 + 8  # RIFF + 'fmt ' chunk + 'data' chunk header = 44


def wav_size(n_samples: int, n_channels: int = 1) -> int:
    """Exact encoded size of canonical PCM16 WAV — the arithmetic the
    oracles reproduce: 44 header bytes + 2 bytes per sample per channel."""
    return WAV_HEADERS_LEN + 2 * n_samples * n_channels


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (N,) or (N, channels) int16 array as canonical PCM16 WAV
    (RIFF → ``fmt `` → ``data``, no extension chunks)."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError(
            f"expected (N,) or (N, ch) int16 array, got {samples.shape} {samples.dtype}"
        )
    frames = samples.reshape(len(samples), -1)
    n_ch = frames.shape[1]
    data = np.ascontiguousarray(frames).tobytes()  # interleaved LE int16
    fmt = _FMT_PCM16.pack(1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16)
    return (
        _RIFF_HEADER.pack(b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + _CHUNK_HEADER.pack(b"fmt ", len(fmt))
        + fmt
        + _CHUNK_HEADER.pack(b"data", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV into ((N, channels) int16 array, sample_rate).

    Walks the RIFF chunk list (skipping unknown chunks, as real encoders
    emit LIST/INFO/fact chunks) but is strict about the sample format:
    only uncompressed 16-bit PCM decodes; anything else raises
    ``ValueError`` — a decoder that silently mis-reads bytes is worse
    than one that refuses them.
    """
    if len(data) < 12:
        raise ValueError("truncated WAV: missing RIFF header")
    magic, _riff_size, wave = _RIFF_HEADER.unpack_from(data, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError(f"not a WAV (magic {magic!r}/{wave!r})")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, csize = _CHUNK_HEADER.unpack_from(data, pos)
        body = data[pos + 8 : pos + 8 + csize]
        if len(body) < csize:
            raise ValueError(f"truncated WAV: chunk {cid!r} short")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("unsupported WAV: fmt chunk too short")
            fmt = _FMT_PCM16.unpack_from(body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + csize + (csize & 1)  # RIFF chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    audio_format, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    if n_ch < 1:
        raise ValueError(f"bad channel count {n_ch}")
    frames = np.frombuffer(pcm, dtype="<i2", count=len(pcm) // (2 * n_ch) * n_ch)
    return frames.reshape(-1, n_ch).copy(), rate


def resample_nearest_audio(
    samples: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """Nearest-neighbor (sample-and-hold) resample of (N, channels) int16
    frames — the same sample-center index mapping as :func:`resize_nearest`,
    in one dimension.  Output length = floor(N * dst / src)."""
    n = len(samples)
    n_out = n * dst_rate // src_rate
    idx = np.minimum(((np.arange(n_out) + 0.5) * n / n_out).astype(np.int64), n - 1)
    return samples[idx]


# ---------------------------------------------------------------------------
# Video (BMV: a minimal fixed-layout container of equal-size BMP frames)
# — the third modality through the same contract.  Real video needs an
# entropy codec (libav); the Spark-side semantics a frame-sampling
# pipeline exercises are container parsing, RANDOM ACCESS to frame k
# without decoding frames 0..k-1, and per-frame pixel work — all of which
# a length-indexed concatenation of BMPs provides honestly.  Layout:
# 4-byte magic 'BMV0' + u32 frame count + u32 per-frame byte size, then
# the frames back-to-back; frame k starts at 12 + k*frame_size, which is
# what makes every-kth-frame sampling O(sampled) instead of O(total).
# ---------------------------------------------------------------------------

_VIDEO_HEADER = struct.Struct("<4sII")  # magic, n_frames, frame_size
VIDEO_HEADER_LEN = _VIDEO_HEADER.size  # 12
VIDEO_MAGIC = b"BMV0"


def video_size(width: int, height: int, n_frames: int) -> int:
    """Exact encoded size in bytes — the arithmetic the oracles reproduce:
    12 header bytes + n_frames equal BMP frames."""
    return VIDEO_HEADER_LEN + n_frames * bmp_size(width, height)


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Encode equal-shape (H, W, 3) uint8 RGB frames as a BMV stream."""
    if not frames:
        raise ValueError("video needs at least one frame")
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("all frames must share one shape")
    blobs = [encode_bmp(f) for f in frames]
    return _VIDEO_HEADER.pack(VIDEO_MAGIC, len(blobs), len(blobs[0])) + b"".join(blobs)


def video_info(data: bytes) -> tuple[int, int]:
    """(n_frames, frame_size) from the container header alone — no frame
    is touched.  Strict: bad magic or a size that disagrees with the
    header raises ``ValueError``."""
    if len(data) < VIDEO_HEADER_LEN:
        raise ValueError("truncated BMV: missing header")
    magic, n_frames, frame_size = _VIDEO_HEADER.unpack_from(data, 0)
    if magic != VIDEO_MAGIC:
        raise ValueError(f"not a BMV (magic {magic!r})")
    if len(data) < VIDEO_HEADER_LEN + n_frames * frame_size:
        raise ValueError("truncated BMV: missing frame data")
    return n_frames, frame_size


def decode_video_frame(data: bytes, idx: int) -> np.ndarray:
    """Random-access decode of frame ``idx`` — seeks straight to
    12 + idx*frame_size and decodes ONLY that BMP.  The point of the
    container: sampling every kth frame of an n-frame video costs n/k
    decodes, not n."""
    n_frames, frame_size = video_info(data)
    if not 0 <= idx < n_frames:
        raise ValueError(f"frame {idx} out of range [0, {n_frames})")
    start = VIDEO_HEADER_LEN + idx * frame_size
    return decode_bmp(data[start : start + frame_size])
