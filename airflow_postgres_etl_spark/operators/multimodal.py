"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched pandas on
``mapInPandas``.

Two codec tiers:

- **Stub** (default): deterministic features from the raw bytes (length,
  md5 checksum, fake dimensions/frame counts derived arithmetically) —
  exercises every Spark-side contract (binary schema, Arrow batch
  transfer, ``mapInPandas`` iterator shape, downstream explode) with no
  image libraries at all.
- **Real** (``use_real_codecs=True``): an actual decode → resample →
  re-encode chain through the dependency-free 24-bit BMP codec
  (:mod:`.codecs`).  PIL/libav are NOT in this environment
  (:data:`HAVE_CODECS` reports their availability); the BMP path is the
  real-branch stand-in a production build swaps for them — same
  iterator, same schema discipline, genuinely parsing and emitting
  pixel bytes.

Scale notes: ``mapInPandas`` is a narrow per-partition transform — no
shuffle; Arrow moves each partition to Python in columnar batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory).
Real media bytes live in parquet binary columns or object-store paths;
either way the decode parallelizes per partition with zero driver
involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

try:  # pragma: no cover - codecs absent in this environment
    import PIL.Image  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media payload: the utf-8 bytes of ``text`` as an opaque
    ``binary`` column (real pipelines read the bytes from parquet/object
    storage; the engine treats them identically)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def attach_bmp_payload(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic synthetic BMP payload per document — the fixture for
    the real-codec branch.  Dimensions ``(4 + id % 13) × (4 + id % 11)``,
    filled with the constant RGB color taken from the first three bytes
    of ``md5(str(id))`` — every derived quantity (dims, encoded size,
    channel means) is therefore reproducible in the DuckDB oracle from
    ``doc_id`` alone, while the payload itself is a genuine BMP the
    decoder must actually parse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[key]:
                did = int(did)
                w, h = 4 + did % 13, 4 + did % 11
                color = np.frombuffer(
                    hashlib.md5(str(did).encode()).digest()[:3], dtype=np.uint8
                )
                px = np.ascontiguousarray(np.broadcast_to(color, (h, w, 3)))
                payloads.append(codecs.encode_bmp(px))
            yield pd.DataFrame({key: pdf[key], "payload": payloads})

    return docs.select(key).mapInPandas(run, f"{key} long, payload binary")


def _decode_stub(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic fake decode.  Real decode would dispatch on magic
    bytes to PIL/av/soundfile — unavailable here (see HAVE_CODECS)."""
    n = len(payload)
    return (
        n,
        hashlib.md5(payload).hexdigest(),
        n % 640,
        (n * 7) % 480,
        n % 16 + 1,
    )


REAL_MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def extract_media_features(
    df: DataFrame, *, use_real_codecs: bool = False
) -> DataFrame:
    """``mapInPandas`` feature extraction over the binary payload.

    The deterministic stub is the default; ``use_real_codecs=True``
    routes through the BMP decoder (:mod:`.codecs`) and returns REAL
    dimensions parsed from the pixel data
    (:data:`REAL_MEDIA_FEATURE_SCHEMA` — ``width``/``height`` instead of
    the stub's ``fake_*``).  A payload the decoder rejects raises — a
    corrupt-input policy belongs in the caller (filter first), not in a
    silently-null decode.
    """
    if use_real_codecs:

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                    raw = bytes(payload)
                    px = codecs.decode_bmp(raw)
                    rows.append(
                        (
                            int(did),
                            len(raw),
                            hashlib.md5(raw).hexdigest(),
                            px.shape[1],
                            px.shape[0],
                            1,
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "n_bytes", "checksum", "width", "height", "n_frames",
                    ],
                )

        return df.select("doc_id", "payload").mapInPandas(
            run_real, REAL_MEDIA_FEATURE_SCHEMA
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f[0]),
                    "checksum": feats.map(lambda f: f[1]),
                    "fake_width": feats.map(lambda f: f[2]),
                    "fake_height": feats.map(lambda f: f[3]),
                    "n_frames": feats.map(lambda f: f[4]),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def sample_frames(features: DataFrame) -> DataFrame:
    """Frame sampling: one row per (doc, frame_idx) with a deterministic
    per-frame fingerprint — the explode pattern a video pipeline uses to
    fan decoded frames out to per-frame feature extraction."""
    idx = F.explode(F.sequence(F.lit(1), F.col("n_frames"))).alias("frame_idx")
    return features.select("doc_id", "checksum", "n_frames", idx).withColumn(
        "frame_hash", F.md5(F.concat_ws(":", F.col("checksum"), F.col("frame_idx")))
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    *,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Resize plumbing: binary in → binary out with new dimensions.

    The stub "resize" truncates the payload to the byte budget
    ``target_width * target_height // 64`` (deterministic, shape-checked);
    ``use_real_codecs=True`` runs the genuine chain through the BMP codec
    — decode → nearest-neighbor resample → re-encode — inside the same
    ``mapInPandas`` iterator.  Both paths share the Spark-side contract
    (binary → binary, schema, Arrow batching, no shuffle).
    """
    if use_real_codecs:

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_rows = []
                for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                    px = codecs.decode_bmp(bytes(payload))
                    resized = codecs.resize_nearest(px, target_width, target_height)
                    enc = codecs.encode_bmp(np.ascontiguousarray(resized))
                    out_rows.append(
                        (int(did), enc, target_width, target_height, len(enc))
                    )
                yield pd.DataFrame(
                    out_rows,
                    columns=["doc_id", "payload", "width", "height", "n_bytes"],
                )

        return df.select("doc_id", "payload").mapInPandas(run_real, RESIZED_SCHEMA)

    budget = target_width * target_height // 64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: bytes(b)[:budget])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": target_width,
                    "height": target_height,
                    "n_bytes": out.map(len),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality — the same mapInPandas binary contract through the
# dependency-free PCM16 WAV codec (codecs.py), making "multimodal" plural:
# attach fixture → decode → resample → re-encode → re-decode stats, every
# derived quantity reproducible in the DuckDB oracle from doc_id alone
# while the payload is a genuine RIFF/WAVE stream the decoder must parse.
# ---------------------------------------------------------------------------

#: fixture sample rate; resample targets divide it exactly in the oracles
AUDIO_FIXTURE_RATE = 8000


def attach_wav_payload(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV payload per document — the fixture for
    the real-audio branch.  Mono PCM16 at AUDIO_FIXTURE_RATE,
    ``64 + id % 97`` samples, constant amplitude taken from the first two
    bytes of ``md5(str(id))`` shifted into int16 — so sample count,
    encoded size, and mean amplitude are all reproducible in the DuckDB
    oracle from ``doc_id`` alone."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[key]:
                did = int(did)
                n = 64 + did % 97
                amp = (
                    int.from_bytes(hashlib.md5(str(did).encode()).digest()[:2], "big")
                    - 32768
                )
                samples = np.full(n, amp, dtype=np.int16)
                payloads.append(codecs.encode_wav(samples, AUDIO_FIXTURE_RATE))
            yield pd.DataFrame({key: pdf[key], "payload": payloads})

    return docs.select(key).mapInPandas(run, f"{key} long, payload binary")


def attach_wav_square_payload(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic square-wave WAV payload per document — the fixture
    for waveform ANALYSIS (not just container arithmetic): mono PCM16 at
    AUDIO_FIXTURE_RATE, ``64 + id % 97`` samples alternating ``+a, -a``
    with ``a = md5_16(id) % 32768`` (mod keeps the negation inside
    int16; a can be 0, the all-silent degenerate case).  Every analysis
    statistic — peak, energy, zero crossings, silence — is then an
    integer-exact closed form in ``(n, a)`` the DuckDB oracle reproduces
    from ``doc_id`` alone, so a decoder reading wrong offsets or a stats
    pass dropping samples mismatches immediately."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[key]:
                did = int(did)
                n = 64 + did % 97
                a = (
                    int.from_bytes(hashlib.md5(str(did).encode()).digest()[:2], "big")
                    % 32768
                )
                samples = np.full(n, a, dtype=np.int16)
                samples[1::2] = -a
                payloads.append(codecs.encode_wav(samples, AUDIO_FIXTURE_RATE))
            yield pd.DataFrame({key: pdf[key], "payload": payloads})

    return docs.select(key).mapInPandas(run, f"{key} long, payload binary")


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak_amp", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("n_silent", T.LongType()),
    ]
)


def extract_audio_stats(df: DataFrame) -> DataFrame:
    """Waveform-analysis pass over decoded PCM — the audio analog of the
    raster channel-means decode: peak ``max|s|``, energy ``sum(s^2)``
    (exact BIGINT — no float accumulation, bit-identical cross-engine),
    zero crossings (strict sign flips ``s_i * s_{i+1} < 0``), and silent
    sample count (``s == 0``).  All computed from the decoded stream
    with vectorized numpy inside one Arrow batch; binary in, five longs
    out, no shuffle.  Max energy at the fixture sizes is
    ``160 * 32767^2 < 2^38`` — five orders of magnitude of BIGINT
    headroom."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _rate = codecs.decode_wav(bytes(payload))
                s = frames[:, 0].astype(np.int64)
                rows.append(
                    (
                        int(did),
                        s.shape[0],
                        int(np.abs(s).max()) if s.size else 0,
                        int((s * s).sum()),
                        int((s[:-1] * s[1:] < 0).sum()),
                        int((s == 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "peak_amp", "energy",
                    "zero_crossings", "n_silent",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_STATS_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("mean_amp", T.LongType()),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Real-decode audio statistics: byte size, rate, frame count,
    channel count, and rounded mean amplitude, all parsed from the WAV
    payload.  A payload the decoder rejects raises — corrupt-input policy
    belongs in the caller, not a silently-null decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                frames, rate = codecs.decode_wav(raw)
                rows.append(
                    (
                        int(did),
                        len(raw),
                        rate,
                        frames.shape[0],
                        frames.shape[1],
                        int(round(float(frames.mean()))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "n_samples", "n_channels", "mean_amp",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


RESAMPLED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """The genuine audio chain — decode → nearest-neighbor resample →
    re-encode — inside one ``mapInPandas`` iterator: binary in, binary
    out, Arrow-batched, no shuffle (the same contract as the raster
    ``resize_media`` real path; a production build swaps the codec for
    libav/soundfile)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, rate = codecs.decode_wav(bytes(payload))
                out = codecs.resample_nearest_audio(frames, rate, target_rate)
                enc = codecs.encode_wav(out, target_rate)
                rows.append((int(did), enc, target_rate, out.shape[0], len(enc)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "payload", "sample_rate", "n_samples", "n_bytes"],
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESAMPLED_AUDIO_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_r", T.LongType()),
        T.StructField("mean_g", T.LongType()),
        T.StructField("mean_b", T.LongType()),
    ]
)


def media_pixel_stats(df: DataFrame) -> DataFrame:
    """Real-decode content statistics: dimensions, encoded size, and
    per-channel rounded pixel means, all parsed from the BMP payload.

    Chained after :func:`resize_media` (real path) this closes the full
    encode → decode → resample → re-encode → **re-decode** loop — the
    channel means come from pixels that survived the whole chain, which
    is what the oracle twin pins (constant-fill fixtures make the means
    exact integers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                px = codecs.decode_bmp(raw)
                means = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        int(did),
                        px.shape[1],
                        px.shape[0],
                        len(raw),
                        int(round(float(means[0]))),
                        int(round(float(means[1]))),
                        int(round(float(means[2]))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes", "mean_r", "mean_g", "mean_b"],
            )

    return df.select("doc_id", "payload").mapInPandas(run, PIXEL_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# VIDEO modality through the REAL BMV container codec (codecs.py): a
# fixed-layout stream of equal-size BMP frames with a frame index in the
# header, so frame sampling is random-access — decode cost is
# O(frames sampled), never O(frames stored).  The fixture makes every
# frame's content derivable from (doc_id, frame_idx) alone, which is what
# lets the DuckDB oracle pin the decoded pixel means without a decoder.
# ---------------------------------------------------------------------------


def attach_video_payload(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic synthetic BMV payload per document — the fixture for
    the real-video branch.  ``2 + id % 7`` frames of ``(4 + id % 13) ×
    (4 + id % 11)`` pixels; frame ``f`` is constant-filled with the first
    three bytes of ``md5(f"{id}:{f}")`` — per-FRAME content, so sampling
    provably decodes the frame it claims to."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[key]:
                did = int(did)
                w, h = 4 + did % 13, 4 + did % 11
                frames = []
                for f in range(2 + did % 7):
                    color = np.frombuffer(
                        hashlib.md5(f"{did}:{f}".encode()).digest()[:3],
                        dtype=np.uint8,
                    )
                    frames.append(
                        np.ascontiguousarray(np.broadcast_to(color, (h, w, 3)))
                    )
                payloads.append(codecs.encode_video(frames))
            yield pd.DataFrame({key: pdf[key], "payload": payloads})

    return docs.select(key).mapInPandas(run, f"{key} long, payload binary")


VIDEO_INFO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def extract_video_info(df: DataFrame) -> DataFrame:
    """Container metadata + first-frame dimensions: one header parse and
    ONE frame decode per video, regardless of frame count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames, _fsize = codecs.video_info(raw)
                first = codecs.decode_video_frame(raw, 0)
                rows.append(
                    (int(did), len(raw), n_frames, first.shape[1], first.shape[0])
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "n_frames", "width", "height"]
            )

    return df.select("doc_id", "payload").mapInPandas(run, VIDEO_INFO_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.LongType()),
        T.StructField("mean_g", T.LongType()),
        T.StructField("mean_b", T.LongType()),
    ]
)


def sample_video_frames_real(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Every-kth-frame sampling with REAL per-frame decode: for each video
    decode frames 0, k, 2k, … via the container's random-access index and
    emit per-frame channel means.  Narrow ``mapInPandas`` — one output
    row per sampled frame, no shuffle; the unsampled frames' bytes are
    never parsed (seek arithmetic skips them), which at 100 TB is the
    difference between reading 1/k of the pixel work and all of it."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames, _fsize = codecs.video_info(raw)
                for f in range(0, n_frames, every_k):
                    px = codecs.decode_video_frame(raw, f)
                    means = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            int(did),
                            f,
                            px.shape[1],
                            px.shape[0],
                            int(round(float(means[0]))),
                            int(round(float(means[1]))),
                            int(round(float(means[2]))),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA])

    return df.select("doc_id", "payload").mapInPandas(run, VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Image perceptual hashing — the visual analog of text SimHash, and the
# entry point for IMAGE near-dup dedup: average-hash (aHash) over decoded
# pixels, then hamming-radius pairs through the same pigeonhole-block
# join text dedup uses (operators.dedup.bitsig_near_pairs).  60 bits on
# purpose: the signature is drop-in compatible with SIMHASH_BITS block
# machinery and fits a signed BIGINT exactly on both engines.
# ---------------------------------------------------------------------------

AHASH_W, AHASH_H = 10, 6  # 60 pixels = SIMHASH_BITS
AHASH_BITS = AHASH_W * AHASH_H


def attach_gradient_bmp_payload(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic 10×6 gray BMP per document — the aHash fixture,
    designed so near-dups exist BY CONSTRUCTION and nothing else pairs.

    Each doc draws a base image id ``a = md5_16(id) % 256``; pixel rank
    ``r = y*10 + x`` has gray ``md5_16(f"{a}:{r}") % 256`` — uniform and
    INDEPENDENT per (a, r), so two different base images are ~30 bits
    apart and never land within a small hamming radius by accident.  On
    top, one planted edit: pixel ``p = id % 60`` gets +128 (mod 256).
    Docs sharing ``a`` are therefore the same photo with one-pixel
    edits — identical when ``p`` also agrees, hamming ~2 otherwise (the
    two edited pixels' bits, ± mean-shift borderline flips) — while
    cross-``a`` pairs stay far.  Every gray value is still a closed
    form in ``(doc_id, r)`` the oracle reproduces exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[key]:
                did = int(did)
                a = (
                    int.from_bytes(hashlib.md5(str(did).encode()).digest()[:2], "big")
                    % 256
                )
                v = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(f"{a}:{r}".encode()).digest()[:2], "big"
                        )
                        % 256
                        for r in range(AHASH_BITS)
                    ],
                    dtype=np.int64,
                )
                v[did % AHASH_BITS] = (v[did % AHASH_BITS] + 128) % 256
                px = (
                    v.astype(np.uint8)
                    .reshape(AHASH_H, AHASH_W)[:, :, None]
                    .repeat(3, axis=2)
                )
                payloads.append(codecs.encode_bmp(px))
            yield pd.DataFrame({key: pdf[key], "payload": payloads})

    return docs.select(key).mapInPandas(run, f"{key} long, payload binary")


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.StringType()),
        T.StructField("h", T.LongType()),
    ]
)


def image_ahash(df: DataFrame) -> DataFrame:
    """Average-hash over genuinely decoded pixels: gray value per pixel
    (exact for the gray fixture — all channels equal), bit ``r`` set iff
    the pixel is over the image mean.  The comparison is cleared of
    division — ``60·v > Σv`` — so every bit is integer-exact and
    bit-identical cross-engine; no float mean, no rounding rule.

    Emits ``(doc_id, simhash: 60-char bitstring MSB-first, h: long)`` —
    the same signature contract as ``dedup.simhash_signatures``, so the
    hamming pair machinery applies unchanged.  An image whose decoded
    size is not 10×6 raises: hash inputs must be pre-resized
    (``resize_media``), silently hashing mixed geometries would make
    distances meaningless."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = codecs.decode_bmp(bytes(payload))
                if px.shape[:2] != (AHASH_H, AHASH_W):
                    raise ValueError(
                        f"aHash expects {AHASH_W}x{AHASH_H} input, got "
                        f"{px.shape[1]}x{px.shape[0]} — resize first"
                    )
                gray = px.astype(np.int64).sum(axis=2) // 3
                v = gray.reshape(-1)
                s = int(v.sum())
                bit = AHASH_BITS * v > s
                bits = "".join("1" if b else "0" for b in bit)
                rows.append((int(did), bits, int(bits, 2)))
            yield pd.DataFrame(rows, columns=["doc_id", "simhash", "h"])

    return df.select("doc_id", "payload").mapInPandas(run, AHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame, radius: int = 4, max_block_size: int | None = None
) -> DataFrame:
    """Image near-dup pairs: decode → aHash → pigeonhole-block hamming
    join (shared with text SimHash — ``dedup.bitsig_near_pairs``).
    Signatures are cached (both sides of the self-join read them; one
    narrow row per image) and released via the operator-cache registry.
    Columns: ``doc_a, doc_b, hamming``."""
    from ..caching import register_cache
    from .dedup import bitsig_near_pairs

    sig = register_cache(image_ahash(df))
    return bitsig_near_pairs(sig, "doc_id", radius, max_block_size)
