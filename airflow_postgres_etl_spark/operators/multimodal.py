"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched pandas on
``mapInPandas``.

The real codecs (image/audio/video) are NOT in this environment, so the
actual decode is stubbed: :data:`HAVE_CODECS` gates the real path (PIL
etc.) and the shipped path computes **deterministic** features from the
raw bytes (length, md5 checksum, fake dimensions/frame counts derived
arithmetically).  Everything around the stub is real and tested: the
binary schema, the Arrow batch transfer, the ``mapInPandas`` iterator
shape, the per-batch vectorization, and the downstream explode.

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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def extract_media_features(
    df: DataFrame, *, use_real_codecs: bool = False
) -> DataFrame:
    """``mapInPandas`` feature extraction over the binary payload.

    The deterministic stub is the default regardless of what libraries
    happen to be importable — real decoding is opt-in via
    ``use_real_codecs=True`` (which raises until a codec backend is wired
    in; ``HAVE_CODECS`` only reports availability, it never switches
    behavior on its own).
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real codec decode path not implemented in this build"
            + ("" if HAVE_CODECS else " (and no codec libraries installed)")
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
    a real backend would decode → resample → re-encode inside the same
    ``mapInPandas`` iterator — the Spark-side contract (binary → binary,
    schema, Arrow batching, no shuffle) is identical and is what's tested.
    Real decoding is opt-in via ``use_real_codecs=True`` and raises until
    a codec backend is wired in.
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real codec resize path not implemented in this build"
            + ("" if HAVE_CODECS else " (and no codec libraries installed)")
        )
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
