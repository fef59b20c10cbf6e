"""Multimodal plumbing tests: binary schema, Arrow batch shape,
deterministic stub decode, frame explode."""

from __future__ import annotations

import hashlib

from airflow_postgres_etl_spark.operators.multimodal import (
    HAVE_CODECS,
    attach_payload,
    extract_media_features,
    sample_frames,
)
from airflow_postgres_etl_spark.sources.parquet_source import load_table

from .conftest import SF_SMOKE


def test_payload_is_binary(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with_payload = attach_payload(docs)
    assert dict(with_payload.dtypes)["payload"] == "binary"


def test_stub_features_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    feats = extract_media_features(attach_payload(docs)).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(feats) == 20
    for r in feats:
        raw = texts[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.checksum == hashlib.md5(raw).hexdigest()
        assert 1 <= r.n_frames <= 16


def test_frame_sample_explodes_n_frames(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    feats = extract_media_features(attach_payload(docs))
    frames = sample_frames(feats)
    per_doc = {r.doc_id: r.n_frames for r in feats.collect()}
    counts = {
        r.doc_id: r["count"] for r in frames.groupBy("doc_id").count().collect()
    }
    assert counts == per_doc
    assert HAVE_CODECS is False  # this environment ships the stub path


def test_real_codecs_is_explicit_opt_in(spark):
    """The stub runs whether or not codec libs are importable; only an
    explicit use_real_codecs=True reaches the real (BMP) decode branch —
    which rejects a payload that isn't an image rather than guessing."""
    import pytest as _pytest

    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_payload,
        extract_media_features,
    )

    # > 54 bytes so the decoder reaches the magic check, not the
    # truncated-header guard
    docs = spark.createDataFrame(
        [(1, "hello, this is definitely not an image payload " * 4)],
        ["doc_id", "text"],
    )
    df = attach_payload(docs)  # utf-8 text bytes, NOT a BMP
    assert extract_media_features(df).count() == 1  # default: stub, always
    with _pytest.raises(Exception, match="not a BMP"):
        extract_media_features(df, use_real_codecs=True).collect()


def test_resize_media_binary_contract(spark):
    import pytest

    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_payload,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 2000), (2, "short"), (3, "")], ["doc_id", "text"]
    )
    out = resize_media(attach_payload(docs), 224, 224).collect()
    by_id = {r.doc_id: r for r in out}
    budget = 224 * 224 // 64
    assert by_id[1].n_bytes == budget and len(by_id[1].payload) == budget
    assert by_id[1].payload == b"x" * budget  # prefix-truncation, not garbage
    assert by_id[2].n_bytes == 5 and by_id[2].payload == b"short"
    assert by_id[3].n_bytes == 0
    assert all(r.width == 224 and r.height == 224 for r in out)

    # the real branch demands genuine image bytes ("not a BMP" for the
    # long payload, "truncated BMP" for the sub-header-size ones —
    # whichever partition fails first)
    with pytest.raises(Exception, match="BMP"):
        resize_media(attach_payload(docs), use_real_codecs=True).collect()


def test_bmp_codec_roundtrip_and_rejects_corruption():
    """Pure-codec unit tests: encode→decode identity, exact size
    arithmetic, nearest-neighbor semantics, corrupt-input rejection."""
    import numpy as np
    import pytest

    from airflow_postgres_etl_spark.operators import codecs

    rng_bytes = hashlib.md5(b"fixture").digest() * 12  # deterministic "noise"
    px = np.frombuffer(rng_bytes[: 7 * 9 * 3], dtype=np.uint8).reshape(9, 7, 3).copy()
    data = codecs.encode_bmp(px)
    assert len(data) == codecs.bmp_size(7, 9)
    assert (codecs.decode_bmp(data) == px).all()

    # nearest-neighbor: 2x2 checkerboard upsampled 2x keeps exact quadrants
    quad = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    up = codecs.resize_nearest(quad, 4, 4)
    assert (up[:2, :2] == quad[0, 0]).all() and (up[2:, 2:] == quad[1, 1]).all()
    # downsample back: picks the pixel-center samples
    down = codecs.resize_nearest(up, 2, 2)
    assert (down == quad).all()

    with pytest.raises(ValueError, match="not a BMP"):
        codecs.decode_bmp(b"PNG" + data[3:])
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_bmp(data[:40])
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_bmp(data[:-10])
    with pytest.raises(ValueError, match="only 24-bit"):
        bad = bytearray(data)
        bad[28] = 8  # bpp field
        codecs.decode_bmp(bytes(bad))


def test_real_decode_resize_chain(spark):
    """encode → decode → resample → re-encode → re-decode, end to end on
    the synthetic BMP fixtures: dimensions and sizes follow the fixture
    arithmetic, and the constant fill color survives the whole chain."""
    import numpy as np

    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_bmp_payload,
        extract_media_features,
        media_pixel_stats,
        resize_media,
    )
    from airflow_postgres_etl_spark.operators import codecs

    docs = spark.createDataFrame([(i,) for i in range(25)], ["doc_id"])
    bmp = attach_bmp_payload(docs)

    feats = {r.doc_id: r for r in extract_media_features(bmp, use_real_codecs=True).collect()}
    for i in range(25):
        w, h = 4 + i % 13, 4 + i % 11
        assert (feats[i].width, feats[i].height) == (w, h)
        assert feats[i].n_bytes == codecs.bmp_size(w, h)
        assert feats[i].n_frames == 1

    stats = {
        r.doc_id: r
        for r in media_pixel_stats(
            resize_media(bmp, 16, 16, use_real_codecs=True)
        ).collect()
    }
    for i in range(25):
        color = np.frombuffer(hashlib.md5(str(i).encode()).digest()[:3], dtype=np.uint8)
        r = stats[i]
        assert (r.width, r.height) == (16, 16)
        assert r.n_bytes == codecs.bmp_size(16, 16) == 822
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(int(c) for c in color)
