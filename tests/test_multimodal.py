"""Multimodal plumbing tests: binary schema, Arrow batch shape,
deterministic stub decode, frame explode."""

from __future__ import annotations

import hashlib

import numpy as np

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


def test_wav_codec_roundtrip_and_rejects_corruption():
    """Pure-codec properties: encode→decode is the identity on samples
    and rate (mono and stereo), chunk walking skips unknown chunks, and
    corrupt/unsupported inputs raise instead of mis-decoding."""
    import pytest

    from airflow_postgres_etl_spark.operators import codecs

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, size=100, dtype=np.int16)
    data = codecs.encode_wav(mono, 8000)
    assert len(data) == codecs.wav_size(100) == 44 + 200
    frames, rate = codecs.decode_wav(data)
    assert rate == 8000 and frames.shape == (100, 1)
    assert (frames[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32767, size=(50, 2), dtype=np.int16)
    frames2, rate2 = codecs.decode_wav(codecs.encode_wav(stereo, 44100))
    assert rate2 == 44100 and frames2.shape == (50, 2) and (frames2 == stereo).all()

    # unknown chunks between fmt and data are skipped (real encoders emit
    # LIST/fact chunks), including odd-sized ones (word-aligned padding)
    d = codecs.encode_wav(mono, 8000)
    fmt_chunk = d[12:36]
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    patched = d[:12] + fmt_chunk + extra + d[36:]
    frames3, _ = codecs.decode_wav(patched)
    assert (frames3[:, 0] == mono).all()

    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFF")  # truncated
    with pytest.raises(ValueError):
        codecs.decode_wav(b"JUNK" + data[4:])  # bad magic
    with pytest.raises(ValueError):
        codecs.decode_wav(data[:40])  # missing data chunk
    # 8-bit PCM refused, not mis-read
    bad_fmt = bytearray(data)
    bad_fmt[34] = 8
    with pytest.raises(ValueError):
        codecs.decode_wav(bytes(bad_fmt))
    with pytest.raises(ValueError):
        codecs.encode_wav(mono.astype(np.int32), 8000)


def test_wav_resample_arithmetic():
    """Nearest-neighbor resample: exact output length floor(n*dst/src),
    sample-and-hold picks, identity at equal rates, upsampling repeats."""
    from airflow_postgres_etl_spark.operators import codecs

    ramp = np.arange(10, dtype=np.int16).reshape(-1, 1)
    down = codecs.resample_nearest_audio(ramp, 8000, 4000)
    assert down.shape == (5, 1)
    # centers 0.5,1.5,2.5,3.5,4.5 of 5 map to src 1,3,5,7,9
    assert down[:, 0].tolist() == [1, 3, 5, 7, 9]
    same = codecs.resample_nearest_audio(ramp, 8000, 8000)
    assert (same == ramp).all()
    up = codecs.resample_nearest_audio(ramp, 4000, 8000)
    assert up.shape == (20, 1)
    assert up[:, 0].tolist() == sorted([i for i in range(10)] * 2)


def test_real_audio_chain(spark):
    """Spark-side chain over genuine WAV payloads: attach → decode →
    resample 8k→4k → re-encode → re-decode; every quantity matches the
    fixture arithmetic, and the constant amplitude survives the chain."""
    import hashlib as _hl

    from airflow_postgres_etl_spark.operators import codecs
    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_wav_payload,
        extract_audio_features,
        resample_audio,
    )

    docs = spark.range(25).withColumnRenamed("id", "doc_id")
    wav = attach_wav_payload(docs)

    feats = {r.doc_id: r for r in extract_audio_features(wav).collect()}
    for i in range(25):
        n = 64 + i % 97
        amp = int.from_bytes(_hl.md5(str(i).encode()).digest()[:2], "big") - 32768
        f = feats[i]
        assert (f.n_samples, f.sample_rate, f.n_channels) == (n, 8000, 1)
        assert f.n_bytes == codecs.wav_size(n)
        assert f.mean_amp == amp

    out = {r.doc_id: r for r in extract_audio_features(resample_audio(wav, 4000)).collect()}
    for i in range(25):
        n_out = (64 + i % 97) // 2
        amp = int.from_bytes(_hl.md5(str(i).encode()).digest()[:2], "big") - 32768
        r = out[i]
        assert (r.n_samples, r.sample_rate) == (n_out, 4000)
        assert r.n_bytes == codecs.wav_size(n_out)
        assert r.mean_amp == amp


def test_audio_stats_square_wave_and_silence(spark):
    """Waveform analysis over the square-wave fixture: peak/energy/
    crossings/silence match the (n, a) closed forms, including the
    all-silent degenerate case (a = 0), which the md5-driven fixture
    never produces for small ids, so it is built by hand here."""
    import hashlib as _hl2

    import numpy as np

    from airflow_postgres_etl_spark.operators import codecs
    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_wav_square_payload,
        extract_audio_stats,
    )

    docs = spark.range(25).withColumnRenamed("id", "doc_id")
    stats = {
        r.doc_id: r
        for r in extract_audio_stats(attach_wav_square_payload(docs)).collect()
    }
    for i in range(25):
        n = 64 + i % 97
        a = int.from_bytes(_hl2.md5(str(i).encode()).digest()[:2], "big") % 32768
        s = stats[i]
        assert s.n_samples == n
        assert s.peak_amp == a
        assert s.energy == n * a * a
        assert s.zero_crossings == (n - 1 if a > 0 else 0)
        assert s.n_silent == (n if a == 0 else 0)

    silent = spark.createDataFrame(
        [(7, codecs.encode_wav(np.zeros(50, dtype=np.int16), 8000))],
        "doc_id long, payload binary",
    )
    r = extract_audio_stats(silent).collect()[0]
    assert (r.n_samples, r.peak_amp, r.energy, r.zero_crossings, r.n_silent) == (
        50, 0, 0, 0, 50,
    )


def _ahash_closed_form(did: int) -> tuple[str, int]:
    import hashlib as _hl3

    a = int.from_bytes(_hl3.md5(str(did).encode()).digest()[:2], "big") % 256
    v = [
        int.from_bytes(_hl3.md5(f"{a}:{r}".encode()).digest()[:2], "big") % 256
        for r in range(60)
    ]
    v[did % 60] = (v[did % 60] + 128) % 256
    s = sum(v)
    bits = "".join("1" if 60 * x > s else "0" for x in v)
    return bits, int(bits, 2)


def test_image_ahash_matches_closed_form(spark):
    """The decode→gray→over-mean pass reproduces the fixture's (doc_id, r)
    closed form bit-for-bit — integer threshold (60·v > Σv), no float
    mean anywhere."""
    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_gradient_bmp_payload,
        image_ahash,
    )

    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    got = {
        r.doc_id: (r.simhash, r.h)
        for r in image_ahash(attach_gradient_bmp_payload(docs)).collect()
    }
    for i in range(40):
        assert got[i] == _ahash_closed_form(i), i


def test_image_near_dup_complete_vs_brute_force(spark):
    """The pigeonhole-block join returns EXACTLY the brute-force
    hamming ≤ radius pair set — completeness is by construction
    (radius+1 blocks), so a missing pair is a bug, not recall."""
    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_gradient_bmp_payload,
        image_near_dup_pairs,
    )

    n, radius = 150, 4
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in image_near_dup_pairs(
            attach_gradient_bmp_payload(docs), radius=radius
        ).collect()
    }
    sigs = [_ahash_closed_form(i)[1] for i in range(n)]
    want = {
        (i, j, bin(sigs[i] ^ sigs[j]).count("1"))
        for i in range(n)
        for j in range(i + 1, n)
        if bin(sigs[i] ^ sigs[j]).count("1") <= radius
    }
    assert got == want and want  # non-empty: planted near-dups exist


import hashlib as _hl

from airflow_postgres_etl_spark.operators import codecs


def test_video_codec_roundtrip_and_random_access():
    """BMV container: encode -> info -> random-access frame decode matches
    the source pixels; random access to frame k equals what a sequential
    walk would produce."""
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8) for _ in range(5)
    ]
    blob = codecs.encode_video(frames)
    n_frames, frame_size = codecs.video_info(blob)
    assert n_frames == 5
    assert len(blob) == codecs.video_size(9, 6, 5)
    assert frame_size == codecs.bmp_size(9, 6)
    for k in (0, 2, 4):
        np.testing.assert_array_equal(codecs.decode_video_frame(blob, k), frames[k])


def test_video_codec_strictness():
    import pytest

    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    blob = codecs.encode_video(frames)
    with pytest.raises(ValueError):
        codecs.video_info(b"XXXX" + blob[4:])  # bad magic
    with pytest.raises(ValueError):
        codecs.video_info(blob[:-10])  # truncated frame data
    with pytest.raises(ValueError):
        codecs.decode_video_frame(blob, 1)  # out of range
    with pytest.raises(ValueError):
        codecs.encode_video([])  # empty
    with pytest.raises(ValueError):
        codecs.encode_video(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)]
        )  # mixed shapes


def test_video_sampling_decodes_exactly_the_sampled_frames(spark):
    """every_k=3 on the synthetic fixture: output rows are frames 0, 3, 6…
    and each row's channel means equal the md5-derived fill color of THAT
    frame — a decoder reading the wrong offset would mismatch."""
    from airflow_postgres_etl_spark.operators.multimodal import (
        attach_video_payload,
        extract_video_info,
        sample_video_frames_real,
    )

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    vids = attach_video_payload(docs)

    info = {r.doc_id: r for r in extract_video_info(vids).collect()}
    for i in range(30):
        w, h, n = 4 + i % 13, 4 + i % 11, 2 + i % 7
        r = info[i]
        assert (r.width, r.height, r.n_frames) == (w, h, n)
        assert r.n_bytes == codecs.video_size(w, h, n)

    rows = sample_video_frames_real(vids, every_k=3).collect()
    got = {(r.doc_id, r.frame_idx): r for r in rows}
    expect_keys = {
        (i, f) for i in range(30) for f in range(0, 2 + i % 7, 3)
    }
    assert set(got) == expect_keys
    for (i, f), r in got.items():
        color = _hl.md5(f"{i}:{f}".encode()).digest()[:3]
        assert (r.mean_r, r.mean_g, r.mean_b) == (color[0], color[1], color[2])


def test_video_codec_property_roundtrip():
    """Property: any stack of equal-shape uint8 frames survives
    encode -> random-access decode bit-for-bit, and the header
    arithmetic matches video_size."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=17),
        h=st.integers(min_value=1, max_value=13),
        n=st.integers(min_value=1, max_value=6),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, n, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        blob = codecs.encode_video(frames)
        assert len(blob) == codecs.video_size(w, h, n)
        got_n, _ = codecs.video_info(blob)
        assert got_n == n
        for k in range(n):
            np.testing.assert_array_equal(
                codecs.decode_video_frame(blob, k), frames[k]
            )

    check()
