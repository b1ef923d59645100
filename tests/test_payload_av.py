"""Audio/video payload plumbing (payload/av.py): deterministic
synthetic clips, Arrow-batched decode/feature/frame-sample, and
hand-computed goldens matching the closed-form patterns the DuckDB
oracles re-derive."""

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _seed(k: int) -> int:
    return (k * 2654435761) % (2**31)


def _pattern_samples(k: int, n: int) -> np.ndarray:
    return np.array(
        [((_seed(k) + 7919 * i) % 65536) - 32768 for i in range(n)], dtype=np.int64
    )


def test_audio_features_golden_pcm16(spark):
    from osmzen_spark.payload.av import AUDIO_SAMPLES, audio_features, synthetic_audio

    aud = synthetic_audio(spark, SF_DIR)
    row = audio_features(aud).filter("audio_id = 'aud-8'").collect()[0]  # even key: pcm16
    v = _pattern_samples(8, AUDIO_SAMPLES)
    assert row["n_samples"] == AUDIO_SAMPLES
    assert row["sum_v"] == int(v.sum())
    assert row["sum_sq"] == int((v * v).sum())
    assert row["zero_crossings"] == int(np.count_nonzero((v[1:] >= 0) != (v[:-1] >= 0)))


def test_audio_features_golden_adpcm(spark):
    """Odd keys are REAL IMA-ADPCM bytes; the features must match the
    codec's decoded samples (lossy codec, exact decode)."""
    from osmzen_spark.payload.av import (
        AUDIO_SAMPLES,
        adpcm_decode,
        adpcm_encode,
        audio_features,
        synthetic_audio,
    )

    aud = synthetic_audio(spark, SF_DIR)
    row = audio_features(aud).filter("audio_id = 'aud-7'").collect()[0]
    raw = _pattern_samples(7, AUDIO_SAMPLES).astype(np.int16)
    v = adpcm_decode(adpcm_encode(raw), AUDIO_SAMPLES).astype(np.int64)
    assert row["sum_v"] == int(v.sum())
    assert row["sum_sq"] == int((v * v).sum())
    assert row["zero_crossings"] == int(np.count_nonzero((v[1:] >= 0) != (v[:-1] >= 0)))


def test_adpcm_roundtrip_tracks_smooth_signal():
    from osmzen_spark.payload.av import adpcm_decode, adpcm_encode

    t = np.arange(256)
    sig = (6000 * np.sin(t / 10.0)).astype(np.int16)
    dec = adpcm_decode(adpcm_encode(sig), 256).astype(np.int64)
    # after the initial adaptation ramp the codec tracks closely
    tail_err = np.abs(dec[32:] - sig[32:].astype(np.int64)).max()
    assert tail_err < 2000, tail_err


def test_audio_unknown_codec_stub(spark):
    from osmzen_spark.payload.av import audio_features

    df = spark.createDataFrame(
        [("a", b"\x00\x01", 16000, 1, "mp3")],
        "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string",
    )
    try:
        audio_features(df).collect()
        raise AssertionError("expected NotImplementedError for mp3")
    except Exception as e:
        assert "mp3" in str(e)


def test_video_frame_sample_golden_rawv(spark):
    from osmzen_spark.payload.av import sample_frames, synthetic_video

    vid = synthetic_video(spark, SF_DIR)
    rows = sample_frames(vid, every=2).filter("video_id = 'vid-4'").collect()  # even: rawv
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
    s = _seed(4)
    for r in rows:
        f = r["frame_idx"]
        exp = np.array(
            [
                [[(s + 7 * x + 13 * y + 29 * c + 31 * f) % 256 for c in range(3)] for x in range(8)]
                for y in range(8)
            ],
            dtype=np.uint8,
        )
        assert bytes(r["frame"]) == exp.tobytes()
        assert r["sum_r"] == int(exp[:, :, 0].sum())
        assert r["sum_g"] == int(exp[:, :, 1].sum())
        assert r["sum_b"] == int(exp[:, :, 2].sum())


def test_video_frame_sample_golden_mjpeg(spark):
    """Odd keys are REAL Motion JPEG clips: sampled frames must equal
    the baseline decoder's output for the synthesized streams."""
    import numpy as np

    from osmzen_spark.payload.av import mjpeg_frame_coefs, sample_frames, synthetic_video
    from osmzen_spark.payload.jpeg import decode_baseline, encode_from_coefficients

    vid = synthetic_video(spark, SF_DIR)
    rows = sample_frames(vid, every=2).filter("video_id = 'vid-3'").collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
    q16 = np.full((8, 8), 16, dtype=np.int64)
    for r in rows:
        exp = decode_baseline(
            encode_from_coefficients(mjpeg_frame_coefs(_seed(3), r["frame_idx"]), q16, q16)
        )
        assert bytes(r["frame"]) == exp.tobytes()


def test_mjpeg_demux_boundaries():
    import numpy as np

    from osmzen_spark.payload.av import mjpeg_frame_coefs, split_mjpeg_frames
    from osmzen_spark.payload.jpeg import encode_from_coefficients

    q16 = np.full((8, 8), 16, dtype=np.int64)
    frames = [encode_from_coefficients(mjpeg_frame_coefs(42, f), q16, q16) for f in range(4)]
    got = split_mjpeg_frames(b"".join(frames))
    assert got == frames


def test_video_clip_is_one_key_per_order(spark):
    from osmzen_spark.payload.av import synthetic_video

    vid = synthetic_video(spark, SF_DIR)
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey").distinct().count()
    assert vid.count() == n_orders
    b = vid.filter("video_id = 'vid-0'").collect()[0]
    assert len(bytes(b["bytes"])) == 6 * 8 * 8 * 3
