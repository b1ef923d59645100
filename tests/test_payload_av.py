"""Audio/video payload plumbing (payload/av.py): deterministic
synthetic clips, Arrow-batched decode/feature/frame-sample, and
hand-computed goldens matching the closed-form patterns the DuckDB
oracles re-derive."""

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _seed(k: int) -> int:
    return (k * 2654435761) % (2**31)


def test_audio_features_golden(spark):
    from osmzen_spark.payload.av import AUDIO_SAMPLES, audio_features, synthetic_audio

    aud = synthetic_audio(spark, SF_DIR)
    row = audio_features(aud).filter("audio_id = 'aud-7'").collect()[0]
    v = np.array(
        [((_seed(7) + 7919 * i) % 65536) - 32768 for i in range(AUDIO_SAMPLES)],
        dtype=np.int64,
    )
    assert row["n_samples"] == AUDIO_SAMPLES
    assert row["sum_v"] == int(v.sum())
    assert row["sum_sq"] == int((v * v).sum())
    assert row["zero_crossings"] == int(np.count_nonzero((v[1:] >= 0) != (v[:-1] >= 0)))


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


def test_video_frame_sample_golden(spark):
    from osmzen_spark.payload.av import sample_frames, synthetic_video

    vid = synthetic_video(spark, SF_DIR)
    rows = sample_frames(vid, every=2).filter("video_id = 'vid-3'").collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
    s = _seed(3)
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


def test_video_clip_is_one_key_per_order(spark):
    from osmzen_spark.payload.av import synthetic_video

    vid = synthetic_video(spark, SF_DIR)
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey").distinct().count()
    assert vid.count() == n_orders
    b = vid.filter("video_id = 'vid-0'").collect()[0]
    assert len(bytes(b["bytes"])) == 6 * 8 * 8 * 3
