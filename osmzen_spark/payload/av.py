"""Multimodal (audio / video) payload plumbing.

Like images (payload/images.py), audio and video ride through the
engine as opaque binary columns with typed metadata; the Spark-side
plumbing — schema, Arrow batching, mapInArrow explode shape — is real
and oracle-verified. The synthetic payloads follow closed-form
arithmetic patterns so a DuckDB oracle can re-derive every decoded
sample/pixel without any codec:

  audio  sample(i)      = ((seed + 7919*i) mod 65536) - 32768   (PCM16)
  video  pixel(f,x,y,c) = (seed + 7*x + 13*y + 29*c + 31*f) mod 256
  seed                  = (key * 2654435761) mod 2^31

Real codec decode (mp3/aac/h264...) is STUBBED behind
NotImplementedError — no media libraries exist in this container; the
fmt dispatch and batch shapes are exactly what a libav-backed decoder
would slot into.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIO_SAMPLES = 64
VIDEO_FRAMES = 6
VIDEO_W = VIDEO_H = 8


def _keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.select(F.col("o_orderkey").alias("k"))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
    )


def synthetic_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 64-sample PCM16-LE mono clip per orders row, materialized
    once per SF (datagen.payload_cache) and read back as parquet."""
    from osmzen_spark.datagen import payload_cache

    return payload_cache(
        spark, sf_dir, "audio", lambda: _synthetic_audio_uncached(spark, sf_dir)
    )


def _synthetic_audio_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_schema = "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string"

    def mapper(batches):
        i = np.arange(AUDIO_SAMPLES, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ks = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            seeds = (ks * 2654435761) % (2**31)
            v = ((seeds.reshape(n, 1) + 7919 * i) % 65536 - 32768).astype("<i2")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([f"aud-{k}" for k in ks]),
                    pa.array([v[j].tobytes() for j in range(n)], type=pa.binary()),
                    pa.array(np.full(n, 16000, dtype=np.int32)),
                    pa.array(np.full(n, AUDIO_SAMPLES, dtype=np.int32)),
                    pa.array(["pcm16"] * n),
                ],
                names=["audio_id", "bytes", "sample_rate", "n_samples", "fmt"],
            )

    return _keys(spark, sf_dir).mapInArrow(mapper, schema=out_schema)


def decode_pcm16(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2")


def audio_features(audio: DataFrame) -> DataFrame:
    """Decode + integer feature extract in one Arrow pass: sample sum,
    sum of squares (energy), and sign-change count (zero crossings) —
    all exact integers, so the DuckDB oracle re-derivation is
    bit-for-bit."""
    out_schema = (
        "audio_id string, n_samples int, sum_v long, sum_sq long, zero_crossings int"
    )

    def mapper(batches):
        for batch in batches:
            ids, ns, sums, sqs, zcs = [], [], [], [], []
            fmts = batch.column(batch.schema.get_field_index("fmt")).to_pylist()
            blobs = batch.column(batch.schema.get_field_index("bytes")).to_pylist()
            aids = batch.column(batch.schema.get_field_index("audio_id")).to_pylist()
            for aid, fmt, blob in zip(aids, fmts, blobs):
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio codec {fmt!r}: no media libraries in this container; "
                        "a libav decode slots in here"
                    )
                v = decode_pcm16(blob).astype(np.int64)
                ids.append(aid)
                ns.append(len(v))
                sums.append(int(v.sum()))
                sqs.append(int((v * v).sum()))
                zcs.append(int(np.count_nonzero((v[1:] >= 0) != (v[:-1] >= 0))))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array(np.array(ns, dtype=np.int32)),
                    pa.array(np.array(sums, dtype=np.int64)),
                    pa.array(np.array(sqs, dtype=np.int64)),
                    pa.array(np.array(zcs, dtype=np.int32)),
                ],
                names=["audio_id", "n_samples", "sum_v", "sum_sq", "zero_crossings"],
            )

    return audio.mapInArrow(mapper, schema=out_schema)


def synthetic_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 6-frame 8x8 RGB raw clip per orders row, materialized once
    per SF (datagen.payload_cache) and read back as parquet; frames
    concatenated frame-major (f, y, x, c), same byte layout as images
    fmt='raw'."""
    from osmzen_spark.datagen import payload_cache

    return payload_cache(
        spark, sf_dir, "video", lambda: _synthetic_video_uncached(spark, sf_dir)
    )


def _synthetic_video_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_schema = (
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string, caption string"
    )

    def mapper(batches):
        xs = np.arange(VIDEO_W).reshape(1, 1, 1, VIDEO_W, 1)
        ys = np.arange(VIDEO_H).reshape(1, 1, VIDEO_H, 1, 1)
        cs = np.arange(3).reshape(1, 1, 1, 1, 3)
        fs = np.arange(VIDEO_FRAMES).reshape(1, VIDEO_FRAMES, 1, 1, 1)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ks = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            seeds = (ks * 2654435761) % (2**31)
            px = (
                (seeds.reshape(n, 1, 1, 1, 1) + 7 * xs + 13 * ys + 29 * cs + 31 * fs) % 256
            ).astype(np.uint8)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([f"vid-{k}" for k in ks]),
                    pa.array([px[j].tobytes() for j in range(n)], type=pa.binary()),
                    pa.array(np.full(n, VIDEO_W, dtype=np.int32)),
                    pa.array(np.full(n, VIDEO_H, dtype=np.int32)),
                    pa.array(np.full(n, VIDEO_FRAMES, dtype=np.int32)),
                    pa.array(["rawv"] * n),
                    pa.array([f"clip for order {k}" for k in ks]),
                ],
                names=["video_id", "bytes", "w", "h", "n_frames", "fmt", "caption"],
            )

    return _keys(spark, sf_dir).mapInArrow(mapper, schema=out_schema)


def sample_frames(video: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: explode each clip into one row per every-Nth
    frame (the training-pipeline shape: clip -> keyframes). Emits the
    raw frame bytes plus per-channel integer sums, so downstream sees
    both the real binary plumbing and an exactly-verifiable feature."""
    out_schema = (
        "video_id string, frame_idx int, frame binary, "
        "sum_r long, sum_g long, sum_b long"
    )

    def mapper(batches):
        for batch in batches:
            vids, fidxs, frames = [], [], []
            sr, sg, sb = [], [], []
            cols = {name: batch.column(i).to_pylist() for i, name in enumerate(batch.schema.names)}
            for vid, blob, w, h, nf, fmt in zip(
                cols["video_id"], cols["bytes"], cols["w"], cols["h"], cols["n_frames"], cols["fmt"]
            ):
                if fmt != "rawv":
                    raise NotImplementedError(
                        f"video codec {fmt!r}: no media libraries in this container; "
                        "a libav keyframe extraction slots in here"
                    )
                clip = np.frombuffer(blob, dtype=np.uint8).reshape(nf, h, w, 3)
                for f_idx in range(0, nf, every):
                    frame = clip[f_idx]
                    csum = frame.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    vids.append(vid)
                    fidxs.append(f_idx)
                    frames.append(frame.tobytes())
                    sr.append(int(csum[0]))
                    sg.append(int(csum[1]))
                    sb.append(int(csum[2]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vids),
                    pa.array(np.array(fidxs, dtype=np.int32)),
                    pa.array(frames, type=pa.binary()),
                    pa.array(np.array(sr, dtype=np.int64)),
                    pa.array(np.array(sg, dtype=np.int64)),
                    pa.array(np.array(sb, dtype=np.int64)),
                ],
                names=["video_id", "frame_idx", "frame", "sum_r", "sum_g", "sum_b"],
            )

    return video.mapInArrow(mapper, schema=out_schema)
