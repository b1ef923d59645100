"""Multimodal (audio / video) payload plumbing.

Like images (payload/images.py), audio and video ride through the
engine as opaque binary columns with typed metadata; the Spark-side
plumbing — schema, Arrow batching, mapInArrow explode shape — is real
and oracle-verified. Two REAL compressed codecs are implemented in
pure stdlib+numpy (same treatment as PNG/JPEG):

  * audio fmt='adpcm': IMA/DVI ADPCM, the classic 4-bit integer
    state-machine codec — encoder and decoder below; decode is a pure
    integer recurrence, so a DuckDB recursive CTE re-derives every
    decoded sample exactly (lossy codec, lossless oracle).
  * video fmt='mjpeg': Motion JPEG — concatenated baseline JFIF
    frames (payload/jpeg.py per frame; frame boundaries demuxed from
    the marker structure, which is what raw MJPEG essence is).

The uncompressed twins remain (fmt='pcm16', fmt='rawv'), with the
closed-form synthetic patterns:

  audio  sample(i)      = ((seed + 7919*i) mod 65536) - 32768   (PCM16)
  video  pixel(f,x,y,c) = (seed + 7*x + 13*y + 29*c + 31*f) mod 256
  seed                  = (key * 2654435761) mod 2^31

Perceptual-transform codecs (mp3/aac/h264...) remain STUBBED behind
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

# ------------------------------------------------------- IMA ADPCM
# Public-domain IMA/DVI ADPCM tables (IMA ADPCM reference algorithm).

ADPCM_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
ADPCM_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)


def adpcm_encode(samples: np.ndarray) -> bytes:
    """int16 PCM -> IMA ADPCM nibble stream (low nibble first, initial
    predictor 0 / index 0 — the raw-stream convention, no preamble)."""
    pred, idx = 0, 0
    nibbles = []
    for s in samples.astype(np.int64):
        diff = int(s) - pred
        nibble = 8 if diff < 0 else 0
        if nibble:
            diff = -diff
        step = int(ADPCM_STEPS[idx])
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= step >> 1:
            nibble |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nibble |= 1
        pred, idx = _adpcm_step(pred, idx, nibble)
        nibbles.append(nibble)
    if len(nibbles) % 2:
        nibbles.append(0)
    return bytes(
        (nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2)
    )


def _adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """Shared state update (encoder and decoder run the identical
    arithmetic — that's what makes the codec drift-free and the SQL
    re-derivation exact)."""
    step = int(ADPCM_STEPS[idx])
    vpdiff = step >> 3
    if nibble & 4:
        vpdiff += step
    if nibble & 2:
        vpdiff += step >> 1
    if nibble & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if nibble & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(ADPCM_INDEX[nibble])))
    return pred, idx


def adpcm_decode(data: bytes, n_samples: int) -> np.ndarray:
    """IMA ADPCM nibble stream -> int16 PCM (initial state 0/0)."""
    pred, idx = 0, 0
    out = np.empty(n_samples, dtype=np.int16)
    for i in range(n_samples):
        b = data[i >> 1]
        nibble = (b >> 4) if i & 1 else (b & 0xF)
        pred, idx = _adpcm_step(pred, idx, nibble)
        out[i] = pred
    return out


# --------------------------------------------------------- MJPEG demux


def split_mjpeg_frames(data: bytes) -> list[bytes]:
    """Raw MJPEG essence = concatenated JFIF streams. FFD8 cannot occur
    inside entropy-coded data (0xFF is stuffed as FF00; only FF D0-D7 /
    D9 markers appear), so EOI->SOI boundaries are unambiguous."""
    frames = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG frame at {pos} missing SOI")
        end = data.find(b"\xff\xd9", pos)
        if end < 0:
            raise ValueError("MJPEG frame missing EOI")
        frames.append(data[pos : end + 2])
        pos = end + 2
    return frames


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
    """Even keys: PCM16 of the closed-form pattern. Odd keys: the SAME
    pattern IMA-ADPCM-compressed (real 4-bit codec bytes; decode is
    the integer recurrence the DuckDB oracle replays)."""
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
            blobs, fmts = [], []
            for j in range(n):
                if ks[j] % 2 == 1:
                    blobs.append(adpcm_encode(v[j]))
                    fmts.append("adpcm")
                else:
                    blobs.append(v[j].tobytes())
                    fmts.append("pcm16")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([f"aud-{k}" for k in ks]),
                    pa.array(blobs, type=pa.binary()),
                    pa.array(np.full(n, 16000, dtype=np.int32)),
                    pa.array(np.full(n, AUDIO_SAMPLES, dtype=np.int32)),
                    pa.array(fmts),
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
            nss = batch.column(batch.schema.get_field_index("n_samples")).to_pylist()
            for aid, fmt, blob, ns_decl in zip(aids, fmts, blobs, nss):
                if fmt == "pcm16":
                    v = decode_pcm16(blob).astype(np.int64)
                elif fmt == "adpcm":
                    v = adpcm_decode(blob, int(ns_decl)).astype(np.int64)
                else:
                    raise NotImplementedError(
                        f"audio codec {fmt!r}: no media libraries in this container; "
                        "a libav decode slots in here"
                    )
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

    from osmzen_spark.payload.images import fan_out_scan

    return fan_out_scan(audio).mapInArrow(mapper, schema=out_schema)


def synthetic_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 6-frame 8x8 RGB raw clip per orders row, materialized once
    per SF (datagen.payload_cache) and read back as parquet; frames
    concatenated frame-major (f, y, x, c), same byte layout as images
    fmt='raw'."""
    from osmzen_spark.datagen import payload_cache

    return payload_cache(
        spark, sf_dir, "video", lambda: _synthetic_video_uncached(spark, sf_dir)
    )


def mjpeg_frame_coefs(seed: int, f: int) -> list[np.ndarray]:
    """Quantized coefficient blocks (Y, Cb, Cr) of MJPEG frame ``f`` —
    closed forms of (seed, f), mirrored verbatim by the DuckDB oracle
    (_MJPEG not a placeholder: these feed encode_from_coefficients to
    produce real per-frame JFIF streams)."""
    coefs = []
    for c in range(3):
        m = np.zeros((8, 8), dtype=np.int64)
        m[0, 0] = (seed + 5 * c + 17 * f) % 128 - 64
        m[0, 1] = (seed // 4 + 3 * c + 7 * f) % 9 - 4
        m[1, 0] = (seed // 16 + 7 * c + 11 * f) % 9 - 4
        m[1, 1] = (seed // 64 + 11 * c + 13 * f) % 5 - 2
        coefs.append(m)
    return coefs


def _synthetic_video_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even keys: raw frame-major RGB ('rawv', arithmetic pattern).
    Odd keys: REAL Motion JPEG — six concatenated baseline JFIF frames
    synthesized in the coefficient domain ('mjpeg'), so the lossy
    format's decoded pixels are exact integer closed forms."""
    from osmzen_spark.payload.jpeg import encode_from_coefficients

    out_schema = (
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string, caption string"
    )

    def mapper(batches):
        xs = np.arange(VIDEO_W).reshape(1, 1, 1, VIDEO_W, 1)
        ys = np.arange(VIDEO_H).reshape(1, 1, VIDEO_H, 1, 1)
        cs = np.arange(3).reshape(1, 1, 1, 1, 3)
        fs = np.arange(VIDEO_FRAMES).reshape(1, VIDEO_FRAMES, 1, 1, 1)
        q16 = np.full((8, 8), 16, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ks = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            seeds = (ks * 2654435761) % (2**31)
            px = (
                (seeds.reshape(n, 1, 1, 1, 1) + 7 * xs + 13 * ys + 29 * cs + 31 * fs) % 256
            ).astype(np.uint8)
            blobs, fmts = [], []
            for j in range(n):
                if ks[j] % 2 == 1:
                    blobs.append(
                        b"".join(
                            encode_from_coefficients(
                                mjpeg_frame_coefs(int(seeds[j]), f), q16, q16
                            )
                            for f in range(VIDEO_FRAMES)
                        )
                    )
                    fmts.append("mjpeg")
                else:
                    blobs.append(px[j].tobytes())
                    fmts.append("rawv")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([f"vid-{k}" for k in ks]),
                    pa.array(blobs, type=pa.binary()),
                    pa.array(np.full(n, VIDEO_W, dtype=np.int32)),
                    pa.array(np.full(n, VIDEO_H, dtype=np.int32)),
                    pa.array(np.full(n, VIDEO_FRAMES, dtype=np.int32)),
                    pa.array(fmts),
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
                if fmt == "rawv":
                    clip = np.frombuffer(blob, dtype=np.uint8).reshape(nf, h, w, 3)

                    def get_frame(i, _clip=clip):
                        return _clip[i]
                elif fmt == "mjpeg":
                    from osmzen_spark.payload.jpeg import decode_baseline

                    # decode ONLY the sampled frames: frame boundaries
                    # come from a cheap marker scan, so skipped frames
                    # cost zero Huffman/IDCT work (at every=2 this
                    # halves the decode bill; a real keyframe sampler
                    # has the same shape — seek, don't transcode)
                    frames_b = split_mjpeg_frames(bytes(blob))
                    if len(frames_b) != nf:
                        raise ValueError(
                            f"MJPEG clip has {len(frames_b)} frames != declared {nf}"
                        )

                    def get_frame(i, _fb=frames_b, _h=h, _w=w):
                        fr = decode_baseline(_fb[i])
                        if fr.shape != (_h, _w, 3):
                            raise ValueError(f"MJPEG frame shape {fr.shape} != declared")
                        return fr
                else:
                    raise NotImplementedError(
                        f"video codec {fmt!r}: no media libraries in this container; "
                        "a libav keyframe extraction slots in here"
                    )
                for f_idx in range(0, nf, every):
                    frame = get_frame(f_idx)
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

    from osmzen_spark.payload.images import fan_out_scan

    return fan_out_scan(video).mapInArrow(mapper, schema=out_schema)
