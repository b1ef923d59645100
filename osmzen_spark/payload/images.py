"""Multimodal (image) payload plumbing.

Images ride through the engine as opaque binary columns with typed
metadata (image_id, bytes, w, h, fmt, caption, phash — the driver
input_hint schema). The Spark-side plumbing (schema, batching,
mapInPandas shape, pass-through byte equality) is real and tested.
Decoding: fmt='raw' (w*h*3 row-major RGB bytes), fmt='png' (pure
stdlib zlib/struct codec, all five scanline filters, 8-bit
gray/RGB/RGBA) and fmt='jpeg' (pure stdlib+numpy BASELINE decoder —
Huffman + integer IDCT + fixed-point color convert, payload/jpeg.py)
are fully implemented, so the PSNR>=40dB payload invariant runs on
real encoded bytes of the dominant real-world format; webp remains
STUBBED behind NotImplementedError because no codec library exists in
this container.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fan_out_scan(df: DataFrame) -> DataFrame:
    """Redistribute an under-partitioned input ahead of a Python decode
    stage. A sandbox-scale payload parquet is tiny on disk (10-40 MB at
    sf0.1), so the file scan bin-packs it into 1-2 partitions
    (maxPartitionBytes=128 MB) and the Arrow decode stage would run on
    a single core (~20 s serialized per query measured at sf0.1). A
    real 100 TB table has thousands of splits, so the condition below
    makes this a no-op at scale. Call it AFTER column pruning (select
    first, then fan out) so the exchange carries only needed bytes —
    and never on metadata-only paths, where the raw scan's size
    estimate keeps broadcast joins alive."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3)
    return arr.reshape(h, w, 3)


# ---------------------------------------------------------------- PNG
# Pure-stdlib PNG codec (zlib + struct): enough for the engine's
# PSNR>=40dB payload invariant to run on real fmt='png' rows in this
# container. Supports non-interlaced 8-bit gray/RGB/RGBA with all five
# scanline filters. On a cluster a codec library (Pillow/libvips)
# replaces this; the Spark-side plumbing is identical either way.

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (alpha dropped, gray replicated)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8 supported)")
            if interlace:
                raise NotImplementedError("interlaced (Adam7) PNG not supported")
            channels = {0: 1, 2: 3, 6: 4}.get(color_type)
            if channels is None:
                raise NotImplementedError(f"PNG color type {color_type}")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — per-channel prefix sum
            cur = line.reshape(w, bpp)
            cur = np.cumsum(cur, axis=0) & 0xFF
            cur = cur.reshape(stride)
        elif ftype == 3:  # Average
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
            cur = cur
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (filter 0, one IDAT)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_image_batch(bytes_s: pd.Series, w_s: pd.Series, h_s: pd.Series, fmt_s: pd.Series) -> list[np.ndarray]:
    """Decode a batch of images. fmt='raw' (w*h*3 RGB bytes), fmt='png'
    (stdlib codec below) and fmt='jpeg' (baseline decoder,
    payload/jpeg.py) decode here; webp raises (STUB — swap in a real
    decoder when Pillow/ffmpeg are available on the cluster)."""
    from osmzen_spark.payload.jpeg import decode_baseline

    out = []
    for data, w, h, fmt in zip(bytes_s, w_s, h_s, fmt_s):
        if fmt == "raw":
            out.append(decode_raw(data, int(w), int(h)))
        elif fmt == "png":
            out.append(decode_png(bytes(data)))
        elif fmt in ("jpeg", "jpg"):
            out.append(decode_baseline(bytes(data)))
        else:
            raise NotImplementedError(
                f"image codec {fmt!r} not available in this environment (stub)"
            )
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def luma_ahash64(img: np.ndarray) -> int:
    """64-bit average-hash perceptual fingerprint of an (8, 8, 3) RGB
    image: integer ITU-R BT.601 luma (299r + 587g + 114b, scaled x1000
    so everything stays exact int64), bit (y*8+x) set iff the pixel's
    luma is strictly above the image mean. The comparison is done as
    64*luma > total so both this and the DuckDB oracle compare exact
    integers — no float thresholds anywhere. Returned as a SIGNED
    int64 (bit 63 wraps), the input_hint phash column type."""
    assert img.shape == (8, 8, 3)
    px = img.astype(np.int64)
    luma = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    total = int(luma.sum())
    bits = (64 * luma.reshape(-1) > total).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits * weights).sum(dtype=np.uint64).astype(np.int64))


_HASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("ahash_lo", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("caption", T.StringType()),
    ]
)


def with_image_hashes(images: DataFrame) -> DataFrame:
    """Decode -> channel means + 64-bit average-hash per image
    (mapInPandas; Arrow batch transfer, numpy math). The hash is
    emitted as two unsigned 32-bit halves in int64 columns so the
    DuckDB oracle never has to reproduce int64 sign-wrap semantics."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode_image_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            if len({im.shape for im in imgs}) == 1 and imgs[0].shape == (8, 8, 3):
                # uniform 8x8 batch (the ahash frame size): one stacked
                # pass replaces ~52 us/img of per-image numpy dispatch
                # with whole-batch arithmetic — same integers bit-for-bit
                arr = np.stack(imgs).astype(np.int64)
                n = arr.shape[0]
                means = arr.reshape(n, -1, 3).mean(axis=1)
                luma = (
                    299 * arr[..., 0] + 587 * arr[..., 1] + 114 * arr[..., 2]
                ).reshape(n, 64)
                totals = luma.sum(axis=1)
                bits = (64 * luma > totals[:, None]).astype(np.uint64)
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                u = (bits * weights).sum(axis=1, dtype=np.uint64)
            else:
                means = np.array([im.reshape(-1, 3).mean(axis=0) for im in imgs])
                hashes = np.array([luma_ahash64(im) for im in imgs], dtype=np.int64)
                u = hashes.astype(np.uint64)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "ahash_lo": (u & np.uint64(0xFFFFFFFF)).astype(np.int64),
                    "ahash_hi": (u >> np.uint64(32)).astype(np.int64),
                    "caption": pdf["caption"].values,
                }
            )

    return fan_out_scan(
        images.select("image_id", "bytes", "w", "h", "fmt", "caption")
    ).mapInPandas(extract, schema=_HASH_SCHEMA)


def phash_dedup_pairs(
    images: DataFrame, bands: int = 4, id_col: str = "image_id", phash_col: str = "phash"
) -> DataFrame:
    """Near-duplicate image candidate pairs via banded hamming buckets
    over the 64-bit perceptual hash: each image explodes into ``bands``
    16-bit band keys; a pair is a candidate if ANY band matches (two
    hashes within hamming distance bands-1 always share a band by
    pigeonhole). Equi-join on int64 keys — the standard shuffle-
    friendly shape at 10^12 images; exact hamming verification on the
    candidate set only."""
    width = 64 // bands
    mask = (1 << width) - 1
    keys = F.array(
        *[
            F.lit(b * (1 << 32)).cast("long")
            + F.shiftrightunsigned(F.col(phash_col), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    banded = images.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"), F.explode(keys).alias("bk"))
    a = banded.select(F.col("id").alias("id_a"), F.col("ph").alias("ph_a"), "bk")
    b = banded.select(F.col("id").alias("id_b"), F.col("ph").alias("ph_b"), "bk")
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    # A pair within hamming <= bands-1 can share SEVERAL bands; instead
    # of dedup-by-aggregation (a second full shuffle over every joined
    # candidate — measured 9.5M rows at sf0.1), keep a candidate only
    # in its FIRST matching band: bit math on the two hashes already in
    # the row, zero extra exchange. Exactly-once emission per pair is
    # structural (every duplicate hit has the same hamming, so first-
    # match keeps the identical row the old min() aggregation kept).
    band_idx = F.shiftrightunsigned(F.col("bk"), 32).cast("int")
    first_match = F.lit(True)
    for earlier in range(bands - 1):
        same_band = F.shiftrightunsigned(F.col("ph_a"), earlier * width).bitwiseAND(
            F.lit(mask)
        ) == F.shiftrightunsigned(F.col("ph_b"), earlier * width).bitwiseAND(F.lit(mask))
        first_match = first_match & ~((band_idx > earlier) & same_band)
    return (
        a.join(b, on="bk")
        .filter((F.col("id_a") < F.col("id_b")) & first_match)
        .select("id_a", "id_b", hamming.alias("hamming"))
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("brightness", T.DoubleType()),
    ]
)


def with_image_features(images: DataFrame) -> DataFrame:
    """Per-image channel means via mapInPandas (Arrow batches; the numpy
    work is vectorized over the batch's concatenated pixel buffer).
    Demonstrates the decode -> feature-extract stage shape used for
    resize/frame-sample at scale."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode_image_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            flat = np.concatenate([im.reshape(-1, 3).astype(np.float64) for im in imgs])
            sizes = np.array([im.shape[0] * im.shape[1] for im in imgs])
            offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=offsets[1:])
            sums = np.add.reduceat(flat, offsets[:-1], axis=0)
            means = sums / sizes[:, None]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "brightness": means.mean(axis=1),
                }
            )

    return fan_out_scan(
        images.select("image_id", "bytes", "w", "h", "fmt")
    ).mapInPandas(extract, schema=_FEATURE_SCHEMA)


_CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("hist_r0", T.LongType()),
        T.StructField("hist_r1", T.LongType()),
        T.StructField("hist_r2", T.LongType()),
        T.StructField("hist_r3", T.LongType()),
    ]
)


def with_channel_stats(images: DataFrame) -> DataFrame:
    """Integer-exact per-image channel statistics: decoded channel sums
    plus a 4-bin histogram of the red channel (bins of 64 levels) —
    the image-quality/curation stage of a multimodal pipeline, as one
    Arrow-batched mapInPandas pass. Everything is integer arithmetic
    over decoded pixels, so a SQL oracle can re-derive every output
    exactly (driver query image_channel_stats)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode_image_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            flat = np.concatenate([im.reshape(-1, 3).astype(np.int64) for im in imgs])
            sizes = np.array([im.shape[0] * im.shape[1] for im in imgs])
            offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=offsets[1:])
            sums = np.add.reduceat(flat, offsets[:-1], axis=0)
            # red-channel bin index per pixel; one bincount over the
            # whole batch with per-image offsets (vectorized, no loop)
            bins = flat[:, 0] >> 6
            img_idx = np.repeat(np.arange(len(sizes)), sizes)
            hist = np.bincount(img_idx * 4 + bins, minlength=len(sizes) * 4).reshape(
                len(sizes), 4
            )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "sum_r": sums[:, 0],
                    "sum_g": sums[:, 1],
                    "sum_b": sums[:, 2],
                    "hist_r0": hist[:, 0],
                    "hist_r1": hist[:, 1],
                    "hist_r2": hist[:, 2],
                    "hist_r3": hist[:, 3],
                }
            )

    return fan_out_scan(
        images.select("image_id", "bytes", "w", "h", "fmt")
    ).mapInPandas(stats, schema=_CHANNEL_STATS_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(images: DataFrame, factor: int = 2) -> DataFrame:
    """Decode -> average-pool downsample by ``factor`` -> raw RGB bytes
    (the resize stage of a multimodal training pipeline, as a
    mapInPandas batch op). Pooling is integer-exact — each output
    byte is floor(mean) of a factor x factor block — so a SQL oracle
    can re-derive every output byte (driver query q_image_resize
    compares the full hex dump). Frame-sampling for video payloads is
    this same shape with a (frame_idx % k) selector in front."""

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode_image_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            out_bytes, ows, ohs = [], [], []
            for im in imgs:
                h, w, _ = im.shape
                oh, ow = h // factor, w // factor
                p = (
                    im[: oh * factor, : ow * factor]
                    .astype(np.int64)
                    .reshape(oh, factor, ow, factor, 3)
                    .sum(axis=(1, 3))
                    // (factor * factor)
                ).astype(np.uint8)
                out_bytes.append(p.tobytes())
                ows.append(ow)
                ohs.append(oh)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "out_w": np.array(ows, dtype=np.int32),
                    "out_h": np.array(ohs, dtype=np.int32),
                    "resized": out_bytes,
                }
            )

    return fan_out_scan(
        images.select("image_id", "bytes", "w", "h", "fmt")
    ).mapInPandas(pool, schema=_RESIZE_SCHEMA)


_AUGMENT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("augmented", T.BinaryType()),
    ]
)


def augment_images(
    images: DataFrame,
    flip: bool = True,
    crop: int | None = 6,
    normalize: bool = True,
) -> DataFrame:
    """Deterministic augmentation stage of a multimodal training
    pipeline: horizontal flip -> center crop to ``crop`` x ``crop`` ->
    per-channel integer contrast stretch, as one mapInPandas batch op
    (decode included; no shuffle — augmentation is embarrassingly
    parallel, and fan_out_scan is a no-op on any real-scale table).

    Every step is integer-exact so a SQL oracle re-derives every output
    byte (driver query q_image_augment compares the full hex dump):
    flip is x -> w-1-x; crop keeps the centered window at offset
    (w - crop) // 2; the stretch maps v -> (v - min_c) * 255 //
    (max_c - min_c) per channel over the CROPPED window (0 when the
    channel is constant). Training augmentations are normally sampled
    per epoch; determinism here is the oracle contract — a seeded
    variant just derives (flip, offset) from a hash of (image_id,
    epoch) the same way hash_split derives bucket assignment."""

    def aug(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode_image_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            out_bytes, ows, ohs = [], [], []
            for im in imgs:
                if flip:
                    im = im[:, ::-1, :]
                h, w, _ = im.shape
                if crop is not None and crop < min(h, w):
                    oy, ox = (h - crop) // 2, (w - crop) // 2
                    im = im[oy : oy + crop, ox : ox + crop, :]
                    h = w = crop
                a = im.astype(np.int64)
                if normalize:
                    mn = a.min(axis=(0, 1))
                    mx = a.max(axis=(0, 1))
                    rng = np.maximum(mx - mn, 1)
                    a = np.where(mx > mn, (a - mn) * 255 // rng, 0)
                out_bytes.append(a.astype(np.uint8).tobytes())
                ows.append(w)
                ohs.append(h)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "out_w": np.array(ows, dtype=np.int32),
                    "out_h": np.array(ohs, dtype=np.int32),
                    "augmented": out_bytes,
                }
            )

    return fan_out_scan(
        images.select("image_id", "bytes", "w", "h", "fmt")
    ).mapInPandas(aug, schema=_AUGMENT_SCHEMA)


_REF_DISTORTION_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_px", T.IntegerType()),
        T.StructField("sse", T.LongType()),
        T.StructField("mse", T.DoubleType()),
        T.StructField("psnr_ge_40", T.IntegerType()),
    ]
)


def ref_distortion(images: DataFrame) -> DataFrame:
    """Per-image distortion vs the procedural reference pixels — the
    input_hint's payload invariant ("decoded-pixel allclose, PSNR >=
    40 dB for lossy") as a first-class validation operator: decode
    every byte payload with the REAL codecs (raw / stdlib PNG /
    baseline JPEG) and measure it against the canonical pattern
    pixel(x,y,c) = (seed + 7x + 13y + 29c) mod 256.

    Everything is integer-exact so a SQL oracle re-derives every value:
    ``sse`` is an integer sum of squared byte diffs (order-free),
    ``mse`` is ONE int/int double division, and the 40 dB gate is the
    pure-integer inequality PSNR >= 40  <=>  10000*sse <= 65025*n_px
    (255^2 / 10^4 = 6.5025) — no log, no float threshold. Lossless
    rows (raw/png) must come back sse=0 / gate=1; a decoder bug in ANY
    codec path, a batching bug, or a flipped coordinate breaks the
    driver hash.

    One Arrow-batched mapInPandas pass, vectorized across the whole
    batch (no per-image Python loop): per-pixel (x, y, c) coordinates
    are reconstructed from flat offsets with repeat/arange arithmetic,
    so images of mixed sizes batch together.
    """

    def dist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            imgs = decode_image_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            keys = (
                pdf["image_id"].str.slice(4).astype(np.int64).to_numpy()
            )  # 'img-<k>'
            seeds = (keys * 2654435761) % 2**31
            flat = np.concatenate([im.reshape(-1).astype(np.int64) for im in imgs])
            sizes = np.array([im.size for im in imgs], dtype=np.int64)
            widths = np.array([im.shape[1] for im in imgs], dtype=np.int64)
            offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=offsets[1:])
            idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
                offsets[:-1], sizes
            )
            w_px = np.repeat(widths, sizes)
            c = idx % 3
            xy = idx // 3
            x = xy % w_px
            y = xy // w_px
            pat = (np.repeat(seeds, sizes) + 7 * x + 13 * y + 29 * c) % 256
            sq = (flat - pat) ** 2
            sse = np.add.reduceat(sq, offsets[:-1])
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "n_px": sizes.astype(np.int32),
                    "sse": sse,
                    "mse": sse.astype(np.float64) / sizes.astype(np.float64),
                    "psnr_ge_40": (10000 * sse <= 65025 * sizes).astype(np.int32),
                }
            )

    return fan_out_scan(
        images.select("image_id", "bytes", "w", "h", "fmt")
    ).mapInPandas(dist, schema=_REF_DISTORTION_SCHEMA)
