"""Multimodal (image) payload plumbing.

Images ride through the engine as opaque binary columns with typed
metadata (image_id, bytes, w, h, fmt, caption, phash — the driver
input_hint schema). The Spark-side plumbing (schema, batching,
mapInPandas shape, pass-through byte equality) is real and tested;
codec-backed decode (jpeg/png/webp) is STUBBED behind
NotImplementedError because no image libraries exist in this
container — only fmt='raw' (w*h*3 row-major RGB bytes) decodes, which
is what the synthetic payload uses, making the PSNR>=40dB invariant
checkable exactly (identity pass-through -> PSNR = inf).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3)
    return arr.reshape(h, w, 3)


def decode_image_batch(bytes_s: pd.Series, w_s: pd.Series, h_s: pd.Series, fmt_s: pd.Series) -> list[np.ndarray]:
    """Decode a batch of images. Only fmt='raw' is supported in this
    container; codec formats raise (STUB — swap in a real decoder when
    Pillow/ffmpeg are available on the cluster)."""
    out = []
    for data, w, h, fmt in zip(bytes_s, w_s, h_s, fmt_s):
        if fmt == "raw":
            out.append(decode_raw(data, int(w), int(h)))
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

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        extract, schema=_FEATURE_SCHEMA
    )
