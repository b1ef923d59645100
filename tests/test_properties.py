"""Property-based tests (hypothesis) over the engine's pure kernels.

The reference has no property/randomized testing (SURVEY.md §5); these
go beyond it on the components whose correctness is a mathematical
invariant rather than a golden value: codec round-trips, sampling-
threshold monotonicity, protobuf varint/zigzag encoding, and
Douglas-Peucker structural invariants. All kernels here are pure
Python/NumPy — no SparkSession per example — so hundreds of cases run
in seconds; the Spark plumbing around them is pinned by the regular
suite + the DuckDB oracles.
"""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------ md5-bucket sampling

def _kept(key: int, rate: float) -> bool:
    # pure-Python mirror of ops.sampling (Spark and DuckDB both compute
    # md5 of the decimal string and compare the first 8 hex chars)
    from osmzen_spark.ops.sampling import _hex_threshold

    if rate >= 1.0:
        return True
    bucket = hashlib.md5(str(key).encode()).hexdigest()[:8]
    return bucket < _hex_threshold(rate)


@given(
    key=st.integers(min_value=0, max_value=2**62),
    r1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    r2=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hash_sample_monotone_in_rate(key, r1, r2):
    """A key kept at the lower rate is kept at every higher rate —
    the property that makes re-sampling a corpus at a higher rate a
    SUPERSET (no churn), which hash_sample's docstring promises."""
    lo, hi = sorted((r1, r2))
    if _kept(key, lo):
        assert _kept(key, hi)


@given(st.integers(min_value=0, max_value=2**62))
def test_hash_sample_rate_bounds(key):
    assert _kept(key, 1.0)
    assert not _kept(key, 0.0)


# ------------------------------------------------ PNG codec roundtrip

@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_exact(w, h, seed):
    from osmzen_spark.payload.images import decode_png, encode_png

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


# ------------------------------------------------ JPEG encoder PSNR gate

@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_jpeg_encoder_meets_psnr_gate_on_smooth_images(seed):
    """The input_hint invariant on the encode path: baseline-JPEG
    encode/decode of a smooth (low-frequency) image stays >= 40 dB.
    Smooth inputs are the honest property domain — quality-90 JPEG
    only guarantees 40 dB where the signal is not adversarial noise."""
    from osmzen_spark.payload.images import psnr
    from osmzen_spark.payload.jpeg import decode_baseline, encode_baseline

    y, x = np.mgrid[0:16, 0:16]
    base = (seed % 160) + 40
    img = np.stack(
        [np.clip(base + 2 * x + 3 * y + c * 5, 0, 255) for c in range(3)], axis=2
    ).astype(np.uint8)
    out = decode_baseline(encode_baseline(img, quality=90))
    assert psnr(out, img) >= 40.0


# ------------------------------------------------ varint / zigzag

@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_varint_roundtrip(v):
    from osmzen_spark.sinks.mvt import _varint

    data = _varint(v)
    # reference decoder: little-endian base-128
    out, shift = 0, 0
    for b in data:
        out |= (b & 0x7F) << shift
        shift += 7
    assert out == v
    assert all(b & 0x80 for b in data[:-1]) and not (data[-1] & 0x80)


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_zigzag_roundtrip(v):
    from osmzen_spark.sinks.mvt import _unzigzag, _zigzag

    z = _zigzag(v)
    assert z >= 0
    assert _unzigzag(z) == v


# ------------------------------------------------ Douglas-Peucker

@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=2,
        max_size=40,
    ),
    st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
)
def test_dp_keep_mask_invariants(points, eps):
    from osmzen_spark.geom.simplify import dp_keep_mask

    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    keep = dp_keep_mask(xs, ys, eps)
    # endpoints always survive; output is a subsequence of the input
    assert keep[0] and keep[-1]
    assert keep.dtype == bool and len(keep) == len(xs)
    # eps=0 keeps every vertex that is not exactly collinear-between
    # its kept neighbors; a strictly convex V must keep its apex
    if eps == 0.0 and len(points) == 3 and not keep[1]:
        # dropped middle point must lie exactly on the chord
        d = abs(
            (xs[2] - xs[0]) * (ys[0] - ys[1]) - (xs[0] - xs[1]) * (ys[2] - ys[0])
        )
        assert d == 0.0


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=3, max_value=30), st.integers(min_value=0, max_value=10**6))
def test_dp_simplified_error_bounded(n, seed):
    """Every dropped vertex lies within eps of the simplified chain's
    covering segment — the defining DP guarantee."""
    from osmzen_spark.geom.simplify import dp_keep_mask

    rng = np.random.RandomState(seed)
    xs = np.cumsum(rng.uniform(0.1, 1.0, size=n))
    ys = rng.uniform(-5, 5, size=n)
    eps = 1.0
    keep = dp_keep_mask(xs, ys, eps)
    kept_idx = np.flatnonzero(keep)
    for a, b in zip(kept_idx, kept_idx[1:]):
        for m in range(a + 1, b):
            # exact point-to-segment distance with clamped projection
            px, py = xs[m] - xs[a], ys[m] - ys[a]
            sx, sy = xs[b] - xs[a], ys[b] - ys[a]
            denom = sx * sx + sy * sy
            t = 0.0 if denom == 0 else max(0.0, min(1.0, (px * sx + py * sy) / denom))
            d2 = (px - t * sx) ** 2 + (py - t * sy) ** 2
            assert d2 <= eps * eps + 1e-9


# ------------------------------------------------ luma average-hash

@given(st.integers(min_value=0, max_value=255))
def test_ahash_uniform_image_is_zero(v):
    """No pixel of a constant image is STRICTLY above the mean, so the
    average-hash must be exactly 0 — the tie rule both the Spark op and
    the DuckDB oracle implement as 64*luma > total."""
    from osmzen_spark.payload.images import luma_ahash64

    img = np.full((8, 8, 3), v, dtype=np.uint8)
    assert luma_ahash64(img) == 0


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=63))
def test_ahash_single_bright_pixel_sets_exactly_that_bit(pos):
    from osmzen_spark.payload.images import luma_ahash64

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[pos // 8, pos % 8] = 255
    got = luma_ahash64(img)
    assert got == np.int64(np.uint64(1) << np.uint64(pos)).item()
