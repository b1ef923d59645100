"""frequency_cap + token_rarity + ref_distortion unit tests."""

import hashlib

import numpy as np
import pytest


def _bucket(k) -> str:
    return hashlib.md5(str(k).encode()).hexdigest()[:8]


def test_frequency_cap_keeps_hash_order_top_n(spark):
    from osmzen_spark.ops.capping import frequency_cap

    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, ["k", "grp"])
    out = frequency_cap(df, key_col="k", group_col="grp", n=5, keep_rank=True)
    got = {(r["grp"], r["k"]): r["cap_rank"] for r in out.collect()}
    # scalar reference: per group, 5 smallest (md5-prefix, key) pairs
    for g in ("g0", "g1", "g2"):
        members = sorted(
            (k for k, gg in rows if gg == g), key=lambda k: (_bucket(k), k)
        )
        expect = {(g, k): i + 1 for i, k in enumerate(members[:5])}
        assert {kk: v for kk, v in got.items() if kk[0] == g} == expect
    # cap is respected and deterministic on re-run
    assert out.count() == 15
    again = frequency_cap(df, key_col="k", group_col="grp", n=5)
    assert sorted((r["grp"], r["k"]) for r in again.collect()) == sorted(got)


def test_frequency_cap_plan_has_window_group_limit(spark):
    from osmzen_spark.ops.capping import frequency_cap

    df = spark.createDataFrame([(i, "g") for i in range(10)], ["k", "grp"])
    plan = (
        frequency_cap(df, "k", "grp", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rank predicate must push a partial per-task limit BELOW the
    # exchange (the mega-group skew guard); if Spark ever stops
    # planning WindowGroupLimit this operator needs a manual two-phase
    assert "WindowGroupLimit" in plan, plan


def test_token_rarity_matches_scalar_reference(spark):
    import random
    from collections import Counter

    from osmzen_spark.ops.textstats import token_rarity

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "rare1", "rare2"]
    weights = [30, 20, 10, 5, 1, 1]
    docs = [
        (
            i,
            " ".join(
                rng.choices(vocab, weights=weights)[0] for _ in range(rng.randint(1, 25))
            ),
        )
        for i in range(50)
    ]
    corpus = Counter(w for _, t in docs for w in t.split(" "))
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_freq"], r["rare_n"], r["rare_frac"], r["avg_freq"])
        for r in token_rarity(
            spark.createDataFrame(docs, ["doc_id", "text"]), rare_below=3
        ).collect()
    }
    for i, text in docs:
        ws = text.split(" ")
        n = len(ws)
        sf = sum(corpus[w] for w in ws)
        rn = sum(1 for w in ws if corpus[w] < 3)
        assert got[i] == (n, sf, rn, float(rn) / float(n), float(sf) / float(n))


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_ref_distortion_lossless_is_zero(spark, fmt):
    from osmzen_spark.payload.images import encode_png, ref_distortion

    rows = []
    for k in (3, 5, 9):
        seed = (k * 2654435761) % 2**31
        y, x, c = np.meshgrid(np.arange(8), np.arange(8), np.arange(3), indexing="ij")
        img = ((seed + 7 * x + 13 * y + 29 * c) % 256).astype(np.uint8)
        data = img.tobytes() if fmt == "raw" else encode_png(img)
        rows.append((f"img-{k}", bytearray(data), 8, 8, fmt))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {r["image_id"]: r for r in ref_distortion(df).collect()}
    for k in (3, 5, 9):
        r = out[f"img-{k}"]
        assert (r["n_px"], r["sse"], r["mse"], r["psnr_ge_40"]) == (192, 0, 0.0, 1)


def test_ref_distortion_gate_matches_float_psnr(spark):
    """The integer inequality gate must agree with the float PSNR
    definition on distorted pixels (one value nudged per image)."""
    from osmzen_spark.payload.images import psnr, ref_distortion

    rows, expect = [], {}
    for k, bump in ((2, 1), (4, 40), (6, 200)):
        seed = (k * 2654435761) % 2**31
        y, x, c = np.meshgrid(np.arange(8), np.arange(8), np.arange(3), indexing="ij")
        ref = ((seed + 7 * x + 13 * y + 29 * c) % 256).astype(np.int64)
        img = ref.copy()
        img[0, 0, 0] = (img[0, 0, 0] + bump) % 256
        rows.append((f"img-{k}", bytearray(img.astype(np.uint8).tobytes()), 8, 8, "raw"))
        p = psnr(img.astype(np.uint8), ref.astype(np.uint8))
        expect[f"img-{k}"] = (int(((img - ref) ** 2).sum()), 1 if p >= 40.0 else 0)
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {r["image_id"]: r for r in ref_distortion(df).collect()}
    for iid, (sse, gate) in expect.items():
        assert (out[iid]["sse"], out[iid]["psnr_ge_40"]) == (sse, gate)
