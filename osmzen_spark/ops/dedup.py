"""Deduplication operators for large-scale training-data pipelines.

All scale-minded: exact dedup is a hash groupBy (map-side combine);
MinHash/LSH turns near-dup detection into an equi-join on band keys
(no cross join ever materializes); SimHash is a single pass of
Column/array math. Everything below is built-in-function Spark —
the only Python is driver-side plan construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# large Mersenne prime for universal hashing
_MERSENNE = (1 << 61) - 1


def _shingles(text: Column, k: int = 5) -> Column:
    """Word k-gram shingles as an array of hashed longs."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per exact text value. Shuffle key is the
    64-bit text hash, not the text itself (narrow rows through the
    exchange)."""
    h = F.xxhash64(F.col(text_col)).alias("__th")
    w = Window.partitionBy("__th").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__th", F.xxhash64(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__th", "__rn")
    )


def minhash_signature_from(sh: Column, num_hashes: int) -> Column:
    """Signature from a MATERIALIZED shingle-hash array column. The
    i-th hash function is xxhash64 seeded with i (JVM-native; a*x+b
    universal hashing overflows int64 under ANSI arithmetic).

    Callers must pass a real column (withColumn the shingles first):
    inlining the shingle expression here would make Catalyst recompute
    the split/slice/hash chain num_hashes times per row."""

    def hash_fn(i: int):
        # factory closure: pyspark introspects lambda arity, so default
        # args would be miscounted as lambda parameters
        return lambda x: F.xxhash64(F.lit(i), x)

    return F.array(*[F.array_min(F.transform(sh, hash_fn(i))) for i in range(num_hashes)])


def minhash_signature(text: Column, num_hashes: int = 64, shingle_k: int = 5) -> Column:
    return minhash_signature_from(_shingles(text, shingle_k), num_hashes)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Scale shape: explode each doc into `bands` band-hash keys, self-join
    on the band key (equi-join -> shuffle on int64; AQE splits hot
    buckets), emit distinct (id_a < id_b) pairs with estimated Jaccard
    from full signatures.
    """
    rows_per_band = num_hashes // bands
    # materialize shingles, then the signature, so each is computed once
    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .withColumn("__sh", _shingles(F.col("__t"), shingle_k))
        .withColumn("sig", minhash_signature_from(F.col("__sh"), num_hashes))
        .select("id", "sig")
    )
    # one band key per contiguous signature slab, built at compile time
    band_keys = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))
            for b in range(bands)
        ]
    )
    banded = base.select("id", "sig", F.explode(band_keys).alias("band_key"))
    a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band_key")
    b = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band_key")
    jaccard = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq))
        / F.lit(float(num_hashes))
    )
    # a pair matching in k bands appears k times: aggregate instead of
    # distinct-ing over the signature arrays (narrower shuffle)
    return (
        a.join(b, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard.alias("est_jaccard"))
        .groupBy("id_a", "id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def simhash_from(sh: Column, bits: int = 64) -> Column:
    """SimHash from a MATERIALIZED shingle-hash array column: per-bit
    majority vote as pure array math (see minhash_signature_from for
    why the caller materializes the shingles)."""

    def bit_vote(i: int):
        return lambda acc, x: acc + F.when(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sums = [F.aggregate(sh, F.lit(0), bit_vote(i)) for i in range(bits)]
    out = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        out = out.bitwiseOR(F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    return out


def simhash_col(text: Column, bits: int = 64, shingle_k: int = 2) -> Column:
    return simhash_from(_shingles(text, shingle_k), bits)


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = 64, shingle_k: int = 2) -> DataFrame:
    """df + `simhash` column, with the shingle array materialized once."""
    return (
        df.withColumn("__sh", _shingles(F.col(text_col), shingle_k))
        .withColumn("simhash", simhash_from(F.col("__sh"), bits))
        .drop("__sh")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing at least one
    shingle: explode shingles -> equi-join -> group pairs -> |A∩B| from
    match count, |A∪B| = |A|+|B|-|A∩B|. No cross join."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(F.col(text_col), k)).alias("sh"),
    ).withColumn("n", F.size("sh"))
    ex = sh.select("id", "n", F.explode("sh").alias("g"))
    a = ex.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), "g")
    b = ex.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), "g")
    inter = (
        a.join(b, on="g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(F.col("jaccard") >= min_jaccard)
