"""Similarity search over embedding columns (array<float>).

* cosine_topk_bruteforce — exact baseline: broadcast the (small) query
  side, dot products via F.zip_with/F.aggregate (JVM-side array math),
  window top-k.
* lsh_bucket_candidates — scale path: random-hyperplane LSH signature
  (deterministic hash-derived planes), candidates bucketed by signature
  prefix; equi-join on bucket turns ANN into a shuffle-friendly join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query. Broadcast-cross-join —
    correct baseline; O(|P|x|Q|) work distributed over point partitions."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    p = points.select(F.col(id_col).alias("p_id"), F.col(vec_col).alias("p_vec"))
    joined = p.crossJoin(F.broadcast(q)).filter(F.col("p_id") != F.col("q_id"))
    joined = joined.withColumn(
        "cosine", cosine_sim(F.col("q_vec").cast("array<double>"), F.col("p_vec").cast("array<double>"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("p_id").asc())
    return (
        joined.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("q_id", "p_id", "cosine", "sim_rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash mix
    (splitmix64-style) — no RNG state, reproducible everywhere."""
    vals = []
    x = (plane_idx + 1) * 0x9E3779B97F4A7C15
    for i in range(dim):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        vals.append((z / 2**63) - 1.0)  # in [-1, 1)
    return vals


def lsh_signature_col(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature packed into one long."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        d = _dot(vec.cast("array<double>"), plane)
        sig = sig.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def lsh_ann_candidates(
    points: DataFrame,
    queries: DataFrame,
    dim: int,
    bits: int = 4,
    tables: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table hyperplane LSH: ``tables`` independent signatures of
    ``bits`` hyperplane bits each; a pair is a candidate if ANY table's
    bucket matches (classic banding — recall 1-(1-p^bits)^tables).
    Physical shape: each side explodes to ``tables`` (table|bucket)
    rows and candidates come from an int64 equi-join — at 10^12 scale
    this shuffles on bucket ids, never comparing vectors all-pairs.
    Returns DISTINCT candidate pairs (q_id, p_id)."""
    n_planes = bits * tables
    planes = F.array(
        *[F.array(*[F.lit(v) for v in _hyperplane(dim, p)]) for p in range(n_planes)]
    )

    def buckets(df, out_id):
        v = F.col(vec_col).cast("array<double>")
        bit = F.transform(planes, lambda pl: F.when(_dot(v, pl) >= 0, F.lit(1)).otherwise(F.lit(0)))
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(tables - 1)),
            lambda t: F.aggregate(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc * 2 + F.element_at(bit, (t * bits + j + 1).cast("int")).cast("long"),
            )
            + t.cast("long") * F.lit(2**32).cast("long"),
        )
        return df.select(F.col(id_col).alias(out_id), F.explode(arr).alias("bucket"))

    q = buckets(queries, "q_id")
    p = buckets(points, "p_id")
    return (
        q.join(p, on="bucket")
        .filter(F.col("p_id") != F.col("q_id"))
        .select("q_id", "p_id")
        .distinct()
    )


def lsh_bucket_candidates(
    points: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate pairs whose full LSH signatures match — an equi-join on
    an int64 bucket (shuffle-friendly; recall tuned via n_planes and by
    probing neighbor buckets in later rounds)."""
    p = points.select(
        F.col(id_col).alias("p_id"),
        F.col(vec_col).alias("p_vec"),
        lsh_signature_col(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature_col(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    cand = q.join(p, on="bucket").filter(F.col("p_id") != F.col("q_id"))
    return cand.withColumn(
        "cosine", cosine_sim(F.col("q_vec").cast("array<double>"), F.col("p_vec").cast("array<double>"))
    ).select("q_id", "p_id", "bucket", "cosine")
