"""Similarity search over embedding columns (array<float>).

* cosine_topk_bruteforce — exact baseline: the (small, sampled) query
  side becomes a broadcast numpy matrix; each point partition computes
  a (batch x queries) similarity block in ONE float64 BLAS matmul
  inside mapInArrow and emits only its per-batch top-(k+1) per query;
  a final window rank over the tiny partial-top-k union is global.
  Shuffle volume is O(partitions x |Q| x k), never O(|P| x |Q|).
* lsh_ann_candidates — scale path: multi-table random-hyperplane LSH.
  All bits x tables sign bits come from one matmul against a
  deterministic hash-derived plane matrix (mapInArrow); candidates are
  an int64 equi-join on bucket ids. At 10^12 rows this shuffles on
  buckets — no pairwise math outside the candidate set.
* Column-expression variants (cosine_sim, lsh_bucket_candidates) are
  kept for composability inside larger Catalyst plans; the Arrow paths
  are the hot-loop implementations (interpreted higher-order-function
  folds cost ~100x for dim-64 math).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _vec_matrix(col: pa.Array, dim: int) -> np.ndarray:
    """(n, dim) float64 matrix from an arrow list<float> column; assumes
    fixed-length ``dim`` lists (validated via the flat value count)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if flat.size != n * dim:
        raise ValueError(f"expected fixed dim={dim} vectors, got {flat.size} values for {n} rows")
    return flat.reshape(n, dim)


def _collect_query_matrix(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side materialization of the SMALL query side (the sampled
    side of an ANN job — the analog of a broadcast-join build side)."""
    rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return q_ids, q_mat


def cosine_topk_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (see module doc for the
    physical shape). Ties break on ascending p_id, deterministically."""
    if dim is None:
        dim = points.select(F.size(vec_col)).first()[0]
    q_ids, q_mat = _collect_query_matrix(queries, id_col, vec_col)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = points.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_norm))
    kk = k + 1  # self-match margin: q_id rows are filtered downstream

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("p_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def mapper(batches):
        ids_b, qn = bc.value
        nq = qn.shape[0]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            p_ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            v = _vec_matrix(batch.column(batch.schema.get_field_index(vec_col)), dim)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ qn.T  # (n, nq) — one BLAS call for the whole batch
            take = min(kk, n)
            if n > take:
                part = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, nq)
            else:
                part = np.tile(np.arange(n)[:, None], (1, nq))
            rows = part.T.ravel()  # query-major
            out_q = np.repeat(ids_b, take)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_q),
                    pa.array(p_ids[rows]),
                    pa.array(sims[rows, np.repeat(np.arange(nq), take)]),
                ],
                names=["q_id", "p_id", "cosine"],
            )

    partial = points.select(id_col, vec_col).mapInArrow(mapper, schema=schema)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("p_id").asc())
    return (
        partial.filter(F.col("p_id") != F.col("q_id"))
        .withColumn("sim_rank", F.row_number().over(w))
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


def _plane_matrix(dim: int, n_planes: int) -> np.ndarray:
    return np.array([_hyperplane(dim, p) for p in range(n_planes)], dtype=np.float64)


def lsh_buckets_arrow(
    df: DataFrame,
    dim: int,
    bits: int,
    tables: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "p_id",
) -> DataFrame:
    """Exploded (id, bucket) rows: ``tables`` bucket ids per vector,
    all bits x tables hyperplane sign bits from ONE matmul per Arrow
    batch. Bucket id = big-endian bit slab + table << 32 (identical
    values to the interpreted Column formulation it replaces)."""
    planes = _plane_matrix(dim, bits * tables)  # (P, dim), broadcast via closure
    weights = 2 ** np.arange(bits - 1, -1, -1, dtype=np.int64)  # big-endian
    table_off = np.arange(tables, dtype=np.int64) * (1 << 32)

    schema = T.StructType(
        [T.StructField(out_id, T.LongType()), T.StructField("bucket", T.LongType())]
    )

    def mapper(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            v = _vec_matrix(batch.column(batch.schema.get_field_index(vec_col)), dim)
            bit = (v @ planes.T >= 0).astype(np.int64).reshape(n, tables, bits)
            buckets = (bit * weights).sum(axis=2) + table_off  # (n, tables)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.repeat(ids, tables)), pa.array(buckets.ravel())],
                names=[out_id, "bucket"],
            )

    return df.select(id_col, vec_col).mapInArrow(mapper, schema=schema)


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
    rows (Arrow matmul path) and candidates come from an int64
    equi-join — at 10^12 scale this shuffles on bucket ids, never
    comparing vectors all-pairs. Returns DISTINCT pairs (q_id, p_id)."""
    q = lsh_buckets_arrow(queries, dim, bits, tables, id_col, vec_col, out_id="q_id")
    p = lsh_buckets_arrow(points, dim, bits, tables, id_col, vec_col, out_id="p_id")
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
