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
* Every LSH entry point (lsh_ann_candidates, lsh_bucket_candidates,
  embedding_near_dup) routes bucket computation through the ONE Arrow
  matmul kernel (lsh_buckets_arrow) — the old interpreted per-plane
  Column fold is gone (it cost ~100x for dim-64 math). cosine_sim
  survives as a single-expression Column helper for composing inside
  Catalyst plans on tiny candidate sets; hot loops use the einsum
  verify pass.
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


def _safe_norms(v: np.ndarray) -> np.ndarray:
    """Row norms with zero rows mapped to 1.0, so an all-zero vector
    stays a zero vector instead of becoming NaN garbage that ranks by
    noise (and silently diverges from the SQL oracle's NaN path)."""
    n = np.linalg.norm(v, axis=1, keepdims=True)
    return np.where(n == 0.0, 1.0, n)


def _partial_topk_batch(ids_b: np.ndarray, pid: np.ndarray, scores: np.ndarray, take: int):
    """Per-query top-``take`` rows of an (n, nq) score block under the
    GLOBAL order (score desc, p_id asc), in near-O(n) per query:
    argpartition finds the boundary score, rows strictly above it are
    in unconditionally, and only the rows TIED at the boundary need the
    exact p_id-asc tiebreak (a second argpartition over just the tie
    slice). This preserves the exact cut a full lexsort would make —
    equal-score candidates at the boundary are kept in p_id order, the
    same order the final window rank (and the SQL oracles) pick — while
    replacing the old O(n log n) full sort per query. Returns
    (q_ids, p_ids, scores) column arrays, query-major."""
    n, nq = scores.shape
    take = min(take, n)
    rows = np.empty(take * nq, dtype=np.int64)
    for qi in range(nq):
        s = scores[:, qi]
        out = rows[qi * take : (qi + 1) * take]
        if take == n:
            out[:] = np.lexsort((pid, -s))
            continue
        # boundary = take-th largest score; O(n) selection
        t = -np.partition(-s, take - 1)[take - 1]
        above = np.flatnonzero(s > t)
        need = take - above.size
        ties = np.flatnonzero(s == t)
        if above.size + ties.size < take:
            # non-comparable scores (NaN) shrank the pool; exact fallback
            out[:] = np.lexsort((pid, -s))[:take]
            continue
        if ties.size > need:
            ties = ties[np.argpartition(pid[ties], need - 1)[:need]]
        chosen = np.concatenate((above, ties))
        # final ordering of just `take` rows — O(take log take)
        out[:] = chosen[np.lexsort((pid[chosen], -s[chosen]))]
    return (
        np.repeat(ids_b, take),
        pid[rows],
        scores[rows, np.repeat(np.arange(nq), take)],
    )


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
    q_norm = q_mat / _safe_norms(q_mat)
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
            v /= _safe_norms(v)
            sims = v @ qn.T  # (n, nq) — one BLAS call for the whole batch
            out_q, out_p, out_s = _partial_topk_batch(ids_b, p_ids, sims, kk)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q), pa.array(out_p), pa.array(out_s)],
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path.
#
# Structure (FAISS IVF-flat analog, re-expressed as DataFrame ops):
#   * a small centroid codebook (driver-side numpy; k-means-trained in
#     production via ivf_train_kmeans, deterministic hash-derived in
#     the oracle-checked driver query so DuckDB can re-derive it);
#   * every point is assigned to its nearest centroid — ONE argmax
#     matmul per Arrow batch (this is the partitioning column at
#     10^12 scale: cluster id = Iceberg partition, so a probe touches
#     nprobe partitions and the scan prunes the rest);
#   * a query probes its nprobe nearest centroids; candidates are an
#     equi-join on cid (shuffle on a 16..65536-value key, never a
#     cross join); exact cosine rerank runs only on candidates, again
#     as vectorized numpy against the broadcast query matrix.
# ---------------------------------------------------------------------------


def ivf_centroids(dim: int, n_centroids: int) -> np.ndarray:
    """Deterministic unit-norm centroid codebook from the splitmix64
    hyperplane generator (index offset keeps it independent of the LSH
    planes). Used by the oracle-checked driver query: DuckDB re-embeds
    these exact float64 values as literals, so assignment is exactly
    reproducible. Production path trains with ivf_train_kmeans."""
    c = np.array([_hyperplane(dim, 10_000 + i) for i in range(n_centroids)], dtype=np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_train_kmeans(
    df: DataFrame,
    dim: int,
    n_centroids: int,
    iters: int = 5,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means codebook from a deterministic id-mod sample
    (the sample — not the full table — comes to the driver; at 10^12
    rows pick sample_mod so the sample is ~10^5-10^6 rows, the standard
    IVF training budget). Init is the hash-derived codebook; each Lloyd
    iteration assigns by max dot and re-normalizes the cluster means;
    empty clusters keep their previous centroid. Returns unit-norm
    (n_centroids, dim) float64."""
    sample = df.filter(F.pmod(F.col(id_col), F.lit(sample_mod)) == 0) if sample_mod > 1 else df
    _, x = _collect_query_matrix(sample, id_col, vec_col)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = ivf_centroids(dim, n_centroids)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    c[j] = m / n
    return c


def ivf_assign_arrow(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "p_id",
    keep_vec: bool = False,
) -> DataFrame:
    """(id, cid[, vec]) rows: each vector's nprobe nearest centroids by
    cosine, from one matmul per Arrow batch. nprobe=1 is the point-side
    assignment (the partition column at scale); nprobe>1 is the
    query-side probe fan-out. Ties break on ascending cid (matches the
    oracle's ORDER BY sim DESC, cid)."""
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    dim = c.shape[1]
    fields = [T.StructField(out_id, T.LongType()), T.StructField("cid", T.IntegerType())]
    if keep_vec:
        fields.append(T.StructField(vec_col, df.schema[vec_col].dataType))
    schema = T.StructType(fields)

    def mapper(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            vec_arr = batch.column(batch.schema.get_field_index(vec_col))
            v = _vec_matrix(vec_arr, dim)
            v = v / _safe_norms(v)
            sims = v @ c.T  # (n, n_centroids)
            take = min(nprobe, c.shape[0])
            # lexsort: primary -sims, secondary cid ascending (stable)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :take]  # (n, take)
            arrays = [
                pa.array(np.repeat(ids, take)),
                pa.array(order.ravel().astype(np.int32)),
            ]
            names = [out_id, "cid"]
            if keep_vec:
                if isinstance(vec_arr, pa.ChunkedArray):
                    vec_arr = vec_arr.combine_chunks()
                arrays.append(vec_arr.take(pa.array(np.repeat(np.arange(n), take))))
                names.append(vec_col)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(id_col, vec_col).mapInArrow(mapper, schema=schema)


def ivf_ann_topk(
    points: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-flat top-k: points assigned to 1 cell (carrying their vector
    through the Arrow batch — no second shuffle to re-fetch it), query
    probes nprobe cells, candidates = equi-join on cid (a point lives
    in exactly one cell, so pairs are already distinct), exact cosine
    rerank on candidates only via the broadcast query matrix. Output
    (q_id, p_id, cosine, sim_rank<=k)."""
    if dim is None:
        dim = points.select(F.size(vec_col)).first()[0]
    q_ids, q_mat = _collect_query_matrix(queries, id_col, vec_col)
    q_sorted = np.argsort(q_ids)
    q_ids_s = q_ids[q_sorted]
    q_norm_s = (q_mat / _safe_norms(q_mat))[q_sorted]
    sc = points.sparkSession.sparkContext
    bc = sc.broadcast((q_ids_s, q_norm_s))

    p_assign = ivf_assign_arrow(
        points, centroids, nprobe=1, id_col=id_col, vec_col=vec_col, out_id="p_id", keep_vec=True
    )
    q_probe = ivf_assign_arrow(
        queries, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col, out_id="q_id"
    )
    cand = q_probe.join(p_assign, on="cid").filter(F.col("p_id") != F.col("q_id"))

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("p_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def rerank(batches):
        ids_s, qn = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            qid = batch.column(batch.schema.get_field_index("q_id")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            pid = batch.column(batch.schema.get_field_index("p_id")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            v = _vec_matrix(batch.column(batch.schema.get_field_index(vec_col)), dim)
            v = v / _safe_norms(v)
            qrow = qn[np.searchsorted(ids_s, qid)]  # (n, dim) gather
            cos = np.einsum("ij,ij->i", qrow, v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid), pa.array(pid), pa.array(cos)],
                names=["q_id", "p_id", "cosine"],
            )

    scored = cand.select("q_id", "p_id", vec_col).mapInArrow(rerank, schema=schema)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("p_id").asc())
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("q_id", "p_id", "cosine", "sim_rank")
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) — the compressed-index scale path.
#
# IVF prunes WHICH vectors a query scans; PQ shrinks WHAT is scanned:
# each unit-normalized vector is split into m subvectors and each
# subvector replaced by the id of its nearest sub-centroid (max dot,
# spherical — the same assignment rule the IVF oracle proved exactly
# SQL-reproducible). A dim-64 float32 vector (256 B) becomes one
# 8x4-bit code packed in a single long (8 B) — at 10^12 rows the code
# table is ~8 TB instead of ~256 TB, and the ADC scan never touches
# the embedding column at all. Scoring is asymmetric distance
# computation (ADC): the query precomputes a (m, ksub) lookup table of
# subvector dots, and a candidate's score is m table gathers + adds —
# no per-candidate float math beyond 8 additions. FAISS-PQ analog,
# re-expressed as: one mapInArrow encode pass (matmul argmax) -> a
# stored codes table -> one mapInArrow LUT-gather scan emitting
# per-batch partial top-k (shuffle O(partitions x |Q| x k), exactly
# the cosine_topk_bruteforce shape).
# ---------------------------------------------------------------------------


def pq_codebooks(dim: int, m: int, ksub: int) -> np.ndarray:
    """Deterministic unit-norm sub-centroid codebooks, (m, ksub, dim/m)
    float64, from the splitmix64 generator (offset 20_000 keeps them
    independent of the LSH planes and IVF centroids). Deterministic so
    the DuckDB oracle re-embeds the exact float64 values as literals;
    a production codebook would come from per-subspace k-means exactly
    like ivf_train_kmeans."""
    dsub = dim // m
    c = np.array(
        [[_hyperplane(dsub, 20_000 + j * ksub + i) for i in range(ksub)] for j in range(m)],
        dtype=np.float64,
    )
    return c / np.linalg.norm(c, axis=2, keepdims=True)


def pq_encode_arrow(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "p_id",
) -> DataFrame:
    """(id, code) rows: the vector unit-normalized once, each subvector
    assigned to its max-dot sub-centroid (ties -> lowest centroid id),
    all m assignments from one (n, dsub) x (dsub, ksub) matmul per
    subspace per Arrow batch, packed 4 bits per subspace into one long
    (requires ksub <= 16, m*4 <= 64)."""
    m, ksub, dsub = codebooks.shape
    if ksub > 16 or m * 4 > 64:
        raise ValueError("packing needs ksub <= 16 and m <= 16")
    dim = m * dsub
    schema = T.StructType(
        [T.StructField(out_id, T.LongType()), T.StructField("code", T.LongType())]
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
            v /= _safe_norms(v)
            code = np.zeros(n, dtype=np.int64)
            for j in range(m):
                dots = v[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T  # (n, ksub)
                code |= np.argmax(dots, axis=1).astype(np.int64) << (4 * j)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(code)], names=[out_id, "code"]
            )

    return df.select(id_col, vec_col).mapInArrow(mapper, schema=schema)


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a PQ codes table (p_id, code): the (small,
    sampled) query side becomes broadcast (m, ksub) LUTs of subvector
    dots; each codes partition unpacks its 4-bit fields, gathers m LUT
    entries per (candidate, query) and emits its per-batch partial
    top-(k+1); a final window rank over the tiny union is global.
    Output (q_id, p_id, adc_score, adc_rank<=k) with ascending-p_id
    tiebreak; rank consumers should treat adc_score as approximate
    (it is <query, PQ-reconstruction>, not the true cosine)."""
    m, ksub, dsub = codebooks.shape
    q_ids, q_mat = _collect_query_matrix(queries, id_col, vec_col)
    qn = q_mat / _safe_norms(q_mat)
    nq = qn.shape[0]
    luts = np.empty((nq, m, ksub), dtype=np.float64)
    for j in range(m):
        luts[:, j, :] = qn[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T
    sc = codes.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, luts))
    kk = k + 1

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("p_id", T.LongType()),
            T.StructField("adc_score", T.DoubleType()),
        ]
    )

    def mapper(batches):
        ids_b, lu = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            pid = batch.column(batch.schema.get_field_index("p_id")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            code = batch.column(batch.schema.get_field_index("code")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            fields = ((code[:, None] >> (4 * np.arange(m))) & 15).astype(np.int64)  # (n, m)
            scores = np.zeros((n, nq), dtype=np.float64)
            for j in range(m):  # j-ascending adds: order matches the SQL oracle
                scores += lu[:, j, fields[:, j]].T
            out_q, out_p, out_s = _partial_topk_batch(ids_b, pid, scores, kk)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q), pa.array(out_p), pa.array(out_s)],
                names=["q_id", "p_id", "adc_score"],
            )

    partial = codes.mapInArrow(mapper, schema=schema)
    w = Window.partitionBy("q_id").orderBy(F.col("adc_score").desc(), F.col("p_id").asc())
    return (
        partial.filter(F.col("p_id") != F.col("q_id"))
        .withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= k)
        .select("q_id", "p_id", "adc_score", "adc_rank")
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
    probing neighbor buckets in later rounds).

    Single-table convenience wrapper over the SAME Arrow matmul kernel
    the multi-table path uses (lsh_buckets_arrow with tables=1,
    bits=n_planes) — the interpreted per-plane Column fold this once
    carried is retired; all sign bits come from one BLAS call per
    batch, and the exact cosine per candidate comes from the joined
    vectors in one Column expression (tiny candidate set, already
    filtered by the bucket join)."""
    q = lsh_buckets_arrow(queries, dim, n_planes, 1, id_col, vec_col, out_id="q_id")
    p = lsh_buckets_arrow(points, dim, n_planes, 1, id_col, vec_col, out_id="p_id")
    cand = q.join(p, on="bucket").filter(F.col("p_id") != F.col("q_id"))
    vec_d = F.col(vec_col).cast("array<double>")
    pv = points.select(F.col(id_col).alias("p_id"), vec_d.alias("p_vec"))
    qv = queries.select(F.col(id_col).alias("q_id"), vec_d.alias("q_vec"))
    return (
        cand.join(qv, "q_id")
        .join(pv, "p_id")
        .withColumn("cosine", cosine_sim(F.col("q_vec"), F.col("p_vec")))
        .select("q_id", "p_id", "bucket", "cosine")
    )


def embedding_near_dup(
    df: DataFrame,
    dim: int,
    threshold: float,
    bits: int = 6,
    tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane
    LSH generates candidates (int64 bucket equi-join, a < b), then the
    EXACT cosine verifies each candidate in one einsum per Arrow batch.
    Returns (id_a, id_b) — ids only, so a re-derivation oracle is
    hash-exact (a float boundary flip would need a true cosine within
    float64 noise of ``threshold``).

    Scale shape (10^12 rows): candidates shuffle on bucket ids —
    O(sum of bucket-pair sizes), never all-pairs; verification joins
    shuffle on vector ids. Recall is the banding curve
    1-(1-p^bits)^tables with p = 1 - acos(cos)/pi; production near-dup
    dedup (threshold ~0.9) uses bits ~16 so buckets stay small — the
    defaults here are sized for this synthetic table's looser
    threshold. Near-dup DEDUP is this + keep-lowest-id anti-join,
    identical to ops.dedup's minhash shape."""
    a = lsh_buckets_arrow(df, dim, bits, tables, id_col, vec_col, out_id="id_a")
    b = lsh_buckets_arrow(df, dim, bits, tables, id_col, vec_col, out_id="id_b")
    pairs = (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    e = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    paired = (
        pairs.join(e.select(F.col("__id").alias("id_a"), F.col("__vec").alias("vec_a")), "id_a")
        .join(e.select(F.col("__id").alias("id_b"), F.col("__vec").alias("vec_b")), "id_b")
    )

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def verify(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ia = batch.column(batch.schema.get_field_index("id_a")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ib = batch.column(batch.schema.get_field_index("id_b")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            va = _vec_matrix(batch.column(batch.schema.get_field_index("vec_a")), dim)
            vb = _vec_matrix(batch.column(batch.schema.get_field_index("vec_b")), dim)
            va /= _safe_norms(va)
            vb /= _safe_norms(vb)
            cos = np.einsum("ij,ij->i", va, vb)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ia), pa.array(ib), pa.array(cos)], names=["id_a", "id_b", "cosine"]
            )

    return (
        paired.mapInArrow(verify, schema=schema)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse k-means
    codebook, then compare pairs only WITHIN a cluster and drop every
    vector that has a lower-id cluster-mate with cosine >= threshold
    (keep-lowest-id, the same greedy rule as ops.dedup). Returns the
    kept rows as (id, cid), one row per survivor.

    Scale shape (10^12 rows): the all-pairs comparison the naive
    formulation needs is replaced by |clusters| independent
    self-joins — assignment is one argmax matmul per Arrow batch
    (ivf_assign_arrow, the IVF partition column at scale), the
    within-cluster pair join shuffles on cid, and the exact-cosine
    verify is one einsum per Arrow batch over candidate pairs only
    (identical machinery to embedding_near_dup). With k-means sized so
    clusters hold ~10^4 vectors, pair work is n/k * n per cluster
    total — linear-ish in n, embarrassingly parallel across clusters.
    Skewed (hot) clusters split under AQE skew-join handling since the
    pair join is a plain shuffle equi-join on cid.

    Determinism: assignment ties break on ascending cid (matches the
    oracle's ORDER BY cosine DESC, cid) and the drop rule uses ids,
    so the DuckDB re-derivation oracle is hash-exact — a boundary
    flip would need a true cosine within float64 noise of threshold.
    """
    assigned = ivf_assign_arrow(
        df, centroids, nprobe=1, id_col=id_col, vec_col=vec_col, out_id="__sd_id"
    )
    e = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    pairs = (
        assigned.select(F.col("__sd_id").alias("id_a"), "cid")
        .join(assigned.select(F.col("__sd_id").alias("id_b"), "cid"), on="cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    paired = (
        pairs.join(e.select(F.col("__id").alias("id_a"), F.col("__vec").alias("vec_a")), "id_a")
        .join(e.select(F.col("__id").alias("id_b"), F.col("__vec").alias("vec_b")), "id_b")
    )

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def verify(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ia = batch.column(batch.schema.get_field_index("id_a")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ib = batch.column(batch.schema.get_field_index("id_b")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            va = _vec_matrix(batch.column(batch.schema.get_field_index("vec_a")), dim)
            vb = _vec_matrix(batch.column(batch.schema.get_field_index("vec_b")), dim)
            va /= _safe_norms(va)
            vb /= _safe_norms(vb)
            cos = np.einsum("ij,ij->i", va, vb)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ia), pa.array(ib), pa.array(cos)],
                names=["id_a", "id_b", "cosine"],
            )

    dropped = (
        paired.mapInArrow(verify, schema=schema)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id_b").alias("__drop"))
        .distinct()
    )
    return assigned.join(
        dropped, assigned["__sd_id"] == dropped["__drop"], how="left_anti"
    ).select(F.col("__sd_id").alias(id_col), "cid")
