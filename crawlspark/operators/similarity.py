"""Similarity search over embedding columns (training-data pipeline op).

Two paths:
  * brute-force cosine top-k — the exactness baseline (pure Column
    expressions: zip_with product + ordered fold; also the DuckDB-oracled
    form in queries.embed_cosine_topk);
  * LSH-bucketed ANN — the scale path: random-hyperplane signatures
    (deterministic planes derived from a seed, computed in ONE vectorized
    numpy matmul per Arrow batch via mapInPandas), candidate pairs only
    within a bucket, exact cosine re-ranking on the candidates.

At 100 TB the brute-force path is O(Q·N) and dies; the LSH path shuffles
once on the bucket key and its per-bucket work is
O(Σ bucket²) ≪ O(N²) for well-spread signatures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PLANE_SEED = 42


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(PLANE_SEED)
    return rng.standard_normal((dim, n_planes))


def rademacher_planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes derived from md5 — data-independent
    constants that a SQL oracle can embed as literals (random projections
    with Rademacher entries are a valid sign-LSH family)."""
    import hashlib

    out = np.empty((dim, n_planes), dtype=np.float64)
    for j in range(n_planes):
        buf = b""
        c = 0
        while len(buf) < dim:
            buf += hashlib.md5(f"plane-{j}-{c}".encode()).digest()
            c += 1
        col = np.frombuffer(buf[:dim], dtype=np.uint8)
        out[:, j] = np.where(col < 128, 1.0, -1.0)
    return out


def lsh_signatures(emb: DataFrame, dim: int = 64, n_planes: int = 12,
                   planes: np.ndarray | None = None) -> DataFrame:
    """embeddings(vec_id, embedding, …) → + bucket int (hyperplane signs).

    One numpy matmul per Arrow batch — the signature cost is a dense
    GEMM, not per-row Python.
    """
    planes = _planes(dim, n_planes) if planes is None else planes

    @F.pandas_udf("int")
    def bucket_of(embs: pd.Series) -> pd.Series:
        mat = np.asarray(embs.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([], dtype="int32")
        bits = (mat @ planes) > 0
        vals = (bits * (1 << np.arange(planes.shape[1]))).sum(axis=1)
        return pd.Series(vals.astype("int32"))

    return emb.withColumn("bucket", bucket_of(F.col("embedding")))


def _to_d(c):
    return F.transform(c, lambda x: x.cast("double"))


def _dot_expr(a, b):
    """Ordered sequential fold — the cross-engine float contract."""
    return F.aggregate(F.zip_with(_to_d(a), _to_d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm_expr(c):
    return F.sqrt(F.aggregate(_to_d(c), F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine_expr(a, b):
    return _dot_expr(a, b) / (_norm_expr(a) * _norm_expr(b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbours for every query vector (broadcast the
    queries, never the corpus)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = _cosine_expr(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ann_lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                 dim: int = 64, n_planes: int = 12,
                 planes: np.ndarray | None = None, round_to: int = 6) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank.  One shuffle (the bucket equi-join)."""
    from crawlspark.plans import spread_input

    # Corpus is the STREAMED side: spread its scan so the per-pair cosine
    # project parallelizes (a 1-row-group input otherwise runs 1 task);
    # queries are the small side — broadcast them (guide §3.1).  Norms are
    # per-vector, so compute each ONCE before the join instead of per
    # candidate pair (guide §2.3 "don't compute things you throw away") —
    # same expression on the same input, so values are bit-identical.
    sig = lsh_signatures(spread_input(emb), dim, n_planes, planes).withColumn(
        "ns", _norm_expr(F.col("embedding"))
    )
    qsig = lsh_signatures(queries, dim, n_planes, planes).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm_expr(F.col("embedding")).alias("nq"),
        "bucket",
    )
    cand = sig.join(F.broadcast(qsig), on="bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot_expr(F.col("q_emb"), F.col("embedding")) / (F.col("nq") * F.col("ns"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", F.round(cos, round_to).alias("cosine"), "bucket")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# ---------------- IVF (inverted-file) ANN: the other scale path ----------

def ivf_train_centroids(emb: DataFrame, n_cells: int = 16, iters: int = 3,
                        dim: int = 64) -> list[list[float]]:
    """Coarse quantizer: k-means with deterministic init (first n_cells
    vectors by vec_id) and ``iters`` Lloyd rounds, each round one
    DataFrame job (assign = broadcast centroid matmul in a pandas UDF,
    update = groupBy mean).  Returns driver-side centroids (tiny: n_cells
    × dim floats)."""
    init = [
        r["embedding"]
        for r in emb.orderBy("vec_id").limit(n_cells).collect()
    ]
    centroids = np.asarray(init, dtype=np.float64)

    for _ in range(iters):
        assigned = ivf_assign(emb, [list(c) for c in centroids]).select(
            "vec_id", "embedding", "cell"
        )
        # mean per cell via posexplode → (cell, dim_idx) integer-keyed agg
        sums = (
            assigned.select("cell", F.posexplode("embedding").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = centroids.copy()
        acc: dict = {}
        for r in sums:
            acc.setdefault(r["cell"], [np.zeros(dim), 0])[0][r["i"]] = r["s"]
            acc[r["cell"]][1] = r["n"]
        for c, (vec, n) in acc.items():
            if n > 0:
                new[c] = vec / n
        centroids = new
    return [list(map(float, c)) for c in centroids]


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               single_eval: bool = False) -> DataFrame:
    cen = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.asarray(embs.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([], dtype="int32")
        d2 = ((mat[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    if single_eval:
        # guide §4.4: a filter on the UDF-derived column (the join's
        # implicit isnotnull(cell)) gets pushed below the projection and
        # the optimizer duplicates the ArrowEvalPython node — two full
        # corpus passes through Arrow.  Non-deterministic marking forbids
        # the duplication; the assignment itself is a pure function.
        assign = assign.asNondeterministic()
    return emb.withColumn("cell", assign("embedding"))


def ann_ivf_topk(emb: DataFrame, queries: DataFrame, centroids: list[list[float]],
                 k: int = 5, n_probe: int = 2, round_to: int = 6) -> DataFrame:
    """IVF search: assign corpus to cells once; each query probes its
    ``n_probe`` nearest cells; exact cosine re-rank inside the probed
    cells.  One shuffle (the cell equi-join); per-query work is
    O(cell size × n_probe) instead of O(N)."""
    cen = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def probe_cells(embs: pd.Series) -> pd.Series:
        mat = np.asarray(embs.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([], dtype=object)
        d2 = ((mat[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        # stable sort: tied cell distances resolve to the LOWER cell id on
        # every engine (matches the SQL oracle's ORDER BY dist, cell)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series([list(r) for r in order])

    from crawlspark.plans import spread_input

    # Same shape discipline as ann_lsh_topk: stream the (spread) corpus,
    # broadcast the small query side, and compute each per-vector norm
    # exactly once before the join instead of once per candidate pair —
    # identical expressions on identical inputs, so the rounded cosines
    # (and the oracle hash) are unchanged.
    corpus = ivf_assign(spread_input(emb), centroids, single_eval=True).withColumn(
        "ns", _norm_expr(F.col("embedding"))
    )
    qdf = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm_expr(F.col("embedding")).alias("nq"),
        F.explode(probe_cells("embedding")).alias("cell"),
    )
    cand = corpus.join(F.broadcast(qdf), on="cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot_expr(F.col("q_emb"), F.col("embedding")) / (F.col("nq") * F.col("ns"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", F.round(cos, round_to).alias("cosine"), "cell")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
