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


def lsh_signatures(emb: DataFrame, dim: int = 64, n_planes: int = 12) -> DataFrame:
    """embeddings(vec_id, embedding, …) → + bucket int (hyperplane signs).

    One numpy matmul per Arrow batch — the signature cost is a dense
    GEMM, not per-row Python.
    """
    planes = _planes(dim, n_planes)

    @F.pandas_udf("int")
    def bucket_of(embs: pd.Series) -> pd.Series:
        mat = np.asarray(embs.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([], dtype="int32")
        bits = (mat @ planes) > 0
        vals = (bits * (1 << np.arange(planes.shape[1]))).sum(axis=1)
        return pd.Series(vals.astype("int32"))

    return emb.withColumn("bucket", bucket_of(F.col("embedding")))


def _cosine_expr(a, b):
    to_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    dot = F.aggregate(F.zip_with(to_d(a), to_d(b), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(to_d(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


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
                 dim: int = 64, n_planes: int = 12) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank.  One shuffle (the bucket equi-join)."""
    sig = lsh_signatures(emb, dim, n_planes)
    qsig = lsh_signatures(queries, dim, n_planes).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    cand = sig.join(qsig, on="bucket").filter(F.col("vec_id") != F.col("query_id"))
    cos = _cosine_expr(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"), "bucket")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
