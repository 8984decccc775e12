"""URL-seen dedup: Bloom probe → exact anti-join fallback (SURVEY §2.3 J1).

The reference's dupefilter (settings.py:107) is a single in-memory
fingerprint set; at 10^10 URLs that set does not fit one machine, so here:

  1. in-batch ``dropDuplicates('url')`` (reference analog: the per-crawl
     set() dedup, :571) — cheap, before any state probe;
  2. Bloom probe, vectorized numpy over Arrow batches with the blobs
     shipped via a Spark broadcast variable (zero shuffle).  Negatives are
     *guaranteed unseen* (no false negatives) and bypass the join;
  3. only Bloom positives — a tiny slice at the configured FPR — hit the
     exact LEFT ANTI join against the frontier delta log on url_hash+url,
     so the expensive join's probe side shrinks by ~(1-FPR);
  4. the Bloom delta for accepted keys is computed distributed
     (groupBy(bucket).applyInPandas → one (bucket, blob) row per bucket)
     and OR-merged into the snapshot state on the driver — state per
     bucket stays executor-sized at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark.operators.bloom import BloomState, key_hashes


def probe_unseen(spark: SparkSession, candidates: DataFrame, frontier: DataFrame, bloom: BloomState) -> DataFrame:
    """candidates(url, …) → subset whose url was never seen before."""
    sc = spark.sparkContext
    b = sc.broadcast((bloom.n_buckets, bloom.m, bloom.k, bloom.blobs))

    def probe(batches):
        nb, m, k, blobs = b.value
        st = BloomState(nb, m, k)
        st.blobs = blobs
        for pdf in batches:
            if pdf.empty:
                continue
            maybe = st.probe(pdf["url"].tolist())
            yield pdf.assign(maybe_seen=maybe)

    from pyspark.sql import types as T

    out_schema = T.StructType(list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())])
    probed = candidates.mapInPandas(probe, schema=out_schema)
    probed = probed.persist()
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    positives = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    # exact check only for the Bloom-positive sliver; anti-join keyed on the
    # canonical url (url_hash equi-key lets Spark hash-partition cheaply)
    survivors = positives.join(frontier.select("url").distinct(), on="url", how="left_anti")
    return fresh.unionByName(survivors)


def bloom_delta(spark: SparkSession, accepted: DataFrame, bloom: BloomState) -> BloomState:
    """Distributed delta-bit computation for the accepted new URLs."""
    nb, m, k = bloom.n_buckets, bloom.m, bloom.k

    @F.pandas_udf("int")
    def md5_bucket(urls: pd.Series) -> pd.Series:
        h1, _ = key_hashes(urls.tolist())
        return pd.Series((h1 % np.uint64(nb)).astype("int32"))

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        st = BloomState(1, m, k)
        urls = pdf["url"].tolist()
        h1, h2 = key_hashes(urls)
        i = np.arange(k, dtype=np.uint64)[None, :]
        pos = ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)
        byte_idx, bit = pos >> 3, (pos & 7).astype(np.uint8)
        np.bitwise_or.at(st.blobs, (np.zeros_like(byte_idx), byte_idx), np.uint8(1) << bit)
        return pd.DataFrame(
            {"bucket": [int(key[0])], "n": [len(urls)], "blob": [st.blobs[0].tobytes()]}
        )

    rows = (
        accepted.select("url")
        .withColumn("bucket", md5_bucket(F.col("url")))
        .groupBy("bucket")
        .applyInPandas(per_bucket, schema="bucket int, n long, blob binary")
        .collect()
    )
    delta = BloomState(nb, m, k)
    for r in rows:
        delta.blobs[r["bucket"]] |= np.frombuffer(r["blob"], dtype=np.uint8)
        delta.n_items[r["bucket"]] += r["n"]
    return delta
