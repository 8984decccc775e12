"""URL-seen dedup: Bloom probe → exact anti-join fallback (SURVEY §2.3 J1).

The reference's dupefilter (settings.py:107) is a single in-memory
fingerprint set; at 10^10 URLs that set does not fit one machine, so here:

  1. in-batch ``dropDuplicates('url')`` (reference analog: the per-crawl
     set() dedup, :571) — cheap, before any state probe;
  2. key hashing happens JVM-side: h1 = xxhash64(url), h2 = xxhash64(salt,
     url) — the probe UDF is pure numpy bit math over Arrow batches with
     the blobs shipped via a Spark broadcast variable (zero shuffle).
     Negatives are *guaranteed unseen* (no false negatives) and bypass the
     join;
  3. only Bloom positives — a tiny slice at the configured FPR — hit the
     exact LEFT ANTI join against the urlseen table, so the expensive
     join's probe side shrinks by ~(1-FPR);
  4. the Bloom delta for accepted keys is computed distributed
     (groupBy(bucket).applyInPandas → one (bucket, blob) row per bucket,
     bucket = pmod(h1, n_buckets) which matches the uint64 view because
     n_buckets is a power of two) and OR-merged into the snapshot state on
     the driver — state per bucket stays executor-sized at any scale; for
     state larger than broadcastable, the same applyInPandas pattern
     probes per-bucket blobs read from storage instead (co-partitioned,
     one shuffle).
"""

from __future__ import annotations

import itertools
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark.operators.bloom import BloomState

_H2_SALT = "bloom-h2"
_VIEW_SEQ = itertools.count()

# Hash/bucket Column lists, built once per (SparkContext, n_buckets): the
# crawl loop probes EVERY politeness batch and each pyspark.sql.functions
# call is a ~1-3 ms py4j roundtrip — three withColumns per probe totalled
# ~25 ms/batch of pure driver-side plan construction (same rationale and
# keying as crawl._COLS_CACHE).
_HASH_COLS_CACHE: dict = {}


def _hash_cols(spark, n_buckets: int | None) -> list:
    key = (spark.sparkContext.applicationId, n_buckets)
    c = _HASH_COLS_CACHE.get(key)
    if c is None:
        if next(iter(_HASH_COLS_CACHE), (None,))[0] != key[0]:
            _HASH_COLS_CACHE.clear()  # new context: drop dead Column trees
        h1 = F.xxhash64("url")
        c = [h1.alias("_h1"), F.xxhash64(F.lit(_H2_SALT), F.col("url")).alias("_h2")]
        if n_buckets is not None:
            c = c + [F.pmod(h1, F.lit(n_buckets)).cast("int").alias("bucket")]
        _HASH_COLS_CACHE[key] = c
    return c


def _with_hashes(df: DataFrame) -> DataFrame:
    return df.select("*", *_hash_cols(df.sparkSession, None))


def _u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def _split_and_verify(spark: SparkSession, probed: DataFrame, urlseen: DataFrame,
                      small_positives: bool, drop: tuple) -> DataFrame:
    """probed(+maybe_seen) → unseen rows: guaranteed-fresh negatives UNION
    the exactly-verified Bloom-positive sliver.

    The small_positives (crawl-loop) path issues ONE spark.sql statement
    over temp views instead of the 8-op DataFrame chain (2 filters, 2
    drops, distinct, 2 broadcast joins, union) — same physical plan
    (verified by test_bloom equality + the broadcast assertions), ~3 py4j
    roundtrips instead of ~15 per politeness batch.  The join semantics
    are identical to _exact_unseen: urlseen is only ever broadcast-SCANNED
    against the batch-bounded positive sliver, never shuffled.

    One probe pass, not three: the fresh branch, the positive branch, and
    the positive-id broadcast each re-reference the probed subtree, and
    Catalyst inlines it per reference — the mapInArrow probe (candidate
    generation + double xxhash + a full Arrow round-trip) was executing
    2-3x per call.  Keying the branches behind one url-hash exchange lets
    ReuseExchange dedup the subtree to a single execution (guide §2.4:
    operations keyed the same way share one exchange); the shuffle moves
    each candidate row once, which is strictly cheaper than recomputing
    the probe on every branch.  The maybe_seen flag is re-projected behind
    a materialize_once Generate barrier so the per-branch filters cannot
    be pushed below the exchange (pushed-down filters make the branch
    subtrees differ, and ReuseExchange only dedups identical subtrees).
    """
    from crawlspark.plans import materialize_once

    probed = materialize_once(
        probed.repartition(F.col("url")).withColumnRenamed("maybe_seen", "_ms_raw"),
        maybe_seen=F.col("_ms_raw"),
    ).drop("_ms_raw")
    if not small_positives:
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen", *drop)
        positives = probed.filter(F.col("maybe_seen")).drop("maybe_seen", *drop)
        return fresh.unionByName(_exact_unseen(positives, urlseen, False))
    keep = ", ".join(
        f"`{c}`" for c in probed.columns if c != "maybe_seen" and c not in drop
    )
    # unique view names per call: createOrReplaceTempView + spark.sql on
    # fixed names would be a read-modify race if two probes ever ran
    # concurrently in one session (spark.sql analyzes eagerly, but a
    # replace landing between B's register and B's sql would silently
    # rebind B's query to A's batch)
    n = next(_VIEW_SEQ)
    pv, uv = f"cs_probe_t_{n}", f"cs_urlseen_t_{n}"
    probed.createOrReplaceTempView(pv)
    urlseen.createOrReplaceTempView(uv)
    out = spark.sql(f"""
        WITH pos AS (SELECT {keep} FROM {pv} WHERE maybe_seen),
             hits AS (SELECT /*+ BROADCAST(ids) */ u.url FROM {uv} u
                      LEFT SEMI JOIN (SELECT DISTINCT url FROM pos) ids
                      ON u.url = ids.url)
        SELECT {keep} FROM {pv} WHERE NOT maybe_seen
        UNION ALL
        SELECT /*+ BROADCAST(hits) */ p.* FROM pos p
        LEFT ANTI JOIN hits ON p.url = hits.url
    """)
    # the DataFrame captured the plans at analysis; drop the catalog entries
    spark.catalog.dropTempView(pv)
    spark.catalog.dropTempView(uv)
    return out


def _exact_unseen(positives: DataFrame, urlseen: DataFrame,
                  small_positives: bool) -> DataFrame:
    """Exact check for the Bloom-positive sliver.

    ``small_positives=True`` (the crawl loop): the sliver is batch-bounded
    (≤ links-per-batch), so BROADCAST it and verify with a broadcast
    LEFT SEMI **scan** of urlseen followed by a broadcast anti-join — the
    10^10-row seen table is only ever SCANNED (column-pruned to url, no
    shuffle, no shuffle files), never repartitioned.  The default
    plan (plain LEFT ANTI) shuffles BOTH sides, which at web scale means
    re-shuffling the full seen set every micro-batch.
    """
    if not small_positives:
        return positives.join(urlseen.select("url"), on="url", how="left_anti")
    seen_hits = urlseen.select("url").join(
        F.broadcast(positives.select("url").distinct()), on="url", how="left_semi"
    )
    return positives.join(F.broadcast(seen_hits), on="url", how="left_anti")


def probe_unseen(spark: SparkSession, candidates: DataFrame, urlseen: DataFrame,
                 bloom: BloomState, small_positives: bool = False) -> DataFrame:
    """candidates(url, …) → subset whose url was never seen before."""
    # cached per state version — NOT a fresh broadcast per micro-batch
    # (that accumulated executor copies unboundedly); the crawl loop calls
    # bloom.release() after each batch's commit
    b = bloom.broadcast(spark)

    # vectorized pandas_udf over JUST the two 8-byte hash columns (guide
    # §4.1: pass only what the function needs) — the previous mapInArrow
    # form shipped every candidate column (url string + frontier metadata)
    # through the Python worker and back, ~5x the Arrow bytes for the same
    # numpy bit math.  Iterator form: the Bloom view over the broadcast
    # blobs is built once per task, not per batch (guide §4.5).
    @F.pandas_udf("boolean")
    def probe(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        nb, m, k, blobs = b.value
        st = BloomState(nb, m, k)
        st.blobs = blobs
        for h1, h2 in it:
            yield pd.Series(st.probe_hashes(_u64(h1), _u64(h2)))

    probed = _with_hashes(candidates).withColumn(
        "maybe_seen", probe(F.col("_h1"), F.col("_h2"))
    )
    return _split_and_verify(spark, probed, urlseen, small_positives,
                             drop=("_h1", "_h2"))


def probe_unseen_cuckoo(spark: SparkSession, candidates: DataFrame,
                        urlseen: DataFrame, cuckoo,
                        small_positives: bool = False) -> DataFrame:
    """candidates(url, …) → subset not in the cuckoo seen set.

    The cuckoo twin of probe_unseen — same JVM hashing, same
    mapInArrow-over-broadcast probe, same _split_and_verify exact check of
    positives.  What it adds over the Bloom layout is that the state
    supports DELETION (operators/cuckoo.delete_hashes), so cache expiry
    can re-admit URLs through this standard unseen path: delete the
    expired keys and they probe fresh again, no separate staleness join.
    ``urlseen`` must be the matching exact set (live keys only) so Bloom/
    cuckoo false positives are verified away identically."""
    from crawlspark.operators.cuckoo import CuckooState

    b = cuckoo.broadcast(spark)

    # same column-pruned vectorized probe shape as probe_unseen (guide
    # §4.1/§4.5): only the two hash columns cross the Python boundary
    @F.pandas_udf("boolean")
    def probe(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        nb, ns, mk, table, n_items = b.value
        st = CuckooState(nb, ns, mk)
        st.table = table
        st.n_items = n_items
        for h1, h2 in it:
            yield pd.Series(st.probe_hashes(_u64(h1), _u64(h2)))

    probed = _with_hashes(candidates).withColumn(
        "maybe_seen", probe(F.col("_h1"), F.col("_h2"))
    )
    return _split_and_verify(spark, probed, urlseen, small_positives,
                             drop=("_h1", "_h2"))


def bloom_delta(
    spark: SparkSession, accepted: DataFrame, bloom: BloomState, collect_hosts: bool = False,
    small_batch_rows: int | None = None,
):
    """Distributed delta-bit computation for the accepted new URLs: one
    (bucket, blob) row per touched bucket, OR-merged on the driver.

    ``collect_hosts=True`` piggybacks the distinct hosts of the accepted
    rows onto the same job (the crawl loop needs them for robots state —
    one Spark job instead of two per batch) and returns (delta, hosts).

    ``small_batch_rows``: when the caller can BOUND the accepted-row count
    (the politeness loop: n_scheduled × max links/page) and the bound is
    small, skip the groupBy+applyInPandas job (two stages, a shuffle and a
    Python-worker round per micro-batch — ~1.5 s of fixed cost) and
    instead collect the JVM-computed (h1, h2, host) rows and run the SAME
    numpy add kernel on the driver.  Identical bits by construction (same
    hashes, same kernel); the collect is capped by the bound (~24 B/row →
    a 50k bound is ~1 MB).  The driver already received the touched blobs
    under the distributed path, so this strictly REDUCES driver traffic
    for small batches; wide batches keep the distributed path.
    """
    nb, m, k = bloom.n_buckets, bloom.m, bloom.k
    with_host = collect_hosts and "host" in accepted.columns

    if small_batch_rows is not None and small_batch_rows <= 50_000:
        cols = ["_h1", "_h2", "host"] if with_host else ["_h1", "_h2"]
        # the caller's bound is an ESTIMATE (pages × assumed links/page) —
        # hard-cap the driver's exposure with limit(cap+1): if the batch
        # actually exceeds the cap (link-farm pages), fall through to the
        # distributed path below instead of materializing an unbounded
        # collect.  The probe touched only the (persisted) input, so the
        # fallback recomputes nothing upstream.
        cap = 50_000
        rows = _with_hashes(
            accepted.select(*(["url", "host"] if with_host else ["url"]))
        ).select(*cols).limit(cap + 1).collect()
        if len(rows) <= cap:
            delta = BloomState(nb, m, k)
            if rows:
                h1 = np.array([r["_h1"] for r in rows], dtype=np.int64).view(np.uint64)
                h2 = np.array([r["_h2"] for r in rows], dtype=np.int64).view(np.uint64)
                delta.add_hashes(h1, h2)
            if collect_hosts:
                return delta, {r["host"] for r in rows} if with_host else set()
            return delta

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        st = BloomState(1, m, k)
        h1 = _u64(pdf["_h1"])
        h2 = _u64(pdf["_h2"]) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[None, :]
        pos = ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)
        byte_idx, bit = pos >> 3, (pos & 7).astype(np.uint8)
        np.bitwise_or.at(st.blobs, (np.zeros_like(byte_idx), byte_idx), np.uint8(1) << bit)
        hosts = sorted(set(pdf["host"])) if "host" in pdf.columns else []
        return pd.DataFrame(
            {"bucket": [int(key[0])], "n": [len(h1)],
             "blob": [st.blobs[0].tobytes()], "hosts": [hosts]}
        )

    cols = ["url", "host"] if with_host else ["url"]
    rows = (
        _with_hashes(accepted.select(*cols))
        .withColumn("bucket", F.pmod(F.col("_h1"), F.lit(nb)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(per_bucket, schema="bucket int, n long, blob binary, hosts array<string>")
        .collect()
    )
    delta = BloomState(nb, m, k)
    hosts: set = set()
    for r in rows:
        delta.blobs[r["bucket"]] |= np.frombuffer(r["blob"], dtype=np.uint8)
        delta.n_items[r["bucket"]] += r["n"]
        hosts.update(r["hosts"] or [])
    if collect_hosts:
        return delta, hosts
    return delta


def probe_unseen_partitioned(
    spark: SparkSession, candidates: DataFrame, urlseen: DataFrame, store,
    small_positives: bool = False,
) -> DataFrame:
    """Co-partitioned probe for Bloom state too large to broadcast
    (the 10^10-key regime: ~12 GB total, MBs per bucket).

    Candidates shuffle ONCE on bucket = pmod(h1, n_buckets); each task
    loads only its bucket's blob from the BloomBucketStore manifest (local
    FS here, object store on a real cluster) and probes with the same
    numpy kernel.  Per-task working set is one bucket's blob regardless of
    total state size; only the tiny bucket→path manifest is broadcast.
    """
    m, k, nb = store.m, store.k, store.n_buckets
    # cached per store version; the crawl loop release()s it post-commit
    b_paths = store.broadcast(spark)

    # Column-pruned vectorized probe (guide §4.1): only the two 8-byte hash
    # columns + the bucket id cross the Python boundary — the previous
    # groupBy().applyInPandas shipped EVERY candidate column (url string +
    # frontier metadata) into pandas and back.  The bucket co-partitioning
    # (candidates shuffle ONCE on bucket) and the per-task working-set
    # contract are preserved: rows are additionally SORTED by bucket within
    # each partition, so blobs stream through one at a time and the single
    # cached blob is the task's working set regardless of total state size.
    @F.pandas_udf("boolean")
    def probe(it: Iterator[Tuple[pd.Series, pd.Series, pd.Series]]
              ) -> Iterator[pd.Series]:
        i = np.arange(k, dtype=np.uint64)[None, :]
        cur_b: int | None = None
        cur_blob: np.ndarray | None = None
        for h1s, h2s, bks in it:
            h1 = _u64(h1s)
            h2 = _u64(h2s) | np.uint64(1)
            bk = bks.to_numpy(dtype=np.int64)
            pos = ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)
            byte_idx, bit = pos >> 3, (pos & 7).astype(np.uint8)
            out = np.zeros(len(bk), dtype=bool)
            for b in np.unique(bk):  # bucket-sorted input: 1-2 per batch
                if int(b) != cur_b:
                    cur_b = int(b)
                    path = b_paths.value.get(cur_b)
                    cur_blob = np.load(path) if path is not None else None
                if cur_blob is None:
                    continue  # bucket never written: nothing seen
                sel = bk == b
                bits = (cur_blob[byte_idx[sel]] >> bit[sel]) & 1
                out[sel] = bits.all(axis=1)
            yield pd.Series(out)

    withh = candidates.select("*", *_hash_cols(spark, nb))
    probed = (
        withh.repartition(F.col("bucket"))
        .sortWithinPartitions("bucket")
        .withColumn("maybe_seen", probe(F.col("_h1"), F.col("_h2"), F.col("bucket")))
    )
    return _split_and_verify(spark, probed, urlseen, small_positives,
                             drop=("_h1", "_h2", "bucket"))


def update_buckets_partitioned(
    spark: SparkSession, accepted: DataFrame, store, dst_dir: str,
    collect_hosts: bool = False,
):
    """OR the accepted keys' bits into each touched bucket's blob and write
    one NEW blob file per touched bucket (old files stay — snapshot
    isolation); returns a new BloomBucketStore whose manifest re-references
    every untouched bucket.  The driver only ever sees the tiny
    (bucket, n, path, hosts) summary rows — never blob bytes — so this is
    the no-driver-OR-merge counterpart of bloom_delta for the >broadcast
    regime.  ``collect_hosts`` piggybacks the accepted rows' distinct hosts
    on the same job (as bloom_delta does).
    """
    import os
    import uuid

    from crawlspark.operators.bloom import BloomBucketStore

    os.makedirs(dst_dir, exist_ok=True)
    m, k, nb = store.m, store.k, store.n_buckets
    # same cached broadcast the probe used (store versions are immutable)
    b_paths = store.broadcast(spark)
    with_host = collect_hosts and "host" in accepted.columns

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        src = b_paths.value.get(b)
        blob = np.load(src) if src is not None else np.zeros(m // 8, dtype=np.uint8)
        blob = blob.copy()
        h1 = _u64(pdf["_h1"])
        h2 = _u64(pdf["_h2"]) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[None, :]
        pos = ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)
        byte_idx, bit = pos >> 3, (pos & 7).astype(np.uint8)
        np.bitwise_or.at(blob, byte_idx, np.uint8(1) << bit)
        out = os.path.join(dst_dir, f"bucket-{b:05d}-{uuid.uuid4().hex[:8]}.npy")
        np.save(out, blob)
        hosts = sorted(set(pdf["host"])) if "host" in pdf.columns else []
        return pd.DataFrame(
            {"bucket": [b], "n": [len(h1)], "path": [out], "hosts": [hosts]}
        )

    cols = ["url", "host"] if with_host else ["url"]
    rows = (
        _with_hashes(accepted.select(*cols))
        .withColumn("bucket", F.pmod(F.col("_h1"), F.lit(nb)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(per_bucket, schema="bucket int, n long, path string, hosts array<string>")
        .collect()
    )
    new_paths = dict(store.paths)
    new_items = dict(store.n_items)
    hosts: set = set()
    for r in rows:
        new_paths[r["bucket"]] = r["path"]
        new_items[r["bucket"]] = new_items.get(r["bucket"], 0) + r["n"]
        hosts.update(r["hosts"] or [])
    new_store = BloomBucketStore(nb, m, k, new_paths, new_items)
    if collect_hosts:
        return new_store, hosts
    return new_store
