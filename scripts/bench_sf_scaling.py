"""Data-scaling evidence: the same workloads at 1x and 10x data.

The per-round bench (bench.py) runs at a fixed data size; the N -> 4N JVM
emulation (bench_crawl_scaling.py) scales COMPUTE.  This script scales the
DATA 10x and reports throughput at both sizes plus the scaling ratio
(ideal = 1.0: flat per-row cost as data grows), covering:

  * fetch_parse   — fused fetch->parse->clean, 20k vs 200k pages
  * dedup         — Bloom probe + exact anti-join, 4M vs 40M candidates
                    against 0.5M vs 5M seen
  * wide batch    — one full crawl micro-batch, scale 40 (~46k pages) vs
                    scale 400 (~460k pages)
  * pack queries  — documents/embeddings-based operators over sf0.1 vs a
                    10x row-replicated copy (doc ids shifted per replica,
                    so group/join cardinalities scale linearly too)

Writes ONE JSON line; append the numbers to BENCH/BASELINE.md as a
"## Round-N" hand section.

Usage: python scripts/bench_sf_scaling.py [--quick]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawlspark import benchlib  # noqa: E402
from crawlspark.queries import SPARK_QUERIES  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PACK = ["url_skip_filter", "dedup_minhash_lsh", "paragraph_boilerplate",
        "ann_ivf_topk"]


def replicate_sf(spark, out_dir: str, factor: int = 10) -> None:
    """documents/embeddings at ``factor``x rows: each replica's ids are
    shifted past the max AND each replica's text is perturbed with its
    replica index, so id-keyed AND text-derived join/group keys (MinHash
    bands, paragraph-chunk hashes) both scale with the data instead of
    collapsing every replica onto the same bucket (which would measure
    replica-artifact pair blowup, not data scaling)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    emb_id = "id" if "id" in emb.columns else emb.columns[0]
    max_emb = emb.agg(F.max(emb_id)).collect()[0][0] + 1
    docs_n = docs
    emb_n = emb
    src_chars = "etaoinshrd"
    for i in range(1, factor):
        # pervasive per-replica transform: a character translation touches
        # every word, so every shingle/chunk hash differs across replicas
        # (an edge-only prefix/suffix would leave interior MinHash minima
        # identical and the band buckets would still collapse)
        dst = src_chars[i:] + src_chars[:i]
        docs_n = docs_n.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
            .withColumn("text", F.translate("text", src_chars, dst)))
        emb_n = emb_n.unionByName(
            emb.withColumn(emb_id, F.col(emb_id) + F.lit(i * max_emb)))
    docs_n.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    emb_n.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("sf-scaling")
    out: dict = {"loads": {}}

    def mark(tag):
        out["loads"][tag] = round(os.getloadavg()[0], 2)

    mark("start")
    benchlib.bench_fetch_parse(spark, n_pages=1000)  # warmup

    # fetch_parse 1x vs 10x
    t1 = benchlib.bench_fetch_parse(spark, n_pages=20_000)["sec"]
    t10 = benchlib.bench_fetch_parse(spark, n_pages=200_000)["sec"]
    out["fetch_parse"] = {
        "pages_1x": 20_000, "sec_1x": round(t1, 2),
        "pages_10x": 200_000, "sec_10x": round(t10, 2),
        "throughput_ratio": round((200_000 / t10) / (20_000 / t1), 3),
    }
    mark("after_fetch_parse")

    # dedup 1x vs 10x (candidates AND seen state scale together)
    d1 = benchlib.bench_dedup(spark, n_candidates=4_000_000, n_seen=500_000)["sec"]
    d10 = benchlib.bench_dedup(spark, n_candidates=40_000_000, n_seen=5_000_000)["sec"]
    out["dedup"] = {
        "cand_1x": 4_000_000, "sec_1x": round(d1, 2),
        "cand_10x": 40_000_000, "sec_10x": round(d10, 2),
        "throughput_ratio": round((40_000_000 / d10) / (4_000_000 / d1), 3),
    }
    mark("after_dedup")

    # one full crawl micro-batch, 10x the page count
    wb = {}
    for tag, scale in (("1x", 40.0), ("10x", 400.0)):
        if quick and tag == "10x":
            break
        wh = tempfile.mkdtemp(prefix=f"sfwb{tag}-")
        try:
            # budget high enough that the 10x web is NOT truncated by the
            # per-host cap — the batch must really be ~10x the pages
            r = benchlib.bench_crawl_batch(spark, wh, scale=scale,
                                           budget=1_000_000)
            wb[tag] = {"pages": round(r["pages_per_sec"] * r["sec"]),
                       "sec": round(r["sec"], 2),
                       "pages_per_sec": round(r["pages_per_sec"], 1)}
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    if "10x" in wb:
        wb["throughput_ratio"] = round(
            wb["10x"]["pages_per_sec"] / wb["1x"]["pages_per_sec"], 3)
    out["wide_batch"] = wb
    mark("after_wide_batch")

    # pack queries over 1x vs 10x-replicated tables
    big = tempfile.mkdtemp(prefix="sf10x-")
    try:
        replicate_sf(spark, big, factor=10)
        pack = {}
        for name in PACK:
            r = {}
            for tag, d in (("1x", SF_DIR), ("10x", big)):
                t0 = time.time()
                SPARK_QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite").save()
                r[f"sec_{tag}"] = round(time.time() - t0, 2)
            r["throughput_ratio"] = round(10 * r["sec_1x"] / r["sec_10x"], 3)
            pack[name] = r
        out["pack"] = pack
    finally:
        shutil.rmtree(big, ignore_errors=True)
    mark("end")
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
