"""Headline benchmark — prints ONE JSON line.

Workloads (BASELINE.json metric: pages fetched/sec + frontier-dedup
ops/sec):
  * crawl_e2e      — full micro-batch crawl loop (schedule→fetch→parse→
                     dedup→commit) on the deterministic synthetic web
  * dedup_1m       — 1M candidate URLs through Bloom probe + exact
                     anti-join fallback against a 200k seen set
  * fetch_parse_20k— 20k pages through fetch→parse→clean (politeness-free
                     throughput of the pipeline stages)
  * query-pack sample — representative operators at $SPARK_GRAFT_SF_DIR

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawlspark import benchlib  # noqa: E402
from crawlspark.queries import SPARK_QUERIES  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402

SAMPLE_QUERIES = [
    "tpch_pricing_summary",
    "revenue_by_nation",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "events_sessionize",
    "url_skip_filter",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark("bench")
    queries: dict[str, float] = {}
    extra: dict = {}

    wh = tempfile.mkdtemp(prefix="benchwh-")
    try:
        # warmup: first Spark job of a session pays JVM codegen + python
        # worker-pool spin-up (~4-8s); pay it here so crawl_e2e measures
        # the crawl loop, not session startup
        benchlib.bench_fetch_parse(spark, n_pages=1000)

        c = benchlib.bench_crawl(spark, wh, scale=0.5)
        queries["crawl_e2e"] = round(c["sec"], 3)
        extra["crawl_pages_per_sec"] = round(c["pages_per_sec"], 1)
        extra["crawl_docs"] = c["n_docs"]

        d = benchlib.bench_dedup(spark, n_candidates=4_000_000, n_seen=500_000)
        queries["dedup_4m"] = round(d["sec"], 3)
        extra["dedup_ops_per_sec"] = round(d["ops_per_sec"], 0)

        dp = benchlib.bench_dedup(spark, n_candidates=4_000_000, n_seen=500_000,
                                  partitioned=True)
        queries["dedup_partitioned_4m"] = round(dp["sec"], 3)
        extra["dedup_partitioned_ops_per_sec"] = round(dp["ops_per_sec"], 0)

        p = benchlib.bench_fetch_parse(spark, n_pages=20_000)
        queries["fetch_parse_20k"] = round(p["sec"], 3)
        extra["fetch_parse_pages_per_sec"] = round(p["pages_per_sec"], 1)

        # decode-off twin: isolates the S9 transfer-decode + cache-hash
        # cost so pipeline numbers stay comparable across rounds
        pn = benchlib.bench_fetch_parse(spark, n_pages=20_000, decode=False)
        queries["fetch_parse_20k_nodecode"] = round(pn["sec"], 3)
        extra["fetch_parse_nodecode_pages_per_sec"] = round(pn["pages_per_sec"], 1)

        wh2 = tempfile.mkdtemp(prefix="benchwb-")
        try:
            wb = benchlib.bench_crawl_batch(spark, wh2, scale=40.0)
            queries["crawl_wide_batch_46k"] = round(wb["sec"], 3)
            extra["crawl_batch_pages_per_sec"] = round(wb["pages_per_sec"], 1)
        finally:
            shutil.rmtree(wh2, ignore_errors=True)

        for name in SAMPLE_QUERIES:
            t0 = time.time()
            SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            queries[name] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "crawl+dedup+parse+querypack wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "throughput": extra,
    }))


if __name__ == "__main__":
    main()
