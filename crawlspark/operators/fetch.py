"""Fetch stage: Arrow-batched mapInPandas over host-partitioned frontier rows.

Reference analog: the Splash/Selenium/Playwright downloader middlewares
(middlewares.py:63-117, spider :1598-1613).  In the sandbox the fetcher is
the deterministic synthetic web (crawlspark.synthetic); on a real cluster
the same stage body swaps in an HTTP client with per-partition connection
pools — the repartition("host") below is what makes per-host keep-alive
and politeness partition-local.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark import schemas, synthetic

FetchFn = Callable[[str, int], tuple[int, str, str, int]]


def fetch_stage(scheduled: DataFrame, spec: synthetic.WebSpec, fetch_fn: FetchFn | None = None) -> DataFrame:
    """scheduled(FRONTIER) → FETCHED; one fetch per row, batched via Arrow."""
    fn = fetch_fn or (lambda url, attempt: synthetic.fetch(spec, url, attempt))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = [fn(u, a) for u, a in zip(pdf["url"], pdf["retry_count"])]
            out = pdf.copy()
            out["status"] = [r[0] for r in res]
            out["final_url"] = [r[1] for r in res]
            out["body"] = [r[2] for r in res]
            out["elapsed_ms"] = [r[3] for r in res]
            yield out

    # Partition by (host, salt): keeps per-host locality for connection
    # reuse while never capping parallelism at the distinct-host count —
    # with plain repartition("host") a crawl of H hosts uses at most H
    # cores.  Within a partition the fetcher can still group by host for
    # keep-alive pooling; the politeness budget upstream bounds per-host
    # rows per batch, the salt bounds per-partition rows.
    #
    # The partition count is EXPLICIT: the shuffle input here is slim URL
    # rows, but the stage output (page bodies) is ~100x larger and the
    # downstream parse/clean UDFs are CPU-heavy — AQE would coalesce the
    # tiny input shuffle to one partition and serialize the whole fetch+
    # parse pipeline (observed: 32 cores at single-core throughput).
    sp = int(scheduled.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    salt = F.pmod(F.xxhash64("url"), F.lit(64))
    return scheduled.repartition(sp, F.col("host"), salt).mapInPandas(run, schema=schemas.FETCHED)
