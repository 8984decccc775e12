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

FetchFn = Callable[[str, int], tuple[int, str, bytes | None, str | None, int]]


def fetch_stage(scheduled: DataFrame, spec: synthetic.WebSpec, fetch_fn: FetchFn | None = None) -> DataFrame:
    """scheduled(FRONTIER) → FETCHED; one fetch per row, batched via Arrow.

    The fetcher works at the TRANSFER level (raw bytes + content-encoding);
    this stage applies the decode middleware (functions.transfer — gzip
    decompress, forgiving fallback, retry on corrupt streams, reference
    middlewares.py:42-61) so downstream stages see decoded text bodies.
    """
    from crawlspark.functions.transfer import decode_body_py

    fn = fetch_fn or (lambda url, attempt: synthetic.fetch_encoded(spec, url, attempt))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = [fn(u, a) for u, a in zip(pdf["url"], pdf["retry_count"])]
            decoded = [decode_body_py(r[2], r[3]) for r in res]
            out = pdf.copy()
            out["status"] = [r[0] for r in res]
            out["final_url"] = [r[1] for r in res]
            out["body"] = [d[0] for d in decoded]
            out["elapsed_ms"] = [r[4] for r in res]
            out["content_encoding"] = [r[3] for r in res]
            out["decode_error"] = [bool(d[1]) for d in decoded]
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
