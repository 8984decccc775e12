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

    # partition by host: connection reuse + politeness locality; AQE
    # coalesces the small case, salting for hot hosts happens upstream in
    # the scheduler (the per-batch per-host row count is already capped
    # by the politeness budget, so fetch partitions are bounded).
    return scheduled.repartition("host").mapInPandas(run, schema=schemas.FETCHED)
