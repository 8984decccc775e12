"""Archive-search seed enrichment (SURVEY §2.1 S5/S6).

Reference behavior: ``search_archives`` queries the archive.org search API
with boolean keyword/mediatype terms and exponential-backoff retries
(covid_news_spider.py:511-557); a CDX timestamp lookup then resolves each
identifier to its latest wayback snapshot URL (:584-650), and the results
enter the crawl as high-retry-budget seeds (:635-650, retry_times=5).

Spark-first shape: a bounded *seed-enrichment job* — query the (here:
deterministic synthetic) archive API on the driver with the reference's
backoff policy, build a seed DataFrame, canonicalize + skip-filter it, and
merge it into the frontier exactly like ordinary seeds.  The downstream
pipeline is unchanged; on a real deployment the two `_api_*` functions are
the seam where the real archive.org client plugs in.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark import rules, schemas
from crawlspark.functions import urls as U
from crawlspark.operators.scheduler import priority_py

ARCHIVE_RETRY_TIMES = 5  # reference :636
BACKOFF_BASE_S = 1.0  # reference 2**i backoff :543-555


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _api_search(keywords: list[str], country: str, n: int = 20) -> list[str]:
    """Deterministic stand-in for the IA advancedsearch endpoint: returns
    identifier strings derived from the query."""
    out = []
    for i in range(n):
        h = _h(f"{','.join(keywords)}:{country}:{i}")
        out.append(f"ia-{country}-{h % 10**8:08d}")
    return out


def _api_cdx_latest(identifier: str) -> str:
    """Deterministic stand-in for the wayback CDX lookup: latest snapshot
    timestamp for an identifier (reference takes results[-1][1], :613)."""
    h = _h("cdx:" + identifier)
    return f"202{h % 3}{1 + h % 12:02d}{1 + h % 28:02d}000000"


def search_archives(
    keywords: list[str],
    country: str,
    n: int = 20,
    api: Callable[[list[str], str, int], list[str]] | None = None,
    max_retries: int = ARCHIVE_RETRY_TIMES,
    sleep: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Query with exponential-backoff retry (reference :543-555): on
    failure wait 2**attempt seconds, up to ``max_retries`` attempts."""
    fn = api or _api_search
    for attempt in range(max_retries + 1):
        try:
            return fn(keywords, country, n)
        except Exception:  # noqa: BLE001 — retry-any, like the reference
            if attempt == max_retries:
                raise
            sleep(BACKOFF_BASE_S * 2**attempt)
    return []


def archive_seed_frame(
    spark: SparkSession,
    country: str = "singapore",
    n: int = 20,
    batch_id: int = 0,
    api: Callable | None = None,
) -> DataFrame:
    """Search → CDX-resolve → FRONTIER-schema seed rows (retry budget 5).

    Wayback URLs map onto a synthetic archive host so the deterministic
    fetcher can serve them; the frontier rows carry the reference's
    elevated retry budget via not_before/retry semantics (retry_count
    starts 0 but MAX_RETRIES already equals the reference's 5).
    """
    identifiers = search_archives(rules.SEARCH_KEYWORDS, country, n, api=api)
    rows = []
    for ident in identifiers:
        ts = _api_cdx_latest(ident)
        url = f"https://www.cna.example/news/{_h(ident + ts) % 400}-s{_h(ident) % 7}"
        cu = U.fix_url_py(url)
        if U.should_skip_py(cu):
            continue
        rows.append(
            (
                cu, 0, U.host_of_py(cu), 0, priority_py(0, "article", cu),
                batch_id, 0, batch_id, "article", None,
            )
        )
    df = spark.createDataFrame(rows, schemas.FRONTIER)
    return df.withColumn("url_hash", F.xxhash64("url")).dropDuplicates(["url"])
