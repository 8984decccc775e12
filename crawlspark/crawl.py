"""The iterative micro-batch crawl loop (SURVEY.md §2.9, §3).

Replaces the reference's Scrapy engine (callback graph + scheduler +
dupefilter) with a driver loop of pure DataFrame jobs:

    while pending:  read frontier → politeness top-K → fetch → parse
                    → links: canonicalize → skip-filter → Bloom/exact dedup
                    → docs:  clean spans → date/keyword filters
                    → atomic multi-table snapshot commit

Determinism: scheduling order is (priority DESC, url ASC) per host per
batch; all other stages are set-semantics — so the final frontier, seen
set, progress (crawl order at batch granularity) and documents tables are
identical at any parallelism (local[8] ≡ local[32] ≡ N ≡ 4N executors),
which the pytest oracle comparison asserts.
"""

from __future__ import annotations

import os
import threading
import time as _time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from crawlspark import rules, schemas, synthetic
from crawlspark.functions import urls as U
from crawlspark.operators import scheduler
from crawlspark.operators.bloom import BloomBucketStore, BloomState
from crawlspark.operators.pipeline import docs_from_pipe, fetch_parse_stage
from crawlspark.operators.urlseen import (
    bloom_delta,
    probe_unseen,
    probe_unseen_partitioned,
    update_buckets_partitioned,
)
from crawlspark.tables import SnapshotCatalog


@dataclass
class CrawlConfig:
    warehouse: str
    spec: synthetic.WebSpec = field(default_factory=synthetic.WebSpec)
    max_batches: int = 64
    max_depth: int = 64
    bloom_buckets: int = 32
    bloom_bits: int = 1 << 20
    compact_every: int = 8
    keep_snapshots: int = 0  # >0: expire_snapshots(keep_last=N) after compaction
    expected_urls: int | None = None  # auto-size the Bloom for this key count
    budget_override: int | None = None  # tests: force small per-host budgets
    # Bloom state layout: None = auto (partitioned once the configured
    # state exceeds the broadcast cap — the 10^10-key regime); True/False
    # force either path (tests force True to run e2e equality on it)
    bloom_partitioned: bool | None = None
    bloom_broadcast_cap_bytes: int = 256 << 20
    # serve previously-fetched articles from the fetched-cache log instead
    # of refetching (re-crawl mode; see reset_for_recrawl)
    use_fetch_cache: bool = False
    # cache staleness (reference HTTPCACHE_EXPIRATION_SECS, settings.py:85):
    # a cache entry is served only while (current_snap - entry.snap_id) <=
    # max_age; None = serve forever.  Snapshot ids are the global monotone
    # commit clock (per-epoch batch ids reset on recrawl; snapshots don't),
    # and at one commit per batch, N snapshots ≈ N batches of age.
    fetch_cache_max_age_snaps: int | None = None
    # adaptive per-URL cache freshness (operators/freshness.py): serve an
    # article from cache while its adaptive interval — base * 2^streak of
    # unchanged observations, capped — has not elapsed on the snapshot
    # clock.  Overrides the fixed fetch_cache_max_age_snaps window; pages
    # that keep changing refetch at the base interval, pages that never
    # change back off exponentially.  The state is a url-keyed window +
    # aggregate over the fetched log per scheduling batch; at 10^10 URLs
    # materialize it once per epoch (or at compaction) instead — the
    # filter shape is identical.
    fetch_cache_adaptive: bool = False
    adaptive_base_snaps: int = 2
    adaptive_max_doublings: int = 5
    # conditional revalidation of STALE cache entries (the HTTP 304 /
    # RFC 7232 If-None-Match analog, over the fetched log's decoded-body
    # hash): a scheduled article whose cache entry has expired is still
    # fetched — a conditional GET spends a politeness slot like any
    # request — but when the fresh body hash equals the LATEST logged
    # hash the row retires with a terminal 'revalidated' record instead
    # of re-entering the parse stage (no doc/link rows — same downstream
    # contract as 'cached'), and its fetch-log append renews the entry's
    # snap_id so the freshness window (fixed or adaptive) restarts.
    # Requires use_fetch_cache; inert on a first crawl (empty log), when
    # every entry is fresh (served from cache before scheduling), or
    # when the response redirected (a real 304 cannot redirect).
    revalidate_stale: bool = False
    # Bloom capacity auto-guard (partitioned layout): when the worst
    # bucket's theoretical FPR exceeds 10x the design target, the next
    # compaction rebuilds the store at DOUBLE the bucket count from the
    # exact seen set (urlseen — rebuild, because Bloom bits cannot be
    # split).  Rare and exponentially spaced: each doubling halves
    # per-bucket load, so total rebuild work over a crawl's lifetime is
    # O(final seen set), amortized O(1) bits per key.
    bloom_target_fpr: float = 0.01
    bloom_autosplit: bool = True
    # reference SEARCH_ENTIRE_WEBSITE (:34, default 1): True follows every
    # anchor; False = targeted pagination — domains with a next_page_text
    # rule follow only their "Next Page"-style anchor (:751-758), others
    # extract every anchor in both modes
    search_entire_site: bool = True
    # spider-trap admission guard (scheduler.cap_template_explosion): at
    # most N candidate URLs per (host, digit-normalized path template) are
    # admitted to the frontier per batch; None (default) disables the
    # guard and leaves every plan untouched.  The reference's fixed seed
    # lists can't hit traps; an open frontier can, and this bounds any
    # single template's growth to cap x n_batches.  Winners are
    # deterministic (lowest URL), preserving crawl-order equality.
    trap_template_cap: int | None = None
    # global fetch-capacity cap (scheduler.cap_global_batch): at most N
    # pages admitted per batch ACROSS hosts, slots spent highest-yield
    # hosts first (docs-per-fetch from the metrics table; unseen hosts get
    # the optimistic prior so discovery is never starved).  None (default)
    # = politeness budgets alone bound the batch, plans untouched.
    global_batch_cap: int | None = None
    yield_prior_permille: int = 1000
    # anti-starvation aging under the global cap: each batch a row waits
    # adds this much to its effective yield score (0 = pure yield order)
    yield_age_bonus_permille: int = 0
    # sitemap seed discovery: at crawl init (and recrawl reset) each seed
    # host's robots.txt `Sitemap:` directives enqueue the sitemap URLs as
    # high-priority frontier rows; the parse stage turns their <urlset>
    # bodies into article/listing links — reaching ORPHAN pages no listing
    # links to.  Default off: the reference has no sitemap path, and the
    # oracle-equality e2e contract is defined without it.
    use_sitemaps: bool = False
    # RSS/Atom feed intake: listing heads' autodiscovery
    # <link type="application/rss+xml|atom+xml"> tags enqueue the host's
    # feed as a fetch-and-extract frontier row; feed entries become
    # article links carrying feed-declared meta (title + published date,
    # the same fallback chain listing cards provide) — reaching ORPHAN
    # pages no listing links to, fresher than sitemaps on news hosts.
    # Default off: the reference has no feed path, and the oracle-equality
    # e2e contract is defined without it.
    use_feeds: bool = False
    # strip analytics/click-id query params (utm_*, gclid, ...) and sort
    # the survivors on every canonicalized link AND seed, BEFORE the
    # seen-set probe — collapses tracking-param variants of one page into
    # a single frontier key.  Default off: the reference's fix_url chain
    # keeps them, and the oracle-equality contract pins that chain.
    strip_tracking: bool = False
    # honor <meta name="robots"> page directives (noindex: drop the doc,
    # nofollow: drop the page's links).  Default off: the reference's
    # Scrapy stack doesn't honor robots META, and the oracle-equality
    # contract is defined without it.
    obey_meta_robots: bool = False
    # honor per-ANCHOR rel=nofollow/sponsored/ugc on the generic link
    # walk (html_parse.rel_blocked_hrefs): hrefs carried only by
    # rel-blocked anchors never reach the frontier.  Listing cards (the
    # site's curated article surface) are exempt.  Default off: the
    # reference follows every anchor, and the oracle-equality contract
    # pins that.
    obey_link_rel: bool = False
    # key each document by its <link rel="canonical"> href (after the
    # same canonicalize chain links get) instead of the fetch URL, so URL
    # aliases of one article collapse to a single doc_id via the existing
    # in-batch + cross-batch doc_id dedup.  Default off (the reference
    # keys docs by fetch URL).
    use_canonical_link: bool = False
    # AutoThrottle (reference settings scaffold settings.py:71-80, at
    # batch granularity): per-host fetch budget adapts to OBSERVED
    # latency — delay folds toward latency/target_concurrency each batch,
    # clamped between the robots crawl-delay (politeness floor: never
    # faster than robots) and max_delay; budget = period // delay.  First
    # contact is cautious (start_delay), then fast hosts speed up.
    # Ignored while budget_override is set (the test sizing knob wins).
    autothrottle: bool = False
    autothrottle_start_delay_ms: int = 5000
    autothrottle_max_delay_ms: int = 60000
    autothrottle_target_concurrency: int = 1
    # per-host circuit breaker (scheduler.breaker_blocked_hosts): a host
    # whose last N ACTIVE batches produced zero successful fetches stops
    # being scheduled for `cooldown` batches, then re-admits for one probe
    # batch (half-open).  Politeness bounds how fast a host is fetched;
    # this stops a DEAD host (down, walled, partitioned) from burning its
    # politeness-bounded slots every batch.  The only state is the metrics
    # log, so the breaker is resume-safe by construction.  None = off,
    # every plan untouched.
    failure_trip_threshold: int | None = None
    failure_trip_cooldown_batches: int = 4

    def __post_init__(self):
        if self.expected_urls:
            # design math: ~14.4 bits/key ≈ 0.1% FPR at k=7; buckets sized
            # so each blob stays well under an executor's working set
            total_bits = self.expected_urls * 15
            buckets = 32
            while total_bits // buckets > (1 << 26):  # ≤ 8 MB per bucket
                buckets *= 2
            bits = 1 << max(14, (total_bits // buckets).bit_length())
            self.bloom_buckets = buckets
            self.bloom_bits = bits
    # Seed overrides (reference S1: hard-coded lists + manual_scrape.txt
    # file seeds :276-295; TEST_SPECIFIC targeted mode :219-295 = article
    # seeds + max_depth=0):
    seed_urls: list[str] | None = None
    seed_file: str | None = None

    @property
    def use_partitioned_bloom(self) -> bool:
        if self.bloom_partitioned is not None:
            return self.bloom_partitioned
        return self.bloom_buckets * (self.bloom_bits // 8) > self.bloom_broadcast_cap_bytes


def _hosts_frame(hosts_df: DataFrame) -> DataFrame:
    """New-host frame → HOSTS politeness rows (robots.txt fetch+parse per
    host).  The robots acquisition runs EXECUTOR-side via mapInPandas —
    the per-row loop inside the generator IS the fetch work, per-host by
    nature, same justification as the fused fetch stage — so no host list
    is ever collected to the driver and a 10^5+-host seed bootstrap is one
    distributed job (the reference fetches robots once per host on first
    contact; ROBOTSTXT_OBEY settings.py:20)."""

    def gen(batches):
        cols = ["host", "crawl_delay_s", "budget_per_batch",
                "robots_disallow", "robots_allow"]
        for pdf in batches:
            recs = []
            for h in pdf["host"]:
                s = synthetic.robots_for_host(h)
                recs.append(
                    (h, float(s["crawl_delay_s"]), int(s["budget_per_batch"]),
                     list(s["disallow"]), list(s.get("allow") or []))
                )
            yield pd.DataFrame(recs, columns=cols)

    return hosts_df.select("host").distinct().mapInPandas(gen, schema=schemas.HOSTS)


# Batch-invariant Column expressions, built ONCE per SparkContext.
# Driver-side expression construction is py4j-roundtrip-bound (~1-2 ms per
# pyspark.sql.functions call; one outcome-style CASE chain alone costs
# ~17 ms) and totalled ~1 s of EVERY politeness batch (the CRAWLSPARK_PROF
# "dag_build" tick).  Column objects are unresolved expression trees —
# reusable across DataFrames and batches; the cache is keyed by the
# context's applicationId (unique per started context) — id() could be
# reused by CPython for a NEW SparkContext after the old one is collected,
# serving Column trees built under a dead context.
_COLS_CACHE: dict = {}


def _invariant_cols(spark: SparkSession) -> dict:
    key = spark.sparkContext.applicationId
    cached = _COLS_CACHE.get(key)
    if cached is not None:
        return cached
    _COLS_CACHE.clear()
    lhost = U.host_expr(F.col("link"))
    outcome = (
        # corrupt transfer stream (gzip decode failure) retries like a 5xx
        # (reference GzipRetryMiddleware, middlewares.py:36-52)
        F.when(
            (F.col("status") == 200) & F.col("decode_error")
            & (F.col("retry_count") < rules.MAX_RETRIES),
            F.lit("retry"),
        )
        .when((F.col("status") == 200) & F.col("decode_error"), F.lit("failed"))
        # in-worker 304 verdict (cfg.revalidate_stale): a clean 200 whose
        # body hash matched the logged cache entry — terminal, unparsed
        .when(
            (F.col("status") == 200)
            & F.coalesce(F.col("revalidated"), F.lit(False)),
            F.lit("revalidated"),
        )
        .when(F.col("status") == 200, F.lit("done"))
        .when(F.col("status").isin(rules.SKIP_STATUSES), F.lit("skipped"))
        .when(
            F.col("status").isin(rules.RETRYABLE_STATUSES)
            & (F.col("retry_count") < rules.MAX_RETRIES),
            F.lit("retry"),
        )
        .otherwise(F.lit("failed"))
    )
    c = {
        "outcome_aliased": outcome.alias("outcome"),
        "link_skip": U.skip_filter_expr(
            F.col("link"), F.col("link_host"), F.col("link_domain")
        ),
        "cand_winner": F.min_by(
            F.struct("link_host", "depth", "link_kind", "meta"),
            F.struct("src_url", "link"),
        ).alias("w"),
        "priority": scheduler.priority_expr(
            F.col("depth"), F.col("page_kind"), F.col("url")
        ),
        "metrics_aggs": [
            F.count("*").alias("n_scheduled"),
            # 'revalidated' (cfg.revalidate_stale: 304-analog conditional
            # refetch) is a healthy response — it must count as ok for the
            # circuit breaker and autothrottle, exactly like 'done'
            F.sum(F.col("outcome").isin("done", "revalidated").cast("long")).alias("n_ok"),
            F.sum((F.col("outcome") == "retry").cast("long")).alias("n_retry"),
            F.sum((F.col("outcome") == "failed").cast("long")).alias("n_failed"),
            F.sum((F.col("outcome") == "skipped").cast("long")).alias("n_skipped"),
            F.sum("elapsed_ms").alias("sum_elapsed_ms"),
        ],
        "parsed_aggs": [
            F.sum(F.when(F.col("rec") == "link", 1).otherwise(0)).alias("n_links_out"),
            F.sum(F.when(F.col("rec") == "doc", 1).otherwise(0)).alias("n_docs_out"),
        ],
        # ---- cached SELECT LISTS for the per-batch projections ----
        # Each py4j DataFrame/Column call costs ~3-15 ms of driver time
        # (measured); the batch loop's projections totalled ~100+ calls of
        # pure plan construction per batch ("dag_build" tick).  Everything
        # batch-INVARIANT is pre-built here; run_batch only creates the
        # two or three F.lit(batch_id) terms per projection.
        "rec_fetch": F.col("rec") == "fetch",
        "rec_not_fetch": F.col("rec") != "fetch",
        "rec_link": F.col("rec") == "link",
        "rec_doc": F.col("rec") == "doc",
        "is_retry": F.col("outcome") == "retry",
        # fetch-log gate: 'revalidated' rows were genuinely fetched and
        # hashed — logging them is the cache RENEWAL (new snap_id, same
        # hash), which restarts the staleness window and extends the
        # adaptive unchanged-streak
        "is_done": F.col("outcome").isin("done", "revalidated"),
        "fetch_log_pre": [
            F.col("url"), F.xxhash64("url").alias("url_hash"), F.col("status"),
            F.col("content_encoding"), F.col("body_hash"),
        ],
        "progress_pre": [F.col("url"), F.xxhash64("url").alias("url_hash")],
        "progress_post": [
            F.col("status"), F.col("outcome"), F.col("retry_count").alias("attempt"),
        ],
        "retries_pre": [
            F.col("url"), F.xxhash64("url").alias("url_hash"), F.col("host"),
            F.col("depth"), F.col("priority"),
        ],
        "retry_inc": (F.col("retry_count") + 1).alias("retry_count"),
        "retry_backoff_int": F.pow(F.lit(2.0), F.col("retry_count") + 1).cast("int"),
        "link_as_url": F.col("link").alias("url"),
        "cand_sel": [
            F.col("url"),
            F.col("w.link_host").alias("host"),
            (F.col("w.depth") + 1).alias("depth"),
            F.col("w.link_kind").alias("page_kind"),
            F.col("w.meta").alias("meta"),
        ],
        "links_sel": [
            *(F.col(f.name).alias("src_url") if f.name == "url" else F.col(f.name)
              for f in schemas.PARSED.fields),
            lhost.alias("link_host"),
        ],
        "link_domain_aliased": None,  # filled below (references link_host)
        "zero_retry": F.lit(0).alias("retry_count"),
        "metrics_sel": [
            F.col("host"), F.col("n_scheduled"), F.col("n_ok"), F.col("n_retry"),
            F.col("n_failed"), F.col("n_skipped"),
            F.coalesce("n_links_out", F.lit(0)).alias("n_links_out"),
            F.coalesce("n_docs_out", F.lit(0)).alias("n_docs_out"),
            F.col("sum_elapsed_ms"),
        ],
    }
    c["link_domain_aliased"] = U.domain_expr(F.col("link_host")).alias("link_domain")
    c["frontier_pre"] = [
        F.col("url"), F.xxhash64("url").alias("url_hash"), F.col("host"),
        F.col("depth"), c["priority"].alias("priority"),
    ]
    _COLS_CACHE[key] = c
    return c


def _hosts_with_rx(hosts: DataFrame, budget_override: int | None) -> DataFrame:
    """hosts table + precompiled robots regex, computed executor-side via a
    vectorized pandas UDF — no driver collect, so the hosts dimension can
    grow to web scale (it is only ever broadcast into the schedule join)."""

    @F.pandas_udf("string")
    def rx_udf(dis: pd.Series, alw: pd.Series) -> pd.Series:
        return pd.Series(
            [
                scheduler.robots_rx_py(
                    list(d) if d is not None else None,
                    list(a) if a is not None else None,
                )
                for d, a in zip(dis.tolist(), alw.tolist())
            ],
            dtype=object,
        )

    out = hosts.withColumn(
        "robots_rx",
        rx_udf("robots_disallow",
               # pre-round-5 hosts rows lack robots_allow entirely when the
               # table was written before the column existed; the schema
               # read nulls it and the compiler treats null as no overrides
               F.col("robots_allow") if "robots_allow" in hosts.columns
               else F.lit(None).cast("array<string>")),
    )
    if budget_override:
        out = out.withColumn("budget_per_batch", F.lit(int(budget_override)))
    return out


def _seed_row_py(u: str, strip_tracking: bool = False):
    """One raw seed line -> FRONTIER tuple (url_hash placeholder 0), or
    None when the canonicalized URL fails the skip filter.  Shared by the
    driver path (literal seed lists) and the distributed file path so the
    two can never drift."""
    cu = U.fix_url_py(u)
    if strip_tracking:
        cu = U.strip_tracking_params_py(cu)
    if U.should_skip_py(cu):
        return None
    kind, _, _ = synthetic.classify_url(cu)
    kind = U.link_kind_py(kind)  # sitemap/listing preserved, rest article
    host = U.host_of_py(cu)
    return (cu, 0, host, 0, scheduler.priority_py(0, kind, cu), 0, 0, 0, kind, None)


def _seed_file_frame(spark: SparkSession, path: str,
                     strip_tracking: bool = False) -> DataFrame:
    """Distributed seed-file intake (reference manual_scrape.txt,
    :276-295): spark.read.text -> canonicalize/skip/classify inside an
    Arrow-batched mapInPandas.  The reference's file is dozens of lines,
    but the realistic way a 100-TB crawl starts is a 10^6-10^8-URL seed
    dump — nothing here touches the driver, so the path scales with
    executors (the old form collected the file and canonicalized in a
    driver loop)."""
    cols = [f.name for f in schemas.FRONTIER.fields]

    def gen(batches):
        for pdf in batches:
            recs = [r for r in (_seed_row_py(u, strip_tracking) for u in pdf["value"]) if r is not None]
            yield pd.DataFrame(recs, columns=cols)

    return spark.read.text(path).mapInPandas(gen, schema=schemas.FRONTIER)


def _seed_frontier(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    """Seed rows (reference start_requests :560-699): canonicalize, skip-
    filter, dedup; FRONTIER schema with url_hash.  Literal seed lists stay
    on the driver (they are human-sized); seed FILES run distributed."""
    raw_seeds = (
        list(cfg.seed_urls) if cfg.seed_urls is not None else synthetic.seed_urls(cfg.spec)
    )
    seeds = [r for r in (_seed_row_py(u, cfg.strip_tracking) for u in raw_seeds) if r is not None]
    out = spark.createDataFrame(seeds, schemas.FRONTIER)
    if cfg.seed_file:  # manual_scrape.txt analog (reference :276-295)
        out = out.unionByName(
            _seed_file_frame(spark, cfg.seed_file, cfg.strip_tracking))
    if cfg.use_sitemaps:
        # robots-declared sitemap URLs of the seed hosts join the frontier
        # as extra seeds (distinct url wins below dedups a sitemap URL a
        # seed list might also carry explicitly)
        out = out.unionByName(_sitemap_frontier(out, cfg.strip_tracking))
    # cross-source dedup: every FRONTIER field is a deterministic function
    # of the canonical url, so duplicate rows are identical and any winner
    # equals the old first-occurrence driver loop
    return out.dropDuplicates(["url"]).withColumn("url_hash", F.xxhash64("url"))


def _sitemap_frontier(hosts_src: DataFrame,
                      strip_tracking: bool = False) -> DataFrame:
    """Distinct hosts → FRONTIER rows for their robots-declared sitemap
    URLs (sitemaps.org intake at seed time).  The robots fetch+parse runs
    EXECUTOR-side per host — same distributed shape as _hosts_frame, so a
    10^5-host seed set discovers its sitemaps in one job with no host list
    on the driver.  Sitemap rows ride the normal frontier machinery from
    here: politeness-scheduled, robots-filtered, retried, and their
    <urlset> links dedup through the standard seen-set path."""
    cols = [f.name for f in schemas.FRONTIER.fields]

    def gen(batches):
        for pdf in batches:
            recs = []
            for h in pdf["host"]:
                s = synthetic.robots_for_host(h)
                for sm in s.get("sitemaps", []):
                    # _seed_row_py: same canonicalize/skip/classify as every
                    # other seed source — a URL proposed by BOTH a seed list
                    # and robots discovery yields byte-identical rows, so
                    # the cross-source dropDuplicates winner is well-defined
                    r = _seed_row_py(sm, strip_tracking)
                    if r is not None:
                        recs.append(r)
            yield pd.DataFrame(recs, columns=cols)

    return hosts_src.select("host").distinct().mapInPandas(
        gen, schema=schemas.FRONTIER
    )


def _seed_bloom(spark: SparkSession, cfg: CrawlConfig, catalog: SnapshotCatalog,
                seeds_df: DataFrame) -> dict:
    """→ commit kwargs ({'bloom': ...} or {'bloom_store': ...}) for a fresh
    filter seeded with the seed URLs."""
    if cfg.use_partitioned_bloom:
        # never build full state in one place, even at init: the seed bits
        # are written per-bucket by the same grouped-map the loop uses
        seed_store = BloomBucketStore(cfg.bloom_buckets, cfg.bloom_bits, k=7)
        store = update_buckets_partitioned(
            spark, seeds_df, seed_store, catalog.bloom_bucket_dir(0)
        )
        seed_store.release()
        return {"bloom_store": store}
    bloom = BloomState(cfg.bloom_buckets, cfg.bloom_bits)
    bloom.merge(bloom_delta(spark, seeds_df, bloom))
    return {"bloom": bloom}


def init_crawl(spark: SparkSession, cfg: CrawlConfig) -> dict:
    """Seed the frontier (reference start_requests :560-699) and commit
    snapshot 0."""
    catalog = SnapshotCatalog(spark, cfg.warehouse)
    seeds_df = _seed_frontier(spark, cfg)
    seen_df = seeds_df.select("url", "url_hash", F.lit(0).alias("added_batch"))
    hosts_df = _hosts_frame(seeds_df)
    appends = {"frontier": seeds_df, "urlseen": seen_df, "hosts": hosts_df}
    return catalog.commit(0, appends=appends, state={}, **_seed_bloom(spark, cfg, catalog, seeds_df))


def reset_for_recrawl(spark: SparkSession, cfg: CrawlConfig,
                      refresh_robots: bool = True) -> dict:
    """Begin a NEW crawl epoch in an existing warehouse: frontier, urlseen,
    Bloom state and progress are reset to the seeds; documents, metrics
    and the fetched cache are RETAINED — the reference's HTTPCACHE re-run
    semantics (settings.py:84-89: the dupefilter starts fresh, the HTTP
    cache persists).  With cfg.use_fetch_cache=True the re-crawl refetches
    listings (the link-discovery surface) but serves previously-fetched
    articles from the cache log as terminal 'cached' records.

    ``refresh_robots`` (default True, matching the reference: Scrapy
    re-fetches robots.txt every run even when the HTTP cache persists):
    the hosts politeness table is REBUILT by re-fetching robots for every
    known + seed host — one distributed job, no host list on the driver.
    False appends only the genuinely-new seed hosts and keeps stale
    politeness state."""
    catalog = SnapshotCatalog(spark, cfg.warehouse)
    assert catalog.latest() is not None, "reset_for_recrawl needs an existing crawl"
    seeds_df = _seed_frontier(spark, cfg)
    seen_df = seeds_df.select("url", "url_hash", F.lit(0).alias("added_batch"))
    hosts_tbl = catalog.read("hosts")
    replace = {
        "frontier": seeds_df,
        "urlseen": seen_df,
        "progress": catalog._empty("progress"),
    }
    appends = {}
    if refresh_robots:
        all_hosts = hosts_tbl.select("host").unionByName(
            seeds_df.select("host")
        ).distinct()
        replace["hosts"] = _hosts_frame(all_hosts)
    else:
        new_hosts_df = seeds_df.select("host").distinct().join(
            hosts_tbl.select("host"), on="host", how="left_anti"
        )
        # once-per-epoch path: always append (commit tolerates a 0-row
        # file); no host names cross the driver
        appends = {"hosts": _hosts_frame(new_hosts_df)}
    return catalog.commit(
        0,
        appends=appends,
        replace=replace,
        # clear BOTH bloom layouts from the carried-over state; the kwarg
        # below re-sets whichever layout this epoch uses (run_batch picks
        # the layout from the manifest, so a stale path would be wrong)
        state={"bloom_path": None, "bloom_store_path": None},
        **_seed_bloom(spark, cfg, catalog, seeds_df),
    )


def _bloom_lineage(bloom: BloomState) -> dict:
    """Per-snapshot Bloom health lineage: key count + worst-bucket FPR —
    visible in every manifest so capacity drift is observable."""
    return {
        "bloom_keys": int(bloom.n_items.sum()),
        "bloom_fpr_estimate": round(bloom.fpr_estimate(), 8),
    }


def _pending(catalog: SnapshotCatalog, manifest: dict) -> DataFrame:
    """MERGE-style pending set: a frontier row is pending until a progress
    row exists for the same (url, attempt).

    Manifest-level pruning: the compacted frontier base (the replace file
    at snapshot S) already excludes everything fetched through S — only
    progress DELTAS committed after S can retire current frontier rows, so
    the anti-join's right side is those delta files, not the full
    append-only log (which grows with total fetches ever: 10^10-scale).
    """
    fpaths = manifest.get("tables", {}).get("frontier", [])
    ppaths = manifest.get("tables", {}).get("progress", [])
    base_snap = min((catalog.snap_of(p) for p in fpaths), default=0)
    recent = [p for p in ppaths if catalog.snap_of(p) > base_snap]
    frontier = catalog.read("frontier", manifest)
    progress = catalog.read_files("progress", recent)
    return frontier.join(
        progress.select("url", F.col("attempt").alias("retry_count")).distinct(),
        on=["url", "retry_count"],
        how="left_anti",
    )


def run_batch(spark: SparkSession, catalog: SnapshotCatalog, cfg: CrawlConfig, manifest: dict,
              known_hosts: set | None = None, sched_hint: int | None = None,
              loop_stats: dict | None = None) -> dict | None:
    """One micro-batch; returns the new manifest, or None when finished.

    ``known_hosts``: optional driver-side cache of host names verified
    present in the hosts table (run_crawl threads one across its batches).
    The per-batch "any genuinely-new hosts?" membership check is a whole
    Spark job (~0.5-1s of a politeness batch's fixed cost); with the cache,
    steady-state batches — whose accepted links revisit known hosts — skip
    it entirely.  Only host NAMES the driver already saw (via the state
    piggyback) are cached, never robots state, and the cache is an
    optimization only: a cold/absent cache falls back to the anti-join.

    ``sched_hint``: the PREVIOUS batch's scheduled-row count (run_crawl
    threads it via ``loop_stats``).  With a positive hint, the batch skips
    the dedicated schedule-count job — one whole Spark action (~0.6-0.9 s)
    per steady-state batch — and instead observes the true count on the
    state-update job (an Observation on the scheduled plan).  The hint is
    used only for SIZING (pipeline partitions, the Bloom small-batch
    collect cap — both self-correcting: a low hint only means a fallback
    to the distributed delta path); every correctness decision (the
    zero-batch branch, file sizing) uses the observed true count.  A None
    or non-positive hint falls back to the counted path, so the first
    batch of a run and all external callers keep the old behavior.

    Set CRAWLSPARK_PROF=1 to print a per-batch wall-time breakdown of the
    batch's Spark ACTIONS (schedule-count, pipeline materialization, state
    update, commit) — the politeness-bound loop's fixed cost is job count
    × fixed job overhead, so this is the first thing to look at when a
    batch is slower than its page count explains."""
    prof: dict | None = {} if os.environ.get("CRAWLSPARK_PROF") else None

    def _tick(tag: str, t0: float) -> None:
        if prof is not None:
            prof[tag] = prof.get(tag, 0.0) + (_time.time() - t0)

    batch_id = manifest["batch_id"] + 1
    _t = _time.time()
    # Bloom layout follows the manifest (resume-safe across config edits):
    # a bloom_store_path means the partitioned per-bucket layout
    store = catalog.load_bloom_store(manifest)
    bloom = None if store is not None else catalog.load_bloom(manifest)
    probe_store = store  # pre-update version: its manifest broadcast is
    # shared by this batch's probe + update jobs and released post-commit

    pending = _pending(catalog, manifest)
    hosts_tbl = catalog.read("hosts", manifest)
    hosts_df = _hosts_with_rx(hosts_tbl, cfg.budget_override)
    if cfg.autothrottle and cfg.budget_override is None:
        hosts_df = scheduler.apply_autothrottle(
            hosts_df, catalog.read("metrics", manifest),
            start_delay_ms=cfg.autothrottle_start_delay_ms,
            max_delay_ms=cfg.autothrottle_max_delay_ms,
            target_concurrency=cfg.autothrottle_target_concurrency,
            period_ms=int(rules.BATCH_PERIOD_S * 1000),
        )
    trip_hosts = None
    if cfg.failure_trip_threshold is not None:
        # circuit breaker: zero the budget of hosts whose breaker is open
        # (their pending rows stay in the frontier and re-admit when the
        # cooldown passes).  Applied AFTER autothrottle and regardless of
        # budget_override: a dead host's budget is 0 under every policy.
        trip_hosts = scheduler.breaker_blocked_hosts(
            catalog.read("metrics", manifest), batch_id=batch_id,
            threshold=cfg.failure_trip_threshold,
            cooldown=cfg.failure_trip_cooldown_batches,
        ).persist()
        hosts_df = scheduler.apply_circuit_breaker(hosts_df, trip_hosts)
    scheduled, robots_blocked = scheduler.schedule(
        pending, hosts_df, batch_id, return_blocked=True
    )
    if cfg.global_batch_cap is not None:
        # fleet fetch capacity: admit the top-cap rows by historical host
        # yield (cache-served rows count against the cap too — admission
        # happens before the cache split so the admitted set is a pure
        # function of frontier + metrics state, not of cache contents)
        scheduled = scheduler.cap_global_batch(
            scheduled,
            scheduler.host_yield_scores(
                catalog.read("metrics", manifest), cfg.yield_prior_permille
            ),
            cfg.global_batch_cap, cfg.yield_prior_permille,
            age_bonus_permille=cfg.yield_age_bonus_permille,
            batch_id=batch_id,
        )
    # fetched-cache skip (reference HTTPCACHE re-run semantics, settings.py
    # :84-89): in a re-crawl epoch, ARTICLE pages already in the fetched
    # log are served from cache — retired with a terminal 'cached' record
    # instead of refetched.  Listings are always refetched (they are the
    # link-discovery surface; a refresh crawl must see new articles).
    cached_progress = None
    fetched_all = None  # full (unwindowed) log, kept for revalidate_stale
    if cfg.use_fetch_cache:
        fetched_tbl = catalog.read("fetched", manifest)
        fetched_all = fetched_tbl
        if cfg.fetch_cache_adaptive:
            # per-URL adaptive freshness: serve while the change-history
            # interval has not elapsed (operators/freshness.py).  The
            # coalesce mirrors the fixed-window branch: legacy null
            # snap_ids read as oldest-possible so they come due first.
            from crawlspark.operators.freshness import freshness_state

            cur_snap = manifest["snapshot_id"] + 1
            hist = fetched_tbl.select(
                "url",
                F.coalesce(F.col("snap_id"), F.lit(0)).cast("long")
                .alias("snap_id"),
                F.coalesce(F.col("body_hash"), F.lit("")).alias("body_hash"),
            )
            state = freshness_state(
                hist, base_snaps=cfg.adaptive_base_snaps,
                max_doublings=cfg.adaptive_max_doublings,
            )
            fetched_cache = state.filter(
                F.col("next_due_snap") > F.lit(cur_snap)
            ).select("url")
        elif cfg.fetch_cache_max_age_snaps is not None:
            # refresh-if-older-than-N: keep only entries whose write commit
            # is within the age window; a url with ANY fresh row is served
            # (row-level filter before distinct ≡ max(snap_id) per url)
            cur_snap = manifest["snapshot_id"] + 1
            # coalesce(snap_id, 0): pre-snap_id warehouses read null here —
            # treat them as oldest-possible (expire under any window; one
            # refetch beats serving an unboundedly stale page) rather than
            # NULL-failing the comparison in a schema-contradicting way
            fetched_tbl = fetched_tbl.filter(
                F.coalesce(F.col("snap_id"), F.lit(0))
                >= cur_snap - cfg.fetch_cache_max_age_snaps
            )
            fetched_cache = fetched_tbl.select("url").distinct()
        else:
            fetched_cache = fetched_tbl.select("url").distinct()
        cached_progress = (
            scheduled.filter(F.col("page_kind") == "article")
            .join(fetched_cache, on="url", how="left_semi")
            .select(
                "url", F.xxhash64("url").alias("url_hash"),
                F.lit(batch_id).alias("batch_id"), F.lit(200).alias("status"),
                F.lit("cached").alias("outcome"),
                F.col("retry_count").alias("attempt"),
            )
        )
        scheduled = scheduled.join(
            cached_progress.select("url"), on="url", how="left_anti"
        )
    _tick("setup", _t)  # state load + lazy plan building up to here
    # deferred-count mode: a positive hint skips the dedicated count
    # action; the true count is observed on the progress WRITE at commit
    # (the one action guaranteed to scan every scheduled row exactly once
    # — the state job's small-batch path is a LIMIT collect, which scans
    # partially and would under-observe).  Compaction batches re-read
    # progress_new in a second plan, which would double-execute the
    # observed subtree, so they use the counted path.
    is_compact = bool(cfg.compact_every) and batch_id % cfg.compact_every == 0
    deferred = sched_hint is not None and sched_hint > 0 and not is_compact
    scheduled = scheduled.persist()
    # conditional-revalidation lookup (cfg.revalidate_stale): the latest
    # logged body hash for each STALE scheduled article (anything fresh
    # was already served as 'cached' above, so what remains of the
    # article rows ∩ the log is exactly the expired set).  Batch-bounded
    # via the same broadcast-scan inversion as the urlseen/doc checks —
    # the log is scanned once against the broadcast batch, never
    # shuffled.  The hashes ride INTO the fused fetch/parse stage as an
    # optional cached_hash column, where the worker compares them to the
    # fresh body hash BEFORE parsing — an unchanged page skips the parse
    # itself, which is the work a real 304 saves.
    revalid_hashes = None
    if cfg.revalidate_stale and fetched_all is not None:
        stale_arts = scheduled.filter(
            F.col("page_kind") == "article"
        ).select("url")
        revalid_hashes = (
            fetched_all.join(F.broadcast(stale_arts), on="url", how="left_semi")
            .groupBy("url")
            .agg(F.max(F.struct(
                F.coalesce(F.col("snap_id"), F.lit(0)).alias("snap_id"),
                F.col("body_hash"),
            )).alias("m"))
            .select("url", F.col("m.body_hash").alias("cached_hash"))
        )
    _t = _time.time()
    # retire robots-disallowed rows (and cache hits) with a terminal
    # progress record so they leave the pending set instead of being
    # re-scanned every batch
    blocked_progress = robots_blocked.select(
        "url", F.xxhash64("url").alias("url_hash"), F.lit(batch_id).alias("batch_id"),
        F.lit(0).alias("status"), F.lit("robots_blocked").alias("outcome"),
        F.col("retry_count").alias("attempt"),
    )
    if cached_progress is not None:
        blocked_progress = blocked_progress.unionByName(cached_progress)
    blocked_progress = blocked_progress.persist()

    def _zero_batch(extra_unpersist: tuple = ()) -> dict | None:
        # rare branch: only here is the blocked count needed (the common
        # path unions blocked rows into the progress append unconditionally
        # — counting them every batch was one whole Spark job per batch)
        n_blocked = blocked_progress.count()
        scheduled.unpersist()
        for df in extra_unpersist:
            df.unpersist()
        if bloom is not None:
            bloom.release()
        if probe_store is not None:
            probe_store.release()
        if n_blocked > 0:
            m = catalog.commit(
                batch_id, appends={"progress": blocked_progress.coalesce(1)},
            )
            blocked_progress.unpersist()
            if trip_hosts is not None:
                trip_hosts.unpersist()
            return m
        blocked_progress.unpersist()
        # nothing eligible now; if anything is backoff-gated — or held
        # back only by an open circuit breaker whose cooldown will pass —
        # skip forward instead of finishing
        n_future = pending.filter(F.col("not_before_batch") > batch_id).count()
        if n_future == 0 and trip_hosts is not None:
            n_future = (
                pending.filter(F.col("not_before_batch") <= batch_id)
                .join(trip_hosts, on="host", how="left_semi").count()
            )
        if trip_hosts is not None:
            trip_hosts.unpersist()
        if n_future == 0:
            return None
        return catalog.commit(batch_id, appends={})

    if not deferred:
        n_sched = scheduled.count()
        _tick("schedule_count", _t)
        if loop_stats is not None:
            loop_stats["n_sched"] = n_sched
        if n_sched == 0:
            return _zero_batch()
    else:
        n_sched = sched_hint  # sizing estimate; true count observed at commit

    # fused fetch→parse→clean: one Python stage, bodies never cross Arrow;
    # partition count sized to the batch (~100 pages/partition) so small
    # politeness batches don't pay a full worker-pool spin-up
    sched_in = scheduled
    if revalid_hashes is not None:
        # optional cached_hash column for the in-worker 304 check; left
        # join so non-candidates carry null and behave exactly as before
        sched_in = scheduled.join(
            F.broadcast(revalid_hashes), on="url", how="left"
        )
    pipe = fetch_parse_stage(
        sched_in, cfg.spec, num_partitions=max(1, (n_sched + 99) // 100),
        entire_site=cfg.search_entire_site, strip_tracking=cfg.strip_tracking,
        obey_meta_robots=cfg.obey_meta_robots,
        use_canonical_link=cfg.use_canonical_link,
        use_feeds=cfg.use_feeds,
        obey_link_rel=cfg.obey_link_rel,
    ).persist()
    _t = _time.time()
    if n_sched > 1000:
        # eager: downstream jobs (probe branches, writes) must all read the
        # cache — recomputing the fused stage is a wide batch's main cost;
        # for tiny politeness batches the extra job isn't worth it (measured
        # ~0.3-1.0 s/batch for the count PLUS ~0.7-1.0 s/batch of slower
        # plan construction once the cache is materialized).
        #
        # Concurrency note: the commit below overlaps the engine-state job
        # with the table writes, so for small (lazy) batches two jobs can
        # race the first materialization of this persist() and compute a
        # partition twice.  That is correctness-neutral HERE because
        # run_batch's fetcher is always the deterministic synthetic
        # transfer (fetch_parse_stage is called without fetch_fn); if a
        # real side-effecting fetch_fn is ever wired into this loop, this
        # materialization must become unconditional to keep the
        # single-fetch guarantee.
        pipe.count()
    _tick("pipe_count", _t)
    cols = _invariant_cols(spark)
    # all projections below select CACHED batch-invariant Column lists —
    # only the F.lit(batch_id) terms are built per batch (see the
    # _invariant_cols select-list comment; "dag_build" was ~1 s/batch of
    # pure py4j plan construction before the lists were cached)
    bid = F.lit(batch_id)
    fetched_o = pipe.filter(cols["rec_fetch"]).select("*", cols["outcome_aliased"])
    parsed = pipe.filter(cols["rec_not_fetch"])

    # ---- links path (the only plans the STATE job consumes) ----
    links = parsed.filter(cols["rec_link"]).select(*cols["links_sel"])
    links = links.select("*", cols["link_domain_aliased"])
    links = links.filter(~cols["link_skip"]).filter(
        F.col("depth") + 1 <= cfg.max_depth
    )
    # in-batch dedup with deterministic meta winner (min source url)
    cand = links.groupBy(cols["link_as_url"]).agg(
        cols["cand_winner"]
    ).select(*cols["cand_sel"])
    # small_positives: a batch's Bloom-positive sliver is bounded by its
    # extracted links, so the exact check broadcast-SCANS urlseen instead
    # of shuffling it (at 10^10 seen rows the shuffle, not the sliver, is
    # what would dominate every micro-batch)
    urlseen_all = catalog.read("urlseen", manifest)
    if store is not None:
        new_links = probe_unseen_partitioned(
            spark, cand, urlseen_all, store, small_positives=True
        )
    else:
        new_links = probe_unseen(spark, cand, urlseen_all, bloom, small_positives=True)
    if cfg.trap_template_cap is not None:
        # cap AFTER the seen-set filter: slots go only to genuinely-new
        # URLs (a re-linked already-seen sibling would otherwise win a
        # slot and then vanish in the dedup — permanently starving the
        # new URL it displaced instead of bounding the template linearly)
        new_links = scheduler.cap_template_explosion(
            new_links, cfg.trap_template_cap
        )
    new_frontier = new_links.select(
        *cols["frontier_pre"],
        bid.alias("discovered_batch"),
        cols["zero_retry"],
        F.lit(batch_id + 1).alias("not_before_batch"),
        "page_kind",
        "meta",
    ).persist()
    _tick("dag_build", _t)  # lazy-plan construction since the last action

    # ---- commit-time plans (progress / retries / docs / metrics), built
    # CONCURRENTLY with the state-update job below.  None of these feed
    # the state job — they are consumed only at commit — and plan
    # construction is py4j-roundtrip-bound (~0.2-0.3 s of pure driver
    # time per batch), while state_update blocks the main thread in a JVM
    # job for ~1-1.5 s with the GIL released.  The helper thread only
    # BUILDS lazy plans (analysis-time catalog/py4j calls, both
    # thread-safe); every Spark ACTION stays on the main thread.
    commit_plans: dict = {}
    commit_errs: list = []

    def _build_commit_plans() -> None:
        t0 = _time.time()
        try:
            progress_new = fetched_o.select(
                *cols["progress_pre"], bid.alias("batch_id"), *cols["progress_post"]
            ).unionByName(blocked_progress)
            # retry re-entry with exponential backoff (reference :543-555, :636)
            retries = fetched_o.filter(cols["is_retry"]).select(
                *cols["retries_pre"],
                bid.alias("discovered_batch"),
                cols["retry_inc"],
                (bid + cols["retry_backoff_int"]).alias("not_before_batch"),
                "page_kind", "meta",
            )
            # docs path: same broadcast-scan inversion as the urlseen exact
            # check — the batch's doc ids are bounded, the documents table
            # grows with the crawl, so scan it against the broadcast batch
            # ids instead of shuffling it
            docs_new = docs_from_pipe(parsed.filter(cols["rec_doc"]), batch_id)
            existing_docs = catalog.read("documents", manifest)
            doc_hits = existing_docs.select("doc_id").join(
                F.broadcast(docs_new.select("doc_id").distinct()),
                on="doc_id", how="left_semi",
            )
            docs_new = docs_new.join(
                F.broadcast(doc_hits), on="doc_id", how="left_anti"
            )
            # metrics (per batch × host lineage; SURVEY §2.4 A2)
            parsed_counts = parsed.groupBy("host").agg(*cols["parsed_aggs"])
            metrics = (
                fetched_o.groupBy("host")
                .agg(*cols["metrics_aggs"])
                .join(parsed_counts, on="host", how="left")
                .select(bid.alias("batch_id"), *cols["metrics_sel"])
            )
            commit_plans.update(
                progress_new=progress_new, retries=retries,
                docs_new=docs_new, metrics=metrics,
            )
        except BaseException as e:  # surfaced on the main thread post-join
            commit_errs.append(e)
        finally:
            _tick("dag_commit_async", t0)

    # CRAWLSPARK_SYNC_PLANS=1 builds the commit plans synchronously —
    # the A/B lever for measuring the overlap (and an escape hatch)
    if os.environ.get("CRAWLSPARK_SYNC_PLANS"):
        _build_commit_plans()
        plan_thread = None
    else:
        plan_thread = threading.Thread(target=_build_commit_plans, daemon=True)
        plan_thread.start()

    # ---- state updates (tiny driver-side collects: host names + either
    # bucket summaries (partitioned) or delta blobs (broadcast), all
    # piggybacked on one job — blob BYTES never reach the driver in
    # partitioned mode).  Wrapped as a closure so the steady-state path
    # can run it CONCURRENTLY with the commit's delta writes (guide §2.6:
    # independent jobs submitted together back-fill idle cores — the
    # state job and the table writes share only the persisted new_frontier
    # cache, and the sole state→commit dependency is the rare new-hosts
    # append, which commit() writes after the closure returns and before
    # the manifest swap).  Compaction batches — whose capacity auto-guard
    # reads the UPDATED store — call it inline, preserving the old order.
    state_res: dict = {}

    def _run_state() -> dict:
        nonlocal store
        t0 = _time.time()
        if store is not None:
            store, new_hosts = update_buckets_partitioned(
                spark, new_frontier, store, catalog.bloom_bucket_dir(batch_id),
                collect_hosts=True,
            )
            lineage = {"bloom_keys": store.bloom_keys(),
                       "bloom_fpr_estimate": round(store.fpr_estimate(), 8)}
        else:
            # politeness-sized batches skip the shuffle job: accepted rows
            # are bounded by n_sched × links-per-page (~64 is generous for
            # news listings; overshooting only costs the driver a few MB,
            # never correctness — same hashes, same numpy kernel either way)
            delta, new_hosts = bloom_delta(
                spark, new_frontier, bloom, collect_hosts=True,
                small_batch_rows=n_sched * 64,
            )
            bloom.merge(delta)
            lineage = _bloom_lineage(bloom)
        # robots fetch only for genuinely-new hosts (tiny per-batch set);
        # the known-hosts cache skips the membership JOB outright when
        # every accepted host was already verified present earlier
        unknown_hosts: list[str] = []
        if new_hosts:
            cand = set(new_hosts) if known_hosts is None else set(new_hosts) - known_hosts
            if cand:
                cand_hosts = spark.createDataFrame(
                    [(h,) for h in sorted(cand)], "host string"
                )
                unknown_hosts = [
                    r["host"]
                    for r in cand_hosts.join(
                        hosts_tbl.select("host"), on="host", how="left_anti"
                    ).collect()
                ]
        extra: dict = {}
        if unknown_hosts:
            # only spend a write job on the hosts table when the batch
            # actually discovered new hosts (each per-table write is a full
            # Spark job — empty writes were ~1 wasted job per batch); only
            # the tiny name list touches the driver (it already did, via
            # the state piggyback) — the robots fetch+parse runs distributed
            extra["hosts"] = _hosts_frame(
                spark.createDataFrame(
                    [(h,) for h in sorted(unknown_hosts)], "host string"
                )
            ).coalesce(1)
        state_res.update(new_hosts=new_hosts, lineage=lineage)
        _tick("state_update", t0)
        return {"bloom": bloom, "bloom_store": store, "state": lineage,
                "appends": extra}

    if plan_thread is not None:
        plan_thread.join()
    if commit_errs:
        raise commit_errs[0]
    progress_new = commit_plans["progress_new"]
    retries = commit_plans["retries"]
    docs_new = commit_plans["docs_new"]
    metrics = commit_plans["metrics"]
    sched_obs = None
    if deferred:
        # observe the true scheduled count on the progress write: every
        # scheduled row lands exactly one progress record (fetched_o),
        # blocked/cached rows are excluded by outcome
        sched_obs = Observation(f"sched_{batch_id}")
        progress_new = progress_new.observe(
            sched_obs,
            F.sum(
                (~F.col("outcome").isin("robots_blocked", "cached")).cast("long")
            ).alias("n"),
            F.count(F.lit(1)).alias("n_all"),
        )
    _t = _time.time()

    # batch-sized appends: coalesce to a file count proportional to the
    # batch so a small politeness batch writes 1 file per table, not
    # shuffle-partitions-many KB-sized files (read cost of later batches
    # scales with file count)
    k_files = max(1, n_sched // 2000)
    frontier_append = retries.unionByName(new_frontier).coalesce(k_files)
    new_seen = new_frontier.select(
        "url", "url_hash", bid.alias("added_batch")
    ).coalesce(k_files)
    # per-fetch cache log (S9): url + transfer encoding + decoded-body hash
    fetch_log = fetched_o.filter(cols["is_done"]).select(
        *cols["fetch_log_pre"], bid.alias("batch_id"),
        # this batch's commit will be snapshot prev+1 — the entry's global
        # write-time clock for cache staleness
        F.lit(manifest["snapshot_id"] + 1).alias("snap_id"),
    )
    appends = {
        "frontier": frontier_append,
        "urlseen": new_seen,
        "progress": progress_new.coalesce(k_files),
        "documents": docs_new.coalesce(k_files),
        "metrics": metrics.coalesce(1),
        "fetched": fetch_log.coalesce(k_files),
    }
    _tick("dag_appends", _t)
    _t = _time.time()
    if cfg.compact_every and batch_id % cfg.compact_every == 0:
        # sequential state update: the auto-guard below reads the UPDATED
        # store, and the merged hosts append must join this commit
        sres = _run_state()
        lineage = sres["state"]
        appends.update(sres["appends"])
        # ---- Bloom capacity auto-guard (partitioned layout) ----
        # Lineage records bloom_keys/FPR every commit; here we ACT on it:
        # past 10x the target FPR, rebuild at double the bucket count from
        # the exact seen set (urlseen + this batch's accepted rows — bits
        # cannot be split, but the exact set can always re-derive them).
        # One distributed groupBy(bucket).applyInPandas job, same kernel as
        # the steady-state update; old blob files stay referenced by old
        # snapshots (isolation) and are swept at expiry.
        if (store is not None and cfg.bloom_autosplit
                and store.fpr_estimate() > 10 * cfg.bloom_target_fpr):
            all_seen = catalog.read("urlseen", manifest).select("url").unionByName(
                new_seen.select("url")
            )
            fresh = BloomBucketStore(store.n_buckets * 2, store.m, store.k)
            store.release()
            store = update_buckets_partitioned(
                spark, all_seen, fresh, catalog.bloom_bucket_dir(batch_id)
            )
            fresh.release()  # the rebuild job's empty-manifest broadcast
            lineage = {**lineage, "bloom_resplit_to": store.n_buckets,
                       "bloom_keys": store.bloom_keys(),
                       "bloom_fpr_estimate": round(store.fpr_estimate(), 8)}
        # compaction: rewrite pending-after-this-batch as the new frontier
        # base so the per-batch frontier read stays flat as the crawl
        # grows.  progress and urlseen stay append-only: urlseen IS the
        # exact dedup set (its anti-join probe side is only Bloom
        # positives) and progress is the crawl-order/lineage audit — the
        # pending anti-join reads just its (url, attempt) columns, which
        # parquet column pruning keeps cheap.
        frontier_all = catalog.read("frontier", manifest)
        full_frontier = frontier_all.unionByName(frontier_append)
        # same manifest-level pruning as _pending: the previous base
        # already excludes progress up to its snapshot
        fpaths = manifest.get("tables", {}).get("frontier", [])
        base_prev = min((catalog.snap_of(p) for p in fpaths), default=0)
        recent_prev = [
            p for p in manifest.get("tables", {}).get("progress", [])
            if catalog.snap_of(p) > base_prev
        ]
        full_progress = catalog.read_files("progress", recent_prev).unionByName(progress_new)
        pending_after = full_frontier.join(
            full_progress.select("url", F.col("attempt").alias("retry_count")).distinct(),
            on=["url", "retry_count"],
            how="left_anti",
        )
        compact_appends = {k: v for k, v in appends.items() if k != "frontier"}
        # tiered small-file merge for the append-only logs: fold the delta
        # files accumulated since the last merge into one file per table —
        # per-batch read cost then scales with compaction count, not batch
        # count (merge input is bounded by the inter-compaction window)
        rewrite = {}
        merged_th = manifest["state"].get("merged_through_snap", 0)
        for tbl in ("urlseen", "progress", "fetched", "metrics", "hosts"):
            deltas = [
                p for p in manifest.get("tables", {}).get(tbl, [])
                if catalog.snap_of(p) > merged_th
            ]
            if len(deltas) >= 2:
                rewrite[tbl] = (deltas, catalog.read_files(tbl, deltas).coalesce(1))
        # the new commit's snapshot id = prev + 1; recording THAT id keeps
        # the merged output (written at the new snap) out of future merges,
        # so each merge's input is only the inter-compaction delta window
        lineage = {**lineage, "merged_through_snap": manifest["snapshot_id"] + 1}
        new_manifest = catalog.commit(
            batch_id,
            appends=compact_appends,
            replace={"frontier": pending_after},
            rewrite=rewrite,
            bloom=bloom,
            bloom_store=store,
            state=lineage,
        )
        if cfg.keep_snapshots:
            catalog.expire_snapshots(keep_last=cfg.keep_snapshots)
        _tick("commit_compact", _t)
    else:
        # steady-state commit: the engine-state job runs on this thread
        # INSIDE commit, overlapped with the pooled table-delta writes
        new_manifest = catalog.commit(
            batch_id, appends=appends, state_fn=_run_state,
        )
        _tick("commit", _t)
    n_all = None
    if sched_obs is not None:
        # deferred-count mode: the progress write has run, the observation
        # carries the true scheduled count (and the total incl. blocked)
        row = sched_obs.get
        n_sched = int(row["n"] or 0)
        n_all = int(row["n_all"] or 0)
        if loop_stats is not None:
            loop_stats["n_sched"] = n_sched
    if prof is not None:
        print(f"[prof] batch {batch_id} n_sched={n_sched}: "
              + ", ".join(f"{k}={v:.2f}s" for k, v in prof.items()))
    for df in (scheduled, pipe, new_frontier, blocked_progress):
        df.unpersist()
    if trip_hosts is not None:
        trip_hosts.unpersist()
    if bloom is not None:
        bloom.release()  # free the batch's Bloom broadcast (state committed)
    if probe_store is not None:
        probe_store.release()  # free the batch's manifest broadcast
    # cache update only AFTER the commit succeeded: if commit raises and a
    # custom driver loop retries run_batch, the cache must not claim hosts
    # whose robots rows were never written
    new_hosts = state_res.get("new_hosts")
    if new_hosts and known_hosts is not None and len(known_hosts) < 2_000_000:
        # names only (~60 B/host): 10^6 hosts ≈ 60 MB of driver memory,
        # capped — past the cap we just fall back to the per-batch join
        known_hosts.update(new_hosts)
    if sched_obs is not None and n_sched == 0 and n_all == 0:
        # the hint over-promised: this batch scheduled AND retired nothing
        # (the commit above appended only empty deltas).  Same terminal
        # decision as the counted zero branch: stop unless something is
        # still backoff-gated or held only by an open circuit breaker.
        n_future = pending.filter(F.col("not_before_batch") > batch_id).count()
        if n_future == 0 and trip_hosts is not None:
            n_future = (
                pending.filter(F.col("not_before_batch") <= batch_id)
                .join(trip_hosts, on="host", how="left_semi").count()
            )
        if n_future == 0:
            return None
    return new_manifest


def enrich_frontier(spark: SparkSession, cfg: CrawlConfig, extra_seeds) -> dict:
    """Merge extra seed rows (FRONTIER schema, e.g. from
    sources.archive.archive_seed_frame) into an existing crawl warehouse:
    dedup against urlseen (Bloom + exact), append, update Bloom —
    the reference's archive.org entry point (SURVEY §3 entry 2)."""
    catalog = SnapshotCatalog(spark, cfg.warehouse)
    manifest = catalog.latest()
    if manifest is None:
        manifest = init_crawl(spark, cfg)
    store = catalog.load_bloom_store(manifest)
    bloom = None if store is not None else catalog.load_bloom(manifest)
    probe_store = store
    batch_id = manifest["batch_id"]
    urlseen_all = catalog.read("urlseen", manifest)
    seeds = extra_seeds.dropDuplicates(["url"])
    if store is not None:
        new = probe_unseen_partitioned(spark, seeds, urlseen_all, store).persist()
        store, new_hosts = update_buckets_partitioned(
            spark, new, store, catalog.bloom_bucket_dir(batch_id), collect_hosts=True
        )
    else:
        new = probe_unseen(spark, seeds, urlseen_all, bloom).persist()
        delta, new_hosts = bloom_delta(spark, new, bloom, collect_hosts=True)
        bloom.merge(delta)
    hosts_tbl = catalog.read("hosts", manifest)
    hosts_append = catalog._empty("hosts")
    if new_hosts:
        cand_hosts = spark.createDataFrame([(h,) for h in sorted(new_hosts)], "host string")
        unknown = [
            r["host"]
            for r in cand_hosts.join(hosts_tbl.select("host"), on="host", how="left_anti").collect()
        ]
        if unknown:
            hosts_append = _hosts_frame(
                spark.createDataFrame([(h,) for h in sorted(unknown)], "host string")
            )
    out = catalog.commit(
        batch_id,
        appends={
            "frontier": new.coalesce(1),
            "urlseen": new.select(
                "url", "url_hash", F.lit(batch_id).alias("added_batch")
            ).coalesce(1),
            "hosts": hosts_append.coalesce(1),
        },
        bloom=bloom,
        bloom_store=store,
    )
    new.unpersist()
    if bloom is not None:
        bloom.release()
    if probe_store is not None:
        probe_store.release()
    return out


def run_crawl(spark: SparkSession, cfg: CrawlConfig, resume: bool = False,
              resume_from_snapshot: int | None = None) -> dict:
    """Run to completion (or max_batches); returns a summary dict.

    ``resume_from_snapshot``: time-travel resume — roll the warehouse
    back to that retained snapshot (catalog.rollback) and continue from
    exactly the state committed there, abandoning any later snapshots
    (they stay readable until expire_snapshots).  The engine is
    deterministic, so rollback(S) + resume replays batches S+1… to the
    same final state a straight run produced — the operational lever for
    'a bad config/rule shipped at batch k; rewind and re-run'."""
    catalog = SnapshotCatalog(spark, cfg.warehouse)
    if resume_from_snapshot is not None:
        manifest = catalog.rollback(resume_from_snapshot)
    else:
        manifest = catalog.latest() if resume else None
    if manifest is None:
        manifest = init_crawl(spark, cfg)
    known_hosts: set = set()  # per-run cache; see run_batch docstring
    loop_stats: dict = {}  # previous batch's n_sched → next batch's hint
    while manifest["batch_id"] < cfg.max_batches:
        nxt = run_batch(spark, catalog, cfg, manifest, known_hosts=known_hosts,
                        sched_hint=loop_stats.get("n_sched"),
                        loop_stats=loop_stats)
        if nxt is None:
            break
        manifest = nxt
    docs = catalog.read("documents", manifest)
    progress = catalog.read("progress", manifest)
    frontier = catalog.read("frontier", manifest)
    # ONE aggregation job for all three progress-derived counters (three
    # separate count() jobs were ~10% of a short crawl's wall time)
    prog_row = progress.agg(
        F.count("*").alias("n"),
        F.sum((F.col("outcome") == "done").cast("long")).alias("n_done"),
        F.sum((F.col("outcome") == "cached").cast("long")).alias("n_cached"),
        F.sum((F.col("outcome") == "revalidated").cast("long")).alias("n_reval"),
    ).collect()[0]
    return {
        "batches": manifest["batch_id"],
        "n_documents": docs.count(),
        "n_fetched": int(prog_row["n_done"] or 0),
        "n_progress": int(prog_row["n"]),
        "n_frontier": frontier.count(),
        "refetch_skipped": int(prog_row["n_cached"] or 0),
        "revalidated": int(prog_row["n_reval"] or 0),
        "manifest": manifest,
    }
