"""All opt-in crawl features composed on one web: sitemap intake + feed
intake + tracking-param stripping + robots META honoring + per-anchor
rel=nofollow gating + rel=canonical keying, against a synthetic web
planting all the substrates at once.
Each feature is e2e-tested alone in its own module; this proves they
COMPOSE (one engine run == one oracle run with everything enabled)."""

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.html_parse import meta_robots_directives
from crawlspark.oracle import crawl_oracle
from crawlspark.tables import SnapshotCatalog

SCALE = 0.1
BUDGET = 15
MAX_BATCHES = 20


def test_all_optin_features_compose(spark, tmp_path):
    spec = synthetic.WebSpec(scale=SCALE, tracking_params=True,
                             meta_robots=True, canonical_links=True,
                             feeds=True, rel_nofollow=True)
    wh = str(tmp_path / "wh_all")
    run_crawl(spark, CrawlConfig(
        warehouse=wh, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4,
        use_sitemaps=True, use_feeds=True, strip_tracking=True,
        obey_meta_robots=True, use_canonical_link=True,
        obey_link_rel=True,
        # cache + revalidation are recrawl-mode features; on a FIRST
        # crawl each url is scheduled once, so both must be inert —
        # composing them here proves exactly that (oracle equality below)
        use_fetch_cache=True, fetch_cache_max_age_snaps=2,
        revalidate_stale=True,
    ))
    ora = crawl_oracle(spec, max_batches=MAX_BATCHES,
                       budget_override=BUDGET,
                       use_sitemaps=True, use_feeds=True,
                       strip_tracking=True,
                       obey_meta_robots=True, obey_link_rel=True,
                       use_canonical_link=True)

    cat = SnapshotCatalog(spark, wh)
    m = cat.latest()
    seen = {r["url"] for r in cat.read("urlseen", m).collect()}
    docs = {
        r["doc_id"]: (r["url"], tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]))
        for r in cat.read("documents", m).collect()
    }
    assert seen == ora.seen
    assert set(docs) == set(ora.docs)
    for did, (u, spans) in docs.items():
        assert u == ora.docs[did]["url"]
        want = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in ora.docs[did]["spans"])
        assert spans == want

    # each feature left its fingerprint:
    # strip_tracking — the frontier never saw a param variant
    assert not [u for u in seen if "utm_" in u or "gclid=" in u]
    # canonical keying — every doc keyed clean (implied by the above
    # here, but asserted independently on doc urls)
    assert not [u for u, _ in docs.values() if "?" in u]
    # meta robots — at least one fetched noindex article is docless
    fetched_ok = {r["url"] for r in cat.read("progress", m).collect()
                  if r["outcome"] == "done"}
    doc_urls = {u for u, _ in docs.values()}
    gated = []
    for u in fetched_ok:
        kind, host, params = synthetic.classify_url(u)
        if kind == "article":
            d = meta_robots_directives(
                synthetic.article_html(spec, host, params["aid"]))
            if "noindex" in d:
                gated.append(u)
    assert gated and not [u for u in gated if u in doc_urls]
    # sitemap intake — the sitemap URLs themselves entered the frontier
    assert [u for u in seen if u.endswith("/sitemap.xml")]
    # feed intake — both feed URLs (RSS + Atom hosts) entered the frontier
    assert len([u for u in seen if u.endswith("/feed.xml")]) == 2
