"""cfg.use_canonical_link e2e: on a web where listing cards carry
tracking-param URL variants (tracking_params=True) and every article
declares <link rel="canonical"> to its clean URL (canonical_links=True),
the engine with canonical keying must equal the oracle and key every doc
by the clean URL — while the control run (keying by fetch URL) indexes
param-bearing variants as separate documents."""

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.html_parse import rel_canonical_href
from crawlspark.oracle import crawl_oracle
from crawlspark.tables import SnapshotCatalog

SCALE = 0.1
BUDGET = 15
MAX_BATCHES = 20


def test_rel_canonical_extraction():
    assert rel_canonical_href(
        "<html><link rel='canonical' href='https://a/x'><body>"
    ) == "https://a/x"
    assert rel_canonical_href(
        '<link href="https://a/y" rel="canonical">') == "https://a/y"
    assert rel_canonical_href('<link rel="stylesheet" href="s.css">') is None
    assert rel_canonical_href("<html><body>none</body>") is None


def _docs(spark, wh):
    cat = SnapshotCatalog(spark, wh)
    m = cat.latest()
    return {
        r["doc_id"]: r["url"]
        for r in cat.read("documents", m).collect()
    }


def test_canonical_link_collapses_url_aliases(spark, tmp_path):
    spec = synthetic.WebSpec(scale=SCALE, tracking_params=True,
                             canonical_links=True)

    wh = str(tmp_path / "wh_canon")
    run_crawl(spark, CrawlConfig(
        warehouse=wh, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4, use_canonical_link=True,
    ))
    docs = _docs(spark, wh)
    ora = crawl_oracle(spec, max_batches=MAX_BATCHES,
                       budget_override=BUDGET, use_canonical_link=True)
    assert set(docs) == set(ora.docs)
    for did, u in docs.items():
        assert u == ora.docs[did]["url"]
    # every doc is keyed by its clean canonical URL
    assert not [u for u in docs.values() if "utm_" in u or "gclid=" in u]

    # control: fetch-URL keying on the same web indexes variants
    wh2 = str(tmp_path / "wh_ctrl")
    run_crawl(spark, CrawlConfig(
        warehouse=wh2, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4, use_canonical_link=False,
    ))
    docs2 = _docs(spark, wh2)
    ora2 = crawl_oracle(spec, max_batches=MAX_BATCHES,
                        budget_override=BUDGET, use_canonical_link=False)
    assert set(docs2) == set(ora2.docs)
    tracked = [u for u in docs2.values() if "utm_" in u or "gclid=" in u]
    assert tracked, "control indexed no variant-keyed documents?"
    # alias collapse: canonical keying yields no MORE distinct clean
    # articles, but strictly fewer doc rows than variant keying
    assert len(docs) < len(docs2)
