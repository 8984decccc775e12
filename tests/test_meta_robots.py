"""cfg.obey_meta_robots e2e: on a synthetic web planting <meta
name="robots"> directives (WebSpec.meta_robots=True), the engine must
equal the oracle, noindex'd articles must be fetched-but-not-indexed, and
nofollow'd listings must prune their outgoing links vs the control."""

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.html_parse import meta_robots_directives
from crawlspark.oracle import crawl_oracle
from crawlspark.tables import SnapshotCatalog

SCALE = 0.1
BUDGET = 15
MAX_BATCHES = 20


def test_meta_robots_directives_extraction():
    assert meta_robots_directives(
        "<html><meta name='robots' content='noindex'><body>x") == {"noindex"}
    # reversed attribute order (the synthetic web plants this shape too)
    assert meta_robots_directives(
        "<meta content='noindex,nofollow' name='robots'>") == {
        "noindex", "nofollow"}
    assert meta_robots_directives(
        '<META NAME="ROBOTS" CONTENT="NONE, NOARCHIVE">') == {
        "none", "noarchive"}
    # og:title and other meta tags never match
    assert meta_robots_directives(
        "<meta property='og:title' content='noindex'>") == set()
    assert meta_robots_directives("<html><body>no meta</body>") == set()


def _seen_prog_docs(spark, wh):
    cat = SnapshotCatalog(spark, wh)
    m = cat.latest()
    seen = {r["url"] for r in cat.read("urlseen", m).collect()}
    fetched_ok = {
        r["url"] for r in cat.read("progress", m).collect()
        if r["outcome"] == "done"
    }
    docs = {
        r["url"]: tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        )
        for r in cat.read("documents", m).collect()
    }
    return seen, fetched_ok, docs


def test_meta_robots_equals_oracle_and_gates_pages(spark, tmp_path):
    spec = synthetic.WebSpec(scale=SCALE, meta_robots=True)

    wh = str(tmp_path / "wh_obey")
    run_crawl(spark, CrawlConfig(
        warehouse=wh, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4, obey_meta_robots=True,
    ))
    seen, fetched_ok, docs = _seen_prog_docs(spark, wh)
    ora = crawl_oracle(spec, max_batches=MAX_BATCHES,
                       budget_override=BUDGET, obey_meta_robots=True)
    assert seen == ora.seen
    ora_doc_urls = {d["url"] for d in ora.docs.values()}
    assert set(docs) == ora_doc_urls

    # noindex semantics: find fetched articles whose page carries noindex
    # — they must be in progress/seen but have NO document row
    gated = []
    for u in fetched_ok:
        kind, host, params = synthetic.classify_url(u)
        if kind != "article":
            continue
        d = meta_robots_directives(synthetic.article_html(
            spec, host, params["aid"]))
        if "noindex" in d:
            gated.append(u)
    assert gated, "web planted no fetched noindex articles?"
    assert not [u for u in gated if u in docs]

    # control: same web, gate off — noindex'd articles DO produce docs
    wh2 = str(tmp_path / "wh_ctrl")
    run_crawl(spark, CrawlConfig(
        warehouse=wh2, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4, obey_meta_robots=False,
    ))
    seen2, _, docs2 = _seen_prog_docs(spark, wh2)
    ora2 = crawl_oracle(spec, max_batches=MAX_BATCHES,
                        budget_override=BUDGET, obey_meta_robots=False)
    assert seen2 == ora2.seen
    ungated = [u for u in gated if u in docs2]
    assert ungated, "control run should index the noindex'd articles"
