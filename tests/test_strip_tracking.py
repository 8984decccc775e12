"""cfg.strip_tracking e2e: on a synthetic web whose listing cards carry
analytics params (WebSpec.tracking_params=True), the engine with tracking
stripping enabled must (a) equal the single-threaded oracle exactly, and
(b) hold a seen set with NO tracking params, smaller than the unstripped
control run's (the variants collapsed)."""

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.oracle import crawl_oracle
from crawlspark.tables import SnapshotCatalog

SCALE = 0.1
BUDGET = 15
MAX_BATCHES = 20


def _seen_docs(spark, wh):
    cat = SnapshotCatalog(spark, wh)
    m = cat.latest()
    seen = {r["url"] for r in cat.read("urlseen", m).collect()}
    docs = {
        r["doc_id"]: tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        )
        for r in cat.read("documents", m).collect()
    }
    return seen, docs


def test_strip_tracking_equals_oracle_and_collapses_variants(spark, tmp_path):
    spec = synthetic.WebSpec(scale=SCALE, tracking_params=True)

    # engine with stripping ON vs the oracle twin
    wh = str(tmp_path / "wh_strip")
    run_crawl(spark, CrawlConfig(
        warehouse=wh, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4, strip_tracking=True,
    ))
    seen, docs = _seen_docs(spark, wh)
    ora = crawl_oracle(spec, max_batches=MAX_BATCHES,
                       budget_override=BUDGET, strip_tracking=True)
    assert seen == ora.seen
    assert set(docs) == set(ora.docs)
    for did, spans in docs.items():
        want = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in ora.docs[did]["spans"]
        )
        assert spans == want
    # the whole point: no tracking params survive into the seen set
    assert not [u for u in seen if "utm_" in u or "gclid=" in u]

    # control: stripping OFF on the SAME web → param variants are
    # distinct frontier keys (still oracle-equal, just wasteful)
    wh2 = str(tmp_path / "wh_ctrl")
    run_crawl(spark, CrawlConfig(
        warehouse=wh2, spec=spec, max_batches=MAX_BATCHES,
        budget_override=BUDGET, compact_every=4, strip_tracking=False,
    ))
    seen2, _ = _seen_docs(spark, wh2)
    ora2 = crawl_oracle(spec, max_batches=MAX_BATCHES,
                        budget_override=BUDGET, strip_tracking=False)
    assert seen2 == ora2.seen
    tracked = [u for u in seen2 if "utm_" in u or "gclid=" in u]
    assert tracked, "control web planted no tracking variants?"
    assert len(seen2) > len(seen)
