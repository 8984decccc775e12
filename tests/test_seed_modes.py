"""Seed modes: TEST_SPECIFIC targeted crawl (article seeds + max_depth=0),
manual seed file, archive seed enrichment (SURVEY S1/S5/S6, entry pt 3)."""

import pytest

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.oracle import crawl_oracle
from crawlspark.tables import SnapshotCatalog

SPEC = synthetic.WebSpec(scale=0.1)

TARGET_SEEDS = [
    synthetic.article_url("www.cna.example", 3),
    synthetic.article_url("www.stimes.example", 5),
    "htps://www.cna.example/news/7-s0",      # malformed → fix_url repair
    "https://shop.cna.example/deals",        # blocked → dropped at seeding
    synthetic.article_url("www.cna.example", 3),  # duplicate seed
]


def test_targeted_mode_matches_oracle(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cfg = CrawlConfig(warehouse=wh, spec=SPEC, max_batches=5, max_depth=0,
                      seed_urls=TARGET_SEEDS, budget_override=10)
    run_crawl(spark, cfg)
    ora = crawl_oracle(SPEC, max_batches=5, max_depth=0, budget_override=10,
                       seed_urls=TARGET_SEEDS)
    cat = SnapshotCatalog(spark, wh)
    seen = {r["url"] for r in cat.read("urlseen").collect()}
    assert seen == ora.seen
    assert len(seen) == 3  # two valid + one repaired; blocked + dup dropped
    docs = {r["doc_id"] for r in cat.read("documents").collect()}
    assert docs == set(ora.docs)
    # depth-0: nothing beyond the seeds was ever enqueued
    assert cat.read("frontier").count() <= len(seen) + 2  # + possible retries


def test_seed_file(spark, tmp_path):
    f = tmp_path / "manual_scrape.txt"
    f.write_text("\n".join(TARGET_SEEDS[:2]))
    wh = str(tmp_path / "wh2")
    cfg = CrawlConfig(warehouse=wh, spec=SPEC, max_batches=3, max_depth=0,
                      seed_urls=[], seed_file=str(f), budget_override=10)
    run_crawl(spark, cfg)
    seen = {r["url"] for r in SnapshotCatalog(spark, wh).read("urlseen").collect()}
    assert seen == {TARGET_SEEDS[0], TARGET_SEEDS[1]}


def test_archive_seed_frame(spark):
    from crawlspark.sources.archive import archive_seed_frame

    df = archive_seed_frame(spark, "singapore", n=30)
    rows = df.collect()
    assert 0 < len(rows) <= 30
    assert all(r["page_kind"] == "article" for r in rows)
    assert len({r["url"] for r in rows}) == len(rows)  # deduped
    # deterministic across calls
    again = {r["url"] for r in archive_seed_frame(spark, "singapore", n=30).collect()}
    assert {r["url"] for r in rows} == again


def test_archive_backoff_retries():
    from crawlspark.sources import archive

    calls = {"n": 0}
    waits = []

    def flaky(kw, country, n):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return ["ok-id"]

    out = archive.search_archives(["covid"], "sg", 5, api=flaky, sleep=waits.append)
    assert out == ["ok-id"]
    assert waits == [1.0, 2.0]  # 2**0, 2**1 (reference :543-555)

    def always_fail(kw, country, n):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        archive.search_archives(["covid"], "sg", 5, api=always_fail,
                                max_retries=2, sleep=waits.append)


def test_seed_order_invariance(spark, tmp_path):
    """Determinism: the crawl is a function of the seed SET, not the seed
    list's order — two runs with permuted seed lists produce identical
    urlseen, progress and documents tables (north rule: same result at any
    parallelism AND any input arrival order)."""
    spec = synthetic.WebSpec(scale=0.05)
    seeds = synthetic.seed_urls(spec)
    assert len(seeds) >= 4

    def run(wh, seed_list):
        run_crawl(spark, CrawlConfig(
            warehouse=wh, spec=spec, max_batches=8, budget_override=10,
            compact_every=3, seed_urls=seed_list))
        cat = SnapshotCatalog(spark, wh)
        m = cat.latest()
        seen = {r["url"] for r in cat.read("urlseen", m).collect()}
        prog = {(r["url"], r["batch_id"], r["attempt"], r["outcome"])
                for r in cat.read("progress", m).collect()}
        docs = {(r["doc_id"], tuple((s["kind"], s["text"]) for s in r["spans"]))
                for r in cat.read("documents", m).collect()}
        return seen, prog, docs

    a = run(str(tmp_path / "wa"), list(seeds))
    b = run(str(tmp_path / "wb"), list(reversed(seeds)))
    assert a == b


def test_seed_file_distributed_no_driver_loop(spark, tmp_path):
    """A web-scale seed dump (10^6 lines incl. malformed, blocked, dup and
    junk lines) must seed through the distributed mapInPandas path — no
    .collect() of the file, no driver-side per-URL loop — and agree with
    the driver-loop semantics computed independently on a sample."""
    import crawlspark.crawl as C

    n = 1_000_000
    f = tmp_path / "big_seeds.txt"
    with open(f, "w") as fh:
        for i in range(n):
            m = i % 10
            if m == 7:
                fh.write(f"htps://www.cna.example/news/{i % 5000}-s0\n")  # repairable
            elif m == 8:
                fh.write(f"https://shop.cna.example/deals/{i}\n")  # blocked
            elif m == 9:
                fh.write("# junk line\n")
            else:
                fh.write(f"https://www.stimes.example/news/{i % 20000}-s0\n")
    orig_collect = C.DataFrame.collect
    calls = {"n": 0}

    def counting_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    C.DataFrame.collect = counting_collect
    try:
        df = C._seed_file_frame(spark, str(f))
        deduped = df.dropDuplicates(["url"])
        n_rows = deduped.count()
    finally:
        C.DataFrame.collect = orig_collect
    assert calls["n"] == 0, "seed-file path must not collect to the driver"
    # distinct survivors: i%10<=6 rows hit stimes ids v with v%10<=6
    # (20000*7/10 = 14000); i%10==7 rows hit cna ids v with v%10==7
    # (5000/10 = 500); blocked and junk lines contribute nothing
    assert n_rows == 14_500
    # spot-check agreement with the driver-loop twin on a sample
    sample = ["htps://www.cna.example/news/47-s0",
              "https://www.stimes.example/news/11-s0",
              "https://shop.cna.example/deals/1", "# junk line"]
    expect = [C._seed_row_py(u) for u in sample]
    got = {r["url"]: r for r in df.filter(
        df.url.isin([e[0] for e in expect if e])).dropDuplicates(["url"]).collect()}
    for e in expect:
        if e is None:
            continue
        r = got[e[0]]
        assert (r["host"], r["page_kind"], r["priority"]) == (e[2], e[8], e[4])
    assert len(got) == 2


def test_seed_file_matches_driver_loop_exactly(spark, tmp_path):
    """Set-level equality between the distributed file path and the old
    driver-loop semantics over a messy mixed file."""
    from crawlspark.crawl import CrawlConfig, _seed_frontier, _seed_row_py

    lines = TARGET_SEEDS + ["", "# comment", "  https://www.cna.example/news/9-s0  ",
                            "ps://www.stimes.example/section/1/page/2"]
    f = tmp_path / "mixed.txt"
    f.write_text("\n".join(lines))
    cfg = CrawlConfig(warehouse=str(tmp_path / "whx"), spec=SPEC,
                      seed_urls=[], seed_file=str(f))
    got = {(r["url"], r["host"], r["page_kind"], r["priority"])
           for r in _seed_frontier(spark, cfg).collect()}
    expect = {}
    for u in lines:
        r = _seed_row_py(u)
        if r is not None and r[0] not in expect:
            expect[r[0]] = (r[0], r[2], r[8], r[4])
    assert got == set(expect.values())


def test_targeted_pagination_mode_matches_oracle(spark, tmp_path):
    """SEARCH_ENTIRE_WEBSITE=0 analog: with search_entire_site=False the
    stimes host follows only its 'Next Page' anchor while rule-less hosts
    extract every anchor — engine and oracle must agree on the seen set
    and docs, and stimes coverage must SHRINK vs entire-site mode."""
    from crawlspark.crawl import CrawlConfig, run_crawl
    from crawlspark.oracle import crawl_oracle
    from crawlspark.tables import SnapshotCatalog

    wh = str(tmp_path / "wh")
    cfg = CrawlConfig(warehouse=wh, spec=SPEC, max_batches=6,
                      budget_override=10, search_entire_site=False)
    run_crawl(spark, cfg)
    ora = crawl_oracle(SPEC, max_batches=6, budget_override=10,
                       entire_site=False)
    cat = SnapshotCatalog(spark, wh)
    seen = {r["url"] for r in cat.read("urlseen").collect()}
    assert seen == ora.seen
    docs = {r["doc_id"] for r in cat.read("documents").collect()}
    assert docs == set(ora.docs)
    # targeted mode discovers strictly fewer stimes URLs than entire-site
    full = crawl_oracle(SPEC, max_batches=6, budget_override=10,
                        entire_site=True)
    stimes = {u for u in seen if "stimes" in u}
    stimes_full = {u for u in full.seen if "stimes" in u}
    assert stimes < stimes_full
