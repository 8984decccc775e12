"""Bloom filter properties: zero false negatives, bounded FPR, merge/serde."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.operators.bloom import BloomState


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=200, unique=True))
def test_no_false_negatives(urls):
    b = BloomState(n_buckets=8, bits_per_bucket=1 << 14)
    b.add(urls)
    assert b.probe(urls).all()


def test_fpr_bound():
    b = BloomState(n_buckets=16, bits_per_bucket=1 << 16, k=7)
    added = [f"https://h{i % 50}.example/p/{i}" for i in range(20000)]
    b.add(added)
    fresh = [f"https://other{i}.example/q/{i}" for i in range(20000)]
    fp = int(b.probe(fresh).sum())
    # theoretical ~ (1-e^{-kn/m})^k per bucket; assert a loose 4x margin
    assert fp / len(fresh) < 4 * max(b.fpr_estimate(), 1e-4), fp


def test_merge_and_serde(tmp_path):
    a = BloomState(4, 1 << 12)
    b = BloomState(4, 1 << 12)
    a.add(["u1", "u2"])
    b.add(["u3"])
    a.merge(b)
    assert a.probe(["u1", "u2", "u3"]).all()
    p = str(tmp_path / "bloom.npz")
    a.to_npz(p)
    c = BloomState.from_npz(p)
    assert c.probe(["u1", "u2", "u3"]).all()
    assert np.array_equal(c.blobs, a.blobs)


def test_delta_bits_or_merge():
    base = BloomState(4, 1 << 12)
    base.add(["seed"])
    delta = base.delta_bits(["new1", "new2"])
    assert not base.probe(["new1"]).any()
    base.merge(delta)
    assert base.probe(["seed", "new1", "new2"]).all()


def test_mismatched_merge_rejected():
    with pytest.raises(AssertionError):
        BloomState(4, 1 << 12).merge(BloomState(8, 1 << 12))


def test_partitioned_probe_equals_broadcast(spark, tmp_path):
    """The co-partitioned (per-bucket store) probe must accept exactly the
    same URLs as the broadcast probe + exact fallback, and the grouped-map
    update must produce the same bits as the driver OR-merge path."""
    from pyspark.sql import functions as F

    from crawlspark.operators.bloom import BloomBucketStore
    from crawlspark.operators.urlseen import (
        bloom_delta,
        probe_unseen,
        probe_unseen_partitioned,
        update_buckets_partitioned,
    )

    bloom = BloomState(n_buckets=16, bits_per_bucket=1 << 14)
    seen = spark.range(5000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 40).cast("string"),
                 F.lit("/p/"), F.col("id").cast("string")).alias("url"))
    bloom.merge(bloom_delta(spark, seen, bloom))

    # store built via the distributed grouped-map update (the crawl path),
    # starting from an EMPTY store — full state never on the driver
    store = BloomBucketStore(16, 1 << 14, k=7)
    store = update_buckets_partitioned(spark, seen, store, str(tmp_path / "b0"))
    assert store.bloom_keys() == 5000
    # the update wrote the same bits as the driver OR-merge
    import numpy as np
    for b, path in store.paths.items():
        assert np.array_equal(np.load(path), bloom.blobs[b]), b

    cand = spark.range(8000).select(
        F.when(F.col("id") % 3 == 0,
               F.concat(F.lit("https://h"), (F.col("id") % 40).cast("string"),
                        F.lit("/p/"), (F.col("id") % 5000).cast("string")))
        .otherwise(F.concat(F.lit("https://new/q/"), F.col("id").cast("string")))
        .alias("url")).dropDuplicates(["url"])

    a = {r["url"] for r in probe_unseen(spark, cand, seen, bloom).collect()}
    b = {r["url"] for r in probe_unseen_partitioned(spark, cand, seen, store).collect()}
    assert a == b
    # and none of the accepted were actually seen
    seen_set = {r["url"] for r in seen.collect()}
    assert not (a & seen_set)

    # incremental update writes only touched buckets; untouched buckets
    # keep referencing the prior snapshot's files
    extra = spark.range(50).select(
        F.concat(F.lit("https://new/q/"), F.col("id").cast("string")).alias("url"))
    store2 = update_buckets_partitioned(spark, extra, store, str(tmp_path / "b1"))
    touched = {b for b in store2.paths if store2.paths[b] != store.paths.get(b)}
    assert 0 < len(touched) <= 16
    untouched = set(store.paths) - touched
    assert all(store2.paths[b] == store.paths[b] for b in untouched)
    assert store2.bloom_keys() == 5050
    # round-trip through the JSON manifest
    store2.save(str(tmp_path / "m.json"))
    loaded = BloomBucketStore.load(str(tmp_path / "m.json"))
    assert loaded.paths == store2.paths and loaded.n_items == store2.n_items


def test_capacity_autosplit_doubles_buckets_and_keeps_equality(spark, tmp_path):
    """Over-fill a deliberately tiny partitioned store: the compaction-time
    capacity guard must rebuild at double the bucket count from the exact
    seen set, the crawl must stay equal to the oracle across the resize,
    and every seen URL must still probe positive (no false negatives —
    the rebuild derives bits from urlseen, not from the old bits)."""
    from pyspark.sql import functions as F

    from crawlspark import synthetic
    from crawlspark.crawl import CrawlConfig, run_crawl
    from crawlspark.oracle import crawl_oracle
    from crawlspark.tables import SnapshotCatalog

    spec = synthetic.WebSpec(scale=0.25)
    wh = str(tmp_path / "wh")
    # 2 buckets x 512 bits, k=7, target FPR 0.1%: the worst bucket passes
    # 10x target (~53 keys/bucket) around batch 3-4 of this ~200-URL crawl
    # -> guard trips at a mid-crawl compaction (every 2 batches)
    cfg = CrawlConfig(
        warehouse=wh, spec=spec, max_batches=8, budget_override=10,
        bloom_partitioned=True, bloom_buckets=2, bloom_bits=1 << 9,
        compact_every=2, bloom_target_fpr=0.001,
    )
    run_crawl(spark, cfg)
    cat = SnapshotCatalog(spark, wh)
    m = cat.latest()
    store = cat.load_bloom_store(m)
    assert store.n_buckets > 2, "capacity guard never split"
    assert store.n_buckets & (store.n_buckets - 1) == 0  # still a power of 2
    assert m["state"].get("bloom_resplit_to") == store.n_buckets
    # equality across the resize
    ora = crawl_oracle(spec, max_batches=8, budget_override=10)
    seen_rows = cat.read("urlseen").collect()
    seen = {r["url"] for r in seen_rows}
    assert seen == ora.seen
    docs = {r["doc_id"] for r in cat.read("documents").collect()}
    assert docs == set(ora.docs)
    # no false negatives after the rebuild: probing the full seen set
    # through the engine's own co-partitioned path must return NOTHING —
    # a false negative would surface as a "fresh" (unseen) row
    from crawlspark.operators.urlseen import probe_unseen_partitioned

    cand = cat.read("urlseen").select("url").withColumn(
        "host", F.lit("h")
    )
    unseen = probe_unseen_partitioned(
        spark, cand, cat.read("urlseen"), store, small_positives=True
    )
    assert unseen.count() == 0, "seen URL probed as unseen after resplit"
    store.release()
    # key accounting survived the rebuild (each url counted exactly once)
    assert store.bloom_keys() == len(seen)


def test_resume_after_autosplit_stays_equal(spark, tmp_path):
    """Kill the crawl right after a capacity resplit, resume from the
    committed manifest, and run to completion: the resumed run must load
    the doubled store from the snapshot and end bit-equal to the oracle
    (resume × resplit composition)."""
    from crawlspark import synthetic
    from crawlspark.crawl import CrawlConfig, run_crawl
    from crawlspark.oracle import crawl_oracle
    from crawlspark.tables import SnapshotCatalog

    spec = synthetic.WebSpec(scale=0.25)
    wh = str(tmp_path / "wh")
    base = dict(warehouse=wh, spec=spec, budget_override=10,
                bloom_partitioned=True, bloom_buckets=2, bloom_bits=1 << 9,
                compact_every=2, bloom_target_fpr=0.001)
    # phase 1: stop at batch 4 (first resplit lands at a compaction <= 4)
    run_crawl(spark, CrawlConfig(max_batches=4, **base))
    cat = SnapshotCatalog(spark, wh)
    mid = cat.latest()
    assert mid["state"].get("bloom_resplit_to", 0) > 2, \
        "test premise: resplit must land before the kill point"
    # phase 2: resume to completion
    run_crawl(spark, CrawlConfig(max_batches=8, **base), resume=True)
    m = cat.latest()
    store = cat.load_bloom_store(m)
    assert store.n_buckets == mid["state"]["bloom_resplit_to"] or \
        store.n_buckets > mid["state"]["bloom_resplit_to"]  # may double again
    ora = crawl_oracle(spec, max_batches=8, budget_override=10)
    seen = {r["url"] for r in cat.read("urlseen").collect()}
    assert seen == ora.seen
    docs = {r["doc_id"] for r in cat.read("documents").collect()}
    assert docs == set(ora.docs)


def test_small_batch_delta_cap_falls_back_to_distributed(spark):
    """The small-batch collect path is gated by the caller's ESTIMATE; when
    the actual row count exceeds the hard cap the function must fall
    through to the distributed path (bounded driver exposure) and still
    produce exactly the same bits."""
    from pyspark.sql import functions as F

    from crawlspark.operators.urlseen import bloom_delta

    urls = spark.range(60_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 9).cast("string"),
                 F.lit("/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 9).cast("string")).alias("host"),
    )
    base = BloomState(8, 1 << 16)
    # lying estimate (10) selects the collect probe; 60k rows > 50k cap
    d1, hosts = bloom_delta(spark, urls, base, collect_hosts=True,
                            small_batch_rows=10)
    d2 = bloom_delta(spark, urls, BloomState(8, 1 << 16))
    assert np.array_equal(d1.blobs, d2.blobs)
    assert int(d1.n_items.sum()) == 60_000
    assert hosts == {f"h{i}" for i in range(9)}
