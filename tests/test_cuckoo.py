"""Cuckoo-filter URL-seen layout: kernel invariants, deletion/readmit,
capacity, serde, partitioned parity, and probe-path equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlspark.operators.bloom import key_hashes
from crawlspark.operators.cuckoo import CuckooFull, CuckooState, apply_partitioned
from crawlspark.operators.urlseen import _hash_cols, probe_unseen_cuckoo


def _urls(lo, hi, tag="p"):
    return [f"https://www.h{i % 37}.example/{tag}/{i}" for i in range(lo, hi)]


def _hashes(urls):
    return key_hashes(urls)  # md5-derived uint64 pair, fine for kernel tests


def test_no_false_negatives_and_fpr():
    st = CuckooState.for_keys(10_000, n_buckets=8)
    h1, h2 = _hashes(_urls(0, 10_000))
    st.add_hashes(h1, h2)
    assert st.probe_hashes(h1, h2).all(), "live keys must always probe True"
    g1, g2 = _hashes(_urls(10_000, 30_000))
    fpr = st.probe_hashes(g1, g2).mean()
    assert fpr < 5e-3, fpr  # design bound ~1.2e-4 at this load


def test_delete_readmits_and_keeps_others():
    st = CuckooState.for_keys(8_000, n_buckets=4)
    h1, h2 = _hashes(_urls(0, 8_000))
    st.add_hashes(h1, h2)
    exp1, exp2 = h1[::2], h2[::2]  # expire every other key
    removed = st.delete_hashes(exp1, exp2)
    assert removed == len(exp1)
    # expired keys re-admit (probe False) modulo the documented fp-collision
    # caveat; kept keys stay seen unconditionally
    assert st.probe_hashes(exp1, exp2).mean() < 5e-3
    assert st.probe_hashes(h1[1::2], h2[1::2]).all()
    assert int(st.n_items.sum()) == len(h1) - removed


def test_high_load_factor_inserts():
    st = CuckooState(n_buckets=2, n_slots=512)  # 4096 slots
    n = int(2 * 512 * 4 * 0.9)
    h1, h2 = _hashes(_urls(0, n, "lf"))
    st.add_hashes(h1, h2)  # 90% load must not raise
    assert st.probe_hashes(h1, h2).all()


def test_overfill_raises_cuckoo_full():
    st = CuckooState(n_buckets=1, n_slots=8, max_kicks=50)  # 32 slots
    h1, h2 = _hashes(_urls(0, 100, "of"))
    with pytest.raises(CuckooFull):
        st.add_hashes(h1, h2)


def test_npz_roundtrip(tmp_path):
    st = CuckooState.for_keys(1_000, n_buckets=4)
    h1, h2 = _hashes(_urls(0, 1_000))
    st.add_hashes(h1, h2)
    p = str(tmp_path / "cuckoo.npz")
    st.to_npz(p)
    back = CuckooState.from_npz(p)
    assert np.array_equal(back.table, st.table)
    assert np.array_equal(back.n_items, st.n_items)
    assert (back.n_buckets, back.n_slots) == (st.n_buckets, st.n_slots)


def test_insert_order_invariant_layout():
    a, b = CuckooState(4, 256), CuckooState(4, 256)
    h1, h2 = _hashes(_urls(0, 2_000, "ord"))
    a.add_hashes(h1, h2)
    rev = np.arange(len(h1))[::-1]
    b.add_hashes(h1[rev], h2[rev])
    assert np.array_equal(a.table, b.table)


def _jvm_hashed(spark, urls, nb):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.select("url", *_hash_cols(spark, nb))


def test_partitioned_apply_matches_driver_kernel(spark):
    urls = _urls(0, 5_000, "pp")
    nb = 8
    keyed = _jvm_hashed(spark, urls, nb)
    rows = keyed.collect()
    h1 = np.array([r["_h1"] for r in rows], dtype=np.int64).view(np.uint64)
    h2 = np.array([r["_h2"] for r in rows], dtype=np.int64).view(np.uint64)

    driver = CuckooState.for_keys(len(urls), n_buckets=nb)
    driver.add_hashes(h1, h2)
    dist = apply_partitioned(
        spark, keyed, CuckooState(nb, driver.n_slots, driver.max_kicks), op="add")
    assert np.array_equal(dist.table, driver.table)
    assert np.array_equal(dist.n_items, driver.n_items)

    # distributed delete of a slice == driver delete of the same slice
    expired = [u for i, u in enumerate(urls) if i % 3 == 0]
    exp_keyed = _jvm_hashed(spark, expired, nb)
    erows = exp_keyed.collect()
    e1 = np.array([r["_h1"] for r in erows], dtype=np.int64).view(np.uint64)
    e2 = np.array([r["_h2"] for r in erows], dtype=np.int64).view(np.uint64)
    driver.delete_hashes(e1, e2)
    dist2 = apply_partitioned(spark, exp_keyed, dist, op="delete")
    assert np.array_equal(dist2.table, driver.table)
    assert np.array_equal(dist2.n_items, driver.n_items)


def test_probe_unseen_cuckoo_equals_exact_antijoin(spark):
    seen_urls = _urls(0, 3_000, "s")
    expired = seen_urls[::4]
    live = sorted(set(seen_urls) - set(expired))
    cand_urls = _urls(1_500, 4_500, "s")  # overlaps live, expired, and fresh

    keyed = _jvm_hashed(spark, seen_urls, 8)
    rows = keyed.collect()
    h1 = np.array([r["_h1"] for r in rows], dtype=np.int64).view(np.uint64)
    h2 = np.array([r["_h2"] for r in rows], dtype=np.int64).view(np.uint64)
    st = CuckooState.for_keys(len(seen_urls), n_buckets=8)
    st.add_hashes(h1, h2)

    erows = _jvm_hashed(spark, expired, 8).collect()
    e1 = np.array([r["_h1"] for r in erows], dtype=np.int64).view(np.uint64)
    e2 = np.array([r["_h2"] for r in erows], dtype=np.int64).view(np.uint64)
    st.delete_hashes(e1, e2)

    cand = spark.createDataFrame([(u,) for u in cand_urls], "url string")
    live_df = spark.createDataFrame([(u,) for u in live], "url string")
    got = {
        r.url for r in probe_unseen_cuckoo(spark, cand, live_df, st).collect()
    }
    want = set(cand_urls) - set(live)
    assert got == want  # exact: positives verified, negatives guaranteed
    st.release()
