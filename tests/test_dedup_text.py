"""MinHash+LSH near-dup pipeline on planted duplicates."""

import random

import pytest
from pyspark.sql import functions as F


def _corpus(spark):
    rng = random.Random(11)
    vocab = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(60))))
    # planted near-dups: 100 and 101 are copies of 0 with 2-3 words changed;
    # 102 copies 1 exactly; 103 chains off 100 (transitive cluster with 0)
    base0 = docs[0][1].split()
    v1 = list(base0); v1[5] = "zulu"; v1[30] = "yankee"
    v2 = list(base0); v2[10] = "xray"
    v3 = list(v1); v3[40] = "whiskey"
    docs += [(100, " ".join(v1)), (101, " ".join(v2)), (102, docs[1][1]), (103, " ".join(v3))]
    return spark.createDataFrame(docs, "id long, text string")


def test_lsh_finds_planted_pairs(spark):
    from crawlspark.operators.dedup_text import verified_neardup_pairs

    df = _corpus(spark)
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in verified_neardup_pairs(df, threshold=0.7).collect()}
    assert (0, 100) in pairs and (0, 101) in pairs and (1, 102) in pairs
    assert pairs[(1, 102)] == 1.0
    # no random-pair false positives above threshold
    assert all(a in (0, 1, 100, 101, 103) and b in (100, 101, 102, 103) for (a, b) in pairs)


def test_dedup_keep_first_removes_cluster(spark):
    from crawlspark.operators.dedup_text import dedup_keep_first

    df = _corpus(spark)
    kept = {r["id"] for r in dedup_keep_first(df, threshold=0.7).collect()}
    # cluster {0,100,101,103} → keep 0; {1,102} → keep 1
    assert 0 in kept and 1 in kept
    assert not ({100, 101, 102, 103} & kept)
    assert {i for i in range(2, 60)} <= kept  # non-dups all kept


def test_signatures_row_local_no_shuffle(spark):
    """The signature stage must contain no Exchange (row-local promise)."""
    from crawlspark.operators.dedup_text import minhash_signatures

    df = _corpus(spark)
    sigs = minhash_signatures(df)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = sigs._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan


def test_connected_components_64_link_chain(spark):
    """The clustering must handle dup-cluster diameters far beyond any
    fixed propagation-round cap: a 64-link chain is ONE cluster rooted at
    its minimum (alternating star converges in O(log n) rounds)."""
    from crawlspark.operators.dedup_text import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "a_id long, b_id long"
    )
    roots = {r["id"]: r["root"] for r in connected_components(chain).collect()}
    assert set(roots) == set(range(1, 65))  # every non-root member mapped
    assert set(roots.values()) == {0}


def test_connected_components_random_graph_matches_union_find(spark):
    """Property check vs a plain-Python union-find on a random graph with
    many components of mixed shapes."""
    from crawlspark.operators.dedup_text import connected_components

    rng = random.Random(7)
    n = 400
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(260)})
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for x in (a, b):
            r = find(x)
            if x != r:
                expected[x] = r

    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["id"]: r["root"] for r in connected_components(df).collect()}
    assert got == expected
