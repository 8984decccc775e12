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
