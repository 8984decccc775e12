"""Bucketed co-located joins: publishing both sides bucketed on the join
key makes the recurring equi-join exchange-free (plan-asserted), with
results identical to the plain-layout join."""

import pytest
from pyspark.sql import functions as F

from crawlspark.operators.bucketed import bucketed, publish_bucketed


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffle-join path so the exchange assertion is about
    bucketing, not about one side fitting in a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _docs(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )


def _embs(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(F.col("id").cast("double"),
                (F.col("id") * 2).cast("double")).alias("vec"),
    )


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    publish_bucketed(_docs(spark), "b_docs", str(tmp_path / "d"),
                     key="doc_id", n_buckets=8)
    publish_bucketed(_embs(spark), "b_embs", str(tmp_path / "e"),
                     key="doc_id", n_buckets=8)
    j = bucketed(spark, "b_docs").join(bucketed(spark, "b_embs"), "doc_id")
    p = _plan(spark, j)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p  # co-located: scans feed the join directly
    # results identical to the plain-layout join
    plain = _docs(spark).join(_embs(spark), "doc_id")
    assert j.count() == plain.count() == 5000
    a = sorted(tuple(r) for r in j.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b


def test_unbucketed_control_join_shuffles(spark, tmp_path, no_broadcast):
    """Negative control: the same join over plain parquet DOES exchange —
    the zero-Exchange plan above is the bucketing, not a quirk."""
    d, e = str(tmp_path / "d"), str(tmp_path / "e")
    _docs(spark).write.parquet(d)
    _embs(spark).write.parquet(e)
    j = spark.read.parquet(d).join(spark.read.parquet(e), "doc_id")
    assert "Exchange" in _plan(spark, j)


def test_bucketed_republish_overwrites(spark, tmp_path, no_broadcast):
    publish_bucketed(_docs(spark, 100), "b_docs2", str(tmp_path / "d2"),
                     n_buckets=4)
    publish_bucketed(_docs(spark, 70), "b_docs2", str(tmp_path / "d2b"),
                     n_buckets=4)
    assert bucketed(spark, "b_docs2").count() == 70
