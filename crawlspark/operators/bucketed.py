"""Bucketed table publication — co-located joins for recurring join keys.

A 100 TB training pipeline joins the same tables on the same key every
night: documents ⋈ embeddings on doc_id (semantic dedup, ANN labeling),
documents ⋈ pii/quality side-tables, exported shards ⋈ audit rows.  A
plain parquet layout pays a full shuffle of BOTH sides on every run; a
bucketed-and-sorted layout pays the shuffle ONCE at publication, and every
later equi-join on the key is exchange-free (Spark matches the two
tables' bucket specs and feeds the SortMergeJoin directly from the scans
— zero Exchange operators in the plan, which `tests/test_bucketed.py`
asserts).

This is Spark's native bucketing (`bucketBy`/`sortBy` + `saveAsTable`,
hash-partitioned files per bucket) — the layout survives in the session
catalog as an EXTERNAL table at the path you give, so the parquet shards
live with the rest of the dataset and any catalog (Hive, Glue) can adopt
them.  At 1000 executors the publication shuffle is the same one the
first consumer join would have paid anyway; every consumer after that
reads co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def publish_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str = "doc_id",
    n_buckets: int = 16,
) -> None:
    """Write ``df`` as an external parquet table bucketed AND sorted by
    ``key``.  Overwrites a previous publication of the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a published bucketed table (bucket metadata comes from the
    catalog entry, so joins on the bucket key skip the exchange)."""
    return spark.table(name)
