"""Training-data export sink: partitioned parquet in doc and span shapes,
deterministic sampling, partition pruning for downstream trainers."""

import os

from pyspark.sql import functions as F

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.export import export_documents
from crawlspark.tables import SnapshotCatalog


def test_export_docs_and_spans(spark, tmp_path):
    wh = str(tmp_path / "wh")
    run_crawl(spark, CrawlConfig(warehouse=wh, spec=synthetic.WebSpec(scale=0.05),
                                 max_batches=8, budget_override=15))
    cat = SnapshotCatalog(spark, wh)
    docs = cat.read("documents")
    n_docs = docs.count()
    n_spans = docs.select(F.explode("spans")).count()
    assert n_docs > 0

    # docs shape: row-for-row, hive-partitioned by source
    out1 = str(tmp_path / "out_docs")
    r1 = export_documents(cat, out1, mode="docs")
    assert r1["rows"] == n_docs
    assert r1["partitions"] == sorted(
        x[0] for x in docs.select("source").distinct().collect())
    assert any(d.startswith("source=") for d in os.listdir(out1))
    # read-back equality on ids + span counts
    back = spark.read.parquet(out1)
    assert {x[0] for x in back.select("doc_id").collect()} == \
           {x[0] for x in docs.select("doc_id").collect()}

    # spans shape: exploded, tokenizer-ready, offsets preserved
    out2 = str(tmp_path / "out_spans")
    r2 = export_documents(cat, out2, mode="spans")
    assert r2["rows"] == n_spans
    sb = spark.read.parquet(out2)
    assert set(sb.columns) >= {"doc_id", "offset", "kind", "text", "media_ref"}
    one = docs.limit(1).collect()[0]
    got = sorted(
        (r["offset"], r["kind"]) for r in
        sb.filter(F.col("doc_id") == one["doc_id"]).collect())
    assert got == [(s["offset"], s["kind"]) for s in one["spans"]]

    # deterministic sample: strict subset, same result twice
    out3 = str(tmp_path / "out_s")
    r3 = export_documents(cat, out3, mode="docs", sample_pct=40)
    assert 0 < r3["rows"] < n_docs
    ids_a = {x[0] for x in spark.read.parquet(out3).select("doc_id").collect()}
    export_documents(cat, out3, mode="docs", sample_pct=40)
    ids_b = {x[0] for x in spark.read.parquet(out3).select("doc_id").collect()}
    assert ids_a == ids_b
