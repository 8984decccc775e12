"""Training-data export: publish the crawl's documents for downstream
pipelines (the delivery side of the reference's S7 file sink, re-expressed
as partitioned parquet datasets instead of one file per article,
covid_news_spider.py:2474-2567).

Two shapes:
  * ``docs``  — one row per document, spans nested (the input_hint shape);
  * ``spans`` — the interleaved spans EXPLODED to one row per span with
    (doc_id, offset, kind, text, media_ref) — tokenizer-ready shards.

Both write hive-partitioned parquet (default: by ``source``) so a
downstream trainer prunes partitions by source/date without reading the
rest; an optional deterministic md5-slot sample (same scheme as the
stratified_sample query: pure function of doc_id, reproducible at any
cluster size, no rand()) downsamples at export time, row-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sample(docs: DataFrame, sample_pct: int | None) -> DataFrame:
    if sample_pct is None:
        return docs
    slot = F.conv(F.substring(F.md5(F.col("doc_id")), 1, 8), 16, 10).cast("long") % 100
    return docs.filter(slot < F.lit(int(sample_pct)))


def export_documents(
    catalog,
    out_dir: str,
    mode: str = "docs",
    partition_by: tuple = ("source",),
    sample_pct: int | None = None,
    manifest: dict | None = None,
) -> dict:
    """Write the documents table as a partitioned training dataset;
    returns {'rows': n, 'mode': ..., 'partitions': [...]}."""
    assert mode in ("docs", "spans"), mode
    docs = _sample(catalog.read("documents", manifest), sample_pct)
    if mode == "spans":
        s = F.explode("spans").alias("s")
        out = docs.select(
            "doc_id", "source", "published_date", s
        ).select(
            "doc_id", "source", "published_date",
            F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref"),
        )
    else:
        out = docs
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(out_dir)
    written = catalog.spark.read.parquet(out_dir)
    parts = [r[0] for r in written.select(*partition_by).distinct().collect()]
    return {"rows": written.count(), "mode": mode, "partitions": sorted(parts)}


def export_incremental(
    catalog,
    out_dir: str,
    since_snap: int = 0,
    mode: str = "docs",
    partition_by: tuple = ("source",),
    sample_pct: int | None = None,
    manifest: dict | None = None,
) -> dict:
    """Export ONLY documents committed after ``since_snap`` — the
    recurring-pipeline shape: a nightly training-data refresh over a
    100 TB crawl must not rescan the whole documents table.

    Manifest-level pruning makes the delta free: each delta file's name
    carries the snapshot it was committed at (SnapshotCatalog.snap_of),
    so the export reads exactly the files with snap > since_snap — no
    filter job over old data, no dependency on a date column.  Appends
    (mode='append') into the same hive-partitioned dataset; dedup across
    increments is guaranteed by doc_id being globally deduped at crawl
    time (the docs-path anti-join) and each file being exported once.

    Returns {'rows': n, 'since_snap': ..., 'export_snap': ...}; feed
    ``export_snap`` back as the next call's ``since_snap``.
    """
    assert mode in ("docs", "spans"), mode
    m = manifest or catalog.latest() or {"snapshot_id": 0, "tables": {}}
    delta_files = [
        p for p in m.get("tables", {}).get("documents", [])
        if catalog.snap_of(p) > since_snap
    ]
    export_snap = m["snapshot_id"]
    if not delta_files:
        return {"rows": 0, "since_snap": since_snap, "export_snap": export_snap,
                "mode": mode, "files_read": 0}
    docs = _sample(catalog.read_files("documents", delta_files), sample_pct)
    if mode == "spans":
        s = F.explode("spans").alias("s")
        out = docs.select(
            "doc_id", "source", "published_date", s
        ).select(
            "doc_id", "source", "published_date",
            F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref"),
        )
    else:
        out = docs
    out.write.mode("append").partitionBy(*partition_by).parquet(out_dir)
    # report the rows actually WRITTEN (spans mode explodes, so doc count
    # would disagree with the shard row count a pipeline validates against)
    return {"rows": out.count(), "since_snap": since_snap,
            "export_snap": export_snap, "mode": mode,
            "files_read": len(delta_files)}
