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

import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_FORMATS = ("parquet", "jsonl")


def _write(out: DataFrame, out_dir: str, fmt: str, mode: str,
           partition_by: tuple) -> None:
    assert fmt in _FORMATS, fmt
    w = out.write.mode(mode).partitionBy(*partition_by)
    if fmt == "jsonl":
        # gzip'd JSON-lines shards — the lingua franca hand-off format for
        # tokenizer pipelines that don't speak parquet
        w.option("compression", "gzip").json(out_dir)
    else:
        w.parquet(out_dir)


def _hive_partitions(out_dir: str, partition_by: tuple) -> list:
    """First-level partition values from the hive directory names —
    metadata-only (a directory listing), no data read, works for every
    output format.  A production object store answers the same question
    with its list call."""
    key = partition_by[0] + "="
    return sorted(
        unquote(d[len(key):]) for d in os.listdir(out_dir)
        if d.startswith(key)
    )


def _sample(docs: DataFrame, sample_pct: int | None) -> DataFrame:
    if sample_pct is None:
        return docs
    slot = F.conv(F.substring(F.md5(F.col("doc_id")), 1, 8), 16, 10).cast("long") % 100
    return docs.filter(slot < F.lit(int(sample_pct)))


def _text_expr():
    """Text spans joined in offset order (spans are stored ordered) — the
    flattened-document expression, row-local (no shuffle)."""
    return F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )


def _with_text(docs: DataFrame) -> DataFrame:
    """(doc_id, _text) — the near-dup pipeline's input shape."""
    return docs.select("doc_id", _text_expr().alias("_text"))


def _drop_neardups(docs: DataFrame, threshold: float) -> DataFrame:
    """Keep only near-dup cluster roots (root = min doc_id): MinHash/LSH
    band join + exact-Jaccard verify + O(log n) star clustering — the same
    operators the dedup queries prove out (operators/dedup_text.py)."""
    from crawlspark.operators.dedup_text import (
        connected_components,
        verified_neardup_pairs,
    )

    pairs = verified_neardup_pairs(_with_text(docs), "doc_id", "_text", threshold)
    non_roots = connected_components(pairs).select(F.col("id").alias("doc_id"))
    # plain anti-join (no broadcast hint): the non-root set scales with the
    # corpus's duplicate mass — AQE picks broadcast when it is small
    return docs.join(non_roots, on="doc_id", how="left_anti")


def _spans_projection(docs: DataFrame) -> DataFrame:
    s = F.explode("spans").alias("s")
    return docs.select(
        "doc_id", "source", "published_date", s
    ).select(
        "doc_id", "source", "published_date",
        F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref"),
    )


def export_documents(
    catalog,
    out_dir: str,
    mode: str = "docs",
    partition_by: tuple = ("source",),
    sample_pct: int | None = None,
    manifest: dict | None = None,
    dedupe: bool = False,
    dedupe_threshold: float = 0.7,
    fmt: str = "parquet",
) -> dict:
    """Write the documents table as a partitioned training dataset;
    returns {'rows': n, 'mode': ..., 'partitions': [...]}.

    ``dedupe=True`` drops near-duplicate documents at export time, keeping
    each cluster's root (min doc_id) — exact duplicates are already
    impossible (doc_id is globally unique at crawl time), so this is the
    MinHash/LSH near-dup pass over span text.

    ``fmt='jsonl'`` writes gzip'd JSON-lines shards instead of parquet;
    docs mode additionally carries the text spans flattened into a
    top-level ``text`` field so each line is directly tokenizer-ready."""
    assert mode in ("docs", "spans"), mode
    docs = _sample(catalog.read("documents", manifest), sample_pct)
    if dedupe:
        docs = _drop_neardups(docs, dedupe_threshold)
    out = _spans_projection(docs) if mode == "spans" else docs
    if fmt == "jsonl" and mode == "docs":
        # row-local column add — NOT a join; the flatten is a lambda-HOF
        # over the already-loaded spans array
        out = out.withColumn("text", _text_expr())
    # single-pass write+count; the partition listing is a directory list,
    # never a data read
    obs = Observation("export_rows")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    _write(out, out_dir, fmt, "overwrite", partition_by)
    return {"rows": obs.get["rows"], "mode": mode, "fmt": fmt,
            "partitions": _hive_partitions(out_dir, partition_by)}


def export_media_frames(
    catalog,
    out_dir: str,
    every_ms: int = 1000,
    max_frames: int = 8,
    partition_by: tuple = ("source",),
    manifest: dict | None = None,
) -> dict:
    """Export sampled VIDEO frames from the crawl's media spans: documents
    → media spans (kind='media') → payload table (blob-store-fetch
    stand-in) → sample_frames (1→N exploding mapInPandas) → partitioned
    parquet shards carrying (doc_id, media_ref, frame_idx, ts_ms,
    frame_hash, frame bytes) — the multimodal training-data delivery
    shape.  Frame extraction itself is the documented codec seam."""
    from crawlspark.operators.multimodal import (
        media_payloads_from_documents,
        sample_frames,
    )

    docs = catalog.read("documents", manifest)
    payloads = media_payloads_from_documents(docs)
    frames = sample_frames(payloads, every_ms=every_ms, max_frames=max_frames)
    out = frames.join(docs.select("doc_id", "source"), on="doc_id", how="left")
    obs = Observation("frame_rows")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(out_dir)
    return {"rows": obs.get["rows"], "every_ms": every_ms,
            "max_frames": max_frames}


def export_warc(
    catalog,
    out_dir: str,
    manifest: dict | None = None,
    sample_pct: int | None = None,
    revisit: bool = True,
    cdxj: bool = True,
    wet: bool = False,
    wat: bool = False,
) -> dict:
    """Publish the crawl corpus as a web archive: documents → WARC
    response records → ``.warc.gz`` shards + CDXJ capture index — the
    interchange shape Common Crawl consumers and wayback-style replay
    tools ingest directly.

    ``revisit=True`` runs the WARC/1.1 §6.7 payload dedup first, so
    identical payloads are stored once (later copies become zero-payload
    revisit records pointing at the original — the archive storage win);
    ``cdxj=True`` writes the per-shard capture index with exact gzip-member
    offsets, giving O(1) random access per URL over the published archive.
    ``wet=True`` / ``wat=True`` also publish Common Crawl's companion
    sidecars under ``<out_dir>/wet`` and ``<out_dir>/wat``: WET conversion
    records carry the extracted text/plain payload, WAT metadata records a
    canonical JSON envelope — both WARC-Refers-To-linked to the response
    records, so archive consumers that only want text (tokenizer
    pipelines) never touch the raw payload shards.
    Everything is executor-side streaming (write_warc's contract); only
    the per-shard manifest comes back."""
    from crawlspark.sources.warc import (documents_to_warc_rows,
                                         documents_to_wat_rows,
                                         documents_to_wet_rows,
                                         revisit_dedup, write_warc)

    docs = _sample(catalog.read("documents", manifest), sample_pct)
    rows = documents_to_warc_rows(docs)
    if revisit:
        rows = revisit_dedup(rows)
    r = write_warc(rows, out_dir, cdxj=cdxj)
    out = {**r, "revisit": revisit, "cdxj": cdxj}
    if wet:
        out["wet"] = write_warc(
            documents_to_wet_rows(docs), os.path.join(out_dir, "wet"))
    if wat:
        out["wat"] = write_warc(
            documents_to_wat_rows(docs), os.path.join(out_dir, "wat"))
    return out


def export_incremental(
    catalog,
    out_dir: str,
    since_snap: int = 0,
    mode: str = "docs",
    partition_by: tuple = ("source",),
    sample_pct: int | None = None,
    manifest: dict | None = None,
    dedupe: bool = False,
    dedupe_threshold: float = 0.7,
    fmt: str = "parquet",
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

    ``dedupe=True`` makes the increment near-dup-clean AND incremental-
    safe: a delta document is dropped when it near-duplicates (a) any
    document committed at or before ``since_snap`` — i.e. state earlier
    increments already exported — via the cross-corpus band join
    (neardup_ids_against: old side scanned, only the delta probes), or
    (b) another delta document, keeping the cluster root (min doc_id).
    """
    assert mode in ("docs", "spans"), mode
    m = manifest or catalog.latest() or {"snapshot_id": 0, "tables": {}}
    all_files = m.get("tables", {}).get("documents", [])
    delta_files = [p for p in all_files if catalog.snap_of(p) > since_snap]
    export_snap = m["snapshot_id"]
    if not delta_files:
        return {"rows": 0, "since_snap": since_snap, "export_snap": export_snap,
                "mode": mode, "files_read": 0}
    docs = _sample(catalog.read_files("documents", delta_files), sample_pct)
    if dedupe:
        docs = _drop_neardups(docs, dedupe_threshold)  # delta-internal
        old_files = [p for p in all_files if catalog.snap_of(p) <= since_snap]
        if old_files:
            from crawlspark.operators.dedup_text import neardup_ids_against

            old = _with_text(catalog.read_files("documents", old_files))
            dup_ids = neardup_ids_against(
                _with_text(docs), old, "doc_id", "_text", dedupe_threshold
            ).select(F.col("id").alias("doc_id"))
            docs = docs.join(dup_ids, on="doc_id", how="left_anti")
    out = _spans_projection(docs) if mode == "spans" else docs
    if fmt == "jsonl" and mode == "docs":
        out = out.withColumn("text", _text_expr())
    # single-pass write+count: the Observation collects the row count
    # DURING the write job — the old `out.count()` after the write
    # re-ran the whole read(+dedupe)(+explode) DAG a second time
    obs = Observation("export_rows")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    _write(out, out_dir, fmt, "append", partition_by)
    # rows actually WRITTEN (spans mode explodes, so doc count would
    # disagree with the shard row count a pipeline validates against)
    return {"rows": obs.get["rows"], "since_snap": since_snap,
            "export_snap": export_snap, "mode": mode,
            "files_read": len(delta_files)}
