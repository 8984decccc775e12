"""WARC (Web ARChive, ISO 28500) sink + source.

The reference delivers fetched pages as one text file per article
(covid_news_spider.py:2474-2567).  At web scale the interchange format for
raw crawl payloads is WARC — Common Crawl, archive.org, and every serious
fetch pipeline speak it — so the engine publishes and ingests WARC
response records natively:

  * ``write_warc(df, out_dir)``  — one ``.warc.gz`` shard per partition,
    one gzip MEMBER per record (the standard layout: readers can seek to
    a record and decompress it alone).  Executors stream their partition
    straight to disk — nothing is collected.
  * ``read_warc(spark, path)``   — ``binaryFile`` scan → Arrow-batched
    parse of the concatenated gzip members back into one row per record.
    File-level parallelism: each shard is parsed where it lands.

Record grammar (the subset every WARC reader understands): a header block
of ``Key: Value`` lines terminated by a blank line, a payload of exactly
``Content-Length`` octets, then the ``\\r\\n\\r\\n`` record separator.
Serialization and parsing share this module so they cannot drift; the
``warc_record_fields`` query proves parse∘serialize = id against a DuckDB
oracle that derives the same fields straight from the table.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
import uuid
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("refers_to", StringType()),
        StructField("payload_digest", StringType()),
        StructField("content_type", StringType()),
    ]
)

REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def record_id_for(uri: str) -> str:
    """Deterministic WARC-Record-ID: a UUID derived from the target URI's
    md5 (replayable — re-serializing the same corpus yields byte-identical
    records, which the snapshot/export story depends on)."""
    return f"<urn:uuid:{uuid.UUID(hashlib.md5(uri.encode()).hexdigest())}>"


def record_bytes(
    uri: str,
    payload: bytes,
    warc_date: str = "2021-03-01T00:00:00Z",
    warc_type: str = "response",
    record_id: str | None = None,
    extra_headers: dict[str, str] | None = None,
    content_type: str = "text/html",
) -> bytes:
    """Serialize ONE WARC record (header block + payload + separator)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + (record_id or record_id_for(uri)).encode(),
        b"WARC-Date: " + warc_date.encode(),
        b"WARC-Target-URI: " + uri.encode(),
    ]
    for k, v in (extra_headers or {}).items():
        headers.append(f"{k}: {v}".encode())
    headers += [
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF * 2 + payload + _CRLF * 2


def conversion_headers(source_uri: str) -> dict[str, str]:
    """The WARC/1.1 §6.8 header for a derived record (WET text extract /
    WAT metadata) pointing back at the response record it was derived
    from."""
    return {"WARC-Refers-To": record_id_for(source_uri),
            "WARC-Refers-To-Target-URI": source_uri}


def revisit_headers(original_uri: str, payload_digest: str) -> dict[str, str]:
    """The WARC/1.1 §6.7.2 header set for an identical-payload-digest
    revisit record pointing at the original response for ``original_uri``."""
    return {
        "WARC-Refers-To": record_id_for(original_uri),
        "WARC-Refers-To-Target-URI": original_uri,
        "WARC-Payload-Digest": f"md5:{payload_digest}",
        "WARC-Profile": REVISIT_PROFILE,
    }


def parse_records(blob: bytes) -> Iterator[dict]:
    """Parse a concatenation of WARC records (one file's decompressed
    bytes) into dicts; tolerant of trailing garbage after the last
    separator."""
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF * 2, pos)
        if head_end < 0:
            break
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip()] = v.strip()
        clen = int(fields.get("Content-Length", "0"))
        body_start = head_end + 4
        payload = blob[body_start:body_start + clen]
        yield {
            "record_id": fields.get("WARC-Record-ID", ""),
            "warc_type": fields.get("WARC-Type", ""),
            "target_uri": fields.get("WARC-Target-URI", ""),
            "warc_date": fields.get("WARC-Date", ""),
            "content_length": clen,
            "payload": payload,
            "refers_to": fields.get("WARC-Refers-To", ""),
            "payload_digest": fields.get("WARC-Payload-Digest", ""),
            "content_type": fields.get("Content-Type", ""),
        }
        pos = body_start + clen + 4  # skip the record separator


def _gzip_member(record: bytes) -> bytes:
    buf = io.BytesIO()
    # mtime=0: reproducible shards (gzip stamps wall-clock otherwise)
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(record)
    return buf.getvalue()


def revisit_dedup(df: DataFrame) -> DataFrame:
    """Archive-side payload dedup (WARC/1.1 §6.7): among rows sharing an
    identical payload, keep the first (by uri) as a full ``response`` and
    turn the rest into zero-payload ``revisit`` rows that point at it.
    One hash-partitioned window on the payload digest — uniform keys, no
    skew at any scale — and the payload bytes of every duplicate are
    dropped BEFORE the sink writes, which is the entire storage win.
    Output adds (warc_type, refers_to_uri, payload_digest) and empties
    ``payload`` for revisits; feed straight into :func:`write_warc`."""
    from pyspark.sql import Window

    digest = F.md5("payload")
    win = Window.partitionBy("payload_digest").orderBy("uri")
    b = df.withColumn("payload_digest", digest)
    r = b.withColumn("rk", F.row_number().over(win)).withColumn(
        "first_uri", F.first("uri").over(win)
    )
    is_first = F.col("rk") == 1
    return (
        r.withColumn(
            "warc_type", F.when(is_first, "response").otherwise("revisit")
        )
        .withColumn(
            "refers_to_uri", F.when(is_first, F.lit("")).otherwise(F.col("first_uri"))
        )
        .withColumn(
            "payload",
            F.when(is_first, F.col("payload")).otherwise(F.lit(b"")),
        )
        .drop("rk", "first_uri")
    )


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    sort/lookup key of web-archive indexes (CDX/CDXJ): lowercase, scheme
    dropped, leading ``www.`` dropped, host labels REVERSED and
    comma-joined, ``)`` then the path.  Reversed-host ordering clusters a
    domain's captures contiguously, which is what makes prefix range-scans
    over a sorted index answer "everything under example.com/" without a
    full scan."""
    u = url.lower()
    if "://" in u:
        u = u.split("://", 1)[1]
    host, sep, path = u.partition("/")
    host = host.split(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    return ",".join(reversed(host.split("."))) + ")/" + path


def cdxj_line(uri: str, warc_date: str, digest: str, filename: str,
              offset: int, length: int) -> str:
    """One CDXJ index line: ``<surt> <14-digit ts> <json>`` — the pywb /
    OpenWayback capture-index grammar.  offset/length address the record's
    own gzip MEMBER inside the shard, so a reader seeks + decompresses ONE
    record without touching the rest of the file."""
    import json as _json

    ts = "".join(c for c in warc_date if c.isdigit())[:14]
    blk = _json.dumps(
        {"url": uri, "digest": digest, "filename": filename,
         "offset": str(offset), "length": str(length)},
        separators=(",", ":"), sort_keys=True,
    )
    return f"{surt_key(uri)} {ts} {blk}"


def write_warc(df: DataFrame, out_dir: str, cdxj: bool = False) -> dict:
    """Write ``(uri, payload, warc_date)`` rows as ``.warc.gz`` shards,
    one shard per partition, one gzip member per record.  Runs entirely
    executor-side (mapInPandas streaming each partition to its shard);
    only the per-shard manifest rows come back.  Returns
    ``{'files': n, 'records': n}``.

    ``cdxj=True`` also writes a ``part-XXXXX.cdxj`` capture index next to
    each shard — one line per record with the member's exact byte offset
    and length (computed as the shard streams, so the index is free) —
    giving the archive O(1) random access per URL instead of a shard scan;
    ``read_cdxj`` loads the whole index as a DataFrame for lookup joins.

    Multi-node: ``out_dir`` must be a shared filesystem / object-store
    mount (each executor opens its shard path directly), and speculative
    execution should stay off for this job — two attempts of the same
    partition would race on one shard file (the shard name is the
    partition id so a retry after failure safely overwrites)."""
    os.makedirs(out_dir, exist_ok=True)
    # overwrite semantics for the WHOLE prior publication: a rerun with
    # fewer partitions never executes a task for the higher partition ids,
    # so per-task cleanup can't reach their stale shards/indexes — the
    # driver clears every part-* output up front (an object store answers
    # this with one list+delete)
    for stale in glob.glob(os.path.join(out_dir, "part-*.warc.gz")) + \
            glob.glob(os.path.join(out_dir, "part-*.cdxj")):
        os.remove(stale)
    cols = df.columns
    assert {"uri", "payload"} <= set(cols), cols
    out_schema = StructType(
        [StructField("file", StringType()), StructField("records", LongType())]
    )

    def _write_partition(batches) -> Iterable:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        idx_path = os.path.join(out_dir, f"part-{pid:05d}.cdxj")
        idx_lines: list[str] = []
        offset = 0
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                m = len(pdf)
                dates = (
                    pdf["warc_date"]
                    if "warc_date" in pdf.columns
                    else ["2021-03-01T00:00:00Z"] * m
                )
                types = (
                    pdf["warc_type"]
                    if "warc_type" in pdf.columns
                    else ["response"] * m
                )
                refs = (
                    pdf["refers_to_uri"]
                    if "refers_to_uri" in pdf.columns
                    else [""] * m
                )
                digests = (
                    pdf["payload_digest"]
                    if "payload_digest" in pdf.columns
                    else [""] * m
                )
                ctypes = (
                    pdf["content_type"]
                    if "content_type" in pdf.columns
                    else ["text/html"] * m
                )
                for uri, payload, date, wt, ref, dg, ct in zip(
                    pdf["uri"], pdf["payload"], dates, types, refs, digests,
                    ctypes,
                ):
                    raw = payload if isinstance(payload, bytes) else bytes(payload)
                    if wt == "revisit":
                        extra = revisit_headers(ref, dg)
                    elif ref:  # derived record (WET/WAT): link the source
                        extra = conversion_headers(ref)
                    else:
                        extra = None
                    member = _gzip_member(
                        record_bytes(
                            uri, raw, warc_date=date, warc_type=wt,
                            extra_headers=extra, content_type=ct,
                        )
                    )
                    f.write(member)
                    if cdxj:
                        idx_lines.append(cdxj_line(
                            uri, date,
                            dg or hashlib.md5(raw).hexdigest(),
                            os.path.basename(path), offset, len(member),
                        ))
                    offset += len(member)
                    n += 1
        # a prior run's index at this partition id must never survive a
        # rewrite: offsets would point into the OLD shard bytes (silently
        # wrong records on seek) or at a shard this run deleted
        if os.path.exists(idx_path):
            os.remove(idx_path)
        if n == 0:
            os.remove(path)  # empty partitions leave no shard behind
            return
        if cdxj:
            with open(idx_path, "w", encoding="utf-8") as fi:
                fi.write("\n".join(sorted(idx_lines)) + "\n")
        yield pd.DataFrame({"file": [path], "records": [n]})

    manifest = df.mapInPandas(_write_partition, schema=out_schema).collect()
    return {"files": len(manifest), "records": sum(r["records"] for r in manifest)}


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``.warc.gz`` shards back into one row per record.  The
    ``binaryFile`` source gives file-level parallelism (a 100 TB WARC
    corpus is millions of ~1 GB shards — natural partition grain);
    ``gzip.decompress`` handles the concatenated members in one call."""
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.warc.gz"))

    def _parse(batches) -> Iterable:
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                blob = gzip.decompress(bytes(content))
                rows.extend(parse_records(blob))
            if rows:
                yield pd.DataFrame(rows)

    return files.select("content").mapInPandas(_parse, schema=WARC_RECORD_SCHEMA)


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Load ``.cdxj`` capture indexes as a DataFrame of (surt, ts, url,
    digest, filename, offset, length).  Line-oriented text scan with
    file-level parallelism; the JSON block parses with ``from_json`` —
    all JVM-side, no Python in the path.  Sorted-by-surt lines make the
    parquet-side sort for range lookups cheap (the files arrive locally
    presorted)."""
    raw = spark.read.text(os.path.join(path, "*.cdxj"))
    surt = F.substring_index("value", " ", 1)
    rest = F.expr("substring(value, length(substring_index(value, ' ', 1)) + 2)")
    ts = F.substring_index(rest, " ", 1)
    blk = F.expr(
        "substring(value, length(substring_index(value, ' ', 2)) + 2)"
    )
    js = F.from_json(
        blk,
        "url string, digest string, filename string, offset string, length string",
    )
    return raw.select(
        surt.alias("surt"), ts.alias("ts"),
        js["url"].alias("url"), js["digest"].alias("digest"),
        js["filename"].alias("filename"),
        js["offset"].cast("long").alias("offset"),
        js["length"].cast("long").alias("length"),
    )


def documents_to_warc_rows(docs: DataFrame) -> DataFrame:
    """Project the crawl's documents table into the sink's input shape:
    (uri, payload, warc_date) with the span text flattened as the payload
    and the published date as the WARC date — all row-local."""
    txt = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )
    return docs.select(
        F.col("url").alias("uri"),
        F.encode(txt, "UTF-8").alias("payload"),
        F.concat(
            F.date_format("published_date", "yyyy-MM-dd"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
    )


def documents_to_wet_rows(docs: DataFrame) -> DataFrame:
    """Project documents into WET sidecar rows (Common Crawl's extracted-
    text companion format): one ``conversion`` record per document with
    the flattened span text as a ``text/plain`` payload, WARC-Refers-To
    linking back to the response record's deterministic id.  All
    row-local — the sidecar build is a pure map over the corpus."""
    txt = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )
    return docs.select(
        F.col("url").alias("uri"),
        F.encode(txt, "UTF-8").alias("payload"),
        F.concat(
            F.date_format("published_date", "yyyy-MM-dd"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
        F.lit("conversion").alias("warc_type"),
        F.col("url").alias("refers_to_uri"),
        F.lit("text/plain").alias("content_type"),
    )


def documents_to_wat_rows(docs: DataFrame) -> DataFrame:
    """Project documents into WAT sidecar rows (Common Crawl's metadata
    companion format): one ``metadata`` record per document whose payload
    is a canonical JSON envelope (title, span counts, payload digest of
    the WET text).  ``to_json`` over a struct keeps field order fixed, so
    re-publishing the same corpus yields byte-identical sidecars."""
    txt = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )
    env = F.to_json(F.struct(
        F.col("url").alias("url"),
        F.col("title").alias("title"),
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == "media"))
        .alias("n_media_spans"),
        F.md5(txt).alias("text_digest"),
    ))
    return docs.select(
        F.col("url").alias("uri"),
        F.encode(env, "UTF-8").alias("payload"),
        F.concat(
            F.date_format("published_date", "yyyy-MM-dd"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
        F.lit("metadata").alias("warc_type"),
        F.col("url").alias("refers_to_uri"),
        F.lit("application/json").alias("content_type"),
    )
