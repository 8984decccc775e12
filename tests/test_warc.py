"""WARC sink/source: shard round-trip fidelity, standard gzip-member
layout, determinism, and the documents-table projection."""

import glob
import gzip

from pyspark.sql import functions as F

from crawlspark.sources.warc import (
    documents_to_warc_rows,
    parse_records,
    read_warc,
    record_bytes,
    record_id_for,
    write_warc,
)


def _rows(spark, n=37):
    return spark.range(n).select(
        F.concat(F.lit("https://www.cna.example/news/"),
                 F.col("id").cast("string")).alias("uri"),
        F.encode(F.concat(F.lit("body text for page "),
                          F.col("id").cast("string"),
                          F.lit(" éé")), "UTF-8").alias("payload"),
        F.lit("2021-03-01T00:00:00Z").alias("warc_date"),
    ).repartition(4)


def test_warc_roundtrip_through_shards(spark, tmp_path):
    out = str(tmp_path / "warc")
    df = _rows(spark)
    r = write_warc(df, out)
    assert r["records"] == 37
    assert r["files"] == len(glob.glob(out + "/*.warc.gz")) <= 4

    back = read_warc(spark, out)
    got = {(x["target_uri"], bytes(x["payload"])) for x in back.collect()}
    want = {(x["uri"], bytes(x["payload"])) for x in df.collect()}
    assert got == want
    one = back.limit(1).collect()[0]
    assert one["warc_type"] == "response"
    assert one["warc_date"] == "2021-03-01T00:00:00Z"
    assert one["content_length"] == len(bytes(one["payload"]))
    assert one["record_id"] == record_id_for(one["target_uri"])


def test_warc_gzip_member_per_record(tmp_path):
    """Standard WARC-gz layout: each record its own gzip member, so a
    reader can decompress one record without touching the rest — and a
    plain multi-member gunzip still yields the clean concatenation."""
    import zlib

    recs = [record_bytes(f"https://h.example/{i}", f"p{i}".encode())
            for i in range(3)]
    from crawlspark.sources.warc import _gzip_member

    blob = b"".join(_gzip_member(r) for r in recs)
    # member boundaries: decompressing the FIRST member alone (zlib stops
    # at the member trailer) yields exactly record 0 — the seekable layout
    d = zlib.decompressobj(wbits=31)
    assert d.decompress(blob) == recs[0] and d.eof
    assert gzip.decompress(blob) == b"".join(recs)
    parsed = list(parse_records(gzip.decompress(blob)))
    assert [p["target_uri"] for p in parsed] == [
        f"https://h.example/{i}" for i in range(3)]
    # reproducible bytes (mtime=0): same records -> same shard bytes
    assert blob == b"".join(_gzip_member(r) for r in recs)


def test_documents_to_warc_projection(spark, tmp_path):
    """Crawl documents → WARC rows: payload is the flattened span text,
    WARC date is the published date; the full pipeline lands readable
    shards."""
    import datetime as dt

    from crawlspark import schemas

    row = (
        "d1", "https://www.cna.example/news/d1", "T", dt.date(2021, 3, 5),
        "CNA", 1,
        [{"kind": "text", "text": "first span", "media_ref": None, "offset": 0},
         {"kind": "media", "text": None, "media_ref": "m1", "offset": 1},
         {"kind": "text", "text": "second span", "media_ref": None, "offset": 2}],
    )
    docs = spark.createDataFrame([row], schemas.DOCUMENTS)
    out = str(tmp_path / "warc")
    r = write_warc(documents_to_warc_rows(docs), out)
    assert r == {"files": 1, "records": 1}
    rec = read_warc(spark, out).collect()[0]
    assert rec["target_uri"] == "https://www.cna.example/news/d1"
    assert bytes(rec["payload"]) == b"first span second span"
    assert rec["warc_date"] == "2021-03-05T00:00:00Z"


def test_cdxj_index_random_access(spark, tmp_path):
    """cdxj=True writes a capture index whose (filename, offset, length)
    triples address each record's own gzip member: seeking to the offset
    and decompressing exactly `length` bytes yields THAT record alone —
    O(1) random access per URL, no shard scan.  SURT keys sort a domain's
    captures contiguously, and read_cdxj loads the index for lookup
    joins."""
    import os

    from crawlspark.sources.warc import read_cdxj, surt_key

    out = str(tmp_path / "warc")
    df = _rows(spark, n=23)
    r = write_warc(df, out, cdxj=True)
    assert r["records"] == 23
    assert len(glob.glob(out + "/*.cdxj")) == r["files"]

    idx = read_cdxj(spark, out)
    rows = idx.collect()
    assert len(rows) == 23
    want = {x["uri"] for x in df.collect()}
    assert {x["url"] for x in rows} == want
    # SURT: reversed-host key, www stripped, ts from the record date
    assert all(x["surt"].startswith("example,cna)/news/") for x in rows)
    assert all(x["ts"] == "20210301000000" for x in rows)
    assert surt_key("https://www.cna.example/news/7") == "example,cna)/news/7"

    # the random-access proof: every index row seeks to exactly its record
    for x in rows:
        with open(os.path.join(out, x["filename"]), "rb") as f:
            f.seek(x["offset"])
            member = f.read(x["length"])
        rec = next(parse_records(gzip.decompress(member)))
        assert rec["target_uri"] == x["url"]
        import hashlib as _h

        assert _h.md5(rec["payload"]).hexdigest() == x["digest"]
    # index files are internally sorted by SURT (range-scan ready)
    for p in glob.glob(out + "/*.cdxj"):
        lines = open(p).read().splitlines()
        assert lines == sorted(lines)


def test_warc_revisit_dedup_roundtrip(spark, tmp_path):
    """Planted duplicate payloads → revisit records: one full response per
    distinct payload, every duplicate becomes a zero-payload revisit whose
    WARC-Refers-To is the original's record id — and the whole thing
    round-trips through the .warc.gz shards."""
    import hashlib

    from crawlspark.sources.warc import revisit_dedup

    df = spark.range(12).select(
        F.concat(F.lit("https://www.cna.example/news/"),
                 F.col("id").cast("string")).alias("uri"),
        # 12 fetches, only 4 distinct payloads (id % 4)
        F.encode(F.concat(F.lit("payload "),
                          (F.col("id") % 4).cast("string")), "UTF-8")
        .alias("payload"),
        F.lit("2021-03-01T00:00:00Z").alias("warc_date"),
    ).repartition(3)

    out = str(tmp_path / "warc")
    deduped = revisit_dedup(df)
    r = write_warc(deduped, out)
    assert r["records"] == 12

    back = read_warc(spark, out).collect()
    resp = [x for x in back if x["warc_type"] == "response"]
    revs = [x for x in back if x["warc_type"] == "revisit"]
    assert len(resp) == 4 and len(revs) == 8

    # responses carry the payload; revisits carry none but keep the digest
    for x in revs:
        assert x["content_length"] == 0 and bytes(x["payload"]) == b""
        # WARC-Refers-To carries the original's record id
        orig = [p for p in resp
                if record_id_for(p["target_uri"]) == x["refers_to"]]
        assert len(orig) == 1
        want_digest = "md5:" + hashlib.md5(bytes(orig[0]["payload"])).hexdigest()
        assert x["payload_digest"] == want_digest
    # keep-first: each response uri is the lexicographic min of its group
    groups = {}
    for row in df.collect():
        groups.setdefault(bytes(row["payload"]), []).append(row["uri"])
    for p in resp:
        assert p["target_uri"] == min(groups[bytes(p["payload"])])
    # storage win: the 8 duplicates wrote no payload bytes
    assert all(x["record_id"] for x in back)


def test_surt_expression_matches_python_function(spark):
    """surt_canonical's column expression is the exact twin of
    sources.warc.surt_key (the CDXJ index key) — including mixed-case
    scheme, www. prefix, port, query strings, a bare host with no path,
    and a deep multi-label host."""
    from crawlspark.queries import SPARK_QUERIES
    from crawlspark.sources.warc import surt_key

    rows = SPARK_QUERIES["surt_canonical"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "query produced no rows"
    for r in rows:
        assert r["surt"] == surt_key(r["url"]), r["url"]

    # edge shapes beyond the query's constructed URLs: the expression
    # pipeline applied manually must equal the Python function
    from pyspark.sql import functions as Fn

    edge = [
        "https://example.com",            # no path at all
        "HTTP://WWW.Example.COM:8080/A/B?c=D",
        "https://a.b.c.d.example.org/x//y/",
        "https://www.example.com/",
    ]
    df = spark.createDataFrame([(u,) for u in edge], ["url"])
    lu = Fn.lower("url")
    rest = Fn.regexp_replace(lu, r"^[a-z]+://", "")
    host_port = Fn.split_part(rest, Fn.lit("/"), Fn.lit(1))
    host = Fn.regexp_replace(
        Fn.split_part(host_port, Fn.lit(":"), Fn.lit(1)), r"^www\.", ""
    )
    surt = Fn.concat(
        Fn.array_join(Fn.reverse(Fn.split(host, r"\.")), ","),
        Fn.lit(")/"),
        Fn.substring(rest, Fn.length(host_port) + 2, Fn.lit(1 << 30)),
    )
    got = {r["url"]: r["surt"]
           for r in df.select("url", surt.alias("surt")).collect()}
    for u in edge:
        assert got[u] == surt_key(u), u


def test_wet_wat_sidecars(spark, tmp_path):
    """WET/WAT companion records: conversion carries the text/plain
    extract, metadata the canonical JSON envelope, and both point their
    WARC-Refers-To at the response record's deterministic UUID."""
    import datetime as dt
    import json as _json

    from crawlspark import schemas
    from crawlspark.sources.warc import (documents_to_wat_rows,
                                         documents_to_wet_rows,
                                         record_id_for)

    url = "https://www.cna.example/news/d1"
    row = (
        "d1", url, "T", dt.date(2021, 3, 5), "CNA", 1,
        [{"kind": "text", "text": "first span", "media_ref": None, "offset": 0},
         {"kind": "media", "text": None, "media_ref": "m1", "offset": 1},
         {"kind": "text", "text": "second span", "media_ref": None, "offset": 2}],
    )
    docs = spark.createDataFrame([row], schemas.DOCUMENTS)

    wet_dir = str(tmp_path / "wet")
    assert write_warc(documents_to_wet_rows(docs), wet_dir)["records"] == 1
    wet = read_warc(spark, wet_dir).collect()[0]
    assert wet["warc_type"] == "conversion"
    assert wet["content_type"] == "text/plain"
    assert wet["refers_to"] == record_id_for(url)
    assert bytes(wet["payload"]) == b"first span second span"

    wat_dir = str(tmp_path / "wat")
    assert write_warc(documents_to_wat_rows(docs), wat_dir)["records"] == 1
    wat = read_warc(spark, wat_dir).collect()[0]
    assert wat["warc_type"] == "metadata"
    assert wat["content_type"] == "application/json"
    assert wat["refers_to"] == record_id_for(url)
    env = _json.loads(bytes(wat["payload"]))
    assert env["url"] == url and env["title"] == "T"
    assert env["n_spans"] == 3 and env["n_media_spans"] == 1
    import hashlib
    assert env["text_digest"] == hashlib.md5(
        b"first span second span").hexdigest()

    # publishing twice yields byte-identical sidecar shards (replayable)
    import glob as _g
    first = {p: open(p, "rb").read() for p in _g.glob(wet_dir + "/*.warc.gz")}
    write_warc(documents_to_wet_rows(docs), wet_dir)
    again = {p: open(p, "rb").read() for p in _g.glob(wet_dir + "/*.warc.gz")}
    assert first == again
