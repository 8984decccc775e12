"""Structured Streaming jobs: windowed metrics + stateful rate limiter."""

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def test_stream_metrics_matches_batch(spark, tmp_path):
    from crawlspark.streaming.jobs import stream_metrics

    src = str(tmp_path / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(src)
    agg = stream_metrics(spark, src, EVENTS_SCHEMA)
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("m_out").start())
    try:
        q.processAllAvailable()
        got = {(r["w_start"], r["event_type"]): (r["n"], r["sum_value_c"])
               for r in spark.sql("select * from m_out").collect()}
    finally:
        q.stop()
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "s")
    )
    want = {(r["w_start"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_rate_limiter(spark, tmp_path):
    """Two micro-batches through the token bucket: the first admits up to
    the budget and defers the rest; the refilled second batch admits again
    — state persists across triggers."""
    from crawlspark.streaming.jobs import stream_rate_limiter

    src = str(tmp_path / "urls")
    b1 = [("h1", f"https://h1/u{i:02d}") for i in range(8)] + [("h2", "https://h2/u0")]
    spark.createDataFrame(b1, "host string, url string").coalesce(1).write.parquet(f"{src}/b1")

    stream = (spark.readStream
              .schema("host string, url string")
              .option("maxFilesPerTrigger", "1")
              .parquet(f"{src}/*"))
    out = stream_rate_limiter(stream, budget_per_trigger=5.0)
    q = out.writeStream.outputMode("append").format("memory").queryName("rl_out").start()
    try:
        q.processAllAvailable()
        rows1 = spark.sql("select * from rl_out").collect()
        admitted1 = [r for r in rows1 if r["host"] == "h1" and r["decision"] == "admit"]
        deferred1 = [r for r in rows1 if r["host"] == "h1" and r["decision"] == "defer"]
        assert len(admitted1) == 5 and len(deferred1) == 3
        assert [r["decision"] for r in rows1 if r["host"] == "h2"] == ["admit"]

        # second trigger: bucket refills (5 tokens), 3 more urls all admitted
        b2 = [("h1", f"https://h1/v{i}") for i in range(3)]
        spark.createDataFrame(b2, "host string, url string").coalesce(1).write.mode("append").parquet(f"{src}/b1")
        q.processAllAvailable()
        rows2 = spark.sql("select * from rl_out").collect()
        v_rows = [r for r in rows2 if r["url"].startswith("https://h1/v")]
        assert len(v_rows) == 3 and all(r["decision"] == "admit" for r in v_rows)
    finally:
        q.stop()
    shutil.rmtree(src, ignore_errors=True)


def test_foreachbatch_snapshot_sink_idempotent(spark, tmp_path):
    """Streaming → snapshot-table sink: rows land exactly once even if an
    epoch is replayed (idempotence via the epoch watermark in state)."""
    from crawlspark import schemas
    from crawlspark.streaming.jobs import stream_to_snapshot_sink
    from crawlspark.tables import SnapshotCatalog

    src = str(tmp_path / "src")
    rows = [(1, "h1", 5, 5, 0, 0, 0, 0, 0, 10), (1, "h2", 3, 3, 0, 0, 0, 0, 0, 7)]
    spark.createDataFrame(rows, schemas.METRICS).coalesce(1).write.parquet(src)

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(schemas.METRICS).parquet(src)
    q = stream_to_snapshot_sink(stream, cat, "metrics", str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert cat.read("metrics").count() == 2
    epoch = cat.latest()["state"]["stream_epochs"]["metrics"]

    assert epoch >= 0
    # replay: a second stream over the SAME checkpoint re-processes nothing,
    # and even if an epoch were re-delivered the epoch watermark skips it
    stream2 = spark.readStream.schema(schemas.METRICS).parquet(src)
    q2 = stream_to_snapshot_sink(stream2, cat, "metrics", str(tmp_path / "ckpt"))
    q2.processAllAvailable()
    q2.stop()
    assert cat.read("metrics").count() == 2  # no duplicates


def test_stream_dedup_suppresses_across_triggers(spark, tmp_path):
    """stream_frontier_dedup holds its seen-state ACROSS triggers: urls
    re-discovered in a later micro-batch are suppressed, genuinely new
    ones still emit (J1's in-stream twin)."""
    from crawlspark.streaming.jobs import stream_frontier_dedup

    src = tmp_path / "urls"
    src.mkdir()
    df1 = spark.createDataFrame([(f"https://h/{i}",) for i in range(20)], "url string")
    df1.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("url string").parquet(str(src))
    out = stream_frontier_dedup(stream)
    sq = (out.writeStream.outputMode("append").format("memory")
          .queryName("sd_test_out").start())
    sq.processAllAvailable()
    first = {r["url"] for r in spark.sql("select url from sd_test_out").collect()}
    assert first == {f"https://h/{i}" for i in range(20)}
    # second trigger: 10 re-discoveries + 5 new
    df2 = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(10)]
        + [(f"https://h/{i}",) for i in range(20, 25)], "url string")
    df2.coalesce(1).write.mode("append").parquet(str(src))
    sq.processAllAvailable()
    sq.stop()
    both = {r["url"] for r in spark.sql("select url from sd_test_out").collect()}
    assert both == {f"https://h/{i}" for i in range(25)}  # dupes suppressed
    n = spark.sql("select count(*) n from sd_test_out").collect()[0]["n"]
    assert n == 25  # emitted exactly once each


def test_stream_sessionize_gap_and_timeout(spark, tmp_path):
    """Custom stateful operator with STATE TIMEOUT: fetches within gap_ms
    chain into one session; a larger gap closes it (emitted on the trigger
    that observes the gap); a host gone quiet is flushed by the
    processing-time timeout with NO further input for its key.

    With ProcessingTimeTimeout the engine keeps running timeout-check
    micro-batches even with no new data, so processAllAvailable never
    settles — the test POLLS the memory sink with a deadline instead."""
    import time

    from crawlspark.streaming.jobs import stream_sessionize

    def h1_rows():
        return sorted(
            (r["session_id"], r["n_fetches"], r["first_ms"], r["last_ms"])
            for r in spark.sql("select * from sess_out").collect()
            if r["host"] == "h1"
        )

    def wait_for(expected, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            got = h1_rows()
            if got == expected:
                return got
            time.sleep(0.5)
        return h1_rows()

    src = str(tmp_path / "fetches")
    # h1: two sessions split by a 10s gap (gap_ms=5000); the first closes
    # on the trigger that sees the gap, the second stays OPEN and is later
    # flushed purely by the state timeout (h1 receives no further input)
    b1 = [("h1", 1_000), ("h1", 2_000), ("h1", 12_000), ("h1", 13_000)]
    spark.createDataFrame(b1, "host string, ts_ms long").coalesce(1).write.parquet(f"{src}/b1")
    stream = (spark.readStream
              .schema("host string, ts_ms long")
              .parquet(f"{src}/*"))
    out = stream_sessionize(stream, gap_ms=5_000, timeout_ms=500)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sess_out").start())
    try:
        assert wait_for([(0, 2, 1_000, 2_000)], deadline_s=60) == \
            [(0, 2, 1_000, 2_000)]
        # the open (12k,13k) session must arrive via hasTimedOut — no new
        # h1 data is ever written
        got = wait_for([(0, 2, 1_000, 2_000), (1, 2, 12_000, 13_000)])
        assert got == [(0, 2, 1_000, 2_000), (1, 2, 12_000, 13_000)]
        assert q.exception() is None
    finally:
        q.stop()
    shutil.rmtree(src, ignore_errors=True)


def test_stream_host_breaker_trip_and_close_across_triggers(spark, tmp_path):
    """The streaming breaker's consecutive-failure count must survive
    trigger boundaries: two failures in batch 1 + one in batch 2 trip at
    the third failure's timestamp; the first success after the trip
    emits close and resets the count."""
    from crawlspark.streaming.jobs import stream_host_breaker

    src = str(tmp_path / "fetches")
    b1 = [("h1", 1_000, False), ("h1", 2_000, False),
          ("h2", 1_500, True)]
    spark.createDataFrame(
        b1, "host string, ts_ms long, ok boolean"
    ).coalesce(1).write.parquet(f"{src}/b1")
    stream = (spark.readStream
              .schema("host string, ts_ms long, ok boolean")
              .parquet(f"{src}/*"))
    out = stream_host_breaker(stream, threshold=3)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("brk_out").start())
    try:
        q.processAllAvailable()
        assert spark.sql("select * from brk_out").count() == 0  # below threshold

        b2 = [("h1", 3_000, False),   # 3rd consecutive failure -> trip
              ("h1", 4_000, False),   # already tripped: no second trip event
              ("h1", 5_000, True),    # recovery -> close
              ("h2", 3_500, False)]   # h2: count restarts, stays below
        spark.createDataFrame(
            b2, "host string, ts_ms long, ok boolean"
        ).coalesce(1).write.parquet(f"{src}/b2")
        q.processAllAvailable()
        got = sorted(
            (r["host"], r["event"], r["ts_ms"], r["consec_fails"])
            for r in spark.sql("select * from brk_out").collect()
        )
        assert got == [("h1", "close", 5_000, 4), ("h1", "trip", 3_000, 3)]
        assert q.exception() is None
    finally:
        q.stop()
    shutil.rmtree(src, ignore_errors=True)


def test_stream_feed_poll_emits_only_new_entries(spark, tmp_path):
    """Re-polling a feed must emit each entry once, on the poll that
    first carried it: poll 1 delivers A+B, poll 2 re-delivers A+B and
    adds C — only C crosses in trigger 2 (cross-trigger dedup state)."""
    from crawlspark.streaming.jobs import stream_feed_poll

    def rss(*aids):
        items = "".join(
            f"<item><link>https://h1.example/news/{a}</link>"
            f"<title>doc {a}</title><pubDate>2021-03-0{a}</pubDate></item>"
            for a in aids
        )
        return f'<rss version="2.0"><channel>{items}</channel></rss>'

    src = str(tmp_path / "polls")
    spark.createDataFrame(
        [("h1.example", 1_000, rss(1, 2))],
        "host string, poll_ts_ms long, xml string",
    ).coalesce(1).write.parquet(f"{src}/p1")
    stream = (spark.readStream
              .schema("host string, poll_ts_ms long, xml string")
              .parquet(f"{src}/*"))
    out = stream_feed_poll(stream)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("feed_out").start())
    try:
        q.processAllAvailable()
        got1 = {(r["url"], r["poll_ts_ms"])
                for r in spark.sql("select * from feed_out").collect()}
        assert got1 == {("https://h1.example/news/1", 1_000),
                        ("https://h1.example/news/2", 1_000)}

        spark.createDataFrame(
            [("h1.example", 2_000, rss(1, 2, 3))],
            "host string, poll_ts_ms long, xml string",
        ).coalesce(1).write.parquet(f"{src}/p2")
        q.processAllAvailable()
        got2 = {(r["url"], r["poll_ts_ms"])
                for r in spark.sql("select * from feed_out").collect()}
        # the repeats were suppressed; the new entry carries poll 2's ts
        assert got2 == got1 | {("https://h1.example/news/3", 2_000)}
        # titles/dates rode through the parse
        titles = {r["title"] for r in
                  spark.sql("select * from feed_out").collect()}
        assert titles == {"doc 1", "doc 2", "doc 3"}
        assert q.exception() is None
    finally:
        q.stop()
    shutil.rmtree(src, ignore_errors=True)
