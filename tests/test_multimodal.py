"""Multimodal plumbing: binary payloads, typed metadata, stubbed decode."""

import pytest

from crawlspark.operators.multimodal import (
    decode_media,
    media_payloads_from_documents,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("d1", "https://img.x/1.jpg", b"\x01\x02payload-one"),
        ("d1", "https://img.x/2.jpg", b"another-payload"),
        ("d2", "https://img.x/3.jpg", b""),
    ]
    return spark.createDataFrame(rows, "doc_id string, media_ref string, payload binary")


def test_fake_decode_schema_and_determinism(spark, media_df):
    out1 = {r["media_ref"]: r for r in decode_media(media_df).collect()}
    out2 = {r["media_ref"]: r for r in decode_media(media_df).collect()}
    assert set(out1) == {"https://img.x/1.jpg", "https://img.x/2.jpg", "https://img.x/3.jpg"}
    for k in out1:
        assert out1[k]["meta"]["content_hash"] == out2[k]["meta"]["content_hash"]
        assert out1[k]["meta"]["media_kind"] in ("image", "audio", "video")
        assert len(out1[k]["features"]) == 8
    assert out1["https://img.x/1.jpg"]["meta"]["n_bytes"] == 13


def test_real_decoder_is_explicit_stub(spark, media_df):
    import pyspark

    with pytest.raises(Exception) as ei:
        decode_media(media_df, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, pyspark.errors.exceptions.base.PySparkException
    )


def test_payloads_from_crawl_documents(spark, tmp_path):
    from crawlspark import synthetic
    from crawlspark.crawl import CrawlConfig, run_crawl
    from crawlspark.tables import SnapshotCatalog

    wh = str(tmp_path / "wh")
    run_crawl(spark, CrawlConfig(warehouse=wh, spec=synthetic.WebSpec(scale=0.06),
                                 max_batches=6, budget_override=20))
    docs = SnapshotCatalog(spark, wh).read("documents")
    payloads = media_payloads_from_documents(docs)
    n = payloads.count()
    assert n > 0
    decoded = decode_media(payloads)
    assert decoded.count() == n
    row = decoded.first()
    assert row["meta"]["n_bytes"] == 256  # 64-hex sha2 repeated 4x


def test_fit_box_geometry():
    from crawlspark.operators.multimodal import fit_box

    assert fit_box(100, 100, 320, 240) == (100, 100)       # already fits
    assert fit_box(640, 240, 320, 240) == (320, 120)       # width-bound
    assert fit_box(320, 480, 320, 240) == (160, 240)       # height-bound
    assert fit_box(6400, 2, 320, 240) == (320, 1)          # never 0
    w, h = fit_box(639, 479, 320, 240)
    assert w <= 320 and h <= 240 and w * 479 // 639 in (h - 1, h, h + 1)


def test_sample_frames_schedule_and_shape(spark):
    from pyspark.sql import functions as F

    from crawlspark.operators.multimodal import decode_media, sample_frames

    payloads = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("ref://"), F.col("id").cast("string")).alias("media_ref"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "UTF-8").alias("payload"),
    )
    frames = sample_frames(payloads, every_ms=1000, max_frames=8)
    rows = frames.collect()
    assert rows, "no video rows sampled"
    metas = {r["media_ref"]: r for r in decode_media(payloads).collect()}
    per_ref: dict = {}
    for r in rows:
        per_ref.setdefault(r["media_ref"], []).append(r)
        assert r["ts_ms"] == r["frame_idx"] * 1000
        assert len(r["frame"]) == 16  # md5-derived stub frame bytes
    for ref, fr in per_ref.items():
        meta = metas[ref]["meta"]
        assert meta["media_kind"] == "video"
        expect = min(8, max(1, -(-int(meta["duration_ms"]) // 1000)))
        assert sorted(r["frame_idx"] for r in fr) == list(range(expect))
    # only videos produce frames
    kinds = {m["meta"]["media_kind"] for m in metas.values()}
    assert "video" in kinds and len(per_ref) < len(metas)


def test_phash_locality_and_neardup_join(spark):
    """dHash locality: a one-byte payload perturbation moves the 64-bit
    hash by at most 2 bits, identical payloads hash identically, and the
    banded-LSH + exact-Hamming join surfaces exactly the near pairs."""
    from crawlspark.operators.multimodal import (phash_media,
                                                 phash_neardup_pairs)

    base = bytes(range(72))
    near = bytearray(base)
    near[10] = 200  # one grid cell changed -> <= 2 gradient bits flip
    far = bytes((b * 37 + 11) % 251 for b in range(72))
    rows = [("d1", "m_base", base), ("d2", "m_near", bytes(near)),
            ("d3", "m_same", base), ("d4", "m_far", far)]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, payload binary")
    hashes = phash_media(df)
    by_ref = {r["media_ref"]: r for r in hashes.collect()}
    assert by_ref["m_base"]["phash"] == by_ref["m_same"]["phash"]
    xor = by_ref["m_base"]["phash"] ^ by_ref["m_near"]["phash"]
    assert 1 <= bin(xor & ((1 << 64) - 1)).count("1") <= 2

    pairs = {(r["ref_a"], r["ref_b"]): r["hamming"]
             for r in phash_neardup_pairs(hashes, max_hamming=8).collect()}
    assert pairs[("m_base", "m_same")] == 0
    assert 1 <= pairs[("m_base", "m_near")] <= 2
    assert 1 <= pairs[("m_near", "m_same")] <= 2
    assert all("m_far" not in pair for pair in pairs)
