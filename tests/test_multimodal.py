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
