"""Transfer-decoding middleware (reference middlewares.py:36-61) + the
synthetic encoded-fetch variants feeding it."""

import gzip

from crawlspark import synthetic
from crawlspark.functions.transfer import body_hash_py, decode_body_py


def test_decode_policies():
    plain = b"hello transfer world"
    good = gzip.compress(plain, mtime=0)
    assert decode_body_py(good, "gzip") == ("hello transfer world", False)
    assert decode_body_py(plain, None) == ("hello transfer world", False)
    # ForgivingHttpCompression: gzip header on a plain body → passthrough
    assert decode_body_py(plain, "gzip") == ("hello transfer world", False)
    # GzipRetry: truncated stream → decode_error (crawl loop retries)
    assert decode_body_py(good[:6], "gzip") == (None, True)
    assert decode_body_py(None, "gzip") == (None, False)


def test_body_hash_encoding_invariant():
    """Cache identity is the DECODED body: gzip vs identity transfer of the
    same page must hash identically."""
    assert body_hash_py("page body") == body_hash_py("page body")
    assert body_hash_py(None) is None
    assert body_hash_py("a") != body_hash_py("b")


def test_fetch_encoded_variants_and_decoded_equivalence():
    """Every 200 fetched through fetch_encoded + decode must equal the
    legacy decoded fetch() body; the corrupt-gzip slot must recover on
    retry; all three encoding variants must occur."""
    spec = synthetic.WebSpec(scale=0.3)
    kinds = {"gzip": 0, "plain": 0, "corrupt": 0, "lying": 0}
    for host, cfg in sorted(spec.hosts.items()):
        for aid in range(min(40, cfg["n_articles"])):
            url = synthetic.article_url(host, aid)
            status, final, body, _ = synthetic.fetch(spec, url, 0)
            s2, f2, raw, enc, _ = synthetic.fetch_encoded(spec, url, 0)
            assert (status, final) == (s2, f2)
            if status != 200:
                continue
            decoded, err = decode_body_py(raw, enc)
            ev = synthetic._h("enc", url) % 100
            if ev == 8:
                kinds["corrupt"] += 1
                assert err and decoded is None
                # retry succeeds (GzipRetryMiddleware semantics)
                _, _, raw1, enc1, _ = synthetic.fetch_encoded(spec, url, 1)
                d1, e1 = decode_body_py(raw1, enc1)
                assert not e1 and d1 == body
                continue
            assert not err and decoded == body, url
            if enc == "gzip" and ev < 8:
                kinds["gzip"] += 1
            elif enc == "gzip":
                kinds["lying"] += 1
            else:
                kinds["plain"] += 1
    assert kinds["gzip"] > 0 and kinds["plain"] > 0, kinds
    # the single-slot variants may or may not occur in a small sample;
    # assert the common ones and that nothing decoded wrongly above
