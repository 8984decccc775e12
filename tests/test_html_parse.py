"""Literal-HTML extraction cases (hand-written expectations, not shared
with the generator) — the span semantics of SURVEY §2.8 H1-H5."""

from crawlspark import html_parse as hp


ARTICLE = """
<html><body><h1>Covid cases fall</h1><span class='pubdate'>May 3, 2021</span>
<div class='article-body'>
<p>First para.</p>
<figure><img src="https://img.x/1.jpg"><figcaption>A caption</figcaption></figure>
<p>Second <strong>BOLD</strong> para.</p>
<ul><li>item one</li><li>item two</li></ul>
<div class='ad'><p>SPONSORED</p></div>
<div class='articlePhoto'><p>gallery text</p></div>
</div>
<div class='related'><a href="/news/9-s2">rel</a></div>
</body></html>
"""


def test_article_spans_order_and_exclusions():
    art = hp.extract_article(ARTICLE, "www.cna.example")
    assert art["title"] == "Covid cases fall"
    assert art["date_raw"] == "May 3, 2021"
    got = art["spans"]
    assert got == [
        ("text", "First para.", None),
        ("media", "A caption", "https://img.x/1.jpg"),
        ("text", "Second BOLD para.", None),
        ("text", "item one,", None),
        ("text", "item two.", None),
    ]


def test_strong_decompose_for_inq():
    art = hp.extract_article(ARTICLE, "www.inq.example")
    assert ("text", "Second  para.", None) in art["spans"]


def test_links_and_cards():
    html = """
    <div class='card'><a href="/news/1-s1">Title A</a><span class='date'>2021-02-03</span></div>
    <div class='card'><a href="https://www.cna.example/news/2-s2">Title B</a></div>
    <nav><a href="/section/0/page/1">Next Page</a></nav>
    """
    cards = hp.extract_listing_cards(html)
    assert cards[0] == {"link": "/news/1-s1", "title": "Title A", "date": "2021-02-03"}
    assert cards[1]["date"] is None
    assert hp.extract_links(html) == [
        "/news/1-s1", "https://www.cna.example/news/2-s2", "/section/0/page/1"
    ]


def test_empty_body_redirect():
    html = """<h1>t</h1><div class='article-body'></div>
    <a href="/news/7-s0">Click here for article</a>"""
    art = hp.extract_article(html, "www.cna.example")
    assert art["redirect_url"] == "/news/7-s0"
    assert art["spans"] == []


def test_whitespace_only_body_is_empty():
    html = "<div class='article-body'><p>   </p></div><a href='/x'>click here for article</a>"
    art = hp.extract_article(html, "h")
    assert art["redirect_url"] == "/x"


def test_onclick_window_open_extraction():
    """C8: URLs carried in onclick handlers (reference :1409-1413)."""
    html = """
    <a href="/news/1-s1">normal</a>
    <a onclick="window.open('https://www.cna.example/news/9-s2')">popup</a>
    <a onclick="doSomethingElse()">ignored</a>
    """
    assert hp.extract_links(html) == [
        "/news/1-s1", "https://www.cna.example/news/9-s2"
    ]
