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


# ---- per-domain rule-table dispatch (F6/H2/H3 breadth) --------------------

KTIMES = """
<html><body><h2 class='entry-title'>Kh headline</h2>
<time class='entry-time'>May 4, 2021</time>
<div class='entry-content'>
<p>Real para.</p>
<p>Also Read: some other story</p>
<div class='entry-navigation'><p>prev next</p></div>
<ul><li>point a</li><li>point b</li></ul>
</div></body></html>
"""


def test_ktimes_fallback_chain_and_drops():
    """khmertimes analog (reference :2325-2340): entry-content body,
    h1→h2.entry-title title fallback, time.entry-time date fallback,
    'Also Read:' paragraph drop, entry-navigation exclusion."""
    art = hp.extract_article(KTIMES, "www.ktimes.example")
    assert art["title"] == "Kh headline"
    assert art["date_raw"] == "May 4, 2021"
    assert art["spans"] == [
        ("text", "Real para.", None),
        ("text", "point a,", None),
        ("text", "point b.", None),
    ]


def test_ktimes_standard_page_still_works():
    """A ktimes page in the default shape resolves through the chain's
    last fallback — per-domain rules never break the common case."""
    art = hp.extract_article(ARTICLE, "www.ktimes.example")
    assert art["title"] == "Covid cases fall"
    assert ("text", "First para.", None) in art["spans"]


def test_bpost_body_fallback_chain():
    """bangkokpost analog: 4-branch body fallback (reference :1249-1286)
    — the typo'd 'articl-content' branch wins when present, and the
    articlePhoto exclusion still applies inside it (:2283)."""
    html = """
    <h1>BP</h1><span class='pubdate'>June 1, 2021</span>
    <div class='articl-content'><p>bp para.</p>
      <div class='articlePhoto'><p>gallery</p></div></div>
    <div class='article-body'><p>WRONG container.</p></div>
    """
    art = hp.extract_article(html, "www.bpost.example")
    assert art["spans"] == [("text", "bp para.", None)]
    # with the preferred containers absent it falls through to article-body
    art2 = hp.extract_article(ARTICLE, "www.bpost.example")
    assert ("text", "First para.", None) in art2["spans"]


def test_card_selector_union_mnow():
    """nst analog (reference :1070-1101): card selectors are a UNION —
    div.card, div.article-teaser and li.story all yield cards, in document
    order, with a time-tag date fallback."""
    html = """
    <div class='card'><a href="/news/1-s1">A</a><span class='date'>2021-01-01</span></div>
    <div class='article-teaser'><a href="/news/2-s2">B</a><time>2021-02-02</time></div>
    <li class='story'><a href="/news/3-s3">C</a></li>
    <div class='other'><a href="/news/4-s4">D</a></div>
    """
    cards = hp.extract_listing_cards(html, "www.mnow.example")
    assert [c["link"] for c in cards] == ["/news/1-s1", "/news/2-s2", "/news/3-s3"]
    assert cards[1] == {"link": "/news/2-s2", "title": "B", "date": "2021-02-02"}
    assert cards[2]["date"] is None
    # default hosts see only div.card
    assert [c["link"] for c in hp.extract_listing_cards(html, "www.cna.example")] == ["/news/1-s1"]


def test_adding_a_domain_is_table_only():
    """Adding a site == adding a DomainRules row; the dispatcher picks it
    up with no code change (the round-2 verdict's 'a real user adding a
    new site hits this first')."""
    from unittest import mock

    from crawlspark import extract_rules as er

    new = er.DomainRules(host_key="newsite.example",
                         body_chain=(("main", "story"),),
                         drop_strong=True)
    with mock.patch.object(er, "DOMAIN_RULES", er.DOMAIN_RULES + (new,)):
        html = "<h1>t</h1><main class='story'><p>hi <b>drop</b> there.</p></main>"
        art = hp.extract_article(html, "www.newsite.example")
        assert art["spans"] == [("text", "hi  there.", None)]


def test_ktimes_shallow_tail_drops_trailing_em():
    """khmertimes (reference :2325-2328): the LAST TWO eligible paragraphs
    take only non-<em> content (em-tag footers dropped); earlier
    paragraphs keep em text.  Position counts over the FILTERED paragraph
    set ('Also Read:' paragraphs don't shift it)."""
    html = """
    <div class='entry-content'>
    <p>First with <em>kept emphasis</em> text.</p>
    <p>Second body para.</p>
    <p>Third with <em> DROPPED FOOTER </em>tail.</p>
    <p>Also Read: excluded entirely</p>
    <p>Fourth <em>DROPPED</em> last.</p>
    </div>
    """
    art = hp.extract_article(html, "www.ktimes.example")
    assert art["spans"] == [
        ("text", "First with kept emphasis text.", None),
        ("text", "Second body para.", None),
        ("text", "Third with tail.", None),
        ("text", "Fourth  last.", None),
    ]


def test_path_qualified_rule_dispatch():
    """Reference keys some branches on the URL, not the host
    ('bernama.com/en/' in response.url, :779): the /en/ path resolves the
    bernama row, any other path falls through to DEFAULT rules."""
    html = ("<h1>Plain</h1><h1 class='h2'>EN title</h1>"
            "<span class='pubdate'>2020-01-02</span>"
            "<div class='text-right'>Jan 5, 2020</div>"
            "<div class='article-body'><p>P.</p></div>")
    en = hp.extract_article(html, "www.bern.example", "/en/news/1")
    assert (en["title"], en["date_raw"]) == ("EN title", "Jan 5, 2020")
    other = hp.extract_article(html, "www.bern.example", "/my/news/1")
    assert (other["title"], other["date_raw"]) == ("Plain", "2020-01-02")


def test_targeted_pagination_selector_modes():
    """Selector-keyed targeted pagination follows ALL matching anchors
    (getall, :797-821); mb's empty-tuple rule follows nothing (:765-772);
    rule-less hosts follow everything (:759-761)."""
    html = ("<a href='u1'>story</a>"
            "<a class='paging__link' href='u2'>2</a>"
            "<a class='next page-numbers' href='u3'>Next</a>"
            "<div class='page-nav'><a href='u4'>4</a></div>"
            "<p class='page-Navigation'><a href='u5'>5</a><a href='u6'>6</a></p>")
    assert hp.extract_targeted_links(html, "go.kmps.example") == ["u2"]
    assert hp.extract_targeted_links(html, "www.ktimes.example") == ["u3"]
    assert hp.extract_targeted_links(html, "english.cdaily.example") == ["u4"]
    assert hp.extract_targeted_links(html, "www.ppost.example") == ["u5", "u6"]
    assert hp.extract_targeted_links(html, "www.bpost.example") == ["u5", "u6"]
    assert hp.extract_targeted_links(html, "www.mbull.example") == []
    assert len(hp.extract_targeted_links(html, "www.pstar.example")) == 6


def test_ppost_publication_date_paragraph():
    """phnompenhpost (:2349-2369): the date is the LAST direct text node of
    the 'Publication date' paragraph, split on '|'; those paragraphs and
    'Reporter :' lines are dropped from the body."""
    html = ("<div class='section-article-header'><h2>T</h2></div>"
            "<p>Lead.</p><p>Reporter : X</p>"
            "<div class='img-captions'><p>cap</p></div>"
            "<p>Publication date<br>12 February 2023 | 12:12 ICT</p>")
    art = hp.extract_article(html, "www.ppost.example")
    assert art["title"] == "T"
    assert art["date_raw"] == "12 February 2023"
    assert art["spans"] == [("text", "Lead.", None)]


def test_body_include_and_raw_li():
    """Body-include leaves join the span stream in document order (tjpost
    tjp-opening h1 :2302, kompas read__content h3 :2313, vietnamplus
    article-body div :2269 with article-photo exclusion); kompas li text
    is raw — no stitching (:2313)."""
    tj = hp.extract_article(
        "<div class='tjp-opening'><h1>Open</h1></div><p>Body.</p>"
        "<div class='tjp-newsletter-box'><p>sub</p></div>",
        "www.tjpost.example")
    assert tj["spans"] == [("text", "Open", None), ("text", "Body.", None)]
    km = hp.extract_article(
        "<div class='read__content'><h3>Sub</h3><p>Para.</p>"
        "<p>Also Read: drop</p><ul><li>a</li><li>b</li></ul></div>",
        "go.kmps.example")
    assert km["spans"] == [("text", "Sub", None), ("text", "Para.", None),
                           ("text", "a", None), ("text", "b", None)]
    vp = hp.extract_article(
        "<p>Para.</p><div class='article-body-note'>Note</div>"
        "<div class='article-photo'><div class='article-body-note'>x</div></div>",
        "en.vplus.example")
    assert vp["spans"] == [("text", "Para.", None), ("text", "Note", None)]


def test_domain_rewrite_map():
    """F8 (reference :708-725): per-country registrable-domain rewrites as
    declarative rows; wrong-country combinations pass through."""
    from crawlspark.functions.urls import domain_for_country_py

    assert domain_for_country_py("www.bernama.com", "malaysia") == "bernama.com/en/"
    assert domain_for_country_py("news.vnanet.vn", "vietnam") == "vnanet.vn/en/"
    assert domain_for_country_py("www.vietnamplus.vn", "vietnam") == "en.vietnamplus.vn"
    assert domain_for_country_py("www.kompas.com", "indonesia") == "go.kompas.com"
    assert domain_for_country_py("www.cambodiadaily.com", "cambodia") == "english.cambodiadaily.com"
    assert domain_for_country_py("www.kompas.com", "malaysia") == "kompas.com"
    assert domain_for_country_py("www.bernama.com", "singapore") == "bernama.com"


def test_extract_links_with_rel_tokens_and_order():
    from crawlspark.html_parse import extract_links, extract_links_with_rel

    html = (
        '<a href="/a">plain</a>'
        '<a rel="NOFOLLOW" href="/b">ad</a>'
        '<a rel="sponsored noopener" href="/c">sp</a>'
        '<a rel="noopener  sponsored" href="/d">sp2</a>'
        '<a name="x" rel="nofollow">no href</a>'
        "<a onclick=\"window.open('/pop')\">popup</a>"
    )
    got = extract_links_with_rel(html)
    assert got == [
        ("/a", ""),
        ("/b", "nofollow"),
        ("/c", "noopener sponsored"),
        ("/d", "noopener sponsored"),  # token set is order-independent
    ]
    # rel never changes WHICH hrefs are seen vs the plain walk (onclick
    # URLs are script-carried, not <a> grammar — excluded here by design)
    assert [h for h, _ in got] == [
        x for x in extract_links(html) if x != "/pop"
    ]
