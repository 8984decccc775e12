"""RSS 2.0 / Atom feed parsing — the third standard seed channel next to
sitemaps and the archive.

News sites publish feeds before their sitemaps update, so a
freshness-focused crawl polls feeds first.  The reference's hand-typed
seed list sidesteps feeds entirely (covid_news_spider.py start_requests
:560-699 enumerates listing URLs); this module adds the capability the
same way sitemap intake did: a grammar-agnostic entry parser shared by
the crawl loop's feed branch (operators/parse.py) and proven
cross-engine by the ``feed_entries_parse`` query's DuckDB oracle twin
(queries.py), which runs the SAME regexps in SQL.

Both grammars parse with one block regexp + per-field coalesce chains:

* RSS 2.0:  ``<item><link>URL</link><title>t</title><pubDate>d</pubDate>``
* Atom:     ``<entry><link href="URL"/><title>t</title><updated>d</updated>``
"""

from __future__ import annotations

import re

_BLOCK_RX = re.compile(r"<(?:item|entry)>(.*?)</(?:item|entry)>", re.S)
_LINK_RX = re.compile(r"<link>([^<]*)</link>")
_LINK_HREF_RX = re.compile(r'<link href="([^"]*)"')
_TITLE_RX = re.compile(r"<title>([^<]*)</title>")
_PUBDATE_RX = re.compile(r"<pubDate>([^<]*)</pubDate>")
_UPDATED_RX = re.compile(r"<updated>([^<]*)</updated>")


def feed_kind_py(xml: str) -> str:
    """'rss' | 'atom' | '' from the document element (first 200 bytes —
    feeds are tiny and the root tag is always first)."""
    head = xml[:200]
    if "<rss" in head:
        return "rss"
    if "<feed" in head:
        return "atom"
    return ""


def feed_entries_py(xml: str) -> list[dict]:
    """feed XML → [{url, title, published}] — grammar-agnostic: the block
    regexp matches both ``<item>`` and ``<entry>``, the link coalesces
    RSS element text over the Atom href attribute, and the date coalesces
    pubDate over updated.  Entries without a resolvable link are dropped
    (a feed row the crawl can't fetch is noise, not a frontier seed)."""
    out = []
    for b in _BLOCK_RX.findall(xml or ""):
        m = _LINK_RX.search(b)
        url = m.group(1) if m and m.group(1) else None
        if not url:
            m = _LINK_HREF_RX.search(b)
            url = m.group(1) if m and m.group(1) else None
        if not url:
            continue
        t = _TITLE_RX.search(b)
        p = _PUBDATE_RX.search(b) or _UPDATED_RX.search(b)
        out.append({
            "url": url,
            "title": t.group(1) if t else None,
            "published": p.group(1) if p else None,
        })
    return out
