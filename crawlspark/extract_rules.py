"""Declarative per-domain extraction rules (SURVEY §2.8 F6/H2/H3 breadth).

The reference carries ~19 per-domain branches of selector chains with
or-fallbacks (covid_news_spider.py:989-1341 listing cards, :1357-1613
next-page, :2060-2432 article bodies) — e.g. the bangkokpost 4-branch
body XPaths (:1249-1286, :2283), the khmertimes entry-content chain with
exclusion predicates and "Also Read:" drops (:2325-2340), the nst
selector unions (:1070-1101).  Here every branch is DATA, not code:
adding a site touches only this table — ``html_parse`` dispatches over it
with first-match-wins (coalesce) chains for single elements and union
semantics for card selectors, exactly the reference's `a, b, c` CSS
groups.

These rules run inside Arrow-batched mapInPandas workers; the table is a
module constant shipped with the code (no broadcast needed), so per-domain
breadth costs nothing at the 1000-executor scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# A selector: (tag, class-or-None).  class=None matches any element of the
# tag; our mini-DOM has no descendant combinators — the reference's deep
# CSS paths collapse to their discriminating (tag, class) leaf, which is
# the honest equivalent over the synthetic fixtures.
Sel = tuple

DEFAULT_EXCLUDED = frozenset({"ad", "related", "articlePhoto", "promo"})


@dataclass(frozen=True)
class DomainRules:
    """One site's extraction behavior, declaratively."""

    host_key: str = ""  # substring matched against the page host; "" = default
    # ordered fallback chains — FIRST match wins (reference: or-chains of
    # `response.css(a) or response.css(b)`, e.g. khmertimes title fallback
    # h1 → h2.entry-title :2331-2332)
    body_chain: tuple = (("div", "article-body"), ("div", "article-content"))
    title_chain: tuple = (("h1", None),)
    date_chain: tuple = (("span", "pubdate"),)
    # div classes excluded structurally (self or ancestor; reference
    # not(ancestor::...) predicates, :2061, :2283)
    excluded_classes: frozenset = DEFAULT_EXCLUDED
    # paragraphs containing any of these substrings are dropped (reference
    # khmertimes not(contains(., "Also Read:")) :2325)
    drop_text_containing: tuple = ()
    # <strong>/<b> content removed from paragraph text (reference inquirer
    # DOM surgery :2113-2134)
    drop_strong: bool = False
    # "shallow tail": for the LAST n eligible paragraphs, additionally drop
    # content of the listed tags — the khmertimes XPath takes //text() for
    # all but the last two paragraphs but only /text() | /*[not(self::em)]
    # /text() for those two (reference :2325-2328: em-tag footers)
    shallow_tail: tuple | None = None  # (n, ("em", ...))
    # listing-card selectors — UNION semantics, all matches in document
    # order (reference `a, b, c` CSS selector groups, :1070-1101)
    card_selectors: tuple = (("div", "card"),)
    card_date_chain: tuple = (("span", "date"),)


DEFAULT_RULES = DomainRules()

# Ordered: first host_key substring match wins.
DOMAIN_RULES: tuple[DomainRules, ...] = (
    # inquirer analog — strong/b decompose (reference :2113-2134)
    DomainRules(host_key="inq.example", drop_strong=True),
    # khmertimes analog — 4-branch body fallback, entry-navigation
    # exclusion, "Also Read:" paragraph drops, title/date fallback chains
    # (reference :2325-2340)
    DomainRules(
        host_key="ktimes.example",
        body_chain=(
            ("div", "entry-content"),
            ("div", "article-content"),
            ("div", "content-main"),
            ("div", "article-body"),
        ),
        title_chain=(("h1", None), ("h2", "entry-title")),
        date_chain=(("span", "pubdate"), ("time", "entry-time")),
        excluded_classes=DEFAULT_EXCLUDED | {"entry-navigation"},
        drop_text_containing=("Also Read:", "Also read:"),
        shallow_tail=(2, ("em",)),
    ),
    # bangkokpost analog — 4-branch body fallback + photo-div exclusion
    # (reference :1249-1286, :2270, :2283)
    DomainRules(
        host_key="bpost.example",
        body_chain=(
            ("div", "articl-content"),      # the site's typo'd variant
            ("section", "article-body"),
            ("div", "article-content"),
            ("div", "article-body"),
        ),
    ),
    # nst analog — listing-card selector UNION + card-date fallback
    # (reference :1070-1101 card selector groups)
    DomainRules(
        host_key="mnow.example",
        card_selectors=(("div", "card"), ("div", "article-teaser"), ("li", "story")),
        card_date_chain=(("span", "date"), ("time", None)),
    ),
)


def rules_for_host(host: str) -> DomainRules:
    for r in DOMAIN_RULES:
        if r.host_key and r.host_key in (host or ""):
            return r
    return DEFAULT_RULES
