"""Deterministic synthetic web + fetcher (the sandbox's Splash stand-in).

Every page is a pure function of (url, attempt) — executors generate
content with zero driver state or network, so the same generator scales
from the sf0.001 tests to the 10^10-URL bench frontier.  The topology
mirrors the reference crawl's shape: two hot hosts absorb most of the
crawl (covid_news_spider.py:299-305 seed-host skew), listing pages chain
to next pages and fan out to article cards (get_next_pages :728-829,
parse_articles :989-1341), articles carry interleaved text/media spans,
boilerplate footers (:1658-1889), media credits (:1616-1645), messy dates
(:2480-2492), malformed hrefs needing fix_url repairs (:832-878), empty
bodies with 'click here for article' redirects (:2389-2432), and
retryable/skip status codes (:883, middlewares.py:38).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from functools import cached_property

from crawlspark import rules

SEED = 42

_WORDS = (
    "health ministry reported new cases of the virus today as hospitals "
    "prepare additional capacity for patients while officials urged "
    "residents to remain calm and follow safety measures during the "
    "outbreak response with testing centres open across the city and "
    "travel restrictions under review by the national task force"
).split()

_DATE_STYLES = 6


@dataclass(frozen=True)
class WebSpec:
    """Topology knobs; articles/listings per host derive from ``scale``."""

    scale: float = 1.0
    sections: int = 4
    cards_per_page: int = 6
    # decorate ~half the listing card links with analytics params
    # (?utm_source=...&gclid=...) so cfg.strip_tracking has real variants
    # to collapse; default off — the baseline web (and every pinned
    # equality test) is param-free
    tracking_params: bool = False
    # plant <meta name="robots"> directives: ~10% of articles noindex
    # (some also nofollow), ~12% of listing pages nofollow — so
    # cfg.obey_meta_robots has real pages to gate; default off
    meta_robots: bool = False
    # every article declares <link rel="canonical"> pointing at its CLEAN
    # URL, so cfg.use_canonical_link collapses tracking-param variants at
    # the document level even when the frontier fetched several; default
    # off
    canonical_links: bool = False
    # hosts that answer every request with a retryable 503 (a down host /
    # connection-timeout analog), so cfg.failure_trip_threshold has a
    # genuinely dead host to trip on; default none
    dead_hosts: tuple = ()
    # feed-bearing hosts serve /feed.xml (one RSS 2.0, one Atom) listing
    # ORPHAN articles, and their listing heads carry the standard
    # autodiscovery <link rel="alternate" type="application/rss+xml">, so
    # cfg.use_feeds has a real discovery surface; default off — the
    # baseline web (and every pinned equality test) is feed-free
    feeds: bool = False
    # nav anchors grow rel attributes: each listing's nav carries one
    # rel-blocked "promoted" article anchor (nofollow or sponsored by
    # hash parity) and ~half its cross-section links become
    # rel="nofollow" — so cfg.obey_link_rel has real anchors to gate;
    # default off — the baseline web (and every pinned equality test) is
    # rel-free
    rel_nofollow: bool = False
    # content epoch: 0 (default) serves every page's ORIGINAL body —
    # byte-identical to the pre-epoch web, so every pinned equality test
    # is untouched.  epoch N>0 appends a deterministic "Update N" trailing
    # paragraph to the ~1/3 of articles selected by a stable per-article
    # hash; the paragraph's text varies per epoch, so a recrawl at a new
    # epoch sees that subset CHANGED (new body hash) and the rest
    # byte-unchanged.  This is the changed/unchanged substrate that
    # cfg.revalidate_stale (conditional-GET analog) and the adaptive
    # freshness policy need; listings/feeds/sitemaps are never mutated
    # (they are the discovery surface and refetch every epoch anyway).
    epoch: int = 0

    @cached_property
    def hosts(self) -> dict[str, dict]:
        s = self.scale
        out = {}
        for dom in rules.ALLOWED_DOMAINS:
            hot = f"www.{dom}" in rules.HOT_HOSTS
            n_articles = int((400 if hot else 60) * s) or 8
            pages_per_section = max(2, int((10 if hot else 3) * s))
            out[f"www.{dom}"] = {
                "domain": dom,
                "n_articles": n_articles,
                "pages_per_section": pages_per_section,
            }
        return out


def _rng(*parts) -> random.Random:
    h = hashlib.md5((":".join(str(p) for p in parts) + f":{SEED}").encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _h(*parts) -> int:
    h = hashlib.md5((":".join(str(p) for p in parts) + f":{SEED}").encode()).digest()
    return int.from_bytes(h[:8], "big")


def article_url(host: str, aid: int) -> str:
    return f"https://{host}/news/{aid}-s{aid % 7}"


def listing_url(host: str, section: int, page: int) -> str:
    return f"https://{host}/section/{section}/page/{page}"


def seed_urls(spec: WebSpec) -> list[str]:
    return [listing_url(h, 0, 0) for h in spec.hosts]


# Synthetic robots.txt (reference: ROBOTSTXT_OBEY settings.py:20; per-host
# crawl delay :427-428).  Served as real robots.txt text by fetch() and
# parsed with functions/robots.py — the engine never sees these dicts.
_ROBOTS = {
    "www.fmt.example": {"disallow": ["/section/1"], "allow": [],
                        "crawl_delay": None},
    # REP breadth the parser/compiler must honor end-to-end: a prefix
    # Disallow (all of section 2), a wildcard + $-anchored Disallow
    # (exactly page 1 of every section — NOT page 10), and an equal-length
    # Allow that wins its tie and re-opens section 3's page 1
    "www.tstar.example": {
        "disallow": ["/section/2", "/section/*/page/1$"],
        "allow": ["/section/3/page/1$"],
        "crawl_delay": None,
    },
    "www.ktimes.example": {"disallow": [], "allow": [], "crawl_delay": 1.0},
    # sitemap-bearing host: robots declares a Sitemap URL whose <urlset>
    # lists ORPHAN articles (valid pages no listing ever links to) — the
    # discovery surface only sitemap intake can reach
    "www.bpost.example": {"disallow": [], "allow": [], "crawl_delay": None,
                          "sitemap": True},
}

# orphan articles per sitemap-bearing host: aids [n_articles,
# n_articles + N_ORPHANS) fetch fine but are linked from nowhere
N_ORPHANS = 3


def _has_sitemap(host: str) -> bool:
    return bool(_ROBOTS.get(host, {}).get("sitemap"))


# feed-bearing hosts (active only when spec.feeds): one RSS 2.0 host and
# one Atom host so both grammars get e2e coverage.  Their /feed.xml lists
# orphan articles (aids [n_articles, n_articles + N_ORPHANS)) plus the
# already-reachable aid 0 — intake must dedup it via the normal seen-set
# path, exactly like sitemap intake's aid-0 probe.
_FEED_HOSTS = ("www.mnow.example", "www.inq.example")


def _has_feed(host: str) -> bool:
    return host in _FEED_HOSTS


def feed_url(host: str) -> str:
    return f"https://{host}/feed.xml"


def feed_xml(spec: WebSpec, host: str) -> str:
    """The feed the synthetic web serves at /feed.xml: RSS 2.0 or Atom by
    host-name-length parity (the same split feed_entries_parse's oracle
    uses), carrying the host's orphan articles plus its first regular
    article.  Entry titles/dates are the SAME deterministic values the
    host's listing cards carry, so feed-sourced meta fallbacks agree with
    card-sourced ones."""
    n = spec.hosts[host]["n_articles"]
    aids = list(range(n, n + N_ORPHANS)) + [0]
    if len(host) % 2 == 0:  # RSS 2.0
        items = "\n".join(
            f"  <item><link>{article_url(host, a)}</link>"
            f"<title>{_article_title(host, a)}</title>"
            f"<pubDate>{_article_date(host, a)}</pubDate></item>"
            for a in aids
        )
        return ('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<rss version="2.0"><channel>\n'
                f"<title>{host} feed</title>\n{items}\n</channel></rss>\n")
    entries = "\n".join(  # Atom
        f'  <entry><link href="{article_url(host, a)}"/>'
        f"<title>{_article_title(host, a)}</title>"
        f"<updated>{_article_date(host, a)}</updated></entry>"
        for a in aids
    )
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<feed xmlns="http://www.w3.org/2005/Atom">\n'
            f"<title>{host} feed</title>\n{entries}\n</feed>\n")


def sitemap_url(host: str) -> str:
    return f"https://{host}/sitemap.xml"


def sitemap_xml(spec: WebSpec, host: str) -> str:
    """The <urlset> the synthetic web serves at /sitemap.xml: the host's
    orphan articles plus its first regular article (already reachable —
    intake must dedup it via the normal seen-set path)."""
    n = spec.hosts[host]["n_articles"]
    aids = list(range(n, n + N_ORPHANS)) + [0]
    locs = "\n".join(
        f"  <url><loc>{article_url(host, a)}</loc>"
        f"<lastmod>2021-03-0{(a % 9) + 1}</lastmod></url>" for a in aids
    )
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            f"{locs}\n</urlset>\n")


def robots_txt(host: str) -> str:
    """The robots.txt body the synthetic web serves for ``host``."""
    r = _ROBOTS.get(host, {"disallow": [], "allow": [], "crawl_delay": None})
    lines = ["# synthetic robots", "User-agent: badbot", "Disallow: /", "",
             "User-agent: *"]
    lines += [f"Disallow: {d}" for d in r["disallow"]] or ["Disallow:"]
    lines += [f"Allow: {a}" for a in r.get("allow") or []]
    if r["crawl_delay"]:
        lines.append(f"Crawl-delay: {r['crawl_delay']}")
    if r.get("sitemap"):
        lines += ["", f"Sitemap: {sitemap_url(host)}"]
    return "\n".join(lines) + "\n"


def robots_for_host(host: str) -> dict:
    """Fetch+parse the host's robots.txt → politeness state (the engine's
    per-host robots acquisition; reference fetches robots once per host)."""
    from crawlspark.functions.robots import parse_robots_txt

    parsed = parse_robots_txt(robots_txt(host))
    delay = parsed["crawl_delay"] or rules.DEFAULT_CRAWL_DELAY_S
    return {
        "disallow": list(parsed["disallow"]),
        "allow": list(parsed["allow"]),
        "crawl_delay_s": delay,
        "budget_per_batch": max(1, int(rules.BATCH_PERIOD_S / delay)),
        "sitemaps": list(parsed.get("sitemaps", [])),
    }


def _sentence(rng: random.Random, n: int, keyword: str | None = None) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n)]
    if keyword:
        ws.insert(rng.randrange(len(ws) + 1), keyword)
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _article_title(host: str, aid: int) -> str:
    rng = _rng("title", host, aid)
    kw = rng.choice(rules.SEARCH_KEYWORDS) if rng.random() < 0.8 else None
    return _sentence(rng, rng.randint(5, 9), kw)[:-1]


def _article_date(host: str, aid: int) -> str:
    rng = _rng("date", host, aid)
    if rng.random() < 0.8:
        y = rng.randint(2020, 2022)
    else:
        y = rng.choice([2016, 2017, 2018, 2019, 2024])
    m, d = rng.randint(1, 12), rng.randint(1, 28)
    months = ["January", "February", "March", "April", "May", "June", "July",
              "August", "September", "October", "November", "December"]
    style = rng.randrange(_DATE_STYLES)
    if style == 0:
        return f"{y:04d}-{m:02d}-{d:02d}"
    if style == 1:
        return f"{months[m-1]} {d}, {y}"
    if style == 2:
        return f"PUBLISHED: {months[m-1]} {d}, {y} - 10:30 AM"
    if style == 3:
        return f"{d:02d} {months[m-1][:3]} {y} | 08:15 PM"
    if style == 4:
        return f"{rng.randint(2, 20)} days ago"  # relative → year 2023
    return f"{months[m-1]} {d}, {y} @ Asia Desk"


def _mangle_link(rng: random.Random, url: str) -> str:
    """Emit a malformed variant that fix_url must canonicalize back."""
    style = rng.randrange(5)
    if style == 0:
        return "https://https://" + url.split("://", 1)[1]
    if style == 1:
        return "htps://" + url.split("://", 1)[1]
    if style == 2:
        return "/" + url.split("/", 3)[3]  # relative
    if style == 3:
        return url + "#section"
    return "  " + url + "  "


def _junk_link(rng: random.Random, host: str) -> str:
    return rng.choice(
        [
            "mailto:editor@example.com",
            "javascript:void(0)",
            "whatsapp://send?text=hi",
            f"https://{host}/brochure.pdf",
            f"https://shop.{host.removeprefix('www.')}/deals",
            "https://play.google.com/store/apps/details?id=x",
            "https://othersite.example/article/1",
            rules.INCOMPLETE_ARTICLES[0],
        ]
    )


def listing_html(spec: WebSpec, host: str, section: int, page: int) -> str:
    cfg = spec.hosts[host]
    rng = _rng("listing", host, section, page)
    lmeta = ""
    if spec.meta_robots and _h("mrobots-l", host, section, page) % 8 == 0:
        lmeta = "<meta name='robots' content='nofollow'>"
    if spec.feeds and _has_feed(host):
        # standard feed autodiscovery link in the head (RSS or Atom MIME
        # by the same host parity feed_xml serves); a HEAD link, invisible
        # to extract_links' a@href walk — only cfg.use_feeds follows it
        mime = ("application/rss+xml" if len(host) % 2 == 0
                else "application/atom+xml")
        lmeta += (f"<link rel=\"alternate\" type=\"{mime}\" "
                  f"title=\"feed\" href=\"{feed_url(host)}\">")
    parts = [f"<html>{lmeta}<body><h1>Section {section}</h1><div class='listing'>"]
    # article cards
    for slot in range(spec.cards_per_page):
        aid = _h("card", host, section, page, slot) % cfg["n_articles"]
        url = article_url(host, aid)
        if spec.tracking_params and rng.random() < 0.5:
            # per-LISTING-slot click ids: the same article reached from
            # different pages carries different params, so without
            # strip_tracking each variant is a distinct frontier key
            url += (f"?utm_source=card&gclid=g"
                    f"{_h('gclid', host, section, page, slot) % 997}")
        href = _mangle_link(rng, url) if rng.random() < 0.3 else url
        title = _article_title(host, aid)
        date = _article_date(host, aid)
        if "mnow.example" in host:
            # card-markup variants the mnow rule row's selector UNION must
            # cover (reference nst card selector groups :1070-1101)
            parts.append([
                f"<div class='card'><a href=\"{href}\">{title}</a>"
                f"<span class='date'>{date}</span></div>",
                f"<div class='article-teaser'><a href=\"{href}\">{title}</a>"
                f"<time>{date}</time></div>",
                f"<li class='story'><a href=\"{href}\">{title}</a>"
                f"<time>{date}</time></li>",
            ][slot % 3])
        elif "cna.example" in host and slot % 3 == 2:
            # attribute-carried quick-link card (reference :1366-1373) —
            # the cna rule row must read data-link_absolute/data-heading
            parts.append(
                f"<div class='quick-link' data-heading=\"{title}\" "
                f"data-link_absolute=\"{href}\">"
                f"<span class='date'>{date}</span></div>"
            )
        elif "fmt.example" in host:
            # anchor-in-container variants the fmt rule row must cover
            # (reference malaysianow selector set :1151-1165)
            parts.append([
                f"<div class='group'><a href=\"{href}\">{title}</a>"
                f"<time>{date}</time></div>",
                f"<li class='story-item'><a href=\"{href}\">{title}</a></li>",
                f"<div class='flex-1'><a href=\"{href}\">{title}</a>"
                f"<span class='date'>{date}</span></div>",
            ][slot % 3])
        else:
            parts.append(
                f"<div class='card'><a href=\"{href}\">{title}</a>"
                f"<span class='date'>{date}</span></div>"
            )
    # junk + blocked links (exercise the skip filter)
    for _ in range(2):
        parts.append(f"<a href=\"{_junk_link(rng, host)}\">more</a>")
    parts.append("</div><nav>")
    # onclick-carried article link (reference C8: window.open extraction)
    if rng.random() < 0.3:
        aid = _h("onclick", host, section, page) % cfg["n_articles"]
        parts.append(
            f"<a onclick=\"window.open('{article_url(host, aid)}')\">popup</a>"
        )
    # next-page chain + cross-section links.  ktimes/bpost carry the
    # selector-shaped pagination markup their rule rows key on in targeted
    # mode (reference khmertimes a.next.page-numbers :809-811, bangkokpost
    # p.page-Navigation :797-802); entire-site mode follows any anchor, so
    # the shape is invisible there.
    if page + 1 < cfg["pages_per_section"]:
        nxt = listing_url(host, section, page + 1)
        if "ktimes.example" in host:
            parts.append(f"<a class='next page-numbers' href=\"{nxt}\">Next Page</a>")
        elif "bpost.example" in host:
            parts.append(f"<p class='page-Navigation'><a href=\"{nxt}\">Next Page</a></p>")
        else:
            parts.append(f"<a href=\"{nxt}\">Next Page</a>")
    if spec.rel_nofollow:
        # a rel-blocked "promoted" article anchor: followable only when
        # cfg.obey_link_rel is off (the control run proves rel'd anchors
        # are plain links to the default walk)
        aid2 = _h("relnf-a", host, section, page) % cfg["n_articles"]
        rel = ("nofollow" if _h("relnf-k", host, section, page) % 2 == 0
               else "sponsored noopener")
        parts.append(
            f"<a rel=\"{rel}\" href=\"{article_url(host, aid2)}\">promoted</a>"
        )
    for s2 in range(spec.sections):
        if s2 != section and rng.random() < 0.5:
            if spec.rel_nofollow and _h("relnf-s", host, section, s2) % 2 == 0:
                parts.append(
                    f"<a rel=\"nofollow\" href=\"{listing_url(host, s2, 0)}\">Sec {s2}</a>"
                )
            else:
                parts.append(f"<a href=\"{listing_url(host, s2, 0)}\">Sec {s2}</a>")
    parts.append("</nav></body></html>")
    return "".join(parts)


def article_html(spec: WebSpec, host: str, aid: int) -> str:
    cfg = spec.hosts[host]
    rng = _rng("article", host, aid)
    title = _article_title(host, aid)
    date = _article_date(host, aid)
    ameta = ""
    if spec.meta_robots:
        hm = _h("mrobots", host, aid) % 20
        if hm == 0:
            ameta = "<meta name='robots' content='noindex'>"
        elif hm == 1:
            # attribute order reversed on purpose: the extractor must
            # accept content-before-name markup too
            ameta = "<meta content='noindex,nofollow' name='robots'>"
    if spec.canonical_links:
        cu = article_url(host, aid)
        if _h("canon-order", host, aid) % 2 == 0:
            ameta += f"<link rel='canonical' href='{cu}'>"
        else:  # reversed attribute order variant
            ameta += f"<link href='{cu}' rel='canonical'>"
    # ~3% empty-body redirect pages (reference :2389-2432)
    if rng.random() < 0.03:
        target = article_url(host, (aid + 1) % cfg["n_articles"])
        return (
            f"<html>{ameta}<body><h1>{title}</h1><span class='pubdate'>{date}</span>"
            f"<div class='article-body'></div>"
            f"<a href=\"{target}\">Click here for article</a></body></html>"
        )
    kw = rng.choice(rules.SEARCH_KEYWORDS) if rng.random() < 0.5 else None
    paras = []
    n_paras = rng.randint(3, 10)
    for i in range(n_paras):
        txt = _sentence(rng, rng.randint(8, 20), kw if i == 0 else None)
        if rng.random() < 0.15:
            txt += " (Photo: Reuters)"
        if "inq.example" in host and rng.random() < 0.3:
            txt += " <strong>ADVERTISEMENT</strong>"
        paras.append(f"<p>{txt}</p>")
        if rng.random() < 0.25:
            ref = f"https://img.{cfg['domain']}/m/{_h('img', host, aid, i) % 10**6}.jpg"
            cap = f"Workers at a site. Photo: Agency {i}"
            paras.append(f"<figure><img src=\"{ref}\"><figcaption>{cap}</figcaption></figure>")
    if rng.random() < 0.2:
        items = "".join(
            f"<li>{_sentence(rng, 5)[:-1]}</li>" for _ in range(rng.randint(2, 4))
        )
        paras.append(f"<ul>{items}</ul>")
    if "bpost.example" in host and rng.random() < 0.4:
        paras.append("<div class='articlePhoto'><p>PHOTO GALLERY ignore me</p></div>")
    if "ktimes.example" in host:
        # paragraphs the khmertimes rule row must DROP (reference :2325)
        if rng.random() < 0.3:
            paras.append(f"<p>Also Read: {_sentence(rng, 6)}</p>")
        if rng.random() < 0.3:
            paras.append("<div class='entry-navigation'><p>prev | next</p></div>")
    if "tstar.example" in host:
        # markup the tstar rule row must DROP (reference :2195-2211)
        if rng.random() < 0.3:
            paras.append("<p class='caption'>At the scene. Photo handout</p>")
        if rng.random() < 0.3:
            paras.append(f"<p>ALSO READ: {_sentence(rng, 6)}</p>")
        if rng.random() < 0.2:
            paras.append("<div class='sponsored-panel'><p>sponsored content</p></div>")
        if rng.random() < 0.2:
            paras.append("<p>story with <span class='inline-caption'>embedded caption</span></p>")
    paras.append("<div class='ad'><p>SPONSORED buy now</p></div>")
    # boilerplate footer (reference phrase list :1658-1889)
    if rng.random() < 0.4:
        for _ in range(rng.randint(1, 3)):
            phrase = rng.choice(rules.FOOTNOTE_PHRASES)
            if rng.random() < 0.3 and " " in phrase:
                cut = phrase.rindex(" ")
                paras.append(f"<p>{phrase[:cut].capitalize()}</p><p>{phrase[cut+1:]} now</p>")
            else:
                paras.append(f"<p>{phrase.capitalize()} today.</p>")
    if spec.epoch > 0 and _h("epoch-mut", host, aid) % 3 == 0:
        # epoch-mutated subset (see WebSpec.epoch): a trailing update
        # paragraph whose text is a fresh deterministic sentence per
        # (article, epoch) — successive epochs keep changing these
        # articles while the other two thirds stay byte-identical
        erng = _rng("epoch-text", host, aid, spec.epoch)
        paras.append(f"<p>Update {spec.epoch}: {_sentence(erng, 10)}</p>")
    body = "".join(paras)
    # per-host container + header variants: each host's pages rotate
    # through its rule row's selector-fallback branches (reference: the
    # per-site DOM variance the 4-branch XPaths exist for)
    if "ktimes.example" in host:
        container = ["entry-content", "article-content", "content-main",
                     "article-body"][aid % 4]
        open_t, close_t = f"<div class='{container}'>", "</div>"
        if aid % 5 == 0:  # h2.entry-title + time.entry-time variant
            header = (f"<h2 class='entry-title'>{title}</h2>"
                      f"<time class='entry-time'>{date}</time>")
        else:
            header = f"<h1>{title}</h1><span class='pubdate'>{date}</span>"
    elif "bpost.example" in host:
        open_t, close_t = [
            ("<div class='articl-content'>", "</div>"),
            ("<section class='article-body'>", "</section>"),
            ("<div class='article-content'>", "</div>"),
            ("<div class='article-body'>", "</div>"),
        ][aid % 4]
        header = f"<h1>{title}</h1><span class='pubdate'>{date}</span>"
        if aid % 7 == 0:
            # decorated-date variant the bpost date_splits chain must
            # undo (reference :2297-2300)
            header = (f"<h1>{title}</h1>"
                      f"<span class='pubdate'>PUBLISHED : {date} at 12:42</span>")
    else:
        open_t, close_t = "<div class='article-body'>", "</div>"
        header = f"<h1>{title}</h1><span class='pubdate'>{date}</span>"
        if "cna.example" in host and aid % 11 == 0:
            # og:title-only variant (reference :1367: no h1, title in
            # meta[property="og:title"]::attr(content))
            header = (f"<meta property='og:title' content=\"{title}\">"
                      f"<span class='pubdate'>{date}</span>")
        elif "stimes.example" in host and aid % 9 == 0:
            # bare-time variant (reference :2086: no pubdate span, no time
            # text — date only in time[itemprop=datePublished]@datetime)
            header = (f"<h1>{title}</h1>"
                      f"<time itemprop='datePublished' datetime=\"{date}\"></time>")
        elif "stimes.example" in host and aid % 9 == 5:
            # byline-decorated variant the stimes date_splits must undo
            # (reference :2082-2083)
            header = (f"<h1>{title}</h1>"
                      f"<span class='pubdate'>PUBLISHED: {date}</span>")
    return (
        f"<html>{ameta}<body>{header}"
        f"{open_t}{body}{close_t}"
        f"<div class='related'><a href=\"{article_url(host, (aid * 7 + 1) % cfg['n_articles'])}\">rel</a></div>"
        f"</body></html>"
    )


def classify_url(url: str) -> tuple[str, str, dict]:
    """url → (page_kind, host, params); page_kind ∈ listing|article|other."""
    try:
        rest = url.split("://", 1)[1]
    except IndexError:
        return "other", "", {}
    host, _, path = rest.partition("/")
    path = "/" + path
    if path == "/sitemap.xml":
        return "sitemap", host, {}
    if path == "/feed.xml":
        return "feed", host, {}
    if "/section/" in path and "/page/" in path:
        try:
            section = int(path.split("/section/")[1].split("/")[0])
            page = int(path.split("/page/")[1].split("/")[0].split("?")[0])
            return "listing", host, {"section": section, "page": page}
        except (ValueError, IndexError):
            return "other", host, {}
    if "/news/" in path:
        try:
            aid = int(path.split("/news/")[1].split("-")[0])
            return "article", host, {"aid": aid}
        except (ValueError, IndexError):
            return "other", host, {}
    return "other", host, {}


def fetch(spec: WebSpec, url: str, attempt: int = 0) -> tuple[int, str, str, int]:
    """Deterministic fetch → (status, final_url, body, elapsed_ms).

    Status distribution mirrors the reference's handled codes: retryable
    5xx that succeed on retry (middlewares.py:38-40), 202 skips (:883),
    404s.  elapsed_ms is deterministic (hash-derived) so throughput
    benchmarks measure the engine, not a sleep.
    """
    kind, host, params = classify_url(url)
    hv = _h("status", url)
    elapsed = 20 + hv % 180
    if kind == "other" or host == "":
        return 404, url, "", elapsed
    spec_hosts = spec.hosts
    if host not in spec_hosts:
        return 404, url, "", elapsed
    if host in spec.dead_hosts:
        return 503, url, "", elapsed  # down host: every attempt times out
    pct = hv % 100
    if pct < 2 and attempt == 0:
        return 503, url, "", elapsed
    if pct == 2:
        return 202, url, "", elapsed
    if pct == 3 and kind == "article":
        return 404, url, "", elapsed
    cfg = spec_hosts[host]
    if kind == "sitemap":
        if not _has_sitemap(host):
            return 404, url, "", elapsed
        return 200, url, sitemap_xml(spec, host), elapsed
    if kind == "feed":
        if not (spec.feeds and _has_feed(host)):
            return 404, url, "", elapsed
        return 200, url, feed_xml(spec, host), elapsed
    if kind == "listing":
        if params["section"] >= spec.sections or params["page"] >= cfg["pages_per_section"]:
            return 404, url, "", elapsed
        return 200, url, listing_html(spec, host, params["section"], params["page"]), elapsed
    aid = params["aid"]
    has_orphans = _has_sitemap(host) or (spec.feeds and _has_feed(host))
    if aid >= cfg["n_articles"] + (N_ORPHANS if has_orphans else 0):
        return 404, url, "", elapsed
    final = article_url(host, aid)  # redirect: query/alias forms collapse
    if spec.canonical_links and "?" in url:
        # alias-serving mode: the server answers 200 AT the alias URL
        # (no redirect) and the page declares <link rel="canonical">
        # instead — the common real-web shape cfg.use_canonical_link
        # exists for
        final = url
    return 200, final, article_html(spec, host, aid), elapsed


def fetch_encoded(spec: WebSpec, url: str, attempt: int = 0) -> tuple[int, str, bytes | None, str | None, int]:
    """Deterministic fetch at the TRANSFER level →
    (status, final_url, raw_body bytes, content_encoding, elapsed_ms).

    Transfer-encoding variants (reference middlewares.py:42-61):
      * ~8% of 200s arrive gzip-encoded (``content_encoding='gzip'``);
      * one hash slot is a CORRUPT gzip on attempt 0 (truncated stream)
        that succeeds on retry — GzipRetryMiddleware semantics;
      * one hash slot declares ``gzip`` but carries a plain body —
        ForgivingHttpCompressionMiddleware semantics (decode as-is).
    ``fetch`` above remains the decoded application-level view (same
    bodies); the engine pipeline and the oracle consume THIS function plus
    functions.transfer.decode_body_py so the middleware policy is a
    tested, shared code path.
    """
    import gzip as _gzip

    status, final, body, elapsed = fetch(spec, url, attempt)
    if status != 200:
        return status, final, (body or "").encode("utf-8"), None, elapsed
    ev = _h("enc", url) % 100
    raw = body.encode("utf-8")
    if ev < 8:
        return status, final, _gzip.compress(raw, mtime=0), "gzip", elapsed
    if ev == 8:
        good = _gzip.compress(raw, mtime=0)
        if attempt == 0:
            return status, final, good[: max(4, len(good) // 2)], "gzip", elapsed
        return status, final, good, "gzip", elapsed
    if ev == 9:
        return status, final, raw, "gzip", elapsed  # header lies: plain body
    return status, final, raw, None, elapsed
