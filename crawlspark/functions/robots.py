"""Robots.txt parser + REP matcher (reference: ROBOTSTXT_OBEY
settings.py:20, parsed by Protego per requirements.txt:50; this is a
clean-room implementation of the Robots Exclusion Protocol subset the
engine enforces: User-agent groups, Disallow AND Allow rules with `*`
wildcards and the `$` end anchor, longest-match precedence with
allow-wins-ties, Crawl-delay).

Rules applied for a given agent: the most specific matching User-agent
group wins ('*' is the fallback); empty Disallow means allow-all.
"""

from __future__ import annotations

import re


def _empty_rules() -> dict:
    return {"disallow": [], "allow": [], "crawl_delay": None, "sitemaps": []}


def parse_robots_txt(text: str, agent: str = "crawlspark") -> dict:
    """→ {'disallow': [patterns], 'allow': [patterns],
    'crawl_delay': float | None, 'sitemaps': [urls]}.

    ``Sitemap:`` directives are GLOBAL per the sitemaps.org protocol —
    they apply regardless of which User-agent group is selected, so they
    are collected across the whole file and attached to the returned
    group's rules."""
    sitemaps: list[str] = []
    groups: list[tuple[list[str], dict]] = []  # (agents, rules)
    cur_agents: list[str] = []
    cur_rules: dict = _empty_rules()
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents = []
        cur_rules = _empty_rules()
        in_group_body = False

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow"):
            in_group_body = True
            if val:
                cur_rules[key].append(val)
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_rules["crawl_delay"] = float(val)
            except ValueError:
                pass
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
    flush()

    agent = agent.lower()
    exact = next((r for ags, r in groups if agent in ags), None)
    star = next((r for ags, r in groups if "*" in ags), None)
    out = dict(exact if exact is not None else
               star if star is not None else _empty_rules())
    out["sitemaps"] = sitemaps
    return out


def pattern_rx(pat: str) -> str:
    """Robots path pattern → UNanchored regex body (`*` → any sequence,
    trailing `$` → end anchor; everything else literal).  Callers anchor
    at the path start: Python via re.match, Spark via a leading `^`."""
    end = pat.endswith("$")
    body = pat[:-1] if end else pat
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return rx + "$" if end else rx


def path_allowed(path: str, disallow: list[str] | None,
                 allow: list[str] | None = None) -> bool:
    """REP longest-match: among all matching rules the one with the
    longest pattern wins; ties go to Allow; no match → allowed.
    Equivalently (the form both the Python and the compiled-regex engine
    paths use): BLOCKED iff some Disallow matches and no Allow with
    pattern length >= that Disallow's also matches."""
    dis = disallow or []
    alw = allow or []
    matched_allow_lens = [
        len(a) for a in alw if re.match(pattern_rx(a), path) is not None
    ]
    for d in dis:
        if re.match(pattern_rx(d), path) is None:
            continue
        if not any(la >= len(d) for la in matched_allow_lens):
            return False
    return True
