"""Minimal robots.txt parser (reference: ROBOTSTXT_OBEY settings.py:20,
parsed by Protego per requirements.txt:50; this is a clean-room parser of
the subset the engine enforces: User-agent groups, Disallow prefixes,
Crawl-delay).

Rules applied for a given agent: the most specific matching User-agent
group wins ('*' is the fallback); empty Disallow means allow-all.
"""

from __future__ import annotations


def parse_robots_txt(text: str, agent: str = "crawlspark") -> dict:
    """→ {'disallow': [prefixes], 'crawl_delay': float | None}."""
    groups: list[tuple[list[str], dict]] = []  # (agents, rules)
    cur_agents: list[str] = []
    cur_rules: dict = {"disallow": [], "crawl_delay": None}
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents = []
        cur_rules = {"disallow": [], "crawl_delay": None}
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
        elif key == "disallow":
            in_group_body = True
            if val:
                cur_rules["disallow"].append(val)
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_rules["crawl_delay"] = float(val)
            except ValueError:
                pass
    flush()

    agent = agent.lower()
    exact = next((r for ags, r in groups if agent in ags), None)
    if exact is not None:
        return exact
    star = next((r for ags, r in groups if "*" in ags), None)
    return star if star is not None else {"disallow": [], "crawl_delay": None}
