"""robots.txt parser (clean-room Protego-subset; ROBOTSTXT_OBEY fidelity)."""

from crawlspark.functions.robots import parse_robots_txt
from crawlspark.synthetic import robots_for_host, robots_txt

SAMPLE = """
# comment
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2.5

User-agent: crawlspark
Disallow: /special
"""


def test_star_group():
    r = parse_robots_txt(SAMPLE, agent="someone-else")
    assert r["disallow"] == ["/private", "/tmp/"]
    assert r["crawl_delay"] == 2.5


def test_exact_agent_wins():
    r = parse_robots_txt(SAMPLE, agent="crawlspark")
    assert r["disallow"] == ["/special"]
    assert r["crawl_delay"] is None


def test_badbot_blocked_everywhere():
    r = parse_robots_txt(SAMPLE, agent="badbot")
    assert r["disallow"] == ["/"]


def test_empty_and_garbage():
    assert parse_robots_txt("")["disallow"] == []
    assert parse_robots_txt("nonsense without colons\n\n")["disallow"] == []
    r = parse_robots_txt("User-agent: *\nDisallow:\nCrawl-delay: soon\n")
    assert r["disallow"] == [] and r["crawl_delay"] is None


def test_multiple_agents_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(txt, agent="b")["disallow"] == ["/x"]


def test_synthetic_hosts_roundtrip():
    """The engine's politeness state comes from parsing served robots.txt."""
    assert "Disallow: /section/1" in robots_txt("www.fmt.example")
    st = robots_for_host("www.fmt.example")
    assert st["disallow"] == ["/section/1"]
    kt = robots_for_host("www.ktimes.example")
    assert kt["crawl_delay_s"] == 1.0 and kt["budget_per_batch"] == 30
    default = robots_for_host("www.cna.example")
    assert default["disallow"] == [] and default["budget_per_batch"] == 60
