"""robots.txt parsing + the fetch_robots stage vs the crawl's rule table."""

from bisque_spark.functions.robots import (
    fetch_robots,
    parse_robots_txt,
    synth_robots_txt,
)
from bisque_spark.synth import World, robots_rows


def test_parse_basic():
    txt = """
# comment
User-agent: *
Crawl-delay: 2.5
Disallow: /admin
Disallow: /private
"""
    rules = parse_robots_txt(txt)
    assert rules == {"crawl_delay": 2.5, "disallow": ["/admin", "/private"]}


def test_agent_specific_group_wins():
    txt = """
User-agent: *
Disallow: /everything

User-agent: bisque
Crawl-delay: 1
Disallow: /only-this
"""
    rules = parse_robots_txt(txt, user_agent="bisque/1.0")
    assert rules["disallow"] == ["/only-this"]
    star = parse_robots_txt(txt, user_agent="otherbot")
    assert star["disallow"] == ["/everything"]


def test_empty_disallow_allows_all():
    txt = "User-agent: *\nDisallow:\n"
    assert parse_robots_txt(txt)["disallow"] == []


def test_missing_or_garbage():
    assert parse_robots_txt("") == {"crawl_delay": 1.0, "disallow": []}
    assert parse_robots_txt("not a robots file at all")["disallow"] == []


def test_multi_agent_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(txt, user_agent="b")["disallow"] == ["/x"]


def test_synth_roundtrip_matches_rule_table():
    world = World(n_hosts=25)
    want = {r["host"]: r for r in robots_rows(world)}
    for host, rules in want.items():
        parsed = parse_robots_txt(synth_robots_txt(world, host))
        assert parsed["crawl_delay"] == rules["crawl_delay"], host
        assert parsed["disallow"] == rules["disallow"], host


def test_fetch_robots_stage(spark):
    world = World(n_hosts=10)
    hosts = spark.createDataFrame(
        [(world.host(i),) for i in range(10)], "host string"
    )
    table = {r["host"]: r for r in fetch_robots(hosts, world).collect()}
    want = {r["host"]: r for r in robots_rows(world)}
    assert set(table) == set(want)
    for h in want:
        assert table[h]["crawl_delay"] == want[h]["crawl_delay"]
        assert list(table[h]["disallow"]) == want[h]["disallow"]
