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


RFC_TXT = """
User-agent: bisque
Allow: /p
Disallow: /
Allow: /folder/
Disallow: /folder
Allow: /page
Disallow: /*.ph
Allow: /$
Disallow: /admin*private$
Crawl-delay: 2
"""


def test_rfc9309_longest_match_semantics():
    """Allow + wildcards + $ + longest-rule-wins (allow breaks ties) —
    hand-derived verdicts per RFC 9309 §2.2.2 mechanics."""
    from bisque_spark.functions.robots import (
        parse_robots_rules,
        robots_allowed_py,
    )

    parsed = parse_robots_rules(RFC_TXT, "bisque")
    assert parsed["crawl_delay"] == 2.0
    rules = parsed["rules"]
    cases = {
        "/page": True,        # /page (5) beats /*.ph? both 5 → allow wins
        "/p": True,           # /p beats /
        "/x": False,          # only / matches
        "/folder/page": True,  # /folder/ (8, allow) beats /folder (7)
        "/photo.php": False,   # /*.ph (5) beats /p (2)
        "/page.php5": True,    # /page (5) ties /*.ph (5) → allow
        "/": True,            # /$ (2, allow) beats / (1)
        "/adminXprivate": False,   # wildcard + $ anchor
        "/adminXprivateY": True,   # $ anchor fails → only / matches? no — '/' matches (disallow, len 1); /p? no. False!
    }
    # fix the last expectation: '/' (len 1, disallow) matches everything
    cases["/adminXprivateY"] = False
    for path, want in cases.items():
        assert robots_allowed_py(rules, path) is want, (
            path,
            want,
            [r for r in rules],
        )


def test_apply_robots_rules_matches_python(spark):
    """JVM array_max longest-match == robots_allowed_py over random
    rule sets and paths (hypothesis)."""
    import random

    import pyspark.sql.functions as F

    from bisque_spark.functions.robots import (
        _compile_rule_re,
        apply_robots_rules,
        robots_allowed_py,
    )

    rng = random.Random(5)
    segs = ["/a", "/b", "/ab", "/a/b", "/*.php", "/a$", "/*b", "/"]
    hosts = []
    for h in range(12):
        n = rng.randint(0, 5)
        rules = [
            {
                "re": _compile_rule_re(p),
                "len": len(p),
                "allow": rng.randint(0, 1),
            }
            for p in rng.sample(segs, n)
        ]
        hosts.append((f"h{h}.test", 1.0, rules))
    robots = spark.createDataFrame(
        hosts,
        "host string, crawl_delay double, "
        "rules array<struct<re:string, len:int, allow:int>>",
    )
    paths = ["/a", "/b", "/ab", "/a/b/c", "/x.php", "/a", "/", "/bb"]
    rows = [
        (f"http://h{h}.test{p}", f"h{h}.test")
        for h in range(12)
        for p in paths
    ]
    frontier = spark.createDataFrame(rows, "url string, host string")
    got = {r["url"] for r in apply_robots_rules(frontier, robots).collect()}
    for url, host in rows:
        rules = next(r[2] for r in hosts if r[0] == host)
        path = url.split(".test")[1]
        want = robots_allowed_py(
            [{"re": x["re"], "len": x["len"], "allow": x["allow"]} for x in rules],
            path,
        )
        assert (url in got) is want, (url, rules)
