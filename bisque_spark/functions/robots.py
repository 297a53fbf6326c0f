"""robots.txt parsing → the per-host politeness rule table.

North-star: "crawl-delay from robots.txt". The reference has no robots
handling; semantics here follow the de-facto standard (RFC 9309 +
common Crawl-delay extension): user-agent groups, most-specific agent
match (exact product token beats ``*``), ``Disallow`` path prefixes
(empty Disallow = allow all), ``Crawl-delay`` seconds.

``fetch_robots`` is the Arrow-batched stage turning a host list into
the robots table consumed by ``operators/schedule.apply_robots`` —
in the sandbox the robots.txt body comes from the deterministic synth
(``synth_robots_txt``), which is generated so it parses back to exactly
``synth.robots_rows`` (pinned by tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from bisque_spark.hashing import xxh64
from bisque_spark.synth import World, robots_rows


def parse_robots_txt(text: str, user_agent: str = "bisque") -> dict:
    """→ {"crawl_delay": float, "disallow": [path-prefixes]}."""
    groups: list[tuple[list[str], dict]] = []
    agents: list[str] = []
    current: dict | None = None
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if current is not None and current["_rules_seen"]:
                groups.append((agents, current))
                agents = []
                current = None
            if current is None:
                current = {"crawl_delay": None, "disallow": [], "_rules_seen": False}
            agents.append(value.lower())
        elif current is not None:
            if key == "disallow":
                current["_rules_seen"] = True
                if value:
                    current["disallow"].append(value)
            elif key == "crawl-delay":
                current["_rules_seen"] = True
                try:
                    current["crawl_delay"] = float(value)
                except ValueError:
                    pass
            elif key == "allow":
                current["_rules_seen"] = True  # recognized, not modeled
    if current is not None:
        groups.append((agents, current))

    ua = user_agent.lower()
    chosen = None
    for agent_list, rules in groups:
        if any(a != "*" and a in ua for a in agent_list):
            chosen = rules
            break
    if chosen is None:
        for agent_list, rules in groups:
            if "*" in agent_list:
                chosen = rules
                break
    if chosen is None:
        return {"crawl_delay": 1.0, "disallow": []}
    return {
        "crawl_delay": chosen["crawl_delay"] if chosen["crawl_delay"] is not None else 1.0,
        "disallow": list(chosen["disallow"]),
    }


def synth_robots_txt(world: World, host: str) -> str:
    """Deterministic robots.txt body whose parse equals the
    ``robots_rows`` entry for this host (same hash-derived rules)."""
    h = xxh64(("robots:" + host).encode())
    crawl_delay = 1.0 + (h % 4)
    lines = ["# synthetic robots", "User-agent: *", f"Crawl-delay: {crawl_delay}"]
    if h % 3 == 0:
        lines.append("Disallow: /admin")
    else:
        lines.append("Disallow:")
    lines.append("")
    return "\n".join(lines)


def fetch_robots(hosts: DataFrame, world: World) -> DataFrame:
    """host rows → robots table (host, crawl_delay, disallow) by
    fetching+parsing robots.txt per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "crawl_delay": [], "disallow": []}
            for host in pdf["host"]:
                rules = parse_robots_txt(synth_robots_txt(world, host))
                out["host"].append(host)
                out["crawl_delay"].append(rules["crawl_delay"])
                out["disallow"].append(rules["disallow"])
            yield pd.DataFrame(out)

    return hosts.select("host").distinct().mapInPandas(
        run, schema="host string, crawl_delay double, disallow array<string>"
    )
