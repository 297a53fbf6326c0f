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


# ---- full RFC 9309 rule matching (allow + wildcards + $, longest wins) -------
#
# The crawl loop keeps the simpler prefix-disallow contract (pinned by
# the oracle crawler); this is the full-fidelity variant for real
# robots.txt files: Allow lines, '*' wildcards, '$' end anchor,
# longest-rule-wins with allow breaking ties (RFC 9309 §2.2.2).

import re as _re


def _compile_rule_re(path: str) -> str:
    """robots path pattern → anchored Java/Python-compatible regex:
    '*' = any run, trailing '$' = end anchor, else prefix match."""
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    pat = "^" + ".*".join(_re.escape(part) for part in body.split("*"))
    return pat + "$" if anchored else pat


def parse_robots_rules(text: str, user_agent: str = "bisque") -> dict:
    """→ {"crawl_delay": float, "rules": [{"re", "len", "allow"}]}.

    Same user-agent group selection as parse_robots_txt; rules keep
    BOTH Allow and Disallow lines with their specificity (octet length
    of the pattern, the RFC's longest-match key)."""
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
                current = {"crawl_delay": None, "rules": [], "_rules_seen": False}
            agents.append(value.lower())
        elif current is not None:
            if key in ("disallow", "allow"):
                current["_rules_seen"] = True
                if value:
                    current["rules"].append(
                        {
                            "re": _compile_rule_re(value),
                            "len": len(value),
                            "allow": 1 if key == "allow" else 0,
                        }
                    )
            elif key == "crawl-delay":
                current["_rules_seen"] = True
                try:
                    current["crawl_delay"] = float(value)
                except ValueError:
                    pass
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
        return {"crawl_delay": 1.0, "rules": []}
    return {
        "crawl_delay": chosen["crawl_delay"]
        if chosen["crawl_delay"] is not None
        else 1.0,
        "rules": list(chosen["rules"]),
    }


def robots_allowed_py(rules: list[dict], path: str) -> bool:
    """Python twin of the JVM matcher (oracle for tests): longest
    matching rule wins; at equal length allow beats disallow; no match
    → allowed."""
    best = None  # (len, allow)
    for r in rules:
        if _re.match(r["re"], path):
            cand = (r["len"], r["allow"])
            if best is None or cand > best:
                best = cand
    return best is None or best[1] == 1


def apply_robots_rules(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Full-RFC allow/disallow evaluation, entirely JVM-side: the
    per-host rule array is tiny, so the longest-match argmax is one
    ``array_max`` over structs (len, allow) — lexicographic struct
    ordering makes allow win length ties for free. No Python in the
    plan; robots broadcast like apply_robots.

    robots schema: host, crawl_delay, rules array<struct<re:string,
    len:int, allow:int>>.
    """
    import pyspark.sql.functions as F

    path = F.parse_url(F.col("url"), F.lit("PATH"))
    joined = frontier.join(F.broadcast(robots), on="host", how="left")
    matches = F.filter(
        F.transform(
            F.col("rules"),
            lambda r: F.when(
                F.regexp_like(path, r["re"]),  # rlike() only takes a
                # literal pattern; regexp_like accepts a Column
                F.struct(r["len"].alias("len"), r["allow"].alias("allow")),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    best = F.array_max(matches)
    allowed = (
        F.col("rules").isNull()
        | best.isNull()
        | (best.getField("allow") == 1)
    )
    return joined.where(allowed).withColumn(
        "crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(1.0))
    ).drop("rules")


def parse_robots_sitemaps(text: str) -> list[str]:
    """`Sitemap:` directives (RFC 9309 §2.3 "other records" / the
    sitemaps.org robots.txt extension): GLOBAL lines, not scoped to a
    user-agent group, absolute URLs, any number of them. Returned in
    file order; the caller applies its own location policy (the engine
    rejects cross-host advertisements conservatively —
    functions/sitemap.py)."""
    out = []
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def synth_robots_txt(world: World, host: str) -> str:
    """Deterministic robots.txt body whose parse equals the
    ``robots_rows`` entry for this host (same hash-derived rules).
    Sitemap hosts advertise their sitemap via the `Sitemap:` line
    (how real crawlers discover them); a deterministic third of hosts
    ALSO advertise a cross-host sitemap the engine's same-host policy
    must reject (group parsers ignore the global `Sitemap:` key, so
    crawl_delay/disallow round-trips are unchanged)."""
    from bisque_spark.synth import host_has_sitemap

    h = xxh64(("robots:" + host).encode())
    crawl_delay = 1.0 + (h % 4)
    lines = ["# synthetic robots", "User-agent: *", f"Crawl-delay: {crawl_delay}"]
    if h % 3 == 0:
        lines.append("Disallow: /admin")
    else:
        lines.append("Disallow:")
    if host_has_sitemap(world, host):
        lines.append(f"Sitemap: http://{host}/sitemap.xml")
    if xxh64(("smxadv:" + host).encode()) % 3 == 0:
        idx = int(host[1:5])
        other = world.host((idx + 3) % world.n_hosts)
        lines.append(f"Sitemap: http://{other}/sitemap.xml")
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
