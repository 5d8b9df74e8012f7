"""robots.txt parsing -> HostPolicy disallow prefixes + crawl delay.

The reference has no robots handling at all; this engine's politeness gate
consumes per-host disallow-prefix lists (stages/politeness.py). This
module turns a fetched robots.txt body into that policy shape with the
original-spec semantics the gate implements (path-prefix disallows):

- group selection: the record(s) whose ``User-agent`` best matches the
  crawler's agent token — longest matching token wins, ``*`` is the
  fallback (RFC 9309 §2.2.1)
- ``Disallow:`` path prefixes (empty value = allow everything — skipped);
  ``Allow`` lines are accepted but the prefix gate is disallow-only, so
  they are returned separately for callers that implement precedence
- ``Crawl-delay`` (non-standard but ubiquitous) -> crawl_delay_ms
- ``Sitemap:`` lines are record-independent (collected globally)
"""

from __future__ import annotations


def parse_robots(body: str, agent: str = "*") -> dict:
    """-> {"robots_disallow": [prefixes], "allow": [...],
    "crawl_delay_ms": int|None, "sitemaps": [urls]} for the best-matching
    user-agent group."""
    agent = agent.lower()
    groups: list[tuple[list[str], dict]] = []  # ([agent tokens], rules)
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur: dict | None = None
    last_was_agent = False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not last_was_agent:  # a new record starts
                cur_agents = []
                cur = {"disallow": [], "allow": [], "crawl_delay": None}
                groups.append((cur_agents, cur))
            cur_agents.append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:  # rules before any User-agent: ignored per spec
            continue
        if field == "disallow":
            if value:  # empty Disallow = allow all
                cur["disallow"].append(value)
        elif field == "allow":
            if value:
                cur["allow"].append(value)
        elif field == "crawl-delay":
            try:
                cur["crawl_delay"] = float(value)
            except ValueError:
                pass

    # longest-agent-token match; '*' is the fallback
    best, best_len = None, -1
    for agents, rules in groups:
        for a in agents:
            if a == "*" and best is None:
                best, best_len = rules, 0
            elif a != "*" and a in agent and len(a) > best_len:
                best, best_len = rules, len(a)
    if best is None:
        return {"robots_disallow": [], "allow": [], "crawl_delay_ms": None,
                "sitemaps": sitemaps}
    delay = best["crawl_delay"]
    return {
        "robots_disallow": list(best["disallow"]),
        "allow": list(best["allow"]),
        "crawl_delay_ms": int(delay * 1000) if delay is not None else None,
        "sitemaps": sitemaps,
    }


def policy_from_robots(bodies: dict[str, str], agent: str = "*",
                       default_delay_ms: int = 0,
                       default_max_inflight: int = 64) -> dict[str, dict]:
    """{host: robots.txt body} -> the HostPolicy policies dict shape
    (stages/politeness.py): crawl_delay_ms / max_inflight /
    robots_disallow per host."""
    out = {}
    for host, body in bodies.items():
        r = parse_robots(body, agent)
        out[host] = {
            "crawl_delay_ms": r["crawl_delay_ms"] if r["crawl_delay_ms"] is not None
            else default_delay_ms,
            "max_inflight": default_max_inflight,
            "robots_disallow": r["robots_disallow"],
        }
    return out
