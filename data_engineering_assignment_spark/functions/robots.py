"""Dependency-free robots.txt parsing (RFC 9309, the Robots Exclusion
Protocol) — polite-crawl filtering between the URL frontier and the
fetch, the missing legal/etiquette gate of a crawl pipeline. Additive vs
the reference (no crawl route).

Semantics implemented (each pinned by a test or a planted oracle rule):

* groups: consecutive ``User-agent`` lines share the following rules;
  a crawler obeys the group whose agent token matches its product token
  (case-insensitive); an exact-token group beats the ``*`` group, and
  ONLY the chosen group's rules apply (RFC 9309 §2.2.1);
* rules: ``Allow``/``Disallow`` path patterns; ``*`` matches any chars,
  ``$`` anchors the end; other regex metacharacters are literal;
* decision: the LONGEST matching pattern (octet length) wins; on a tie
  Allow wins; no matching rule (or no robots.txt at all) -> allowed;
  an empty Disallow value matches nothing;
* comments (``#``) and unknown fields (Sitemap, Crawl-delay, ...) are
  ignored entirely — including for group structure: RFC 9309 §2.2.2
  says crawlers SHOULD ignore unknown lines, so ``User-agent: a`` /
  ``Sitemap: ...`` / ``User-agent: b`` is ONE two-agent group, not two;
* the longest-match precedence key is the pattern's octet length with
  a trailing ``$`` anchor EXCLUDED (the anchor is syntax, not matched
  octets: ``Allow: /abcd`` outranks ``Disallow: /abc$``); field names
  are case-insensitive.
"""

from __future__ import annotations

import re


def parse_robots(text: str) -> list[dict]:
    """robots.txt -> list of groups ``{agents: [str], rules: [(allow,
    pattern)]}`` in file order. Lenient like real crawlers: blank lines
    between rule lines don't close a group; malformed lines are skipped."""
    groups: list[dict] = []
    cur: dict | None = None
    expecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not expecting_agents:
                cur = {"agents": [], "rules": []}
                groups.append(cur)
                expecting_agents = True
            cur["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            expecting_agents = False
            if cur is None:  # rules before any user-agent: RFC says skip
                continue
            if value == "":
                if field == "disallow":
                    continue  # 'Disallow:' empty = allow all = no rule
                continue  # empty Allow is meaningless too
            cur["rules"].append((field == "allow", value))
        # unknown fields (sitemap/crawl-delay/...) are ignored entirely:
        # they neither end a User-agent run nor close a group (RFC 9309
        # 'crawlers SHOULD ignore these lines'), so 'User-agent: a /
        # Sitemap: x / User-agent: b / Disallow: /' is ONE group
    return groups


def sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` line values in file order (duplicates dropped,
    first occurrence wins) — sitemap DISCOVERY per sitemaps.org: the
    field is group-independent (it may appear anywhere in the file and
    applies to all agents; RFC 9309 treats it as an ignored extension
    field, which :func:`parse_robots` honors for group structure — this
    reader extracts what that one ignores). Values are taken verbatim
    (the spec requires absolute URLs; validation belongs to the
    frontier's canonicalization gate)."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if sep and key.strip().lower() == "sitemap":
            v = value.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


def crawl_delay(text: str, agent: str) -> int | None:
    """``Crawl-delay`` seconds for the agent, or None — the de-facto
    politeness field (RFC 9309 ignores it; Bing/Yandex-class crawlers
    honor it, and our frontier politeness gate can size its per-host
    interval from it). Group semantics mirror :func:`rules_for_agent`:
    the field is group-scoped, structure-NEUTRAL for group boundaries
    (parse_robots ignores it there — one documented model, not two),
    exact-token groups beat ``*`` groups, and when several selected
    groups declare delays the MAXIMUM wins (the conservative, politest
    reading). Fractional values round UP to whole seconds; malformed
    values are ignored like any unknown line."""
    import math

    agent = agent.lower()
    groups: list[dict] = []
    cur: dict | None = None
    expecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not expecting_agents:
                cur = {"agents": [], "delays": []}
                groups.append(cur)
                expecting_agents = True
            cur["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            expecting_agents = False
        elif field == "crawl-delay" and cur is not None:
            # structure-neutral (doesn't end the User-agent run) but
            # GROUP-scoped: a group that gains more agent tokens after
            # this line still inherits the delay
            try:
                d = math.ceil(float(value))
            except (ValueError, OverflowError):  # junk / inf values
                continue
            if d > 0:  # 0/negative delays are junk, ignored like any
                cur["delays"].append(d)  # unknown line (doc contract)
    exact = [d for g in groups if agent in g["agents"] for d in g["delays"]]
    star = [d for g in groups if "*" in g["agents"] for d in g["delays"]]
    chosen = exact if exact else star
    return max(chosen) if chosen else None


def rules_for_agent(text: str, agent: str) -> list[tuple[bool, str]]:
    """The (allow, pattern) rules the ``agent`` product token must obey:
    the union of exact-token groups if any exist, else the union of
    ``*`` groups, else no rules (RFC 9309 group selection)."""
    agent = agent.lower()
    exact: list[tuple[bool, str]] = []
    star: list[tuple[bool, str]] = []
    for g in parse_robots(text):
        if agent in g["agents"]:
            exact.extend(g["rules"])
        if "*" in g["agents"]:
            star.extend(g["rules"])
    return exact if exact else star


def pattern_spec(pattern: str) -> int:
    """RFC 9309 longest-match precedence key: the pattern's octet length
    with a trailing ``$`` anchor EXCLUDED — the anchor is syntax, not
    matched octets, so ``Allow: /abcd`` (4) outranks ``Disallow: /abc$``
    (3), matching spec-conformant crawlers. Used by BOTH the pure-Python
    decision and the Spark rule table (operators/crawl.py robots_rules)
    so the engines can't diverge."""
    return len(pattern[:-1]) if pattern.endswith("$") else len(pattern)


def pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored Java/RE2-compatible regex for
    prefix matching with ``rlike``: ``*`` -> ``.*``, trailing ``$`` ->
    end anchor, everything else literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(seg) for seg in pattern.split("*"))
    return "^" + body + ("$" if anchored else "")


def robots_decision(
    rules: list[tuple[bool, str]], path: str
) -> bool:
    """Pure-Python reference decision (tests + small frontiers): True =
    allowed. Longest matching pattern wins, Allow wins ties."""
    best: tuple[int, int] | None = None  # (spec, allow)
    for allow, pattern in rules:
        if re.search(pattern_regex(pattern), path):
            key = (pattern_spec(pattern), int(allow))
            if best is None or key > best:
                best = key
    return True if best is None else bool(best[1])
