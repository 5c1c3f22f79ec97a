"""robots.txt parsing + path matching per RFC 9309 (Robots Exclusion
Protocol, public IETF standard).

A crawl-scale corpus pipeline needs the crawl-permission verdict as a
curation column: pages a polite crawler should never have fetched
(or must not refetch) are gated on the (host, path) → allow/disallow
decision this module computes. The reference service has no crawl
layer; this belongs to the webtext axis next to the WARC source.

Semantics implemented (RFC 9309 §2):
- Group selection: the group(s) whose ``User-agent`` line is the
  LONGEST match for the product token win; groups for ``*`` apply
  only when no specific group matches. Adjacent user-agent lines
  share one group. Matching is case-insensitive.
- Rules: ``Allow``/``Disallow`` with ``*`` (any chars) and ``$``
  (end anchor) wildcards, percent-encoding left as-is, empty
  ``Disallow:`` = allow-all no-op.
- Evaluation: longest-match wins — the rule with the most octets in
  its pattern decides; on a tie, ``Allow`` wins. No matching rule =
  allowed (crawl-by-default).

Each parsed rule carries an equivalent anchored regex (the RFC
wildcard language is regular), so engines evaluate matches without
re-implementing the wildcard walk: ``^`` + escaped pattern with
``*`` → ``.*`` and a trailing ``$`` honored.
"""

from __future__ import annotations

import re


def _pattern_to_regex(pattern: str) -> str:
    """Anchored regex equivalent of an RFC 9309 path pattern."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots(text: str, agent: str = "*") -> list[dict]:
    """Rules of the group that governs ``agent``: a list of
    ``{allow, pattern, pattern_len, regex}`` dicts in file order.
    Unknown directives and blank/comment lines are skipped; a file
    with no applicable group returns [] (= everything allowed)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if cur_rules is not None:
                # A user-agent line AFTER rules starts a new group.
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], None
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # rules before any user-agent line: ignored
            if cur_rules is None:
                cur_rules = []
            if val == "":
                continue  # empty pattern = no-op (RFC 9309 §2.2.2)
            cur_rules.append((key == "allow", val))
        # crawl-delay / sitemap / unknown: not part of the gate
    if cur_agents:
        groups.append((cur_agents, cur_rules or []))

    # Longest agent-token match wins; '*' only if nothing specific.
    best: list[tuple[bool, str]] | None = None
    best_len = -1
    star: list[tuple[bool, str]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif a in agent and len(a) > best_len:
                best, best_len = rules, len(a)
    rules = best if best is not None else (star if star is not None else [])
    return [{"allow": allow, "pattern": pat,
             "pattern_len": len(pat), "regex": _pattern_to_regex(pat)}
            for allow, pat in rules]


def is_allowed(rules: list[dict], path: str) -> bool:
    """Longest-match verdict for ``path`` (e.g. '/dir/page?q=1')
    against parsed rules; Allow wins length ties; no match = True."""
    best_len, verdict = -1, True
    for r in rules:
        if re.match(r["regex"], path):
            if r["pattern_len"] > best_len or \
               (r["pattern_len"] == best_len and r["allow"]):
                best_len, verdict = r["pattern_len"], r["allow"]
    return verdict


def parse_sitemap_directives(text: str) -> list[str]:
    """``Sitemap:`` lines of a robots.txt — RFC 9309 §2.2.4 "other
    records" / sitemaps.org robots-txt submission: group-INDEPENDENT
    (they apply regardless of any user-agent section they appear
    inside), absolute URLs, any number per file. Order-preserving,
    exact-duplicate lines folded. Comment handling matches the gate
    parser (a ``#`` starts a comment), so the two views of one file
    can never disagree about a line."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if val and val not in seen:
            seen.add(val)
            out.append(val)
    return out
