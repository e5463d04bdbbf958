"""robots.txt politeness filtering — the per-domain allow/deny decision a
web crawl applies before a page may enter the corpus (REP, RFC 9309
subset: User-agent groups, Allow/Disallow prefix rules, longest-match
precedence, allow-wins ties, comments; path wildcards are out of scope and
documented).

Spark shape: robots bodies are PER-DOMAIN — thousands of rows against
billions of pages — so the rule table rides the BROADCAST side of the
join; the decision itself runs in an Arrow-batched pandas UDF that parses
each distinct robots body ONCE per batch (memoized) and then applies
longest-prefix matching per row. Pages whose domain has no robots row are
allowed (fetch-failure convention).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

Rules = dict[str, list[tuple[bool, str]]]


def parse_robots(text: str) -> Rules:
    """agent(lowercase) -> [(allow, path_prefix)] in file order. Groups
    are delimited by a User-agent line that FOLLOWS rules; blank lines are
    ignored entirely (RFC 9309 §2.1 — group boundaries come from
    directives, not spacing); multiple consecutive User-agent lines share
    one group."""
    groups: Rules = {}
    agents: list[str] = []
    rules_open = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_open:
                agents = []
                rules_open = False
            agents.append(val.lower())
            for a in agents:
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            rules_open = True
            if not agents:
                continue  # rule before any User-agent line: ignored
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            for a in agents:
                groups.setdefault(a, []).append((key == "allow", val))
        # other directives (Crawl-delay, Sitemap, ...) are ignored
    return groups


def is_allowed(groups: Rules, agent: str, path: str) -> bool:
    """Longest-prefix rule wins; equal lengths -> allow; no applicable
    group or no matching rule -> allowed."""
    rules = groups.get(agent.lower())
    if rules is None:
        rules = groups.get("*")
    if not rules:
        return True
    matches = [(len(p), a) for a, p in rules if path.startswith(p)]
    if not matches:
        return True
    top = max(ln for ln, _ in matches)
    return any(a for ln, a in matches if ln == top)


def robots_filter(
    pages: DataFrame, robots: DataFrame, agent: str = "crawler"
) -> DataFrame:
    """(url, ...) x (host, robots_txt) -> url, host, path, allowed(0/1).

    The robots frame is broadcast; the decision UDF memoizes parsed rule
    groups per distinct body within each Arrow batch."""
    with_parts = pages.select(
        "url",
        F.try_parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.try_parse_url(F.col("url"), F.lit("PATH")).alias("path"),
    )
    joined = with_parts.join(F.broadcast(robots), "host", "left")

    def decide(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cache: dict[str, Rules] = {}
        for pdf in batches:
            out = []
            for txt, path in zip(pdf["robots_txt"], pdf["path"]):
                if txt is None or path is None:
                    out.append(1)
                    continue
                groups = cache.get(txt)
                if groups is None:
                    groups = cache[txt] = parse_robots(txt)
                out.append(1 if is_allowed(groups, agent, path) else 0)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "host": pdf["host"],
                    "path": pdf["path"],
                    "allowed": pd.array(out, dtype="int64"),
                }
            )

    return joined.mapInPandas(
        decide, schema="url string, host string, path string, allowed long"
    )
