"""Per-domain corpus curation (RefinedWeb / C4-style).

Web corpora are skewed by DOMAIN, not just by document: a handful of
hosts contribute a huge share of pages (link farms, boilerplate
mirrors), and the public pipelines all gate on the host — C4 blocks a
bad-domain list, RefinedWeb (Penedo et al. 2023) caps per-domain
contribution, CCNet reports per-domain stats. Three operators, all
keyed on the pure-expression ``functions.expressions.url_host`` so the
grouping key comes out of the scan stage:

  * ``domain_stats``  — one row per host: doc count, distinct-text
    count, char volume. One hash aggregation (map-side partial).
  * ``domain_cap``    — keep at most N docs per host, selected by a
    DETERMINISTIC hash order (xxhash64 of the url, ties broken by
    url), so a re-run keeps the same survivors — a row_number window
    per host, which scales because the per-host group is exactly the
    thing being bounded.
  * ``domain_filter`` — drop docs whose host matches a blocklist
    entry exactly or as a dot-suffix (``ads.example.com`` matches
    blocked ``example.com``). The blocklist is a literal array in the
    plan (these lists are small — C4's is dozens of entries), so the
    gate is a codegen ``exists``, not a join.

Round-4 continuation adds the CRAWL-PERMISSION gate on top (RFC 9309
Robots Exclusion Protocol — textlib/robots.py holds the parser):

  * ``robots_rules`` — parse a (host, robots_txt) table into one row
    per applicable rule: (host, allow, pattern, pattern_len, regex).
    Parsing is Python (it's a line-format grammar) but Arrow-batched
    via mapInPandas — never a per-row UDF — and runs ONCE per host,
    not per page: the rules table is ~10^7 rows when the corpus is
    10^12.
  * ``crawl_gate``    — verdict per url: join pages to their host's
    rules, regex-match the path, longest-match wins with Allow
    breaking ties, no match = allowed (RFC 9309 §2.2.2). The verdict
    is computed once per DISTINCT url and joined back, so duplicate
    fetches don't re-pay the regex work.

No reference twin (the service has no corpus view); public sources:
Raffel et al. 2020 (C4), Penedo et al. 2023 (RefinedWeb), Wenzek et
al. 2020 (CCNet), RFC 9309 (Koster et al. 2022).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import url_host, url_path


def domain_stats(docs: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-host corpus profile: (host, n_docs, n_unique_texts,
    sum_chars). Distinct texts counted on the md5 content hash (16
    bytes/doc into the distinct agg, never the text itself)."""
    return (
        docs.select(url_host(F.col(url_col)).alias("host"),
                    F.md5(F.coalesce(F.col(text_col), F.lit(""))
                          .cast("binary")).alias("_h"),
                    F.length(F.coalesce(F.col(text_col), F.lit("")))
                    .alias("_len"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("_h").alias("n_unique_texts"),
             F.sum("_len").alias("sum_chars"))
    )


def domain_cap(docs: DataFrame, max_per_domain: int,
               url_col: str = "url") -> DataFrame:
    """Bound each host's contribution to ``max_per_domain`` documents
    (RefinedWeb's per-domain cap). Survivor selection is deterministic:
    ordered by (xxhash64(url), url) within the host, so re-running the
    job keeps the same documents — curation must be reproducible for
    the run to be resumable."""
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    w = Window.partitionBy(url_host(F.col(url_col))).orderBy(
        F.xxhash64(url_col), F.col(url_col))
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_per_domain).drop("_rn"))


def domain_filter(docs: DataFrame, blocked: list[str],
                  url_col: str = "url") -> DataFrame:
    """Drop documents whose host is a blocked domain or any subdomain
    of one. Hosts and the list are compared lowercased."""
    if not blocked:
        return docs
    norm = [b.strip().lower().lstrip(".") for b in blocked if b.strip()]
    bad = [b for b in norm if not b or "/" in b or ":" in b]
    if bad:
        raise ValueError(f"blocklist entries must be bare hosts: {bad}")
    host = url_host(F.col(url_col))
    arr = F.array(*[F.lit(b) for b in sorted(set(norm))])
    hit = F.exists(arr, lambda b: (host == b)
                   | host.endswith(F.concat(F.lit("."), b)))
    return docs.filter(~hit)


ROBOTS_RULES_SCHEMA = ("host string, allow boolean, pattern string, "
                       "pattern_len int, regex string")


def robots_rules(robots: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """Parse per-host robots.txt bodies into the rule rows that govern
    ``agent`` (textlib.robots.parse_robots — RFC 9309 group selection:
    longest user-agent token match, ``*`` only as fallback). One output
    row per Allow/Disallow rule; a host whose file has no applicable
    group emits NO rows (= crawl-by-default, exactly what crawl_gate's
    left join encodes). Arrow-batched mapInPandas: the Python parse
    runs once per host — the robots table is tiny next to the corpus.
    """
    from ..textlib.robots import parse_robots

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"host": [], "allow": [],
                                    "pattern": [], "pattern_len": [],
                                    "regex": []}
            for host, txt in zip(pdf[host_col], pdf[text_col]):
                if host is None or txt is None:
                    continue
                for r in parse_robots(str(txt), agent=agent):
                    out["host"].append(host)
                    out["allow"].append(r["allow"])
                    out["pattern"].append(r["pattern"])
                    out["pattern_len"].append(r["pattern_len"])
                    out["regex"].append(r["regex"])
            yield pd.DataFrame(out)

    return robots.select(host_col, text_col).mapInPandas(
        _parse, schema=ROBOTS_RULES_SCHEMA)


def crawl_gate(docs: DataFrame, rules: DataFrame,
               url_col: str = "url",
               out_col: str = "crawl_allowed") -> DataFrame:
    """RFC 9309 verdict per document: ``out_col`` is true iff a polite
    crawler may fetch ``url_col`` under ``rules`` (robots_rules
    output). Longest-match decides; Allow wins exact length ties; no
    matching rule — or no rules for the host at all — means allowed.

    Plan shape (the 10^12-page lens): verdicts are computed per
    DISTINCT url, so a host's rules are regex-matched once per url,
    not once per duplicate fetch; the url→rules join is a host equi-
    join whose fan-out is bounded by the host's rule count (robots
    files are small), so a mega-host with 10^8 pages is fan-out-
    bounded skew, not a cross product. The longest-match maximum is
    one hash aggregation (max of two conditional ints), and the
    verdict rejoins docs on url — both sides already hash-partitioned
    by url-ish keys upstream. The per-row ``regexp_like`` with a
    column pattern is interpreted (no codegen pattern cache); robots
    patterns are a few bytes, so compile cost is dwarfed by the scan.
    """
    pages = (docs.select(F.col(url_col).alias("_cg_url"))
             .distinct()
             .select("_cg_url",
                     url_host(F.col("_cg_url")).alias("_cg_host"),
                     url_path(F.col("_cg_url")).alias("_cg_path")))
    matched = (pages.join(rules, pages["_cg_host"] == rules["host"])
               .filter(F.expr("_cg_path rlike regex"))
               .groupBy("_cg_url")
               .agg(F.max(F.when(F.col("allow"),
                                 F.col("pattern_len"))).alias("_al"),
                    F.max(F.when(~F.col("allow"),
                                 F.col("pattern_len"))).alias("_dl")))
    verdict = (F.coalesce(F.col("_al"), F.lit(-1))
               >= F.coalesce(F.col("_dl"), F.lit(-1)))
    return (docs.join(matched, docs[url_col] == matched["_cg_url"],
                      "left")
            .withColumn(out_col, F.coalesce(verdict, F.lit(True)))
            .drop("_cg_url", "_al", "_dl"))
