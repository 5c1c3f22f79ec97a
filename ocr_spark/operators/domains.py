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


SITEMAP_ENTRIES_SCHEMA = ("host string, loc string, lastmod timestamp, "
                          "changefreq string, priority double, "
                          "is_index boolean, _sitemap_skipped int")

FEED_ENTRIES_SCHEMA = ("host string, loc string, lastmod timestamp, "
                       "title string, _feed_skipped int")


def feed_urls(feeds: DataFrame, host_col: str = "host",
              text_col: str = "feed_xml") -> DataFrame:
    """Parse per-host RSS 2.0 / Atom 1.0 feed documents
    (textlib/feeds.py) into one row per declared url — the
    fast-moving complement to sitemap demand: feeds carry a host's
    NEWEST urls with publish stamps, which is what a recrawl frontier
    wants for news-like hosts.

    Output: (host, loc, lastmod, title, _feed_skipped), the sitemap
    counter contract: document rows carry 0 and a host whose parse
    dropped link-less blocks emits ONE bookkeeping row (NULL loc, the
    count). ``feed_frontier_entries`` adapts the shape for
    ``crawl_frontier``.

    Arrow-batched mapInPandas, once per host document — feed tables
    are host-sized, the robots_rules asymmetry."""
    from ..textlib.feeds import parse_feed

    cols = ["host", "loc", "lastmod", "title", "_feed_skipped"]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for host, txt in zip(pdf[host_col], pdf[text_col]):
                if host is None or txt is None:
                    continue
                entries, skipped = parse_feed(str(txt))
                if skipped:
                    out.append((host, None, None, None, skipped))
                for e in entries:
                    out.append((host, e["loc"], e["lastmod"],
                                e["title"], 0))
            yield pd.DataFrame(out, columns=cols)

    return feeds.select(host_col, text_col).mapInPandas(
        _parse, schema=FEED_ENTRIES_SCHEMA)


def feed_frontier_entries(feed_entries: DataFrame) -> DataFrame:
    """Feed rows in crawl_frontier's entry shape: a feed declares no
    changefreq/priority (the consumer's defaults apply — NULL stays
    observable, the sitemap convention) and never points at another
    index document."""
    return (feed_entries.filter(F.col("loc").isNotNull())
            .select("host", "loc", "lastmod",
                    F.lit(None).cast("string").alias("changefreq"),
                    F.lit(None).cast("double").alias("priority"),
                    F.lit(False).alias("is_index")))


def sitemap_urls(sitemaps: DataFrame, host_col: str = "host",
                 text_col: str = "sitemap_xml") -> DataFrame:
    """Parse per-host sitemap documents (sitemaps.org protocol 0.9)
    into one row per declared url — the DEMAND side of crawl
    scheduling, joined against crawl state by ``crawl_frontier``.

    Output: (host, loc, lastmod, changefreq, priority, is_index,
    _sitemap_skipped). ``is_index`` rows are <sitemapindex> pointers a
    fetcher must expand — emitted, never followed. Blocks the parser
    had to drop (no <loc>) ride the same counter contract as the WARC
    reader: document rows carry 0 and a host whose parse skipped
    blocks emits ONE bookkeeping row (NULL loc, the count), so
    SUM(_sitemap_skipped) is the corpus casualty count.

    Arrow-batched mapInPandas, once per host document: sitemap tables
    are host-sized (~10^7 rows) next to a 10^12-page corpus, the same
    asymmetry robots_rules exploits."""
    from ..textlib.sitemaps import parse_sitemap

    cols = ["host", "loc", "lastmod", "changefreq", "priority",
            "is_index", "_sitemap_skipped"]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for host, txt in zip(pdf[host_col], pdf[text_col]):
                if host is None or txt is None:
                    continue
                entries, skipped = parse_sitemap(str(txt))
                if skipped:
                    out.append((host, None, None, None, None, None,
                                skipped))
                for e in entries:
                    out.append((host, e["loc"], e["lastmod"],
                                e["changefreq"], e["priority"],
                                e["is_index"], 0))
            yield pd.DataFrame(out, columns=cols)

    return sitemaps.select(host_col, text_col).mapInPandas(
        _parse, schema=SITEMAP_ENTRIES_SCHEMA)


# Expected change interval per changefreq, in hours (sitemaps.org
# enum; 'never'/unknown fall back to monthly — a hint, not a command,
# per the protocol).
CHANGEFREQ_HOURS = {"always": 1, "hourly": 1, "daily": 24,
                    "weekly": 168, "monthly": 720, "yearly": 8760}
_DEFAULT_FREQ_HOURS = 720


def crawl_frontier(entries: DataFrame, state: DataFrame | None,
                   as_of, host_ranks: DataFrame | None = None) -> DataFrame:
    """Refetch frontier from sitemap demand × crawl state × host
    importance: one row per declared (non-index) url with
    ``needs_fetch`` and a deterministic ``fetch_score`` to order the
    queue by (Cho & Garcia-Molina 2000 freshness scheduling shape —
    staleness-proportional refresh — with the site's own priority and
    the link-graph rank as multipliers).

      staleness  = 1.0 when never fetched, or when the sitemap says
                   the page changed after the last fetch (lastmod >
                   fetched_ts); else min(1, age_h / changefreq_h) —
                   age measured at ``as_of`` (an explicit timestamp:
                   a frontier must be reproducible, so wall-clock
                   never enters the plan).
      fetch_score = coalesce(priority, 0.5)   # sitemaps.org default
                    * staleness
                    * (1 + coalesce(host_rank, 0))
      needs_fetch = staleness >= 1.0

    ``state`` is (url, fetched_ts) — the last successful fetch per
    url, e.g. max(warc_ts) of the committed snapshot; None = a cold
    crawl. ``host_ranks`` is webgraph.host_rank's (host, rank).

    Plan shape: two keyed equi-joins (state on url — both sides
    corpus-keyed; ranks on host — host-sized, broadcastable) and pure
    expressions; no Python, no window, no driver action."""
    base = (entries.filter(~F.col("is_index"))
            .filter(F.col("loc").isNotNull())
            .select("host", F.col("loc").alias("url"), "lastmod",
                    "changefreq", "priority"))
    if state is not None:
        base = base.join(
            state.select(F.col("url"), F.col("fetched_ts")),
            on="url", how="left")
    else:
        base = base.withColumn("fetched_ts",
                               F.lit(None).cast("timestamp"))
    if host_ranks is not None:
        base = base.join(F.broadcast(host_ranks.select("host", "rank")),
                         on="host", how="left")
    else:
        base = base.withColumn("rank", F.lit(None).cast("double"))

    freq_h = F.coalesce(
        *[F.when(F.col("changefreq") == k, F.lit(float(v)))
          for k, v in CHANGEFREQ_HOURS.items()],
        F.lit(float(_DEFAULT_FREQ_HOURS)))
    age_h = (F.unix_timestamp(F.lit(as_of).cast("timestamp"))
             - F.unix_timestamp(F.col("fetched_ts"))) / 3600.0
    staleness = (F.when(F.col("fetched_ts").isNull(), F.lit(1.0))
                 .when(F.col("lastmod").isNotNull()
                       & (F.col("lastmod") > F.col("fetched_ts")),
                       F.lit(1.0))
                 .otherwise(F.least(F.lit(1.0),
                                    F.greatest(F.lit(0.0),
                                               age_h / freq_h))))
    score = (F.coalesce(F.col("priority"), F.lit(0.5))
             * staleness
             * (F.lit(1.0) + F.coalesce(F.col("rank"), F.lit(0.0))))
    return (base
            .withColumn("staleness", staleness)
            .withColumn("fetch_score", score)
            .withColumn("needs_fetch", staleness >= 1.0)
            .select("url", "host", "lastmod", "changefreq", "priority",
                    "fetched_ts", "staleness", "fetch_score",
                    "needs_fetch"))


ROBOTS_SITEMAPS_SCHEMA = "host string, sitemap_url string"


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    text_col: str = "robots_txt") -> DataFrame:
    """The discovery edge that closes the crawl loop: robots.txt
    ``Sitemap:`` directives (textlib/robots.parse_sitemap_directives)
    -> (host, sitemap_url) rows naming the documents ``sitemap_urls``
    parses once fetched. One Arrow pass over the host-sized robots
    table — the robots_rules asymmetry; hosts with no directive (or a
    NULL file) simply contribute no rows."""
    from ..textlib.robots import parse_sitemap_directives

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for host, txt in zip(pdf[host_col], pdf[text_col]):
                if host is None or txt is None:
                    continue
                for u in parse_sitemap_directives(str(txt)):
                    out.append((host, u))
            yield pd.DataFrame(out, columns=["host", "sitemap_url"])

    return robots.select(host_col, text_col).mapInPandas(
        _parse, schema=ROBOTS_SITEMAPS_SCHEMA)
