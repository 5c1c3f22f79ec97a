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

No reference twin (the service has no corpus view); public sources:
Raffel et al. 2020 (C4), Penedo et al. 2023 (RefinedWeb), Wenzek et
al. 2020 (CCNet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import url_host


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
