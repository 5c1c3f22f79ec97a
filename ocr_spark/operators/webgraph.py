"""Web-graph operators: WAT-style outlink extraction, host-level edge
aggregation, and PageRank host centrality — the link-graph curation
signals (domain authority, spam-farm detection) a crawl-scale corpus
pipeline computes next to its text gates.

Scale design (the 100 TB lens):
- ``extract_outlinks`` is one mapInPandas pass over (url, html) —
  Arrow-batched, never per-row Python rows through the JVM boundary;
  salting/repartition by url hash mirrors the extraction cascade.
- ``host_edges`` collapses the corpus-sized link table to a
  host×host graph with one partial-agg shuffle; everything after it
  operates on hosts (≈10⁷ at full-crawl scale — ~10⁵× smaller than
  the corpus).
- ``host_rank`` is classic power iteration: a fixed number of
  keyed join+aggregate rounds over the host-sized frames. The weight
  and rank tables shuffle on host; the per-iteration dangling mass is
  a 1-row aggregate broadcast back by crossJoin. Lineage is truncated
  with localCheckpoint every few rounds so plan depth stays bounded.

The reference service has no web-graph component; this is the
LLM-pipeline axis (FineWeb/RefinedWeb-style URL+graph curation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

OUTLINK_SCHEMA = StructType([
    StructField("src_url", StringType(), False),
    StructField("dst_url", StringType(), False),
    StructField("anchor_text", StringType(), True),
    StructField("rel", StringType(), True),
    StructField("nofollow", BooleanType(), False),
])


def _link_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..textlib.charset import sniff_decode
    from ..textlib.weblinks import extract_links
    cols = [f.name for f in OUTLINK_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"], pdf["html"]):
            if html is None:
                continue
            # Same charset sniff as the extraction cascade so the link
            # table never disagrees with the extracted text on a
            # non-UTF-8 page.
            for lk in extract_links(sniff_decode(bytes(html))[0], url):
                rows.append((url, lk["dst_url"], lk["anchor_text"],
                             lk["rel"], lk["nofollow"]))
        yield pd.DataFrame(rows, columns=cols)


def extract_outlinks(docs: DataFrame,
                     num_partitions: int | None = None) -> DataFrame:
    """One row per ``<a href>`` of every page in ``docs`` (columns:
    url, html BINARY): (src_url, dst_url, anchor_text, rel, nofollow),
    hrefs resolved against the page base (textlib/weblinks.py). The
    WAT-sidecar counterpart of the main-content extraction pass."""
    if num_partitions:
        docs = docs.repartition(num_partitions, F.xxhash64("url"))
    return docs.mapInPandas(_link_batches, schema=OUTLINK_SCHEMA)


def host_edges(links: DataFrame, *, drop_nofollow: bool = True,
               src_col: str = "src_url",
               dst_col: str = "dst_url") -> DataFrame:
    """Collapse a link table to the host graph:
    (src_host, dst_host, n_links), self-host edges removed, rows with
    an unparseable host dropped. ``drop_nofollow=True`` (the ranking
    convention) excludes links whose rel carries nofollow.

    Hosts come from the pure-expression ``url_host`` key (the same
    grouping key the per-domain curation operators use), so the graph
    key is computed at the scan stage, never in Python. One
    partial-agg shuffle on (src_host, dst_host); output is
    host-pair-sized, the frame every graph signal downstream reads."""
    from ..functions.expressions import url_host
    if drop_nofollow and "nofollow" in links.columns:
        links = links.filter(~F.col("nofollow"))
    e = links.select(url_host(F.col(src_col)).alias("src_host"),
                     url_host(F.col(dst_col)).alias("dst_host"))
    return (e.filter((F.col("src_host") != "") & (F.col("dst_host") != "")
                     & (F.col("src_host") != F.col("dst_host")))
            .groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).alias("n_links")))


def anchor_stats(links: DataFrame, *, k: int = 5, min_count: int = 1,
                 by: str = "dst_url") -> DataFrame:
    """Inlink anchor-text profile per target (the classic web-IR
    relevance signal: what the REST of the web calls a page): one row
    per ``by`` value with (n_inlinks, n_src_hosts, top_anchors) where
    top_anchors is the up-to-k most frequent non-null anchor texts,
    ties broken by text ascending (deterministic). ``min_count``
    drops sub-threshold anchors BEFORE the ranking window.

    Scale: two-level aggregation — the (target, anchor) pre-agg
    shrinks the window input to distinct-anchor cardinality per
    target, so a hot page with 10⁸ inlinks but few distinct anchors
    costs one partial-agg shuffle; a target with pathologically many
    DISTINCT anchors is the residual skew, bounded by ``min_count``.
    top_anchors is NULL for targets whose every anchor is null/below
    threshold."""
    from pyspark.sql import Window
    from ..functions.expressions import url_host
    base = links.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct(url_host(F.col("src_url"))).alias("n_src_hosts"))
    per = (links.filter(F.col("anchor_text").isNotNull())
           .groupBy(by, "anchor_text")
           .agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") >= min_count))
    w = Window.partitionBy(by).orderBy(F.desc("_n"),
                                       F.asc("anchor_text"))
    top = (per.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= k)
           .groupBy(by)
           .agg(F.array_sort(F.collect_list(F.struct("_rn", "anchor_text")))
                .alias("_s"))
           .select(by, F.transform("_s", lambda x: x["anchor_text"])
                   .alias("top_anchors")))
    return base.join(top, by, "left")


def host_rank(edges: DataFrame, *, iters: int = 10,
              damping: float = 0.85, weighted: bool = True,
              checkpoint_every: int = 6) -> DataFrame:
    """PageRank over the host graph (Brin & Page 1998; power
    iteration, fixed ``iters`` rounds): (host, rank), sum(rank) = 1.

    Per-edge transition weight is n_links-proportional when
    ``weighted`` (a host linking somewhere 100× passes 100× the
    mass of a single link) else uniform across a host's out-edges.
    Dangling hosts (no out-edges) redistribute their mass uniformly,
    the standard stochastic-matrix completion.

    Distribution: every iteration is one keyed join (ranks × weights
    on src_host) + one hash aggregate on dst_host, both host-sized;
    the dangling mass is a 1-row aggregate crossJoin-broadcast back.
    The single driver-side action is ``nodes.count()`` — N is a
    scalar in the update rule, and the node table is the host
    universe, ~10⁵× smaller than the corpus. localCheckpoint every
    ``checkpoint_every`` rounds bounds plan depth (a 10-iteration
    lineage otherwise re-derives the whole chain per action)."""
    nodes = (edges.select(F.col("src_host").alias("host"))
             .union(edges.select(F.col("dst_host").alias("host")))
             .distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    mass = F.col("n_links") if weighted and "n_links" in edges.columns \
        else F.lit(1)
    w = edges.groupBy("src_host", "dst_host").agg(
        F.sum(mass).alias("_m"))
    tot = w.groupBy("src_host").agg(F.sum("_m").alias("_tot"))
    w = (w.join(tot, "src_host")
         .select("src_host", "dst_host",
                 (F.col("_m") / F.col("_tot")).alias("w")))
    src_hosts = w.select("src_host").distinct()

    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for i in range(iters):
        contribs = (ranks.join(w, ranks["host"] == w["src_host"])
                    .groupBy("dst_host")
                    .agg(F.sum(F.col("rank") * F.col("w")).alias("_c")))
        dangling = (ranks.join(src_hosts,
                               ranks["host"] == src_hosts["src_host"],
                               "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("_dm")))
        ranks = (nodes
                 .join(contribs, nodes["host"] == contribs["dst_host"],
                       "left")
                 .crossJoin(F.broadcast(dangling))
                 .select(nodes["host"],
                         (F.lit(teleport)
                          + F.lit(damping)
                          * (F.coalesce(F.col("_c"), F.lit(0.0))
                             + F.col("_dm") / n)).alias("rank")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks
