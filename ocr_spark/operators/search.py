"""BM25 full-text retrieval over the documents table.

The missing query capability next to the dedup/similarity families:
given a small set of text queries, rank corpus documents by Okapi BM25
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond", eq. 3.15 — the (k1+1)-numerator form; idf is the
Lucene non-negative variant ln(1 + (N - df + 0.5)/(df + 0.5))).

Scale shape (the 100 TB lens):
- The corpus term-frequency table is ONE explode -> (doc, term) hash
  aggregation with map-side partial combine; document length is a pure
  expression projection (token_count), never a second shuffle of raw
  tokens.
- Queries are the SMALL side by contract (a query workload, not a
  second corpus): their distinct terms broadcast into the tf probe, so
  document frequencies are computed for query terms only — the full
  vocabulary table is never built for ad-hoc search.
- Scoring shuffles only candidate rows (documents containing at least
  one query term), keyed by (query_id, doc), and the final top-k is a
  row_number window that Spark executes with WindowGroupLimit pushdown
  (per-partition top-k before the exchange).
- ``bm25_write_index`` persists postings partitioned by a term-hash
  bucket; ``bm25_search_index`` turns a query into a literal bucket IN
  filter, so the scan statically prunes to |query terms| / buckets of
  the postings files (the ivf_write_index pattern: file skipping at
  the source, before any compute) and pushes ``term IN (...)`` down to
  parquet row-group stats.

Tokenization is the corpus-wide textstats convention (whitespace
tokens of the dedup-normalized text), so index terms, TF-IDF keywords,
and stopword statistics all agree on what a "term" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _term_rows, token_count

BM25_K1 = 1.2
BM25_B = 0.75


def _corpus_tf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf): one explode + one hash aggregation."""
    return (_term_rows(df, text_col, id_col)
            .groupBy(id_col, "term").agg(F.count("*").alias("tf")))


def _doc_lengths(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, dl): pure expression — zero-token documents keep dl=0 and
    still count toward N/avgdl (the corpus the user searches includes
    its empty rows; BM25's length normalization must see them)."""
    return df.select(F.col(id_col),
                     token_count(F.col(text_col)).cast("long").alias("dl"))


def _query_terms(queries: DataFrame, query_id: str,
                 query_text: str) -> DataFrame:
    """Distinct (query_id, term) — BooleanQuery semantics: a term
    repeated inside one query contributes once (Lucene folds duplicate
    clauses; keeping the score replayable beats qtf weighting)."""
    return (_term_rows(queries, query_text, query_id)
            .withColumnRenamed(query_id, "query_id").distinct())


def bm25_score(docs: DataFrame, queries: DataFrame, *,
               k1: float = BM25_K1, b: float = BM25_B,
               text_col: str = "text", id_col: str = "doc_id",
               query_id: str = "query_id",
               query_text: str = "query_text") -> DataFrame:
    """(query_id, doc_id, score) for every candidate document (shares
    at least one term with the query). Pure Catalyst expressions end
    to end — DuckDB-oracle-replayable."""
    tf = _corpus_tf(docs, text_col, id_col)
    dl = _doc_lengths(docs, text_col, id_col)
    meta = dl.agg(F.count("*").alias("_n"),
                  F.avg("dl").alias("_avgdl"))
    qt = _query_terms(queries, query_id, query_text)
    # df for query terms only: tf is unique per (doc, term), so a
    # semi-filtered count(*) IS the document frequency.
    dfq = (tf.join(F.broadcast(qt.select("term").distinct()), "term")
           .groupBy("term").agg(F.count("*").alias("df")))
    idf = (dfq.crossJoin(F.broadcast(meta))
           .select("term",
                   F.log(F.lit(1.0)
                         + (F.col("_n") - F.col("df") + F.lit(0.5))
                         / (F.col("df") + F.lit(0.5))).alias("idf"),
                   "_avgdl"))
    cand = (tf.join(F.broadcast(qt), "term")
            .join(F.broadcast(idf), "term")
            .join(dl, id_col))
    norm = (F.col("tf") + F.lit(k1)
            * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("_avgdl")))
    term_score = F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / norm
    return (cand.select("query_id", F.col(id_col),
                        term_score.alias("_s"))
            .groupBy("query_id", id_col)
            .agg(F.sum("_s").alias("score")))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10, *,
              k1: float = BM25_K1, b: float = BM25_B,
              text_col: str = "text", id_col: str = "doc_id",
              query_id: str = "query_id",
              query_text: str = "query_text") -> DataFrame:
    """Top-k BM25 hits per query: (query_id, doc_id, score, rank),
    ties broken by doc id so the hit list is deterministic."""
    if k < 1:
        raise ValueError("k must be >= 1")
    scored = bm25_score(docs, queries, k1=k1, b=b, text_col=text_col,
                        id_col=id_col, query_id=query_id,
                        query_text=query_text)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _term_bucket(col, buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def bm25_write_index(docs: DataFrame, path: str, *, buckets: int = 64,
                     text_col: str = "text", id_col: str = "doc_id",
                     mode: str = "overwrite") -> None:
    """Persist the corpus as an on-disk inverted index:

    - ``{path}/postings`` — (term, doc, tf, dl) partitioned by
      ``bucket = pmod(xxhash64(term), buckets)``: every posting a
      search needs lives in the buckets its query terms hash to.
    - ``{path}/terms``    — (term, df) under the same bucket layout
      (the term dictionary, Lucene-style: df rides the dictionary,
      not every posting).
    - ``{path}/meta``     — one row (n_docs, avgdl).

    Postings sort by term within each bucket so parquet row-group
    min/max stats make the pushed ``term IN (...)`` filter skip
    non-matching row groups inside a probed bucket file."""
    tf = _corpus_tf(docs, text_col, id_col)
    dl = _doc_lengths(docs, text_col, id_col)
    postings = (tf.join(dl, id_col)
                .withColumn("bucket", _term_bucket(F.col("term"), buckets))
                .sortWithinPartitions("bucket", "term"))
    postings.write.partitionBy("bucket").mode(mode).parquet(
        f"{path}/postings")
    terms = (tf.groupBy("term").agg(F.count("*").alias("df"))
             .withColumn("bucket", _term_bucket(F.col("term"), buckets)))
    terms.write.partitionBy("bucket").mode(mode).parquet(f"{path}/terms")
    dl.agg(F.count("*").alias("n_docs"),
           F.avg("dl").alias("avgdl")).write.mode(mode).parquet(
        f"{path}/meta")


def bm25_search_index(spark, path: str, queries: DataFrame,
                      k: int = 10, *, buckets: int = 64,
                      k1: float = BM25_K1, b: float = BM25_B,
                      id_col: str = "doc_id", query_id: str = "query_id",
                      query_text: str = "query_text") -> DataFrame:
    """Search a bm25_write_index layout. The collected query terms
    (bounded by the small-query contract, like the IVF probe list)
    become literal ``bucket IN`` partition filters plus a pushed
    ``term IN`` predicate, so the postings scan reads only the files
    and row groups the query can touch."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # One tiny query-side job (the ivf_search_index pattern): the
    # collected rows drive the prune filters AND rebuild the probe
    # side driver-locally so the lineage isn't computed twice.
    from pyspark.sql.types import StringType, StructField, StructType
    qt_rows = [(r["query_id"], r["term"], r["bucket"]) for r in
               _query_terms(queries, query_id, query_text)
               .withColumn("bucket", _term_bucket(F.col("term"), buckets))
               .collect()]
    terms = sorted({t for _, t, _b in qt_rows})
    bkts = sorted({bb for _, _t, bb in qt_rows})
    qt_small = F.broadcast(spark.createDataFrame(
        [(q, t) for q, t, _b in qt_rows],
        StructType([
            StructField("query_id", queries.schema[query_id].dataType),
            StructField("term", StringType())])))
    meta = spark.read.parquet(f"{path}/meta")
    tdict = (spark.read.parquet(f"{path}/terms")
             .filter(F.col("bucket").isin(bkts)
                     & F.col("term").isin(terms)))
    idf = (tdict.crossJoin(F.broadcast(meta))
           .select("term",
                   F.log(F.lit(1.0)
                         + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                         / (F.col("df") + F.lit(0.5))).alias("idf"),
                   F.col("avgdl").alias("_avgdl")))
    postings = (spark.read.parquet(f"{path}/postings")
                .filter(F.col("bucket").isin(bkts)
                        & F.col("term").isin(terms)))
    cand = (postings.join(qt_small, "term")
            .join(F.broadcast(idf), "term"))
    norm = (F.col("tf") + F.lit(k1)
            * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("_avgdl")))
    term_score = F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (cand.select("query_id", F.col(id_col),
                          term_score.alias("_s"))
              .groupBy("query_id", id_col)
              .agg(F.sum("_s").alias("score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
