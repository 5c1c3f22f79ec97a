"""BM25 retrieval: scoring math vs a pure-Python reference, tie-break
determinism, empty/zero-token edges, and the on-disk inverted index
(value-identity with the direct path + partition-prune evidence)."""

import math

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import search

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lazy summer days and lazy summer nights"),
    (4, "a completely unrelated document about spark shuffles"),
    (5, ""),                       # zero tokens — still counts in N/avgdl
    (6, "fox fox fox fox fox"),    # tf saturation case
]

QUERIES = [
    (10, "quick fox"),
    (11, "lazy"),
    (12, "quick quick quick fox"),   # duplicate terms fold to one clause
    (13, "zzz-nowhere"),             # no matching term -> no hits
    (14, "   "),                     # whitespace-only -> no terms
]


def _ref_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent reference implementation (dict-and-loop)."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in sorted(set(qtext.lower().split())):
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for did, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                dl = len(v)
                scores[did] = scores.get(did, 0.0) + (
                    idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1 - b + b * dl / avgdl)))
        out[qid] = scores
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    queries = spark.createDataFrame(
        QUERIES, "query_id int, query_text string")
    return docs, queries


def test_scores_match_reference(spark, frames):
    docs, queries = frames
    got = {(r["query_id"], r["doc_id"]): r["score"]
           for r in search.bm25_score(docs, queries).collect()}
    want = _ref_bm25(DOCS, QUERIES)
    flat = {(q, d): s for q, ds in want.items() for d, s in ds.items()}
    assert set(got) == set(flat)
    for key, s in flat.items():
        assert got[key] == pytest.approx(s, rel=1e-12), key


def test_topk_rank_and_tiebreak(spark, frames):
    docs, queries = frames
    rows = search.bm25_topk(docs, queries, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # ranks are 1..k dense, ordered by score desc then doc_id asc
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, bb in zip(rs, rs[1:]):
            assert (a["score"], -a["doc_id"]) >= (bb["score"], -bb["doc_id"])
    # no-hit queries produce no rows at all
    assert 13 not in by_q and 14 not in by_q
    # saturation: doc 6 (tf=5) outranks doc 2 (tf=1) for 'fox'-ish query
    q10 = [r["doc_id"] for r in by_q[10]]
    assert q10[0] == 2  # matches BOTH query terms; beats one-term docs


def test_zero_token_doc_counts_in_stats(spark, frames):
    docs, queries = frames
    # If doc 5 were dropped from N/avgdl, every idf and norm changes;
    # the reference implementation includes it, and scores match
    # (covered above). Double-check dl frame explicitly:
    dl = {r["doc_id"]: r["dl"]
          for r in search._doc_lengths(docs, "text", "doc_id").collect()}
    assert dl[5] == 0 and len(dl) == len(DOCS)


def test_index_roundtrip_matches_direct(spark, frames, tmp_path):
    docs, queries = frames
    path = str(tmp_path / "bm25_idx")
    search.bm25_write_index(docs, path, buckets=8)
    direct = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"])
              for r in search.bm25_topk(docs, queries, k=4).collect()}
    via_idx = search.bm25_search_index(spark, path, queries, k=4,
                                       buckets=8)
    got = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"])
           for r in via_idx.collect()}
    assert set(got) == set(direct)
    for key, (s, rank) in direct.items():
        assert got[key][1] == rank
        assert got[key][0] == pytest.approx(s, rel=1e-12)
    # the probed scan carries a bucket partition filter (static prune)
    plan = via_idx._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_index_prunes_partitions(spark, frames, tmp_path):
    docs, _ = frames
    path = str(tmp_path / "bm25_idx2")
    search.bm25_write_index(docs, path, buckets=8)
    one_q = spark.createDataFrame([(1, "fox")],
                                  "query_id int, query_text string")
    out = search.bm25_search_index(spark, path, one_q, k=10, buckets=8)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    # the literal IN filter on the partition column is in the plan
    assert "bucket" in optimized and "IN" in optimized.upper()
    assert out.count() == 3  # docs 1, 2, 6 contain 'fox'


def test_empty_query_frame(spark, frames):
    docs, _ = frames
    empty_q = spark.createDataFrame([], "query_id int, query_text string")
    assert search.bm25_topk(docs, empty_q, k=5).count() == 0
