"""BPE train/encode: merge sequence vs an independent pure-Python
reference (Sennrich et al. 2016 semantics), expression-vs-Arrow encode
identity, tie-break determinism, early stop, and edge shapes."""

from collections import Counter

import pytest

from ocr_spark.operators import bpe

# Sennrich's worked example vocabulary (ACL 2016 §3.2), as documents.
DOCS = [
    (1, "low low low low low"),
    (2, "lower lower"),
    (3, "newest newest newest newest newest newest"),
    (4, "widest widest widest"),
]


def _word_counts(docs):
    c = Counter()
    for _, t in docs:
        c.update(t.lower().split())
    return c


def _ref_train(word_counts, k, min_count=2):
    vocab = {tuple(list(w) + [bpe.EOW]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (la, rb), cnt = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append({"rank": rank, "lhs": la, "rhs": rb,
                       "merged": la + rb, "pair_count": cnt})
        newv = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == (la, rb)):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            newv[tuple(out)] += c
        vocab = dict(newv)
    return merges


def _ref_encode(word, merges):
    syms = list(word) + [bpe.EOW]
    for m in merges:
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == (m["lhs"], m["rhs"])):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_train_matches_reference(spark, docs_df):
    got = bpe.bpe_train(docs_df, num_merges=8)
    want = _ref_train(_word_counts(DOCS), 8)
    assert got == want
    # the published first merges on this vocabulary: ('e','s') then
    # ('es','t') then ('est','</w>') — Sennrich's example sequence
    assert (got[0]["lhs"], got[0]["rhs"]) == ("e", "s")
    assert (got[1]["lhs"], got[1]["rhs"]) == ("es", "t")
    assert (got[2]["lhs"], got[2]["rhs"]) == ("est", bpe.EOW)


def test_train_overlapping_pair_semantics(spark):
    # 'aaaa' under merge (a,a): greedy left-to-right gives aa|aa —
    # pair count for (a,a) in 'aaaa' is 3 (overlapping counts), the
    # reference behavior.
    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")],
                               "doc_id int, text string")
    got = bpe.bpe_train(df, num_merges=2)
    want = _ref_train(_word_counts([(1, "aaaa aaaa aaaa")]), 2)
    assert got == want
    assert (got[0]["lhs"], got[0]["rhs"]) == ("a", "a")
    assert got[0]["pair_count"] == 9
    # after aa|aa|</w>, (aa,aa) and (aa,</w>) tie at 3 — the
    # lexicographic tiebreak picks (aa,</w>) ('<' sorts before 'a')
    assert (got[1]["lhs"], got[1]["rhs"]) == ("aa", bpe.EOW)


def test_train_early_stop_on_min_count(spark):
    # every word unique once -> best pair count 1 < min_count=2
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id int, text string")
    assert bpe.bpe_train(df, num_merges=4) == []
    assert len(bpe.bpe_train(df, num_merges=4, min_count=1)) == 4


def test_word_pattern_filters_vocab(spark):
    df = spark.createDataFrame([(1, "aaa aaa a1a a1a a1a a1a")],
                               "doc_id int, text string")
    got = bpe.bpe_train(df, num_merges=1, word_pattern="^[a-z]+$")
    assert (got[0]["lhs"], got[0]["rhs"]) == ("a", "a")
    assert got[0]["pair_count"] == 4  # only 'aaa' x2 counted


def test_encode_matches_reference_and_arrow(spark, docs_df):
    merges = bpe.bpe_train(docs_df, num_merges=5)
    enc = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
           for r in bpe.bpe_encode(docs_df, merges).collect()}
    for did, text in DOCS:
        want = []
        for w in text.split():
            want.extend(_ref_encode(w, merges))
        assert enc[did] == (want, len(want)), did
    arrow = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
             for r in bpe.bpe_encode_arrow(docs_df, merges).collect()}
    assert arrow == enc


def test_encode_paths_agree_on_messy_text(spark):
    rows = [(1, "Tabs\there  and\nnewlines"), (2, ""), (3, None),
            (4, "MiXeD CaSe unicode héllo héllo"), (5, "   "),
            (6, "x" * 300)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe.bpe_train(df, num_merges=3, min_count=1)
    expr = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
            for r in bpe.bpe_encode(df, merges).collect()}
    arrow = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
             for r in bpe.bpe_encode_arrow(df, merges).collect()}
    assert expr == arrow
    assert expr[2] == ([], 0) and expr[5] == ([], 0)


def test_encode_expr_bound(spark, docs_df):
    merges = [{"rank": i, "lhs": "a", "rhs": "b", "merged": "ab",
               "pair_count": 2} for i in range(300)]
    with pytest.raises(ValueError):
        bpe.bpe_encode(docs_df, merges)


def test_merges_df_artifact(spark, docs_df):
    merges = bpe.bpe_train(docs_df, num_merges=3)
    mdf = bpe.merges_df(spark, merges)
    assert [r["merged"] for r in mdf.orderBy("rank").collect()] \
        == [m["merged"] for m in merges]


def test_merge_never_crosses_symbol_boundaries(spark):
    """Review repro: with symbols 'ab' and 'c</w>' alive, the merge
    (b, c</w>) must NOT match the tail of 'ab' — and the later merge
    (ab, c</w>) must be discoverable. Checked against the reference
    implementation end to end."""
    text = "ab ab ab ab ab abc bc bc bc bc"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = bpe.bpe_train(df, num_merges=6)
    want = _ref_train(_word_counts([(1, text)]), 6)
    assert got == want
    assert ("ab", bpe.EOW) in [(m["lhs"], m["rhs"]) for m in got]
    merges = got
    enc = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.bpe_encode(df, merges).collect()}
    want_toks = []
    for w in text.split():
        want_toks.extend(_ref_encode(w, merges))
    assert enc[1] == want_toks
    # 'abc' specifically must encode as [ab, c</w>], never [abc</w>]
    assert _ref_encode("abc", merges) == ["ab", "c" + bpe.EOW]
    arrow = {r["doc_id"]: r["bpe_tokens"]
             for r in bpe.bpe_encode_arrow(df, merges).collect()}
    assert arrow == enc


def test_train_and_encode_tokenize_identically(spark):
    """Review finding: encode must split words with the SAME Java-\\s
    convention the word histogram uses — U+2028 (and NEL) are NOT
    whitespace to Java \\s, so 'hello\\u2028world' is ONE word on both
    sides."""
    text = "hello world hello world plain plain"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    hist = {r["word"]: r["cnt"]
            for r in bpe.word_histogram(df).collect()}
    assert hist == {"hello world": 2, "plain": 2}
    merges = bpe.bpe_train(df, num_merges=2, min_count=1)
    for fn in (bpe.bpe_encode, bpe.bpe_encode_arrow):
        toks = fn(df, merges).collect()[0]["bpe_tokens"]
        # every encoded token joins back into one of the two words
        # (split on ASCII space only — Python's bare split() would
        # itself split the U+2028 this test exists to preserve)
        rebuilt = [w for w in
                   "".join(toks).replace(bpe.EOW, " ").split(" ") if w]
        assert rebuilt == ["hello world", "hello world",
                          "plain", "plain"], fn.__name__


def test_arrow_encoder_is_iterative_min_rank(spark):
    """The Arrow path implements the standard iterative encoder
    (subword-nmt apply_bpe): repeatedly merge the lowest-rank pair
    PRESENT. On a hand-built table where the rank-1 merge's operand
    ('bc') is only created by the rank-2 merge, one-pass-in-rank-order
    (the bounded expression/oracle form — documented deviation) leaves
    ['a', 'bc</w>'] while the iterative encoder reaches ['abc</w>'].
    Trained tables cannot produce this shape (a pair can't be counted
    before its operands exist), which is why the two paths are
    output-identical everywhere else in the suite."""
    eow = bpe.EOW
    merges = [
        {"rank": 1, "lhs": "c", "rhs": eow, "merged": "c" + eow,
         "pair_count": 9},
        {"rank": 2, "lhs": "a", "rhs": "bc" + eow,
         "merged": "abc" + eow, "pair_count": 9},
        {"rank": 3, "lhs": "b", "rhs": "c" + eow,
         "merged": "bc" + eow, "pair_count": 9},
    ]
    df = spark.createDataFrame([(1, "abc")], "doc_id int, text string")
    arrow = bpe.bpe_encode_arrow(df, merges).collect()[0]
    assert arrow["bpe_tokens"] == ["abc" + eow]
    expr = bpe.bpe_encode(df, merges).collect()[0]
    assert expr["bpe_tokens"] == ["a", "bc" + eow]
