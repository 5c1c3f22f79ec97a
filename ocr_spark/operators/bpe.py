"""Distributed BPE tokenizer training and encoding.

Byte-pair encoding exactly as published (Sennrich, Haddow & Birch,
ACL 2016, "Neural Machine Translation of Rare Words with Subword
Units"): start from characters plus an end-of-word marker, repeatedly
merge the most frequent adjacent symbol pair. The part most pipelines
get wrong at scale is WHERE the iteration runs: pair statistics are a
function of the distinct-WORD histogram, not the corpus — so the only
corpus-sized pass here is one tokenize + word-count aggregation, and
every merge iteration afterwards runs over the vocabulary-sized
(word, count, symbols) frame (~10^6-10^7 rows no matter how many
petabytes the corpus is; Sennrich's own reference implementation
trains on a word/frequency dictionary for the same reason).

Representation: every symbol is WRAPPED in single spaces, so a word's
sequence is ``" h  e  l  l  o  </w> "`` — two spaces between symbols
(each symbol owns its leading and trailing pad), one at each string
edge. Symbols can never contain a space (words are whitespace tokens),
so a merge step is a plain literal
``replace(syms, " l  r ", " lr ")`` with left-to-right non-overlapping
semantics identical in Spark and DuckDB. The pads are load-bearing in
BOTH directions:

- the pattern's OUTER spaces anchor it to whole symbols: without them
  ``"b  c"`` matches the tail of symbol ``"ab"`` (or the head of
  ``"bc"``) and merges across a symbol boundary — a real corruption a
  review repro caught, not a theoretical one;
- because each symbol owns BOTH its pads, consecutive occurrences
  don't share a boundary character: ``" a  a  a  a "`` under merge
  (a,a) consumes ``" a  a "`` whole and the remainder ``" a  a "``
  still matches — so one replace pass merges every non-overlapping
  occurrence left-to-right, exactly Sennrich's greedy re-pairing
  (``" a  a  a "`` becomes ``" aa  a "``).

That keeps BOTH the train loop and the encoder pure Catalyst
expressions, replayable by the DuckDB oracle; parsing back is
``split(trim(syms), "  ")``.

Train loop shape per merge: one pair explode + hash aggregation over
the vocabulary frame, one ``.limit(1)`` argmax collect (ties broken
count-desc, then pair lexicographic — deterministic), one literal
replace projection; the frame is localCheckpointed each round so K
merges cost O(K) vocabulary passes, not O(K^2) lineage replays (the
dedup_resolve trade). Driver involvement is one 1-row collect per
merge — the same shape as any iterative-algorithm driver loop.

Encoding comes in two forms with deliberately different fidelity:

- ``bpe_encode`` (expression form, the oracle path) applies each merge
  EXACTLY ONCE in rank order — chained literal replaces, pure codegen,
  replayable in DuckDB. For merge tables learned by ``bpe_train`` (or
  any trainer) this equals the full encoder, because a merge's operand
  symbols can only be created by EARLIER-rank merges — training cannot
  count a pair before its operands exist. It diverges only on
  hand-crafted tables where an early-rank merge consumes a symbol a
  LATER-rank merge creates.
- ``bpe_encode_arrow`` (the scale form) implements the standard
  iterative encoder (subword-nmt ``apply_bpe``): repeatedly merge the
  lowest-rank pair PRESENT until none applies — externally-faithful
  for arbitrary merge tables, memoized per distinct word. (32k merges
  as 32k nested codegen calls is not a plan, it's a stack overflow;
  this is the documented production path.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _term_rows, tokens

EOW = "</w>"
SEP = "  "


def word_histogram(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   word_pattern: str | None = None) -> DataFrame:
    """(word, cnt) over the corpus-wide tokenization convention —
    the single corpus-sized pass of BPE training. ``word_pattern``
    optionally restricts the training vocabulary (rlike)."""
    w = (_term_rows(df, text_col, id_col)
         .groupBy(F.col("term").alias("word"))
         .agg(F.count("*").alias("cnt")))
    if word_pattern is not None:
        w = w.filter(F.col("word").rlike(word_pattern))
    return w


def merge_pattern(lhs: str, rhs: str) -> tuple[str, str]:
    """(search, replacement) literals for one merge under the
    space-wrapped representation — the single definition every
    consumer (train, both encoders, the generated oracle SQL's
    Python twin in tests) shares."""
    return f" {lhs}{SEP}{rhs} ", f" {lhs}{rhs} "


def initial_syms(word: Column) -> Column:
    """Character symbols + end-of-word marker, space-wrapped."""
    return F.concat(F.lit(" "),
                    F.array_join(F.split(word, ""), SEP),
                    F.lit(SEP + EOW + " "))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(lhs, rhs, pair_count) over the vocabulary frame, weighted by
    word count. The symbol array lands in a real column first (the
    Catalyst generator-inlining lesson), and single-symbol words
    contribute no pairs — guarded explicitly because
    ``sequence(1, 0)`` is DESCENDING in Spark, not empty."""
    arr = (words.select("cnt", F.split(F.trim(F.col("syms")), SEP)
                        .alias("a"))
           .filter(F.size("a") >= 2))
    pairs = arr.select(
        "cnt",
        F.explode(F.expr(
            "transform(sequence(1, size(a) - 1),"
            " i -> struct(a[i - 1] AS lhs, a[i] AS rhs))")).alias("p"))
    return (pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("pair_count")))


def bpe_train(df: DataFrame, num_merges: int, text_col: str = "text",
              id_col: str = "doc_id", min_count: int = 2,
              word_pattern: str | None = None) -> list[dict]:
    """Learn ``num_merges`` merges; returns them in rank order as
    [{rank, lhs, rhs, merged, pair_count}, ...]. Stops early when the
    best remaining pair falls under ``min_count`` (merging singleton
    noise encodes the training sample, not the language)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    words = (word_histogram(df, text_col, id_col, word_pattern)
             .select(initial_syms(F.col("word")).alias("syms"), "cnt")
             .localCheckpoint())
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        best = (_pair_counts(words)
                .orderBy(F.col("pair_count").desc(),
                         F.col("lhs").asc(), F.col("rhs").asc())
                .limit(1).collect())
        if not best or best[0]["pair_count"] < min_count:
            break
        lhs, rhs = best[0]["lhs"], best[0]["rhs"]
        merges.append({"rank": rank, "lhs": lhs, "rhs": rhs,
                       "merged": lhs + rhs,
                       "pair_count": int(best[0]["pair_count"])})
        pat, rep = merge_pattern(lhs, rhs)
        words = (words.withColumn(
            "syms", F.replace(F.col("syms"), F.lit(pat), F.lit(rep)))
            .localCheckpoint())
    return merges


def merges_df(spark, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (persistable tokenizer
    artifact)."""
    return spark.createDataFrame(
        [(m["rank"], m["lhs"], m["rhs"], m["merged"], m["pair_count"])
         for m in merges],
        "rank int, lhs string, rhs string, merged string, "
        "pair_count bigint")


def _apply_merges_expr(syms: Column, merges: list[dict]) -> Column:
    """Chained literal replaces, each merge applied once in rank
    order. Equal to the iterative encoder for trained merge tables
    (see module docstring); the deviation on adversarial hand-built
    tables is deliberate — this form exists to stay a pure Catalyst
    expression the DuckDB oracle can replay."""
    out = syms
    for m in merges:
        pat, rep = merge_pattern(m["lhs"], m["rhs"])
        out = F.replace(out, F.lit(pat), F.lit(rep))
    return out


def bpe_encode(df: DataFrame, merges: list[dict],
               text_col: str = "text", id_col: str = "doc_id",
               max_expr_merges: int = 256) -> DataFrame:
    """(id, bpe_tokens ARRAY<STRING>, n_bpe_tokens) — every word of
    every document encoded with the learned merges, in document order.
    Pure-expression form, bounded to ``max_expr_merges`` (beyond that
    the chained-replace expression tree stops being a sane plan — use
    bpe_encode_arrow)."""
    if len(merges) > max_expr_merges:
        raise ValueError(
            f"{len(merges)} merges exceeds the expression-form bound "
            f"({max_expr_merges}); use bpe_encode_arrow")
    # Tokenization is EXACTLY the word_histogram convention
    # (textstats.tokens over the dedup normalize — Java \s, NOT the
    # DuckDB-side [\s\v] idiom, which in a Java regex is a SUPERSET
    # adding NEL/U+2028/U+2029 and would split the corpus into
    # different words than the ones training saw). NULL text encodes
    # to ([], 0), the token_count convention — a curation chain
    # counting corpus tokens must see empty rows, not nulls that
    # silently drop from sums.
    words = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                     lambda t: t != "")
    enc = F.transform(
        words, lambda w: F.split(
            F.trim(_apply_merges_expr(initial_syms(w), merges)), SEP))
    toks = F.flatten(enc)
    # toks lands ONCE; size() reads the landed column (the
    # multi-referenced-projection rule — duplicating the chained-
    # replace tree into both output columns doubles the encode).
    return (df.select(F.col(id_col), toks.alias("bpe_tokens"))
            .withColumn("n_bpe_tokens", F.size("bpe_tokens")))


def bpe_encode_arrow(df: DataFrame, merges: list[dict],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow path for production-sized merge tables: one mapInPandas
    pass, the standard iterative BPE encoder (subword-nmt apply_bpe —
    repeatedly merge the lowest-RANK pair present until none applies)
    run per DISTINCT word per batch (the memo is the classic
    BPE-encoder cache — web text repeats words heavily), and only
    (id, tokens, count) crosses back. Output-identical to bpe_encode
    on trained merge tables (test-pinned); on hand-built tables whose
    early-rank merges consume later-created symbols, THIS form is the
    externally-faithful one."""
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)
    id_type = df.schema[id_col].dataType
    out_schema = StructType([
        StructField(id_col, id_type),
        StructField("bpe_tokens", ArrayType(StringType())),
        StructField("n_bpe_tokens", IntegerType()),
    ])
    rank_of = {(m["lhs"], m["rhs"]): m["rank"] for m in merges}

    # Java-\s-equivalent whitespace class (the expression twin splits
    # with textstats.tokens -> Java \s): Python's bare str.split()
    # would ALSO split on unicode spaces (NBSP, NEL, U+2028...) that
    # Java \s does not match — the two paths must tokenize identically
    # or "output-identical" is a lie.
    import re
    ws_re = re.compile("[ \t\n\x0b\f\r]+")

    def encode_batches(batches):
        import pandas as pd
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                syms = [*w, EOW]
                while len(syms) > 1:
                    best_rank = best = None
                    for pair in zip(syms, syms[1:]):
                        r = rank_of.get(pair)
                        if r is not None and (best_rank is None
                                              or r < best_rank):
                            best_rank, best = r, pair
                    if best is None:
                        break
                    a, b = best
                    out, i, n = [], 0, len(syms)
                    while i < n:  # merge occurrences left-to-right
                        if (i + 1 < n and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                got = memo[w] = syms
            return got

        for pdf in batches:
            ids, toks, counts = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = "" if t is None else t
                norm = ws_re.sub(" ", t.strip(" ").lower())
                ws = [w for w in norm.strip(" ").split(" ") if w]
                out: list[str] = []
                for w in ws:
                    out.extend(enc_word(w))
                ids.append(i)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame({id_col: ids, "bpe_tokens": toks,
                                "n_bpe_tokens": counts})

    return (df.select(id_col, text_col)
            .mapInPandas(encode_batches, out_schema))
