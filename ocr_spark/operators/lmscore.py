"""Language-model quality scoring for corpus curation (CCNet-style).

CCNet (Wenzek et al., LREC 2020) ranks Common-Crawl pages by the
perplexity of a KenLM 5-gram model trained on a clean reference
corpus — the canonical "does this read like real language" signal
that length/stopword/repetition heuristics can't see. This module is
that signal re-expressed Spark-first with a character-trigram model
and Laplace (add-one) smoothing:

  train  = two hash aggregations over the reference corpus
           (n-gram counts + (n-1)-gram context counts) — map-side
           partial combine, one shuffle each, model lands as two
           small DataFrames.
  score  = explode each document's n-grams, two broadcast joins
           against the model (gram count, context count), then one
           per-document aggregate of -log2 P(c|ctx) — bits per
           character, lower = more natural.

P(c | ctx) = (count(ngram) + 1) / (count(ctx) + V), V = reference
charset size. Unseen grams and contexts coalesce to 0 — P = 1/V at
the floor, so a page of binary noise scores ~log2(V) bits/char.

Scale shape: the model is bounded by the reference charset cubed
(practically ~100k-1M rows for web text — broadcastable); set
``broadcast=False`` to fall back to shuffle joins for a giant-charset
model. Everything else is expressions; no Python in the hot path.

100% determinism note: counts are integers, probabilities are single
IEEE divisions of integers (identical across engines); the one
order-sensitive op is the final avg, rounded to 6 like every float
oracle column in this repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def char_ngrams(c: Column, n: int = 3) -> Column:
    """Character n-grams of the normalized text as an array expression.
    Spark's sequence() counts DOWN when stop < start, so short texts
    need the explicit empty-array guard.

    PERF WARNING (measured): Catalyst inlines ``norm`` into the
    per-element lambda, so exploding this array re-runs the whole
    normalize regex once PER GRAM — O(len²) per document. Fine for
    tests and array-valued use; the train/score hot paths use
    ``_gram_rows`` (position explode over ints, normalize computed
    once per doc in the projection below the Generate) instead —
    measured 16.7s -> 3.7s on the sf0.1 corpus (4.5x)."""
    norm = normalize_text(F.coalesce(c, F.lit("")))
    length = F.length(norm)
    return F.when(
        length >= n,
        F.transform(F.sequence(F.lit(1), length - n + 1),
                    lambda i: norm.substr(i, F.lit(n))))\
        .otherwise(F.array().cast("array<string>"))


def _gram_rows(df: DataFrame, text_col: str, n: int, outer: bool,
               keep: tuple = ()) -> DataFrame:
    """(keep..., gram): one row per n-gram POSITION. The normalized
    text lands in a real column (`_n`) below the position explode, so
    the regex runs once per document; the gram is substr'd out above
    the Generate. ``outer`` keeps empty/short docs as one NULL-gram
    row (the lm_score placeholder semantics)."""
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    idx = F.when(F.length(F.col("_n")) >= n,
                 F.sequence(F.lit(1), F.length(F.col("_n")) - n + 1))\
        .otherwise(F.array().cast("array<int>"))
    ex = F.explode_outer(idx) if outer else F.explode(idx)
    return (df.select(*keep, norm.alias("_n"))
            .select(*keep, F.col("_n"), ex.alias("_i"))
            .select(*keep,
                    F.col("_n").substr(F.col("_i"), F.lit(n))
                    .alias("gram")))


def train_char_lm(ref_df: DataFrame, text_col: str = "text",
                  n: int = 3) -> dict:
    """Train the character n-gram model on a reference corpus.

    Returns {"grams": DataFrame(gram, cnt), "contexts":
    DataFrame(ctx, ctx_cnt), "vocab": int, "n": int}. The vocab count
    is a driver-side int (train is a job step that produces a model
    artifact, not a per-row path)."""
    grams = (_gram_rows(ref_df, text_col, n, outer=False)
             .groupBy("gram").agg(F.count("*").alias("cnt")))
    contexts = (grams
                .groupBy(F.substring("gram", 1, n - 1).alias("ctx"))
                .agg(F.sum("cnt").alias("ctx_cnt")))
    vocab = (ref_df
             .select(F.explode(F.split(
                 normalize_text(F.coalesce(F.col(text_col), F.lit(""))),
                 "")).alias("ch"))
             .filter(F.col("ch") != "")
             .select("ch").distinct().count())
    return {"grams": grams, "contexts": contexts,
            "vocab": max(int(vocab), 1), "n": n}


def lm_score(df: DataFrame, model: dict, text_col: str = "text",
             id_col: str = "doc_id", broadcast: bool = True) -> DataFrame:
    """Per-document bits-per-character under the trained model:
    (id, n_grams, bits_per_char). Documents shorter than n normalized
    characters have no grams — n_grams = 0, bits_per_char NULL."""
    n, v = model["n"], model["vocab"]
    grams_m = model["grams"]
    ctx_m = model["contexts"]
    if broadcast:
        grams_m, ctx_m = F.broadcast(grams_m), F.broadcast(ctx_m)
    g = _gram_rows(df, text_col, n, outer=True, keep=(F.col(id_col),))
    scored = (g
              .join(grams_m, on="gram", how="left")
              .join(ctx_m,
                    F.substring("gram", 1, n - 1) == F.col("ctx"),
                    how="left")
              .select(
                  F.col(id_col), F.col("gram"),
                  # NULL gram = the explode_outer placeholder of an
                  # empty document — it must not score as a phantom
                  # 1/V, so p stays NULL and avg() ignores the row.
                  F.when(
                      F.col("gram").isNotNull(),
                      (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                      .cast("double")
                      / (F.coalesce(F.col("ctx_cnt"), F.lit(0)) + v))
                  .alias("p")))
    return (scored.groupBy(id_col)
            .agg(F.count("gram").alias("n_grams"),
                 F.round(F.avg(-F.log2(F.col("p"))), 6)
                 .alias("bits_per_char")))


def lm_quality(df: DataFrame, ref_df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", n: int = 3,
               broadcast: bool = True) -> DataFrame:
    """Convenience: train on ``ref_df``, score ``df``."""
    model = train_char_lm(ref_df, text_col=text_col, n=n)
    return lm_score(df, model, text_col=text_col, id_col=id_col,
                    broadcast=broadcast)


CCNET_CUTOFFS = (1.0 / 3.0, 2.0 / 3.0)


def ccnet_buckets(scored: DataFrame, lang_col: str | None = None,
                  score_col: str = "bits_per_char",
                  cutoffs: tuple[float, float] = CCNET_CUTOFFS,
                  exact: bool = False,
                  accuracy: int = 10000) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4): per
    language, documents below the lower score quantile are 'head'
    (most natural under the reference LM), between the quantiles
    'middle', above 'tail' — the partition CCNet publishes and
    downstream recipes sample from (head-heavy mixes for quality,
    tail for diversity studies).

    Input is a SCORED frame (lm_score/lm_quality output joined with
    whatever grouping column applies) — bucketing composes with any
    scorer. Unscoreable rows (NULL score — documents too short for a
    single n-gram) keep a NULL bucket: they were never ranked, and
    silently binning them as 'tail' would misreport the split sizes.

    Scale shape: ONE aggregation computes both cutoffs per language
    (percentile_approx by default — a t-digest-style mergeable sketch,
    single pass, no global sort; ``exact=True`` switches to exact
    percentile for oracle replay — Spark's linear interpolation at
    rank p*(n-1) is bit-identical to DuckDB's quantile_cont, probed),
    then the language-count-sized cutoff table broadcasts back onto
    the corpus. No window over the corpus, no per-language global
    sort — an ntile() spelling would drag every row of a language
    through one window partition.
    """
    lo, hi = cutoffs
    if not (0.0 < lo < hi < 1.0):
        raise ValueError("cutoffs must satisfy 0 < lo < hi < 1")
    s = F.col(score_col)
    if exact:
        agg_expr = F.expr(
            f"percentile({score_col}, array({lo!r}D, {hi!r}D))")
    else:
        agg_expr = F.expr(
            f"percentile_approx({score_col}, array({lo!r}D, {hi!r}D), "
            f"{accuracy})")
    ranked = scored.filter(s.isNotNull())
    if lang_col is None:
        cuts = (ranked.agg(agg_expr.alias("_c"))
                .select(F.col("_c")[0].alias("_cut_head"),
                        F.col("_c")[1].alias("_cut_tail")))
        out = scored.crossJoin(F.broadcast(cuts))
    else:
        cuts = (ranked.groupBy(lang_col).agg(agg_expr.alias("_c"))
                .select(F.col(lang_col),
                        F.col("_c")[0].alias("_cut_head"),
                        F.col("_c")[1].alias("_cut_tail")))
        out = scored.join(F.broadcast(cuts), on=lang_col, how="left")
    # NULL-cut guard: a row whose group has no cutoffs (NULL lang key
    # never equi-joins; a group with zero ranked rows has no row at
    # all) must get a NULL bucket — without the guard `s <= NULL`
    # skips every WHEN and mislabels the row 'tail'.
    bucket = (F.when(s.isNull() | F.col("_cut_head").isNull(),
                     F.lit(None).cast("string"))
              .when(s <= F.col("_cut_head"), F.lit("head"))
              .when(s <= F.col("_cut_tail"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (out.withColumn("bucket", bucket)
            .withColumnRenamed("_cut_head", "cut_head")
            .withColumnRenamed("_cut_tail", "cut_tail"))
