"""Model-based quality classification for corpus curation
(DCLM / FineWeb-Edu style, closed-form).

The single highest-leverage curation step in recent public pipelines
is a learned quality classifier: DCLM (Li et al. 2024) filters with a
fastText model trained on instruction-quality positives vs raw-crawl
negatives, FineWeb-Edu (Penedo et al. 2024) with an educational-value
classifier, and the original GPT-3 WebText filter (Brown et al. 2020,
Appendix A) with logistic regression over unigram features. This
module is that signal re-expressed Spark-first as a multinomial Naive
Bayes classifier — chosen over SGD-trained logistic regression because
NB training is CLOSED FORM (two hash aggregations, no iterative driver
loop) and therefore deterministic and replayable by the DuckDB oracle
end to end:

  train = explode word tokens of the labeled corpus, one hash
          aggregation to per-token per-class counts, Laplace
          smoothing into a per-token log-likelihood ratio
          llr(t) = ln P(t|pos) - ln P(t|neg). Map-side partial
          combine, one shuffle; the model lands as one small
          DataFrame (bounded by the vocabulary, ~1-10 M rows for
          web text — broadcastable).
  score = explode each document's tokens (with multiplicity — the
          multinomial model), one broadcast left join against the
          model (unseen tokens coalesce to the constant smoothed
          llr), one per-document aggregate of the MEAN llr.

The decision statistic is the length-normalized mean token llr
(plus the class log-prior, reported separately): for long documents
the raw NB sum grows with length and saturates, so public large-scale
filters threshold a per-token average — the same normalization
fastText applies by mean-pooling token vectors.

Scale shape (10^12 docs): token strings cross one explode and feed a
broadcast probe — no corpus-side shuffle until the (id, partial-agg)
combine on id_col. Everything is expressions; no Python anywhere.

100% determinism: counts are integers; llr is ln of integer ratios;
the per-doc mean is rounded to 6 decimals like every float oracle
column in this repo (same policy as lmscore.py).

There is no reference twin (the reference service has no corpus-level
operators); text normalization reuses the curation family's
`dedup.normalize_text`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def word_tokens(c: Column) -> Column:
    """Word tokens (WITH multiplicity) of the normalized text; empty
    or whitespace-only text yields an empty array, not [""]."""
    norm = normalize_text(F.coalesce(c, F.lit("")))
    return F.when(norm == "", F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))


def nb_train(labeled_df: DataFrame, text_col: str = "text",
             label_col: str = "label") -> dict:
    """Train the Naive Bayes quality model on a labeled corpus
    (label 1 = positive/high-quality, 0 = negative).

    Returns {"model": DataFrame(token, llr), "prior": float,
    "unseen_llr": float, "vocab": int, "pos_tokens": int,
    "neg_tokens": int}. The scalars are driver-side values (train is
    a job step producing a model artifact, not a per-row path);
    ``unseen_llr`` is the smoothed llr of a token absent from BOTH
    class counts — it is NOT 0, because the two class denominators
    differ, and dropping it would bias every out-of-vocabulary token
    toward the larger class.
    """
    lbl = F.col(label_col).cast("int")
    tok = (labeled_df
           .select(lbl.alias("_y"),
                   F.explode(word_tokens(F.col(text_col))).alias("token"))
           .groupBy("token")
           .agg(F.sum(F.col("_y")).alias("pos_cnt"),
                F.sum(1 - F.col("_y")).alias("neg_cnt")))
    totals = (labeled_df
              .select(lbl.alias("_y"),
                      F.size(word_tokens(F.col(text_col))).alias("_n"))
              .agg(F.sum(F.col("_y") * F.col("_n")).alias("pos_tokens"),
                   F.sum((1 - F.col("_y")) * F.col("_n"))
                   .alias("neg_tokens"),
                   F.sum(F.col("_y")).alias("pos_docs"),
                   F.sum(1 - F.col("_y")).alias("neg_docs"))
              .collect()[0])
    vocab = max(int(tok.count()), 1)
    pos_t, neg_t = int(totals["pos_tokens"] or 0), int(totals["neg_tokens"] or 0)
    pos_d, neg_d = int(totals["pos_docs"] or 0), int(totals["neg_docs"] or 0)
    if pos_d == 0 or neg_d == 0:
        raise ValueError(
            f"nb_train needs both classes; got pos_docs={pos_d}, "
            f"neg_docs={neg_d}")
    model = tok.select(
        "token",
        (F.log((F.col("pos_cnt") + 1).cast("double") / (pos_t + vocab))
         - F.log((F.col("neg_cnt") + 1).cast("double") / (neg_t + vocab)))
        .alias("llr"))
    unseen = math.log(1.0 / (pos_t + vocab)) - math.log(1.0 / (neg_t + vocab))
    return {"model": model, "prior": math.log(pos_d / neg_d),
            "unseen_llr": unseen, "vocab": vocab,
            "pos_tokens": pos_t, "neg_tokens": neg_t}


def nb_score(df: DataFrame, model: dict, text_col: str = "text",
             id_col: str = "doc_id", broadcast: bool = True) -> DataFrame:
    """Per-document quality statistic under the trained model:
    (id, n_tokens, mean_llr). Positive mean_llr = reads like the
    positive class. Empty documents have n_tokens = 0 and NULL
    mean_llr (no phantom unseen-token score)."""
    m = F.broadcast(model["model"]) if broadcast else model["model"]
    toks = df.select(F.col(id_col),
                     F.explode_outer(word_tokens(F.col(text_col)))
                     .alias("token"))
    scored = (toks.join(m, on="token", how="left")
              .select(F.col(id_col),
                      F.col("token"),
                      # NULL token = the explode_outer placeholder of
                      # an empty doc — stays NULL so avg() ignores it;
                      # a real token missing from the model scores the
                      # constant smoothed unseen_llr.
                      F.when(F.col("token").isNotNull(),
                             F.coalesce(F.col("llr"),
                                        F.lit(model["unseen_llr"])))
                      .alias("t_llr")))
    return (scored.groupBy(id_col)
            .agg(F.count("token").alias("n_tokens"),
                 F.round(F.avg("t_llr"), 6).alias("mean_llr")))


def nb_quality(df: DataFrame, pos_df: DataFrame, neg_df: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               broadcast: bool = True) -> DataFrame:
    """Convenience: label ``pos_df``/``neg_df``, train, score ``df``."""
    labeled = (pos_df.select(F.col(text_col), F.lit(1).alias("label"))
               .unionByName(
                   neg_df.select(F.col(text_col), F.lit(0).alias("label"))))
    model = nb_train(labeled, text_col=text_col)
    return nb_score(df, model, text_col=text_col, id_col=id_col,
                    broadcast=broadcast)


def nb_filter(df: DataFrame, model: dict, threshold: float = 0.0,
              text_col: str = "text", id_col: str = "doc_id",
              broadcast: bool = True) -> DataFrame:
    """Keep documents whose mean_llr >= threshold (empty docs are
    dropped — they carry no evidence of quality). Preserves the input
    schema; the score columns are join-side only."""
    scores = nb_score(df, model, text_col=text_col, id_col=id_col,
                      broadcast=broadcast)
    keep = scores.filter(F.col("mean_llr") >= threshold).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")
