"""Text-analysis operators for corpus curation: language ID, quality
scoring, token counting, document fingerprinting.

Pure Catalyst expressions end to end — these run inside whole-stage
codegen over the documents table and are DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# Per-language stopword inventories for the stopword-vote language-ID
# heuristic (public common-word frequency lists, 25 words/language).
# The driver oracle SQL is GENERATED from this dict
# (__spark_entry__._sql_lang_id), so Spark and DuckDB can never drift.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with",
           "that", "as", "it", "was", "at", "by", "this", "from", "are",
           "be", "have", "not", "but", "they", "his"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "por",
           "las", "una", "con", "no", "para", "es", "al", "se", "su",
           "como", "más", "pero", "sus", "le", "ya"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est",
           "que", "qui", "dans", "pour", "pas", "sur", "ne", "au", "ce",
           "il", "plus", "par", "avec", "son", "se"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "ein",
           "zu", "nicht", "im", "auch", "es", "auf", "für", "eine", "als",
           "sich", "an", "werden", "aus", "er", "hat", "dass"],
    "it": ["il", "di", "che", "la", "e", "un", "per", "una", "in", "sono",
           "del", "non", "le", "si", "con", "mi", "ma", "lo", "ho", "ha",
           "questo", "della", "come", "più", "anche"],
    "pt": ["de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais",
           "as", "dos", "como", "mas", "foi", "ele"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die",
           "in", "is", "je", "niet", "op", "zijn", "met", "als", "voor",
           "was", "er", "maar", "om", "dan", "ook", "bij"],
}

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(F.trim(normalize_text(c)), " ")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: alpha runs + digit runs + single
    punctuation marks (a BPE-flavored regex segmentation)."""
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_ISH), 0))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    tok = tokens(c)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(tok, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tok) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(tok))


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def mean_word_length(c: Column) -> Column:
    tok = tokens(c)
    total = F.aggregate(tok, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tok) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(tok))


def quality_score(c: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: length signal,
    stopword presence, sane word lengths, bounded punctuation."""
    n = F.length(F.trim(c))
    length_sig = F.least(n.cast("double") / 500.0, F.lit(1.0))
    sw = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    mwl = mean_word_length(c)
    word_sig = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_sig = F.when(punct_ratio(c) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        length_sig * 0.4 + sw * 0.3 + word_sig * 0.2 + punct_sig * 0.1, 6)


def lang_id(c: Column) -> Column:
    """Stopword-vote language ID: the language with the most stopword
    hits wins; ties break alphabetically; no hits -> 'und'."""
    tok = tokens(c)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(tok, lambda t: F.array_contains(sw, t)))
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def fingerprint(c: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_text(c).cast("binary"))


def rolling_fingerprint(c: Column, window: int = 16) -> Column:
    """Winnowing-style robust fingerprint: min xxhash64 over the
    document's character k-grams (stable under local edits elsewhere)."""
    from .dedup import shingles
    return F.array_min(F.transform(shingles(c, window), lambda s: F.xxhash64(s)))


def document_stats(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats frame."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(mean_word_length(c), 6).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )
