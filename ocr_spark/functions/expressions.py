"""Catalyst column-expression forms of the regex-mappable operators.

Everything here stays JVM-side inside whole-stage codegen — no Python
in the hot path. Each expression's oracle is the same-named pure
function in textlib (property-tested for equivalence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_name(c: Column) -> Column:
    """NormalizeString (ref utils/ocr_parser.go:390-395)."""
    return F.replace(F.replace(F.lower(c), F.lit(" "), F.lit("")),
                     F.lit("."), F.lit(""))


def compare_names(a: Column, b: Column) -> Column:
    """CompareNames (ref utils/ocr_parser.go:397-427) as a pure expression:
    exact / substring-either-way / token-overlap >= 0.5 with the shorter
    token list as base."""
    a2 = normalize_name(a)
    b2 = normalize_name(b)

    wa = F.split(F.trim(F.lower(a)), r"\s+")
    wb = F.split(F.trim(F.lower(b)), r"\s+")
    base = F.when(F.size(wa) > F.size(wb), wb).otherwise(wa)
    other = F.when(F.size(wa) > F.size(wb), wa).otherwise(wb)

    matched = F.size(F.filter(
        base,
        lambda x: F.exists(other, lambda y: y.contains(x) | x.contains(y)),
    ))
    overlap_ok = (matched.cast("double") / F.size(base)) >= F.lit(0.5)

    return F.when((a == "") | (b == ""), F.lit(False)).otherwise(
        (a2 == b2) | a2.contains(b2) | b2.contains(a2) | overlap_ok
    )


def name_similarity(a: Column, b: Column) -> Column:
    """CalculateNameSimilarity (ref utils/ocr_parser.go:429-446): maps 1:1
    to the builtin levenshtein — V3/V4 need no UDF at all."""
    a2 = normalize_name(a)
    b2 = normalize_name(b)
    sim = F.lit(1.0) - F.levenshtein(a2, b2) / F.greatest(F.length(a2), F.length(b2))
    return (
        F.when((a2 == "") & (b2 == ""), F.lit(1.0))
        .when((a2 == "") | (b2 == ""), F.lit(0.0))
        .otherwise(sim)
    )


def text_quality(c: Column) -> Column:
    """evaluateTextQuality (ref service/income_service.go:428-467):
    length buckets + 6.67/keyword over 9 tax keywords, capped at 100."""
    n = F.length(F.trim(c))
    length_score = (
        F.when(n > 500, F.lit(40.0))
        .when(n > 100, F.lit(20.0))
        .when(n > 20, F.lit(10.0))
        .otherwise(F.lit(0.0))
    )
    lower = F.lower(c)
    keywords = ["income", "tax", "pan", "assessment", "return",
                "total", "taxable", "refund", "filing"]
    kw_count = None
    for k in keywords:
        term = F.when(lower.contains(k), 1).otherwise(0)
        kw_count = term if kw_count is None else kw_count + term
    score = length_score + kw_count.cast("double") * F.lit(6.67)
    return F.when(c == "", F.lit(0.0)).otherwise(F.least(score, F.lit(100.0)))


def extract_pan(c: Column) -> Column:
    """extractPAN (ref utils/ocr_parser.go:585-591)."""
    return F.regexp_extract(c, r"\b([A-Z]{5}[0-9]{4}[A-Z])\b", 1)


# The prioritized P4 label regexes — the single source of truth shared
# with the driver oracle generator (__spark_entry__ imports this list,
# so a pattern edit cannot silently desynchronize Spark and DuckDB).
SALARY_AMOUNT_PATTERNS = [
    r"(?i)net\s*(?:pay|salary|amount|payment)[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)",
    r"(?i)total\s*(?:pay|salary|amount)[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)",
    r"(?i)salary[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)",
    r"(?i)gross\s*(?:pay|salary)[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)",
]


def extract_salary_amount(c: Column) -> Column:
    """extractSalaryAmount (ref utils/ocr_parser.go:88-105): prioritized
    label regexes, comma-strip, cast."""
    cands = [
        F.nullif(F.regexp_replace(F.regexp_extract(c, p, 1), ",", ""), F.lit(""))
        .cast("double")
        for p in SALARY_AMOUNT_PATTERNS
    ]
    return F.coalesce(*cands, F.lit(0.0))


def token_count(c: Column) -> Column:
    """Whitespace token count (text-analysis op for the documents table)."""
    return F.size(F.split(F.trim(c), r"\s+"))


# Tracking query parameters stripped by url_normalize (public lists:
# the utm_* family plus the common click-id params).
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=.*)?$"


def url_host(c: Column) -> Column:
    """Lowercased registered host of a URL — no userinfo, no port — as
    a pure codegen expression (the per-domain grouping key at 10^12
    urls must come out of the scan stage, like url_normalize). The
    DuckDB driver-oracle replays the same three steps: authority
    capture, after-last-'@' split, ':port' strip + lowercase."""
    auth = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)", 1)
    host = F.regexp_extract(auth, r"([^@]*)$", 1)
    return F.lower(F.regexp_replace(host, r":\d+$", ""))


def url_path(c: Column) -> Column:
    """Path-and-query of a URL — the string RFC 9309 robots rules are
    matched against — as a pure codegen expression. Everything after
    the authority with the fragment stripped; an empty path (bare
    ``https://host``) is ``/`` per RFC 9309 §2.2.2. The DuckDB
    driver-oracle replays the same three steps: after-authority
    capture, '#...' strip, empty → '/'."""
    rest = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)", 1)
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def url_normalize(c: Column) -> Column:
    """Canonical URL key for web-scale dedup/grouping (RFC 3986
    syntax-based normalization + the de-facto web rules), as a pure
    codegen expression — at 10^12 urls the canonical key must come out
    of the scan stage, never a Python UDF. Steps, in order (the DuckDB
    driver-oracle replays them verbatim):

      1. strip the fragment (``#...``)
      2. lowercase scheme + host — userinfo (``user:pass@``) stays
         case-sensitive per RFC 3986 §6.2.2.1; path/query stay
         case-sensitive too
      3. drop the default port (``:80`` for http, ``:443`` for https)
      4. drop tracking query params (TRACKING_PARAM_RE) and empty
         pairs, sort the survivors bytewise, rejoin with ``&``
      5. drop one trailing ``/`` from a non-root path when no query
         survives; a bare authority gains the root ``/``
    """
    nofrag = F.regexp_replace(c, r"#.*$", "")
    base = F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]+)", 1)
    rest = F.substring(nofrag, F.length(base) + 1, F.lit(1 << 30))
    # Split the authority on the LAST '@' (greedy capture): scheme and
    # host fold to lowercase, userinfo does not.
    scheme = F.lower(
        F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://)", 1))
    auth = F.regexp_extract(base, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(.*)$", 1)
    userinfo = F.regexp_extract(auth, r"^(.*@)", 1)
    host = F.lower(F.substring(auth, F.length(userinfo) + 1,
                               F.lit(1 << 30)))
    host = F.when(scheme == "http://",
                  F.regexp_replace(host, r"^([^:]+):80$", "$1"))\
        .otherwise(host)
    host = F.when(scheme == "https://",
                  F.regexp_replace(host, r"^([^:]+):443$", "$1"))\
        .otherwise(host)
    base = F.concat(scheme, userinfo, host)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE))
    newq = F.array_join(F.array_sort(params), "&")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when((newq == "") & (F.length(path) > 1)
                  & path.endswith("/"),
                  F.substring(path, 1, F.length(path) - 1))\
        .otherwise(path)
    return F.concat(base, path,
                    F.when(newq == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), newq)))
