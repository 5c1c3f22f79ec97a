"""Text-quality scoring (ref service/income_service.go:428-467).

Pure column-expression-mappable: the Spark form lives in
functions/expressions.py; this is its oracle.
"""

from __future__ import annotations

_KEYWORDS = ("income", "tax", "pan", "assessment", "return",
             "total", "taxable", "refund", "filing")


def evaluate_text_quality(text: str) -> float:
    """evaluateTextQuality: 0-100 from length buckets + keyword hits."""
    if text == "":
        return 0.0
    score = 0.0
    # Go len() counts bytes of the trimmed text.
    text_len = len(text.strip().encode("utf-8"))
    if text_len > 500:
        score += 40.0
    elif text_len > 100:
        score += 20.0
    elif text_len > 20:
        score += 10.0
    text_lower = text.lower()
    keyword_count = sum(1 for k in _KEYWORDS if k in text_lower)
    score += keyword_count * 6.67
    return min(score, 100.0)
