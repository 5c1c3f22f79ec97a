"""Name comparison operators (ref utils/ocr_parser.go:390-500).

CalculateNameSimilarity maps 1:1 to the Spark builtin
``1 - levenshtein(a,b)/greatest(length(a),length(b))`` — the pure form
here is the oracle for that expression (see functions/expressions.py).
"""

from __future__ import annotations


def normalize_string(s: str) -> str:
    """NormalizeString (ref utils/ocr_parser.go:390-395)."""
    return s.lower().replace(" ", "").replace(".", "")


def compare_names(a: str, b: str) -> bool:
    """CompareNames (ref utils/ocr_parser.go:397-427)."""
    if a == "" or b == "":
        return False
    a2 = normalize_string(a)
    b2 = normalize_string(b)
    if a2 == b2:
        return True
    if b2 in a2 or a2 in b2:
        return True

    wa = a.lower().split()
    wb = b.lower().split()
    if len(wa) > len(wb):
        wa, wb = wb, wa

    match = 0
    for x in wa:
        for y in wb:
            if x in y or y in x:
                match += 1
                break

    return match / len(wa) >= 0.5


def levenshtein_distance(a: str, b: str) -> int:
    """levenshteinDistance (ref utils/ocr_parser.go:448-500), rune-based."""
    ra, rb = list(a), list(b)
    n, m = len(ra), len(rb)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ra[i - 1] == rb[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def calculate_name_similarity(a: str, b: str) -> float:
    """CalculateNameSimilarity (ref utils/ocr_parser.go:429-446).

    Note: maxLen in Go is the *byte* length of the normalized strings;
    normalized names are ASCII in practice, so code-point length matches.
    """
    a2 = normalize_string(a)
    b2 = normalize_string(b)
    if a2 == "" and b2 == "":
        return 1.0
    if a2 == "" or b2 == "":
        return 0.0
    dist = levenshtein_distance(a2, b2)
    max_len = max(len(a2.encode("utf-8")), len(b2.encode("utf-8")))
    return 1 - dist / max_len
