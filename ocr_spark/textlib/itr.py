"""ITR (Income Tax Return) parsing (ref utils/ocr_parser.go:510-923).

Line-lookahead parsers with exact scan-until-accept ordering.
"""

from __future__ import annotations

import re

from .goutil import parse_float, parse_go_date

_PAN = re.compile(r"\b([A-Z]{5}[0-9]{4}[A-Z])\b")
_AY_LINE = re.compile(r"^\d{4}-\d{2,4}$")
_ALPHA_START = re.compile(r"^[A-Za-z]")
_ROW_INDEX = re.compile(r"^[0-9]{1,2}$")
_NUMERIC = re.compile(r"-?[0-9]+\.?[0-9]*")
_DATE = re.compile(r"(\d{2})[-/](\d{2})[-/](\d{4})")

_AY_PATTERNS = [
    re.compile(r"(?i)assessment\s*year[:\s]*(\d{4}[-]\d{2,4})"),
    re.compile(r"(?i)A\.?Y\.?[:\s]*(\d{4}[-]\d{2,4})"),
    re.compile(r"\b(\d{4}[-]\d{2})\b"),
]

_TOTAL_INCOME_PATTERNS = [
    re.compile(r"(?i)total\s*income[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)gross\s*total\s*income[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)income\s*under\s*all\s*heads[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
]

_TAXABLE_INCOME_PATTERNS = [
    re.compile(r"(?i)taxable\s*income[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)total\s*taxable\s*income[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)net\s*taxable\s*income[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
]

_TAX_PAID_PATTERNS = [
    re.compile(r"(?i)tax\s*paid[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)total\s*tax\s*paid[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)taxes\s*paid[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)tax\s*liability[:\s]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
]

_NAME_SECTION_WORDS = {"address", "status", "individual",
                       "form number", "form", "itr"}


def split_and_trim_lines(text: str) -> list[str]:
    """splitAndTrimLines (ref utils/ocr_parser.go:568-578)."""
    return [l.strip() for l in text.split("\n") if l.strip() != ""]


def clean_label(s: str) -> str:
    """cleanLabel (ref utils/ocr_parser.go:580-582)."""
    return s.replace(":", "").strip()


def extract_pan(text: str) -> str:
    """extractPAN (ref utils/ocr_parser.go:585-591)."""
    m = _PAN.search(text)
    return m.group(1) if m else ""


def extract_assessment_year_from_lines(lines: list[str]) -> str:
    """extractAssessmentYearFromLines (ref utils/ocr_parser.go:593-605)."""
    for i, line in enumerate(lines):
        if "assessment year" in line.lower():
            for j in range(1, 4):
                if i + j >= len(lines):
                    break
                cand = clean_label(lines[i + j])
                if _AY_LINE.match(cand):
                    return cand
    return ""


def extract_assessment_year(text: str) -> str:
    """extractAssessmentYear regex fallback (ref utils/ocr_parser.go:654-668)."""
    for pat in _AY_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(1)
    return ""


def extract_name_smart(lines: list[str]) -> str:
    """extractNameSmart (ref utils/ocr_parser.go:806-836): next 3 lines
    after an exact 'Name' label, rejecting section headers; returns ''
    immediately after the first matching label if nothing qualifies."""
    for i, line in enumerate(lines):
        if clean_label(line).lower() == "name":
            for j in range(1, 4):
                if i + j >= len(lines):
                    break
                cand = clean_label(lines[i + j])
                l = cand.lower()
                if l in _NAME_SECTION_WORDS or len(cand) <= 2:
                    continue
                if _ALPHA_START.match(cand):
                    return cand
            return ""
    return ""


def _extract_amount(text: str, patterns: list[re.Pattern]) -> float:
    """extractAmount (ref utils/ocr_parser.go:700-711)."""
    for pat in patterns:
        m = pat.search(text)
        if m:
            v = parse_float(m.group(1).replace(",", ""))
            if v is not None:
                return v
    return 0.0


def extract_total_income(text: str) -> float:
    return _extract_amount(text, _TOTAL_INCOME_PATTERNS)


def extract_taxable_income(text: str) -> float:
    return _extract_amount(text, _TAXABLE_INCOME_PATTERNS)


def extract_tax_paid(text: str) -> float:
    return _extract_amount(text, _TAX_PAID_PATTERNS)


def extract_numeric_value(s: str) -> float:
    """extractNumericValue (ref utils/ocr_parser.go:871-884): -999999 sentinel."""
    m = _NUMERIC.search(s)
    if not m:
        return -999999.0
    v = parse_float(m.group(0))
    return v if v is not None else -999999.0


def extract_number_under_label_smart(lines: list[str], label: str) -> float:
    """extractNumberUnderLabelSmart (ref utils/ocr_parser.go:888-923)."""
    def clean(s: str) -> str:
        s = s.replace(":", "").strip()
        s = s.replace("—", "-")
        return s.replace(" ", "")

    lower_label = label.lower()
    for i, line in enumerate(lines):
        if line.strip().lower() == lower_label:
            for j in range(1, 6):
                if i + j >= len(lines):
                    break
                look = clean(lines[i + j])
                if look == "":
                    continue
                if _ROW_INDEX.match(look):
                    continue
                v = extract_numeric_value(look)
                if v != -999999.0:
                    return v
    return 0.0


def extract_refund_smart(lines: list[str]) -> float:
    """extractRefundSmart (ref utils/ocr_parser.go:838-867)."""
    for i, line in enumerate(lines):
        l = line.lower()
        if "refundable" in l or "tax payable" in l:
            for j in range(1, 5):
                if i + j >= len(lines):
                    break
                cand = clean_label(lines[i + j]).replace(",", "")
                if len(cand) <= 2:
                    continue
                f = parse_float(cand)
                if f is not None:
                    if f < 0:
                        return -f
                    if f > 1000:
                        return f
    return 0.0


def _format_itr_date(m: re.Match) -> str:
    raw = m.group(0)
    for sep in ("-", "/"):
        d = parse_go_date(f"{m.group(1)}{sep}{m.group(2)}{sep}{m.group(3)}",
                          f"02{sep}01{sep}2006")
        if d is not None:
            return d.isoformat()
    return raw


def extract_itr_filing_date(lines: list[str]) -> str:
    """extractITRFilingDate (ref utils/ocr_parser.go:767-805): keyword lines
    first (note 'on' is a substring test), then any date anywhere."""
    for line in lines:
        l = line.lower()
        if ("electronically" in l or "submitted" in l
                or "on" in l or "acknowledgement" in l):
            m = _DATE.search(line)
            if m:
                return _format_itr_date(m)
    for line in lines:
        m = _DATE.search(line)
        if m:
            return _format_itr_date(m)
    return ""


# ---------------------------------------------------------------------------
# Legacy parsers (P26/P28/P29): dead code in the reference — ParseITR
# calls the *Smart variants instead — ported verbatim for inventory
# completeness (SURVEY.md §2.4). Not reachable from parse_itr, matching
# the reference call graph.
# ---------------------------------------------------------------------------

_ITR_NAME_PATTERNS = [
    re.compile(r"(?i)name\s*of\s*(?:the\s*)?(?:assessee|taxpayer)[:\s]*([A-Z][a-zA-Z\s\.]{2,50})"),
    re.compile(r"(?i)assessee\s*name[:\s]*([A-Z][a-zA-Z\s\.]{2,50})"),
    re.compile(r"(?i)taxpayer\s*name[:\s]*([A-Z][a-zA-Z\s\.]{2,50})"),
    re.compile(r"(?i)name[:\s]*([A-Z][a-zA-Z\s\.]{2,50})"),
]
_TRAILING_NON_ALPHA = re.compile(r"[^a-zA-Z\s]+$")


def extract_itr_name_from_lines(lines: list[str]) -> str:
    """P29a extractITRNameFromLines (ref utils/ocr_parser.go:607-629;
    legacy — superseded by extractNameSmart). Note its reject set differs
    from the smart variant: huf/company instead of form/itr, and
    substring (not equality) checks for those two."""
    for i, line in enumerate(lines):
        if clean_label(line).lower() == "name":
            for j in range(1, 4):
                if i + j >= len(lines):
                    break
                cand = clean_label(lines[i + j])
                if cand == "":
                    continue
                lower = cand.lower()
                if (lower == "address" or lower == "status"
                        or "individual" in lower or "huf" in lower
                        or "company" in lower):
                    continue
                if _ALPHA_START.match(cand):
                    return cand
    return ""


def extract_itr_name(text: str) -> str:
    """P29b extractITRName (ref utils/ocr_parser.go:632-652; legacy).
    Prioritized label regexes; trailing non-alpha stripped; 2<len<50."""
    for pat in _ITR_NAME_PATTERNS:
        m = pat.search(text)
        if m:
            name = m.group(1).strip()
            name = _TRAILING_NON_ALPHA.sub("", name).strip()
            if 2 < len(name) < 50:
                return name
    return ""


def extract_number_under_label(lines: list[str], label: str) -> float:
    """P28 extractNumberUnderLabel (ref utils/ocr_parser.go:680-696;
    legacy — superseded by extractNumberUnderLabelSmart). Exact
    (case-sensitive) label match, next 4 lines, skip len<=1 row codes."""
    for i, line in enumerate(lines):
        if clean_label(line) == label:
            for j in range(1, 5):
                if i + j >= len(lines):
                    break
                cand = clean_label(lines[i + j])
                if len(cand) <= 1:
                    continue
                v = parse_float(cand.replace(",", ""))
                if v is not None:
                    return v
    return 0.0


def extract_refund_from_lines(lines: list[str], tax_paid: float = 0.0) -> float:
    """P26 extractRefundFromLines (ref utils/ocr_parser.go:741-765;
    legacy — superseded by extractRefundSmart). Unlike the smart variant
    it scans only 3 lines, has no len>2 or >1000 guards (a bare row code
    like '8' parses and returns — the quirk that motivated the rewrite),
    and ignores tax_paid."""
    for i, line in enumerate(lines):
        lower = line.lower()
        if "refundable" in lower or "refund" in lower:
            for j in range(1, 4):
                if i + j >= len(lines):
                    break
                cand = clean_label(lines[i + j]).replace(",", "")
                f = parse_float(cand)
                if f is not None:
                    return -f if f < 0 else f
    return 0.0


def parse_itr(ocr_text: str) -> dict:
    """ParseITR (ref utils/ocr_parser.go:510-564)."""
    lines = split_and_trim_lines(ocr_text)

    ay = extract_assessment_year_from_lines(lines)
    if ay == "":
        ay = extract_assessment_year(ocr_text)

    total_income = extract_number_under_label_smart(lines, "Total Income")
    if total_income <= 0:
        total_income = extract_total_income(ocr_text)

    tax_paid = extract_number_under_label_smart(lines, "Taxes Paid")
    if tax_paid <= 0:
        tax_paid = extract_tax_paid(ocr_text)

    return {
        "pan": extract_pan(ocr_text),
        "name": extract_name_smart(lines),
        "assessment_year": ay,
        "total_income": total_income,
        "taxable_income": 0.0,
        "tax_paid": tax_paid,
        "refund_amount": extract_refund_smart(lines),
        "filing_date": extract_itr_filing_date(lines),
        "raw_text": ocr_text,
    }
