"""Salary-slip field extraction (ref utils/ocr_parser.go:17-248).

Pure functions over the recovered OCR text; exact reference semantics,
including the prev-line preference in extractEmployeeName and the
2-word cap in cleanName.
"""

from __future__ import annotations

import re

from .goutil import fields, parse_float

_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]

_CORP_MARKERS = ("PVT", "PRIVATE", "LTD", "LIMITED", "LLP",
                 "TECHNOLOGY", "TECH", "SOLUTIONS")

_SALARY_PATTERNS = [
    re.compile(r"(?i)net\s*(?:pay|salary|amount|payment)[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)total\s*(?:pay|salary|amount)[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)salary[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
    re.compile(r"(?i)gross\s*(?:pay|salary)[\s:]*(?:Rs\.?|INR|₹)?\s*([0-9,]+\.?\d*)"),
]

_ACCT_EXPLICIT = [
    re.compile(r"account\s*no[\s\-]*([0-9]{9,18})"),
    re.compile(r"accountnumber[\s\-]*([0-9]{9,18})"),
    re.compile(r"a/c\s*no[\s\-]*([0-9]{9,18})"),
    re.compile(r"ac\s*no[\s\-]*([0-9]{9,18})"),
    re.compile(r"acc\s*no[\s\-]*([0-9]{9,18})"),
]
_ACCT_MASKED = re.compile(r"x{4,}[0-9]{3,6}")
_ACCT_DIGITS = re.compile(r"[0-9]+")
_ACCT_FALLBACK = re.compile(r"([0-9]{9,18})")

_NAME_AFTER_LABEL = re.compile(r"(?i)name\s*:\s*([A-Za-z ]+)")
_ALPHA_WORD = re.compile(r"^[A-Za-z]+$")

_HOLDER_PATTERNS = [
    re.compile(r"(?i)account\s*holder[\s:]*([A-Z][A-Za-z\s\.]+)"),
    re.compile(r"(?i)customer\s*name[\s:]*([A-Z][A-Za-z\s\.]+)"),
    re.compile(r"(?i)name[\s:]*([A-Z][A-Za-z\s\.]+)"),
]
_HOLDER_HONORIFIC = re.compile(r"(?m)(?i)\b(MR|MRS|MS|SHRI|SMT)\.?\s+[A-Z][A-Z\s]{2,50}")

_CLEAN_STOP = {"opening", "state", "branch", "bank", "acc", "account", "salary"}


def extract_employer_name(text: str) -> str:
    """extractEmployerName (ref utils/ocr_parser.go:32-61)."""
    lines = text.split("\n")
    for i in range(min(len(lines), 6)):
        l = lines[i].strip()
        if l == "":
            continue
        upper = l.upper()
        if any(m in upper for m in _CORP_MARKERS):
            return l.strip("-:•* ")
    return ""


def extract_month(text: str) -> str:
    """extractMonth (ref utils/ocr_parser.go:63-86): first month name in
    fixed list order wins; optional trailing year capture; MM/YYYY fallback."""
    text_lower = text.lower()
    for month in _MONTHS:
        if month.lower() in text_lower:
            m = re.search(r"(?i)" + month + r"[\s\-,]*(\d{4})", text)
            if m:
                return month + " " + m.group(1)
            return month
    m = re.search(r"(\d{1,2})[/-](\d{4})", text)
    if m:
        return m.group(1) + "/" + m.group(2)
    return "Unknown"


def extract_salary_amount(text: str) -> float:
    """extractSalaryAmount (ref utils/ocr_parser.go:88-105)."""
    for pat in _SALARY_PATTERNS:
        m = pat.search(text)
        if m:
            amount = parse_float(m.group(1).replace(",", ""))
            if amount is not None:
                return amount
    return 0.0


def extract_account_number(text: str) -> str:
    """extractAccountNumber (ref utils/ocr_parser.go:111-144)."""
    cleaned = text.replace("—", "-").replace(":", " ").lower()

    for pat in _ACCT_EXPLICIT:
        m = pat.search(cleaned)
        if m:
            return m.group(1)

    m = _ACCT_MASKED.search(cleaned)
    if m:
        d = _ACCT_DIGITS.search(m.group(0))
        return d.group(0) if d else ""

    for c in _ACCT_FALLBACK.findall(cleaned):
        if (len(c) >= 10
                and ("cust id " + c) not in cleaned
                and ("customer id " + c) not in cleaned
                and ("cif " + c) not in cleaned):
            return c
    return ""


def extract_name_after_label(line: str) -> str:
    """extractNameAfterLabel (ref utils/ocr_parser.go:168-175)."""
    m = _NAME_AFTER_LABEL.search(line)
    return m.group(1).strip() if m else ""


def clean_name(s: str) -> str:
    """cleanName (ref utils/ocr_parser.go:177-199)."""
    if s == "":
        return s
    out: list[str] = []
    for p in fields(s):
        if p.lower() in _CLEAN_STOP:
            break
        out.append(p)
        if len(out) == 2:
            break
    return " ".join(out)


def is_clean_name(s: str) -> bool:
    """isCleanName (ref utils/ocr_parser.go:201-212)."""
    parts = fields(s)
    if len(parts) != 2:
        return False
    return all(_ALPHA_WORD.match(p) for p in parts)


def extract_employee_name(text: str) -> str:
    """extractEmployeeName (ref utils/ocr_parser.go:148-166): prefers the
    line *above* a 'name:'-labeled line when it is a clean 2-word name."""
    lines = text.split("\n")
    for i, line in enumerate(lines):
        if "name" in line.lower() and ":" in line:
            if i > 0:
                candidate = clean_name(lines[i - 1].strip())
                if is_clean_name(candidate):
                    return candidate
            name = clean_name(extract_name_after_label(line))
            if is_clean_name(name):
                return name
    return ""


def _valid_name(n: str) -> bool:
    # validName (ref utils/ocr_parser.go:248): Go byte length, ASCII here.
    return 2 < len(n.encode("utf-8")) < 50


def extract_account_holder_name(text: str) -> str:
    """extractAccountHolderName (ref utils/ocr_parser.go:216-246)."""
    for pat in _HOLDER_PATTERNS:
        m = pat.search(text)
        if m:
            n = clean_name(m.group(1))
            if _valid_name(n):
                return n
    m = _HOLDER_HONORIFIC.search(text)
    if m:
        parts = fields(m.group(0))
        if len(parts) >= 2:
            n = clean_name(" ".join(parts[1:]))
            if _valid_name(n):
                return n
    return ""


def parse_salary_slip(ocr_text: str) -> dict:
    """ParseSalarySlip (ref utils/ocr_parser.go:17-25)."""
    return {
        "pay_month": extract_month(ocr_text),
        "net_salary": extract_salary_amount(ocr_text),
        "account_number": extract_account_number(ocr_text),
        "employee_name": extract_employee_name(ocr_text),
        "employer_name": extract_employer_name(ocr_text),
    }
