"""Bank-statement parsing (ref utils/ocr_parser.go:254-384).

Transactions come out as dicts shaped like the Spark ArrayType(Struct)
column: (date, description, amount, is_credit). Failed date parses keep
Go's zero time (0001-01-01), not null.
"""

from __future__ import annotations

import re

from .goutil import fields, parse_date_smart, parse_float
from .salary import extract_account_holder_name, extract_account_number

_TAB_DATE = re.compile(r"^\s*(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})")
_LOOSE_DATE = re.compile(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}")
_LOOSE_AMOUNT = re.compile(r"[0-9,]+\.\d{2}")


def normalize_lines(text: str) -> list[str]:
    """normalizeLines (ref utils/aadhaar_parser.go:34-48): strip \\r, split,
    trim, drop blanks. Shared by the bank and aadhaar paths."""
    text = text.replace("\r", "")
    return [t for t in (l.strip() for l in text.split("\n")) if t != ""]


def must_parse_amount(s: str) -> float:
    """mustParseAmount (ref utils/ocr_parser.go:378-384): 0.0 on failure."""
    s = s.replace(",", "").upper()
    s = s.removesuffix("CR")
    s = s.removesuffix("DR")
    v = parse_float(s.strip())
    return v if v is not None else 0.0


def parse_tabular_transactions(lines: list[str]) -> list[dict]:
    """parseTabularTransactions (ref utils/ocr_parser.go:276-315)."""
    tx: list[dict] = []
    for line in lines:
        if not _TAB_DATE.match(line):
            continue
        parts = fields(line)
        if len(parts) < 3:
            continue
        date_str = parts[0]
        amount_str = parts[-1]
        amount = must_parse_amount(amount_str)
        if amount == 0:
            continue
        desc = " ".join(parts[1:-1])
        date = parse_date_smart(date_str)
        up = (desc + " " + amount_str).upper()
        is_credit = any(k in up for k in ("CR", "CREDIT", "NEFT", "UPI", "SALARY"))
        tx.append({"date": date, "description": desc,
                   "amount": amount, "is_credit": is_credit})
    return tx


def parse_loose_transactions(lines: list[str]) -> list[dict]:
    """parseLooseTransactions (ref utils/ocr_parser.go:321-359)."""
    tx: list[dict] = []
    for line in lines:
        dm = _LOOSE_DATE.search(line)
        if not dm:
            continue
        amounts = _LOOSE_AMOUNT.findall(line)
        if not amounts:
            continue
        amount = must_parse_amount(amounts[-1])
        if amount == 0:
            continue
        # strings.Replace(line, last_amount, "", 1): first occurrence of
        # that substring, which may be an earlier identical amount.
        desc = line.replace(amounts[-1], "", 1).strip()
        date = parse_date_smart(dm.group(0))
        up = desc.upper()
        is_credit = any(k in up for k in ("CR", "CREDIT", "SAL", "NEFT"))
        tx.append({"date": date, "description": desc,
                   "amount": amount, "is_credit": is_credit})
    return tx


def parse_bank_transactions(lines: list[str]) -> list[dict]:
    """parseBankTransactions (ref utils/ocr_parser.go:265-271): tabular
    first; loose only when tabular yields nothing."""
    tx = parse_tabular_transactions(lines)
    if tx:
        return tx
    return parse_loose_transactions(lines)


def parse_bank_statement(text: str) -> dict:
    """ParseBankStatement (ref utils/ocr_parser.go:254-262)."""
    clean = normalize_lines(text)
    return {
        "account_number": extract_account_number(text),
        "account_holder_name": extract_account_holder_name(text),
        "transactions": parse_bank_transactions(clean),
    }
