"""PAN card parsing (ref utils/pan_parser.go:17-114)."""

from __future__ import annotations

import re

_PAN = re.compile(r"[A-Z]{5}[0-9]{4}[A-Z]")
_DOB = re.compile(r"(0[1-9]|[12][0-9]|3[01])[/-](0[1-9]|1[0-2])[/-][0-9]{4}")
_DIGIT = re.compile(r"[0-9]")

# Header reject tokens inlined in clean_lines (hot path).


def clean_lines(t: str) -> list[str]:
    """cleanLines (ref utils/pan_parser.go:41-59): drop short lines and
    department headers. Go len() is bytes: byte-length < 3 implies
    char-length < 3, so the utf-8 encode only runs for the rare short
    lines (hot path measured: this function dominated PAN parsing)."""
    out = []
    for l in t.split("\n"):
        l = l.strip()
        if len(l) < 3 and len(l.encode("utf-8")) < 3:
            continue
        if ("INCOME" in l or "GOVT" in l or "TAX" in l
                or "DEPARTMENT" in l):
            continue
        out.append(l)
    return out


def is_name_like(s: str) -> bool:
    """isNameLike (ref utils/pan_parser.go:61-68): no digits."""
    return not _DIGIT.search(s)


def extract_names(lines: list[str]) -> tuple[str, str]:
    """extractNames (ref utils/pan_parser.go:70-114): label-lookahead with
    last-match-wins overwrite, then fallbacks (KUMAR heuristic for father)."""
    name, father = "", ""
    for i, l in enumerate(lines):
        if ("NAME" in l or "/NAME" in l) and "FATHER" not in l and i + 1 < len(lines):
            candidate = lines[i + 1].strip()
            if is_name_like(candidate):
                name = candidate
        if "FATHER" in l and i + 1 < len(lines):
            candidate = lines[i + 1].strip()
            if is_name_like(candidate):
                father = candidate

    if name == "":
        for l in lines:
            if is_name_like(l) and "FATHER" not in l and len(l.split()) >= 1:
                name = l
                break

    if father == "":
        for l in lines:
            if is_name_like(l) and "KUMAR" in l:
                father = l
                break

    return name, father


def parse_pan_text(raw: str) -> dict:
    """ParsePANText (ref utils/pan_parser.go:17-39): whole text uppercased,
    including raw_text."""
    t = raw.upper()
    pan_m = _PAN.search(t)
    dob_m = _DOB.search(t)
    lines = clean_lines(t)
    name, father = extract_names(lines)
    return {
        "pan": pan_m.group(0) if pan_m else "",
        "name": name,
        "father_name": father,
        "dob": dob_m.group(0) if dob_m else "",
        "raw_text": t,
    }
