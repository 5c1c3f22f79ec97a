"""Driving-license parsing (ref service/driving_license_service.go:62-250).

The date ordering/swap/repair state machine is the single most intricate
scan-order parser in the reference; ported statement-for-statement.
"""

from __future__ import annotations

import datetime as _dt
import re

from .goutil import parse_go_date

_ANY_DATE = re.compile(r"\d{2}[/\-\.]\d{2}[/\-\.]\d{4}")
_DL_NUMBER = re.compile(r"\b[A-Z]{2}\s?\d{2}\s?\d{6,12}\b")
_NAME_LABELED = re.compile(r"/?NAME[:\s]*([A-Z\s]{2,})")
_ADDR_LABELED = re.compile(r"ADDRESS[:\s]+([A-Z0-9,\s\-\/]+)")
# Go char class `[A-Z0-9\s,.-\/]`: '.' to '/' parses as a range (0x2E-0x2F),
# so the literal dash is NOT in the set — mirror that exactly.
_ADDR_SOW = re.compile(r"SON\/DAUGHTER\/WIFE\s+OF[\s:]*([A-Z0-9\s,./]+)")

_MARKER_ISSUE = re.compile(r"DATE\s+OF\s+ISSUE|DATE\s+OF\s+ISSUED|DATE\s+ISSUE")
_MARKER_VALID = re.compile(r"VALID\s+TO|VALID\s+UPTO|VALID\s+TILL|VALID")
_MARKER_DOB = re.compile(r"DATE\s+OF\s+BIRTH|DATE\s+BIRTH|DOB")


def _parse_date(s: str) -> _dt.date | None:
    """parseDate (ref service/driving_license_service.go:62-79):
    dd/mm/yyyy, retried with '-' and '.' replaced by '/'."""
    s = s.strip()
    if s == "":
        return None
    d = parse_go_date(s, "02/01/2006")
    if d is not None:
        return d
    s2 = s.replace("-", "/").replace(".", "/")
    return parse_go_date(s2, "02/01/2006")


def parse_dl(raw: str) -> dict:
    """parseDL (ref service/driving_license_service.go:81-250)."""
    text = raw.upper()

    dl_m = _DL_NUMBER.search(text)
    dl_number = dl_m.group(0) if dl_m else ""

    all_dates = _ANY_DATE.findall(text)

    def find_date_after(marker: re.Pattern) -> str:
        m = marker.search(text)
        if m:
            # Ref findAllString[0] == first match: search() short-
            # circuits instead of scanning the whole remainder.
            d = _ANY_DATE.search(text, m.end())
            if d:
                return d.group(0)
        return ""

    # Issue date: marker first, else first date.
    issue_str = find_date_after(_MARKER_ISSUE)
    if issue_str == "" and all_dates:
        issue_str = all_dates[0]

    # Valid till: marker, else the date following the issue date.
    valid_str = find_date_after(_MARKER_VALID)
    if valid_str == "":
        if issue_str != "" and all_dates:
            pos = -1
            for i, d in enumerate(all_dates):
                if d == issue_str:
                    pos = i
                    break
            if pos >= 0 and pos + 1 < len(all_dates):
                valid_str = all_dates[pos + 1]
            elif len(all_dates) > 1:
                if all_dates[0] == issue_str:
                    valid_str = all_dates[1]
                else:
                    valid_str = all_dates[1]
        elif len(all_dates) > 1:
            valid_str = all_dates[1]

    # DOB: marker, else scan lines near "BIRTH"/"DOB", else last unused date.
    dob_str = find_date_after(_MARKER_DOB)
    if dob_str == "":
        lines = text.split("\n")
        for i, ln in enumerate(lines):
            if "BIRTH" in ln or "DOB" in ln:
                for j in range(i, min(i + 4, len(lines))):
                    dm = _ANY_DATE.search(lines[j])
                    if dm:
                        dob_str = dm.group(0)
                        break
                if dob_str != "":
                    break
    if dob_str == "" and all_dates:
        candidate = all_dates[-1]
        if candidate != issue_str and candidate != valid_str:
            dob_str = candidate

    # Ordering: swap when valid < issue; repair the unparsed side from the
    # date pool.
    issue_time = _parse_date(issue_str)
    valid_time = _parse_date(valid_str)

    if issue_time is not None and valid_time is not None:
        if valid_time < issue_time:
            issue_str, valid_str = valid_str, issue_str
            issue_time, valid_time = valid_time, issue_time
    elif issue_time is None and valid_time is not None:
        for d in all_dates:
            dt = _parse_date(d)
            if dt is not None and dt < valid_time:
                issue_str = d
                break
    elif issue_time is not None and valid_time is None:
        for d in reversed(all_dates):
            dt = _parse_date(d)
            if dt is not None and dt > issue_time:
                valid_str = d
                break

    # Name: labeled capture (greedy [A-Z\s]{2,} may span newlines, like the
    # reference), else next-line fallback.
    name = ""
    nm = _NAME_LABELED.search(text)
    if nm:
        name = nm.group(1).strip()
    else:
        lines = text.split("\n")
        for i, ln in enumerate(lines):
            if "NAME" in ln and i + 1 < len(lines):
                candidate = lines[i + 1].strip()
                if (not _ANY_DATE.search(candidate) and len(candidate) > 1
                        and "BLOOD" not in candidate):
                    name = candidate
                    break

    address = ""
    am = _ADDR_LABELED.search(text)
    if am:
        address = am.group(1).strip()
    else:
        sm = _ADDR_SOW.search(text)
        if sm:
            address = sm.group(1).strip()

    return {
        "name": name,
        "dl_number": dl_number,
        "dob": dob_str,
        "issue_date": issue_str,
        "valid_till": valid_str,
        "address": address,
        "raw_text": raw,
    }
