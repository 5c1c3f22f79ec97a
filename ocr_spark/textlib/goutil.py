"""Go-compatible primitive helpers.

The reference parsers are Go; their behavior leans on stdlib quirks
(fixed-width time layouts, ParseFloat error-as-zero, strings.Fields).
These helpers reproduce those semantics exactly so the parser ports in
this package stay byte-identical.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

# Go's time.Time zero value (time.Time{}): January 1, year 1.
GO_ZERO_DATE = _dt.date(1, 1, 1)


def fields(s: str) -> list[str]:
    """strings.Fields: split around runs of whitespace, no empties."""
    return s.split()


def parse_float(s: str) -> float | None:
    """strconv.ParseFloat(s, 64): None on failure (caller decides 0.0)."""
    try:
        return float(s)
    except (ValueError, TypeError):
        return None


# Fixed-width layouts used by the reference, as full-match regexes.
# Go time.Parse with layout "02/01/2006" requires exactly DD/MM/YYYY and
# consumes the whole string (ref utils/ocr_parser.go:365-376,
# service/driving_license_service.go:62-79).
# layout -> (full-match regex, has_two_digit_year)
_LAYOUTS = {
    "02/01/2006": (_re.compile(r"^(\d{2})/(\d{2})/(\d{4})$"), False),
    "02/01/06": (_re.compile(r"^(\d{2})/(\d{2})/(\d{2})$"), True),
    "02-01-2006": (_re.compile(r"^(\d{2})-(\d{2})-(\d{4})$"), False),
    "02-01-06": (_re.compile(r"^(\d{2})-(\d{2})-(\d{2})$"), True),
}


def _expand_2digit_year(yy: int) -> int:
    # Go time.Parse: years 69-99 -> 19xx, 00-68 -> 20xx.
    return 1900 + yy if yy >= 69 else 2000 + yy


def parse_go_date(s: str, layout: str) -> _dt.date | None:
    """time.Parse(layout, s) for the day-first layouts above."""
    pattern, two_digit_year = _LAYOUTS[layout]
    m = pattern.match(s)
    if not m:
        return None
    day, month, year = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if two_digit_year:
        year = _expand_2digit_year(year)
    try:
        return _dt.date(year, month, day)
    except ValueError:
        return None


def parse_date_smart(s: str) -> _dt.date:
    """parseDateSmart (ref utils/ocr_parser.go:365-376).

    Tries 02/01/2006, 02/01/06, 02-01-2006, 02-01-06 in order; the Go
    caller ignores the error and keeps the zero time, so failures here
    return GO_ZERO_DATE.
    """
    for layout in ("02/01/2006", "02/01/06", "02-01-2006", "02-01-06"):
        d = parse_go_date(s, layout)
        if d is not None:
            return d
    return GO_ZERO_DATE


def title_word(w: str) -> str:
    """strings.Title(strings.ToLower(w)) for a single whitespace-free word."""
    w = w.lower()
    return w[:1].upper() + w[1:]


def byte_len(s: str) -> int:
    """Go len(string) counts UTF-8 bytes, not code points."""
    return len(s.encode("utf-8"))
