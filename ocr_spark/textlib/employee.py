"""Employee ID card + appointment letter parsing and validation
(ref utils/employeeid/parser.go:9-43, utils/appointmentletter/parser.go:9-74,
service/employee_service.go:26-89).

Deliberate reference quirks preserved: joining-date month hardcoded to
"05" (appointmentletter/parser.go:57), OCR-misread normalizations for
designation and the Dengalore→Bangalore location fix.
"""

from __future__ import annotations

import re

_FIRST_LAST = re.compile(r"^[A-Z][a-z]+ [A-Z][a-z]+$")
_EMP_ID = re.compile(r"(?i)(EMP[- ]?\d{3,})")
_DEAR = re.compile(r"(?i)Dear\s+([A-Z][A-Za-z]+ [A-Za-z]+)")
_DESIGNATION = re.compile(r"(?i)(Software Engineer|5arlware Engineer|Soflvare Engineer)")
_JOINING = re.compile(r"(?i)(May|April|June|July)\s+(\d{1,2}).\s*(\d{4})")
_LOCATION = re.compile(r"(?i)Location[: ]+([A-Za-z]+)")

_COMPANY_LITERAL = "TechNova Solutions Pvt Ltd"
_DESIGNATION_LITERAL = "Software Engineer"


# ---- employee ID card (ref utils/employeeid/parser.go) ----

def parse_name_id(text: str) -> str:
    for line in text.split("\n"):
        line = line.strip()
        if _FIRST_LAST.match(line):
            return line
    return ""


def parse_employee_id(text: str) -> str:
    m = _EMP_ID.search(text)
    return m.group(1) if m else ""


def parse_company_id(text: str) -> str:
    return _COMPANY_LITERAL if _COMPANY_LITERAL in text else ""


def parse_designation_id(text: str) -> str:
    return _DESIGNATION_LITERAL if _DESIGNATION_LITERAL in text else ""


def parse_employee_id_card(text: str) -> dict:
    return {
        "name": parse_name_id(text),
        "employee_id": parse_employee_id(text),
        "company": parse_company_id(text),
        "designation": parse_designation_id(text),
    }


# ---- appointment letter (ref utils/appointmentletter/parser.go) ----

def parse_name_letter(text: str) -> str:
    lines = text.split("\n")
    for i, line in enumerate(lines):
        if line.strip() == "To.":
            if i + 2 < len(lines):
                name = lines[i + 2].strip()
                if _FIRST_LAST.match(name):
                    return name
    m = _DEAR.search(text)
    return m.group(1) if m else ""


def parse_company_letter(text: str) -> str:
    return _COMPANY_LITERAL if _COMPANY_LITERAL in text else ""


def parse_designation_letter(text: str) -> str:
    return _DESIGNATION_LITERAL if _DESIGNATION.search(text) else ""


def parse_joining_date(text: str) -> str:
    m = _JOINING.search(text)
    if m:
        # Month hardcoded "05" in the reference (parser.go:57).
        return m.group(2) + "/05/" + m.group(3)
    return ""


def parse_location_letter(text: str) -> str:
    m = _LOCATION.search(text)
    if m:
        loc = m.group(1)
        if loc.lower().startswith("deng"):
            return "Bangalore"
        return loc
    return ""


def parse_appointment_letter(text: str) -> dict:
    return {
        "name": parse_name_letter(text),
        "company": parse_company_letter(text),
        "designation": parse_designation_letter(text),
        "joining_date": parse_joining_date(text),
        "location": parse_location_letter(text),
    }


def validate_employee(emp: dict, app: dict) -> dict:
    """strings.EqualFold validation (ref service/employee_service.go:74-77)."""
    return {
        "name_match": emp["name"].lower() == app["name"].lower(),
        "company_match": emp["company"].lower() == app["company"].lower(),
    }
