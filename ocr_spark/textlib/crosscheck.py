"""Pure-Python CrossCheck oracle (ref service/income_service.go:262-311)."""

from __future__ import annotations

from .names import compare_names


def cross_check(slips: list[dict], stmts: list[dict]) -> dict:
    result = {"name_match": False, "name_similarity": 0.0,
              "account_match": False, "missing_salary_credits": [], "notes": []}
    if not stmts:
        result["notes"].append("No bank statements provided for cross-check")
        return result
    stmt = stmts[0]

    for slip in slips:
        if compare_names(slip["employee_name"], stmt["account_holder_name"]):
            result["name_match"] = True
            result["name_similarity"] = 1.0  # simplified, per reference
            break

    for slip in slips:
        if slip["account_number"] != "" and stmt["account_number"] != "":
            if (slip["account_number"].replace(" ", "")
                    == stmt["account_number"].replace(" ", "")):
                result["account_match"] = True
                break

    for slip in slips:
        if slip["net_salary"] > 0:
            found = any(
                tx["is_credit"] and tx["amount"] == slip["net_salary"]
                for tx in stmt["transactions"])
            if not found:
                result["missing_salary_credits"].append(
                    "Missing credit for %s: %.2f"
                    % (slip["pay_month"], slip["net_salary"]))
    return result
