"""Cross-check joins vs the Go unit-test fixtures and the pure oracle.

The reference's TestCrossCheckMismatch asserts NameMatch false for
("John Doe" slip, "Jane Doe" holder), but CompareNames' token-overlap
rule (ocr_parser.go:426) yields 1/2 = 0.5 >= 0.5 -> TRUE; code
semantics win (see tests/test_textlib.py docstring).
"""

import re

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import crosscheck
from ocr_spark.operators.cascade import extract_record
from ocr_spark.plans import pipeline
from ocr_spark.sources import synth
from ocr_spark.textlib.crosscheck import cross_check as cross_check_py
from ocr_spark import schemas


def _mk_extracted(spark, slips, stmts):
    """Build a minimal extraction-output frame from struct dicts."""
    rows = []
    for i, s in enumerate(slips):
        rows.append({"url": f"https://x/app0/salary_slip/{i:04d}.png",
                     "doc_type": "salary_slip", "salary": s,
                     "bank": None, "error": None})
    for i, s in enumerate(stmts):
        rows.append({"url": f"https://x/app0/bank_statement/{i:04d}.png",
                     "doc_type": "bank_statement", "salary": None,
                     "bank": s, "error": None})
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([
        StructField("url", StringType(), False),
        StructField("doc_type", StringType(), False),
        StructField("salary", schemas.SALARY_TYPE, True),
        StructField("bank", schemas.BANK_TYPE, True),
        StructField("error", StringType(), True),
    ])
    return spark.createDataFrame(rows, schema=schema)


SLIP = {"employee_name": "John Doe", "employer_name": "",
        "pay_month": "October 2025", "net_salary": 50000.0,
        "account_number": "1234567890"}


def test_crosscheck_match(spark):
    """Port of TestCrossCheck (income_service_test.go:10-41)."""
    stmt = {"account_holder_name": "John Doe", "account_number": "1234567890",
            "transactions": [{"date": None, "description": "SALARY CREDIT",
                              "amount": 50000.0, "is_credit": True}]}
    out = crosscheck.cross_check(_mk_extracted(spark, [SLIP], [stmt])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["name_match"] is True
    assert r["account_match"] is True
    assert r["missing_salary_credits"] == []
    assert r["notes"] == []
    assert r["name_similarity"] == 1.0


def test_crosscheck_mismatch(spark):
    """Port of TestCrossCheckMismatch (income_service_test.go:43-74),
    corrected to code semantics for the name flag."""
    stmt = {"account_holder_name": "Jane Doe", "account_number": "0987654321",
            "transactions": [{"date": None, "description": "SALARY CREDIT",
                              "amount": 40000.0, "is_credit": True}]}
    r = crosscheck.cross_check(_mk_extracted(spark, [SLIP], [stmt])).collect()[0]
    # Token overlap "doe" -> 0.5 -> match per code.
    assert r["name_match"] is True
    assert r["account_match"] is False
    assert r["missing_salary_credits"] == ["Missing credit for October 2025: 50000.00"]
    # Oracle agreement.
    py = cross_check_py([SLIP], [stmt])
    assert py["name_match"] is True
    assert py["account_match"] is False
    assert py["missing_salary_credits"] == list(r["missing_salary_credits"])


def test_crosscheck_no_statements(spark):
    r = crosscheck.cross_check(_mk_extracted(spark, [SLIP], [])).collect()[0]
    assert r["name_match"] is False
    assert r["account_match"] is False
    assert r["missing_salary_credits"] == []
    assert r["notes"] == ["No bank statements provided for cross-check"]


def test_crosscheck_full_pipeline_vs_oracle(spark):
    """End-to-end: synth docs -> extraction -> cross-check, compared per
    applicant against the pure-Python oracle."""
    rows = synth.generate_rows(30 * len(synth.DOC_TYPES))
    df = spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)
    extracted = pipeline.run_extraction(spark, df, run_id="cc", num_partitions=8)
    got = {r["applicant_id"]: r.asDict(recursive=True)
           for r in crosscheck.cross_check(extracted).collect()}

    # Oracle: group extraction records per applicant in plain Python.
    slips_by_app, stmts_by_app = {}, {}
    for row in rows:
        import json
        m = re.search(r"/app(\d+)/([a-z_]+)/", row["url"])
        meta = json.loads(row["meta"]) if row.get("meta") else {}
        app = f"app{m.group(1)}"
        doc_type = meta.get("doc_type") or m.group(2)
        password = meta.get("password") or ""
        if doc_type not in ("salary_slip", "bank_statement"):
            continue
        rec = extract_record(row["url"], row["html"], row["text"], doc_type,
                             password)
        assert rec["error"] is None, row["url"]
        if doc_type == "salary_slip":
            slips_by_app.setdefault(app, []).append((row["url"], rec["salary"]))
        else:
            stmts_by_app.setdefault(app, []).append((row["url"], rec["bank"]))

    apps = sorted(set(slips_by_app) | set(stmts_by_app))
    assert len(apps) >= 29
    mismatch_seen = {"acct": 0, "missing": 0}
    for app in apps:
        slips = [s for _, s in sorted(slips_by_app.get(app, []))]
        stmts = [s for _, s in sorted(stmts_by_app.get(app, []))]
        expect = cross_check_py(slips, stmts)
        g = got[app]
        assert g["name_match"] == expect["name_match"], app
        assert g["account_match"] == expect["account_match"], app
        assert list(g["missing_salary_credits"]) == expect["missing_salary_credits"], app
        assert list(g["notes"]) == expect["notes"], app
        if not g["account_match"]:
            mismatch_seen["acct"] += 1
        if g["missing_salary_credits"]:
            mismatch_seen["missing"] += 1
    # The synth mismatch families must actually exercise both branches.
    assert mismatch_seen["acct"] > 0
    assert mismatch_seen["missing"] > 0


def test_employee_verification(spark):
    rows = synth.generate_rows(12 * len(synth.DOC_TYPES))
    df = spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)
    extracted = pipeline.run_extraction(spark, df, run_id="ev", num_partitions=4)
    out = {r["applicant_id"]: r for r in
           crosscheck.employee_verification(extracted).collect()}
    # Applicants whose ID card or letter hit the paddle-down variant error
    # out (reference: paddle-only endpoints fail the request) and drop
    # from the inner join — compute the surviving set from the oracle.
    survivors = set()
    for row in rows:
        m = re.search(r"/app(\d+)/([a-z_]+)/", row["url"])
        app, doc_type = f"app{m.group(1)}", m.group(2)
        if doc_type == "employee_id":
            rec = extract_record(row["url"], row["html"], row["text"], doc_type)
            if rec["error"] is None:
                survivors.add(app)
    for row in rows:
        m = re.search(r"/app(\d+)/([a-z_]+)/", row["url"])
        app, doc_type = f"app{m.group(1)}", m.group(2)
        if doc_type == "appointment_letter":
            rec = extract_record(row["url"], row["html"], row["text"], doc_type)
            if rec["error"] is not None:
                survivors.discard(app)
    assert set(out) == survivors
    assert len(out) >= 6
    for app, r in out.items():
        # Synth letters always greet the same person as the ID card.
        assert r["name_match"] is True, app
        # ID card carries the TechNova literal; letters never do.
        assert r["company_match"] is False, app


def test_compare_names_expr_vs_oracle(spark):
    """Expression form vs pure function over a case battery."""
    from ocr_spark.functions import expressions as X
    from ocr_spark.textlib import names as tn
    cases = [("John Doe", "John Doe"), ("John Doe", "MR JOHN DOE"),
             ("John Doe", "Doe John"), ("John Doe", "Jane Doe"),
             ("John Doe", "Bob Smith"), ("", "John"), ("A B C", "A B"),
             ("Aashish Rawat", "AASHISH RAWAT"), ("X", "XYLOPHONE Y")]
    df = spark.createDataFrame(cases, ["a", "b"]).select(
        "a", "b",
        X.compare_names(F.col("a"), F.col("b")).alias("cmp"),
        X.name_similarity(F.col("a"), F.col("b")).alias("sim"))
    for r in df.collect():
        assert r["cmp"] == tn.compare_names(r["a"], r["b"]), (r["a"], r["b"])
        assert abs(r["sim"] - tn.calculate_name_similarity(r["a"], r["b"])) < 1e-12
