"""Table schemas: north-rule input, extraction output, lineage, metrics."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DateType, DoubleType, IntegerType,
    LongType, StringType, StructField, StructType, TimestampType,
)

# BASELINE.json input_hint: Common-Crawl-style pages, plus an optional
# per-row metadata JSON sidecar column mirroring the reference's upload
# metadata channel (ref dto/models.go:12-16 DocumentMeta{DocType,
# Password}, parsed at service/income_service.go:43-46). `meta` is
# nullable and may be absent entirely — run_extraction tolerates both.
INPUT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("meta", StringType(), True),
])

# Parsed shape of the `meta` JSON column (S2).
META_TYPE = StructType([
    StructField("doc_type", StringType(), True),
    StructField("password", StringType(), True),
])

QUALITY_TYPE = StructType([
    StructField("resolution_score", DoubleType(), True),
    StructField("ocr_confidence", DoubleType(), True),
    StructField("contrast_score", DoubleType(), True),
    StructField("final_score", DoubleType(), True),
    StructField("issues", ArrayType(StringType()), True),
])

SALARY_TYPE = StructType([
    StructField("employee_name", StringType(), True),
    StructField("employer_name", StringType(), True),
    StructField("pay_month", StringType(), True),
    StructField("net_salary", DoubleType(), True),
    StructField("account_number", StringType(), True),
])

TRANSACTION_TYPE = StructType([
    StructField("date", DateType(), True),
    StructField("description", StringType(), True),
    StructField("amount", DoubleType(), True),
    StructField("is_credit", BooleanType(), True),
])

BANK_TYPE = StructType([
    StructField("account_holder_name", StringType(), True),
    StructField("account_number", StringType(), True),
    StructField("transactions", ArrayType(TRANSACTION_TYPE), True),
])

ITR_TYPE = StructType([
    StructField("pan", StringType(), True),
    StructField("name", StringType(), True),
    StructField("assessment_year", StringType(), True),
    StructField("total_income", DoubleType(), True),
    StructField("taxable_income", DoubleType(), True),
    StructField("tax_paid", DoubleType(), True),
    StructField("refund_amount", DoubleType(), True),
    StructField("filing_date", StringType(), True),
    StructField("raw_text", StringType(), True),
])

AADHAAR_TYPE = StructType([
    StructField("name", StringType(), True),
    StructField("dob", StringType(), True),
    StructField("gender", StringType(), True),
    StructField("address", StringType(), True),
    StructField("aadhaar_last4", StringType(), True),
    StructField("source", StringType(), True),
])

PAN_TYPE = StructType([
    StructField("pan", StringType(), True),
    StructField("name", StringType(), True),
    StructField("father_name", StringType(), True),
    StructField("dob", StringType(), True),
    StructField("raw_text", StringType(), True),
])

DL_TYPE = StructType([
    StructField("name", StringType(), True),
    StructField("dl_number", StringType(), True),
    StructField("dob", StringType(), True),
    StructField("issue_date", StringType(), True),
    StructField("valid_till", StringType(), True),
    StructField("address", StringType(), True),
    StructField("raw_text", StringType(), True),
])

EMPLOYEE_TYPE = StructType([
    StructField("name", StringType(), True),
    StructField("employee_id", StringType(), True),
    StructField("company", StringType(), True),
    StructField("designation", StringType(), True),
])

APPOINTMENT_TYPE = StructType([
    StructField("name", StringType(), True),
    StructField("company", StringType(), True),
    StructField("designation", StringType(), True),
    StructField("joining_date", StringType(), True),
    StructField("location", StringType(), True),
])

# Confidence-scored text span (north_star: "confidence-scored text-span
# assembly per url"): the half-open interval
# [char_start, char_start + char_len) of main_text is this block's text.
SPAN_TYPE = StructType([
    StructField("block_idx", IntegerType(), True),
    StructField("char_start", LongType(), True),
    StructField("char_len", LongType(), True),
    StructField("link_density", DoubleType(), True),
    StructField("confidence", DoubleType(), True),
])

# HTML main-content extraction result (textlib/htmltext.py); the main
# text itself rides the shared `extracted_text` column.
WEBPAGE_TYPE = StructType([
    StructField("title", StringType(), True),
    StructField("n_blocks", IntegerType(), True),
    StructField("n_content_blocks", IntegerType(), True),
    StructField("spans", ArrayType(SPAN_TYPE), True),
])

# Extraction output + per-row lineage (north_rule: source split, byte
# offsets, extractor version).
EXTRACT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("lang", StringType(), True),
    StructField("doc_type", StringType(), True),
    StructField("extracted_text", StringType(), True),
    StructField("quality", QUALITY_TYPE, True),
    StructField("salary", SALARY_TYPE, True),
    StructField("bank", BANK_TYPE, True),
    StructField("itr", ITR_TYPE, True),
    StructField("aadhaar", AADHAAR_TYPE, True),
    StructField("pan", PAN_TYPE, True),
    StructField("dl", DL_TYPE, True),
    StructField("employee", EMPLOYEE_TYPE, True),
    StructField("appointment", APPOINTMENT_TYPE, True),
    StructField("webpage", WEBPAGE_TYPE, True),
    StructField("error", StringType(), True),
    # lineage
    StructField("run_id", StringType(), True),
    StructField("partition_id", IntegerType(), True),
    StructField("row_in_partition", LongType(), True),
    StructField("input_bytes", LongType(), True),
    StructField("extractor_version", StringType(), True),
])

# Per-partition metrics counters (north_rule).
METRICS_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("docs_total", LongType(), False),
    StructField("docs_failed", LongType(), False),
    StructField("bytes_total", LongType(), False),
    StructField("by_doc_type", StringType(), True),  # JSON counters
    StructField("extractor_version", StringType(), True),
])

CROSSCHECK_SCHEMA = StructType([
    StructField("applicant_id", StringType(), False),
    StructField("name_match", BooleanType(), False),
    StructField("name_similarity", DoubleType(), False),
    StructField("account_match", BooleanType(), False),
    StructField("missing_salary_credits", ArrayType(StringType()), False),
    StructField("notes", ArrayType(StringType()), False),
])
