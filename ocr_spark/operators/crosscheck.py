"""Cross-document verification as DataFrame joins (the relational core).

CrossCheck (ref service/income_service.go:262-311) compares an
applicant's salary slips against their PRIMARY bank statement:
  * name match     — any slip employee_name vs statement holder
                     (CompareNames, expression form — V2)
  * account match  — space-stripped equality over slip x stmt (V1)
  * salary credits — for each slip with net_salary > 0, a credit
                     transaction with the exact amount must exist;
                     otherwise a formatted missing entry (left-anti
                     semantics via exists() on the transactions array)

The reference nested-loops over an in-memory request; here the same
semantics run as one shuffle on applicant_id across all applicants.
Slips join the single primary statement per applicant — the statement
side is tiny after the row_number filter, so Catalyst broadcast-joins
it when stats allow (AQE re-plans at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import expressions as X

# applicant id = path segment before the doc_type segment.
APPLICANT_PATTERN = r"//[^/]+/([^/]+)/[a-z_]+/[^/]*$"

_NO_STMT_NOTE = "No bank statements provided for cross-check"


def with_applicant_id(df: DataFrame) -> DataFrame:
    return df.withColumn("applicant_id",
                         F.regexp_extract("url", APPLICANT_PATTERN, 1))


def cross_check(extracted: DataFrame) -> DataFrame:
    """CrossCheck over the extraction output -> CROSSCHECK_SCHEMA rows."""
    ex = with_applicant_id(extracted)

    slips = (
        ex.filter((F.col("doc_type") == "salary_slip") & F.col("error").isNull())
        .select("applicant_id", F.col("url").alias("slip_url"),
                F.col("salary.employee_name").alias("employee_name"),
                F.col("salary.account_number").alias("slip_account"),
                F.col("salary.net_salary").alias("net_salary"),
                F.col("salary.pay_month").alias("pay_month"))
    )

    # Primary statement: stmts[0] in the reference is request order; the
    # deterministic batch equivalent is the first by url.
    w = Window.partitionBy("applicant_id").orderBy("url")
    stmts = (
        ex.filter((F.col("doc_type") == "bank_statement") & F.col("error").isNull())
        .select("applicant_id", "url",
                F.col("bank.account_holder_name").alias("holder_name"),
                F.col("bank.account_number").alias("stmt_account"),
                F.col("bank.transactions").alias("transactions"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("url", "stmt_url")
    )

    base = slips.join(stmts, "applicant_id", "full_outer")
    has_slip = F.col("slip_url").isNotNull()
    has_stmt = F.col("stmt_url").isNotNull()

    name_ok = has_slip & has_stmt & X.compare_names(
        F.col("employee_name"), F.col("holder_name"))
    acct_ok = (has_slip & has_stmt
               & (F.col("slip_account") != "") & (F.col("stmt_account") != "")
               & (F.replace(F.col("slip_account"), F.lit(" "), F.lit(""))
                  == F.replace(F.col("stmt_account"), F.lit(" "), F.lit(""))))
    credit_found = F.exists(
        "transactions",
        lambda t: t["is_credit"] & (t["amount"] == F.col("net_salary")))
    missing_msg = F.when(
        has_slip & has_stmt & (F.col("net_salary") > 0) & ~F.coalesce(credit_found, F.lit(False)),
        F.format_string("Missing credit for %s: %.2f",
                        F.col("pay_month"), F.col("net_salary")))

    flagged = base.select(
        "applicant_id", "slip_url",
        F.coalesce(name_ok, F.lit(False)).alias("name_ok"),
        F.coalesce(acct_ok, F.lit(False)).alias("acct_ok"),
        has_stmt.alias("has_stmt"),
        missing_msg.alias("missing_msg"),
    )

    agg = flagged.groupBy("applicant_id").agg(
        F.max("name_ok").alias("raw_name_match"),
        F.max("acct_ok").alias("raw_account_match"),
        F.max("has_stmt").alias("any_stmt"),
        F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("missing_msg").isNotNull(),
                       F.struct("slip_url", "missing_msg")))),
            lambda s: s["missing_msg"],
        ).alias("raw_missing"),
    )

    # Reference early-returns when no statements exist: all flags false,
    # missing empty, single note.
    return agg.select(
        "applicant_id",
        (F.col("any_stmt") & F.col("raw_name_match")).alias("name_match"),
        F.when(F.col("any_stmt") & F.col("raw_name_match"), F.lit(1.0))
        .otherwise(F.lit(0.0)).alias("name_similarity"),
        (F.col("any_stmt") & F.col("raw_account_match")).alias("account_match"),
        F.when(F.col("any_stmt"), F.col("raw_missing"))
        .otherwise(F.array().cast("array<string>")).alias("missing_salary_credits"),
        F.when(F.col("any_stmt"), F.array().cast("array<string>"))
        .otherwise(F.array(F.lit(_NO_STMT_NOTE))).alias("notes"),
    )


def employee_verification(extracted: DataFrame) -> DataFrame:
    """Employee doc validation (ref service/employee_service.go:26-89):
    ID card vs appointment letter joined per applicant; EqualFold on
    name and company (V5)."""
    ex = with_applicant_id(extracted)
    ids = (
        ex.filter((F.col("doc_type") == "employee_id") & F.col("error").isNull())
        .select("applicant_id",
                F.col("employee.name").alias("emp_name"),
                F.col("employee.employee_id").alias("employee_id"),
                F.col("employee.company").alias("emp_company"),
                F.col("employee.designation").alias("emp_designation"))
    )
    letters = (
        ex.filter((F.col("doc_type") == "appointment_letter") & F.col("error").isNull())
        .select("applicant_id",
                F.col("appointment.name").alias("app_name"),
                F.col("appointment.company").alias("app_company"),
                F.col("appointment.designation").alias("app_designation"),
                F.col("appointment.joining_date").alias("joining_date"),
                F.col("appointment.location").alias("location"))
    )
    joined = ids.join(letters, "applicant_id", "inner")
    return joined.select(
        "applicant_id", "emp_name", "employee_id", "app_name", "joining_date",
        "location",
        (F.lower("emp_name") == F.lower("app_name")).alias("name_match"),
        (F.lower("emp_company") == F.lower("app_company")).alias("company_match"),
    )
