"""Byte-identical goldens for the pure-Python parser core.

Golden values are derived from the REFERENCE CODE semantics (traced
statement-by-statement), not from the reference's own test assertions —
three of those are stale and fail against their own code:
  * utils/ocr_parser_test.go:21 expects EmployeeName "John Doe", but
    extractEmployeeName (ocr_parser.go:153-157) prefers the line above
    the label -> "ABC Corp".
  * utils/ocr_parser_test.go:41 expects 1 transaction, but the debit
    line passes every filter in parseTabularTransactions -> 2.
  * utils/ocr_parser_test.go:50 expects CompareNames("John Doe",
    "Jane Doe") == false, but token overlap is 1/2 = 0.5 >= 0.5 -> true.
"""

import datetime

from ocr_spark.textlib import aadhaar, bank, dl, employee, goutil, itr, names, pan, quality, salary

# Exact fixture from utils/ocr_parser_test.go:11-17 (tab-indented raw string).
SALARY_TEXT = (
    "\n\t\t\tABC Corp Ltd.\n\t\t\tEmployee Name: John Doe\n"
    "\t\t\tPay Slip for October 2025\n\t\t\tAccount No: 1234567890\n"
    "\t\t\tNet Salary: Rs. 50,000.00\n\t\t"
)

# Exact fixture from utils/ocr_parser_test.go:28-35.
BANK_TEXT = (
    "\n\t\t\tHDFC Bank\n\t\t\tAccount Holder: John Doe\n"
    "\t\t\tAccount Number: 1234567890\n"
    "\t\t\tDate        Description             Amount\n"
    "\t\t\t15/10/2025  SALARY CREDIT           50,000.00\n"
    "\t\t\t20/10/2025  UPI PAYMENT             -500.00\n\t\t"
)

ITR_TEXT = """INDIAN INCOME TAX RETURN ACKNOWLEDGEMENT
Assessment Year
2020-21
Name
AASHISH RAWAT
PAN
ABCDE1234F
Total Income
1
160850
Taxes Paid
7
9500
(+)Tax Payable /(-)Refundable
8
-9500
electronically transmitted on 21-08-2020"""

AADHAAR_TEXT = """Government of India
Aashish Rawat
DOB: 23/09/2004
Male
6260 7951 8316
Address: S/O Ram Rawat, 12 MG Road,
Dehradun, Uttarakhand 248001
Aadhaar is proof of identity, not of citizenship"""

PAN_TEXT = """INCOME TAX DEPARTMENT GOVT. OF INDIA
NAME
AASHISH RAWAT
FATHER'S NAME
RAJESH KUMAR
DOB
23/09/2004
ABCDE1234F"""

DL_TEXT = """DRIVING LICENCE
DL NO: UP80 20160012345
NAME: RAVI VERMA
DATE OF BIRTH 01/01/1990
DATE OF ISSUE 15/06/2016
VALID TILL 14/06/2036
ADDRESS: 45 CIVIL LINES AGRA UP"""

EMP_ID_TEXT = "TechNova Solutions Pvt Ltd\nEMP-12345\nRohan Sharma\nSoftware Engineer"

APP_LETTER_TEXT = (
    "To.\n\nRohan Sharma\nDear Rohan Sharma,\n"
    "We are pleased to offer you the position of 5arlware Engineer\n"
    "joining trom May 15. 2025\nLocation: Dengalore"
)


class TestSalarySlip:
    def test_reference_fixture(self):
        data = salary.parse_salary_slip(SALARY_TEXT)
        # Prev-line heuristic: "ABC Corp Ltd." -> cleanName caps 2 words.
        assert data["employee_name"] == "ABC Corp"
        assert data["employer_name"] == "ABC Corp Ltd."
        assert data["pay_month"] == "October 2025"
        assert data["account_number"] == "1234567890"
        assert data["net_salary"] == 50000.0

    def test_month_abbrev_and_fallback(self):
        # Full month names are scanned before abbreviations, in list order.
        assert salary.extract_month("Pay for Mar 2021") == "Mar 2021"
        # "March" contains "mar": full name wins when present.
        assert salary.extract_month("Pay for March 2021") == "March 2021"
        # Year capture only when adjacent ([\s\-,]* between month and year).
        assert salary.extract_month("in March sometime 1999") == "March"
        assert salary.extract_month("in March - 1999") == "March 1999"
        # MM/YYYY fallback.
        assert salary.extract_month("period 10/2025 stmt") == "10/2025"
        assert salary.extract_month("nothing here") == "Unknown"
        # "May" appears inside no other word here; "December" before "Dec".
        assert salary.extract_month("salary December 2024") == "December 2024"

    def test_salary_amount_priority(self):
        assert salary.extract_salary_amount("Gross Pay: 70,000\nNet Pay: 55,000") == 55000.0
        assert salary.extract_salary_amount("Total Amount INR 42,500.50") == 42500.5
        assert salary.extract_salary_amount("salary ₹ 30000") == 30000.0
        assert salary.extract_salary_amount("gross salary Rs 12,345") == 12345.0
        assert salary.extract_salary_amount("no numbers") == 0.0

    def test_account_number_branches(self):
        assert salary.extract_account_number("A/C No: 123456789012") == "123456789012"
        # Masked form -> digits of the masked match.
        assert salary.extract_account_number("acct xxxx1234 on file") == "1234"
        # Fallback: >=10-digit run not labeled as customer id.
        assert salary.extract_account_number("ref 9876543210 end") == "9876543210"
        # cust id exclusion.
        assert salary.extract_account_number("cust id 9876543210") == ""
        # 9-digit run exists but fallback requires >=10.
        assert salary.extract_account_number("num 123456789") == ""

    def test_employee_name_label_path(self):
        # No usable previous line: falls through to after-label capture.
        assert salary.extract_employee_name("Name: John Doe") == "John Doe"
        # Three-word capture -> cleanName caps at 2 -> clean.
        assert salary.extract_employee_name("Name: John Doe Smith") == "John Doe"

    def test_account_holder(self):
        assert salary.extract_account_holder_name("Account Holder: John Doe") == "John Doe"
        assert salary.extract_account_holder_name("stmt for MR JOHN DOE acct") == "JOHN DOE"


class TestBankStatement:
    def test_reference_fixture(self):
        data = bank.parse_bank_statement(BANK_TEXT)
        assert data["account_holder_name"] == "John Doe"
        assert data["account_number"] == "1234567890"
        # Code semantics: BOTH lines parse (ref test's len==1 is stale).
        assert len(data["transactions"]) == 2
        t0, t1 = data["transactions"]
        assert t0 == {"date": datetime.date(2025, 10, 15),
                      "description": "SALARY CREDIT",
                      "amount": 50000.0, "is_credit": True}
        # "UPI" marks the debit line as credit per the reference keyword list.
        assert t1 == {"date": datetime.date(2025, 10, 20),
                      "description": "UPI PAYMENT",
                      "amount": -500.0, "is_credit": True}

    def test_loose_fallback(self):
        lines = ["stmt period", "paid to shop on 03/04/2024 total 1,250.00 thanks"]
        tx = bank.parse_loose_transactions(lines)
        assert len(tx) == 1
        assert tx[0]["amount"] == 1250.0
        assert tx[0]["date"] == datetime.date(2024, 4, 3)
        assert tx[0]["description"] == "paid to shop on 03/04/2024 total  thanks"
        assert tx[0]["is_credit"] is False
        # Dispatcher: loose only when tabular finds nothing.
        assert bank.parse_bank_transactions(lines) == tx

    def test_amount_suffixes(self):
        assert bank.must_parse_amount("1,500.00CR") == 1500.0
        assert bank.must_parse_amount("2,000DR") == 2000.0
        assert bank.must_parse_amount("junk") == 0.0

    def test_two_digit_years(self):
        # Go 2-digit year rule: 69-99 -> 19xx, 00-68 -> 20xx.
        assert goutil.parse_date_smart("15/10/25") == datetime.date(2025, 10, 15)
        assert goutil.parse_date_smart("15/10/99") == datetime.date(1999, 10, 15)
        # Single-digit day fails Go's fixed-width layout -> zero time.
        assert goutil.parse_date_smart("5/10/2025") == goutil.GO_ZERO_DATE
        assert goutil.parse_date_smart("31/02/2020") == goutil.GO_ZERO_DATE


class TestNames:
    def test_compare_names_reference_cases(self):
        assert names.compare_names("John Doe", "John Doe") is True
        assert names.compare_names("John Doe", "MR JOHN DOE") is True
        assert names.compare_names("John Doe", "Doe John") is True
        # Code semantics: 1/2 token overlap == 0.5 >= 0.5 -> True
        # (ref test asserts False; stale vs ocr_parser.go:426).
        assert names.compare_names("John Doe", "Jane Doe") is True
        assert names.compare_names("John Doe", "Bob Smith") is False
        assert names.compare_names("", "John") is False

    def test_similarity(self):
        assert names.calculate_name_similarity("John Doe", "John Doe") == 1.0
        assert names.calculate_name_similarity("", "") == 1.0
        assert names.calculate_name_similarity("John", "") == 0.0
        # johndoe vs jondoe: distance 1, maxlen 7.
        assert abs(names.calculate_name_similarity("John Doe", "Jon Doe") - (1 - 1 / 7)) < 1e-12

    def test_levenshtein(self):
        assert names.levenshtein_distance("kitten", "sitting") == 3
        assert names.levenshtein_distance("", "abc") == 3


class TestITR:
    def test_reference_fixture(self):
        res = itr.parse_itr(ITR_TEXT)
        assert res["pan"] == "ABCDE1234F"
        assert res["assessment_year"] == "2020-21"
        assert res["name"] == "AASHISH RAWAT"
        assert res["total_income"] == 160850.0
        assert res["tax_paid"] == 9500.0
        assert res["refund_amount"] == 9500.0
        assert res["filing_date"] == "2020-08-21"
        assert res["raw_text"] == ITR_TEXT

    def test_label_regex_fallbacks(self):
        assert itr.extract_total_income("Total Income: Rs. 9,99,999") == 999999.0
        assert itr.extract_tax_paid("tax liability 4,000") == 4000.0
        assert itr.extract_assessment_year("A.Y. 2021-22") == "2021-22"

    def test_name_section_header_rejection(self):
        lines = ["Name", "Address", "Individual", "RAVI K"]
        assert itr.extract_name_smart(lines) == "RAVI K"
        # All headers within lookahead -> empty (early return).
        assert itr.extract_name_smart(["Name", "Address", "Status", "Form"]) == ""

    def test_filing_date_invalid_stays_raw(self):
        # 99-99-2020 parses under neither layout -> raw match returned.
        assert itr.extract_itr_filing_date(["submitted on 99-99-2020"]) == "99-99-2020"

    def test_legacy_name_from_lines(self):
        # P29a (dead in ref): huf/company are substring rejects here,
        # unlike the smart variant's form/itr equality set.
        lines = ["Name", "HUF entity", "Some Company Ltd", "RAVI K"]
        assert itr.extract_itr_name_from_lines(lines) == "RAVI K"
        # No early-return-after-first-label quirk: when the first label's
        # lookahead is exhausted the scan continues to later labels.
        assert itr.extract_itr_name_from_lines(
            ["Name", "Address", "Status", "Individual",
             "Name", "JOHN DOE"]) == "JOHN DOE"

    def test_legacy_name_regex(self):
        # P29b (dead in ref): trailing non-alpha stripped, 2<len<50.
        assert itr.extract_itr_name("Name of Assessee: Ravi Kumar 123") == "Ravi Kumar"
        assert itr.extract_itr_name("assessee name: Jo") == ""  # len 2 rejected

    def test_legacy_number_under_label(self):
        # P28 (dead in ref): case-SENSITIVE exact label, 4-line lookahead,
        # len<=1 row codes skipped.
        lines = ["Total Income", "1", "1,60,850"]
        assert itr.extract_number_under_label(lines, "Total Income") == 160850.0
        assert itr.extract_number_under_label(lines, "total income") == 0.0

    def test_legacy_refund_from_lines(self):
        # P26 (dead in ref): no len>2 guard -> a bare row code parses
        # and returns (the quirk that motivated extractRefundSmart).
        lines = ["(+)Tax Payable /(-)Refundable", "8", "-9500"]
        assert itr.extract_refund_from_lines(lines) == 8.0
        assert itr.extract_refund_from_lines(
            ["refund due", "pending", "-1,200.50"]) == 1200.5


class TestAadhaar:
    def test_reference_fixture(self):
        res = aadhaar.parse_aadhaar_from_text(AADHAAR_TEXT)
        assert res["name"] == "Aashish Rawat"
        assert res["dob"] == "23/09/2004"
        assert res["gender"] == "Male"
        assert res["aadhaar_last4"] == "8316"
        # cleanAddressLine leaves the trailing ", " from the first line;
        # join inserts ", " -> the double separator is reference behavior.
        assert res["address"] == "S/O Ram Rawat, 12 MG Road, , Dehradun, Uttarakhand 248001"
        assert res["source"] == "ocr"

    def test_female_checked_before_male(self):
        lines = ["DOB: 01/01/1990", "FEMALE"]
        assert aadhaar.extract_gender_near_dob(lines, 0) == "Female"

    def test_hindi_gender(self):
        lines = ["DOB: 01/01/1990", "पुरुष"]
        assert aadhaar.extract_gender_near_dob(lines, 0) == "Male"

    def test_last4_fallback(self):
        assert aadhaar.extract_aadhaar_last4("id 1234 then 5678") == "5678"

    def test_qr_xml(self):
        xml = ('<PrintLetterBarcodeData uid="123456789012" name="Aashish Rawat"'
               ' gender="M" yob="2004" co="Ram Rawat" house="12" vtc="Dehradun"'
               ' po="Rajpur" state="Uttarakhand" pc="248001"/>')
        res = aadhaar.parse_aadhaar_qr_xml(xml)
        assert res["name"] == "Aashish Rawat"
        assert res["dob"] == "2004"  # yob fallback
        assert res["aadhaar_last4"] == "9012"
        assert res["address"] == "C/O Ram Rawat, 12, Dehradun, PO Rajpur, Uttarakhand, 248001"
        assert res["source"] == "qr"
        assert aadhaar.parse_aadhaar_qr_xml("not xml") is None


class TestPAN:
    def test_reference_fixture(self):
        res = pan.parse_pan_text(PAN_TEXT)
        assert res["pan"] == "ABCDE1234F"
        assert res["dob"] == "23/09/2004"
        assert res["name"] == "AASHISH RAWAT"
        assert res["father_name"] == "RAJESH KUMAR"
        assert res["raw_text"] == PAN_TEXT.upper()

    def test_kumar_fallback(self):
        res = pan.parse_pan_text("NAME\nAASHISH RAWAT\nsomething\nRAJESH KUMAR JI")
        assert res["father_name"] == "RAJESH KUMAR JI"

    def test_dob_range_checks(self):
        assert pan.parse_pan_text("DOB 32/01/2000")["dob"] == ""
        assert pan.parse_pan_text("DOB 31/12/2000")["dob"] == "31/12/2000"


class TestDL:
    def test_reference_fixture(self):
        res = dl.parse_dl(DL_TEXT)
        assert res["dl_number"] == "UP80 20160012345"
        assert res["dob"] == "01/01/1990"
        assert res["issue_date"] == "15/06/2016"
        assert res["valid_till"] == "14/06/2036"
        # The greedy [A-Z\s]{2,} capture spans the newline — reference behavior.
        assert res["name"] == "RAVI VERMA\nDATE OF BIRTH"
        assert res["address"] == "45 CIVIL LINES AGRA UP"
        assert res["raw_text"] == DL_TEXT

    def test_swap_when_valid_before_issue(self):
        text = "DATE OF ISSUE 15/06/2036\nVALID TILL 14/06/2016\nDOB 01/01/1990"
        res = dl.parse_dl(text)
        assert res["issue_date"] == "14/06/2016"
        assert res["valid_till"] == "15/06/2036"

    def test_positional_fallbacks(self):
        # No markers: first date = issue, second = valid, last unused = dob.
        text = "LICENCE 10/10/2010 20/10/2020 30/10/1990"
        res = dl.parse_dl(text)
        assert res["issue_date"] == "10/10/2010"
        assert res["valid_till"] == "20/10/2020"
        assert res["dob"] == "30/10/1990"

    def test_dotted_dates(self):
        text = "DATE OF ISSUE 15.06.2016\nVALID TILL 14.06.2036"
        res = dl.parse_dl(text)
        assert res["issue_date"] == "15.06.2016"
        assert res["valid_till"] == "14.06.2036"


class TestEmployee:
    def test_id_card(self):
        res = employee.parse_employee_id_card(EMP_ID_TEXT)
        assert res == {"name": "Rohan Sharma", "employee_id": "EMP-12345",
                       "company": "TechNova Solutions Pvt Ltd",
                       "designation": "Software Engineer"}

    def test_appointment_letter(self):
        res = employee.parse_appointment_letter(APP_LETTER_TEXT)
        assert res == {"name": "Rohan Sharma", "company": "",
                       "designation": "Software Engineer",
                       "joining_date": "15/05/2025", "location": "Bangalore"}

    def test_validation(self):
        emp = employee.parse_employee_id_card(EMP_ID_TEXT)
        app = employee.parse_appointment_letter(APP_LETTER_TEXT)
        v = employee.validate_employee(emp, app)
        assert v["name_match"] is True
        # Company "" vs literal mismatches: EqualFold("TechNova...", "") false.
        assert v["company_match"] is False


class TestQuality:
    def test_buckets_and_keywords(self):
        assert quality.evaluate_text_quality("") == 0.0
        assert quality.evaluate_text_quality("x" * 21) == 10.0
        assert quality.evaluate_text_quality("x" * 101) == 20.0
        assert quality.evaluate_text_quality("x" * 501) == 40.0
        # 501 chars + all 9 keywords -> min(40 + 60.03, 100) = 100.
        t = "x" * 501 + " income tax pan assessment return total taxable refund filing"
        assert quality.evaluate_text_quality(t) == 100.0
        # 3 keywords, short text: 10 + 3*6.67.
        assert quality.evaluate_text_quality("income tax refund xxxx") == 10.0 + 3 * 6.67
