"""Deterministic synthetic input-table generator (north-rule shape).

Seeded by row index only — no wall clock, no RNG state, no external
data — so any two runs (and any two cluster sizes) see identical bytes.
Covers every doc type and every cascade branch; embeds the reference's
own test fixtures as the first rows (urls fx-*) so pytest can replay
them through the batch path (BASELINE.json north_rule).
"""

from __future__ import annotations

import datetime as dt
import json

from . import payload as pl

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

DOC_TYPES = ("salary_slip", "bank_statement", "itr", "aadhaar", "pan",
             "driving_license", "employee_id", "appointment_letter")

_FIRST = ["John", "Jane", "Ravi", "Aashish", "Rohan", "Priya", "Amit",
          "Sunita", "Vikram", "Neha", "Arjun", "Kavita", "Rajesh", "Meera",
          "Sanjay", "Pooja", "Deepak", "Anita", "Manoj", "Shreya"]
_LAST = ["Doe", "Smith", "Verma", "Rawat", "Sharma", "Patel", "Kumar",
         "Singh", "Gupta", "Mehta", "Joshi", "Reddy", "Nair", "Iyer",
         "Chopra", "Malhotra", "Bose", "Das", "Kapoor", "Saxena"]
_COMPANIES = ["ABC Corp Ltd.", "TechNova Solutions Pvt Ltd", "Zenith Tech LLP",
              "Orbit Private Limited", "Quanta Technology", "Nimbus Solutions"]
_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]
_CITIES = ["Dehradun", "Agra", "Mumbai", "Pune", "Jaipur", "Kochi"]
_STATES = ["Uttarakhand", "Uttar Pradesh", "Maharashtra", "Rajasthan", "Kerala"]

# Exact reference test fixtures (see tests/test_textlib.py for the traces).
FIXTURE_SALARY = (
    "\n\t\t\tABC Corp Ltd.\n\t\t\tEmployee Name: John Doe\n"
    "\t\t\tPay Slip for October 2025\n\t\t\tAccount No: 1234567890\n"
    "\t\t\tNet Salary: Rs. 50,000.00\n\t\t"
)
FIXTURE_BANK = (
    "\n\t\t\tHDFC Bank\n\t\t\tAccount Holder: John Doe\n"
    "\t\t\tAccount Number: 1234567890\n"
    "\t\t\tDate        Description             Amount\n"
    "\t\t\t15/10/2025  SALARY CREDIT           50,000.00\n"
    "\t\t\t20/10/2025  UPI PAYMENT             -500.00\n\t\t"
)


def _name(i: int) -> str:
    return f"{_FIRST[i % 20]} {_LAST[(i // 20) % 20]}"


def _applicant(i: int) -> int:
    return i // len(DOC_TYPES)


def _account(app: int) -> str:
    return str(1234500000 + app)


def _amount(app: int) -> int:
    return 30000 + (app % 50) * 1000


def salary_text(i: int) -> str:
    app = _applicant(i)
    month = _MONTHS[app % 12]
    return (f"{_COMPANIES[app % len(_COMPANIES)]}\n"
            f"Employee Name: {_name(app)}\n"
            f"Pay Slip for {month} 2025\n"
            f"Account No: {_account(app)}\n"
            f"Net Salary: Rs. {_amount(app):,}.00")


def bank_text(i: int) -> str:
    app = _applicant(i)
    # Deterministic mismatch families for cross-check coverage:
    #   app % 7 == 3 -> different account; app % 11 == 5 -> missing credit;
    #   app % 13 == 7 -> different holder name.
    acct = _account(app + 1) if app % 7 == 3 else _account(app)
    holder = _name(app + 1) if app % 13 == 7 else _name(app)
    amount = _amount(app) + 1 if app % 11 == 5 else _amount(app)
    mm = app % 12 + 1
    return (f"HDFC Bank\n"
            f"Account Holder: {holder}\n"
            f"Account Number: {acct}\n"
            f"Date        Description             Amount\n"
            f"15/{mm:02d}/2025  SALARY CREDIT           {amount:,}.00\n"
            f"20/{mm:02d}/2025  UPI PAYMENT             -500.00")


def itr_text(i: int) -> str:
    app = _applicant(i)
    pan = f"{chr(65 + app % 26)}BCDE{1000 + app % 9000}F"
    return ("INDIAN INCOME TAX RETURN ACKNOWLEDGEMENT\n"
            "Assessment Year\n2020-21\nName\n"
            f"{_name(app).upper()}\nPAN\n{pan}\n"
            f"Total Income\n1\n{160000 + app * 13}\n"
            f"Taxes Paid\n7\n{9000 + app % 900}\n"
            "(+)Tax Payable /(-)Refundable\n8\n"
            f"-{9000 + app % 900}\n"
            "electronically transmitted on 21-08-2020")


def aadhaar_text(i: int) -> str:
    app = _applicant(i)
    gender_line = "महिला" if app % 13 == 4 else ("Female" if app % 2 else "Male")
    n1, n2, n3 = 6000 + app % 1000, 7000 + app % 1000, 8000 + app % 1000
    return ("Government of India\n"
            f"{_name(app)}\n"
            f"DOB: {app % 28 + 1:02d}/{app % 12 + 1:02d}/199{app % 10}\n"
            f"{gender_line}\n"
            f"{n1} {n2} {n3}\n"
            f"Address: S/O {_name(app + 3)}, {app % 99 + 1} MG Road,\n"
            f"{_CITIES[app % len(_CITIES)]}, {_STATES[app % len(_STATES)]} 2480{app % 90 + 10:02d}\n"
            "Aadhaar is proof of identity, not of citizenship")


def aadhaar_qr_xml(i: int) -> str:
    app = _applicant(i)
    uid = f"{600000000000 + app}"
    return (f'<PrintLetterBarcodeData uid="{uid}" name="{_name(app)}"'
            f' gender="{"F" if app % 2 else "M"}" yob="199{app % 10}"'
            f' co="{_name(app + 3)}" house="{app % 99 + 1}"'
            f' street="MG Road" vtc="{_CITIES[app % len(_CITIES)]}"'
            f' po="Rajpur" dist="{_CITIES[(app + 1) % len(_CITIES)]}"'
            f' state="{_STATES[app % len(_STATES)]}" pc="2480{app % 90 + 10:02d}"/>')


def pan_text(i: int) -> str:
    app = _applicant(i)
    pan = f"{chr(65 + app % 26)}BCDE{1000 + app % 9000}F"
    return ("INCOME TAX DEPARTMENT GOVT. OF INDIA\nNAME\n"
            f"{_name(app).upper()}\nFATHER'S NAME\n"
            f"{_name(app + 5).upper()}\nDOB\n"
            f"{app % 28 + 1:02d}/{app % 12 + 1:02d}/19{70 + app % 30}\n{pan}")


def dl_text(i: int) -> str:
    app = _applicant(i)
    return ("DRIVING LICENCE\n"
            f"DL NO: UP{app % 90 + 10} 20{app % 25:02d}00{10000 + app}\n"
            f"NAME: {_name(app).upper()}\n"
            f"DATE OF BIRTH {app % 28 + 1:02d}/{app % 12 + 1:02d}/19{70 + app % 25}\n"
            f"DATE OF ISSUE 15/{app % 12 + 1:02d}/20{app % 20:02d}\n"
            f"VALID TILL 14/{app % 12 + 1:02d}/20{app % 20 + 20:02d}\n"
            f"ADDRESS: {app % 99 + 1} CIVIL LINES {_CITIES[app % len(_CITIES)].upper()} UP")


def employee_id_text(i: int) -> str:
    app = _applicant(i)
    return ("TechNova Solutions Pvt Ltd\n"
            f"EMP-{10000 + app}\n"
            f"{_name(app)}\n"
            "Software Engineer")


def appointment_text(i: int) -> str:
    app = _applicant(i)
    # OCR-misread variants exercised deterministically.
    desig = ["Software Engineer", "5arlware Engineer", "Soflvare Engineer"][app % 3]
    loc = "Dengalore" if app % 2 else "Mumbai"
    return ("To.\n\n"
            f"{_name(app)}\n"
            f"Dear {_name(app)},\n"
            f"We are pleased to offer you the position of {desig}\n"
            f"joining trom May {app % 28 + 1}. 2025\n"
            f"Location: {loc}")


_TEXT_FN = {
    "salary_slip": salary_text, "bank_statement": bank_text, "itr": itr_text,
    "aadhaar": aadhaar_text, "pan": pan_text, "driving_license": dl_text,
    "employee_id": employee_id_text, "appointment_letter": appointment_text,
}

GIANT_BLOB_EVERY = 97          # skew rows (north_rule: explicit skew handling)
GIANT_BLOB_BYTES = 2_000_000

# "cc" corpus profile (bench realism): Common-Crawl-ish document sizes.
# Default-profile docs are a few hundred bytes — far below real CC pages
# (tens of KB) — which makes benches floor-dominated and understates
# parallel work. The cc profile appends deterministic parser-neutral
# filler (no digits, no label keywords: nothing a field extractor can
# accidentally match) so per-doc parse work is realistic, and uses
# rarer/smaller giant rows (real multi-MB pages are <<1%).
CC_GIANT_EVERY = 499
CC_GIANT_BYTES = 512_000

_FILLER_WORDS = (
    "synergy", "ledger", "portal", "quarterly", "revision", "cadence",
    "briefing", "alignment", "outreach", "vendor", "registry", "manifest",
    "profile", "summary", "charter", "liaison", "overview", "workshop",
    "catalog", "digest")


#: Shared boilerplate sentences (cookie/footer-style): each cc doc
#: repeats ONE of these every 6th filler line — realistic in-document
#: boilerplate (dup_line_frac ~0.14, under the 0.30 Gopher gate, and
#: exactly what curate's repair stage strips), shared across docs the
#: way real site chrome is.
_BOILER_LINES = (
    "Subscribe to our newsletter for the latest updates.",
    "All rights reserved by the site operator and its partners.",
    "This page was generated for archival and review purposes.",
)


def _hash_word(h: int) -> str:
    """Six lowercase letters from a hash — a digit-free pseudo-word.
    These give the filler an effectively unbounded vocabulary so the
    char-8-gram shingle sets of UNRELATED docs stay disjoint (a tiny
    fixed vocabulary saturates the shingle space and drives every
    pairwise Jaccard toward 1 as docs grow)."""
    s = []
    for _ in range(6):
        s.append(chr(97 + h % 26))
        h //= 26
    return "".join(s)


def filler_block(i: int, n_lines: int) -> str:
    """Deterministic web-page-shaped filler: pure function of (i, j).

    Each content line is an English SENTENCE (terminal period, >= 3
    words, stopword-framed — so the C4 line rule keeps it and the
    stopword lang vote reads 'en'), dominated by per-(i,j) hash words
    (no digits, no extractor label keywords, near-zero cross-doc
    shingle overlap). Every 6th line is the doc's boiler sentence."""
    k = len(_FILLER_WORDS)
    lines = []
    x = (i * 6364136223846793005 + 1442695040888963407) % 2**64
    for j in range(n_lines):
        if j % 6 == 5:
            lines.append(_BOILER_LINES[i % len(_BOILER_LINES)])
            continue
        ws = []
        for _ in range(5):
            x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
            ws.append(_hash_word(x >> 33))
        lines.append(
            f"The {ws[0]} {_FILLER_WORDS[(i + j) % k]} and the {ws[1]} "
            f"{ws[2]} are near the {ws[3]} "
            f"{_FILLER_WORDS[(i * 7 + j) % k]} {ws[4]}.")
    return "\n".join(lines)


# Cascade-branch variants, cycled by row index:
#   0: `text` column pre-recovered (cheap path; html present but unused)
#   1: vector PDF, embedded text rows across 2 pages (PDF doc types)
#   2: scanned PDF, paddle blocks across 2 pages; QR image for aadhaar-png
#   3: paddle down -> tesseract fallback (with per-row confidence)
#   4: plain image, paddle blocks
_PDF_TYPES = ("salary_slip", "bank_statement", "itr")


def make_row(i: int, profile: str = "default") -> dict:
    """Row i of the synthetic table — pure function of (i, profile)."""
    doc_type = DOC_TYPES[i % len(DOC_TYPES)]
    app = _applicant(i)
    body = _TEXT_FN[doc_type](i)
    variant = i % 5
    lang = "hi" if (doc_type == "aadhaar" and app % 13 == 4) else "en"
    if profile == "cc":
        body = body + "\n" + filler_block(i, 60 + (i * 13) % 180)
        pad = CC_GIANT_BYTES if i % CC_GIANT_EVERY == 96 else 0
    else:
        pad = GIANT_BLOB_BYTES if i % GIANT_BLOB_EVERY == 96 else 0
    conf = 55.0 + (i % 40)

    pdfish = doc_type in _PDF_TYPES or (doc_type == "aadhaar" and variant in (1, 2, 3))
    ext = "pdf" if pdfish and variant in (0, 1, 2, 3) else "png"
    url = f"https://docs.synth.local/app{app:06d}/{doc_type}/{i:08d}.{ext}"

    # Metadata channel (S2/S4, ref dto/models.go:12-16 + income_service.go:43-46):
    #   i % 23 == 9  -> encrypted payload, meta carries the CORRECT password
    #   i % 23 == 17 -> encrypted payload, meta carries a WRONG password
    #                   (decrypt-failure error path, ref pdf_processor.go:34-60)
    #   i % 31 == 11 -> url advertises a bogus 'misc' segment; meta.doc_type
    #                   must win the classify coalesce
    password = ""
    meta = None
    if ext == "pdf" and variant in (1, 2, 3) and i % 23 in (9, 17):
        password = f"pw-{app:06d}"
        given = password if i % 23 == 9 else "wrong-password"
        meta = json.dumps({"doc_type": doc_type, "password": given})
    elif i % 31 == 11:
        meta = json.dumps({"doc_type": doc_type})
        url = url.replace(f"/{doc_type}/", "/misc/")

    text = ""
    lines = body.split("\n")
    mid = len(lines) // 2

    if variant == 0:
        text = body
        if ext == "pdf":
            html = pl.make_pdf_payload([{"text_rows": lines}], pad_to=pad)
        else:
            html = pl.make_image_payload(pl.make_image(blocks=lines), pad_to=pad)
    elif ext == "pdf" and variant == 1:
        html = pl.make_pdf_payload(
            [{"text_rows": lines[:mid]}, {"text_rows": lines[mid:]}],
            password=password, pad_to=pad)
    elif ext == "pdf" and variant == 2:
        pages = [{"image": pl.make_image(blocks=lines[:mid])},
                 {"image": pl.make_image(blocks=lines[mid:])}]
        if doc_type == "aadhaar" and app % 3 == 0:
            # QR on page 2 (page-2 heuristic, ref aadhaar_service.go:66-72).
            pages[1]["image"]["qr"] = aadhaar_qr_xml(i)
        html = pl.make_pdf_payload(pages, password=password, pad_to=pad)
    elif ext == "pdf" and variant == 3:
        html = pl.make_pdf_payload(
            [{"image": pl.make_image(paddle_fail=True,
                                     tess_text=body, tess_conf=conf)}],
            password=password,
            doc_tess_text=body, doc_tess_conf=conf, pad_to=pad)
    elif variant == 3:
        html = pl.make_image_payload(
            pl.make_image(paddle_fail=True, tess_text=body, tess_conf=conf),
            pad_to=pad)
    elif doc_type == "aadhaar" and variant == 2:
        html = pl.make_image_payload(
            pl.make_image(blocks=lines, qr_xml=aadhaar_qr_xml(i)), pad_to=pad)
    else:
        html = pl.make_image_payload(pl.make_image(blocks=lines), pad_to=pad)

    return {
        "url": url,
        "warc_ts": EPOCH + dt.timedelta(seconds=i * 37),
        "html": html,
        "text": text,
        "lang": lang,
        "meta": meta,
    }


def fixture_rows() -> list[dict]:
    """The reference's own test fixtures, replayed through every payload
    shape (north_rule: pytest replays fixture documents through the
    batch path and extracted text must be byte-identical)."""
    base = "https://docs.synth.local/fixtures"
    ts = EPOCH
    rows = [
        # Cheap path: text column carries the fixture verbatim.
        {"url": f"{base}/salary_slip/fx-salary-text.png", "warc_ts": ts,
         "html": pl.make_image_payload(pl.make_image(blocks=[])),
         "text": FIXTURE_SALARY, "lang": "en", "meta": None},
        {"url": f"{base}/bank_statement/fx-bank-text.png", "warc_ts": ts,
         "html": pl.make_image_payload(pl.make_image(blocks=[])),
         "text": FIXTURE_BANK, "lang": "en", "meta": None},
        # Scanned-PDF path: same fixtures as paddle blocks (one page).
        {"url": f"{base}/salary_slip/fx-salary-scan.pdf", "warc_ts": ts,
         "html": pl.make_pdf_payload(
             [{"image": pl.make_image(blocks=FIXTURE_SALARY.split("\n"))}]),
         "text": "", "lang": "en", "meta": None},
        {"url": f"{base}/bank_statement/fx-bank-scan.pdf", "warc_ts": ts,
         "html": pl.make_pdf_payload(
             [{"image": pl.make_image(blocks=FIXTURE_BANK.split("\n"))}]),
         "text": "", "lang": "en", "meta": None},
        # Password/metadata channel (S2/S4, ref income_service.go:43-46
        # + pdf_processor.go:34-60): encrypted vector PDF with the
        # correct password in meta; same payload with a wrong password
        # (soft-degrades to empty text + quality issues per ref
        # ProcessDocument); encrypted Aadhaar PDF whose decrypt failure
        # surfaces the reference error string verbatim.
        {"url": f"{base}/salary_slip/fx-salary-enc-ok.pdf", "warc_ts": ts,
         "html": pl.make_pdf_payload(
             [{"text_rows": FIXTURE_SALARY.split("\n")}], password="s3cret"),
         "text": "", "lang": "en",
         "meta": json.dumps({"doc_type": "salary_slip", "password": "s3cret"})},
        {"url": f"{base}/salary_slip/fx-salary-enc-bad.pdf", "warc_ts": ts,
         "html": pl.make_pdf_payload(
             [{"text_rows": FIXTURE_SALARY.split("\n")}], password="s3cret"),
         "text": "", "lang": "en",
         "meta": json.dumps({"doc_type": "salary_slip", "password": "nope"})},
        {"url": f"{base}/aadhaar/fx-aadhaar-enc-bad.pdf", "warc_ts": ts,
         "html": pl.make_pdf_payload(
             [{"image": pl.make_image(blocks=["Government of India"])}],
             password="s3cret"),
         "text": "", "lang": "en",
         "meta": json.dumps({"doc_type": "aadhaar", "password": "nope"})},
    ]
    return rows


def generate_rows(n: int, start: int = 0, profile: str = "default") -> list[dict]:
    return [make_row(i, profile) for i in range(start, start + n)]


def synth_input_df(spark, n: int, partitions: int | None = None,
                   profile: str = "default"):
    """Synthesize the input table as a DataFrame, distributed: row
    construction happens on executors (driver only ships indices), so
    generation itself scales with the cluster."""
    from .. import schemas
    sc = spark.sparkContext
    parts = partitions or sc.defaultParallelism
    rdd = sc.parallelize(range(n), parts).map(lambda i: make_row(i, profile))
    return spark.createDataFrame(rdd, schema=schemas.INPUT_SCHEMA)


def write_synth_parquet(spark, path: str, n: int) -> None:
    synth_input_df(spark, n).write.mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# Webtext corpus (north-rule webtext axis: Common-Crawl-style pages).
#
# Deterministic full html pages in the same north-rule input shape: a
# main article wrapped in realistic boilerplate (masthead, nav, link
# sidebar, related-links list, comments, footer) with markup-variant
# cycling that exercises the htmltext extractor's failure surface
# (malformed markup, link farms, pruned-class subtrees, table layout,
# WET-style pre-extracted rows) plus giant-page skew rows. Pages are
# ~4-40 KB of markup with a 10-40% content fraction — the shape a real
# crawl presents — so benches over this corpus time DOM work, not
# string copies.

_WEB_SITES = ("synthnews", "craftblog", "techdigest", "cityjournal",
              "fieldnotes")

CC_WEB_GIANT_EVERY = 499       # skew rows (north_rule: explicit skew handling)
CC_WEB_GIANT_BYTES = 512_000


def _web_sentence(i: int, j: int) -> str:
    k = len(_FILLER_WORDS)
    words = [_FILLER_WORDS[(i * 5 + j * 7 + w * 3) % k]
             for w in range(9 + (i + j) % 6)]
    mid = len(words) // 2
    return (" ".join(words[:mid]).capitalize() + ", "
            + " ".join(words[mid:]) + ".")


def web_paragraphs(i: int) -> list[str]:
    """The article body: pure function of i, every paragraph >= 25 chars
    (arc90 vote eligibility) with commas (vote weight)."""
    n = 6 + (i * 11) % 30
    return [" ".join(_web_sentence(i, j * 3 + s)
                     for s in range(2 + (i + j) % 3))
            for j in range(n)]


def _web_boilerplate_sidebar(i: int, n_links: int) -> str:
    items = "".join(
        f'<li><a href="/{_WEB_SITES[(i + j) % 5]}/{j}">'
        f'{_FILLER_WORDS[(i + j) % len(_FILLER_WORDS)].title()} '
        f'{_FILLER_WORDS[(i + 2 * j + 3) % len(_FILLER_WORDS)]}</a></li>'
        for j in range(n_links))
    return f'<div class="sidebar widget"><ul>{items}</ul></div>'


def make_web_row(i: int) -> dict:
    """Row i of the web corpus — pure function of i."""
    site = _WEB_SITES[i % 5]
    variant = i % 7
    paras = web_paragraphs(i)
    title = f"Article {i} from {site}"
    url = f"https://{site}.synth.local/posts/webpage/{i:08d}.html"
    ts = EPOCH + dt.timedelta(seconds=i * 53)

    if variant == 2:
        # WET-style row: pre-extracted text, no markup (the cascade's
        # text-column passthrough branch).
        return {"url": url, "warc_ts": ts, "html": b"",
                "text": "\n".join(paras), "lang": "en", "meta": None}

    masthead = (f'<header id="masthead"><h1>{site.title()} Daily</h1>'
                '</header>'
                '<nav class="menu"><a href="/">Home</a> '
                '<a href="/archive">Archive</a> <a href="/tags">Tags</a>'
                '</nav>')
    article_paras = "".join(
        f'<div class="para-wrap"><p data-idx="{j}">{p}</p></div>'
        for j, p in enumerate(paras))
    farm = ""
    if variant == 3:
        # In-article link farm: must be dropped by the keep filter.
        farm = ('<p>' + " ".join(
            f'<a href="/x{j}">{_FILLER_WORDS[j % 20]} link</a>'
            for j in range(14)) + '</p>')
    comments = (
        '<div class="comments"><h3>Comments</h3>'
        + "".join(f'<p>{_web_sentence(i + 9000, j)}</p>' for j in range(4))
        + '</div>')
    related = _web_boilerplate_sidebar(i, 18 + i % 14)
    footer = (f'<footer>Copyright 2026 {site.title()} Daily. '
              'All rights reserved.</footer>')

    if variant == 6:
        # Table-based layout (old-school): article in the center cell.
        body = (f'{masthead}<table><tr><td>{related}</td>'
                f'<td><h2>{title}</h2>{article_paras}{farm}</td>'
                f'<td>{_web_boilerplate_sidebar(i + 7, 12)}</td></tr>'
                f'</table>{comments}{footer}')
    else:
        body = (f'{masthead}{related}<article><h2>{title}</h2>'
                f'{article_paras}{farm}</article>{comments}{footer}')

    if variant == 1:
        # Malformed markup: unclosed <p>/<div>, stray end tags — the
        # parser must recover (browsers do).
        body = body.replace("</p>", "", 3).replace("</div>", "", 1) \
                   + "</span></em>"
    if variant == 5:
        # Div-soup nesting around the article container.
        body = body.replace("<article>",
                            '<div class="outer"><div><div><article>')\
                   .replace("</article>", "</article></div></div></div>")

    page = (f'<html><head><title>{title}</title>'
            '<script>var t=1;</script><style>.x{color:red}</style>'
            f'</head><body>{body}</body></html>')

    if i % CC_WEB_GIANT_EVERY == 96:
        # Giant-page skew row: REAL extra markup (repeated boilerplate
        # sidebars), not inert padding — a multi-hundred-KB page is
        # genuinely slow to parse, which is what skew handling must
        # absorb.
        blocks = []
        size = len(page)
        j = 0
        while size < CC_WEB_GIANT_BYTES:
            b = _web_boilerplate_sidebar(i + j, 40)
            blocks.append(b)
            size += len(b)
            j += 1
        page = page.replace("<footer>",
                            "".join(blocks) + "<footer>", 1)

    return {"url": url, "warc_ts": ts, "html": page.encode("utf-8"),
            "text": "", "lang": "en", "meta": None}


def web_input_df(spark, n: int, partitions: int | None = None):
    """Synthesize the web corpus as a DataFrame, distributed (driver
    ships only indices)."""
    from .. import schemas
    sc = spark.sparkContext
    parts = partitions or sc.defaultParallelism
    rdd = sc.parallelize(range(n), parts).map(make_web_row)
    return spark.createDataFrame(rdd, schema=schemas.INPUT_SCHEMA)
