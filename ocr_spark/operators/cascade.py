"""Cheap-first text-recovery cascade + per-doc-type parse dispatch.

Row-level logic (pure Python) executed inside the Arrow-vectorized
extraction UDF — one short-circuiting pass per document, never separate
Spark stages per engine (SURVEY.md §4: modeling the cascade as distinct
stages would double-scan the blob column).

The `text` input column is Common-Crawl-style pre-recovered text. When
non-empty it stands in for the corresponding engine output (embedded
PDF text for .pdf urls, PaddleOCR output otherwise) and the thresholds
below still gate it; when empty the binary `html` payload is decoded
through the fake engines in sources/payload.py.

Thresholds and branch order are byte-exact to the reference:
  income  ProcessDocument  ref service/income_service.go:131-246
  itr     AnalyzeITR       ref service/income_service.go:329-424
  aadhaar ExtractFromFile  ref service/aadhaar_service.go:46-148
  pan     ExtractPANData   ref service/pan_service.go:19-38
  dl      ExtractDLText    ref service/driving_license_service.go:34-59
  employee ProcessEmployeeDocs ref service/employee_service.go:26-89
"""

from __future__ import annotations

from ..sources import payload as pl
from ..textlib import aadhaar as t_aadhaar
from ..textlib import charset as t_charset
from ..textlib import htmltext as t_html
from ..textlib import bank as t_bank
from ..textlib import dl as t_dl
from ..textlib import employee as t_emp
from ..textlib import itr as t_itr
from ..textlib import pan as t_pan
from ..textlib import salary as t_salary
from ..textlib.quality import evaluate_text_quality

DOC_TYPES = ("salary_slip", "bank_statement", "itr", "aadhaar", "pan",
             "driving_license", "employee_id", "appointment_letter",
             "webpage")


def _quality(resolution=0.0, confidence=0.0, contrast=0.0, final=0.0, issues=None):
    return {"resolution_score": resolution, "ocr_confidence": confidence,
            "contrast_score": contrast, "final_score": final,
            "issues": issues if issues is not None else []}


def _is_pdf_url(url: str) -> bool:
    # Extension dispatch (ref service/income_service.go:137,344).
    return url.lower().endswith(".pdf")


def recover_income_text(url: str, html: bytes | None, text: str,
                        password: str = "") -> tuple[str, dict, str | None]:
    """T5 cascade (ref service/income_service.go:131-246).

    Returns (recovered_text, quality, error). Per the reference, short or
    empty text still flows to the parser — only image-OCR failure on a
    non-PDF is a hard error.
    """
    issues: list[str] = []

    if _is_pdf_url(url):
        recovered = text or ""
        if recovered == "" and html is not None:
            try:
                recovered = pl.pdf_extract_text(html, password)
            except pl.PayloadError:
                issues.append("pdf_text_extraction_failed")
                recovered = ""

        if len(recovered.strip()) < 20:  # threshold ref :148
            images = None
            if html is not None:
                try:
                    images = pl.pdf_extract_images(html, password)
                except pl.PayloadError:
                    images = None
            if not images:
                issues.append("pdf_image_extraction_failed")
                return recovered, _quality(issues=issues), None

            combined: list[str] = []
            total_conf = 0.0
            count = 0
            for img in images:
                page_text = None
                page_conf = 75.0  # Paddle default conf (ref :170)
                try:
                    page_text = pl.paddle_extract_text(img)
                except pl.PayloadError:
                    page_text = None
                if page_text is None or len(page_text.strip()) < 10:  # ref :173
                    try:
                        page_text, page_conf = pl.tesseract_extract(img)
                    except pl.PayloadError:
                        continue
                combined.append(page_text)
                combined.append("\n")  # page break (ref :183)
                total_conf += page_conf
                count += 1

            if count > 0:
                recovered = "".join(combined)
                conf = total_conf / count
                final = (conf + 80.0) / 2
                if final < 60:
                    issues.append("low_quality_document")
                return recovered, _quality(80.0, conf, 0.0, final, issues), None
            issues.append("scanned_pdf_ocr_failed")
            return recovered, _quality(issues=issues), None

        # Text-based PDF (ref :202-207).
        return recovered, _quality(100.0, 100.0, 0.0, 100.0, issues), None

    # Non-PDF: Paddle first (ref :210-218), Tesseract fallback (:232-245).
    paddle_text = text or None
    if paddle_text is None and html is not None:
        try:
            paddle_text = pl.paddle_extract_text(pl.image_payload(html))
        except pl.PayloadError:
            paddle_text = None
    if paddle_text is not None and len(paddle_text.strip()) > 5:  # ref :213
        return paddle_text, _quality(80.0, 75.0, 0.0, 77.5, issues), None

    if html is None:
        return "", _quality(issues=issues), "image OCR failed"
    try:
        tess_text, conf = pl.doc_tesseract(html)
    except pl.PayloadError:
        return "", _quality(issues=issues), "image OCR failed"
    final = (conf + 80.0) / 2
    if final < 60:
        issues.append("low_quality_document")
    return tess_text, _quality(80.0, conf, 0.0, final, issues), None


def recover_itr_text(url: str, html: bytes | None, text: str) -> tuple[str, str | None]:
    """T6 cascade (ref service/income_service.go:329-424)."""
    if _is_pdf_url(url):
        extracted = text or ""
        if extracted == "" and html is not None:
            try:
                extracted = pl.pdf_extract_text(html, "")
            except pl.PayloadError:
                extracted = ""

        if evaluate_text_quality(extracted) < 50:  # ref :358
            images = None
            if html is not None:
                try:
                    images = pl.pdf_extract_images(html, "")
                except pl.PayloadError:
                    images = None
            if images:
                combined: list[str] = []
                for img in images:
                    try:
                        page_text = pl.paddle_extract_text(img)
                    except pl.PayloadError:
                        continue
                    if len(page_text.strip()) > 10:  # ref :376
                        combined.append(page_text)
                        combined.append("\n")
                joined = "".join(combined)
                if len(joined.strip()) > 20:  # ref :383
                    extracted = joined

        if len(extracted.strip()) == 0 and html is not None:  # ref :390
            try:
                extracted, _ = pl.doc_tesseract(html)
            except pl.PayloadError:
                pass
    else:
        paddle_text = text or None
        if paddle_text is None and html is not None:
            try:
                paddle_text = pl.paddle_extract_text(pl.image_payload(html))
            except pl.PayloadError:
                paddle_text = None
        if paddle_text is not None and len(paddle_text.strip()) > 5:  # ref :403
            extracted = paddle_text
        else:
            if html is None:
                return "", "OCR failed"
            try:
                extracted, _ = pl.doc_tesseract(html)
            except pl.PayloadError:
                return "", "OCR failed"

    if len(extracted.strip()) == 0:  # ref :415-417
        return "", "no text could be extracted from the document"
    return extracted, None


def recover_aadhaar(url: str, html: bytes | None, text: str,
                    password: str = "") -> tuple[dict | None, str, str | None]:
    """Aadhaar flow (ref service/aadhaar_service.go:46-148).

    Returns (qr_result, ocr_text, error): qr_result short-circuits OCR.
    """
    if text:
        return None, text, None

    if html is None:
        return None, "", "no images found in PDF"

    if _is_pdf_url(url):
        try:
            images = pl.pdf_extract_images(html, password)
        except pl.PayloadError as e:
            return None, "", str(e)
        # Page-2 heuristic (ref :66-72).
        img = images[1] if len(images) > 1 else images[0]
        qr = pl.qr_payload(img)
        if qr:
            parsed = t_aadhaar.parse_aadhaar_qr_xml(qr)
            if parsed is not None:
                return parsed, "", None
        # OCR all pages: leading '\n' per page (ref :118-119).
        parts: list[str] = []
        for page in images:
            try:
                page_text = pl.paddle_extract_text(page)
            except pl.PayloadError:
                continue
            parts.append("\n")
            parts.append(page_text)
        return None, "".join(parts), None

    try:
        img = pl.image_payload(html)
    except pl.PayloadError as e:
        return None, "", f"failed to decode image: {e}"
    qr = pl.qr_payload(img)
    if qr:
        parsed = t_aadhaar.parse_aadhaar_qr_xml(qr)
        if parsed is not None:
            return parsed, "", None
    try:
        page_text = pl.paddle_extract_text(img)
    except pl.PayloadError:
        return None, "", "OCR extraction failed"
    return None, page_text, None


def _paddle_or_none(html: bytes | None, text: str) -> str | None:
    if text:
        return text
    if html is None:
        return None
    try:
        return pl.paddle_extract_text(pl.image_payload(html))
    except pl.PayloadError:
        return None


def extract_record(url: str, html: bytes | None, text: str, doc_type: str,
                   password: str = "") -> dict:
    """Full per-document extraction: cascade + parse dispatch.

    Returns a flat dict matching schemas.EXTRACT_FIELDS; exactly one of
    the per-type struct slots is populated (or `error` is set). A failed
    document NEVER raises — at 10^12-document scale one poison row must
    not kill the job (north_rule; replaces the reference's fail-fast at
    service/income_service.go:112-114).
    """
    out: dict = {"url": url, "doc_type": doc_type, "extracted_text": "",
                 "quality": None, "salary": None, "bank": None, "itr": None,
                 "aadhaar": None, "pan": None, "dl": None, "employee": None,
                 "appointment": None, "webpage": None, "error": None}
    try:
        if doc_type in ("salary_slip", "bank_statement"):
            recovered, quality, err = recover_income_text(url, html, text, password)
            out["extracted_text"] = recovered
            out["quality"] = quality
            if err:
                out["error"] = err
                return out
            if doc_type == "salary_slip":
                out["salary"] = t_salary.parse_salary_slip(recovered)
            else:
                out["bank"] = t_bank.parse_bank_statement(recovered)
        elif doc_type == "itr":
            recovered, err = recover_itr_text(url, html, text)
            out["extracted_text"] = recovered
            if err:
                out["error"] = err
                return out
            out["itr"] = t_itr.parse_itr(recovered)
        elif doc_type == "aadhaar":
            qr_result, ocr_text, err = recover_aadhaar(url, html, text, password)
            if err:
                out["error"] = err
                return out
            if qr_result is not None:
                out["aadhaar"] = qr_result
                return out
            out["extracted_text"] = ocr_text
            result = t_aadhaar.parse_aadhaar_from_text(ocr_text)
            if result["name"] == "" and result["aadhaar_last4"] == "":
                out["error"] = "could not extract meaningful Aadhaar data from OCR text"
                return out
            out["aadhaar"] = result
        elif doc_type == "pan":
            raw = _paddle_or_none(html, text)
            if raw is None:
                out["error"] = "paddle OCR failed"
                return out
            out["extracted_text"] = raw
            out["pan"] = t_pan.parse_pan_text(raw)
        elif doc_type == "driving_license":
            # Paddle accepted when len > 10 (ref driving_license_service.go:43).
            raw = _paddle_or_none(html, text)
            if raw is None or len(raw) <= 10:
                if html is None:
                    out["error"] = "OCR failed"
                    return out
                try:
                    raw, _ = pl.doc_tesseract(html)
                except pl.PayloadError:
                    out["error"] = "OCR failed"
                    return out
            out["extracted_text"] = raw
            out["dl"] = t_dl.parse_dl(raw)
        elif doc_type == "employee_id":
            raw = _paddle_or_none(html, text)
            if raw is None:
                out["error"] = "failed to OCR employee ID card"
                return out
            out["extracted_text"] = raw
            out["employee"] = t_emp.parse_employee_id_card(raw)
        elif doc_type == "appointment_letter":
            raw = _paddle_or_none(html, text)
            if raw is None:
                out["error"] = "failed to OCR appointment letter"
                return out
            out["extracted_text"] = raw
            out["appointment"] = t_emp.parse_appointment_letter(raw)
        elif doc_type == "webpage":
            # Webtext axis (north_rule "HTML boilerplate strip"): the
            # html column carries raw markup; the text column, when the
            # markup is absent, is WET-style pre-extracted text and
            # passes through as a single full-confidence span.
            markup = ""
            if html is not None and not html.startswith(pl.PDF_MAGIC[:4]):
                # WHATWG-style sniff: BOM > meta prescan > utf-8 >
                # windows-1252 (textlib/charset.py) — CC pages arrive
                # in arbitrary encodings.
                markup = t_charset.sniff_decode(html)[0]
            if markup:
                res = t_html.extract_main(markup)
                out["extracted_text"] = res["main_text"]
                out["webpage"] = {k: res[k] for k in
                                  ("title", "n_blocks", "n_content_blocks",
                                   "spans")}
            elif text:
                # WET-style pre-extracted text: passthrough, one
                # full-confidence span per line (spans always partition
                # extracted_text on "\n", same contract as the DOM path).
                out["extracted_text"] = text
                spans, off = [], 0
                for j, line in enumerate(text.split("\n")):
                    spans.append({"block_idx": j, "char_start": off,
                                  "char_len": len(line),
                                  "link_density": 0.0,
                                  "confidence": min(1.0, len(line) / 100.0)})
                    off += len(line) + 1
                out["webpage"] = {"title": "", "n_blocks": len(spans),
                                  "n_content_blocks": len(spans),
                                  "spans": spans}
            else:
                out["error"] = "empty web page"
        else:
            out["error"] = f"unknown document type: {doc_type}"
    except Exception as e:  # poison-row guard
        out["error"] = f"extraction panic: {type(e).__name__}: {e}"
    return out
