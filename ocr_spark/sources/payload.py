"""Deterministic binary payload codec.

The reference consumes real PDF/PNG/JPEG bytes through external engines
(pdftoppm subprocess, PaddleOCR HTTP sidecar, Tesseract CGO). None of
those engines exist in this environment, and re-implementing OCR model
inference is out of scope (SURVEY.md §7 non-goals): what this engine
must reproduce is every DECISION around text recovery — the cheap-first
cascade, its thresholds, page-join semantics and confidence assembly.

So the `html BINARY` column carries a self-describing container with
real magic bytes (%PDF / \\x89PNG) and a deterministic body, and the
fake engines below honor the reference's observable contracts:

  * pdf_extract_text  — per-page rows, each row followed by "\\n"
                        (ref service/pdf_processor.go:90-95)
  * pdf_extract_images — scanned-page payloads in page order
                        (ref service/pdf_processor.go:102-161)
  * paddle_extract_text — OCR blocks joined with "\\n"
                        (ref paddle_server.py:63-73)
  * tesseract_extract — (text, mean word confidence)
                        (ref client/tesseract_client.go:109-147)

Swapping these four functions for real engine bindings (pdfminer /
paddle / tesseract wheels on a production cluster) changes nothing
upstream: the cascade, partitioning, lineage and parsers are engine-
agnostic.
"""

from __future__ import annotations

import json

from ..textlib import pdflayout

PDF_MAGIC = b"%PDF-1.7\n%SYNTHDOC\n"
PNG_MAGIC = b"\x89PNG\r\n\x1a\nSYNTHDOC\n"


class PayloadError(Exception):
    """Raised where the reference's engine calls return an error."""


# ---------------- encoding ----------------

def make_pdf_payload(pages: list[dict], password: str = "",
                     doc_tess_text: str = "", doc_tess_conf: float = 0.0,
                     pad_to: int = 0) -> bytes:
    """Encode a PDF-like document.

    Each page dict may carry:
      text_rows: list[str]  — embedded text rows (vector page)
      spans: list[list]     — positioned glyph runs [t, x0, y0, x1, y1]
                              (vector page with geometry; extraction
                              runs the pdfminer-style layout pass)
      image: dict | None    — scanned-page image payload (see make_image)
    ``password`` models pdfcpu encryption (ref service/pdf_processor.go:34-60).
    ``pad_to`` appends filler bytes to model giant-blob skew rows.
    """
    body = {"pages": pages}
    if password:
        body["password"] = password
    if doc_tess_text:
        body["doc_tess"] = {"text": doc_tess_text, "conf": doc_tess_conf}
    raw = PDF_MAGIC + json.dumps(body, ensure_ascii=False).encode("utf-8")
    if pad_to > len(raw):
        raw += b"\n%PAD " + b"0" * (pad_to - len(raw) - 7)
    return raw


def make_image(blocks: list[str] | None = None, paddle_fail: bool = False,
               tess_text: str = "", tess_conf: float = 0.0,
               qr_xml: str = "") -> dict:
    """One image payload: paddle blocks, tesseract fallback text+conf,
    and an optional QR payload (models the gozxing decode,
    ref service/aadhaar_service.go:151-187)."""
    img = {}
    if blocks is not None:
        img["blocks"] = blocks
    if paddle_fail:
        img["paddle_fail"] = True
    if tess_text:
        img["tess"] = {"text": tess_text, "conf": tess_conf}
    if qr_xml:
        img["qr"] = qr_xml
    return img


def make_image_payload(image: dict, pad_to: int = 0) -> bytes:
    """Encode a standalone PNG-like image document."""
    raw = PNG_MAGIC + json.dumps({"image": image}, ensure_ascii=False).encode("utf-8")
    if pad_to > len(raw):
        raw += b"\nPAD" + b"0" * (pad_to - len(raw) - 4)
    return raw


# ---------------- decoding / fake engines ----------------

def _decode(data: bytes) -> tuple[str, dict]:
    if data.startswith(PDF_MAGIC):
        kind, body = "pdf", data[len(PDF_MAGIC):]
    elif data.startswith(PNG_MAGIC):
        kind, body = "png", data[len(PNG_MAGIC):]
    else:
        raise PayloadError("unrecognized payload magic")
    # Strip giant-blob padding.
    for pad in (b"\n%PAD ", b"\nPAD"):
        idx = body.find(pad)
        if idx >= 0:
            body = body[:idx]
            break
    try:
        return kind, json.loads(body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        raise PayloadError(f"corrupt payload body: {e}") from None


def is_pdf(data: bytes) -> bool:
    return data[:4] == b"%PDF"


def pdf_extract_text(data: bytes, password: str = "") -> str:
    """ExtractText semantics (ref service/pdf_processor.go:63-98):
    every row of every text page emitted with a trailing newline.

    A page carries either pre-ordered ``text_rows`` (the reference's
    pdfcpu view, which never exposes coordinates) or positioned
    ``spans`` [[t, x0, y0, x1, y1], ...]; span pages run the
    pdfminer-style layout pass (textlib/pdflayout.py) and emit its
    reading-ordered lines as the rows, so both page forms honor the
    same one-row-one-newline contract downstream."""
    kind, body = _decode(data)
    if kind != "pdf":
        raise PayloadError("not a pdf")
    want = body.get("password", "")
    if want and password != want:
        raise PayloadError("failed to decrypt PDF")
    out = []
    for page in body["pages"]:
        rows = page.get("text_rows")
        # Empty text_rows must not shadow a span page: the layout side
        # table (pdf_extract_layout) analyzes the same spans, and the
        # two views of one payload may never contradict each other.
        if not rows and page.get("spans"):
            rows = pdflayout.page_rows(page["spans"])
        for row in rows or []:
            out.append(row)
            out.append("\n")
    return "".join(out)


def pdf_extract_layout(data: bytes, password: str = "") -> list[dict]:
    """Per-page layout-analysis results for span-carrying pages:
    [{"page": i, "text": ..., "boxes": [...]}] (textlib/pdflayout.py).
    Pages without positioned spans contribute no layout entry — the
    reference's row-oriented pages have no geometry to analyze."""
    kind, body = _decode(data)
    if kind != "pdf":
        raise PayloadError("not a pdf")
    want = body.get("password", "")
    if want and password != want:
        raise PayloadError("failed to decrypt PDF")
    out = []
    for i, page in enumerate(body["pages"]):
        if page.get("spans"):
            res = pdflayout.analyze_page(page["spans"])
            res["page"] = i
            out.append(res)
    return out


def pdf_extract_images(data: bytes, password: str = "") -> list[dict]:
    """ExtractImages semantics (ref service/pdf_processor.go:102-161):
    page-ordered image payloads; error when none exist."""
    kind, body = _decode(data)
    if kind != "pdf":
        raise PayloadError("not a pdf")
    want = body.get("password", "")
    if want and password != want:
        raise PayloadError("failed to decrypt PDF")
    images = [p["image"] for p in body["pages"] if p.get("image")]
    if not images:
        raise PayloadError("no images could be extracted from the PDF")
    return images


def image_payload(data: bytes) -> dict:
    """Decode a standalone image document."""
    kind, body = _decode(data)
    if kind != "png":
        raise PayloadError("not an image")
    return body["image"]


def paddle_extract_text(img: dict) -> str:
    """PaddleOCR contract (ref paddle_server.py:63-73, client/paddle_client.go):
    block texts joined with '\\n'; raises on engine failure."""
    if img.get("paddle_fail"):
        raise PayloadError("paddle OCR failed")
    return "\n".join(img.get("blocks", []))


def tesseract_extract(img: dict) -> tuple[str, float]:
    """Tesseract contract (ref client/tesseract_client.go:109-147):
    (text, mean word confidence)."""
    tess = img.get("tess")
    if tess is None:
        raise PayloadError("tesseract failed")
    return tess["text"], float(tess.get("conf", 0.0))


def doc_tesseract(data: bytes) -> tuple[str, float]:
    """Tesseract invoked on the original uploaded file (ref
    client/tesseract_client.go:93-107 via ExtractTextAndQualityFromFile).
    The reference feeds the raw (possibly still-encrypted) bytes to the
    engine; on an encrypted PDF that yields no readable text, so the
    fake engine fails deterministically."""
    kind, body = _decode(data)
    if kind == "png":
        return tesseract_extract(body["image"])
    if body.get("password"):
        raise PayloadError("tesseract failed")
    tess = body.get("doc_tess")
    if tess is None:
        raise PayloadError("tesseract failed")
    return tess["text"], float(tess.get("conf", 0.0))


def qr_payload(img: dict) -> str | None:
    """gozxing QR decode stand-in: the deterministic QR XML if present."""
    return img.get("qr")
