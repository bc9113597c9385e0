"""Per-document extraction: the single shared core of the whole engine.

One call = one document = one output record — the reference's contract of
"for each document key emit exactly one record, deterministic function of the
document bytes and a fixed rule set, failures produce empty values, never
dropped rows" (reference: one_key_process.py:796-896 pivot + 识别成功率;
P7 failure->empty semantics one_key_process.py:576-582).

Both execution paths import THIS function:
- golden fixture generator (serial, driver-side) — ocr_spark.golden
- distributed Arrow-batched path — ocr_spark.operators.extract_op

Dispatch (deterministic):
  html is NULL/empty  -> text-column fallback (E4 analog,
                         optimized_ocr_processor.py:350-385) else 'empty'
  html starts %PDF    -> pdf branch (core.pdfparse)
  else                -> HTML branch (core.htmlparse) through the F14
                         two-strategy cascade: strict scoring first
                         (confidence early-exit), lenient rescoring when
                         strict keeps nothing ('ok_lenient' status); bytes
                         decode as UTF-8, falling back to latin-1 (total,
                         deterministic)
  branch raised       -> text fallback if available else 'error:<Class>'
  branch returned ''  -> text fallback if available else 'empty'
"""

from __future__ import annotations

from .htmlparse import extract_html_text_cascade
from .normalize import normalize_text
from .pdfparse import extract_pdf_text

RESULT_COLUMNS = (
    "url",
    "text",
    "extract_status",
    "content_kind",
    "n_blocks",
    "bytes_in",
    "bytes_out",
)

STATUS_OK = "ok"
STATUS_OK_LENIENT = "ok_lenient"    # recovered by the lenient retry strategy
STATUS_EMPTY = "empty"
STATUS_FALLBACK = "fallback_text"


def _decode(html: bytes) -> str:
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


def extract_record(url: str, html: bytes | None, text: str | None, lang: str | None) -> dict:
    """Extract one document. Total function: never raises."""
    bytes_in = len(html) if html is not None else 0
    fallback = normalize_text(text) if text else ""

    def result(out_text: str, status: str, kind: str, n_blocks: int) -> dict:
        return {
            "url": url,
            "text": out_text,
            "extract_status": status,
            "content_kind": kind,
            "n_blocks": n_blocks,
            "bytes_in": bytes_in,
            "bytes_out": len(out_text.encode("utf-8")),
        }

    if html is None or len(html) == 0:
        if fallback:
            return result(fallback, STATUS_FALLBACK, "text", 0)
        return result("", STATUS_EMPTY, "none", 0)

    kind = "pdf" if html[:4] == b"%PDF" else "html"
    status_ok = STATUS_OK
    try:
        if kind == "pdf":
            raw, n_blocks = extract_pdf_text(html), -1
            out = normalize_text(raw)
        else:
            # F14 cascade: strict strategy with early exit, lenient rescore
            # only when strict keeps nothing (one tokenize pass either way)
            raw, n_blocks, strategy = extract_html_text_cascade(_decode(html))
            if strategy == "lenient" and raw:
                status_ok = STATUS_OK_LENIENT
            # tokenizer output is normalize_text-canonical by construction:
            # every block is normalize_inline'd (single spaces, mapped chars
            # removed, stripped) and non-empty blocks join with one LF —
            # asserted as an invariant in tests. Skipping the redundant pass
            # saves ~7% of the parse.
            out = raw
        if n_blocks < 0:
            n_blocks = out.count("\n") + 1 if out else 0
    except Exception as e:  # noqa: BLE001 — P7: failure -> empty, row retained
        if fallback:
            return result(fallback, STATUS_FALLBACK, kind, 0)
        return result("", f"error:{type(e).__name__}", kind, 0)

    if not out:
        if fallback:
            return result(fallback, STATUS_FALLBACK, kind, 0)
        return result("", STATUS_EMPTY, kind, 0)
    return result(out, status_ok, kind, n_blocks)
