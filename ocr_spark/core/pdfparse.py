"""Minimal deterministic PDF text extraction (the binary-payload branch).

Graft analog of the reference's numeric-branch special handling that
dispatches on payload kind (reference: optimized_ocr_processor.py:91-115)
— here the dispatch key is the ``%PDF`` magic (core.extract).

Scope: a closed, documented dialect — PDFs whose page content streams are
either raw or FlateDecode-compressed and whose text is emitted through the
standard text operators ``Tj``, ``'``, ``"`` and ``TJ`` with literal
``(...)`` strings. This covers everything ``core.synth`` generates plus the
common single-filter case in the wild. Anything outside the dialect raises
``PdfParseError`` — callers convert that to the failure->empty contract
(reference P7, one_key_process.py:576-582).

Line policy (deterministic): each ``Td``/``TD``/``T*``/``ET`` boundary ends a
line; lines join with LF; pages join with a blank line.
"""

from __future__ import annotations

import re
import zlib


class PdfParseError(ValueError):
    pass


_RE_STREAM = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
# direct /Length only; negative lookahead rejects indirect refs of ANY
# generation (/Length 4 0 R, /Length 4 1 R, ...) — a gen>0 ref parsed as a
# direct length would silently truncate the stream body
# (?!\\d) pins the group to the FULL number first: without it the regex
# engine backtracks \\d+ to a digit prefix where the indirect-ref
# lookahead no longer sees "NN R" (/Length 41 0 R matched as length 4)
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s*\d+\s+R)")
_RE_TEXT_SHOW = re.compile(
    rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|'|\")|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"
    rb"|(?P<nl>T\*|TD|Td|ET)"
)
_RE_ARR_STR = re.compile(rb"\((?:\\.|[^\\()])*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        else:  # lone backslash: drop (PDF spec: ignore)
            i += 2
    return bytes(out)


def _decode_pdf_string(raw: bytes) -> str:
    b = _unescape(raw)
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _content_streams(data: bytes) -> list[bytes]:
    """Yield decoded content streams in document order."""
    streams = []
    for m in _RE_STREAM.finditer(data):
        hdr = m.group(1)
        start = m.end()
        lm = _RE_LENGTH.search(hdr)
        if lm is not None:
            # exact byte count from the stream dict (the spec path): never
            # guess at trailing EOLs — compressed data may itself end in one
            body = data[start : start + int(lm.group(1))]
            if data.find(b"endstream", start + len(body)) < 0:
                raise PdfParseError("unterminated stream")
        else:
            end = data.find(b"endstream", start)
            if end < 0:
                raise PdfParseError("unterminated stream")
            body = data[start:end]
            # trailing EOL before 'endstream' is not part of the stream
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n") or body.endswith(b"\r"):
                body = body[:-1]
        if b"/FlateDecode" in hdr:
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise PdfParseError(f"bad FlateDecode stream: {e}") from e
        elif b"/Filter" in hdr:
            raise PdfParseError("unsupported stream filter")
        # Only text-bearing streams matter; cheap probe for a text block.
        if b"BT" in body:
            streams.append(body)
    return streams


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes -> text per the dialect/line policy above. Raises
    PdfParseError outside the dialect; never returns None."""
    if not data.startswith(b"%PDF"):
        raise PdfParseError("missing %PDF magic")
    pages: list[str] = []
    for body in _content_streams(data):
        lines: list[str] = []
        cur: list[str] = []
        for m in _RE_TEXT_SHOW.finditer(body):
            if m.group("nl") is not None:
                if cur:
                    lines.append("".join(cur))
                    cur = []
                continue
            if m.group("arr") is not None:
                for sm in _RE_ARR_STR.finditer(m.group("arr")):
                    cur.append(_decode_pdf_string(sm.group(0)[1:-1]))
            else:
                cur.append(_decode_pdf_string(m.group("s")))
                if m.group("op") in (b"'", b'"'):
                    lines.append("".join(cur))
                    cur = []
        if cur:
            lines.append("".join(cur))
        page = "\n".join(lines)
        if page:
            pages.append(page)
    return "\n\n".join(pages)
