"""Deterministic text normalization — the byte-identity spec.

This is the graft analog of the reference's character-confusion /
whitespace-cleanup layer (reference: one_key_process.py:276-340 — char
confusion fixes, CJK punctuation mapping, fixed-format rendering). Output
text bytes are compared byte-for-byte against golden fixtures, so the exact
rule ORDER below is part of the contract. Do not reorder.

Normalization pipeline (applied in this exact order):

1. Unicode space-family -> ASCII space: NBSP (U+00A0), NNBSP (U+202F),
   figure space (U+2007), ideographic space handled as-is (kept: it is
   meaningful in CJK text), zero-width chars removed (U+200B, U+200C,
   U+200D, U+FEFF).
2. Line endings: CRLF and lone CR -> LF.
3. Within each line: runs of spaces/tabs collapse to one space; leading and
   trailing spaces/tabs stripped.
4. Runs of 3+ newlines collapse to exactly 2 (paragraph break).
5. Whole-string strip of leading/trailing whitespace.

Rule 0 (applied with rule 1's translate): C0 control chars other than
tab/newline family, and DEL, are deleted — binary junk must not leak
(the P8 image-quality-guard analog, ocr_diagnostic_tool.py:111-116).
"""

from __future__ import annotations

import re

_ZERO_WIDTH = dict.fromkeys([0x200B, 0x200C, 0x200D, 0xFEFF])
_SPACE_MAP = {0x00A0: 0x20, 0x202F: 0x20, 0x2007: 0x20}
# C0 controls (except \t \n \r \f \v, which the whitespace rules own) and DEL
# are deleted: binary junk decoded via latin-1 must not leak into output text.
_CONTROLS = dict.fromkeys(
    c for c in range(0x20) if c not in (0x09, 0x0A, 0x0B, 0x0C, 0x0D)
)
_CONTROLS[0x7F] = None
_CHAR_MAP = {**_SPACE_MAP, **_ZERO_WIDTH, **_CONTROLS}

_RE_INTRALINE_WS = re.compile(r"[ \t\f\v]+")
_RE_LINE_EDGES = re.compile(r"(?m)^[ ]+|[ ]+$")
_RE_MANY_NL = re.compile(r"\n{3,}")

# fast-path guard: one C-speed scan decides whether the (much slower)
# per-char dict translate is needed at all — most blocks are plain text.
# Built from _CHAR_MAP itself so the two can never drift apart.
_RE_NEEDS_MAP = re.compile("[" + "".join(re.escape(chr(c)) for c in _CHAR_MAP) + "]")


def normalize_text(s: str) -> str:
    """Normalize extracted text per the byte-identity spec (module doc)."""
    if not s:
        return ""
    if _RE_NEEDS_MAP.search(s) is not None:
        s = s.translate(_CHAR_MAP)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _RE_INTRALINE_WS.sub(" ", s)
    s = _RE_LINE_EDGES.sub("", s)
    s = _RE_MANY_NL.sub("\n\n", s)
    return s.strip()


def normalize_inline(s: str) -> str:
    """Collapse ALL whitespace (incl. newlines) to single spaces and strip.

    Used for text inside a single block: intra-block newlines in HTML source
    are presentation, not structure (the block segmentation decides
    structure — the analog of the reference's separator detection,
    split_image.py:26-71).
    """
    if not s:
        return ""
    if _RE_NEEDS_MAP.search(s) is not None:
        s = s.translate(_CHAR_MAP)
    return " ".join(s.split())
