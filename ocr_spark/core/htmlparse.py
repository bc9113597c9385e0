"""Deterministic main-content extraction from HTML via stdlib ``html.parser``.

Graft analog of the reference's segmentation + rule-table + cascade layers:

- Block segmentation (DOM block boundaries) <- black-separator-band image
  segmentation (reference: split_image.py:26-71,143-197).
- Tag/class blocklists <- the coordinate rule table selecting which regions
  carry signal (reference: one_key_process.py:1146-1165).
- Text-density / link-density scoring with thresholds <- the row-blackness
  predicate thresholds (5px, 0.995) and min/max separator heights
  (reference: split_image.py:7-71, driver args one_key_process.py:1090-1097).
- Failure -> empty-string (never a dropped row) <- reference P7 contract
  (one_key_process.py:576-582).

Pure Python, no third-party parser: stdlib ``html.parser`` is deterministic
and available everywhere, which is exactly what the byte-identity contract
needs inside Arrow-batched UDFs. The seam (``extract_blocks`` -> ``Block``
list -> ``score_blocks``) is parser-agnostic so an lxml tokenizer can drop in
where available.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .normalize import normalize_inline

# Tags whose entire subtree carries no extractable prose.
SKIP_TAGS = frozenset(
    "script style noscript template svg math head iframe object embed "
    "canvas audio video map figure datalist".split()
)

# Structural boilerplate containers (semantic-HTML blocklist).
BOILERPLATE_TAGS = frozenset(
    "nav header footer aside form button select option label menu dialog".split()
)

# Tags that open/close a text block (block-level segmentation boundaries).
BLOCK_TAGS = frozenset(
    "p div section article main li ul ol h1 h2 h3 h4 h5 h6 td th tr table "
    "blockquote pre dd dt dl figcaption summary details body center".split()
)

HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

# Void elements never get close tags; <br> is a soft break inside a block.
VOID_TAGS = frozenset("br hr img input meta link area base col source track wbr".split())

# class/id substring blocklist — analog of the reference's rule table
# selecting signal-bearing regions (one_key_process.py:1146-1165).
_BLOCKLIST_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|navbar|menu|footer|header|masthead|sidebar|side-bar|"
    r"ads?|advert\w*|banner|share|sharing|social|comments?|promo|breadcrumbs?|"
    r"cookie|popup|modal|subscribe|newsletter|related|widget|pagination|pager|"
    r"byline|meta|tags|toolbar|skip)(?:$|[\s_-])",
    re.IGNORECASE,
)

# Scoring thresholds (the P1/P2 analog constants; fixed => deterministic).
MIN_BLOCK_CHARS = 25          # minimum kept-block length (non-heading)
MIN_HEADING_CHARS = 3         # headings kept even when short
MAX_LINK_DENSITY = 0.45       # prune blocks dominated by anchor text


@dataclass
class Block:
    """One candidate text block with the stats scoring needs."""

    text: str = ""
    link_chars: int = 0
    total_chars: int = 0
    blocked: bool = False       # inside boilerplate tag or blocklisted class/id
    heading: bool = False
    depth: int = 0
    parts: list = field(default_factory=list)
    link_parts: int = 0


class _BlockTokenizer(HTMLParser):
    """Stream HTML -> list[Block]. Tolerant of malformed markup: unmatched
    close tags are ignored, unclosed tags are implicitly closed at EOF
    (stdlib parser already never raises on bad input)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._skip_depth = 0
        self._block_stack: list[str] = []
        self._boiler_depth = 0
        self._classblock_depth = 0
        self._anchor_depth = 0
        self._cur: Block = Block()
        self._tag_stack: list[tuple[str, bool, bool]] = []  # (tag, boiler, classblocked)

    # -- helpers -----------------------------------------------------------
    def _flush(self) -> None:
        """Close the current block, stamping it with the CURRENT blocked
        state — callers must flush BEFORE mutating depth counters so text
        keeps the state it was collected under."""
        cur = self._cur
        text = normalize_inline("".join(cur.parts))
        if text:
            cur.text = text
            cur.total_chars = len(text)
            cur.link_chars = min(cur.link_chars, cur.total_chars)
            cur.blocked = self._boiler_depth > 0 or self._classblock_depth > 0
            self.blocks.append(cur)
        self._cur = Block()
        self._cur.heading = bool(self._block_stack) and self._block_stack[-1] in HEADING_TAGS
        self._cur.depth = len(self._block_stack)

    @staticmethod
    def _attrs_blocked(attrs) -> bool:
        for k, v in attrs:
            if k in ("class", "id", "role") and v and _BLOCKLIST_RE.search(v):
                return True
        return False

    # -- parser events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in VOID_TAGS:
            if tag == "br" and self._skip_depth == 0:
                self._cur.parts.append(" ")
            return
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            self._tag_stack.append((tag, False, False))
            return
        boiler = tag in BOILERPLATE_TAGS
        classblocked = self._attrs_blocked(attrs)
        boundary = tag in BLOCK_TAGS or boiler or classblocked
        if boundary:
            self._flush()  # before depth bumps: preceding text keeps old state
        if boiler:
            self._boiler_depth += 1
        if classblocked:
            self._classblock_depth += 1
        if boundary:
            self._block_stack.append(tag)
            self._cur.heading = tag in HEADING_TAGS
            self._cur.depth = len(self._block_stack)
        if tag == "a":
            self._anchor_depth += 1
        self._tag_stack.append((tag, boiler, classblocked))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        # Pop back to the matching open tag if present; ignore stray closes.
        for i in range(len(self._tag_stack) - 1, -1, -1):
            if self._tag_stack[i][0] == tag:
                popped = self._tag_stack[i:]
                if any(
                    t in BLOCK_TAGS or boiler or classblocked
                    for t, boiler, classblocked in popped
                ):
                    self._flush()  # before depth drops: inner text keeps blocked state
                for t, boiler, classblocked in reversed(popped):
                    if t in SKIP_TAGS:
                        self._skip_depth -= 1
                    if boiler:
                        self._boiler_depth -= 1
                    if classblocked:
                        self._classblock_depth -= 1
                    if t == "a":
                        self._anchor_depth = max(0, self._anchor_depth - 1)
                    if (t in BLOCK_TAGS or boiler or classblocked) and self._block_stack:
                        self._block_stack.pop()
                del self._tag_stack[i:]
                # leaving the boundary: reset heading/depth for the next block
                self._cur.heading = (
                    bool(self._block_stack) and self._block_stack[-1] in HEADING_TAGS
                )
                self._cur.depth = len(self._block_stack)
                return
        # no matching open tag: ignore (tolerant recovery, deterministic)

    def handle_startendtag(self, tag, attrs):
        if tag.lower() == "br" and self._skip_depth == 0:
            self._cur.parts.append(" ")

    def handle_data(self, data):
        if self._skip_depth > 0 or not data:
            return
        self._cur.parts.append(data)
        if self._anchor_depth > 0:
            # raw length (clamped to total at flush): avoids a per-run
            # normalize pass in the hottest callback; density denominators
            # use the same normalized total either way
            self._cur.link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_blocks(html_text: str) -> list[Block]:
    """Tokenize HTML into candidate blocks. Never raises on malformed input."""
    tok = _BlockTokenizer()
    tok.feed(html_text)
    tok.close()
    return tok.blocks


def score_blocks(blocks: list[Block]) -> list[Block]:
    """Keep content blocks, prune boilerplate — the best-of cascade analog
    (reference confidence argmax, one_key_process.py:521-560) collapsed into
    a single deterministic scoring pass."""
    kept = []
    for b in blocks:
        if b.blocked:
            continue
        n = b.total_chars
        if b.heading:
            if n >= MIN_HEADING_CHARS and (n == 0 or b.link_chars / n <= MAX_LINK_DENSITY):
                kept.append(b)
            continue
        if n < MIN_BLOCK_CHARS:
            continue
        if n and b.link_chars / n > MAX_LINK_DENSITY:
            continue
        kept.append(b)
    return kept


def extract_html_text(html_text: str) -> tuple[str, int]:
    """HTML -> (main-content text, kept-block count).

    Blocks join with a single newline; normalize_text is applied by the
    caller-level contract in core.extract (one normalization, one place).
    """
    blocks = score_blocks(extract_blocks(html_text))
    return "\n".join(b.text for b in blocks), len(blocks)
