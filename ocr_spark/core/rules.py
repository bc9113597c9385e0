"""Load-time sanity assertions over the extraction rule tables.

The reference validates its rule tables when they load — coordinate
bounds, vocabulary membership, threshold ordering — before any document
is processed (the P5 shape: a bad rule should fail the JOB at startup,
not corrupt a billion extracted rows at task time). The graft's rule
tables are the tag vocabularies, the class/id blocklist, and the
strict/lenient threshold ladder in ``core.htmlparse``; this module is
their assertion layer.

``assert_rules_sane()`` runs once at pipeline/CLI/stream entry (it is
pure and cheap, so calling it per-session is free). Every check raises
``RuleSanityError`` with the specific violated invariant — the failure
mode it guards against is a future edit that, e.g., adds a heading tag
without adding it to BLOCK_TAGS, inverts the strict/lenient ladder, or
puts an uppercase entry in a vocabulary the lowercased tokenizer can
never match.
"""

from __future__ import annotations

from . import htmlparse as H


class RuleSanityError(AssertionError):
    """A rule table violates a structural invariant (fail at load time)."""


def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise RuleSanityError(msg)


def assert_rules_sane() -> None:
    """Validate every htmlparse rule table; raises RuleSanityError."""
    vocabs = {
        "SKIP_TAGS": H.SKIP_TAGS,
        "_RAWTEXT_TAGS": H._RAWTEXT_TAGS,
        "BOILERPLATE_TAGS": H.BOILERPLATE_TAGS,
        "BLOCK_TAGS": H.BLOCK_TAGS,
        "HEADING_TAGS": H.HEADING_TAGS,
        "VOID_TAGS": H.VOID_TAGS,
    }
    for name, vocab in vocabs.items():
        _check(len(vocab) > 0, f"{name} is empty")
        for t in vocab:
            _check(
                t == t.lower() and t == t.strip() and " " not in t and t != "",
                f"{name} entry {t!r} can never match the lowercased tokenizer",
            )

    # Tag-role invariants the scorer assumes:
    _check(
        H._RAWTEXT_TAGS <= H.SKIP_TAGS,
        "raw-text tags must be skipped subtrees (their content is literal)",
    )
    _check(
        H.HEADING_TAGS <= H.BLOCK_TAGS,
        "headings must be block boundaries or heading text merges into prose",
    )
    _check(
        not (H.SKIP_TAGS & H.BLOCK_TAGS),
        "a tag cannot both open a text block and have its subtree skipped",
    )
    _check(
        not (H.VOID_TAGS & H.BLOCK_TAGS),
        "void elements never close, so they cannot delimit blocks",
    )
    _check(
        not (H.VOID_TAGS & H.SKIP_TAGS),
        "void elements have no subtree to skip",
    )
    _check(
        not (H.BOILERPLATE_TAGS & H.HEADING_TAGS),
        "headings must not be structurally blocklisted",
    )

    # Threshold ladder: the lenient pass must be a strict relaxation —
    # inverting it silently turns the cascade into a no-op.
    _check(
        0 < H.LENIENT_MIN_BLOCK_CHARS < H.MIN_BLOCK_CHARS,
        "lenient min block chars must relax the strict floor",
    )
    _check(
        H.MAX_LINK_DENSITY < H.LENIENT_MAX_LINK_DENSITY <= 1.0,
        "lenient link-density ceiling must relax the strict ceiling",
    )
    _check(
        0 < H.MIN_HEADING_CHARS <= H.MIN_BLOCK_CHARS,
        "heading floor must not exceed the block floor",
    )
    _check(
        0.0 < H.MAX_LINK_DENSITY < 1.0,
        "strict link-density ceiling must be a proper fraction",
    )

    # Blocklist pattern: anchored-token form (never bare substrings —
    # 'meta' must not match 'metabolism') and case-insensitive.
    pat = H._BLOCKLIST_RE
    _check(bool(pat.search("class nav here")), "blocklist must match a token")
    _check(
        pat.search("metabolism navigate") is None,
        "blocklist must match whole tokens, not substrings",
    )
    _check(bool(pat.search("NAV")), "blocklist must be case-insensitive")
