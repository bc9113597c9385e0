"""Crafted-truth tests for the validator layer — statuses, the deep
assessment shapes (bands / symmetry / min-estimate / labels), and the
zero-variance-safe correlation flags."""

from ocr_spark.operators.validate import (
    assess_documents,
    correlation_flags,
    validate_documents,
)


def _docs(spark):
    rows = [
        # doc_id, text, lang, source, n_chars
        (0, "x" * 150, "en", "s", 150),        # all checks pass
        (1, None, "en", "s", 10),              # required fails -> error
        (2, "hello", "xx", "s", 5),            # lang fails -> warn
        (3, "abcdef", "en", "s", 99),          # identity fails -> warn
        (4, "y" * 3000, "en", "s", 3000),      # long band, ok
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_validate_documents_statuses(spark):
    out = {r.doc_id: r.status for r in validate_documents(_docs(spark)).collect()}
    assert out == {0: "ok", 1: "error", 2: "warn", 3: "warn", 4: "ok"}


def test_assess_documents_bands_and_labels(spark):
    rows = {r.doc_id: r for r in assess_documents(_docs(spark)).collect()}
    assert rows[0].length_band == "normal" and rows[0].assessment == "excellent"
    assert rows[2].length_band == "tiny"
    assert rows[4].length_band == "long"
    # doc 1: null text -> n stays, ln=0 -> estimate fails, symmetry fails
    assert not rows[1].chk_min_estimate and not rows[1].chk_symmetry
    assert rows[1].assessment == "fair"  # len_range + lang pass (2/4 = 0.5)
    # doc 3: n_chars=99 vs len=6 -> symmetry violation with a big ratio
    assert not rows[3].chk_symmetry and rows[3].sym_ratio > 0.9
    assert rows[3].len_est == 6
    # doc 0: exact agreement
    assert rows[0].chk_symmetry and rows[0].sym_ratio == 0.0


def test_assess_documents_group_conditioned_band(spark):
    """V7 analog (gender-specific muscle band, data_validator.py:364-380):
    the SAME n_chars passes or fails depending on the row's lang group,
    and a failing group band demotes excellent -> good."""
    rows = [
        # 470 chars: fails the zh band (60..450), passes default for de
        (0, "z" * 470, "zh", "s", 470),
        (1, "d" * 470, "de", "s", 470),
        # 80 chars: fails the en band (100..600), passes zh and default
        (2, "e" * 80, "en", "s", 80),
        (3, "z" * 80, "zh", "s", 80),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.doc_id: r for r in assess_documents(df).collect()}
    assert got[0].lang_band == "zh" and not got[0].chk_lang_band
    assert got[1].lang_band == "default" and got[1].chk_lang_band
    assert got[2].lang_band == "en" and not got[2].chk_lang_band
    assert got[3].lang_band == "zh" and got[3].chk_lang_band
    # demotion: docs 0 and 2 are otherwise all-green (completeness 1.0)
    assert got[0].assessment == "good" and got[2].assessment == "good"
    assert got[1].assessment == "excellent" and got[3].assessment == "excellent"


def test_correlation_flags_zero_variance_is_flagged(spark):
    # constant-length texts make len constant -> zero variance -> NULL corr,
    # which must be FLAGGED, not crash (Spark's builtin corr raises under ANSI)
    rows = [(i, "abc", "en", "s", 3) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.pair: r for r in correlation_flags(df).collect()}
    assert out["n_chars_vs_len"].corr is None
    assert out["n_chars_vs_len"].flagged is True


def test_correlation_flags_strong_pair_not_flagged(spark):
    rows = [(i, "word " * (i + 1), "en", "s", 5 * (i + 1)) for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.pair: r for r in correlation_flags(df).collect()}
    assert out["n_chars_vs_len"].corr == 1.0 and not out["n_chars_vs_len"].flagged
    assert out["len_vs_ws_tokens"].corr >= 0.99
