"""Behavioral tests for character-class text profiling
(textprofile.script_stats / code_detect) on crafted rows where the right
answer is known by construction; exact cross-engine parity runs in
test_oracle_parity (script_stats / code_detect)."""

from ocr_spark.operators.textprofile import code_detect, script_stats


def test_script_stats_mix_and_dominance(spark):
    rows = [
        (0, "plain ascii words only"),
        (1, "привет мир"),                 # pure Cyrillic
        (2, "数据处理"),                    # pure CJK
        (3, "hello мир"),                  # latin 5 vs cyrillic 3 -> latin
        (4, None),                          # NULL -> all zero, 'other'
        (5, "!!! 123 ???"),                 # no letters -> 'other'
    ]
    out = {
        r.doc_id: r
        for r in script_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert len(out) == 6                    # never-drop
    assert out[0].dominant_script == "latin" and out[0].latin_frac == 1.0
    assert out[1].dominant_script == "cyrillic" and out[1].cyrillic_frac == 1.0
    assert out[2].dominant_script == "cjk" and out[2].cjk_frac == 1.0
    assert out[3].dominant_script == "latin"
    assert 0 < out[3].cyrillic_frac < out[3].latin_frac
    assert out[4].n_chars == 0 and out[4].dominant_script == "other"
    assert out[5].dominant_script == "other" and out[5].latin_frac == 0.0


def test_script_stats_tie_breaks_by_order(spark):
    # 3 latin vs 3 cyrillic letters: SCRIPT_ORDER lists latin first
    df = spark.createDataFrame([(0, "abc мир")], "doc_id long, text string")
    assert script_stats(df).collect()[0].dominant_script == "latin"


def test_code_detect_clauses(spark):
    rows = [
        (0, "ordinary prose with no programming content at all"),
        # keyword + indent clause
        (1, "intro text\ndef main():\n    return 1"),
        # one keyword, no indent: must NOT trigger
        (2, "the var keyword alone in prose"),
        # symbol clause: dense JSON, zero keywords
        (3, '{"a": [1, 2], "b": {"c": 3}}'),
        # indent without keywords: must NOT trigger
        (4, "poem\n    indented verse line\n    another"),
        (5, None),
    ]
    out = {
        r.doc_id: r
        for r in code_detect(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert len(out) == 6
    assert not out[0].is_code and out[0].kw_hits == 0
    assert out[1].is_code and out[1].kw_hits == 2 and out[1].indent_lines == 1
    assert not out[2].is_code and out[2].kw_hits == 1
    assert out[3].is_code and out[3].kw_hits == 0
    assert out[3].sym_ratio >= 0.08
    assert not out[4].is_code and out[4].indent_lines == 2
    assert not out[5].is_code and out[5].n_chars == 0


def test_token_exact_keywords_no_substring_hits(spark):
    # 'classic' and 'deft' contain keywords as substrings; token-exact
    # matching must not count them
    df = spark.createDataFrame(
        [(0, "classic deft importer\n    indented")], "doc_id long, text string"
    )
    r = code_detect(df).collect()[0]
    assert r.kw_hits == 0 and not r.is_code
