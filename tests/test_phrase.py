"""Positional-postings phrase retrieval."""

import pytest

from ocr_spark.operators.index import phrase_search, positional_postings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_three_term_chain(spark):
    d = _docs(spark, [
        (1, "the big red fox jumps"),
        (2, "big red herring; not big red fox here though: big red fox!"),
        (3, "big fox red"),          # right terms, wrong order
        (4, "big red"),              # prefix only
    ])
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(d, ["big", "red", "fox"]).collect()}
    assert got == {1: 1, 2: 2}


def test_phrase_duplicate_terms(spark):
    d = _docs(spark, [(1, "buffalo buffalo buffalo"), (2, "buffalo alone")])
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(d, ["buffalo", "buffalo"]).collect()}
    # overlapping starts both count: positions 0 and 1
    assert got == {1: 2}


def test_phrase_case_and_punctuation_tokenization(spark):
    d = _docs(spark, [(1, "Big TABLE, big table."), (2, None)])
    got = phrase_search(d, ["big", "table"]).collect()
    assert {(r["doc_id"], r["n_matches"]) for r in got} == {(1, 2)}


def test_phrase_single_term(spark):
    d = _docs(spark, [(1, "x y x"), (2, "y")])
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(d, ["x"]).collect()}
    assert got == {1: 2}


def test_phrase_empty_raises(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        phrase_search(d, [])


def test_positional_postings_vocab_prunes_before_shuffle(spark):
    d = _docs(spark, [(1, "alpha beta gamma alpha")])
    rows = positional_postings(d, vocab=["alpha"]).collect()
    assert sorted((r["term"], r["pos"]) for r in rows) == [("alpha", 0), ("alpha", 3)]


def test_phrase_plan_keyed_joins_only(spark):
    import contextlib
    import io

    d = _docs(spark, [(1, "a b c"), (2, "b c a")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        phrase_search(d, ["a", "b", "c"]).explain("formatted")
    plan = buf.getvalue()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # tokenization stays JVM-side (createDataFrame's applySchemaToPythonRDD
    # source node is not an eval node)
    for node in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas"):
        assert node not in plan
