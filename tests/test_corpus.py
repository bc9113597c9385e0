"""Composed cleaning pass: stage ordering (quality beats exact beats
near), keeper conventions, and full-coverage disposition."""

from ocr_spark.operators.corpus import clean_corpus

GOOD = " ".join(f"tok{i} the quick brown fox item value entry" for i in range(8))


def test_stage_dispositions(spark):
    rows = [
        (0, GOOD),                       # kept (cluster keeper by min id)
        (1, GOOD),                       # exact duplicate of 0
        (2, GOOD + " extra trailing tokens here"),  # near-dup of 0
        (3, "too few words"),            # quality
        (4, " ".join(["loop"] * 40)),    # quality (repetitive)
        (5, " ".join(f"w{i}q x{i}a y{i}b z{i}c v{i}d" for i in range(12))),  # kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["stage"] for r in clean_corpus(df).collect()}
    assert got == {
        0: "kept",
        1: "exact_dup",
        2: "near_dup",
        3: "quality",
        4: "quality",
        5: "kept",
    }


def test_every_document_gets_exactly_one_row(spark):
    rows = [(i, GOOD if i % 2 else "short") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df).collect()
    assert len(out) == 30
    assert {r["doc_id"] for r in out} == set(range(30))
    stages = {r["stage"] for r in out}
    assert stages <= {"kept", "quality", "exact_dup", "near_dup"}
