"""Reciprocal-rank fusion."""

from pyspark.sql import functions as F

from ocr_spark.operators.index import RRF_K, rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_doc_in_both_lists_beats_single_list_winners(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(3, 1), (4, 2)])
    out = rrf_fuse([a, b], topk=10).collect()
    assert out[0]["doc_id"] == 3  # rank 3 + rank 1 beats any single list
    scores = {r["doc_id"]: r["rrf_score"] for r in out}
    assert scores[3] == round(1 / (RRF_K + 3) + 1 / (RRF_K + 1), 6)
    assert scores[1] == round(1 / (RRF_K + 1), 6)


def test_rrf_tie_breaks_by_id(spark):
    a = _ranked(spark, [(7, 1), (5, 2)])
    b = _ranked(spark, [(5, 1), (7, 2)])
    out = rrf_fuse([a, b], topk=2).collect()
    # identical fused scores: lower id first
    assert [r["doc_id"] for r in out] == [5, 7]
    assert [r["fused_rank"] for r in out] == [1, 2]


def test_rrf_topk_bound(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 30)])
    out = rrf_fuse([a], topk=5).collect()
    assert len(out) == 5 and [r["fused_rank"] for r in out] == [1, 2, 3, 4, 5]
