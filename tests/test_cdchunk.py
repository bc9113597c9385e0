"""Content-defined chunking: the resync property fixed-size blocking
lacks, bounds discipline, never-drop, and determinism."""

import hashlib

import numpy as np

from ocr_spark.operators.cdchunk import (
    AVG_SIZE,
    MAX_SIZE,
    MIN_SIZE,
    cdc_boundaries,
    cdc_chunks,
    shared_chunks,
)


def _payload(n: int, seed: int) -> bytes:
    return np.random.RandomState(seed).randint(0, 256, n).astype("uint8").tobytes()


def test_boundaries_respect_min_max_and_cover():
    data = _payload(50_000, 1)
    bounds = cdc_boundaries(data)
    assert bounds[-1] == len(data)
    prev = 0
    for b in bounds[:-1]:  # the final partial chunk may be tiny
        size = b - prev
        assert MIN_SIZE <= size <= MAX_SIZE
        prev = b
    sizes = np.diff([0] + bounds)
    # average chunk size lands in the right order of magnitude
    assert AVG_SIZE / 4 < sizes.mean() < AVG_SIZE * 4


def test_resync_after_prefix_edit():
    """Insert bytes at the FRONT: fixed-size blocks would share zero
    hashes; CDC must resynchronize and share most of the tail."""
    a = _payload(40_000, 2)
    b = _payload(137, 3) + a  # prefix insertion, content otherwise identical

    def chunk_hashes(data):
        out, start = set(), 0
        for end in cdc_boundaries(data):
            out.add(hashlib.sha256(data[start:end]).hexdigest())
            start = end
        return out

    ha, hb = chunk_hashes(a), chunk_hashes(b)
    shared = len(ha & hb) / len(ha)
    assert shared > 0.8  # resync: the untouched tail re-aligns

    # the fixed-size counterfactual: same data, zero shared blocks
    fixed_a = {hashlib.sha256(a[i:i + 1024]).hexdigest()
               for i in range(0, len(a), 1024)}
    fixed_b = {hashlib.sha256(b[i:i + 1024]).hexdigest()
               for i in range(0, len(b), 1024)}
    assert not (fixed_a & fixed_b)


def test_cdc_chunks_operator_and_shared_index(spark):
    common = _payload(20_000, 4)
    rows = [
        ("doc_a", _payload(300, 5) + common),
        ("doc_b", _payload(400, 6) + common),
        ("doc_c", _payload(20_000, 7)),     # unrelated
        ("empty", None),                    # never-drop
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    chunks = cdc_chunks(df)
    pdf = chunks.toPandas()
    assert set(pdf.id) == {"doc_a", "doc_b", "doc_c", "empty"}
    emp = pdf[pdf.id == "empty"]
    assert len(emp) == 1 and emp.n_bytes.iloc[0] == 0
    # offsets tile each payload exactly
    for rid, g in pdf[pdf.id != "empty"].groupby("id"):
        g = g.sort_values("chunk_idx")
        assert g.offset.iloc[0] == 0
        assert (g.offset + g.n_bytes).iloc[:-1].tolist() == g.offset.iloc[1:].tolist()
    # the shared-chunk index pairs doc_a with doc_b, never doc_c
    idx = shared_chunks(chunks).toPandas()
    assert len(idx) > 5
    assert all(set(ids) == {"doc_a", "doc_b"} for ids in idx.ids)
    # determinism across partitionings
    again = cdc_chunks(df.repartition(3)).toPandas()
    key = ["id", "chunk_idx"]
    a = pdf.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
