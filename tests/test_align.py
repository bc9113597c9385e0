"""Gale-Church sentence alignment (the Arrow cogroup path)."""

from ocr_spark.operators.align import _align_lengths, align_sentences


def test_dp_identity_alignment():
    beads = _align_lengths([40, 50, 60], [41, 49, 62])
    assert [(b[0], b[1], b[2], b[3]) for b in beads] == [
        (0, 1, 0, 1), (1, 2, 1, 2), (2, 3, 2, 3)
    ]


def test_dp_merge_bead():
    # B's middle sentence is A's two middles merged: expect a 2-1 bead
    beads = _align_lengths([40, 25, 26, 40], [41, 52, 39])
    assert (1, 3, 1, 2) in {(b[0], b[1], b[2], b[3]) for b in beads}


def test_dp_empty_side_is_insertion_chain():
    beads = _align_lengths([30, 30], [])
    assert [(b[0], b[1], b[2], b[3]) for b in beads] == [(0, 1, 0, 0), (1, 2, 0, 0)]
    assert _align_lengths([], []) == []


def test_dp_deterministic():
    a, b = [37, 81, 22, 64, 55], [40, 78, 90, 52]
    assert _align_lengths(a, b) == _align_lengths(a, b)


def test_align_sentences_cogroup(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha beta gamma delta. Epsilon zeta eta! Theta iota kappa?"),
            (2, "Alpho bete gamme delte. Epsilon zete ete! Thete iote kappe?"),
            (3, "One short. A much longer second sentence follows here."),
            (4, "One shorter. A much longer second sentence follows here too."),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(10, 1, 2), (11, 3, 4)], "pair_id long, doc_a long, doc_b long"
    )
    out = align_sentences(pairs, docs).collect()
    by_pair = {}
    for r in out:
        by_pair.setdefault(r["pair_id"], []).append(
            (r["a_start"], r["a_end"], r["b_start"], r["b_end"])
        )
    # near-identical 3-sentence docs align 1-1 three times
    assert sorted(by_pair[10]) == [(0, 1, 0, 1), (1, 2, 1, 2), (2, 3, 2, 3)]
    assert sorted(by_pair[11]) == [(0, 1, 0, 1), (1, 2, 1, 2)]


def test_bitext_records_export(spark):
    from ocr_spark.operators.align import bitext_records

    docs = spark.createDataFrame(
        [
            (1, "Alpha beta gamma delta. Epsilon zeta eta! Theta iota kappa?"),
            (2, "Alpho bete gamme delte. Epsilon zete ete! Thete iote kappe?"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(10, 1, 2)], "pair_id long, doc_a long, doc_b long")
    beads = align_sentences(pairs, docs)
    recs = sorted(
        bitext_records(pairs, docs, beads).collect(), key=lambda r: r["a_start"]
    )
    assert len(recs) == 3
    assert recs[0]["a_text"] == "Alpha beta gamma delta."
    assert recs[0]["b_text"] == "Alpho bete gamme delte."
    assert recs[2]["a_text"].startswith("Theta")
    assert recs[2]["b_text"].startswith("Thete")


def test_bitext_records_empty_side_bead(spark):
    from ocr_spark.operators.align import bitext_records

    docs = spark.createDataFrame(
        [(1, "Lone sentence here."), (2, "")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(7, 1, 2)], "pair_id long, doc_a long, doc_b long")
    beads = align_sentences(pairs, docs)
    recs = bitext_records(pairs, docs, beads).collect()
    assert len(recs) == 1
    assert recs[0]["a_text"] == "Lone sentence here." and recs[0]["b_text"] == ""


def test_align_plan_uses_cogroup(spark):
    import contextlib
    import io

    docs = spark.createDataFrame([(1, "A. B."), (2, "A. B.")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 1, 2)],
                                  "pair_id long, doc_a long, doc_b long")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        align_sentences(pairs, docs).explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in plan  # the Arrow cogroup node


def test_interior_empty_segments_reindex(spark):
    """A split pattern producing INTERIOR empty segments (here '--'
    delimiters back to back) must not desynchronize DP indices from the
    join indices: both streams re-index over the empty-filtered sequence
    (ADVICE r4 align.py item), so beads still attach to the right text."""
    from ocr_spark.operators.align import bitext_records

    # '--' split yields ['Alpha beta gamma', '', 'Delta epsilon zeta',
    # 'Eta theta iota'] for doc 1: an INTERIOR empty at raw position 1.
    docs = spark.createDataFrame(
        [
            (1, "Alpha beta gamma----Delta epsilon zeta--Eta theta iota"),
            (2, "Alpho bete gammo--Delto epsilon zeto--Eto theto ioto"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(5, 1, 2)], "pair_id long, doc_a long, doc_b long"
    )
    beads = align_sentences(pairs, docs, split_pattern="--")
    recs = sorted(
        bitext_records(pairs, docs, beads, split_pattern="--").collect(),
        key=lambda r: r["a_start"],
    )
    # three near-identical-length segments a side -> three 1-1 beads,
    # and each bead's text comes from the MATCHING compacted position
    assert [(r["a_text"], r["b_text"]) for r in recs] == [
        ("Alpha beta gamma", "Alpho bete gammo"),
        ("Delta epsilon zeta", "Delto epsilon zeto"),
        ("Eta theta iota", "Eto theto ioto"),
    ]
