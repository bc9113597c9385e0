"""Quality filter rules (each reason label witnessed) and bigram LM
scoring (ordering, edge cases, determinism)."""

import math

import pytest

from ocr_spark.operators.quality import bigram_lm_scores, quality_filter


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_quality_filter_reason_labels(spark):
    rows = [
        (0, " ".join(f"tok{i}" for i in range(30))),        # kept
        (1, "just five words right here"),                  # too_short (5)
        (2, " ".join(["echo"] * 40)),                       # repetitive (ratio 1.0)
        (3, " ".join(["a"] * 30)),                          # word_len (mean 1.0) — checked before repetitive
        (4, " ".join(["!!!!####"] * 25)),                   # symbol_heavy (mean len 8 passes word_len)
        (5, ""),                                            # empty -> too_short
    ]
    out = _rows(quality_filter(spark.createDataFrame(rows, "doc_id long, text string")))
    assert out[0]["kept"] and out[0]["drop_reason"] is None
    assert out[1]["drop_reason"] == "too_short"
    assert out[2]["drop_reason"] == "repetitive" and out[2]["top_word_ratio"] == 1.0
    assert out[3]["drop_reason"] == "word_len"
    assert out[4]["drop_reason"] == "symbol_heavy"
    assert out[5]["drop_reason"] == "too_short" and out[5]["n_words"] == 0
    assert not any(out[i]["kept"] for i in (1, 2, 3, 4, 5))


def test_quality_filter_measurements(spark):
    df = spark.createDataFrame([(7, "aa bbb aa")], "doc_id long, text string")
    got = _rows(quality_filter(df))[7]
    assert got["n_words"] == 3
    assert got["mean_word_len"] == pytest.approx((2 + 2 + 3) / 3, abs=1e-4)
    assert got["top_word_ratio"] == pytest.approx(2 / 3, abs=1e-4)
    assert got["symbol_ratio"] == 0.0


def test_bigram_lm_ordering_and_edges(spark):
    # 'a b' appears constantly in the corpus; 'q z' appears once.
    rows = [(i, "a b a b a b a b") for i in range(8)] + [
        (100, "a b a b a b a b"),   # all high-frequency transitions
        (101, "q z q q z a"),       # rare transitions -> lower score
        (102, "solo"),              # single token -> no bigrams
        (103, ""),                  # empty
    ]
    out = _rows(bigram_lm_scores(spark.createDataFrame(rows, "doc_id long, text string")))
    assert out[100]["lm_logprob"] > out[101]["lm_logprob"]
    assert out[102]["n_bigrams"] == 0 and out[102]["lm_logprob"] is None
    assert out[103]["n_bigrams"] == 0 and out[103]["lm_logprob"] is None
    assert out[100]["n_bigrams"] == 7


def test_bigram_lm_exact_value(spark):
    """Hand-computed check on a 2-doc corpus: vocabulary {x, y},
    unigram counts x=3, y=1; bigram counts (x,x)=1, (x,y)=1."""
    rows = [(0, "x x y"), (1, "x")]
    out = _rows(bigram_lm_scores(spark.createDataFrame(rows, "doc_id long, text string")))
    a = 0.4
    v = 2
    lp_xx = math.log((1 + a) / (3 + a * v))
    lp_xy = math.log((1 + a) / (3 + a * v))
    assert out[0]["lm_logprob"] == pytest.approx(round((lp_xx + lp_xy) / 2, 4), abs=1e-4)
    assert out[0]["n_bigrams"] == 2


def test_quality_filter_partitioning_invariance(spark):
    rows = [(i, f"doc {i} " + " ".join(f"w{j}" for j in range(i % 30))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(quality_filter(df).collect(), key=lambda r: r["doc_id"])
    b = sorted(quality_filter(df.repartition(7)).collect(), key=lambda r: r["doc_id"])
    assert a == b


def test_compression_ratio_orders_pathologies(spark):
    """Repetitive < natural < random in compressibility."""
    import random

    from ocr_spark.operators.quality import compression_ratio

    rnd = random.Random(3)
    rows = [
        (0, "repeat this phrase " * 200),
        (1, " ".join(f"natural word{i} prose sentence {i % 17}" for i in range(150))),
        (2, "".join(chr(rnd.randrange(33, 1000)) for _ in range(2000))),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    assert got[0] < got[1] < got[2]
    assert got[0] < 0.05          # repetition collapses
    assert got[2] > 0.5           # randomness resists
    assert got[3] == 1.0          # empty -> neutral


def test_compression_ratio_deterministic(spark):
    from ocr_spark.operators.quality import compression_ratio

    df = spark.createDataFrame(
        [(i, f"doc {i} body " * (i + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(compression_ratio(df).collect())
    b = sorted(compression_ratio(df.repartition(7)).collect())
    assert a == b
