"""Hashed n-gram linear quality classifier (fastText-style scoring).

The modern corpus-quality gate is a learned linear classifier over hashed
token n-grams (fastText architecture): FineWeb-Edu, DCLM, and the CCNet
lineage all filter or bucket documents by such a score. This operator is
the SERVING side of that design, Spark-first:

    tokens -> unigram+bigram features -> feature-hash bucket (portable
    md5-derived, the engine's replayable hash family) -> weight lookup ->
    mean + bias -> sigmoid score -> keep/drop.

Two weight sources:
- ``weights_df`` (bucket: long, weight: double): the PRODUCTION path — a
  trained model exported as a table, applied via a broadcast hash join
  (weight tables are n_buckets rows, tiny next to the corpus; plan-pinned).
  Buckets absent from the table contribute 0.0 (sparse model convention).
- ``weights_df=None``: a seeded SYNTHETIC model — weight(bucket) is a pure
  md5 expression of the bucket id in [-0.5, 0.5) — so tests and the DuckDB
  twin replay scoring end-to-end without shipping a model artifact.

Scale shape: one explode (feature stream, (id, long) rows), one broadcast
join (production mode; synthetic mode is join-free), one hash aggregation
back to documents. No Python, no windows, no driver state. At 100 TB the
explode dominates and is embarrassingly parallel; the aggregate is the
same map-side-combine groupBy every token op in this engine uses.

Determinism/oracle contract: tokens = shared TOKEN_PATTERN over
lower(text); features = unigrams ++ adjacent bigrams joined with one
space; bucket = first-32-bits-of-md5(seed || ':' || feat) mod n_buckets;
score = round(sigmoid(mean_weight + bias), 4) with the ROUNDED value used
for the keep test (both engines compare identical 4-dp values). NULL text
=> zero features => score = round(sigmoid(bias), 4) — the row is kept in
the output either way (P7 discipline: never silently dropped).

Reference analog: the per-field confidence gate over recognition output
(one_key_process.py:576-607 keeps/empties fields by model confidence);
here the confidence model is explicit and corpus-scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import TOKEN_PATTERN

DEFAULT_N_BUCKETS = 1 << 18
# bias 0 keeps the synthetic model CALIBRATED: mean hashed weight is ~0 by
# construction, so the default gate splits on its sign instead of dropping
# (or keeping) everything — the non-vacuity discipline every gate in this
# engine follows. A trained weights_df ships its own bias.
DEFAULT_BIAS = 0.0
DEFAULT_THRESHOLD = 0.5


def _md5_long(c: Column) -> Column:
    """First 32 bits of md5 as a long — the portable hash family
    (DuckDB: ('0x' || substr(md5(x), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def feature_bucket(feat: Column, n_buckets: int, seed: str) -> Column:
    return F.pmod(_md5_long(F.concat(F.lit(seed + ":"), feat)), F.lit(n_buckets))


def synthetic_weight(bucket: Column, seed: str) -> Column:
    """Pure-expression model: weight(bucket) in [-0.5, 0.5), uniform-ish,
    deterministic, replayable in SQL."""
    h = _md5_long(F.concat(F.lit(seed + ":w:"), bucket.cast("string")))
    return (h % 10000).cast("double") / 10000.0 - 0.5


def hashed_feature_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
    seed: str = "qclf-1",
) -> DataFrame:
    """(id_col, bucket) rows: the unigram+adjacent-bigram hashed feature
    stream shared by the classifier gate and the DSIR importance weights.
    ``explode_outer`` keeps empty/NULL-text documents as one NULL-bucket
    row, so no document ever vanishes from a downstream aggregate."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        F.col(id_col),
        F.explode_outer(F.concat(toks, bigrams)).alias("feat"),
    ).select(
        id_col,
        F.when(
            F.col("feat").isNotNull(),
            feature_bucket(F.col("feat"), n_buckets, seed),
        ).alias("bucket"),
    )


def classifier_score(
    df: DataFrame,
    weights_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
    seed: str = "qclf-1",
    bias: float = DEFAULT_BIAS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """(id_col, n_feats, score, kept): sigmoid(mean hashed-feature weight
    + bias) per document. Every input row produces exactly one output row."""
    feats = hashed_feature_stream(df, text_col, id_col, n_buckets, seed)

    if weights_df is None:
        weighted = feats.select(
            id_col,
            "bucket",
            F.when(
                F.col("bucket").isNotNull(), synthetic_weight(F.col("bucket"), seed)
            ).alias("weight"),
        )
    else:
        # sparse model: absent buckets weigh 0.0; broadcast — the weight
        # table is bounded by n_buckets, the corpus is not
        weighted = feats.join(
            F.broadcast(weights_df.withColumnRenamed("weight", "_w")),
            on="bucket",
            how="left",
        ).select(
            id_col,
            "bucket",
            F.when(F.col("bucket").isNotNull(), F.coalesce(F.col("_w"), F.lit(0.0))).alias(
                "weight"
            ),
        )

    agg = weighted.groupBy(id_col).agg(
        F.count("bucket").alias("n_feats"),
        F.coalesce(F.sum("weight"), F.lit(0.0)).alias("w_sum"),
    )
    mean_w = F.when(
        F.col("n_feats") > 0, F.col("w_sum") / F.col("n_feats")
    ).otherwise(F.lit(0.0))
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(mean_w + F.lit(bias)))), 4
    )
    return agg.select(
        id_col,
        F.col("n_feats").cast("long").alias("n_feats"),
        score.alias("score"),
        (score >= threshold).alias("kept"),
    )
