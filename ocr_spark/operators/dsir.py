"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

The published method for selecting pretraining data that *matches a target
distribution* (e.g. Wikipedia/books-like text) out of a raw crawl: fit two
bag-of-hashed-ngram distributions — target and raw — and weight every raw
document by its hashed-ngram log-likelihood ratio, then sample without
replacement proportionally to the weights (Gumbel-top-k). Complements the
classifier gate (operators/classifier.py): the classifier scores *absolute*
quality with a trained model, DSIR needs only an in-corpus target SAMPLE.

Spark shape (all expression-level, no Python):

  feature stream   (id, bucket) — the classifier's shared unigram+bigram
                   md5 hashed stream (classifier.hashed_feature_stream)
  count tables     groupBy(bucket) on raw and target streams — at most
                   ``n_buckets`` rows each (default 8192): broadcast class
  log-ratio table  raw LEFT JOIN target on bucket + two broadcast 1-row
                   totals; Laplace-smoothed ln(p_tgt(b)) - ln(p_raw(b))
  doc weights      feature stream ⋈ broadcast(ratio) -> groupBy(id) sum
  resample         Gumbel-top-k: key = log_weight + Gumbel(md5-uniform(id)),
                   global top-k via orderBy+limit (TakeOrderedAndProject —
                   per-partition heads, no single-partition sort)

100 TB verdict: the one-shot ``dsir_sample`` scans the corpus feature
stream twice — once to fit the raw bucket counts, once to apply the
weights — each time as (id, long) rows with map-side-combined aggregates;
every join against it is a broadcast of an n_buckets-bounded table. The
deploy path is the fit/apply split: ``dsir_log_ratios`` once (target-
distribution state, not per-batch work), persist the tiny table, then
``dsir_apply`` per ingest batch = ONE scan of that batch. The target
sample is small by definition (it's a human-curated exemplar set).

Determinism/oracle: md5 bucket hashing, md5-uniform Gumbel noise, ln on
IEEE doubles, weights rounded to 4 dp BEFORE the top-k ordering with id as
tie-break — so DuckDB replays selection exactly (twin:
``__spark_entry__._dsir_oracle``).

Reference analog: the rule-table-driven choice of which regions carry
signal (one_key_process.py:1146-1165) — here the "rule table" is estimated
from a target exemplar corpus instead of hand-written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classifier import _md5_long, hashed_feature_stream

DSIR_N_BUCKETS = 8192
DSIR_ALPHA = 0.5     # Laplace smoothing mass per bucket
_GUMBEL_RES = 1_000_000


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_N_BUCKETS,
    seed: str = "dsir-1",
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(bucket, log_ratio): ln(p_target(b)) - ln(p_raw(b)) over the hashed
    feature space, Laplace-smoothed so buckets unseen in the target still
    get finite mass. At most ``n_buckets`` rows — the broadcast side of
    every downstream join. Buckets absent from the RAW stream are omitted:
    no raw document can reference them, so they can never be looked up."""
    raw_feats = hashed_feature_stream(raw, text_col, id_col, n_buckets, seed)
    tgt_feats = hashed_feature_stream(target, text_col, id_col, n_buckets, seed)
    raw_counts = (
        raw_feats.where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_raw"))
    )
    tgt_counts = (
        tgt_feats.where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    raw_tot = raw_counts.agg(F.sum("c_raw").alias("t_raw"))
    tgt_tot = tgt_counts.agg(F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("t_tgt"))
    return (
        raw_counts.join(tgt_counts, "bucket", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(alpha))
                    / (F.col("t_tgt") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.col("c_raw") + F.lit(alpha))
                    / (F.col("t_raw") + F.lit(alpha * n_buckets))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_apply(
    raw: DataFrame,
    ratios: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_N_BUCKETS,
    seed: str = "dsir-1",
) -> DataFrame:
    """The APPLY half of DSIR against an already-fitted log-ratio table —
    the deploy-scale entry point: fit ``dsir_log_ratios`` once (it is
    target-distribution state, not per-batch work), persist the at-most-
    ``n_buckets``-row table, and resample every ingest batch with a SINGLE
    scan of that batch's feature stream (the one-shot ``dsir_sample``
    scans its corpus twice: once to fit raw counts, once here). Same
    frozen-artifact pattern as similarity.ivf_assign. ``ratios`` must
    carry (bucket, log_ratio) and must have been fitted with the same
    ``n_buckets``/``seed`` (bucket ids are hash positions — a mismatch is
    a different feature space)."""
    feats = hashed_feature_stream(raw, text_col, id_col, n_buckets, seed)
    weights = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.avg("log_ratio").alias("w_raw"),
        )
    )
    u = (
        F.pmod(
            _md5_long(F.concat(F.lit(seed + ":g:"), F.col(id_col).cast("string"))),
            F.lit(_GUMBEL_RES),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_RES))
    gumbel = -F.log(-F.log(u))
    return (
        raw.select(id_col)
        .distinct()
        .join(weights, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.round(F.coalesce("w_raw", F.lit(0.0)), 4).alias("log_weight"),
            F.round(F.coalesce("w_raw", F.lit(0.0)) + gumbel, 4).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_N_BUCKETS,
    seed: str = "dsir-1",
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Select ``k`` documents from ``raw`` by importance resampling toward
    ``target``'s hashed-ngram distribution (fit + apply in one shot).
    Returns (id_col, n_feats, log_weight, sample_key) — the k selected
    rows in descending sample_key order.

    log_weight = mean feature log-ratio (mean, not sum: document LENGTH
    must not dominate target-affinity — the paper normalizes likewise).
    sample_key = round(log_weight + Gumbel(u_id), 4) with u_id the
    md5-uniform of the document id: Gumbel-top-k == sampling without
    replacement proportional to exp(log_weight). Rounding to 4 dp before
    the ordering (id as tie-break) makes the selected SET identical across
    engines. Zero-feature documents draw key from weight 0 — eligible,
    never silently dropped.

    For repeated ingest batches, fit :func:`dsir_log_ratios` once and call
    :func:`dsir_apply` per batch instead — one corpus scan per batch."""
    ratios = dsir_log_ratios(raw, target, text_col, id_col, n_buckets, seed, alpha)
    return dsir_apply(raw, ratios, k, text_col, id_col, n_buckets, seed)
