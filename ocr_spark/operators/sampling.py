"""Deterministic hash-based sampling — the training-data downsampling op.

Corpus mixing needs per-stratum rates (downweight boilerplate-heavy
languages, upweight rare ones) that are REPRODUCIBLE: the same row set on
every run, every partitioning, every engine — which rules out RNG-based
``df.sample``/``sampleBy`` (seed + partition dependent, and not replayable
in SQL). Instead each row's key hashes to a bucket in [0, DENOM) via the
same md5-derived 32-bit base hash the minhash family uses (portable to
DuckDB verbatim), and a row is kept when ``bucket < rate * DENOM``.

Properties the pipeline relies on:
- pure map-side filter: no shuffle, no state, linear scale-out;
- nested samples: rate 0.1 is a subset of rate 0.5 (same hash, smaller
  cutoff) — growing a sample never resamples;
- salt decorrelates: different salts give independent samples over the
  same keys (held-out splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_DENOM = 10_000


def sample_bucket(key_col, salt: str = "sample") -> Column:
    """Deterministic bucket in [0, SAMPLE_DENOM) from the row key + salt.
    SQL twin: ('0x' || substr(md5(key || ':' || salt), 1, 8))::BIGINT % 10000.
    """
    key = F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(SAMPLE_DENOM))


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash."""
    return df.where(sample_bucket(key_col, salt) < int(rate * SAMPLE_DENOM))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0, stratum_col: str = "lang",
                      key_col: str = "doc_id", salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum values to
    keep fractions; unlisted strata keep ``default_rate``. One map-side
    CASE + filter — the per-language corpus mixing shape."""
    cutoff = F.lit(int(default_rate * SAMPLE_DENOM))
    for value, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * SAMPLE_DENOM))
        ).otherwise(cutoff)
    return df.where(sample_bucket(key_col, salt) < cutoff)


def soft_sample(df: DataFrame, weight_col: str, key_col: str = "doc_id",
                salt: str = "soft", out_col: str = "kept") -> DataFrame:
    """Quality-weighted (soft) sampling — the DCLM/FineWeb-Edu move of
    keeping a document with probability equal to its quality score
    instead of thresholding: a hard cutoff throws away every borderline
    document and keeps every barely-passing one, while importance
    resampling preserves the score DISTRIBUTION (the kept corpus's
    expected composition matches the weights exactly). Keep iff
    bucket(key) < clamp(weight, 0, 1) * DENOM — the same portable md5
    bucket as ``hash_sample``, so the draw is reproducible across runs,
    partitionings, and engines, and raising a document's score can only
    ever flip it drop->keep (monotone, never resampled). NULL weights
    clamp to 0 (dropped — an unscored doc has no business in a
    score-weighted corpus, and the flag row still comes back). Pure
    map-side projection: zero shuffle, streaming-safe. Returns the input
    + (sample_bucket, kept)."""
    w = F.least(
        F.greatest(F.coalesce(F.col(weight_col), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    b = sample_bucket(key_col, salt)
    return df.withColumn("sample_bucket", b).withColumn(
        out_col, b < (w * SAMPLE_DENOM).cast("long")
    )


def leakage_safe_split(df: DataFrame, group_col: str, eval_frac: float = 0.1,
                       salt: str = "split", out_col: str = "split") -> DataFrame:
    """Train/eval assignment at GROUP granularity: every row of a group
    (canonically, a host) lands in the same split, so near-duplicate pages
    from one site can never straddle the train/eval boundary (the
    contamination vector document-level random splits leave open).
    The verdict hashes the group key — a pure map-side projection, zero
    shuffle, reproducible across runs/partitionings/engines, and nested
    the same way the sampler is (growing eval_frac only moves groups
    train->eval, never reshuffles)."""
    cut = int(eval_frac * SAMPLE_DENOM)
    return df.withColumn(
        out_col,
        F.when(sample_bucket(group_col, salt) < cut, F.lit("eval"))
        .otherwise(F.lit("train")),
    )


def cap_per_group(df: DataFrame, group_col: str, k: int,
                  id_col: str = "doc_id", salt: str = "hostcap") -> DataFrame:
    """Deterministic per-group downsampling cap: keep at most ``k`` rows
    per group (the over-represented-host control every crawl mix needs —
    without it one mega-host dominates whatever it touches). Which rows
    survive is a pure function of (id, salt): rows rank by the same
    portable md5 bucket ``sample_bucket`` uses (ties by id), and rank > k
    drops. One exchange on the group key; the per-group sort is bounded
    by group size. Returns the input rows + (cap_rank, kept)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(id_col, salt), F.col(id_col)
    )
    return df.withColumn("cap_rank", F.row_number().over(w)).withColumn(
        "kept", F.col("cap_rank") <= k
    )
