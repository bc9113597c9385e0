"""Explicit partitioning for the heavy parse stage.

Why: real crawl tables arrive host-clustered (WARC segments group by
domain), and per-host page counts are Zipf-skewed — the analog of the
reference's directory-granularity stragglers (coarse ProcessPool tasks over
folders, one_key_process.py:728-743; SURVEY §4 "skew" row). A naive
partition-by-input-split would hand one executor all of the top host.

Strategy (north_rule: "salt-hashed by url host"): partition key =
``xxhash64(host, salt_bucket)`` where ``salt_bucket = pmod(xxhash64(url), K)``.
- Pages of one host spread across exactly K partitions (bounded fan-out keeps
  host locality partially intact for downstream per-host ops),
- any single host is capped at ~K/N of the cluster, and
- the mapping is deterministic (no rand()), so re-runs produce identical
  partition membership — required for resumable, replayable lineage.

At 100 TB / 1000 executors: choose num_partitions ≈ 2-3× total cores and
K ≈ 16-64; AQE coalesces small partitions after the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_host(col="url"):
    """Extract the host from a url column (JVM-side, codegen-friendly)."""
    return F.parse_url(F.col(col) if isinstance(col, str) else col, F.lit("HOST"))


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    url_col: str = "url",
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition by salt-hashed url host (deterministic skew-breaker)."""
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    key = F.xxhash64(url_host(url_col), salt)
    return df.repartition(num_partitions, key)


def ranged_repartition(
    df: DataFrame,
    num_partitions: int,
    url_col: str = "url",
) -> DataFrame:
    """Repartition-by-range on (host, url) — the north_star's alternative
    pre-parse layout to the salted hash shuffle.

    RangePartitioner samples the composite key, so range bounds can cut
    INSIDE a hot host: the top crawl domain spreads over several adjacent
    partitions (skew still bounded) while every partition holds contiguous
    host runs. Choose this over ``salted_repartition`` when the stage's
    OUTPUT layout matters more than maximal spread: host-sorted partitions
    RLE-compress host-derived columns in the parquet sink, serve per-host
    downstream ops (politeness caps, host metrics) without a second
    shuffle, and give the metrics table a readable host range per
    partition. The hash path remains the default for pure parse
    throughput (no sampling pass, no sort).

    Skew bound differs from the salted path: a single host larger than
    ~rows/num_partitions still splits (url is the tie-breaker key), but
    its chunks stay adjacent rather than scattering cluster-wide.

    Caveat: RangePartitioner's reservoir sample is seeded per-RDD, so
    partition MEMBERSHIP can differ between runs (results never do — no
    row is dropped or duplicated). When replayable per-partition lineage
    matters (the resume/metrics contract), use ``salted_repartition``,
    whose hash key is a pure function of the row.
    """
    return df.repartitionByRange(num_partitions, url_host(url_col), F.col(url_col))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED parquet table (external, at ``path``):
    rows are hash-clustered into ``num_buckets`` files per partition by
    ``bucket_cols`` and optionally sorted within each bucket.

    Why at 100 TB: two tables bucketed the same way on the same key join
    with ZERO exchange — Spark's bucketing metadata proves co-location, so
    the SortMergeJoin reads both sides' buckets pairwise instead of
    shuffling 100 TB twice (the join plan carries no Exchange; pinned in
    tests/test_plans.py). Same for repeated aggregations on the bucket
    key. This is the pre-shuffle-once-reuse-forever layout the prompt's
    "bucketing for co-located joins" calls for: pay one clustered write at
    ingest, then every downstream self-join / fact-dim join on that key is
    exchange-free. The salted parse shuffle handles SKEW during the heavy
    stage; bucketing handles REUSE across stages — complementary, not
    competing.

    Notes: ``saveAsTable`` is required (bucket metadata lives in the
    catalog, not the files); ``path`` makes it an external table so the
    data outlives catalog churn; readers must enable
    ``spark.sql.sources.bucketing.enabled`` (default true).
    """
    writer = df.write.format("parquet").option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    writer.sortBy(*(sort_cols or bucket_cols)).mode(
        "overwrite"
    ).saveAsTable(table_name)
