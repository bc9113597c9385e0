"""The batch extraction pipeline: resumable, metric'd, snapshot-committed.

End-to-end lifecycle (the Spark transposition of the reference's
batch_folder_process.py segment loop, SURVEY §3.2):

    pages ──left_anti(committed urls)──► salted repartition ──mapInPandas──►
    extracted ──append snapshot──► metrics rows ──append──► metrics table

- Resume (north_rule "resumes from the last committed checkpoint"): urls
  already present in committed snapshots are skipped via a broadcast-friendly
  ``left_anti`` join — the analog of the reference's "skip what's done"
  segment idempotency (batch_folder_process.py:819-822,873-876).
- Chunked commits: the input is split into ``chunks`` deterministic url-hash
  buckets, each committed as its own snapshot — the segment granularity at
  which a crash loses at most one chunk of work.
- Metrics (FIXTURES.md §4): per-partition docs parsed / failures /
  bytes in/out — the 识别成功率-and-run-counters analog
  (one_key_process.py:890-894; batch_folder_process.py:977-1028).

At 100 TB: chunks map to crawl segments (or partition predicates pushed to
the Iceberg scan); the anti-join's right side is a url-only projection of the
output table — Bloom-filter-sized, and AQE picks broadcast when it fits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract_op import extract_pages
from .session import EXTRACTED_SCHEMA
from .sources.iceberg_lite import IcebergLiteTable

METRICS_SCHEMA = (
    "run_id string, chunk int, partition_id int, docs_parsed long, "
    "parse_failures long, bytes_in long, bytes_out long, snapshot_id string"
)


@dataclass
class ExtractResult:
    run_id: str
    snapshots: list[str] = field(default_factory=list)
    chunks_done: int = 0
    chunks_skipped: int = 0
    docs: int = 0


def _partition_metrics(extracted: DataFrame, run_id: str, chunk: int) -> DataFrame:
    return extracted.groupBy("partition_id").agg(
        F.count(F.when(~F.col("extract_status").startswith("error"), 1)).alias("docs_parsed"),
        F.count(F.when(F.col("extract_status").startswith("error"), 1)).alias("parse_failures"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
    ).select(
        F.lit(run_id).alias("run_id"),
        F.lit(chunk).alias("chunk"),
        "partition_id",
        "docs_parsed",
        "parse_failures",
        "bytes_in",
        "bytes_out",
    )


def run_extract(
    spark: SparkSession,
    pages: DataFrame,
    table_root: str,
    run_id: str,
    chunks: int = 4,
    num_partitions: int | None = None,
    resume: bool = True,
    fail_chunk_after: int | None = None,
    partition_by: str | None = "content_kind",
    stats_cols: tuple[str, ...] = ("url",),
) -> ExtractResult:
    """Run (or resume) the extraction batch over ``pages``.

    Output snapshots are Hive-partitioned by ``partition_by`` (the stated
    layout column — content kind splits the html/pdf/text branches) and
    record per-entry min/max ``stats_cols`` in the manifest, so downstream
    reads prune committed segments at the manifest level (S4).

    ``fail_chunk_after``: test hook — raise after committing that many chunks
    (crash injection for the resume property test; SURVEY §5).
    """
    from .core.rules import assert_rules_sane

    assert_rules_sane()  # P5: a bad rule table fails the JOB, not the rows
    out_table = IcebergLiteTable(f"{table_root}/extracted")
    metrics_table = IcebergLiteTable(f"{table_root}/metrics")
    res = ExtractResult(run_id=run_id)

    todo = pages
    if resume and out_table.exists():
        committed = out_table.read(spark).select("url")
        todo = pages.join(committed, "url", "left_anti")

    chunk_col = F.pmod(F.xxhash64("url"), F.lit(chunks))
    for chunk in range(chunks):
        chunk_pages = todo.where(chunk_col == chunk)
        extracted = extract_pages(chunk_pages, num_partitions=num_partitions)
        # One pass, cached: data commit + metrics derive from the same result.
        extracted = extracted.persist()
        n = extracted.count()
        if n == 0:
            extracted.unpersist()
            res.chunks_skipped += 1
            continue
        snap = out_table.append(
            extracted,
            properties={"run_id": run_id, "chunk": chunk, "rows": n},
            partition_by=partition_by,
            stats_cols=stats_cols,
        )
        metrics = _partition_metrics(extracted, run_id, chunk).withColumn(
            "snapshot_id", F.lit(snap)
        )
        metrics_table.append(metrics, properties={"run_id": run_id, "chunk": chunk})
        extracted.unpersist()
        res.snapshots.append(snap)
        res.chunks_done += 1
        res.docs += n
        if fail_chunk_after is not None and res.chunks_done >= fail_chunk_after:
            raise RuntimeError(f"injected crash after {res.chunks_done} chunks")
    return res


def read_extracted(spark: SparkSession, table_root: str) -> DataFrame | None:
    return IcebergLiteTable(f"{table_root}/extracted").read(spark, schema=EXTRACTED_SCHEMA)


def read_metrics(spark: SparkSession, table_root: str) -> DataFrame | None:
    return IcebergLiteTable(f"{table_root}/metrics").read(spark, schema=METRICS_SCHEMA)
