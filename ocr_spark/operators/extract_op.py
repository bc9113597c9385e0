"""The distributed parse stage: Arrow-batched main-content extraction.

This is THE heavy operator — the analog of the reference's OCR phase (86% of
wall, SURVEY §4) — expressed per ``input_hint`` as vectorized pandas/Arrow
UDFs with no per-row Python on the JVM side:

- column pruning up front (only url/html/text/lang cross the Arrow boundary;
  the analog of ROI-only processing, one_key_process.py:476);
- deterministic salted repartition before the parse (north_rule; the analog
  of the serial split pre-stage, batch_folder_process.py:824-847, but as a
  cheap shuffle instead of a serial phase);
- ``mapInPandas`` iterator: any per-task setup happens once before the batch
  loop (the reference's engine-per-worker amortization,
  one_key_process.py:672-674) — our parser is stateless pure Python, so the
  amortized object is just the imported module;
- failures never drop rows: each document yields exactly one output row with
  ``extract_status`` (P7 contract, one_key_process.py:576-582);
- ``partition_id`` recorded per row for per-partition lineage/metrics
  (the 识别成功率/per-segment-log analog, one_key_process.py:890-894).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core.extract import (
    MARKDOWN_COLUMNS,
    extract_markdown_record,
    extract_record,
    extract_span_rows,
    SPAN_COLUMNS,
)
from ..plans.partitioning import ranged_repartition, salted_repartition
from ..session import EXTRACTED_SCHEMA

INPUT_COLS = ("url", "html", "text", "lang")

SPANS_SCHEMA = (
    "url string, block_idx int, span_start int, span_end int, "
    "block_text string, heading boolean"
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Per-task prologue (E2 analog): resolve TaskContext once, reuse across
    # all Arrow batches of this task.
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    cols = ("url", "text", "extract_status", "content_kind", "n_blocks", "bytes_in", "bytes_out")
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        texts = pdf["text"].tolist()
        langs = pdf["lang"].tolist()
        out: dict[str, list] = {c: [] for c in cols}
        appends = [out[c].append for c in cols]
        for i in range(len(urls)):
            t = texts[i]
            r = extract_record(
                urls[i], htmls[i], t if isinstance(t, str) else None, langs[i]
            )
            for app, c in zip(appends, cols):
                app(r[c])
        frame = pd.DataFrame(out, copy=False)
        frame["partition_id"] = pid
        yield frame


def _bytes_conf(spark, key: str, default: int) -> int:
    """Parse a Spark byte-size conf ('134217728b', '128m', plain int)."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
    mult = units.get(raw[-1:], None)
    if mult is not None and raw[:-1].isdigit():
        return int(raw[:-1]) * mult
    return int(raw) if raw.isdigit() else default


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Spark file-source bin-packing estimate: effective bytes =
    sum(file size + openCostInBytes), partitions ~= ceil(effective /
    maxPartitionBytes). Returns 0 (=> caller shuffles) when the input is
    not a file scan or sizes are unreachable."""
    import math
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    spark = df.sparkSession
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return 0  # remote store: sizes not reachable driver-side here
        try:
            total += os.path.getsize(p.path) + open_cost
        except OSError:
            return 0
    return max(1, math.ceil(total / max(max_pb, 1)))


def extract_pages(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 16,
    repartition: bool | str = "auto",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> extracted table.

    Returns one row per input row with schema ``EXTRACTED_SCHEMA``.

    ``repartition``: True forces the salted host-hash shuffle (use for
    host-clustered crawl input — the north_rule skew case); "range" uses
    ``ranged_repartition`` instead (host-contiguous partitions: better sink
    compression and shuffle-free per-host downstream at the cost of a
    sampling pass); False trusts the input partitioning; "auto" shuffles
    only when the input has fewer partitions than the cluster can run in
    parallel (uniform, well-split input skips a pointless shuffle of the
    full payload bytes).
    """
    pruned = df.select(*INPUT_COLS)  # column pruning BEFORE the Arrow boundary
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if num_partitions is None:
        num_partitions = parallelism * 2
    if repartition == "auto":
        # Estimate the SCAN partition count the way Spark's file source
        # bins files — ceil(sum(size + openCost) / maxPartitionBytes) —
        # and shuffle only when that can't fill the task slots. Raw file
        # COUNT measures the wrong quantity in both directions: many tiny
        # files bin-pack into few scan partitions (need the shuffle even
        # though n_files >= slots), and one huge splittable parquet file
        # yields many partitions (shuffle pointless even though
        # n_files == 1). Metadata-only probe: paths + local sizes, no
        # DataFrame->RDD conversion, no job. Non-file sources (empty
        # inputFiles) or unreachable sizes shuffle — the safe default.
        repartition = _estimated_scan_partitions(df) < parallelism
    if repartition == "range":
        pruned = ranged_repartition(pruned, num_partitions)
    elif repartition:
        pruned = salted_repartition(pruned, num_partitions, salt_buckets=salt_buckets)
    return pruned.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)


MARKDOWN_SCHEMA = (
    "url string, markdown string, extract_status string, "
    "content_kind string, n_blocks int"
)


def _markdown_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = pdf["text"].tolist()
        rows = [
            extract_markdown_record(
                url, html, t if isinstance(t, str) else None, lang
            )
            for url, html, t, lang in zip(
                pdf["url"].tolist(), pdf["html"].tolist(), texts,
                pdf["lang"].tolist(),
            )
        ]
        yield pd.DataFrame.from_records(rows, columns=list(MARKDOWN_COLUMNS))


def extract_page_markdown(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 16,
    repartition: bool | str = "auto",
) -> DataFrame:
    """pages -> markdown records (MARKDOWN_SCHEMA): the structured-output
    twin of :func:`extract_pages` — identical keep/drop decisions and
    partitioning policy, but headings/list items/quotes render as markdown
    instead of flattening (core.markdown). One row per input row, P7."""
    pruned = df.select(*INPUT_COLS)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if num_partitions is None:
        num_partitions = parallelism * 2
    if repartition == "auto":
        repartition = _estimated_scan_partitions(df) < parallelism
    if repartition == "range":
        pruned = ranged_repartition(pruned, num_partitions)
    elif repartition:
        pruned = salted_repartition(pruned, num_partitions, salt_buckets=salt_buckets)
    return pruned.mapInPandas(_markdown_batches, schema=MARKDOWN_SCHEMA)


def _span_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = pdf["text"].tolist()
        rows: list[dict] = []
        for url, html, t, lang in zip(
            pdf["url"].tolist(), pdf["html"].tolist(), texts, pdf["lang"].tolist()
        ):
            rows.extend(
                extract_span_rows(url, html, t if isinstance(t, str) else None, lang)
            )
        yield pd.DataFrame.from_records(rows, columns=list(SPAN_COLUMNS))


def extract_page_spans(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 16,
    repartition: bool | str = "auto",
) -> DataFrame:
    """pages -> per-block span rows (SPANS_SCHEMA): the span-emitting twin
    of :func:`extract_pages` (1:N rows; N = kept blocks, exactly 1 NULL-span
    row for non-HTML/failed/empty docs so no url ever disappears). Same
    partitioning policy and Arrow batch shape as the text path; the output
    carries (int, int) spans + block text only, so the fan-out rows are
    narrow — at 100 TB the span table is a small fraction of the input."""
    pruned = df.select(*INPUT_COLS)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if num_partitions is None:
        num_partitions = parallelism * 2
    if repartition == "auto":
        repartition = _estimated_scan_partitions(df) < parallelism
    if repartition == "range":
        pruned = ranged_repartition(pruned, num_partitions)
    elif repartition:
        pruned = salted_repartition(pruned, num_partitions, salt_buckets=salt_buckets)
    return pruned.mapInPandas(_span_batches, schema=SPANS_SCHEMA)
