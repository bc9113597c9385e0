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

from ..core.extract import extract_record
from ..plans.partitioning import salted_repartition
from ..session import EXTRACTED_SCHEMA

INPUT_COLS = ("url", "html", "text", "lang")


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


def extract_pages(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 16,
    repartition: bool | str = "auto",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> extracted table.

    Returns one row per input row with schema ``EXTRACTED_SCHEMA``.

    ``repartition``: True forces the salted host-hash shuffle (use for
    host-clustered crawl input — the north_rule skew case); False trusts the
    input partitioning; "auto" shuffles only when the input has fewer
    partitions than the cluster can run in parallel (uniform, well-split
    input skips a pointless shuffle of the full payload bytes).
    """
    pruned = df.select(*INPUT_COLS)  # column pruning BEFORE the Arrow boundary
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if num_partitions is None:
        num_partitions = parallelism * 2
    if repartition == "auto":
        # file-count probe (no DataFrame->RDD conversion plan): a file scan
        # with fewer files than task slots can't fill the cluster, so shuffle;
        # non-file sources (empty inputFiles) also shuffle — the safe default
        try:
            n_files = len(df.inputFiles())
        except Exception:
            n_files = 0
        repartition = n_files < parallelism
    if repartition:
        pruned = salted_repartition(pruned, num_partitions, salt_buckets=salt_buckets)
    return pruned.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
