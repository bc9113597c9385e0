"""ocr_spark — a from-scratch PySpark-native web-text extraction engine.

Replays the extraction contract of the reference repo ``13864799667/ocr``
(per-document parse -> exactly one structured text record per document key,
with deterministic normalization, per-document success metrics, per-batch
lineage, and resumable idempotent execution — see SURVEY.md) as distributed
main-content extraction over Common-Crawl-style pages
``(url, warc_ts, html binary, text, lang)``.

Layout:
- ``core/``       pure-Python deterministic extraction core (NO Spark imports);
                  shared verbatim by the golden-fixture generator and the
                  distributed pandas-UDF path — the reference's own pattern of
                  sharing the exact normalizer across entry points
                  (reference: 批量处理使用说明.md:196-204).
- ``operators/``  Spark DataFrame operators (extract, dedup, similarity,
                  text stats, validation).
- ``sources/``    iceberg-lite snapshot-committed parquet tables (resume,
                  lineage, metrics).
- ``functions/``  column-level helpers built on pyspark.sql.functions.
- ``plans/``      partitioning / skew strategies.
- ``streaming/``  Structured Streaming variant of the extract stage.
"""

__version__ = "0.1.0"
