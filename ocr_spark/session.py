"""SparkSession factory with the engine's standard configuration.

Defaults are chosen for the 100 TB design point and scale down to local:
- Arrow execution ON (the whole parse stage is Arrow-batched pandas UDFs —
  the analog of the reference's per-worker engine amortization,
  one_key_process.py:672-674).
- AQE ON incl. skew-join mitigation (north_rule requirement).
- UTC session timezone (oracle comparability; duckdb timestamps are UTC-naive).
- Arrow batch 4096 rows ≈ 16 MB of html payloads: pipelines the
  Python workers and caps their peak memory; measured at parity with
  larger batches on the pinned scaling levels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

EXTRACTED_SCHEMA = (
    "url string, text string, extract_status string, content_kind string, "
    "n_blocks int, bytes_in long, bytes_out long, partition_id int"
)


# Runtime-settable SQL confs (safe to apply to a spark-submit session that
# already has its master/resources fixed).
ENGINE_SQL_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    "spark.sql.parquet.compression.codec": "zstd",
}


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    for k, v in ENGINE_SQL_CONF.items():
        spark.conf.set(k, v)
    return spark


def get_spark(
    master: str | None = None,
    app_name: str = "ocr-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("OCR_SPARK_SHUFFLE_PARTITIONS", cores * 2))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("OCR_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
