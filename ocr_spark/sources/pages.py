"""Distributed deterministic pages source.

``spark.range(n)`` -> ``mapInPandas(gen)`` where row ``i`` is the pure
function ``core.synth.gen_page(i, seed)``: generation itself is distributed
(no driver-side createDataFrame bottleneck at bench scale) yet produces the
byte-identical table regardless of partitioning — the property the golden
path relies on (FIXTURES.md: seed-fixed, purely deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..core.synth import SEED, gen_page
from ..session import PAGES_SCHEMA


def synth_pages(spark: SparkSession, n: int, seed: int = SEED,
                num_partitions: int | None = None) -> DataFrame:
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame.from_records([gen_page(int(i), seed) for i in pdf["id"]])

    return spark.range(n, numPartitions=num_partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized pages table (parquet dir or iceberg-lite root)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
