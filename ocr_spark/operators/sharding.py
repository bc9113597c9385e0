"""Deterministic training-shard export.

The last step of a corpus pipeline is writing training shards: documents
must scatter across N shards UNIFORMLY (no crawl-order locality — a shard
of consecutive urls from one host skews every batch that reads it), the
assignment must be DETERMINISTIC (re-running the export reproduces the
same shards, so downstream training is replayable), and each shard needs
a stable internal order. The reference's analog is its deterministic
output partitioning of results per batch folder (SURVEY §2.1 K-family).

Implementation: a seeded md5-derived sort key (the engine's portable hash
family — replayable in any SQL engine) gives each document a
pseudo-random position; shard = key mod n_shards, in-shard position =
rank of key within the shard. One hash-partition exchange on shard, then
a per-shard sort — exactly the movement the shard writer needs anyway, so
the plan has zero wasted shuffles. At 100 TB, n_shards is thousands and
each shard sorts independently in one task (bounded by shard size, not
corpus size)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shard_key(c, seed: str = "shard-seed-1") -> "F.Column":
    """Deterministic 32-bit shuffle key: first 32 bits of
    md5(seed || ':' || id) — portable (DuckDB:
    ('0x' || substr(md5(...), 1, 8))::BIGINT)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "shard-seed-1",
) -> DataFrame:
    """(id_col, shard, pos): a seeded global shuffle into ``n_shards``
    shards with a stable in-shard order. Ties in the 32-bit key break on
    id, so the full ordering is total and deterministic."""
    key = shard_key(id_col, seed)
    w = Window.partitionBy("shard").orderBy("key", id_col)
    return (
        df.select(F.col(id_col), key.alias("key"))
        .withColumn("shard", (F.col("key") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w) - 1)
        .select(id_col, "shard", "pos")
    )
