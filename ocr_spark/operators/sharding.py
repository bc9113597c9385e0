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


def shard_manifest(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "shard-seed-1",
) -> DataFrame:
    """The export manifest a training-data release ships next to its
    shards: per shard the doc count, byte total, and an ORDER-SENSITIVE
    content fingerprint (md5 over the in-shard-position-ordered document
    fingerprints). A reader re-deriving the manifest from downloaded
    shards proves bit-level integrity AND ordering — a shuffled or
    truncated shard changes the fingerprint even when every document
    survives. Returns (shard, n_docs, n_bytes, content_fp), one row per
    NON-EMPTY shard, ordered by shard.

    Shape: the shard assignment's own exchange is reused — the manifest
    aggregate groups on the shard key the rows already carry; the
    ordered digest folds inside each group via array_sort over (pos, fp)
    structs (deterministic, no second sort exchange). SQL-replayable:
    md5(string_agg(fp, '' ORDER BY pos))."""
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    nb = F.octet_length(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    asg = shard_assignment(df, id_col=id_col, n_shards=n_shards, seed=seed)
    rows = asg.join(
        df.select(F.col(id_col), fp.alias("fp"), nb.alias("nb")), id_col
    )
    ordered_fps = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "fp"))),
        lambda s: s["fp"],
    )
    return (
        rows.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb").alias("n_bytes"),
            F.md5(F.array_join(ordered_fps, "")).alias("content_fp"),
        )
        .orderBy("shard")
    )
