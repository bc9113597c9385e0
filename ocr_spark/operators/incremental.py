"""Incremental ingestion dedup: a new batch against the committed corpus.

A crawl pipeline never dedups from scratch: each ingestion batch must be
checked against everything already committed — exactly (is this byte
content already in the corpus?) and near (is it a trivial variant of a
committed page?). The reference's analog is its resume key-set check
(already-processed basenames skipped, one_key_process.py:820-826)
generalized from identity to similarity.

Shape: the exact check is a broadcast-friendly LEFT SEMI against the
committed fingerprint set (at 100 TB that side is a fingerprint-only
projection — Bloom-filter sized). The near check reuses the minhash LSH
machinery over the union, then keeps only CROSS pairs (new x committed):
intra-batch duplicates are deliberately NOT grounds for dropping here —
they are the batch's own clustering problem (``dedup_clusters``), and an
ingest gate that silently collapsed them would hide data-quality signal.
Every new document comes back with a status, never filtered silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5
from .dedup import minhash_lsh_pairs


def incremental_status(
    new_df: DataFrame,
    committed_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(id_col, status) for every row of ``new_df``: 'exact_seen' (its
    canonical fingerprint exists in ``committed_df``), else 'near_seen'
    (minhash-LSH near-duplicate of a committed document at ``threshold``),
    else 'new'. Ids must be disjoint across the two inputs (they are
    different ingestion generations by construction)."""
    new_ids = new_df.select(F.col(id_col).alias("id"))

    committed_fps = committed_df.select(
        fingerprint_md5(text_col).alias("fp")
    ).distinct()
    exact = (
        new_df.select(F.col(id_col).alias("id"), fingerprint_md5(text_col).alias("fp"))
        .join(committed_fps, "fp", "left_semi")
        .select("id")
        .withColumn("e", F.lit(True))
    )

    both = new_df.select(id_col, text_col).unionByName(
        committed_df.select(id_col, text_col)
    )
    pairs = minhash_lsh_pairs(both, threshold=threshold, text_col=text_col, id_col=id_col)
    old_ids = committed_df.select(F.col(id_col).alias("id"))
    # cross pairs only: one end new, one end committed
    a_new = pairs.join(new_ids.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
    near_a = a_new.join(
        old_ids.withColumnRenamed("id", "id_b"), "id_b", "left_semi"
    ).select(F.col("id_a").alias("id"))
    b_new = pairs.join(new_ids.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
    near_b = b_new.join(
        old_ids.withColumnRenamed("id", "id_a"), "id_a", "left_semi"
    ).select(F.col("id_b").alias("id"))
    near = near_a.union(near_b).distinct().withColumn("n", F.lit(True))

    return (
        new_ids.join(exact, "id", "left")
        .join(near, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("e").isNotNull(), "exact_seen")
            .when(F.col("n").isNotNull(), "near_seen")
            .otherwise("new")
            .alias("status"),
        )
    )
