"""Incremental ingestion dedup: a new batch against the committed corpus.

A crawl pipeline never dedups from scratch: each ingestion batch must be
checked against everything already committed — exactly (is this byte
content already in the corpus?) and near (is it a trivial variant of a
committed page?). The reference's analog is its resume key-set check
(already-processed basenames skipped, one_key_process.py:820-826)
generalized from identity to similarity — and, like the reference, the
committed side is LOADED, not recomputed: :func:`committed_state`
materializes everything the gate needs (fingerprint, distinct shingles,
minhash signature) in one map pass at commit time, and
:func:`incremental_status_against_state` checks later batches against that
table with zero reads of committed text. At 100 TB the state table is the
difference between O(batch) and O(corpus) work per ingest.

Shape: the exact check is a broadcast-friendly LEFT SEMI against the
committed fingerprint set; pass ``bloom`` (a persisted blocked-Bloom
table from operators/bloom.py, built from the state table's fp column at
commit time) to prefilter it — bloom-negative rows are definitively new
and never touch the committed table, so a mostly-novel batch's exact
check is map-side. The near check band-joins the new
batch's (band, bucket) rows against bucket keys derived from the STORED
committed signatures (xxhash64 over sig slices — no md5 over text), with
the same union-wide bucket cap as ``minhash_lsh_pairs``, then verifies
candidates with exact jaccard over stored distinct shingles. Intra-batch
duplicates are deliberately NOT grounds for dropping here — they are the
batch's own clustering problem (``dedup_clusters``), and an ingest gate
that silently collapsed them would hide data-quality signal. Every new
document comes back with a status, never filtered silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5
from .dedup import LSH_BANDS, MINHASH_PERMS, band_buckets, minhash_signatures


def committed_state(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
) -> DataFrame:
    """The per-document dedup state to persist at ingest-commit time:
    (id, fp, sh: array<string> distinct shingles, sig: array<long>).
    One map pass over the batch being committed — fingerprint, shingles,
    and minhash signature all derive from a single canonicalization.
    Write this to the corpus's state table (iceberg-lite) alongside the
    data commit; later batches dedup against it without re-reading text.

    Storage note for 100 TB: ``fp``+``sig`` are fixed-width (~300 B/doc);
    ``sh`` is text-scale but columnar-compresses well and is only joined
    for the deduplicated candidate set. If storing shingles is unacceptable,
    drop ``sh`` and verify with signature agreement instead (estimated
    jaccard) — the banding/capping machinery is unchanged."""
    sigs = minhash_signatures(
        df, text_col, id_col, perms,
        extra=(fingerprint_md5(text_col).alias("fp"),),
    )
    return sigs.select(
        F.col(id_col).alias("id"),
        "fp",
        F.array_distinct("shingles").alias("sh"),
        "sig",
    )


def write_band_store(
    state_df: DataFrame,
    table_name: str,
    path: str,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    num_buckets: int = 16,
) -> None:
    """Persist the committed corpus's LSH (id, band, bucket) rows as a
    parquet table BUCKETED (and sorted) by the band-join key, via
    ``plans.partitioning.write_bucketed``.

    Why: without this, every ingest batch re-derives band rows from the
    state table's ``sig`` arrays AND re-shuffles them for the candidate
    band join — O(corpus) exchange work per batch. Bucketing pins the
    committed side's layout to the join key at commit time, so the
    per-batch probe join shuffles only the NEW batch's band rows (the
    committed side's scan feeds the join with no Exchange — pinned in
    tests/test_plans.py::test_incremental_band_store_committed_side_no_exchange).
    Pay one clustered write per commit, probe exchange-free forever —
    the same pay-once discipline as the Bloom gate on the exact path.
    Refresh by re-running after each state commit (mode is overwrite);
    readers pass ``spark.table(table_name)`` as ``band_store``."""
    from ..plans.partitioning import write_bucketed

    rows = band_buckets(state_df, id_col="id", perms=perms, bands=bands)
    write_bucketed(rows, table_name, path, ["band", "bucket"], num_buckets)


def incremental_status_against_state(
    new_df: DataFrame,
    state_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    max_bucket: int = 256,
    bloom: DataFrame | None = None,
    bloom_n_blocks: int | None = None,
    band_store: DataFrame | None = None,
    band_store_tail_state: DataFrame | None = None,
) -> DataFrame:
    """(id_col, status) for every row of ``new_df`` checked against a
    persisted :func:`committed_state` table: 'exact_seen' (fingerprint
    exists in the state), else 'near_seen' (minhash-LSH near-duplicate of
    a committed document at ``threshold``), else 'new'. Ids must be
    disjoint across generations (they are different ingestion batches).

    Produces exactly the pairs ``minhash_lsh_pairs(new ∪ committed)``
    would produce restricted to cross (new × committed) pairs — same
    union-wide bucket cap, same exact-jaccard verification — but computes
    the committed side entirely from stored state (plan contains no scan
    of committed text), and skips intra-side pairing up front instead of
    filtering it out afterwards."""
    new_state = committed_state(new_df, text_col, id_col, perms)
    new_ids = new_state.select("id")

    exact_probe = new_state.select("id", "fp")
    if bloom is not None:
        # scale path: the persisted blocked-Bloom filter (built once per
        # commit from the state table's fp column, operators/bloom.py)
        # sentences bloom-NEGATIVE rows to 'new' map-side — only the few
        # positives (duplicates + ~2% false positives) reach the exact
        # semi-join, so the committed fp projection is no longer joined
        # against the whole batch every ingest
        from .bloom import bloom_probe

        exact_probe = bloom_probe(
            exact_probe, bloom, "fp",
            n_blocks=bloom_n_blocks if bloom_n_blocks is not None else 1 << 20,
        ).where(F.col("maybe_seen")).select("id", "fp")
    exact = (
        exact_probe
        .join(state_df.select("fp").distinct(), "fp", "left_semi")
        .select("id")
        .withColumn("e", F.lit(True))
    )

    nb = band_buckets(new_state, id_col="id", perms=perms, bands=bands)
    # scale path: a persisted :func:`write_band_store` table is already
    # laid out (bucketed + sorted) on the band-join key, so the committed
    # side enters the candidate join with NO Exchange — only the batch's
    # own band rows shuffle. With ``band_store_tail_state`` (the LSM-style
    # streaming layout: bucketed BASE through the last refresh + the
    # state rows appended SINCE, derived in-session) the committed side is
    # the disjoint union base ∪ tail; the candidate join runs per part and
    # unions RESULTS, so the base keeps its exchange-free scan while the
    # tail — O(batches since refresh), not O(corpus) — pays the ordinary
    # shuffle. Either layout must hold exactly band_buckets(state_df)'s
    # rows, so the pair set — and the DuckDB twin — are unchanged.
    sb_parts: list[DataFrame]
    if band_store is not None:
        sb_parts = [band_store.select("id", "band", "bucket")]
        if band_store_tail_state is not None:
            sb_parts.append(
                band_buckets(
                    band_store_tail_state, id_col="id",
                    perms=perms, bands=bands,
                )
            )
    else:
        sb_parts = [band_buckets(state_df, id_col="id", perms=perms, bands=bands)]
    # bucket cap over the UNION (identical semantics to the from-scratch
    # pass over new ∪ committed): a boilerplate bucket is oversized no
    # matter which generation its members arrived in. Counts are taken
    # PER PART and re-summed so the bucketed base's count aggregation
    # stays exchange-free (its grouping keys are its bucket spec) and the
    # second-stage agg shuffles bucket-count rows, never band rows.
    def _cnt(df: DataFrame) -> DataFrame:
        return df.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))

    counts = _cnt(nb)
    for part in sb_parts:
        counts = counts.unionByName(_cnt(part))
    small = (
        counts.groupBy("band", "bucket")
        .agg(F.sum("n").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("band", "bucket")
    )
    nb = nb.join(small, ["band", "bucket"], "left_semi")

    def _cand(sb: DataFrame) -> DataFrame:
        return (
            nb.alias("l")
            .join(
                sb.join(small, ["band", "bucket"], "left_semi").alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket")),
            )
            .select(
                F.col("l.id").alias("id_new"), F.col("r.id").alias("id_old")
            )
        )

    cand = _cand(sb_parts[0])
    for part in sb_parts[1:]:
        cand = cand.unionByName(_cand(part))
    cand = cand.distinct()
    a = new_state.select(F.col("id").alias("id_new"), F.col("sh").alias("sh_a"))
    b = state_df.select(F.col("id").alias("id_old"), F.col("sh").alias("sh_b"))
    near = (
        cand.join(a, "id_new")
        .join(b, "id_old")
        .where(
            # rounded exactly like minhash_lsh_pairs' verification so the
            # state path keeps the same pair set (and the same SQL twin)
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                4,
            )
            >= threshold
        )
        .select(F.col("id_new").alias("id"))
        .distinct()
        .withColumn("n", F.lit(True))
    )

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


def incremental_status(
    new_df: DataFrame,
    committed_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Convenience wrapper when no persisted state exists yet: derive the
    committed state in-session, then run the state-based gate. Production
    ingest persists :func:`committed_state` once per commit instead."""
    return incremental_status_against_state(
        new_df,
        committed_state(committed_df, text_col, id_col),
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
    )


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Diff two crawl snapshots by content fingerprint: one row per key
    in either snapshot with status added / removed / changed / unchanged.

    The comparison joins FINGERPRINTS, never text: each side collapses
    to (key, md5) in its own map pass, then a single full-outer shuffle
    on the key decides the status. At 100 TB both sides should be the
    persisted state tables (:func:`committed_state`'s ``fp`` column) so
    the diff reads ~16 bytes per document and no payload at all — the
    recrawl-planning primitive (fetch only added/changed, tombstone
    removed) for incremental corpus maintenance.
    """
    old_fp = old_df.select(
        F.col(key_col).alias("k"), fingerprint_md5(text_col).alias("old_fp")
    )
    new_fp = new_df.select(
        F.col(key_col).alias("k"), fingerprint_md5(text_col).alias("new_fp")
    )
    return (
        old_fp.join(new_fp, "k", "full_outer")
        .select(
            F.col("k").alias(key_col),
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
            "old_fp",
            "new_fp",
        )
    )
