"""Blocked Bloom filter in pure relational expressions — the membership
scale path when the committed key set is too large to broadcast.

The incremental-ingest gate (operators/incremental.py) answers "is this
fingerprint already committed?" with a LEFT SEMI join against the state
table's fp projection. At 10^12 committed documents that projection is
~32 TB of md5 hex — it no longer broadcasts, so every ingest batch pays a
full shuffle of BOTH sides. The classic fix (what Spark's own runtime
row-level filtering does with its internal, non-registered
``bloom_filter_agg``) is a Bloom filter: build once at commit time,
probe map-side per batch, and only the (few) bloom-POSITIVE rows reach
the exact join. Bloom negatives are definite — a 'new' verdict from the
filter needs no confirmation — so for the common crawl case (most pages
in a fresh batch are novel) the expensive join shrinks from
O(batch) to O(duplicates + false positives).

This is a BLOCKED Bloom filter (Putze/Sanders/Singler, "Cache-, Hash- and
Space-Efficient Bloom Filters"): the bit space is an array of 64-bit
blocks; each key hashes to ONE block and sets k bits inside it. That maps
exactly onto relational primitives:

  build:  per key -> (block = h0 mod n_blocks, mask = OR of k one-bit
          longs) -> groupBy(block).agg(bit_or(mask))
  probe:  recompute (block, mask) -> join on block ->
          candidate := bits IS NOT NULL AND (bits & mask) == mask

so both sides are ordinary DataFrames: the built filter is an
(block long, bits long) table of at most n_blocks rows that Spark
broadcasts when it fits and shuffle-joins when it doesn't — either way
the probe side moves only (id, block, mask), never the payload.

Hashing is the same md5-seeded Carter-Wegman family as the minhash
pipeline (operators/dedup.py:98-115) — base = first 15 hex digits of
md5(key), h_i = (a_i * (base mod P) + b_i) mod P over P = 2^31-1 —
chosen so every step (md5, substr, hex cast, *, +, %, <<, &, bit_or)
exists verbatim in DuckDB and the whole filter has an exact SQL twin.
Bit positions are taken mod 63 (bits 0..62) so shifted masks stay
strictly positive in both engines' signed BIGINT.

Sizing: with keys spread over n_blocks blocks at load L = n_keys /
n_blocks keys/block, a probe's false-positive rate is roughly
(1 - e^(-kL/64))^k; the default L ≈ 6, k = 4 gives ~2% — good enough to
kill ~98% of the exact-join traffic for novel keys. Per 10^9 keys the
filter is ~170M rows * 16 B ≈ 2.7 GB as a table (≈1.3 GB of bitmap),
scaling linearly; shard by block range if a single broadcast must stay
under the executor limit.

Reference analog: the resume key-set check (one_key_process.py:820-826)
loads the committed basename set into a dict — the O(1)-membership
structure this operator rebuilds as data-parallel relational state.
"""

from __future__ import annotations

import random
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_K = 4  # bits set per key (within the key's one block)
BLOOM_LOAD = 6  # target keys per 64-bit block (~2% fpp at k=4)
_BB_P = (1 << 31) - 1  # same Mersenne prime as the minhash family


def _bb_constants(k: int, seed: int = 424243) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    # k+1 pairs: index 0 picks the block, 1..k pick bits inside it
    return [(rng.randrange(1, _BB_P), rng.randrange(0, _BB_P))
            for _ in range(k + 1)]


BLOOM_AB = _bb_constants(BLOOM_K)


def n_blocks_for(n_keys: int, load: int = BLOOM_LOAD) -> int:
    """Block-count sizing for an expected key count (min 64 blocks so
    toy tables still exercise real block dispersion)."""
    return max(64, int(n_keys // load) + 1)


def _block_and_mask(key_col, n_blocks: int, k: int = BLOOM_K):
    """(block, mask) expression pair for one key column. The base hash is
    the first 15 hex digits of md5 (< 2^60, the largest prefix that stays
    signed-64 in both engines, like dedup.py's line hash); all family
    arithmetic stays non-negative so % == pmod in both engines."""
    base = F.conv(F.substring(F.md5(key_col), 1, 15), 16, 10).cast("long") % _BB_P
    hs = [(F.lit(a) * base + F.lit(b)) % _BB_P for a, b in BLOOM_AB[: k + 1]]
    block = (hs[0] % F.lit(n_blocks)).alias("block")
    return block, [(h % F.lit(63)).cast("int") for h in hs[1:]]


def _mask_from_positions(df: DataFrame, pos_cols: list[Column]) -> DataFrame:
    """Materialize bit positions as named columns, then fold them into one
    64-bit mask via SQL shiftleft (the Python F.shiftleft wrapper only
    accepts literal shift amounts)."""
    named = df.select(
        "*", *[p.alias(f"_p{j}") for j, p in enumerate(pos_cols)]
    )
    mask = reduce(
        Column.bitwiseOR,
        [
            F.expr(f"shiftleft(CAST(1 AS BIGINT), _p{j})")
            for j in range(len(pos_cols))
        ],
    ).alias("mask")
    return named.select(
        *[c for c in df.columns], mask
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "fp",
    n_blocks: int = 1 << 20,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build the (block, bits) filter table from a key column. ONE
    map-side pass plus one hash aggregation on block — the partial
    bit_or combines before the shuffle, so at most n_blocks rows move
    per input partition regardless of key count."""
    block, pos = _block_and_mask(F.col(key_col), n_blocks, k)
    # keep the key column through the mask build — the position
    # expressions reference it — then project it away before the agg
    masked = _mask_from_positions(df.select(key_col, block), pos)
    return (
        masked.groupBy("block")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "fp",
    n_blocks: int = 1 << 20,
    k: int = BLOOM_K,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col`` (boolean): False = key DEFINITELY absent from
    the filter's build set; True = present or false positive (verify with
    the exact join). ``n_blocks``/``k`` MUST match the build call — they
    are part of the filter's identity, so persist them next to the
    filter table (committed_bloom_meta in the ingest pipeline).

    The probe side carries (original columns, block, mask) into a LEFT
    join on block; the filter side is n_blocks rows max, so AQE plans a
    broadcast at any realistic size and a shuffle join beyond it — the
    probe payload never amplifies either way."""
    block, pos = _block_and_mask(F.col(key_col), n_blocks, k)
    probed = _mask_from_positions(df.select("*", block), pos)
    return (
        probed.join(bloom, "block", "left")
        .select(
            *df.columns,
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias(out_col),
        )
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR-combine filter tables built with the SAME (n_blocks, k): the
    blocked layout makes the union a block-keyed bit_or — an ingest loop
    extends its committed filter with each batch's delta instead of
    rebuilding over the whole corpus (build cost stays O(batch))."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one filter table")
    merged = blooms[0]
    for b in blooms[1:]:
        merged = merged.unionByName(b)
    return merged.groupBy("block").agg(F.bit_or("bits").alias("bits"))


def bloom_gate_exact(
    new_df: DataFrame,
    committed_keys: DataFrame,
    bloom: DataFrame,
    key_col: str = "fp",
    id_col: str = "doc_id",
    n_blocks: int = 1 << 20,
) -> DataFrame:
    """Exact membership verdict (id, seen) using the filter as a
    prefilter: bloom-negative rows are 'seen = False' with no join;
    only bloom-positive rows join ``committed_keys`` (LEFT SEMI on the
    key) to split true duplicates from false positives. Output is
    row-for-row over ``new_df`` — the never-drop contract."""
    probed = bloom_probe(
        new_df.select(id_col, key_col), bloom, key_col, n_blocks
    )
    pos = probed.where(F.col("maybe_seen"))
    confirmed = (
        pos.join(committed_keys.select(key_col).distinct(), key_col, "left_semi")
        .select(id_col)
        .withColumn("_s", F.lit(True))
    )
    return (
        probed.select(id_col)
        .join(confirmed, id_col, "left")
        .select(id_col, F.coalesce(F.col("_s"), F.lit(False)).alias("seen"))
    )
