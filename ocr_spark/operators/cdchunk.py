"""Content-defined chunking (CDC) for binary payload dedup.

Fixed-size blocking cannot deduplicate shifted content: insert one byte
at the front of a file and every block boundary moves, so no block hash
matches the original. Content-defined chunking (the rolling-hash
boundary scheme behind rsync/LBFS/FastCDC) cuts where the CONTENT says
so — a windowless gear hash over the bytes, boundary when the hash's low
bits are zero — so after an edit the chunker *resynchronizes* and every
untouched region hashes identically again. At crawl scale this is how
you find partial duplicates among media/binary payloads (same PDF with a
new cover page, same video with a new intro) where whole-file sha256
sees nothing.

Spark shape: one Arrow ``mapInPandas`` pass over the binary column
(byte-level rolling state is genuinely not relational), emitting the 1:N
chunk relation (id, chunk_idx, offset, n_bytes, chunk_sha). Downstream
is pure relational: ``shared_chunks`` group-counts chunk hashes, and a
pair join over matching hashes finds the partial-dup candidates — the
same banded-join discipline as the MinHash family, with the chunk hash
as the band.

Determinism: the gear table derives from a fixed seed; boundaries are a
pure function of the bytes. Pinned by construction-truth tests (the
resync property measured against a prefix edit) rather than a SQL twin —
byte-level rolling hashes are engine-native, like the zlib signal.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEAR_SEED = 9001
MIN_SIZE = 256
AVG_SIZE = 1024
MAX_SIZE = 4096

_MASK64 = (1 << 64) - 1


def _gear_table(seed: int = GEAR_SEED) -> list[int]:
    rng = np.random.RandomState(seed)
    # two 32-bit draws per entry -> uniform 64-bit gear values
    hi = rng.randint(0, 1 << 32, size=256, dtype=np.uint64)
    lo = rng.randint(0, 1 << 32, size=256, dtype=np.uint64)
    return [int((h << np.uint64(32)) | l) for h, l in zip(hi, lo)]


_GEAR = _gear_table()


def cdc_boundaries(data: bytes, min_size: int = MIN_SIZE,
                   avg_size: int = AVG_SIZE,
                   max_size: int = MAX_SIZE) -> list[int]:
    """Chunk end-offsets for ``data`` under the gear rolling hash: cut
    when the hash's low log2(avg_size) bits are zero, never before
    ``min_size`` or after ``max_size`` bytes since the last cut. The
    final partial chunk always ends at len(data)."""
    mask = avg_size - 1  # avg_size must be a power of two
    n = len(data)
    bounds: list[int] = []
    start = 0
    while start < n:
        end = min(start + max_size, n)
        h = 0
        cut = end
        # boundaries are ineligible inside the minimum size
        probe = min(start + min_size, end)
        for i in range(probe, end):
            h = ((h << 1) + _GEAR[data[i]]) & _MASK64
            if (h & mask) == 0:
                cut = i + 1
                break
        bounds.append(cut)
        start = cut
    return bounds


CDC_SCHEMA = ("id string, chunk_idx long, offset long, n_bytes long, "
              "chunk_sha string")


def cdc_chunks(df: DataFrame, binary_col: str = "html",
               id_col: str = "url", min_size: int = MIN_SIZE,
               avg_size: int = AVG_SIZE,
               max_size: int = MAX_SIZE) -> DataFrame:
    """Binary column -> 1:N content-defined chunk relation. NULL/empty
    payloads emit one zero-length chunk row (never-drop: every input id
    appears downstream)."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "chunk_idx", "offset", "n_bytes",
                                   "chunk_sha")}
            for i, blob in enumerate(pdf[binary_col].tolist()):
                b = blob if blob is not None else b""
                rid = pdf[id_col].iat[i]
                if not b:
                    out["id"].append(rid)
                    out["chunk_idx"].append(0)
                    out["offset"].append(0)
                    out["n_bytes"].append(0)
                    out["chunk_sha"].append(hashlib.sha256(b"").hexdigest()[:16])
                    continue
                start = 0
                for idx, end in enumerate(
                    cdc_boundaries(b, min_size, avg_size, max_size)
                ):
                    out["id"].append(rid)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(start)
                    out["n_bytes"].append(end - start)
                    out["chunk_sha"].append(
                        hashlib.sha256(b[start:end]).hexdigest()[:16]
                    )
                    start = end
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(chunk, schema=CDC_SCHEMA)


def shared_chunks(chunks: DataFrame, min_ids: int = 2) -> DataFrame:
    """Chunk hashes appearing in >= ``min_ids`` distinct payloads, with
    the id list — the partial-duplicate index. One hash-keyed aggregate;
    postings bounded like the inverted index (chunk hashes shared by
    half the corpus are boilerplate you cap upstream)."""
    return (
        chunks.groupBy("chunk_sha")
        .agg(
            F.count_distinct("id").alias("n_ids"),
            F.sum("n_bytes").alias("total_bytes"),
            F.array_sort(F.collect_set("id")).alias("ids"),
        )
        .where(F.col("n_ids") >= min_ids)
        .orderBy(F.desc("n_ids"), "chunk_sha")
    )
