"""Context-window chunking: documents -> overlapping token-window chunks.

The training-data op the extraction pipeline feeds: model pretraining
consumes fixed-size token windows with overlap, so the corpus table needs a
deterministic 1:N doc->chunks operator.

Production path (``chunk_documents``): pure JVM expressions —
``split``/``filter``/``sequence``/``explode``/``slice`` — no Python in the
plan, whole-stage codegen end to end, no shuffle (chunking is embarrassingly
parallel over input partitions). A Python-UDTF variant
(``chunk_documents_udtf``) is kept as the table-function operator-shape demo
(one input row, a variable number of output rows via SQL LATERAL) and is
asserted equal to the expression path in tests.

Tokenizer contract (shared verbatim by the expression path, the Python
chunker, and the SQL oracle): tokens are the non-empty pieces of splitting
on the explicit ASCII whitespace class ``[ \\t\\n\\r\\f\\v]+`` — an explicit
class because the three engines' notions of ``\\s`` / ``str.split()``
whitespace differ (Python's str.split also splits on Unicode whitespace;
Java's ``\\s`` is ASCII-only); an explicit shared class removes the latent
divergence. Chunk starts at every ``stride`` tokens from 0 while < n_tokens;
window ``window`` tokens (trailing chunks shorter); chunks join with single
spaces; documents with zero tokens produce zero chunks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = 60
STRIDE = 50

# the shared tokenizer class as REAL control characters — identical bytes in
# the Java regex, the RE2 (DuckDB) regex, and the Python re below
WS_CLASS = "[ \t\n\r\f\x0b]+"
_WS_RE = re.compile(WS_CLASS)


def chunk_text(text: str, window: int = WINDOW, stride: int = STRIDE):
    """Pure chunker: [(chunk_idx, chunk_text, n_tokens), ...]."""
    toks = [t for t in _WS_RE.split(text) if t] if text else []
    n = len(toks)
    out = []
    idx = 0
    for start in range(0, n, stride):
        sub = toks[start : start + window]
        out.append((idx, " ".join(sub), len(sub)))
        idx += 1
    return out


def _token_array(text_col: str):
    """Expression-level tokenizer (the shared contract above)."""
    return F.filter(F.split(F.col(text_col), WS_CLASS), lambda t: t != F.lit(""))


def chunk_documents(spark: SparkSession, docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    window: int = WINDOW, stride: int = STRIDE) -> DataFrame:
    """docs -> (doc_id, chunk_idx, chunk_text, n_tokens), expression-only.

    Plan shape: project(tokenize) -> explode(sequence) -> project(slice) —
    all inside whole-stage codegen, zero Python, zero shuffle. The same
    semantics as ``chunk_text`` (asserted against it and the SQL twin).
    ``spark`` is unused (kept for signature parity with the UDTF variant).
    """
    toks = docs.select(
        F.col(id_col), _token_array(text_col).alias("toks")
    ).withColumn("n", F.size("toks")).where(F.col("n") > 0)
    n_chunks = F.ceil(F.col("n") / F.lit(float(stride))).cast("int")
    exploded = toks.select(
        id_col,
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("toks", start + 1, window)).alias("chunk_text"),
        F.least(F.lit(window), F.col("n") - start).cast("int").alias("n_tokens"),
    )


def chunk_documents_udtf(spark: SparkSession, docs: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         window: int = WINDOW, stride: int = STRIDE) -> DataFrame:
    """UDTF + SQL LATERAL variant of chunk_documents — the table-function
    operator shape (kept as a demo/alternate; the expression path above is
    the production plan). Arrow-optimized so batches cross in Arrow form."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int",
          useArrow=True)
    class ChunkDoc:
        def eval(self, text: str):  # noqa: D102 — UDTF contract method
            for idx, chunk, n in chunk_text(text, window, stride):
                yield idx, chunk, n

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs.select(id_col, text_col).createOrReplaceTempView("docs_to_chunk")
    return spark.sql(
        f"""
        SELECT d.{id_col}, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM docs_to_chunk d, LATERAL chunk_doc(d.{text_col}) c
        """
    )


def pack_sequences(chunks: DataFrame, seq_tokens: int = 256,
                   id_col: str = "doc_id",
                   num_partitions: int | None = None) -> DataFrame:
    """Assign chunks to fixed-budget training sequences: deterministic
    boundary packing — chunks in (doc_id, chunk_idx) order, sequence id =
    floor(tokens_before / seq_tokens), so every sequence holds ~seq_tokens
    tokens (a chunk may straddle a boundary; the documented semantics that
    keep packing a pure expression).

    Scale-safe two-pass global cumsum (NO single-partition sort):
      1. range-repartition on the global order key, partition-local running
         sums via a window PARTITIONED BY the range id;
      2. per-range token totals (one tiny row per partition) are aggregated,
         brought to the driver (bounded by num_partitions — the legitimate
         tiny-aggregate collect, same class as a query-vector probe), turned
         into cumulative offsets, and broadcast-joined back.
    tokens_before(row) = offset(range) + local_cumsum(row) - n_tokens(row).
    The chunk lineage is evaluated twice (totals pass + final pass) — the
    standard two-pass tradeoff; persist upstream if its lineage is expensive.
    """
    from pyspark.sql.window import Window

    spark = chunks.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2

    # persist: the totals pass and the final pass are two separate jobs, and
    # without caching each would re-execute the range exchange — whose
    # boundary SAMPLING can differ between executions on large inputs,
    # shifting rows across _pid between the two passes and misaligning the
    # broadcast offsets. Caching pins one materialized partitioning for both
    # passes (and on cache eviction the recompute reuses the already-written
    # shuffle output, which is equally stable).
    from .dedup import _persist_scoped

    ranged = _persist_scoped(
        "pack_ranged",
        chunks.repartitionByRange(
            num_partitions, F.asc(id_col), F.asc("chunk_idx")
        ).withColumn("_pid", F.spark_partition_id()),
    )

    totals = (
        ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["_pid"], acc))
        acc += r["_tot"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")

    w = (
        Window.partitionBy("_pid")
        .orderBy(F.asc(id_col), F.asc("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_cum = F.sum("n_tokens").over(w)
    return (
        ranged.withColumn("_cum", local_cum)
        .join(F.broadcast(off_df), "_pid")
        .select(
            id_col,
            "chunk_idx",
            "n_tokens",
            F.floor((F.col("_off") + F.col("_cum") - F.col("n_tokens")) / seq_tokens)
            .cast("long")
            .alias("seq_id"),
        )
    )
