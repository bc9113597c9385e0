"""Context-window chunking: documents -> overlapping token-window chunks.

The training-data op the extraction pipeline feeds: model pretraining
consumes fixed-size token windows with overlap, so the corpus table needs a
deterministic 1:N doc->chunks operator. Expressed as a Python UDTF consumed
through a SQL LATERAL join — the table-function shape (one input row, a
variable number of output rows computed row-locally) that scalar UDFs and
aggregates can't express. No shuffle: chunking is embarrassingly parallel
over input partitions.

Determinism contract (shared verbatim with the SQL oracle): whitespace
tokens; chunk starts at every ``stride`` tokens from 0 while < n_tokens;
window ``window`` tokens (trailing chunks shorter); chunks join with single
spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WINDOW = 60
STRIDE = 50


def chunk_text(text: str, window: int = WINDOW, stride: int = STRIDE):
    """Pure chunker: [(chunk_idx, chunk_text, n_tokens), ...]."""
    toks = text.split() if text else []
    n = len(toks)
    out = []
    idx = 0
    for start in range(0, n, stride):
        sub = toks[start : start + window]
        out.append((idx, " ".join(sub), len(sub)))
        idx += 1
    return out


def pack_sequences(chunks: DataFrame, seq_tokens: int = 256,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign chunks to fixed-budget training sequences: deterministic
    boundary packing — chunks in (doc_id, chunk_idx) order, sequence id =
    floor(tokens_before / seq_tokens), so every sequence holds ~seq_tokens
    tokens (a chunk may straddle a boundary; the documented semantics that
    keep packing a pure window expression).

    The single global-ordered window is the small-data shape; at corpus
    scale, range-partition by doc_id and run the same cumsum per range with
    per-range offsets added back (two passes, no single-partition sort).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.asc(id_col), F.asc("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return chunks.select(
        id_col,
        "chunk_idx",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / seq_tokens).cast("long").alias("seq_id"),
    )


def chunk_documents(spark: SparkSession, docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    window: int = WINDOW, stride: int = STRIDE) -> DataFrame:
    """docs -> (doc_id, chunk_idx, chunk_text, n_tokens) via UDTF + LATERAL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
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
