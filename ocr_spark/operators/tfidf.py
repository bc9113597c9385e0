"""Per-document TF-IDF top terms — corpus-level keyword extraction.

The training-data shape: given the extracted corpus, surface each
document's most distinctive terms (dataset exploration, quality triage,
topic-balanced sampling). Pure DataFrame expressions end to end — the
reference's per-feature extraction dialects (one_key_process.py:281-340)
work per document; this is the corpus-statistic layer Spark adds on top.

Plan shape (the part that matters at 100 TB):
  explode(tokens) -> [shuffle 1] groupBy(doc, term) count (map-side combine)
  -> [shuffle 2, vocabulary-sized] groupBy(term) document frequency
  -> join tf x df (AQE picks broadcast when the vocabulary fits)
  -> [shuffle 3] per-doc window top-k
No Python, no driver-side loops; the only driver scalar is the corpus row
count (a single aggregate probe).

Determinism/oracle contract: tokens = the shared TOKEN_PATTERN regex over
lower(text); idf = ln((N + 1) / (df + 1)) (smoothed); score = tf * idf
rounded to 4 dp; ORDER BY uses the ROUNDED score (desc, term asc) on both
engines so cross-engine last-ulp ln() differences cannot flip ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import TOKEN_PATTERN


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tfidf, rank): top-``k`` terms per document."""
    n_docs = df.count()  # single aggregate probe; the only driver scalar
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
    scored = tf.join(dfreq, "term").select(
        id_col, "term", F.round(F.col("tf") * idf, 4).alias("tfidf")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def more_like_this(df: DataFrame, query_id, k: int = 10,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sparse tf-idf "more like this": the ``k`` documents most cosine-
    similar to ``query_id``'s tf-idf vector. Columns: doc_id, cosine
    (4dp), rank.

    Determinism discipline (the HLL lesson applied to sparse vectors):
    weights are 4-dp-rounded then scaled to INTEGERS, so every dot
    product and squared norm is an exact BIGINT sum — no float
    accumulation whose value could depend on shuffle order — and the
    only float ops are the final single divide/sqrt/round per candidate.
    Scale shape: the candidate join is gated to the QUERY's own terms
    (vocabulary-bounded, like the bm25 query filter), norms are one
    map-side-combined rollup of the weight table, and the query vector
    + its norm ride along as broadcast one-sided frames."""
    n_docs = df.count()  # single aggregate probe (tfidf_top_terms discipline)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(TOKEN_PATTERN), F.lit(0),
            )
        ).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
    wtab = tf.join(dfreq, "term").select(
        "id", "term",
        F.round(F.round(F.col("tf") * idf, 4) * 10000).cast("long").alias("w"),
    )
    norms = wtab.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("norm2"))
    qv = wtab.where(F.col("id") == query_id).select("term", F.col("w").alias("qw"))
    qnorm = norms.where(F.col("id") == query_id).select(
        F.col("norm2").alias("qnorm2")
    )
    dots = (
        wtab.where(F.col("id") != query_id)
        .join(F.broadcast(qv), "term")
        .groupBy("id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    cosine = F.round(
        F.col("dot")
        / F.sqrt(F.col("norm2").cast("double") * F.col("qnorm2").cast("double")),
        4,
    )
    scored = (
        dots.join(norms, "id")
        .join(F.broadcast(qnorm))
        .select(F.col("id").alias(id_col), cosine.alias("cosine"))
    )
    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("rank")
    )
