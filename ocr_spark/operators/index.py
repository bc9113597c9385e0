"""Inverted-index construction: term -> posting list over the corpus.

The web-scale retrieval primitive (search over the extracted corpus,
decontamination lookups, quality-term audits): for every term above a
document-frequency floor, the sorted list of documents containing it plus
corpus statistics. This is the corpus-wide sibling of the per-document
extraction dialects (reference one_key_process.py:281-340) — the same
token vocabulary (``TOKEN_PATTERN``), aggregated the other way around.

Plan shape (what matters at 100 TB):
  explode(tokens)            -- JVM regexp, no Python
  -> groupBy(term, doc) tf   -- shuffle 1, map-side combine collapses
                                repeats before the wire
  -> groupBy(term) postings  -- shuffle 2, vocabulary-keyed; the posting
                                array is built by collect_list AFTER tf
                                compression, so each doc contributes one
                                element, not one per occurrence
  -> df floor/ceiling filter -- drops hapax noise (min_df) and stopword
                                monsters (max_df) so no posting array
                                exceeds max_df entries: bounded row width
                                by construction, no skew bomb.

Postings are rendered as a comma-joined sorted string (deterministic,
hash-comparable across engines); df/cf are exact longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import TOKEN_PATTERN


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(term, df, cf, postings): documents per term (df), total
    occurrences (cf), and the comma-joined ascending doc-id posting list.
    Terms with df < min_df are dropped (hapax noise); a ceiling comes from
    ``max_df`` (absolute) or ``max_df_frac`` (fraction of the corpus —
    scale-invariant; costs one count() driver scalar, the same probe
    tfidf_top_terms pays)."""
    if max_df_frac is not None:
        max_df = int(max_df_frac * df.count())
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(TOKEN_PATTERN),
                F.lit(0),
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))
    inv = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("id")), lambda i: i.cast("string")
            ),
            ",",
        ).alias("postings"),
    )
    cond = F.col("df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df") <= max_df)
    return inv.where(cond).select("term", "df", "cf", "postings")
