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

from pyspark.sql import DataFrame, Window
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


def positional_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[str] | None = None,
) -> DataFrame:
    """(term, id, pos) positional postings — the phrase-query sibling of
    ``inverted_index``. ``vocab`` prunes to the query's own terms BEFORE
    anything shuffles (the bm25 query-vocab-filter discipline): for a
    phrase lookup the corpus contributes only rows for the phrase's
    terms, not its whole token stream."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(TOKEN_PATTERN),
                F.lit(0),
            )
        ).alias("pos", "term"),
    )
    if vocab is not None:
        toks = toks.where(F.col("term").isin(*sorted(set(vocab))))
    return toks.select("term", "id", "pos")


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval: documents containing the token sequence
    ``phrase``, with match counts. Columns: doc_id, n_matches.

    Classic positional-postings intersection: anchor on the phrase's
    first term, then one equi-join per remaining term on
    (id, pos + offset). Every join is keyed — no cartesian — and the
    corpus-side stream was already pruned to the phrase's own terms, so
    the joined relations are bounded by those terms' postings (at 100 TB
    the same df-ceiling guard as ``inverted_index`` applies to stopword-
    only phrases; AQE handles a skewed hot term). Duplicate terms in the
    phrase are fine: each position's join sees its own offset."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    terms = [t.lower() for t in phrase]
    pos = positional_postings(df, text_col, id_col, vocab=terms)
    acc = (
        pos.where(F.col("term") == terms[0])
        .select("id", F.col("pos").alias("start"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos.where(F.col("term") == t).select(
            "id", (F.col("pos") - i).alias("start")
        )
        acc = acc.join(nxt, ["id", "start"])
    return acc.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_matches")
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of ranked lists.

    Each input carries (id_col, rank); fused score = sum over lists of
    1/(k + rank) for the lists the doc appears in. The canonical hybrid-
    retrieval combiner (lexical BM25 + dense cosine) because it needs no
    score calibration — only ranks. Inputs are top-k lists (tiny), so
    the union + one groupBy is driver-free and broadcast-cheap at any
    corpus scale; determinism: ranks are ints, each doc sums at most
    len(rankings) identical-order dyadic terms, ties break by id.
    Columns: id_col, rrf_score (6dp), fused_rank."""
    from functools import reduce

    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))).alias("s"),
        )
        for r in rankings
    ]
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    scored = allp.groupBy(id_col).agg(F.round(F.sum("s"), 6).alias("rrf_score"))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= topk)
        .orderBy("fused_rank")
    )


def expansion_terms(
    df: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    k_terms: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RM3-style pseudo-relevance-feedback query expansion: terms that
    characterize the seed query's BM25 top-``k_docs`` documents, scored
    by feedback-tf x corpus-idf, excluding the seed terms and stopwords.
    Columns: term, weight (4dp), rank — the expanded query is
    seed + these terms, re-run through ``bm25_topk``.

    Scale shape: the feedback doc-id list is k_docs rows (broadcast
    semi-join gates the token stream), corpus df comes from the same
    single tokenize projection with map-side combine, and only the
    candidate-term rollup shuffles. idf = ln((N+1)/(df+1)) — the tfidf
    family convention, so the twin shares the literal formula."""
    from ..functions.text import STOPWORDS

    seed = sorted({t.lower() for t in query_terms})
    fb_ids = bm25_topk(df, seed, k=k_docs, text_col=text_col,
                       id_col=id_col).select(id_col)
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
    n_docs = df.count()
    dft = (
        toks.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    fb_tf = (
        toks.join(
            F.broadcast(fb_ids.select(F.col(id_col).alias("id"))), "id", "left_semi"
        )
        .where(~F.col("term").isin(*seed) & ~F.col("term").isin(*STOPWORDS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("fb_tf"))
    )
    weight = F.round(
        F.col("fb_tf")
        * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)),
        4,
    )
    scored = fb_tf.join(dft, "term").select("term", weight.alias("weight"))
    w = Window.orderBy(F.desc("weight"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_terms)
        .orderBy("rank")
    )


SNIPPET_WINDOW = 20  # tokens per snippet window


def snippets(
    df: DataFrame,
    query_terms: list[str],
    window: int = SNIPPET_WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Search-result snippets: for each document containing any query
    term, the densest ``window``-token span drawn from the aligned AND
    half-offset window grids (a sliding-span approximation: a dense run
    of hits straddling an aligned boundary — e.g. adjacent hits at
    positions 19 and 20 — lands whole in the half-offset window that
    covers it, so it is never scored as two 1-hit windows). Ties: the
    span whose first hit sits closest to the span start (the snippet
    leads with the match), then the earliest span. Columns: doc_id,
    start, n_hits, snippet.

    Plan shape: ONE tokenization projection feeds both the hit counter
    (vocab-filtered positional stream -> hits per (doc, span-start) with
    map-side combine; each hit fans out to at most 2 candidate starts)
    and the snippet cut (array slice + join — the text never explodes);
    the per-doc argmax runs over span-count rows, bounded by
    2 * doclen / window. Everything JVM-side."""
    terms = sorted({t.lower() for t in query_terms})
    half = window // 2
    toks = df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(TOKEN_PATTERN),
            F.lit(0),
        ).alias("tk"),
    )
    pos = toks.select(
        "id", F.posexplode("tk").alias("pos", "term")
    ).where(F.col("term").isin(terms))
    aligned = (F.col("pos") / window).cast("int") * window
    offset = ((F.col("pos") - half) / window).cast("int") * window + half
    starts = pos.select(
        "id",
        "pos",
        F.explode(
            F.when(F.col("pos") >= half, F.array(aligned, offset))
            .otherwise(F.array(aligned))
        ).alias("start"),
    )
    hits = (
        starts.groupBy("id", "start")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("pos").alias("first_hit"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("n_hits"),
        F.asc(F.col("first_hit") - F.col("start")),
        F.asc("start"),
    )
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(toks, "id")
        .select(
            F.col("id").alias(id_col),
            F.col("start").cast("long").alias("start"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.array_join(
                F.slice(F.col("tk"), F.col("start") + 1, window), " "
            ).alias("snippet"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval: top-``k`` documents for a bag of query terms
    (Robertson/Sparck Jones; the Lucene idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5)), which stays positive for
    df > N/2). Output: (doc_id, score, rank), score rounded to 4 dp.

    Plan shape (the 100 TB story): the token explosion is filtered to the
    query vocabulary BEFORE any shuffle, so the tf aggregation moves
    O(docs-containing-a-query-term) rows, never the full postings
    universe; per-term df and the corpus (N, avgdl) stats are tiny
    aggregates that come back as broadcast joins; the final ranking is
    TakeOrderedAndProject (per-partition top-k, no global sort). Float
    discipline for the DuckDB twin: avgdl is rounded to 6 dp on both
    engines before it enters a score, scores to 4 dp before ranking.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(TOKEN_PATTERN),
            F.lit(0),
        ).alias("toks"),
    )
    doclen = toks.select("id", F.size("toks").cast("long").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("dl") / F.count(F.lit(1)), 6).alias("avgdl"),
    )
    qtf = (
        toks.select("id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = qtf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("dft"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        qtf.join(F.broadcast(dft), "term")
        .join(doclen, "id")
        .join(F.broadcast(stats))
        .groupBy("id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
    )
    top = (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc(id_col))  # k rows: trivial
    return top.withColumn("rank", F.row_number().over(w))
