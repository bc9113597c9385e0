"""Corpus mixing: token-budget selection and domain-level quality gates.

Two selection passes every LLM training-data pipeline runs after per-doc
filtering:

- ``token_budget_select``: build a training mixture by taking the BEST
  documents per language until each language's token budget is filled
  (the data-mixture step: budgets encode the target language ratios, the
  quality ordering makes the cut a quality threshold rather than a random
  sample). Reference analog: the validator's quality scoring feeding the
  report's keep/drop decision (data_validator.py:523-551), lifted from
  per-document to corpus-budgeted.

- ``domain_blocklist`` / ``apply_domain_blocklist``: aggregate the per-doc
  quality gate to crawl domains and drop WHOLE hosts whose corpus is
  mostly garbage (UT1/RefinedWeb-style domain filtering). A host serving
  90% junk pages poisons even its passing pages (templated spam rotates
  enough to slip per-doc rules); the domain gate is the cheap corpus-level
  backstop.

Scale: ``token_budget_select`` is ONE shuffle (hash by lang) + a sort-based
running-sum window per language; languages are few, so the window's
per-partition sort is the dominant cost for a 100-TB-scale language —
``token_budget_select_scalable`` computes the SAME output with a
range-partitioned two-pass cumsum so no language ever sorts in one task
(tested equal row-for-row). ``domain_blocklist`` is
a zero-shuffle per-row gate plus one host aggregation; the blocklist it
returns is hosts-sized (tiny) and applies as a broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import quality_score, token_count
from ..functions.urls import url_host
from .quality import quality_filter


def token_budget_select(
    df: DataFrame,
    budgets: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Greedy per-language mixture selection under token budgets.

    Within each language, documents are ranked by ``quality_score``
    descending (ties broken by id, so the cut is deterministic) and
    selected while the running token total stays within the language's
    budget. Languages absent from ``budgets`` are excluded entirely —
    a mixture is also a language allowlist.

    Returns (id, lang, n_tokens, quality, cum_tokens, selected): the full
    ranked ledger, not just the winners, so the caller can audit how far
    over budget the next candidate was and how the quality threshold
    landed per language.
    """
    spark = df.sparkSession
    b = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(budgets.items())],
        f"{lang_col} string, budget long",
    )
    scored = df.select(
        F.col(id_col),
        F.col(lang_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        quality_score(text_col).alias("quality"),
    ).join(F.broadcast(b), lang_col)
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.select(
        id_col,
        lang_col,
        "n_tokens",
        "quality",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        (F.sum("n_tokens").over(w) <= F.col("budget")).alias("selected"),
    )


def token_budget_select_scalable(
    df: DataFrame,
    budgets: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`token_budget_select` with the same output contract, computed
    without a one-task-per-language sort.

    The windowed form hash-partitions by language, so each language's
    prefix sum runs in a SINGLE task — and 'en' is half the web: at 100 TB
    that task sorts ~50 TB alone. This form applies pack_sequences'
    two-pass range cumsum (operators/chunking.py) with a per-language
    reset: range-repartition on (lang, quality DESC, id) so one language
    spans many ordered tasks, take per-(partition, lang) token totals
    (one tiny row each — the legitimate bounded driver aggregate), turn
    them into per-(partition, lang) starting offsets, and broadcast them
    back under a window partitioned by (partition, lang). Skew now only
    costs what range partitioning charges: proportional shares, not one
    straggler.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    b = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(budgets.items())],
        f"{lang_col} string, budget long",
    )
    scored = df.select(
        F.col(id_col),
        F.col(lang_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        quality_score(text_col).alias("quality"),
    ).join(F.broadcast(b), lang_col)

    # persist pins ONE materialized range partitioning across the totals
    # pass and the final pass (range boundary sampling is not re-run
    # deterministic — see pack_sequences)
    from .dedup import _persist_scoped

    ranged = _persist_scoped(
        "mix_ranged",
        scored.repartitionByRange(
            num_partitions,
            F.asc(lang_col), F.desc("quality"), F.asc(id_col),
        ).withColumn("_pid", F.spark_partition_id()),
    )
    totals = (
        ranged.groupBy("_pid", lang_col)
        .agg(F.sum("n_tokens").alias("_tot"))
        .orderBy(lang_col, "_pid")
        .collect()
    )
    offsets, acc, cur = [], 0, None
    for r in totals:
        if r[lang_col] != cur:
            cur, acc = r[lang_col], 0
        offsets.append((r["_pid"], r[lang_col], acc))
        acc += r["_tot"]
    off_df = spark.createDataFrame(
        offsets or [(0, "", 0)], f"_pid int, {lang_col} string, _off long"
    )

    w = (
        Window.partitionBy("_pid", lang_col)
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("_off") + F.sum("n_tokens").over(w)
    return (
        ranged.join(F.broadcast(off_df), ["_pid", lang_col])
        .select(
            id_col,
            lang_col,
            "n_tokens",
            "quality",
            cum.alias("cum_tokens"),
            (cum <= F.col("budget")).alias("selected"),
        )
    )


def domain_blocklist(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    min_kept_frac: float = 0.5,
) -> DataFrame:
    """Per-host quality profile + block decision.

    A host is blocked when it has at least ``min_docs`` documents and
    fewer than ``min_kept_frac`` of them pass the per-document
    ``quality_filter``. The support floor keeps single-page hosts from
    being condemned by one bad document (mirroring the per-group support
    threshold of the V7 banded check).

    Returns (host, n_docs, kept_frac, blocked) for every host.
    """
    kept = quality_filter(
        df.select(F.col(id_col), F.col(text_col)), text_col=text_col,
        id_col=id_col,
    ).select(id_col, "kept")
    hosts = df.select(F.col(id_col), url_host(url_col).alias("host"))
    return (
        hosts.join(kept, id_col)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("kept").cast("double")), 4).alias("kept_frac"),
        )
        .select(
            "host",
            "n_docs",
            "kept_frac",
            (
                (F.col("n_docs") >= min_docs)
                & (F.col("kept_frac") < min_kept_frac)
            ).alias("blocked"),
        )
    )


def domain_quality_eb(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    prior_strength: float = 20.0,
    min_smoothed_frac: float = 0.5,
) -> DataFrame:
    """Empirical-Bayes smoothed per-host quality — the web-scale fix for
    :func:`domain_blocklist`'s support floor: a floor EXEMPTS every host
    below ``min_docs`` outright (a 4-page spam host passes forever),
    while shrinkage judges every host, scaled by its evidence:

        smoothed = (n_kept + a * g) / (n_docs + a)

    with ``g`` the corpus-wide kept rate and ``a = prior_strength`` the
    prior pseudo-count — a 2-page host sits near the prior, a 10k-page
    host at its own rate (the standard Beta-Binomial posterior mean).

    Returns (host, n_docs, kept_frac, smoothed_frac, blocked) for every
    host; ``blocked`` compares the 4-dp-rounded smoothed rate so both
    engines decide on identical values.

    Shape: the per-doc gate is the zero-shuffle quality_filter; one
    host aggregation; the global rate is a 1-row broadcast (never a
    driver collect). Exact DuckDB twin
    (``__spark_entry__._host_quality_eb_oracle``)."""
    kept = quality_filter(
        df.select(F.col(id_col), F.col(text_col)), text_col=text_col,
        id_col=id_col,
    ).select(id_col, "kept")
    hosts = df.select(F.col(id_col), url_host(url_col).alias("host"))
    per_host = (
        hosts.join(kept, id_col)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
    )
    g = per_host.agg(
        (F.sum("n_kept").cast("double") / F.sum("n_docs").cast("double"))
        .alias("g")
    )
    smoothed = F.round(
        (F.col("n_kept") + F.lit(prior_strength) * F.col("g"))
        / (F.col("n_docs") + F.lit(prior_strength)),
        4,
    )
    return per_host.crossJoin(F.broadcast(g)).select(
        "host",
        "n_docs",
        F.round(
            F.col("n_kept").cast("double") / F.col("n_docs").cast("double"), 4
        ).alias("kept_frac"),
        smoothed.alias("smoothed_frac"),
        (smoothed < F.lit(min_smoothed_frac)).alias("blocked"),
    )


def apply_domain_blocklist(df: DataFrame, blocklist: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """Drop every document whose host is blocked. The blocklist is
    hosts-sized, so this plans as a broadcast left-anti join — the
    100-TB side never shuffles."""
    blocked = blocklist.where("blocked").select("host")
    return df.join(
        F.broadcast(blocked),
        url_host(url_col) == F.col("host"),
        "left_anti",
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.3,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Temperature-based multinomial mixture weights over languages (the
    mT5/XLM-R sampling rule): ``p_l  ∝  n_l^alpha`` where ``n_l`` is the
    language's token mass. ``alpha < 1`` flattens the natural distribution —
    low-resource languages get upsampled relative to their raw share,
    high-resource ones downsampled — the standard knob a multilingual
    training mixture turns before ``token_budget_select`` applies the
    resulting ratios as budgets.

    Returns one row per language: (lang, n_docs, n_tokens, raw_share,
    temp_share, boost) with boost = temp_share / raw_share (>1 means the
    temperature upsampled the language), shares rounded to 6 dp.

    Scale: one hash aggregation by language (partial map-side combine) to
    a languages-sized frame, then a broadcast single-row total join — the
    corpus is touched exactly once; everything after the agg is ~10 rows.
    """
    per_lang = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    powed = per_lang.withColumn(
        "w", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    totals = powed.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("w").alias("tot_w")
    )
    return (
        powed.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("raw_share"),
            F.round(F.col("w") / F.col("tot_w"), 6).alias("temp_share"),
            F.round(
                (F.col("w") / F.col("tot_w"))
                / (F.col("n_tokens") / F.col("tot_tokens")),
                4,
            ).alias("boost"),
        )
        .orderBy("lang")
    )
