"""Crawl-frontier politeness scheduling.

A fetch plan (sitemap recrawl, feed items, CDX batches) is not yet a
crawl: real crawlers must respect per-host politeness — robots.txt
``Crawl-delay`` or an adaptive budget — so the frontier step assigns
each candidate url a host-local slot and an absolute scheduled time.
(Reference analog: the work-queue construction before the parse stage,
main.py:21-44 — ordering and batching decided from metadata only.)

Scale shape: the window partitions by HOST, which is exactly the key the
politeness constraint serializes on anyway — a host crawled at one
request per ``delay_s`` seconds can only ever absorb 86400/delay_s urls
per day, so per-host partitions are bounded by the physics of the crawl,
not by corpus skew. The cap (``max_per_host``) enforces that bound
before the sort, so a link-farm host with 10^8 candidate urls costs one
bounded top-K, never an unbounded single-partition sort. Everything is
JVM window + join; no Python, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch_schedule(
    candidates: DataFrame,
    host_delays: DataFrame,
    *,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    delay_col: str = "crawl_delay_s",
    default_delay_s: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Candidates (host, url, priority) x per-host delays ->
    (host, url, priority, slot, scheduled_at_s).

    Slots go to higher priority first (url as the deterministic
    tie-break); ``scheduled_at_s = slot * delay_s`` with the host's
    declared crawl delay, falling back to ``default_delay_s`` for hosts
    with no robots entry (left join, never dropped). ``max_per_host``
    truncates each host's schedule to its politeness budget — the rows
    beyond it belong to the NEXT crawl cycle, so dropping them here is
    the semantics, not a loss.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    ranked = candidates.select(
        host_col, url_col, priority_col,
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("slot"),
    )
    if max_per_host is not None:
        ranked = ranked.filter(F.col("slot") < F.lit(int(max_per_host)))
    delays = host_delays.select(
        F.col(host_col).alias("__dh"),
        F.col(delay_col).cast("double").alias("__delay"),
    )
    return (
        ranked.join(delays, on=[F.col(host_col) == F.col("__dh")], how="left")
        .select(
            host_col,
            url_col,
            priority_col,
            "slot",
            (
                F.col("slot")
                * F.coalesce(F.col("__delay"), F.lit(float(default_delay_s)))
            ).alias("scheduled_at_s"),
        )
    )
