"""Robots-rules filtering for crawl pipelines.

Before a page enters the corpus, pipelines honor (or at least audit
against) the host's robots.txt. This module implements the CONSERVATIVE
stateless reading used by several production crawlers: every
``Disallow:`` directive in the file applies, regardless of which
User-agent group it sits in — a superset of what any single agent is
denied, so nothing an agent-specific parser would block ever slips
through. That simplification is what makes the parse pure
expressions (split -> filter -> trim; no per-line state machine, no
Python) with an exact SQL twin; the trade-off is documented here, and a
group-aware parser would slot in as a sequential fold over the same
exploded lines.

Matching is prefix-based on the url path (the robots.txt core rule);
empty ``Disallow:`` lines mean allow-everything and are dropped. The
rules table is hosts x rules — vocabulary-sized — so the filter join
broadcasts at any real corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host, url_path


def robots_disallow_rules(
    robots: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """(host, prefix) for every non-empty Disallow directive. Lines split
    on ``\\r?\\n``: robots.txt fetched over HTTP is almost always CRLF,
    and Spark's ``trim`` strips spaces only — splitting on bare ``\\n``
    would leave a trailing ``\\r`` on every prefix and silently defeat
    every rule (pinned by the CRLF test)."""
    line = F.explode(F.split(F.col(robots_col), "\r?\n")).alias("line")
    lines = robots.select(F.col(host_col).alias("host"), line)
    lt = F.trim("line")
    # strip the 9-char 'Disallow:' head, not split-on-colon — paths may
    # legally contain ':' and must survive intact
    prefix = F.trim(F.substring(lt, 10, 1 << 20))
    return (
        lines.where(F.lower(lt).startswith("disallow:"))
        .select("host", prefix.alias("prefix"))
        .where(F.col("prefix") != "")
        .distinct()
    )


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """urls + (host, path, allowed): allowed=false when any of the host's
    disallow prefixes is a prefix of the url path. Anti-join shape with
    the rules side broadcast (hosts x rules is vocabulary-sized)."""
    u = urls.withColumn("host", url_host(url_col)).withColumn(
        "path", url_path(url_col)
    )
    hit = (
        u.select("host", "path")
        .distinct()
        .join(F.broadcast(rules), "host")
        .where(F.col("path").startswith(F.col("prefix")))
        .select("host", "path")
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return (
        u.join(hit, ["host", "path"], "left")
        .withColumn("allowed", F.col("blocked").isNull())
        .drop("blocked")
    )
