"""Robots group-aware parser/filter and per-group sampling caps."""

from ocr_spark.operators.robots import robots_disallow_rules, robots_filter
from ocr_spark.operators.sampling import cap_per_group


def test_robots_rules_group_aware(spark):
    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: *\nDisallow: /admin\nDisallow:\n"
             "User-agent: badbot\nDISALLOW: /secret\nCrawl-delay: 10"),
            ("b.com", "# comments only\nSitemap: https://b.com/map.xml"),
        ],
        "host string, robots_txt string",
    )
    rules = {(r["host"], r["prefix"]) for r in robots_disallow_rules(robots).collect()}
    # group-aware: the badbot group's /secret does NOT apply to '*' (the
    # round-2 conservative reading over-blocked here); empty Disallow and
    # non-rule lines don't contribute; b.com contributes nothing
    assert rules == {("a.com", "/admin")}
    bad = {
        (r["host"], r["prefix"])
        for r in robots_disallow_rules(robots, agent="badbot").collect()
    }
    # badbot's exact group wins per host: a.com's '*' group is suppressed
    assert bad == {("a.com", "/secret")}


def test_robots_group_fold_edges(spark):
    robots = spark.createDataFrame(
        [
            ("s.com",
             # ungrouped rule (before any UA line): ignored per RFC 9309
             "Disallow: /orphan\n"
             # stacked UA lines share one group
             "User-agent: alpha\nUser-agent: *\nDisallow: /shared\n\n"
             "User-agent: beta\nDisallow: /beta-only"),
        ],
        "host string, robots_txt string",
    )
    star = {r["prefix"] for r in robots_disallow_rules(robots).collect()}
    assert star == {"/shared"}
    alpha = {
        r["prefix"] for r in robots_disallow_rules(robots, agent="alpha").collect()
    }
    assert alpha == {"/shared"}
    beta = {
        r["prefix"] for r in robots_disallow_rules(robots, agent="beta").collect()
    }
    assert beta == {"/beta-only"}
    # unknown agent falls back to the '*' group
    other = {
        r["prefix"] for r in robots_disallow_rules(robots, agent="nobody").collect()
    }
    assert other == {"/shared"}


def test_robots_filter_prefix_semantics(spark):
    urls = spark.createDataFrame(
        [
            (0, "https://a.com/admin/panel"),   # blocked (prefix /admin)
            (1, "https://a.com/administrator"), # blocked (prefix match is raw)
            (2, "https://a.com/public"),        # allowed
            (3, "https://b.com/admin"),         # allowed (no rules for b.com)
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame([("a.com", "/admin")], "host string, prefix string")
    got = {r["doc_id"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    assert got == {0: False, 1: False, 2: True, 3: True}


def test_cap_per_group_deterministic_and_bounded(spark):
    rows = [(i, f"h{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = cap_per_group(df, "host", k=5).toPandas()
    kept = out[out.kept]
    assert len(out) == 60                       # nothing silently filtered
    assert kept.groupby("host").size().max() == 5
    again = cap_per_group(df.repartition(7), "host", k=5).toPandas()
    a = sorted(map(tuple, out[["doc_id", "cap_rank", "kept"]].values.tolist()))
    b = sorted(map(tuple, again[["doc_id", "cap_rank", "kept"]].values.tolist()))
    assert a == b


def test_cap_per_group_ranks_dense(spark):
    df = spark.createDataFrame([(i, "x") for i in range(10)], "doc_id long, host string")
    out = cap_per_group(df, "host", k=3).toPandas()
    assert sorted(out.cap_rank) == list(range(1, 11))


def test_robots_crlf_lines_parse_clean(spark):
    """HTTP-fetched robots.txt is CRLF; prefixes must not carry \\r
    (Spark trim strips spaces only — a trailing \\r would defeat every
    rule silently)."""
    robots = spark.createDataFrame(
        [("c.com", "User-agent: *\r\nDisallow: /admin\r\nDisallow: /x\r\n")],
        "host string, robots_txt string",
    )
    rules = {(r["host"], r["prefix"]) for r in robots_disallow_rules(robots).collect()}
    assert rules == {("c.com", "/admin"), ("c.com", "/x")}

    urls = spark.createDataFrame([(0, "https://c.com/admin/p")], "doc_id long, url string")
    got = robots_filter(urls, robots_disallow_rules(robots)).first()
    assert got["allowed"] is False
