"""Sitemap source: XML block parsing, the no-<loc> failure contract,
sitemapindex fan-out rows, and recrawl-plan semantics."""

from pyspark.sql import functions as F

from ocr_spark.sources.sitemap import parse_sitemap_entries, recrawl_plan

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example.com/page1 </loc>
    <lastmod>2024-03-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example.com/page2</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>
<sitemapindex>
  <sitemap><loc>https://a.example.com/sitemap-news.xml</loc>
    <lastmod>2024-04-02</lastmod></sitemap>
</sitemapindex>
"""


def _entries(spark):
    df = spark.createDataFrame(
        [("a.example.com", SITEMAP)], "host string, sitemap_xml string"
    )
    return parse_sitemap_entries(df)


def test_parse_typed_fields(spark):
    rows = {r.loc: r for r in _entries(spark).where("entry_type = 'url'").collect()}
    full = rows["https://a.example.com/page1"]  # whitespace in <loc> trimmed
    assert full.lastmod == "2024-03-01"
    assert full.changefreq == "daily"
    assert full.priority == 0.8
    assert full.sitemap_ok
    # optional tags absent -> NULL, not empty string
    bare = rows["https://a.example.com/page2"]
    assert bare.lastmod is None and bare.priority is None
    assert bare.sitemap_ok


def test_block_without_loc_is_kept_as_failure_row(spark):
    bad = _entries(spark).where("NOT sitemap_ok").collect()
    assert len(bad) == 1  # never dropped (P7), never typed
    assert bad[0].loc is None and bad[0].lastmod is None


def test_sitemapindex_members_surface_as_fanout_rows(spark):
    nested = _entries(spark).where("entry_type = 'sitemap'").collect()
    assert [r.loc for r in nested] == ["https://a.example.com/sitemap-news.xml"]
    assert nested[0].lastmod == "2024-04-02"
    assert nested[0].sitemap_ok


def test_recrawl_plan_new_stale_current(spark):
    entries = spark.createDataFrame(
        [
            ("url", "https://h/new", "2024-03-01", 0.9, True),
            ("url", "https://h/stale", "2024-03-01", 0.5, True),
            ("url", "https://h/current", "2024-03-01", 0.1, True),
            ("url", None, None, None, False),  # malformed: no plan row
            ("sitemap", "https://h/s2.xml", "2024-03-01", None, True),
        ],
        "entry_type string, loc string, lastmod string, priority double, "
        "sitemap_ok boolean",
    )
    captures = spark.createDataFrame(
        [
            ("https://h/stale", "2024-02-01"),
            ("https://h/stale", "2024-02-15"),  # max() is the comparison ts
            ("https://h/current", "2024-03-01"),  # lastmod == capture: current
        ],
        "url string, capture_date string",
    ).select("url", F.col("capture_date").cast("date").alias("capture_date"))
    plan = {r.url: r for r in recrawl_plan(entries, captures).collect()}
    assert set(plan) == {"https://h/new", "https://h/stale"}
    assert plan["https://h/new"].reason == "new"
    assert plan["https://h/stale"].reason == "stale"
    assert plan["https://h/stale"].priority == 0.5
