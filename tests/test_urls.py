"""URL parse/canonicalization edge cases (userinfo, ports, trailing dots,
utm stripping, param sorting, schemeless inputs)."""

from ocr_spark.functions import urls as U


def _parse(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(
        U.url_scheme("url").alias("scheme"),
        U.url_host("url").alias("host"),
        U.registered_domain("url").alias("domain"),
        U.url_path("url").alias("path"),
        U.url_query_canonical("url").alias("q"),
        U.url_canonicalize("url").alias("canon"),
    ).first().asDict()


def test_full_decoration(spark):
    got = _parse(spark, "HTTPS://bot@WWW.News.Example.ORG.:8443/a/B?utm_x=1&z=9&a=2#frag")
    assert got["scheme"] == "https"
    assert got["host"] == "news.example.org"
    assert got["domain"] == "example.org"
    assert got["path"] == "/a/B"
    assert got["q"] == "a=2&z=9"
    assert got["canon"] == "https://news.example.org/a/B?a=2&z=9"


def test_bare_host_defaults(spark):
    got = _parse(spark, "http://example.com")
    assert got["path"] == "/" and got["q"] == ""
    assert got["canon"] == "http://example.com/"


def test_only_utm_params_collapse(spark):
    got = _parse(spark, "http://a.b/p?utm_source=x&utm_medium=y")
    assert got["q"] == "" and got["canon"] == "http://a.b/p"


def test_single_label_host(spark):
    got = _parse(spark, "http://localhost:9000/x")
    assert got["host"] == "localhost" and got["domain"] == "localhost"


def test_schemeless_is_empty_not_crash(spark):
    got = _parse(spark, "not a url at all")
    assert got["scheme"] == "" and got["host"] == ""


def test_param_order_invariance(spark):
    a = _parse(spark, "http://h.x/p?b=2&a=1")["canon"]
    b = _parse(spark, "http://h.x/p?a=1&b=2")["canon"]
    assert a == b == "http://h.x/p?a=1&b=2"


def test_fragment_question_mark_is_not_a_query(spark):
    got = _parse(spark, "https://example.com/p#frag?x=1")
    assert got["q"] == ""
    assert got["canon"] == "https://example.com/p"
