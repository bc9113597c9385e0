"""WARC-lite source: build/parse round trip, damaged-record recovery
(the P7 never-poison-the-segment discipline), and the distributed path."""

import datetime as dt

from ocr_spark.sources.warc import (
    build_warc_segment,
    parse_warc_segment,
    warc_pages,
    warc_segments_from_documents,
)

TS = dt.datetime(2026, 2, 3, 4, 5, 6)

RECS = [
    ("warc://a/0", TS, b"<html>alpha</html>"),
    ("warc://a/1", TS + dt.timedelta(seconds=1), b""),          # empty payload
    ("warc://a/2", TS + dt.timedelta(seconds=2), "café 中".encode()),
]


def test_round_trip_byte_exact():
    got = parse_warc_segment(build_warc_segment(RECS))
    assert [(r["url"], r["warc_ts"], r["payload"]) for r in got] == RECS


def test_payload_containing_magic_and_crlf_survives():
    tricky = b"body with \r\n\r\n blank lines and WARC/1.0\r\n magic inside"
    seg = build_warc_segment([("warc://t/0", TS, tricky), ("warc://t/1", TS, b"tail")])
    got = parse_warc_segment(seg)
    assert [r["payload"] for r in got] == [tricky, b"tail"]


def test_corrupt_length_drops_only_that_record():
    seg = bytearray(build_warc_segment(RECS))
    # mangle record 1's Content-Length digits
    i = seg.index(b"Content-Length: 0", seg.index(b"warc://a/1"))
    seg[i : i + len(b"Content-Length: 0")] = b"Content-Length: X"
    got = parse_warc_segment(bytes(seg))
    assert [r["url"] for r in got] == ["warc://a/0", "warc://a/2"]


def test_truncated_tail_keeps_earlier_records():
    seg = build_warc_segment(RECS)
    got = parse_warc_segment(seg[: len(seg) - 30])  # cuts into record 2
    assert [r["url"] for r in got] == ["warc://a/0", "warc://a/1"]


def test_distributed_round_trip_and_partitioning(spark):
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    segs = warc_segments_from_documents(spark, sf)
    pages = warc_pages(segs).toPandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert len(pages) == len(docs)
    got = {
        int(u.rsplit("/", 1)[1]): bytes(h).decode("utf-8")
        for u, h in zip(pages.url, pages.html)
    }
    want = dict(zip(docs.doc_id, docs.text))
    assert got == want

    again = warc_pages(segs.repartition(5)).toPandas()
    assert sorted(again.url) == sorted(pages.url)


def test_wet_records_roundtrip_and_plan(spark):
    """WET conversion records re-parse through the same record splitter
    (framing compatibility with the ingest edge), carry the exact utf-8
    byte length, and the plan is a zero-shuffle, zero-Python projection."""
    import datetime as dt
    import hashlib

    from ocr_spark.sources.warc import parse_warc_segment, wet_records

    rows = [
        ("u0", dt.datetime(2026, 2, 3, 4, 5, 6), "hello world"),
        ("u1", dt.datetime(2026, 2, 3, 4, 5, 7), "héllo — ünïcode ©"),
        ("u2", dt.datetime(2026, 2, 3, 4, 5, 8), None),  # never-drop
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = wet_records(df).toPandas().set_index("url").sort_index()

    assert int(out.loc["u0", "content_length"]) == len(b"hello world")
    assert int(out.loc["u1", "content_length"]) == len(
        "héllo — ünïcode ©".encode("utf-8"))
    assert int(out.loc["u2", "content_length"]) == 0
    assert ("sha256:" + hashlib.sha256(b"hello world").hexdigest()
            ) in out.loc["u0", "record"]

    # the conversion records re-parse through the ingest-side splitter
    segment = "".join(out["record"]).encode("utf-8")
    parsed = {r["url"]: r["payload"] for r in parse_warc_segment(segment)}
    assert parsed["u0"].decode("utf-8") == "hello world"
    assert parsed["u1"].decode("utf-8") == "héllo — ünïcode ©"
    assert parsed["u2"] == b""

    plan = wet_records(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
