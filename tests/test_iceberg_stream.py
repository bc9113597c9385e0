"""Streaming incremental read of iceberg-lite tables (iceberg_stream.py).

Contract under test (mirrors Iceberg's incremental scan):
- every COMMITTED append streams exactly once, in snapshot order;
- offsets are manifest sequences, durable in the query checkpoint —
  kill/restart never re-reads or skips a snapshot;
- replace snapshots (overwrite/compact/merge) fail by default,
  are skipped with onReplace=ignore;
- hive partition values recorded in manifest entries are restored;
- startingSequence tails only snapshots committed after it.
"""

import os

import pytest

from ocr_spark.sources.iceberg_lite import IcebergLiteTable
from ocr_spark.streaming.iceberg_stream import read_table_stream

SCHEMA = "doc_id BIGINT, text STRING"


def _rows(spark, lo, hi, text="t"):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", f"concat('{text}-', id) AS text"
    )


def _drain(spark, root, sink_name, tmp_path, **kw):
    """Run the stream until idle; return the collected rows as a set."""
    q = (
        read_table_stream(spark, root, schema=SCHEMA, **kw)
        .writeStream.format("memory")
        .queryName(sink_name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink_name}"))
        .start()
    )
    try:
        q.processAllAvailable()
        return {
            (r.doc_id, r.text)
            for r in spark.table(sink_name).collect()
        }
    finally:
        q.stop()


def test_tail_appends_exactly_once(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(root)
    t.append(_rows(spark, 0, 50))
    t.append(_rows(spark, 50, 80))

    q = (
        read_table_stream(spark, root, schema=SCHEMA)
        .writeStream.format("memory")
        .queryName("tail1")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.doc_id, r.text) for r in spark.table("tail1").collect()}
        want = {(r.doc_id, r.text) for r in t.read(spark).collect()}
        assert got == want and len(got) == 80

        # a third append while the query is live: picked up, exactly once
        t.append(_rows(spark, 80, 100))
        q.processAllAvailable()
        got = [(r.doc_id, r.text) for r in spark.table("tail1").collect()]
        assert len(got) == 100 and len(set(got)) == 100
    finally:
        q.stop()


def test_checkpoint_restart_resumes_at_committed_sequence(spark, tmp_path):
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = IcebergLiteTable(root)
    t.append(_rows(spark, 0, 40))

    def run_once():
        q = (
            read_table_stream(spark, root, schema=SCHEMA)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    # new snapshot AFTER the query stopped; restart must emit ONLY the delta
    t.append(_rows(spark, 40, 70))
    run_once()
    got = [(r.doc_id, r.text) for r in spark.read.parquet(out).collect()]
    assert len(got) == 70 and len(set(got)) == 70


def test_starting_sequence_skips_history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(root)
    t.append(_rows(spark, 0, 10))
    start_at = t.current_snapshot()["sequence"]
    t.append(_rows(spark, 10, 15))
    got = _drain(spark, root, "tail_skip", tmp_path,
                 starting_sequence=start_at)
    assert {d for d, _ in got} == set(range(10, 15))


def test_replace_snapshot_fails_by_default_and_skips_on_ignore(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(root)
    t.append(_rows(spark, 0, 10))
    t.compact(spark, target_partitions=1)   # replace snapshot
    t.append(_rows(spark, 10, 20))

    q = (
        read_table_stream(spark, root, schema=SCHEMA)
        .writeStream.format("memory")
        .queryName("tail_fail")
        .option("checkpointLocation", str(tmp_path / "ckpt_fail"))
        .start()
    )
    with pytest.raises(Exception, match="replace|overwrite|append-only"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # onReplace=ignore: pre-compact + post-compact appends stream; the
    # compact snapshot itself is skipped (it only rewrites existing rows)
    got = _drain(spark, root, "tail_ignore", tmp_path, on_replace="ignore")
    assert {d for d, _ in got} == set(range(0, 20))


def test_partition_values_restored(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(root)
    df = spark.range(0, 20).selectExpr(
        "id AS doc_id",
        "concat('p-', id) AS text",
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
    )
    t.append(df, partition_by="lang")
    q = (
        read_table_stream(spark, root,
                          schema="doc_id BIGINT, text STRING, lang STRING")
        .writeStream.format("memory")
        .queryName("tail_part")
        .option("checkpointLocation", str(tmp_path / "ckpt_part"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("tail_part")
        assert got.count() == 20
        assert {r.lang for r in got.select("lang").distinct().collect()} == {
            "en", "de"
        }
        assert got.where("lang = 'en'").count() == 10
    finally:
        q.stop()


def test_schema_inferred_from_footer_and_manifest(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(root)
    df = spark.range(0, 6).selectExpr(
        "id AS doc_id", "concat('x', id) AS text",
        "CASE WHEN id < 3 THEN 'a' ELSE 'b' END AS grp",
    )
    t.append(df, partition_by="grp")
    stream = read_table_stream(spark, root)      # no explicit schema
    assert set(stream.schema.names) == {"doc_id", "text", "grp"}


def test_uncommitted_data_invisible(spark, tmp_path):
    """A data dir without a manifest (crashed writer) never streams."""
    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(root)
    t.append(_rows(spark, 0, 10))
    orphan = os.path.join(root, "data", "deadbeef00000000")
    _rows(spark, 100, 110).write.parquet(orphan)
    got = _drain(spark, root, "tail_orphan", tmp_path)
    assert {d for d, _ in got} == set(range(0, 10))
