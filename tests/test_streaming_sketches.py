"""Streaming HLL register maintenance (streaming/sketches.py)."""

from pyspark.sql import functions as F

from ocr_spark.operators.sketches import hll_distinct
from ocr_spark.streaming.sketches import HllIngest, start_hll_ingest


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.lit("g").alias("grp"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )


def test_hll_ingest_matches_direct_and_replay_is_noop(spark, tmp_path):
    ing = HllIngest(str(tmp_path / "regs"), "grp", "key")
    ing.process_batch(_batch(spark, 0, 700), 0)
    ing.process_batch(_batch(spark, 500, 1200), 1)   # overlap: real streams recrawl
    est_direct = hll_distinct(_batch(spark, 0, 1200), "grp", "key").collect()[0]
    est_stream = ing.estimates(spark).collect()[0]
    assert est_stream["est_distinct"] == est_direct["est_distinct"]
    # crash replay: re-delivering batch 1 must not move the state
    before = sorted(map(tuple, ing.table.read(spark).collect()))
    ing.process_batch(_batch(spark, 500, 1200), 1)
    assert sorted(map(tuple, ing.table.read(spark).collect())) == before


def test_hll_ingest_through_a_real_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    _batch(spark, 0, 400).write.parquet(src)
    stream = spark.readStream.schema("grp string, key string").parquet(src)
    q = start_hll_ingest(
        stream, str(tmp_path / "regs"), str(tmp_path / "ckpt"), "grp", "key"
    )
    q.awaitTermination(120)
    ing = HllIngest(str(tmp_path / "regs"), "grp", "key")
    est = ing.estimates(spark).collect()[0]
    want = hll_distinct(_batch(spark, 0, 400), "grp", "key").collect()[0]
    assert est["est_distinct"] == want["est_distinct"]
