"""Resume / idempotency / crash-injection properties (SURVEY §5; FIXTURES §4):
a crash mid-run must lose at most the uncommitted chunk, a resumed run must
produce a final table byte-identical to an uninterrupted run, and orphan data
from a crash between data-write and manifest-rename must stay invisible."""

import os

import pytest

from ocr_spark.pipeline import read_extracted, read_metrics, run_extract
from ocr_spark.sources.iceberg_lite import IcebergLiteTable
from ocr_spark.sources.pages import synth_pages

N = 400


def _final_texts(spark, root):
    df = read_extracted(spark, root)
    return {r["url"]: r["text"] for r in df.select("url", "text").collect()}


def test_crash_then_resume_matches_uninterrupted(spark, tmp_path):
    pages = synth_pages(spark, N)

    clean_root = str(tmp_path / "clean")
    run_extract(spark, pages, clean_root, run_id="clean", chunks=4, num_partitions=4)
    clean = _final_texts(spark, clean_root)
    assert len(clean) == N

    crash_root = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected crash"):
        run_extract(spark, pages, crash_root, run_id="r1", chunks=4,
                    num_partitions=4, fail_chunk_after=2)
    partial = _final_texts(spark, crash_root)
    assert 0 < len(partial) < N

    res = run_extract(spark, pages, crash_root, run_id="r2", chunks=4, num_partitions=4)
    assert res.docs == N - len(partial)
    resumed = _final_texts(spark, crash_root)
    assert resumed == clean  # byte-identical final state

    # one row per url — resume must not duplicate committed work
    total = read_extracted(spark, crash_root).count()
    assert total == N


def test_rerun_after_completion_is_noop(spark, tmp_path):
    pages = synth_pages(spark, 100)
    root = str(tmp_path / "t")
    run_extract(spark, pages, root, run_id="a", chunks=2, num_partitions=2)
    res = run_extract(spark, pages, root, run_id="b", chunks=2, num_partitions=2)
    assert res.chunks_done == 0 and res.docs == 0
    assert read_extracted(spark, root).count() == 100


def test_orphan_data_invisible_without_manifest(spark, tmp_path):
    """Crash between parquet write and manifest rename => no partial reads."""
    root = str(tmp_path / "t")
    pages = synth_pages(spark, 50)
    run_extract(spark, pages, root, run_id="a", chunks=1, num_partitions=2)
    table = IcebergLiteTable(f"{root}/extracted")
    before = table.read(spark).count()
    # simulate: data dir written, manifest never renamed in
    orphan = os.path.join(root, "extracted", "data", "deadbeef00000000")
    read_extracted(spark, root).limit(5).write.parquet(orphan)
    assert table.read(spark).count() == before  # orphan invisible
    assert len(table.data_dirs()) == 1


def test_metrics_rows_per_partition(spark, tmp_path):
    root = str(tmp_path / "t")
    pages = synth_pages(spark, 200)
    run_extract(spark, pages, root, run_id="m", chunks=2, num_partitions=3)
    m = read_metrics(spark, root).toPandas()
    assert set(m["chunk"]) == {0, 1}
    assert (m["docs_parsed"] + m["parse_failures"] > 0).all()
    assert m["bytes_in"].sum() > 0 and m["bytes_out"].sum() > 0
    # metrics cover every extracted row exactly once
    assert int(m["docs_parsed"].sum() + m["parse_failures"].sum()) == 200
    assert set(m["snapshot_id"]) <= {
        s["snapshot_id"] for s in IcebergLiteTable(f"{root}/extracted").snapshots()
    }


def test_time_travel_and_compaction(spark, tmp_path):
    """read_at(seq) is immutable across later appends/compaction; compact()
    rewrites into target file count without changing current contents."""
    t = IcebergLiteTable(str(tmp_path / "tt"))
    t.append(spark.range(0, 10).repartition(4))
    t.append(spark.range(10, 30).repartition(4))

    at0 = {r[0] for r in t.read_at(spark, 0).collect()}
    assert at0 == set(range(10))

    before = {r[0] for r in t.read(spark).collect()}
    sid = t.compact(spark, target_partitions=1)
    assert sid is not None
    after = {r[0] for r in t.read(spark).collect()}
    assert after == before == set(range(30))
    # compaction produced one data file in one fresh dir
    dirs = t.data_dirs()
    assert len(dirs) == 1
    files = [f for f in os.listdir(dirs[0]) if f.endswith(".parquet")]
    assert len(files) == 1
    # pre-compaction snapshot still reads the old (multi-dir) layout
    assert {r[0] for r in t.read_at(spark, 1).collect()} == set(range(30))
    assert at0 == {r[0] for r in t.read_at(spark, 0).collect()}
    with pytest.raises(ValueError):
        t.read_at(spark, 99)


def test_extract_reads_iceberg_lite_input(spark, tmp_path):
    """north_rule input contract: the pipeline reads pages from a committed
    iceberg-lite TABLE (not just a parquet dir) and produces identical
    output — read_pages dispatches on the manifests/ dir."""
    from ocr_spark.session import PAGES_SCHEMA
    from ocr_spark.sources.pages import read_pages

    pages = synth_pages(spark, 50, num_partitions=2)
    troot = str(tmp_path / "pages_table")
    IcebergLiteTable(troot).append(pages)
    pdir = str(tmp_path / "pages_dir")
    pages.write.parquet(pdir)

    from_table = read_pages(spark, troot).toPandas().sort_values("url").reset_index(drop=True)
    from_dir = read_pages(spark, pdir).toPandas().sort_values("url").reset_index(drop=True)
    assert (from_table["url"] == from_dir["url"]).all()
    assert len(from_table) == 50
    assert [f.name for f in read_pages(spark, troot).schema.fields] == \
        [f.split(" ")[0] for f in PAGES_SCHEMA.split(", ")]
