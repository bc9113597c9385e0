"""Shard export determinism/uniformity and incremental-ingest statuses."""

from ocr_spark.operators.incremental import incremental_status
from ocr_spark.operators.sharding import shard_assignment

BASE = ("the quick brown fox jumps over the lazy dog and keeps going with "
        "plenty of additional prose so shingles and fingerprints are stable")


def _ids(spark, n):
    return spark.range(n).selectExpr("id AS doc_id")


def test_shard_assignment_total_and_deterministic(spark):
    df = _ids(spark, 200)
    a = sorted(shard_assignment(df, n_shards=8).collect())
    b = sorted(shard_assignment(df.repartition(7), n_shards=8).collect())
    assert a == b                                  # partitioning-invariant
    assert len(a) == 200
    assert {r["shard"] for r in a} <= set(range(8))


def test_shard_positions_are_dense_per_shard(spark):
    out = shard_assignment(_ids(spark, 300), n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard


def test_shard_scatter_breaks_input_locality(spark):
    """Consecutive ids must not land in the same shard en masse."""
    out = {r["doc_id"]: r["shard"] for r in
           shard_assignment(_ids(spark, 64), n_shards=8).collect()}
    runs = sum(1 for i in range(1, 64) if out[i] == out[i - 1])
    assert runs < 20      # E[runs] = 63/8 ~ 8 for a uniform scatter


def test_shard_seed_changes_assignment(spark):
    df = _ids(spark, 100)
    a = {r["doc_id"]: r["shard"] for r in shard_assignment(df, n_shards=8).collect()}
    b = {r["doc_id"]: r["shard"] for r in
         shard_assignment(df, n_shards=8, seed="other-seed").collect()}
    assert a != b


def test_incremental_statuses(spark):
    committed = spark.createDataFrame(
        [(0, BASE), (1, BASE + " committed variant two entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, BASE),                      # exact copy of 0
            (101, BASE + " tail"),            # near dup of 0
            (102, "completely different content about query planners and "
                  "shuffle services with no shared vocabulary whatsoever"),
            (103, BASE),                      # second exact copy: also exact_seen
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in
           incremental_status(new, committed).collect()}
    assert got == {100: "exact_seen", 101: "near_seen",
                   102: "new", 103: "exact_seen"}


def test_intra_batch_duplicates_stay_new(spark):
    """Two copies of the same NEW document are not 'seen' — intra-batch
    dup handling belongs to dedup_clusters, not the ingest gate."""
    committed = spark.createDataFrame(
        [(0, "committed corpus text that shares nothing with the batch "
             "documents below in any shingle")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(200, BASE), (201, BASE)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in
           incremental_status(new, committed).collect()}
    assert got == {200: "new", 201: "new"}
