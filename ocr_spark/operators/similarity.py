"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, expression-only (zip_with + aggregate
fold — stays JVM-side, scales as one map + one top-k reduce). Scale path:
random-hyperplane LSH bucketing so candidate generation is a bucket
equi-join instead of a full cross product; at 100 TB the bucket join
shuffles ~n*probes rows instead of n^2.

Float discipline for the DuckDB oracle: embeddings are cast to double BEFORE
any arithmetic on both engines, folds run left-to-right in both, and scores
are rounded to 4 dp so last-ulp summation differences can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 12
PLANE_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k against a constant query vector.

    Plan shape: scan -> project(score) -> TakeOrderedAndProject (no shuffle
    of the full table; each partition computes local top-k, driver merges).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = df.select(
        F.col(id_col),
        F.round(cosine_col(emb, q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                            vec_col: str = "embedding", id_col: str = "vec_id",
                            n_planes: int = N_PLANES) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Bucket key = sign bits of <v, plane_j> for deterministic pseudo-random
    hyperplanes (seeded; same buckets every run). Pairs sharing a bucket are
    verified with exact cosine. Recall is per-bucket (single probe) —
    documented tradeoff; raise n_planes for precision, add probes for recall.
    """
    import numpy as np

    dim = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(PLANE_SEED)
    planes = rng.standard_normal((n_planes, dim))

    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.concat_ws(
        "",
        *[
            F.when(_dot(emb, F.array(*[F.lit(float(p)) for p in planes[j]])) >= 0, "1")
            .otherwise("0")
            for j in range(n_planes)
        ],
    )
    keyed = df.select(F.col(id_col).alias("id"), emb.alias("v"), bucket.alias("bucket"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    )
    return (
        cand.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_col(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ivf_topk(df: DataFrame, k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id: int = 0) -> DataFrame:
    """IVF-style approximate nearest neighbour: the scale path for ANN.

    Coarse quantizer: the first ``n_centroids`` corpus vectors (deterministic
    — no iterative k-means, so the cell assignment is a pure function of the
    data and the oracle can replay it). Every vector is assigned to its
    best-cosine cell via a broadcast join + ``max_by`` partial aggregation
    (map-side combine: the corpus shuffles once on ``vec_id``, never N²).
    The query probes its ``n_probe`` nearest cells and re-ranks exactly
    within them — at 100 TB only ~n_probe/n_centroids of the corpus is
    scored against the query instead of all of it.

    Output: (vec_id, cosine, rank) — top-``k`` within the probed cells.
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = F.broadcast(
        df.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cent_id"), emb.alias("cv"))
    )
    qv = df.where(F.col(id_col) == query_id).select(emb.alias("qv"))

    # cell assignment: argmax cosine over centroids, ties -> lowest cent_id
    scored = df.select(F.col(id_col), emb.alias("v")).join(cents)
    cos = cosine_col(F.col("v"), F.col("cv"))
    assigned = scored.groupBy(id_col).agg(
        F.max_by(
            F.col("cent_id"), F.struct(cos.alias("c"), (-F.col("cent_id")).alias("t"))
        ).alias("cent_id"),
        F.first("v").alias("v"),  # constant within the group (one vector per id)
    )

    # probe selection: the query's n_probe nearest cells (16-row job)
    probes = (
        cents.join(F.broadcast(qv))
        .select("cent_id", cosine_col(F.col("cv"), F.col("qv")).alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cent_id"))
        .limit(n_probe)
        .select("cent_id")
    )

    # exact re-rank within probed cells: TakeOrderedAndProject, no full sort
    cand = assigned.join(F.broadcast(probes), "cent_id").join(F.broadcast(qv))
    top = (
        cand.select(
            F.col(id_col), F.round(cosine_col(F.col("v"), F.col("qv")), 4).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))  # k rows: trivial window
    return top.withColumn("rank", F.row_number().over(w))


def knn_brute_force(df: DataFrame, queries: DataFrame, k: int = 5,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """Batch k-NN: broadcast the (small) query set, cross-score, window top-k
    per query. The canonical 'scoring a probe set against the corpus' shape."""
    from pyspark.sql.window import Window

    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qemb = F.transform(F.col(qvec_col), lambda x: x.cast("double"))
    scored = df.select(F.col(id_col), emb.alias("v")).crossJoin(
        F.broadcast(queries.select(F.col(qid_col), qemb.alias("qv")))
    ).select(
        qid_col, id_col, F.round(cosine_col(F.col("v"), F.col("qv")), 4).alias("cosine")
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )
