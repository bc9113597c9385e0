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


def hyperplanes(n_planes: int = N_PLANES, dim: int = 64,
                seed: int = PLANE_SEED) -> list[list[float]]:
    """The seeded pseudo-random hyperplanes as plain Python floats — shared
    by the Spark expression and the SQL oracle (which inlines them as
    literals), so both engines bucket identically."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                            vec_col: str = "embedding", id_col: str = "vec_id",
                            n_planes: int = N_PLANES, dim: int = 64,
                            max_bucket: int = 256,
                            multiprobe: bool = True) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Bucket key = integer of sign bits of <v, plane_j> for deterministic
    seeded hyperplanes (``hyperplanes()``; ``dim`` is passed in — no driver
    probe of the data). Candidate pairs share a bucket under 1-bit-flip
    multiprobe (every vector probes its own bucket plus the ``n_planes``
    buckets one sign-flip away, so any pair whose sign vectors differ in at
    most one plane is found); candidates are verified with exact cosine.

    Scale guards (the 100 TB shape):
    - buckets larger than ``max_bucket`` are dropped before pairing — a
      boilerplate-identical embedding cluster would otherwise contribute k^2
      pairs on one partition; dropped-bucket recall comes back through the
      multiprobe flips (mirror of the minhash cap, dedup.py);
    - the probe join carries only (id, bucket ints); vectors re-join only
      for the deduplicated candidate set.
    """
    planes = hyperplanes(n_planes, dim)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = sum(
        (
            F.when(
                _dot(emb, F.array(*[F.lit(p) for p in planes[j]])) >= 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j in range(n_planes)
        ),
        F.lit(0),
    ).cast("long")

    keyed = df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))
    ok = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= max_bucket)
        .select("bucket")
    )
    base = keyed.join(ok, "bucket", "left_semi")

    probe_buckets = [F.col("bucket")]
    if multiprobe:
        probe_buckets += [
            F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
        ]
    probes = (
        keyed.select("id", F.explode(F.array(*probe_buckets)).alias("bucket"))
        .join(ok, "bucket", "left_semi")
    )

    cand = (
        probes.alias("p")
        .join(
            base.alias("b"),
            (F.col("p.bucket") == F.col("b.bucket")) & (F.col("p.id") < F.col("b.id")),
        )
        .select(F.col("p.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), emb.alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), emb.alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _assign_cells(corpus: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """argmax-cosine cell assignment via broadcast join + max_by partial
    aggregation (map-side combine; ties -> lowest cent_id). corpus shuffles
    once on the id, never N^2."""
    scored = corpus.join(F.broadcast(cents))
    cos = cosine_col(F.col("v"), F.col("cv"))
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col("cent_id"), F.struct(cos.alias("c"), (-F.col("cent_id")).alias("t"))
        ).alias("cent_id"),
        F.first("v").alias("v"),  # constant within the group (one vector per id)
    )


def ivf_centroids(df: DataFrame, n_centroids: int = 16, n_iters: int = 1,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Coarse quantizer for IVF: seeded with the first ``n_centroids``
    corpus vectors, then refined with ``n_iters`` fixed Lloyd iterations —
    assign every vector to its best-cosine cell, recompute each cell's
    centroid as the element-wise mean. Entirely DataFrame expressions
    (posexplode -> grouped avg -> array rebuild), so the result is a pure,
    SQL-replayable function of the data (no sampling, no RNG), yet the
    cells track the data distribution instead of whatever the first
    ``n_centroids`` rows happened to be (the degenerate-quantizer fix).

    Centroid components are rounded to 6 dp on both engines so sub-ulp
    summation-order differences in the distributed mean cannot flip a
    downstream argmax. Cells that attract no vectors die (standard Lloyd).
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = df.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), emb.alias("cv")
    )
    corpus = df.select(F.col(id_col), emb.alias("v"))
    for _ in range(n_iters):
        assigned = _assign_cells(corpus, cents, id_col)
        by_dim = assigned.select(
            "cent_id", F.posexplode("v").alias("pos", "x")
        ).groupBy("cent_id", "pos").agg(F.round(F.avg("x"), 6).alias("m"))
        cents = by_dim.groupBy("cent_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
    return cents


def ivf_topk(df: DataFrame, k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id: int = 0, n_iters: int = 1) -> DataFrame:
    """IVF-style approximate nearest neighbour: the scale path for ANN.

    Coarse quantizer: ``ivf_centroids`` (deterministic seeded Lloyd — a
    pure function of the data, so the oracle replays it exactly). Every
    vector is assigned to its best-cosine cell via a broadcast join +
    ``max_by`` partial aggregation. The query probes its ``n_probe``
    nearest cells and re-ranks exactly within them — at 100 TB only
    ~n_probe/n_centroids of the corpus is scored against the query instead
    of all of it.

    Output: (vec_id, cosine, rank) — top-``k`` within the probed cells.
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = ivf_centroids(df, n_centroids, n_iters, vec_col, id_col)
    qv = df.where(F.col(id_col) == query_id).select(emb.alias("qv"))

    assigned = _assign_cells(df.select(F.col(id_col), emb.alias("v")), cents, id_col)

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


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   n_centroids: int = 16, n_iters: int = 1,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   max_cluster: int = 1024) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the deterministic seeded-Lloyd
    quantizer (:func:`ivf_centroids` — pure function of the data, so the
    DuckDB twin replays it exactly), then compare pairs ONLY within a
    cluster and mark every vector that has a lower-id cluster-mate with
    cosine >= ``threshold`` as a duplicate of its lowest such mate
    ("keep first" — deterministic, order-free).

    Output: one row per input vector (never-drop contract) —
    (id_col, cent_id, is_dup, dup_of) with dup_of NULL for keepers.

    Scale shape: the quadratic step is per-cluster, so cost is
    sum(c_i^2) — production sizes ``n_centroids ~ N / target_cluster`` so
    clusters stay small (the paper runs 50k clusters for LAION-440M);
    clusters larger than ``max_cluster`` are excluded from pairing (their
    members all come back as keepers) — the same disclosed hot-bucket cap
    as the minhash/LSH paths, preventing a degenerate cluster from
    contributing k^2 pairs on one partition. The pair join shuffles
    (cent_id, id, vector) once; centroids move only by broadcast.
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = ivf_centroids(df, n_centroids, n_iters, vec_col, id_col)
    assigned = _assign_cells(
        df.select(F.col(id_col), emb.alias("v")), cents, id_col
    )

    ok = (
        assigned.groupBy("cent_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= max_cluster)
        .select("cent_id")
    )
    in_play = assigned.join(F.broadcast(ok), "cent_id", "left_semi")
    a = in_play.select(
        "cent_id", F.col(id_col).alias("id_a"), F.col("v").alias("va")
    )
    b = in_play.select(
        "cent_id", F.col(id_col).alias("id_b"), F.col("v").alias("vb")
    )
    dup_of = (
        a.join(b, "cent_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cosine_col(F.col("va"), F.col("vb")), 4) >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        assigned.join(dup_of, assigned[id_col] == dup_of["id_b"], "left")
        .select(
            F.col(id_col),
            F.col("cent_id"),
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.col("dup_of"),
        )
    )


def ivf_assign(df: DataFrame, cents: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Assign vectors to FROZEN centroids — the incremental ANN
    maintenance path: at ingest scale the quantizer is fitted once on the
    committed corpus, persisted (iceberg-lite — the centroid table is
    n_centroids rows), and every new batch is assigned to the frozen
    cells without touching committed vectors; refits are periodic policy,
    not per-batch work. Completes the incremental family: exact dedup
    gates on persisted fingerprints, near-dup on persisted signatures
    (operators/incremental.py), ANN on persisted centroids.

    Returns (id_col, cent_id, cosine): the argmax-cosine cell per vector
    (ties -> lowest cent_id) and the winning cosine rounded to 4 dp — the
    drift signal (falling per-cell mean cosine says the frozen quantizer
    no longer fits the incoming distribution).

    Shape: one broadcast of the centroid table, one map-side-combined
    ``max_by`` aggregation — the new batch shuffles once on its id, the
    committed corpus is never read. Exact DuckDB twin
    (``__spark_entry__._ivf_assign_oracle``)."""
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = df.select(F.col(id_col), emb.alias("v")).join(F.broadcast(cents))
    cos = cosine_col(F.col("v"), F.col("cv"))
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col("cent_id"), F.struct(cos.alias("c"), (-F.col("cent_id")).alias("t"))
        ).alias("cent_id"),
        F.round(F.max(cos), 4).alias("cosine"),
    )


def cluster_balanced_sample(df: DataFrame, per_cluster: int = 8,
                            n_centroids: int = 16, n_iters: int = 1,
                            vec_col: str = "embedding", id_col: str = "vec_id",
                            seed: str = "cbal-1") -> DataFrame:
    """Cluster-balanced corpus selection (the DCLM/DataComp curation shape:
    embed -> cluster -> sample per cluster so no dense region of embedding
    space dominates the training mix): assign every vector to its
    seeded-Lloyd cell (:func:`ivf_centroids` — a pure, SQL-replayable
    function of the data), then keep at most ``per_cluster`` vectors per
    cell, chosen by a deterministic md5-uniform key so the draw is
    reproducible and engine-independent.

    Output: one row per input vector (never-drop contract) —
    (id_col, cent_id, pick_key, pick_rank, picked); ``picked`` marks the
    selected subset, everything else stays auditable.

    Scale shape: clustering is the broadcast-centroid + ``max_by``
    assignment every IVF path here uses (one corpus shuffle); the
    per-cluster rank is a window partitioned by cent_id — production
    sizes ``n_centroids ~ N / target_cluster`` (the SemDeDup deployment
    argument, arXiv:2303.09540 §3), so per-partition state is the bounded
    cluster size, never the corpus. The pick key is data-independent
    (pure function of the id), so sampling stays stable under re-runs
    and incremental appends.

    Reference analog: the rule table selecting a bounded subset of
    candidate regions per layout class (one_key_process.py:1146-1165) —
    here the "layout class" is a learned embedding cell."""
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = ivf_centroids(df, n_centroids, n_iters, vec_col, id_col)
    assigned = _assign_cells(
        df.select(F.col(id_col), emb.alias("v")), cents, id_col
    )
    key = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(1_000_000),
    )
    w = Window.partitionBy("cent_id").orderBy(F.asc("pick_key"), F.asc(id_col))
    return (
        assigned.select(id_col, "cent_id", key.alias("pick_key"))
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .withColumn("picked", F.col("pick_rank") <= per_cluster)
    )


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


def sq_bounds(df: DataFrame, dim: int = 64,
              vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (min, scale) for int8 scalar quantization, computed in
    ONE pass as 2*dim agg expressions (partial aggregation map-side — no
    explode, no per-dim shuffle; the result is a single driver row of
    2*dim doubles, bounded by the embedding width, like the centroid
    collect in ``ivf_centroids``). ``scale = (max-min)/255`` per dim; a
    constant dimension gets scale 0 and quantizes to code 0."""
    row = df.agg(
        *[F.min(F.col(vec_col)[i].cast("double")).alias(f"mn{i}") for i in range(dim)],
        *[F.max(F.col(vec_col)[i].cast("double")).alias(f"mx{i}") for i in range(dim)],
    ).collect()[0]
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    scales = [(float(row[f"mx{i}"]) - mins[i]) / 255.0 for i in range(dim)]
    return mins, scales


def sq_scores(df: DataFrame, query_vec: list[float],
              mins: list[float], scales: list[float],
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Asymmetric scalar-quantized scoring: each corpus vector is encoded
    to int8 codes against broadcast per-dim (min, scale) bounds, then
    scored against the FULL-precision query via the reconstruction
    ``min_d + code_d * scale_d`` — the asymmetric-distance trick (query
    stays exact, only the corpus is lossy), standard in IVF/SQ engines.

    Why it matters at 100 TB: int8 codes cut the embedding column 4x —
    scan bytes, shuffle bytes, and cache all shrink by the same factor —
    while asymmetric scoring keeps most of the accuracy. Plan shape: pure
    per-row expressions over broadcast literal arrays (zero shuffle, zero
    Python); returns (id, score_sq) with the quantized dot rounded to 4 dp
    for cross-engine parity. Codes round half-up on the non-negative
    shifted value, identically in the SQL twin."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    mn = F.array(*[F.lit(float(v)) for v in mins])
    sc = F.array(*[F.lit(float(v)) for v in scales])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # code_d = clamp(round((x_d - mn_d) / sc_d), 0, 255); recon = mn_d + code_d*sc_d
    code = F.zip_with(
        emb,
        F.sequence(F.lit(0), F.lit(len(mins) - 1)),
        lambda x, i: F.when(
            F.element_at(sc, i + 1) > 0,
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.round((x - F.element_at(mn, i + 1)) / F.element_at(sc, i + 1), 0),
                ),
            ),
        ).otherwise(F.lit(0.0)),
    )
    recon = F.zip_with(
        code,
        F.sequence(F.lit(0), F.lit(len(mins) - 1)),
        lambda c, i: F.element_at(mn, i + 1) + c * F.element_at(sc, i + 1),
    )
    return df.select(
        F.col(id_col),
        F.round(_dot(q, recon), 4).alias("score_sq"),
    )


def sq_topk(df: DataFrame, query_vec: list[float], k: int = 10, dim: int = 64,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Int8 scalar-quantized top-k with exact-rescore disclosure: rank by
    the quantized score (TakeOrderedAndProject — partition-local top-k,
    driver merge, no full-table shuffle), then join the k winners back to
    exact cosine so the output carries the quantization error per hit.
    Two passes over the corpus (bounds, then score) — both full scans with
    map-side-only work, the shape that survives 1000 executors."""
    mins, scales = sq_bounds(df, dim=dim, vec_col=vec_col)
    approx = (
        sq_scores(df, query_vec, mins, scales, vec_col=vec_col, id_col=id_col)
        .orderBy(F.desc("score_sq"), F.asc(id_col))
        .limit(k)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    exact = df.select(
        F.col(id_col), F.round(cosine_col(emb, q), 4).alias("cosine_exact")
    )
    # rescore join: the k winners are the BROADCAST side of an inner join
    # (every winner exists in the corpus), so the corpus streams map-side —
    # a left join here would force the big side to be the build side
    return (
        exact.join(F.broadcast(approx), id_col, "inner")
        .select(id_col, "score_sq", "cosine_exact")
        .orderBy(F.desc("score_sq"), F.asc(id_col))
    )


RP_K = 8            # projected dimensionality for the shipped query
RP_SEED = 1337      # seed for the shared ±1 projection matrix


def rp_matrix(k: int = RP_K, dim: int = 64,
              seed: int = RP_SEED) -> list[list[float]]:
    """The seeded ±1 signed-projection matrix (Achlioptas' database-
    friendly Johnson-Lindenstrauss construction) as plain Python floats —
    shared by the Spark expression and the SQL oracle (inlined as
    literals), so both engines project identically."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        [1.0 if x >= 0 else -1.0 for x in row]
        for row in rng.standard_normal((k, dim))
    ]


def random_projection(df: DataFrame, k: int = RP_K, dim: int = 64,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      seed: int = RP_SEED) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    embedding to ``k`` dims via the seeded ±1 matrix, scaled by
    1/sqrt(k) so pairwise distances are preserved in expectation — the
    scale path BEFORE the similarity family (project 64 -> 8 once, then
    LSH/IVF/brute-force all read 8-double rows: an 8x smaller scan and
    shuffle for every downstream candidate join, with the JL guarantee
    bounding the distance distortion).

    Returns LONG format (id, j, p): one row per projected coordinate,
    4-dp rounded — array-free so the driver's value-hash and the DuckDB
    twin compare scalars. Shape: the matrix rides the plan as literals
    (no broadcast, no Python); one codegen projection + posexplode, zero
    shuffle, streaming-safe. Each coordinate is a left-associated
    zip_with/aggregate fold, matching the oracle's unrolled sum term for
    term (the embedding_neardup float discipline)."""
    import math

    signs = rp_matrix(k, dim, seed)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.lit(math.sqrt(float(k)))
    projs = F.array(
        *[
            F.round(
                _dot(emb, F.array(*[F.lit(s) for s in row])) / scale, 4
            )
            for row in signs
        ]
    )
    return df.select(F.col(id_col), F.posexplode(projs).alias("j", "p")).select(
        id_col, F.col("j").cast("long").alias("j"), "p"
    )


PQ_M = 8            # subspaces (64-dim embeddings -> 8 dims each)
PQ_K = 16           # codes per subspace (one byte would hold 256)


def _sq_l2(a, b):
    """Squared Euclidean distance via three dot products — the form both
    engines can evaluate from ``list_dot_product`` primitives."""
    return _dot(a, a) - 2.0 * _dot(a, b) + _dot(b, b)


def _pq_subvectors(df: DataFrame, m: int, sub_dim: int,
                   vec_col: str, id_col: str) -> DataFrame:
    """(id, sub, sv): each embedding split into ``m`` contiguous
    ``sub_dim``-wide subvectors — one generate projection, no shuffle."""
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    parts = F.array(*[
        F.struct(
            F.lit(mi).alias("sub"),
            F.slice(emb, mi * sub_dim + 1, sub_dim).alias("sv"),
        )
        for mi in range(m)
    ])
    return df.select(
        F.col(id_col), F.explode(parts).alias("p")
    ).select(id_col, F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))


def _pq_assign(subs: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Per (id, sub) the nearest codebook entry (squared-L2 argmin, ties
    to the lowest cent_id) — broadcast codebook join + min_by partial
    aggregation, the `_assign_cells` discipline per subspace."""
    d = _sq_l2(F.col("sv"), F.col("cv"))
    return (
        subs.join(F.broadcast(cents), "sub")
        .groupBy(id_col, "sub")
        .agg(
            F.min_by(
                "cent_id", F.struct(d.alias("d"), F.col("cent_id").alias("t"))
            ).alias("cent_id"),
            F.first("sv").alias("sv"),
        )
    )


def pq_codebooks(df: DataFrame, m: int = PQ_M, k: int = PQ_K,
                 n_iters: int = 1, dim: int = 64,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Product-quantization codebooks (Jégou et al.): an independent
    ``k``-entry codebook per contiguous subspace, fit with the engine's
    deterministic seeded Lloyd (seeds = the first ``k`` vectors'
    subvectors, ``n_iters`` refinements, 6-dp means) — a pure,
    SQL-replayable function of the data like ``ivf_centroids``, but all
    ``m`` subspaces train in ONE frame keyed by the sub column (no
    per-subspace jobs). Returns (sub, cent_id, cv)."""
    sub_dim = dim // m
    subs = _pq_subvectors(df, m, sub_dim, vec_col, id_col)
    cents = subs.where(F.col(id_col) < k).select(
        "sub", F.col(id_col).alias("cent_id"), F.col("sv").alias("cv")
    )
    for _ in range(n_iters):
        assigned = _pq_assign(subs, cents, id_col)
        by_dim = assigned.select(
            "sub", "cent_id", F.posexplode("sv").alias("pos", "x")
        ).groupBy("sub", "cent_id", "pos").agg(
            F.round(F.avg("x"), 6).alias("mv")
        )
        cents = by_dim.groupBy("sub", "cent_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s["mv"],
            ).alias("cv")
        )
    return cents


def pq_topk(df: DataFrame, k: int = 10, m: int = PQ_M, n_codes: int = PQ_K,
            dim: int = 64, vec_col: str = "embedding",
            id_col: str = "vec_id", query_id: int = 0) -> DataFrame:
    """PQ asymmetric-distance top-k — the memory-scale ANN path: each
    vector is stored as ``m`` small codes (8 bytes here vs 256 for the
    raw floats), and query scoring is a LOOKUP-TABLE sum, never a
    full-vector dot product. The query builds an (m x n_codes) distance
    table against the codebooks (tiny, broadcast); each vector's
    approximate distance is the sum of its codes' table entries — at
    100 TB the scan reads codes, not vectors, and the per-row work is m
    additions. Returns (id, adist, rank), ascending approximate squared
    L2, 4-dp, id tie-break. Compose with an exact rescore of the top
    candidates (the sq_topk pattern) when recall matters."""
    sub_dim = dim // m
    cents = pq_codebooks(df, m, n_codes, 1, dim, vec_col, id_col)
    subs = _pq_subvectors(df, m, sub_dim, vec_col, id_col)
    codes = _pq_assign(subs, cents, id_col).select(
        id_col, "sub", F.col("cent_id").alias("code")
    )
    qsubs = subs.where(F.col(id_col) == query_id).select(
        "sub", F.col("sv").alias("qv")
    )
    dtab = cents.join(F.broadcast(qsubs), "sub").select(
        "sub", "cent_id", _sq_l2(F.col("cv"), F.col("qv")).alias("d")
    )
    approx = (
        codes.join(
            F.broadcast(dtab),
            (codes.sub == dtab.sub) & (codes.code == dtab.cent_id),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 4).alias("adist"))
    )
    top = approx.orderBy(F.asc("adist"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.asc("adist"), F.asc(id_col))  # k rows: trivial
    return top.withColumn("rank", F.row_number().over(w))
