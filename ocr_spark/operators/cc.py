"""Connected components over near-duplicate pair graphs.

The dedup operators (``operators/dedup.py``) stop at candidate PAIRS; a
production training-data pipeline needs CLUSTERS — "these 40 urls are all
the same boilerplate page" — and a keep-one-per-cluster selection. The
reference's analog is the per-key grouping that collapses duplicate
base-names before processing (one_key_process.py:820-826); at corpus scale
that generalizes to connected components over the pair graph.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
shuffle-friendly O(log n)-round method:

- large-star: every node points its LARGER neighbors at the minimum of
  its neighborhood (including itself);
- small-star: every node points its smaller-or-equal neighbors at that
  minimum.

Each half-round is one groupBy + one explode (two exchanges), carries only
(long, long) edges, and strictly shrinks the component diameter; at
convergence every node holds an edge to its component's minimum id. A
64-node path collapses in <= ~6 alternations (pinned by test), so even
adversarial chain-shaped duplicate clusters (A~B~C~... from transitive LSH
hits) cost O(log n) shuffles, never O(n).

Driver-side work per round is ONE scalar action (the changed-edge count for
the convergence check) — the standard iterate-until-fixpoint pattern; no
row data ever reaches the driver. Each round is eagerly localCheckpoint-ed
to truncate lineage (unbounded plan growth is the canonical iterative-
DataFrame failure mode).

The result is SQL-replayable: min-label components are exactly
"minimum reachable id" — a recursive CTE in the DuckDB twin
(``__spark_entry__._dedup_clusters_oracle``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ITER = 24    # >= log2(n) alternations for any real component size


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star half-round over an undirected edge list
    held as (u, v) rows. Returns the rewritten (u, v) edge list with
    u > v invariant (self-loops dropped)."""
    # symmetrize so every node sees its full neighborhood
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nbrs = sym.groupBy("u").agg(
        F.collect_set("v").alias("ns"),
    )
    m = F.array_min(F.array_append(F.col("ns"), F.col("u")))
    if large:
        targets = F.filter(F.col("ns"), lambda x: x > F.col("u"))
    else:
        targets = F.array_append(
            F.filter(F.col("ns"), lambda x: x <= F.col("u")), F.col("u")
        )
    return (
        nbrs.select(F.explode(targets).alias("u"), m.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = CC_MAX_ITER,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable from ``id``.
    Alternates large-star / small-star until the edge set is stable
    (checked with one count per round), then reads components off the
    final star edges."""
    work = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("u"),
            F.least(F.col(src), F.col(dst)).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev, prev_n = None, -1
    for _ in range(max_iter):
        # localCheckpoint (eager) BOTH materializes the round and truncates
        # the logical plan — without it each round's plan nests the previous
        # one and the driver OOMs on plan optimization after ~10 rounds (the
        # classic iterative-DataFrame pitfall; persist() alone does not cut
        # lineage). On a real cluster with executor loss concerns this would
        # be a reliable checkpoint to the table root instead.
        work = _star(_star(work, large=True), large=False).localCheckpoint(
            eager=True
        )
        n = work.count()
        if prev is not None and n == prev_n and work.exceptAll(prev).isEmpty():
            # equal cardinality + empty one-sided difference = equal sets
            # (both are distinct edge lists)
            break
        prev, prev_n = work, n
    # star edges point u -> component min v; the min itself appears only
    # on the v side, so union it back as its own representative
    comps = work.select(F.col("u").alias("id"), F.col("v").alias("component")).union(
        work.select(F.col("v").alias("id"), F.col("v").alias("component"))
    )
    return comps.groupBy("id").agg(F.min("component").alias("component"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster assignment + canonical-document selection for every row of
    ``df``: (id_col, component, is_keeper). Documents untouched by any
    pair are singleton components of themselves; the keeper of each
    component is its minimum id (deterministic, join-free: the component
    label IS the min). The pair graph is typically
    ``minhash_lsh_pairs(df)`` but any (id_a, id_b) edge list works."""
    comps = connected_components(pairs, src=src, dst=dst)
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    return (
        ids.join(comps, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("component"), F.col("id")).alias("component"),
        )
        .withColumn("is_keeper", (F.col(id_col) == F.col("component")))
    )
