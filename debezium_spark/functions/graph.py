"""Distributed graph analytics over pair/edge frames.

The dedup pipeline's pair detectors (ngram Jaccard, MinHash-LSH, winnowing)
emit EDGE LISTS; `dedup.connected_components` collapses them to clusters.
This module adds the ranking step: PageRank over the duplicate/similarity
graph surfaces the most-central documents of a cluster family (the canonical
copy to KEEP, boilerplate hubs to inspect), and degree statistics are the
cheap skew probe before any per-node iteration.

Everything here is exact integer fixed-point — PageRank's per-edge
contribution is an INTEGER division of scaled rank by out-degree, so
per-round sums are order-independent BIGINT additions, bit-identical on any
engine/partitioning (a double-precision PageRank cannot be hash-gated: float
summation order varies by partition). Iterations are FIXED-count (the
convergence budget is part of the contract), which also makes the oracle an
unrolled SQL expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # rank mass carried as BIGINT trillionths


def degree_stats(
    edges: DataFrame, *, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node degree over the symmetrized edge list: (id, degree). One
    map-side-combined count shuffle — run it before any per-node iteration
    to spot hub nodes (a 10^6-degree boilerplate hub dominates every
    neighbor aggregation downstream)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Exact fixed-point PageRank over the UNDIRECTED pair graph:
    ``(id, rank_scaled)`` after a fixed number of power iterations.

    Arithmetic contract (what makes this oracle-checkable): ranks are
    BIGINTs in units of 1/scale; each round every node sends
    ``rank_scaled DIV degree`` along each edge (integer division — the same
    value on every edge, order-independent), receives the exact BIGINT sum,
    and updates to ``((den-num)*scale) DIV (den*N) + (num*sum_in) DIV den``
    with damping as the exact rational num/den (default 85/100). No float
    touches any corpus-sized path, so results are bit-identical across
    engines and partitionings. The truncation bias of the two integer
    divisions is < (degree+1)/scale per node per round — at scale=10^12,
    noise in the 12th decimal, while the determinism it buys is the whole
    point.

    Scale shape (same discipline as dedup.connected_components): the edge
    list is checkpointed once and re-read every round; each round is one
    join of current ranks onto edges (rank frame is slim: two BIGINTs per
    node) + one map-side-combined SUM keyed by the receiving node (fan-in =
    degree, never component size), then an eager localCheckpoint to
    truncate the self-referencing lineage — an untruncated loop doubles the
    plan per round. Fixed ``iterations`` (no convergence collect) keeps the
    oracle expressible as unrolled SQL; for production use on a real
    cluster, point setCheckpointDir at durable storage and raise
    iterations. Nodes with no edges are absent by construction (a pair
    graph only names paired nodes); singletons would each hold the
    uniform base rank.

    Reference note: not a Debezium operator — this extends the
    training-data dedup family (keep-representative selection by
    centrality rather than min-id).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 < damping_num <= damping_den:
        raise ValueError("need 0 < damping_num <= damping_den")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # re-read every round
    )
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    n_nodes = deg.count()  # bounded driver scalar (node count, not data)
    if n_nodes == 0:
        return deg.select("id", F.lit(0).cast("long").alias("rank_scaled"))
    base = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)
    ranks = deg.select(
        "id", "degree", F.lit(scale // n_nodes).cast("long").alias("rank_scaled")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            sym.join(
                ranks.select(
                    F.col("id").alias("a"),
                    F.expr("rank_scaled div degree").alias("c"),
                ),
                "a",
            )
            .groupBy(F.col("b").alias("id"))
            .agg(F.sum("c").alias("sum_in"))
        )
        ranks = (
            ranks.join(contrib, "id", "left")
            .select(
                "id",
                "degree",
                (
                    F.lit(base)
                    + F.expr(f"({damping_num} * coalesce(sum_in, 0L)) div {damping_den}")
                ).cast("long").alias("rank_scaled"),
            )
            .localCheckpoint()  # eager: truncate self-referencing lineage
        )
    return ranks.select("id", "rank_scaled")
