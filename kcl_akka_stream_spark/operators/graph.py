"""Iterative graph algorithms over DataFrames (PageRank).

The third iterative operator family next to connected components
(operators/dedup.py pointer-jumping) and Lloyd's k-means
(operators/clustering.py): rank propagation with a damping factor
(Brin & Page 1998, public).  Spark-first form: the edge list is a
DataFrame reused every round (cache it), each iteration is ONE
contribution aggregation shuffle keyed by destination, and ranks stay
node-sized.  No GraphX/RDD -- Catalyst handles the joins, and AQE
re-plans each round at runtime sizes.

Cross-engine exactness: ranks are integer MICRO-units throughout --
per-edge contribution is (rank * w) div deg (all BIGINT, positive, so
Spark's truncating div == DuckDB's flooring //), and damping is
150_000 + (85 * inflow) div 100.  Integer sums are partial-agg-order
independent, so an unrolled SQL oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
BASE = 150_000  # (1 - d) * SCALE with d = 0.85


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Damped PageRank over a weighted directed edge list (src, dst, w).

    EAGER: calling this runs the iterations immediately (it materializes
    the final ranks so the data-sized edge cache can be released before
    returning); the returned DataFrame is a small cached node-sized
    relation, not a lazy plan.

    Every node reachable as a destination must also appear as a source
    (no dangling redistribution is performed) -- bipartite co-occurrence
    graphs symmetrized as (a->b, b->a) satisfy this by construction.
    Returns (node, rank_micro) for every node.

    Scale: edges is the data-sized relation.  The degree column is
    attached ONCE and the (src, dst, w, deg) relation is cached already
    HASH-PARTITIONED BY src -- each iteration's rank-attach join reuses
    that partitioning and shuffles only the node-sized ranks, never the
    edges (without the pre-partition, every iteration re-exchanges the
    full edge relation into its sort-merge join: 3 extra data-sized
    shuffles for 3 iterations).  Per-iteration cost: one node-sized
    ranks exchange + one dst-keyed agg shuffle.
    """
    edges = edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    deg = edges.groupBy("src").agg(F.sum("w").alias("deg"))
    ew = edges.join(deg, "src").repartition("src").cache()
    ranks = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = ew.join(ranks, ew.src == F.col("node")).select(
            "dst", F.expr("(r * w) div deg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(BASE) + F.expr("(85 * inflow) div 100")).alias("r"),
            )
        )
    # Materialize the final node-sized ranks eagerly so the DATA-sized
    # edge cache can be released before returning -- otherwise every
    # call leaks a cached copy of the edge relation until LRU eviction
    # (only the small per-call ranks cache remains resident).
    out = ranks.select("node", F.col("r").alias("rank_micro")).cache()
    out.count()
    ew.unpersist()
    return out
