"""Embedding clustering: distributed Lloyd's k-means on DataFrames.

Beyond-reference extension (no counterpart in /root/reference).
Large-scale training-data-pipeline surface: corpus clustering for
diversity sampling / semantic dedup / IVF coarse quantizers
(operators/similarity.py ``ivf_topk`` consumes exactly this shape).

Scale shape per iteration:
- assignment: centroids (k rows) broadcast; each partition scores its
  vectors against all k map-side — the corpus never shuffles;
- update: posexplode to (cluster, dim, value) then one map-side
  combinable avg keyed by (cluster, dim) — shuffle rows are k × d after
  partial aggregation, not N × d.

The distance fold is float64 left-to-right (operators/similarity.py
convention) so the DuckDB oracle reproduces assignment exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kcl_akka_stream_spark.operators.similarity import dot


def _dist2(a, b):
    """Squared L2 distance, sequential float64 fold."""
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return dot(diff, diff)


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2, ties broken on
    the lower cluster id).  Centroids broadcast; one agg keyed by vector."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    c = centroids.select(
        F.col(centroid_id_col).alias("__cid"), F.col(centroid_vec_col).alias("__cvec")
    )
    scored = spread(vectors.select(id_col, vec_col)).crossJoin(F.broadcast(c)).select(
        id_col,
        F.col("__cid"),
        _dist2(F.col(vec_col), F.col("__cvec")).alias("__d2"),
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("__d2"), F.col("__cid"))).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.__cid").alias("cluster_id"),
        F.round(F.col("__best.__d2"), 6).alias("dist2"),
    )


def kmeans_update(
    vectors: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recompute centroids as the element-wise mean of each cluster's
    vectors.  posexplode → avg keyed by (cluster, dim) combines map-side;
    the rebuilt centroid arrays are k × d rows total."""
    joined = vectors.join(assignment.select(id_col, "cluster_id"), id_col)
    dims = joined.select(
        "cluster_id", F.posexplode(vec_col).alias("dim", "val")
    )
    means = dims.groupBy("cluster_id", "dim").agg(
        F.avg(F.col("val").cast("double")).alias("mval")
    )
    return (
        means.groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mval"))),
                lambda s: s.getField("mval"),
            ).alias("centroid")
        )
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means: init = the k lowest-id vectors
    (reproducible across engines/runs — swap in k-means|| off this
    skeleton when seeding quality matters).  Returns (assignment,
    centroids).  Each iteration is one broadcast-assign + one combinable
    update; centroids are localCheckpointed so the lineage stays flat
    across iterations (the connected-components discipline,
    operators/dedup.py)."""
    w = vectors.orderBy(id_col).limit(k)
    centroids = w.select(
        F.col(id_col).cast("long").alias("cluster_id"),
        F.col(vec_col).alias("centroid"),
    ).localCheckpoint(eager=True)
    assignment = kmeans_assign(vectors, centroids, id_col, vec_col)
    for _ in range(iters - 1):
        centroids = kmeans_update(vectors, assignment, id_col, vec_col).localCheckpoint(
            eager=True
        )
        assignment = kmeans_assign(vectors, centroids, id_col, vec_col)
    return assignment, centroids


def pq_assign(
    vectors: DataFrame,
    codebook_vectors: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding (Jegou et al. 2011, public): split
    each vector into ``m`` contiguous subvectors and assign each to its
    nearest code in that subspace's codebook -- the compression step of
    IVF-PQ, the index family serving billion-vector ANN in production.
    An encoded vector is m small integers (here m x 3 bits) instead of
    d floats; distance evaluation against the codes happens per-subspace
    via lookup tables.

    ``codebook_vectors`` supplies the codebooks: its rows' slices are
    the per-subspace codes, keyed by its ``id_col`` (deterministic here;
    a k-means-trained codebook drops into the same shape -- see
    ``kmeans``).  Assignment reuses ``kmeans_assign`` per subspace:
    codebooks broadcast, the corpus never shuffles, one vector-keyed agg
    per subspace.  Ragged vectors (length not divisible by m) raise.

    Output: (id, sub_id, code, dist2) -- one row per (vector, subspace),
    dist2 = squared L2 to the chosen code in that subspace, rounded 6dp.
    """
    from functools import reduce

    probe = vectors.select(F.size(vec_col).alias("d")).first()
    dims = probe["d"] if probe is not None else 0
    if dims % m != 0:
        raise ValueError(
            f"pq_assign: vector length {dims} not divisible by m={m}"
        )
    sub = dims // m
    outs = []
    for s in range(m):
        sl = F.slice(F.col(vec_col), s * sub + 1, sub)
        vs = vectors.select(F.col(id_col), sl.alias("__subvec"))
        cs = codebook_vectors.select(
            F.col(id_col).cast("long").alias("code"), sl.alias("__subcode")
        )
        assigned = kmeans_assign(
            vs,
            cs,
            id_col=id_col,
            vec_col="__subvec",
            centroid_id_col="code",
            centroid_vec_col="__subcode",
        )
        outs.append(
            assigned.select(
                F.col(id_col),
                F.lit(s).cast("long").alias("sub_id"),
                F.col("cluster_id").cast("long").alias("code"),
                "dist2",
            )
        )
    return reduce(DataFrame.unionByName, outs)
