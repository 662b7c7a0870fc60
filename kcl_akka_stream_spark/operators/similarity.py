"""Similarity search over the ``embeddings`` table (array<float> column).

Beyond-reference extension (no counterpart in /root/reference; the
BASELINE.json north star).  Tiers for the 100 TB posture:

- brute-force cosine top-k (the exactness baseline): query set x corpus,
  dot product via ``F.aggregate``/``zip_with`` -- JVM-side fold, no Python;
  the query side is broadcast so the corpus never shuffles;
- IVF (inverted-file) ANN: corpus pre-clustered (here: by its ``label``
  column as the deterministic cluster assignment, centroids = cluster
  means); a query probes only its nearest centroid's cluster -- the scan
  shrinks by the cluster fan-out, the classic coarse-quantizer trade.

Cosine math is done in float64 with a deterministic left-to-right fold, so
the DuckDB oracle (list_dot_product / explicit unnest-sum) matches exactly
after rounding to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential fold: sum_i a[i]*b[i] in float64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The (small) query set is broadcast; each corpus partition scores its rows
    against all queries map-side, then a per-query top-k window.  Rank ties
    break on neighbor id -> fully deterministic output."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = spread(corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(corpus: DataFrame, cluster_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-cluster mean vector (the IVF coarse quantizer).  Element-wise mean
    via posexplode + groupBy(cluster, pos) -- partial aggregation map-side,
    one shuffle keyed by (cluster, dim)."""
    ex = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    means = ex.groupBy("cluster", "pos").agg(F.avg(F.col("val").cast("double")).alias("m"))
    return (
        means.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos").alias("p"), F.col("m").alias("v")))),
                lambda s: s.getField("v"),
            ).alias("centroid")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF ANN: assign each query to its nearest centroid (broadcast the tiny
    centroid table), then search only that cluster's corpus slice.  The
    corpus-side join key is the cluster id -- partition pruning by cluster at
    scale (corpus stored partitioned by cluster)."""
    centroids = ivf_centroids(corpus, cluster_col, vec_col)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    q_scored = q.join(F.broadcast(centroids)).select(
        "q_id", "q_vec", "cluster", cosine(F.col("q_vec"), F.col("centroid")).alias("c_sim")
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("c_sim").desc(), F.col("cluster"))
    q_assigned = q_scored.withColumn("r", F.row_number().over(wq)).filter(F.col("r") == 1).drop("r", "c_sim")
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), F.col(cluster_col).alias("cluster")
    )
    scored = c.join(F.broadcast(q_assigned), on="cluster").filter(F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sign_lsh_bucket(vec: Column, dims: int = 8) -> Column:
    """Random-hyperplane LSH specialized to axis-aligned planes: bucket id =
    the sign bits of the first ``dims`` coordinates.  Deterministic and
    integer-exact, so the DuckDB oracle reproduces it; at scale the planes
    would be seeded random projections (same plan shape: map-only bucket
    assignment, no shuffle)."""
    bucket = None
    for d in range(dims):
        bit = F.when(F.element_at(vec, d + 1) >= 0, F.lit(2**d)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 4,
) -> DataFrame:
    """LSH-bucketed ANN: corpus and queries get a sign-LSH bucket map-side;
    a query is scored only against its own bucket's corpus slice.

    Scale shape: the bucket assignment is a narrow map (no shuffle); the
    join key is the bucket id, so with the corpus stored bucketed/partitioned
    by it the probe is a partition-pruned scan of ~n/2^dims rows instead of
    n.  The (small) query side is broadcast, corpus never shuffles."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        sign_lsh_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    c = spread(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        sign_lsh_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    lsh_dims: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by a coarse key so the
    self-join is per-block instead of O(n^2).

    ``lsh_dims`` is the 100 TB path: derive the blocking key from
    ``sign_lsh_bucket`` (a map-only projection of the vector itself), so no
    semantic column like the fixture's ``label`` is required -- near-dup
    vectors land in the same sign bucket with high probability, and the
    per-block join shrinks by the 2^dims bucket fan-out.  With
    ``lsh_dims=None`` the given ``block_col`` is trusted as the key.

    Per-block cost is quadratic in block size, so ``lsh_dims`` must grow
    with the corpus (buckets ~ n / target_block_size); ``max_block_size``
    is the deterministic guardrail for the skewed tail -- over-cap blocks
    are dropped whole BEFORE pair generation, the same bounded-fan-out
    discipline as the MinHash hot-bucket cap and the Jaccard df-cap
    (tools/scale_probe.py: uncapped 4-dim blocking went 45x wall at 10x
    data; capped stays linear)."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    corpus = spread(corpus)
    if lsh_dims is not None:
        corpus = corpus.withColumn(
            "__lsh_blk", sign_lsh_bucket(F.col(vec_col), lsh_dims)
        )
        block_col = "__lsh_blk"
    a = corpus.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    if max_block_size is not None:
        kept = (
            a.groupBy("blk")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n").between(2, max_block_size))
            .select("blk")
        )
        a = a.join(F.broadcast(kept), "blk")
    b = a.select(
        F.col("blk"), F.col("id_a").alias("id_b"), F.col("va").alias("vb")
    )
    return (
        a.join(b, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """The wide-embedding scale path for exact top-k: Arrow-batched
    mapInPandas scoring with one numpy matmul per batch instead of a
    per-element JVM fold -- at 1024+ dims the BLAS matmul wins by an order
    of magnitude.

    Exactness is preserved by per-partition pre-pruning: each partition
    emits, per query, every row whose similarity >= its k-th best (ties
    INCLUDED), so the global window over ~partitions x Q x k candidate rows
    reproduces the full-scan top-k bit-for-bit.  The query set ships in the
    task closure (the pandas-side equivalent of the broadcast in
    brute_force_topk); ``max_queries`` ENFORCES the small-by-contract claim
    -- an oversized query set fails loudly before the driver collect
    instead of OOMing the driver or silently shipping a giant closure."""
    import numpy as np
    import pandas as pd

    from kcl_akka_stream_spark.plans.hygiene import spread

    n_queries = queries.limit(max_queries + 1).count()
    if n_queries > max_queries:
        raise ValueError(
            f"brute_force_topk_vectorized: query set exceeds max_queries="
            f"{max_queries}; partition the query set or use ivf_topk/lsh_topk"
        )
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)  # (Q, D)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["n_id"].to_numpy()
            m = np.array(list(pdf["n_vec"]), dtype=np.float64)  # (B, D)
            m_norm = np.sqrt((m * m).sum(axis=1))
            sims = (m @ q_mat.T) / np.outer(m_norm, q_norm)  # (B, Q)
            out = []
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                col_c = col[cand_idx]
                kth = min(k, len(col_c))
                thresh = np.partition(col_c, -kth)[-kth]
                keep = cand_idx[col_c >= thresh]  # ties included -> exact
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": q_ids[qi],
                            "n_id": ids[keep],
                            "cos_sim": np.round(col[keep], 6),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    c = spread(corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")))
    scored = c.mapInPandas(score, schema="q_id long, n_id long, cos_sim double")
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: ``scale = max|x|/127``,
    ``q_i = round(x_i / scale)`` — the storage/serving compression step for
    embedding corpora (4x smaller, dot products within ~1% at these
    scales).  Output carries scalar checksums of the quantized vector
    (sum, L1) plus the L2 norm, so the math is verifiable cross-engine
    without hashing float arrays.  Map-only, zero shuffle; the fold is
    the sequential float64 convention (see module docstring)."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0.0))).otherwise(
        F.transform(v, lambda x: F.round(x.cast("double") / scale, 0))
    )
    return spread(df.select(id_col, vec_col)).select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.round(norm(v), 6).alias("l2_norm"),
        F.round(scale, 9).alias("scale"),
        F.aggregate(q, F.lit(0.0), lambda acc, x: acc + x)
        .cast("long")
        .alias("q_sum"),
        F.aggregate(q, F.lit(0.0), lambda acc, x: acc + F.abs(x))
        .cast("long")
        .alias("q_l1"),
    )
