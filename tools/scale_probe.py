"""Scale probe: time the heavy operator families at 1x and Nx the sf0.1
documents/embeddings tables and report the runtime ratio.

Replicas are deterministically perturbed (vowel rotation per replica) so
the Nx corpus has Nx distinct content -- shingle/bucket group sizes stay
realistic instead of degenerating into N-way duplicate cliques.

Usage: python tools/scale_probe.py [sf_dir] [replication]
Prints one line per (operator, scale) plus the Nx/1x ratio; a ratio near
the replication factor = linear scaling, the 100 TB prerequisite.
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from kcl_akka_stream_spark.operators import clustering as CL
from kcl_akka_stream_spark.operators import corpus as C
from kcl_akka_stream_spark.operators import dedup as D
from kcl_akka_stream_spark.operators import quality as Q
from kcl_akka_stream_spark.operators import similarity as S
from kcl_akka_stream_spark.operators import text as X
from kcl_akka_stream_spark.session import get_session
from kcl_akka_stream_spark.sources.batch import load_table

VOWELS = "aeiou"


def replicate_docs(docs: DataFrame, n: int) -> DataFrame:
    parts = []
    for i in range(n):
        rot = VOWELS[i % 5 :] + VOWELS[: i % 5]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), VOWELS, rot).alias("text"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def replicate_embeddings(emb: DataFrame, n: int) -> DataFrame:
    parts = []
    for i in range(n):
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(float(i)) * F.lit(1e-4)
                ).alias("embedding"),
                F.col("label"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def timed(fn, warm: bool = True) -> float:
    if warm:
        fn().write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        e = time.time() - t0
        best = e if best is None else min(best, e)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("scale_probe")
    docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb1 = load_table(spark, sf_dir, "embeddings")
    docs_n = replicate_docs(docs1, repl).localCheckpoint()
    emb_n = replicate_embeddings(emb1, repl).localCheckpoint()
    print(f"# corpus: {docs1.count()} docs (1x) vs {docs_n.count()} docs ({repl}x)")

    ops = {
        "dedup_exact": lambda d: D.exact_dedup(d),
        "dedup_simhash": lambda d: D.simhash(d),
        "dedup_minhash_lsh": lambda d: D.minhash_candidate_pairs(D.minhash_lsh_buckets(d)),
        "dedup_minhash_capped": lambda d: D.minhash_candidate_pairs(
            D.minhash_lsh_buckets(d), max_bucket_size=3
        ),
        "dedup_ngram_jaccard": lambda d: D.ngram_jaccard_pairs(d, threshold=0.5),
        "dedup_jaccard_capped": lambda d: D.ngram_jaccard_pairs(
            d, threshold=0.5, max_doc_freq=3
        ),
        "text_rolling_fp": lambda d: X.rolling_fingerprint(d),
        "quality_flags": lambda d: Q.gopher_quality_flags(d),
        "dedup_segments": lambda d: C.dedup_segments(d, seg_tokens=3, max_doc_freq=3),
    }
    for name, op in ops.items():
        t1 = timed(lambda: op(docs1))
        tn = timed(lambda: op(docs_n))
        print(f"{name:22s} 1x={t1:6.2f}s  {repl}x={tn:6.2f}s  ratio={tn / t1:5.2f}")

    def knn(e):
        return S.brute_force_topk_vectorized(e, e.filter(F.col("vec_id") < 5), k=5)

    def near_dup_lsh(e):
        return S.embedding_near_dup_pairs(e, threshold=0.35, lsh_dims=4)

    def near_dup_lsh_capped(e):
        # the production path (emb_near_dup_lsh_capped): dims derived from
        # the corpus count so blocks stay ~target-sized at any scale, cap
        # as the skewed-tail guard, Arrow per-block pair scoring
        return S.embedding_near_dup_pairs(
            e, threshold=0.35, target_block_size=32, max_block_size=200
        )

    def near_dup_lsh8(e):
        # fixed-dims comparison point (16 -> 256 blocks regardless of n)
        return S.embedding_near_dup_pairs(e, threshold=0.35, lsh_dims=8)

    def kmeans_assign(e):
        centroids = e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").cast("long").alias("cluster_id"),
            F.col("embedding").alias("centroid"),
        )
        return CL.kmeans_assign(e, centroids)

    for name, op, frames in (
        ("sim_topk_vectorized", knn, (emb1, emb_n)),
        ("emb_near_dup_lsh", near_dup_lsh, (emb1, emb_n)),
        ("emb_near_dup_capped", near_dup_lsh_capped, (emb1, emb_n)),
        ("emb_near_dup_lsh8", near_dup_lsh8, (emb1, emb_n)),
        ("kmeans_assign", kmeans_assign, (emb1, emb_n)),
        ("emb_quantize_int8", lambda e: S.quantize_int8(e), (emb1, emb_n)),
    ):
        t1 = timed(lambda: op(frames[0]))
        tn = timed(lambda: op(frames[1]))
        print(f"{name:22s} 1x={t1:6.2f}s  {repl}x={tn:6.2f}s  ratio={tn / t1:5.2f}")


if __name__ == "__main__":
    main()
