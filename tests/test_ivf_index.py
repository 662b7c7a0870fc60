"""IVF prebuilt-index lifecycle (VERDICT r6 #7): the on-disk index is
keyed by the corpus fixture's (path, size, mtime_ns) --
``queries/pipeline.py::_ensure_ivf_index``.  Locked here:

- reuse-without-rebuild: N probe queries against an unchanged corpus
  amortize ONE build (the whole point of the build/probe split);
- rebuild-on-change: a modified corpus must trigger a fresh build, and a
  stale index must never serve -- the probe result reflects the NEW
  corpus contents.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from kcl_akka_stream_spark.operators import similarity as S
from kcl_akka_stream_spark.queries import pipeline as P

SF001 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _make_fixture_dir(tmp_path, spark, n_vecs: int) -> str:
    """A private sf_dir whose embeddings.parquet we are allowed to mutate
    (the real testdata is read-only)."""
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    emb = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    # write as a SINGLE file so (size, mtime) keying applies to one path
    emb.filter(F.col("vec_id") < n_vecs).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stage"))
    part = [
        f
        for f in os.listdir(str(tmp_path / "stage"))
        if f.endswith(".parquet")
    ][0]
    shutil.copyfile(
        str(tmp_path / "stage" / part), os.path.join(d, "embeddings.parquet")
    )
    return d


def test_index_reused_without_rebuild_and_rebuilt_on_corpus_change(
    spark, tmp_path, monkeypatch
):
    builds = []
    real_build = S.ivf_build

    def counting_build(corpus, index_dir, **kw):
        builds.append(index_dir)
        return real_build(corpus, index_dir, **kw)

    monkeypatch.setattr(S, "ivf_build", counting_build)

    sf = _make_fixture_dir(tmp_path, spark, n_vecs=60)
    idx1 = P._ensure_ivf_index(spark, sf)
    assert len(builds) == 1
    # second and third calls: same fixture -> same index dir, ZERO rebuilds
    assert P._ensure_ivf_index(spark, sf) == idx1
    assert P._ensure_ivf_index(spark, sf) == idx1
    assert len(builds) == 1, "unchanged corpus must reuse the stored index"

    # index contents cover exactly the 60-vector corpus
    n_indexed_1 = spark.read.parquet(f"{idx1}/corpus").count()
    assert n_indexed_1 == 60

    # mutate the corpus (different row count -> different size and mtime)
    sf2_src = _make_fixture_dir(tmp_path / "v2", spark, n_vecs=40)
    shutil.copyfile(
        os.path.join(sf2_src, "embeddings.parquet"),
        os.path.join(sf, "embeddings.parquet"),
    )
    idx2 = P._ensure_ivf_index(spark, sf)
    assert idx2 != idx1, "a modified corpus must key a fresh index"
    assert len(builds) == 2, "a modified corpus must trigger a rebuild"
    # the stale 60-vector index is not what probes see now: the new index
    # holds exactly the new 40-vector corpus
    assert spark.read.parquet(f"{idx2}/corpus").count() == 40
    probed = S.ivf_probe_prebuilt(
        spark,
        idx2,
        spark.read.parquet(os.path.join(sf, "embeddings.parquet")).filter(
            F.col("vec_id") < 2
        ),
        k=3,
    )
    assert probed.agg(F.max("n_id")).collect()[0][0] < 40

    for d in {idx1, idx2}:
        shutil.rmtree(d, ignore_errors=True)
