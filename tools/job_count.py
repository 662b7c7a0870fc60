"""Spark-job count + steady median for named registry queries: how many
jobs one noop-sink execution schedules (driver-side actions -- checkpoint
materializations, dims probes, codebook collects -- all surface here,
where explain() shows only the final action's plan).

Usage: python tools/job_count.py [sf_dir] name [name ...]
Env:   SPARK_GRAFT_REPS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kcl_akka_stream_spark.session import get_session


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    from kcl_akka_stream_spark.queries import QUERIES

    spark = get_session("job_count")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    dag = spark.sparkContext._jsc.sc().dagScheduler()

    for name in args:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        _noop(fn(spark, sf_dir))  # warmup
        j0 = dag.nextJobId()
        times = []
        for _ in range(reps):
            t0 = time.time()
            _noop(fn(spark, sf_dir))
            times.append(time.time() - t0)
        jobs = (dag.nextJobId() - j0) / reps
        med = sorted(times)[len(times) // 2]
        print(
            f"{name}: jobs/run {jobs:.1f}  median {med:.3f}s  (runs "
            + ", ".join(f"{t:.3f}" for t in times) + ")",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
