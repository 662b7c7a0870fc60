"""Ad-hoc steady-state timings for a NAMED subset of registry queries.

Replicates bench.py's steady methodology (noop sink, per-query warmup,
median-of-3, clearCache + System.gc between queries) without the cold
pass / calibration / detail-record machinery, so an optimization
experiment can get comparable before/after numbers on the handful of
queries it touches in seconds instead of re-running the full headline.

Usage: python tools/micro_bench.py [sf_dir] name [name ...]
Env:   SPARK_GRAFT_REPS (default 3) -- timed repetitions per query.

NOT the official bench: numbers printed here never enter
BENCH_DETAIL.jsonl; run bench.py for record-grade measurements.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kcl_akka_stream_spark.session import get_session


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if not args:
        print("usage: micro_bench.py [sf_dir] name [name ...]", file=sys.stderr)
        return 2
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    from kcl_akka_stream_spark.queries import QUERIES

    spark = get_session("micro_bench")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    for name in args:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"micro_bench warmup {name}")
        t0 = time.time()
        _noop_write(fn(spark, sf_dir))
        warm = time.time() - t0
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"micro_bench {name} run{i}")
            t0 = time.time()
            _noop_write(fn(spark, sf_dir))
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"{name}: median {med:.3f}s  (warm {warm:.3f}s; runs "
            + ", ".join(f"{t:.3f}" for t in times) + ")",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
