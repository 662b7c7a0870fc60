"""Generic paired ABBA probe over an env toggle: in ONE session, alternate
ENV=val_a / ENV=val_b timed executions of the same queries in ABBA order so
slow host drift cancels out of the comparison.  The toggle must be read at
query-CONSTRUCTION time (QUERIES[name] is re-invoked per run).

Usage: python tools/abba_env.py [sf_dir] ENVVAR val_a val_b name [name ...]
       (val '-' means unset)
Env:   SPARK_GRAFT_REPS (default 3) -- ABBA blocks per query.
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
    if len(args) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    env, val_a, val_b, names = args[0], args[1], args[2], args[3:]
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    from kcl_akka_stream_spark.queries import QUERIES

    spark = get_session("abba_env")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def run(name: str, val: str) -> float:
        if val == "-":
            os.environ.pop(env, None)
        else:
            os.environ[env] = val
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        _noop(QUERIES[name](spark, sf_dir))
        return time.time() - t0

    for name in names:
        run(name, val_a)  # warmup (codegen etc.)
        run(name, val_b)
        a, b = [], []
        for _ in range(reps):
            a.append(run(name, val_a))
            b.append(run(name, val_b))
            b.append(run(name, val_b))
            a.append(run(name, val_a))
        m_a = sorted(a)[len(a) // 2]
        m_b = sorted(b)[len(b) // 2]
        print(
            f"{name}: {env}={val_a} median {m_a:.3f}s  {env}={val_b} median "
            f"{m_b:.3f}s  delta {m_b - m_a:+.3f}s  "
            f"(a: {','.join(f'{x:.2f}' for x in a)} | "
            f"b: {','.join(f'{x:.2f}' for x in b)})",
            flush=True,
        )
    os.environ.pop(env, None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
