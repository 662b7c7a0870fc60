"""Paired A/B probe for the load_table schema cache: in ONE session,
alternate cache-on / cache-off timed executions of the same queries in
ABBA order so slow host drift cancels out of the comparison.

Usage: python tools/ab_probe.py [sf_dir] name [name ...]
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

    from kcl_akka_stream_spark.queries import QUERIES

    spark = get_session("ab_probe")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def run(name: str, cache_on: bool) -> float:
        if cache_on:
            os.environ.pop("SPARK_GRAFT_NO_SCHEMA_CACHE", None)
        else:
            os.environ["SPARK_GRAFT_NO_SCHEMA_CACHE"] = "1"
        t0 = time.time()
        _noop(QUERIES[name](spark, sf_dir))
        return time.time() - t0

    for name in args:
        run(name, True)  # warmup (codegen etc.)
        on, off = [], []
        for _ in range(3):  # ABBA x3
            on.append(run(name, True))
            off.append(run(name, False))
            off.append(run(name, False))
            on.append(run(name, True))
        m_on = sorted(on)[len(on) // 2]
        m_off = sorted(off)[len(off) // 2]
        print(
            f"{name}: cache-on median {m_on:.3f}s  cache-off median "
            f"{m_off:.3f}s  delta {m_off - m_on:+.3f}s", flush=True,
        )
    os.environ.pop("SPARK_GRAFT_NO_SCHEMA_CACHE", None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
