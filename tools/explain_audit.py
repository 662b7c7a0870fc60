"""Plan audit: print a one-line physical-plan summary for every headline
query (shuffle count, join strategies, scan pushdown) plus the full
formatted plan with --full.

Usage: python tools/explain_audit.py [sf_dir] [--full] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kcl_akka_stream_spark.plans.hygiene import (
    count_exchanges,
    count_operator,
    physical_plan,
    pushed_filters,
)
from kcl_akka_stream_spark.session import get_session


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from bench import HEADLINE
    from kcl_akka_stream_spark.queries import QUERIES

    spark = get_session("explain_audit")
    for name in names or HEADLINE:
        if name.startswith("stream_"):
            print(f"{name:28s} (streaming -- plan decided per micro-batch)")
            continue
        df = QUERIES[name](spark, sf_dir)
        parts = [
            f"exchanges={count_exchanges(df)}",
            f"bhj={count_operator(df, 'BroadcastHashJoin')}",
            f"smj={count_operator(df, 'SortMergeJoin')}",
            f"shj={count_operator(df, 'ShuffledHashJoin')}",
            f"pushed={len(pushed_filters(df))}",
        ]
        print(f"{name:28s} {' '.join(parts)}")
        if full:
            print(physical_plan(df))


if __name__ == "__main__":
    main()
