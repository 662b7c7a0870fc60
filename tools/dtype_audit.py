"""Audit every oracle_sql() result schema for fetch-path-divergent types.

Root cause class found in round 10 (CORRECTNESS_r10.json, w_lag_features):
DuckDB widens sum(BIGINT) to HUGEINT (int128).  A compare that fetches via
``fetchall()`` sees Python ints and passes; a compare that fetches via
Arrow/pandas sees int128 -> float64/object for that column and hash-fails.
The repo gate (tools/check_correctness.py) is fetchall-based, so this class
is locally invisible -- this audit closes the gap by inspecting the ARROW
schema of every oracle (the strictest rendering) and flagging any column
whose physical type can diverge between fetch paths:

- int128 / uint128 (HUGEINT): always a bug -- CAST(... AS BIGINT) in the
  oracle's final SELECT.
- decimal: flag -- DuckDB renders exact decimals, Spark doubles; every
  registry float column is contractually a shared IEEE double op.
- unsigned ints: flag -- no Spark analogue.

Also cross-checks the Spark schema when --spark is passed: integer-vs-float
CATEGORY mismatches between engines are flagged (same-category width
differences like int32 vs int64 are fine -- both fetch paths render the
same value text).

Usage: python tools/dtype_audit.py [sf_dir] [--spark] [name ...]
Exits non-zero on any flag.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

BAD_ARROW = ("decimal", "uint")


def _category(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def _spark_category(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt == "string":
        return "string"
    if dt.startswith("array"):
        return "list"
    return dt


def audit_oracle_types(con, sql: str):
    """Return [(col, arrow_type, reason)] flags for one oracle SQL."""
    tbl = con.execute(f"SELECT * FROM ({sql}) _dtype_audit LIMIT 0").arrow()
    flags = []
    for field in tbl.schema:
        t = str(field.type)
        if t in ("int128", "uint128") or "hugeint" in t:
            flags.append((field.name, t, "HUGEINT: uncast sum/product -- CAST AS BIGINT"))
        elif any(b in t for b in BAD_ARROW):
            flags.append((field.name, t, "engine-divergent physical type"))
    return flags, tbl.schema


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_spark = "--spark" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if not os.path.isdir(sf_dir):
        # ADVICE r11: `dtype_audit.py agg_ks_drift` used to treat the
        # query name as the data dir and error on every oracle
        print(
            f"usage: {sys.argv[0]} [--spark] [SF_DIR] [QUERY ...]\n"
            f"error: SF_DIR {sf_dir!r} is not a directory "
            "(did you mean to pass a query name? SF_DIR comes first)",
            file=sys.stderr,
        )
        return 2

    from kcl_akka_stream_spark.queries import ORACLES, QUERIES
    from kcl_akka_stream_spark.sources.batch import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = None
    if with_spark:
        from kcl_akka_stream_spark.session import get_session

        spark = get_session("dtype_audit")

    n_flag = 0
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        try:
            flags, schema = audit_oracle_types(con, sql)
        except Exception as e:
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            n_flag += 1
            continue
        for col, t, why in flags:
            print(f"FLAG  {name}.{col}: {t} -- {why}")
            n_flag += 1
        if spark is not None and name in QUERIES:
            try:
                sdt = dict(QUERIES[name](spark, sf_dir).dtypes)
            except Exception as e:
                print(f"ERR   {name}: spark: {type(e).__name__}: {e}")
                n_flag += 1
                continue
            for field in schema:
                if field.name not in sdt:
                    continue  # column-name drift is check_correctness's job
                oc, sc = _category(field.type), _spark_category(sdt[field.name])
                if oc != sc:
                    print(f"FLAG  {name}.{field.name}: oracle {field.type} vs spark {sdt[field.name]} (category {oc} != {sc})")
                    n_flag += 1
    print(f"\n{n_flag} flags over {len(ORACLES)} oracles")
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
