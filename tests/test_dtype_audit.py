"""Driver-faithful fetch-path bit-exactness pins (VERDICT r10 #1b).

Round-10 postmortem: w_lag_features went driver hash-red while every
fetchall()-based compare (repo gate, judge diff) showed exact multiset
equality.  Cause: the oracle's final SELECT passed an uncast
sum(BIGINT) through -- DuckDB widens it to HUGEINT/decimal128, which a
pandas/Arrow fetch renders as float64 ("123.0" vs "123").  These tests
pin BOTH fetch paths so the class stays closed:

1. tools/dtype_audit.py flags the pre-fix shape (uncast sum) and a
   synthetic NULL-producing RANGE-frame oracle in its fixed form is
   clean -- the audit itself is regression-tested.
2. w_lag_features' oracle renders IDENTICALLY through fetchall() and
   .df() (the driver-faithful path), NULL frame cells included.
3. The full registry's oracles expose no decimal/int128/uint output
   columns (same sweep the standalone tool runs, as a pytest gate).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dtype_audit import audit_oracle_types

from kcl_akka_stream_spark.sources.batch import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_audit_flags_uncast_sum(con):
    # The exact pre-fix w_lag_features shape: sum(BIGINT) uncast.
    flags, _ = audit_oracle_types(
        con,
        "SELECT user_id, sum(CAST(floor(value*100+0.5) AS BIGINT)) AS rev "
        "FROM events GROUP BY user_id",
    )
    assert flags, "uncast sum(BIGINT) must flag (decimal128 through Arrow)"
    assert flags[0][0] == "rev"


def test_audit_clean_on_cast_sum(con):
    flags, _ = audit_oracle_types(
        con,
        "SELECT user_id, CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) "
        "AS BIGINT) AS rev FROM events GROUP BY user_id",
    )
    assert flags == []


def _render_fetchall(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else str(v) for v in r))
    return sorted(out)


def _render_df(df):
    # The driver-faithful path: DuckDB .df() -> per-cell repr.  A BIGINT
    # column that arrived as float64 renders "123.0" here and diverges.
    out = []
    for r in df.itertuples(index=False):
        cells = []
        for v in r:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("NULL")
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return sorted(out)


def test_w_lag_features_driver_faithful_pandas_paths_match(con, spark):
    # THE driver-faithful compare: Spark .toPandas() vs DuckDB .df(),
    # rendered per-cell.  Nullable BIGINT upcasts to float64 on BOTH
    # sides (pandas NaN rule) -- symmetric, so it cancels; the pre-fix
    # bug was ASYMMETRIC (Spark int64 "123" vs DuckDB decimal->float64
    # "123.0" on the one NULL-free uncast column, rev_cents).
    from kcl_akka_stream_spark.queries import ORACLES, QUERIES

    sdf = QUERIES["w_lag_features"](spark, SF_DIR).toPandas()
    ddf = con.execute(ORACLES["w_lag_features"]).df()
    a = _render_df(sdf[sorted(sdf.columns)])
    b = _render_df(ddf[sorted(ddf.columns)])
    assert len(a) == len(b) > 0
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"driver-faithful paths diverge; first: {diffs[:2]}"
    # NULL lag cells (the RANGE-frame gaps) must exist and match pairwise.
    assert any("NULL" in r for r in a)
    # And the NULL-free columns must render as INTEGERS on both sides.
    assert str(sdf["rev_cents"].dtype) == str(ddf["rev_cents"].dtype) == "int64"


def test_null_range_frame_synthetic_bit_exact(con):
    # Synthetic NULL-frame case independent of the fixtures: gaps in the
    # key sequence yield NULL from the 1-PRECEDING..1-PRECEDING frame.
    sql = """
    WITH t(k, v) AS (VALUES (1, 10), (2, 20), (5, 50)),
    f AS (
      SELECT k, CAST(max(v) OVER (ORDER BY k
        RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT) AS lag1
      FROM t)
    SELECT CAST(k AS BIGINT) AS k, lag1 FROM f ORDER BY k
    """
    flags, _ = audit_oracle_types(con, sql)
    assert flags == []
    rows = con.execute(sql).fetchall()
    assert rows[2] == (5, None)  # the gap row: no k=4 neighbor
    # Through pandas the nullable column upcasts to float64 -- the
    # DOCUMENTED symmetric behavior both engines share; the k column
    # (NULL-free) must stay integer.
    df = con.execute(sql).df()
    assert str(df["k"].dtype) == "int64"
    assert str(df["lag1"].dtype) == "float64"


def test_registry_oracles_have_no_divergent_types(con):
    from kcl_akka_stream_spark.queries import ORACLES

    bad = []
    for name, sql in ORACLES.items():
        flags, _ = audit_oracle_types(con, sql)
        bad.extend((name,) + f for f in flags)
    assert bad == [], bad
