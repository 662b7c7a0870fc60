"""Z-order layout: bit-exactness of the Morton key and the locality it
buys (the reason the operator exists at 100 TB: a multi-column rectangle
predicate touches FEW files under z-order, many under a 1-D sort)."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from kcl_akka_stream_spark.operators import layout as LO

BITS = 8


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_python_and_sql(spark):
    # deterministic pseudo-random 8-bit pairs
    rows = [((i * 37) % 256, (i * 101 + 13) % 256) for i in range(200)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a",
            "b",
            LO.interleave_bits([F.col("a"), F.col("b")], BITS).alias("z"),
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_morton(a, b, BITS)
    # the SQL twin (what oracles embed) computes the identical value
    expr = LO.sql_interleave_bits(["a", "b"], BITS)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for a, b, z in con.execute(f"SELECT a, b, {expr} FROM t").fetchall():
        assert z == _py_morton(a, b, BITS)


def test_scale_to_bits_bounds_and_degenerate(spark):
    df = spark.createDataFrame([(i,) for i in range(0, 1500, 7)], "x: long")
    mm = df.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    s = (
        df.crossJoin(F.broadcast(mm))
        .select(LO.scale_to_bits(F.col("x"), F.col("lo"), F.col("hi"), BITS).alias("s"))
        .agg(F.min("s"), F.max("s"))
        .collect()[0]
    )
    assert s[0] == 0 and s[1] == (1 << BITS) - 1
    # degenerate span (hi == lo) scales to 0, not a divide-by-zero
    deg = (
        df.select(
            LO.scale_to_bits(F.col("x"), F.lit(5), F.lit(5), BITS).alias("s")
        )
        .agg(F.max("s"))
        .collect()[0][0]
    )
    assert deg == 0


def test_interleave_width_guard():
    with pytest.raises(ValueError):
        LO.interleave_bits([F.lit(1), F.lit(2)], 32)  # 64 bits > BIGINT budget


def test_zorder_rectangle_touches_fewer_files(spark, sf_dir):
    # Build (ck, dy) from orders, scale both to 8 bits, and lay the rows
    # out twice into the SAME number of files: once sorted by a single
    # column (the 1-D baseline every table starts with), once z-ordered.
    # A 1/16-area rectangle (sck < 64 AND sdy < 64) must then live in
    # strictly fewer files under z-order -- that file-count gap is
    # exactly what parquet min/max pruning converts into skipped I/O.
    from kcl_akka_stream_spark.queries.registry import tbl

    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dy"),
    )
    mm = o.agg(
        F.min("ck").alias("ck_lo"),
        F.max("ck").alias("ck_hi"),
        F.min("dy").alias("dy_lo"),
        F.max("dy").alias("dy_hi"),
    )
    scaled = o.crossJoin(F.broadcast(mm)).select(
        LO.scale_to_bits(F.col("ck"), F.col("ck_lo"), F.col("ck_hi"), BITS).alias(
            "sck"
        ),
        LO.scale_to_bits(F.col("dy"), F.col("dy_lo"), F.col("dy_hi"), BITS).alias(
            "sdy"
        ),
    )
    z = scaled.withColumn(
        "zval", LO.interleave_bits([F.col("sck"), F.col("sdy")], BITS)
    )
    n_files = 8
    rect = (F.col("sck") < 64) & (F.col("sdy") < 64)

    def files_touched(write_col: str) -> int:
        out = tempfile.mkdtemp(prefix="kcl_layout_test_")
        try:
            LO.zorder_write(z, out, write_col, n_files=n_files)
            back = spark.read.parquet(out)
            return (
                back.filter(rect)
                .select(F.input_file_name().alias("f"))
                .distinct()
                .count()
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    # sanity: the rectangle is non-empty at this fixture
    assert z.filter(rect).count() > 0
    linear = files_touched("sck")  # 1-D sort on one of the two dims
    zorder = files_touched("zval")
    assert zorder < linear, (zorder, linear)
    # and the z-order layout confines a 1/16-area rectangle to at most
    # half the files (loose bound; typically 2-3 of 8)
    assert zorder <= n_files // 2, zorder
