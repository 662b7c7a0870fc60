"""Multi-dimensional data layout: z-order (Morton) clustering keys.

Public technique (Morton 1966; used by Delta Lake OPTIMIZE ZORDER BY and
Iceberg's sort-order transforms): interleave the bits of several scaled
columns so that rows close in the multi-dimensional value space land
close in the one-dimensional sort order.  Written as a parquet sort key,
row-group min/max stats then prune MULTI-column range predicates --
a single-column sort can only ever prune one of them.  At 100 TB this is
the difference between scanning one file stripe and scanning the whole
table for a (customer x date) rectangle.

Everything here is integer arithmetic end-to-end: columns are scaled to
[0, 2^bits) with exact BIGINT math against a broadcast min/max row, then
interleaved with shift/add of disjoint bits -- so an external oracle
(or a re-run on another engine) reproduces the key bit-for-bit; no float
rounding is involved anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Exact integer min-max scaling of an integral column to [0, 2^bits).

    ((x - lo) * (2^bits - 1)) div (hi - lo), computed in BIGINT -- exact
    for integral inputs (no doubles, so no boundary drift between
    engines).  A degenerate column (hi == lo) scales to 0.
    """
    span = (hi - lo).cast("long")
    top = F.lit((1 << bits) - 1).cast("long")
    a = (col.cast("long") - lo.cast("long")) * top
    # exact integer floor-division: subtract the modulus BEFORE dividing,
    # so the quotient is an exact integer and the double division cannot
    # round across a boundary (a % span keeps everything in BIGINT).
    q = ((a - (a % span)) / span).cast("long")
    return F.when(span > 0, q).otherwise(F.lit(0))


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``cols`` (each already in [0, 2^bits)) into one
    BIGINT z-value.  Bit b of column i lands at position b*len(cols)+i;
    the per-term target bits are disjoint, so the combine is a plain sum
    (equal to bitwise OR, without the operator-precedence traps).  The
    expanded expression is bits*len(cols) shift/and/add terms -- all
    JVM-side, inside whole-stage codegen.
    """
    n = len(cols)
    if not 1 <= n * bits <= 62:
        raise ValueError(f"interleave of {n} cols x {bits} bits exceeds BIGINT")
    terms = []
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_interleave_bits(cols: list[str], bits: int) -> str:
    """The oracle-side twin of :func:`interleave_bits`: a SQL expression
    string (DuckDB/ANSI bit operators) computing the identical z-value.
    """
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * n + i})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    zcol: str,
    n_files: int,
) -> None:
    """Write ``df`` as parquet physically clustered by the z-value column:
    range-partition on the key (contiguous, non-overlapping per-file
    z-ranges -- a hash repartition would scatter every z-range across all
    files and destroy the min/max stats) and sort within each partition so
    row groups inside a file are tight too.
    """
    (
        df.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def rendezvous_shard(id_sql: str, n_shards: int, salt: str) -> Column:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1996, public; the consistent-placement scheme behind
    Riak/Ceph-style object placement): row -> argmax over shard s of
    md5(salt | s | id).

    Why not ``id % n``: growing n_shards by one remaps ~(n-1)/n of ALL
    rows under modulo, but only ~1/(n+1) under HRW -- on a 100 TB corpus
    that is the difference between rewriting the whole layout and moving
    one shard's worth.  Deterministic (seeded md5, never rand()), pure
    map-side (no shuffle, no coordination state), and reproducible
    cross-engine: the winner key is the lexicographic max of the
    fixed-width ``md5hex|s`` strings, which any engine computes
    identically.

    ``id_sql`` is a SQL expression producing a string id (cast numerics
    first).  Returns the winning shard id as a long Column.

    ``salt`` and ``n_shards`` are interpolated into a SQL string, so they
    are validated here (ADVICE r8): a quote/backslash in the salt would
    otherwise produce a malformed -- or injectable -- expression.
    """
    if not re.fullmatch(r"[A-Za-z0-9_.|-]+", salt):
        raise ValueError(
            f"rendezvous_shard salt must match [A-Za-z0-9_.|-]+, got {salt!r}"
        )
    if not isinstance(n_shards, int) or n_shards < 1:
        raise ValueError(f"n_shards must be a positive int, got {n_shards!r}")
    lst = (
        f"transform(sequence(0, {n_shards - 1}), s -> "
        f"concat(md5(concat('{salt}|', cast(s as string), '|', {id_sql})), "
        f"'|', cast(s as string)))"
    )
    return F.expr(f"cast(split(array_max({lst}), '[|]')[1] as long)")


def hilbert_index(df: DataFrame, x_col: str, y_col: str, bits: int = 8, out_col: str = "hval") -> DataFrame:
    """Hilbert-curve index of two ``bits``-bit coordinates (Hilbert 1891;
    the xy2d walk used by space-filling-curve layouts in Iceberg and
    research systems beside Morton): process bits high-to-low, accumulate
    the quadrant offset, and rotate/reflect the lower bits per the
    standard recursion.  Better range locality than z-order -- a query
    rectangle touches fewer distinct curve ranges (the fragmentation
    contrast sink_hilbert_layout reports and pytest pins).

    Cross-engine exact: the loop is UNROLLED into ``bits`` projection
    steps of pure integer CASE arithmetic; coordinates are re-masked to
    the low bits each step, so no negative intermediates ever feed a
    shift/AND (two's-complement shift semantics differ across engines).
    The quadrant code (3*rx XOR ry) is spelled as a CASE so no bitwise
    XOR portability is assumed.  Mirrored expression-for-expression by
    :func:`sql_hilbert_cte`.

    Input contract: coordinates are non-negative ``bits``-bit integers.
    Both engines MASK the inputs to the low ``bits`` on entry (ADVICE
    r14): without the mask, a coordinate wider than ``bits`` makes
    rx >= 2 on the first step, and the quadrant CASE (written for
    rx,ry in {0,1}) silently misclassifies instead of failing."""
    mask = 1 << bits
    cur = df.withColumn(
        "__hx", F.col(x_col).cast("long") % F.lit(mask)
    ).withColumn(
        "__hy", F.col(y_col).cast("long") % F.lit(mask)
    ).withColumn("__hd", F.lit(0).cast("long"))
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = f"(__hx div {s})"
        ry = f"(__hy div {s})"
        quad = (
            f"case when {rx} = 0 and {ry} = 0 then 0"
            f" when {rx} = 0 then 1"
            f" when {ry} = 1 then 2 else 3 end"
        )
        xl = f"(__hx % {s})"
        yl = f"(__hy % {s})"
        nx = (
            f"case when {ry} = 1 then {xl}"
            f" when {rx} = 1 then {s - 1} - {yl}"
            f" else {yl} end"
        )
        ny = (
            f"case when {ry} = 1 then {yl}"
            f" when {rx} = 1 then {s - 1} - {xl}"
            f" else {xl} end"
        )
        cur = cur.select(
            *[c for c in cur.columns if c not in ("__hx", "__hy", "__hd")],
            F.expr(f"__hd + cast({s} as bigint) * {s} * ({quad})").alias(
                "__hd2"
            ),
            F.expr(nx).alias("__hx2"),
            F.expr(ny).alias("__hy2"),
        ).withColumnsRenamed(
            {"__hd2": "__hd", "__hx2": "__hx", "__hy2": "__hy"}
        )
    return cur.withColumnRenamed("__hd", out_col).drop("__hx", "__hy")


def sql_hilbert_cte(base: str, x: str, y: str, bits: int = 8) -> str:
    """DuckDB CTE chain mirroring :func:`hilbert_index` step-for-step:
    returns ``st0 AS (...), st1 AS (...), ...`` where the final CTE
    ``hout`` holds every column of ``base`` plus ``hval``."""
    ctes = [f"st{bits} AS (SELECT *, CAST({x} AS BIGINT) % {1 << bits} AS hx,"
            f" CAST({y} AS BIGINT) % {1 << bits} AS hy, CAST(0 AS BIGINT) AS hd"
            f" FROM {base})"]
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = f"(hx // {s})"
        ry = f"(hy // {s})"
        quad = (
            f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 THEN 1"
            f" WHEN {ry} = 1 THEN 2 ELSE 3 END"
        )
        xl = f"(hx % {s})"
        yl = f"(hy % {s})"
        nx = (
            f"CASE WHEN {ry} = 1 THEN {xl}"
            f" WHEN {rx} = 1 THEN {s - 1} - {yl}"
            f" ELSE {yl} END"
        )
        ny = (
            f"CASE WHEN {ry} = 1 THEN {yl}"
            f" WHEN {rx} = 1 THEN {s - 1} - {xl}"
            f" ELSE {xl} END"
        )
        ctes.append(
            f"st{b} AS (SELECT * EXCLUDE (hx, hy, hd),"
            f" hd + CAST({s} AS BIGINT) * {s} * ({quad}) AS hd,"
            f" {nx} AS hx, {ny} AS hy FROM st{b + 1})"
        )
    ctes.append(
        f"hout AS (SELECT * EXCLUDE (hx, hy, hd), hd AS hval FROM st0)"
    )
    return ",\n    ".join(ctes)
