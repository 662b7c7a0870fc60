"""Skew mitigation: salting for hot keys.

The reference sidesteps skew physically -- one sub-stream per Kinesis shard,
and re-sharding splits hot shards (KinesisSource.scala:188-203; the reshard
scenarios IT/KinesisSourceTest.scala:182-228).  The relational engine needs
the logical-plan equivalent: when a groupBy/join key is hot, no partitioning
of the *key space* helps, so we split the key itself with a salt.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these operators are for the two shapes AQE does not cover:
aggregation skew (AQE never splits a hash-agg key) and first-shuffle skew
where the salt must be baked into the plan.

Both are result-identical to the unsalted form -- the DuckDB oracle for the
salted queries is the plain GROUP BY / JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kcl_akka_stream_spark.plans.hygiene import spread

_SALT = "__salt"


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt that is NOT a function of the group key
    alone: xxhash64 over the whole row, mod n.  Spreads one hot key over
    ``n_salts`` reducers."""
    return F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: stage 1 groups by (keys + salt) so a
    hot key fans out over ``n_salts`` reducers; stage 2 combines the partial
    aggregates per key.  Stage 2's shuffle moves ``n_salts`` rows per key,
    not the raw data.

    ``sums`` maps input column -> output alias (SUM); ``count_alias`` adds a
    COUNT(*).  (sum/count re-combine with sum; extendable to min/max.)
    """
    sums = sums or {}
    partials = [F.sum(F.col(c)).alias(f"__p_{a}") for c, a in sums.items()]
    if count_alias:
        partials.append(F.count(F.lit(1)).alias(f"__p_{count_alias}"))
    stage1 = df.withColumn(_SALT, _row_salt(df, n_salts)).groupBy(*keys, _SALT).agg(*partials)
    finals = [F.sum(F.col(f"__p_{a}")).alias(a) for a in sums.values()]
    if count_alias:
        finals.append(F.sum(F.col(f"__p_{count_alias}")).alias(count_alias))
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) fact side gets a per-row
    salt; the dim side is replicated across all ``n_salts`` salt values, so
    one hot join key lands on ``n_salts`` different reducers instead of one.

    Replication multiplies the dim shuffle by ``n_salts`` -- use only when
    the dim is small-ish but above the broadcast threshold, the classic gap
    between broadcast-hash-join and a skew-collapsed sort-merge join."""
    salted_fact = fact.withColumn(_SALT, _row_salt(fact, n_salts))
    salts = F.array([F.lit(i) for i in range(n_salts)])
    # shuffle_hash: broadcasting the REPLICATED dim would be strictly worse
    # than broadcasting the original (n_salts x the bytes) -- if the dim fits
    # in memory, plain broadcast needs no salt at all.  The salted shape only
    # makes sense as a shuffled join on (key, salt).
    # spread(): the n_salts-way replicate explode (and its shuffle write)
    # must not serialize onto a 1-partition dim scan (r9 #5 tripwire)
    replicated_dim = spread(dim).withColumn(_SALT, F.explode(salts)).hint("shuffle_hash")
    out = salted_fact.join(replicated_dim, on=[on, _SALT], how=how)
    return out.drop(_SALT)


def null_bypass_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
) -> DataFrame:
    """Left join that routes NULL-keyed rows AROUND the shuffle.

    Under standard `=` semantics a NULL key matches nothing, yet every
    NULL-keyed row still hashes to the SAME shuffle partition -- on a fact
    table where 30% of the FK is null (unattributed events, optional
    dimensions) that one reducer receives 30% of the data and the join
    stalls on it.  AQE's skew splitting cannot help: splitting the null
    partition is wasted work that ends in no matches anyway.

    Split instead: non-null rows take the equi-join; null rows bypass it
    entirely (their right-side columns are NULL by definition) and union
    back map-side.  Result-identical to the plain left join -- the oracle
    IS the plain left join.

    Requires disjoint non-key column names (like any USING-style join you
    intend to consume by name): with a shared name, ``withColumn`` on the
    bypass branch would silently overwrite the LEFT side's data with
    NULL, so the overlap is rejected loudly instead."""
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"null_bypass_left_join: left and right share non-key columns "
            f"{sorted(overlap)}; rename them first -- a silent overwrite "
            f"of the left side's values on the bypass branch is the "
            f"alternative"
        )
    nn = left.filter(F.col(on).isNotNull()).join(right, on, "left")
    right_cols = [c for c in right.columns if c != on]
    nu = left.filter(F.col(on).isNull())
    for c in right_cols:
        nu = nu.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return nn.unionByName(nu.select(nn.columns))
