"""Deterministic sampling and stratum rebalancing for corpus curation.

Beyond-reference extension (no counterpart in /root/reference).
Large-scale training-data-pipeline surface: the two sampling shapes a
curation pipeline needs beyond the flat md5-gate (queries/pipeline.py
``sample_stratified``):

- per-stratum fixed-size samples (eval carve-outs, inspection panels):
  a ``row_number`` over md5-hash order inside each stratum — hash order
  is a uniform deterministic permutation, so "first k by hash" IS a
  uniform k-sample, reproducible across engines and runs;
- distribution rebalancing (language/domain mixing): given target
  weights, each stratum gets acceptance rate
  ``min(1, w_s * N_total / n_s)`` and rows pass a per-row md5-fraction
  gate — deterministic Bernoulli thinning toward the target mix.

Scale shape: the k-sample is one shuffle keyed by stratum (the same
shape as any per-group top-k; k rows survive per stratum).  Rebalancing
aggregates per-stratum counts (tiny), broadcasts the rate table, and
gates map-side — the corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_fraction(col: Column, seed: str) -> Column:
    """Seeded md5 -> uniform fraction in (0,1); DuckDB-reproducible via
    the same first-8-hex-chars / 2^32 arithmetic (operators/sketches.py)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 32))


def stratified_topk_sample(
    df: DataFrame,
    stratum_col: str = "lang",
    k: int = 10,
    id_col: str = "doc_id",
    seed: str = "k7",
) -> DataFrame:
    """Deterministic uniform k-sample per stratum: rank rows by seeded
    md5 of their id within the stratum, keep the first ``k``."""
    key = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(key, id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(id_col, stratum_col, "sample_rank")
    )


def _stratum_rates(
    df: DataFrame, weights: dict[str, float], stratum_col: str
) -> DataFrame:
    """Per-stratum acceptance rates ``min(1, w_s * N_total / n_s)`` —
    stratum-cardinality-sized, built from one combinable count agg."""
    spark = df.sparkSession
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_before"))
    totals = counts.agg(F.sum("n_before").alias("n_total"))
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        f"{stratum_col} string, target_w double",
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .join(F.broadcast(wdf), stratum_col, "left")
        .select(
            stratum_col,
            "n_before",
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("target_w"), F.lit(0.0))
                * F.col("n_total").cast("double")
                / F.col("n_before"),
            ).alias("rate"),
        )
    )


def rebalance_to_weights(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "r11",
) -> DataFrame:
    """Thin each stratum toward a target weight distribution.

    ``rate_s = min(1, w_s * N_total / n_s)`` (a stratum already below its
    target keeps everything — deterministic thinning cannot upsample);
    strata absent from ``weights`` are dropped (rate 0).  Returns the
    surviving rows with their stratum's ``rate`` attached.

    The count aggregation is stratum-cardinality-sized; the rate table is
    broadcast; the per-row gate is map-only."""
    rates = _stratum_rates(df, weights, stratum_col)
    gate = _hash_fraction(F.col(id_col), seed) < F.col("rate")
    return df.join(F.broadcast(rates), stratum_col).filter(gate)


def rebalance_summary(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "r11",
) -> DataFrame:
    """Audit view of ``rebalance_to_weights``: per-stratum before/after
    counts and the applied rate.  Built from the rate table so strata
    thinned to zero (or dropped for lack of a weight) still appear."""
    rates = _stratum_rates(df, weights, stratum_col)
    gate = _hash_fraction(F.col(id_col), seed) < F.col("rate")
    after = (
        df.join(F.broadcast(rates), stratum_col)
        .filter(gate)
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        rates.join(F.broadcast(after), stratum_col, "left")
        .select(
            stratum_col,
            F.col("n_before").cast("long").alias("n_before"),
            F.round(F.col("rate"), 6).alias("rate"),
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long").alias("n_after"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: Column,
    k: int = 100,
    id_col: str = "doc_id",
    seed: str = "w19",
    max_weight: int = 8,
) -> DataFrame:
    """Deterministic WEIGHTED k-sample without replacement, hash-portable.

    Integer-exact equivalent of Efraimidis-Spirakis weighted reservoir
    sampling: a row with integer weight w draws w independent md5 keys
    and keeps the MINIMUM -- the min of w uniforms is distributed as the
    w-th root order statistic, so ranking ascending by that min IS
    sampling with probability proportional to weight, with ZERO float
    arithmetic (the keys compare as hex strings).  Float-free matters
    cross-engine: ``pow(u, 1/w)`` is not correctly rounded and a last-ulp
    disagreement near the k-th boundary would change the selected SET;
    string comparison of md5 hex cannot disagree.

    ``weight_col`` must produce a positive integer; it is clamped to
    [1, max_weight] (the key list is materialized per row, so the clamp
    bounds per-row work -- at 100 TB this is a map-only projection
    followed by a TakeOrdered, never a full sort).
    """
    w = F.least(F.greatest(weight_col.cast("int"), F.lit(1)), F.lit(max_weight))
    keys = F.transform(
        F.sequence(F.lit(1), w),
        lambda j: F.md5(
            F.concat(
                F.lit(f"{seed}|"),
                F.col(id_col).cast("string"),
                F.lit("|"),
                j.cast("string"),
            )
        ),
    )
    scored = df.select(
        id_col,
        w.alias("weight"),
        F.array_min(keys).alias("sel_key"),
    )
    return scored.orderBy("sel_key", id_col).limit(k)


def hash_bottom_k(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    seed: str = "rsv",
    part_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic mergeable uniform k-sample per stratum ("bottom-k by
    hash" reservoir): keep the ``k`` rows whose seeded ``md5(id)`` ranks
    lowest within the stratum.  Because hash order is a fixed uniform
    permutation, the k survivors ARE a uniform sample -- and the state
    (the k rows themselves) forms a commutative, associative and
    IDEMPOTENT monoid: bottom-k of a union of bottom-ks equals bottom-k
    of the union, and a replayed row changes nothing.  Per-partition /
    per-micro-batch samples therefore merge without re-reading data, and
    at-least-once delivery is absorbed for free (the same algebra KMV
    exploits for distinct-counting; here the sampled ROWS survive).

    Idempotence is enforced INSIDE the operator (ADVICE r8): duplicate
    ``(stratum, *part_cols, id)`` rows are collapsed before the bottom-k
    rank, so a replayed copy cannot occupy a second slot and evict a
    distinct id during a state merge.  The dedup costs NO extra
    exchange: within the window's own (parts, order-by-key) sort,
    duplicate ids are ADJACENT (equal id => equal hash key), so a
    ``lag(id)`` comparison on the same window spec drops them before the
    ``row_number`` rank -- both window operators ride ONE exchange/sort.
    Replayed rows are exact copies by definition; if callers feed
    genuinely different payloads under one id, the id is the identity
    and one payload survives (pre-aggregate upstream if payloads must be
    reconciled).

    With ``part_cols`` the selection runs per (stratum, part) -- the
    fold step; a second call without ``part_cols`` finishes the merge on
    the k*parts-sized survivor set.

    Scale shape: ONE exchange keyed on (stratum, *part_cols); the
    window's top-k filter keeps k rows per group, so downstream sees a
    sketch-sized relation, never the corpus.
    """
    key = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    parts = [stratum_col] + list(part_cols or [])
    w = Window.partitionBy(*parts).orderBy(key, F.col(id_col))
    dup = F.lag(F.col(id_col)).over(w) == F.col(id_col)
    return (
        df.withColumn("__dup", F.coalesce(dup, F.lit(False)))
        .filter(~F.col("__dup"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__dup", "__rk")
    )


#: P(Poisson(1) <= j) scaled to 2^32, frozen as integer literals so both
#: engines classify the md5-uniform draw with pure int comparisons
#: (math.floor(cdf * 2**32) for j = 0..3; weights cap at 4, which covers
#: 99.63% of the mass -- documented truncation, identical in the oracle).
POISSON1_CDF_U32 = (1580030168, 3160060337, 3950075421, 4213413783)

#: P(Geometric(p = 1 - e^-0.5) <= j) scaled to 2^32 for j = 0..7 (frozen:
#: math.floor((1 - alpha**(j+1)) * 2**32), alpha = exp(-0.5)); draws cap
#: at 8 -- documented truncation covering 98.9% of the mass per side.
#: Two such draws differenced give the DISCRETE LAPLACE (two-sided
#: geometric) noise of the eps = 0.5 geometric mechanism.
GEOM_HALF_CDF_U32 = (
    1689937948,
    2714937127,
    3336630555,
    3713706680,
    3942414911,
    4081133465,
    4165270521,
    4216302225,
)


def _geometric_draw(u32: Column) -> Column:
    """Truncated Geometric(1 - e^-0.5) draw from a uniform u32 via the
    frozen integer CDF -- pure int comparisons, exact cross-engine."""
    out = F.lit(8)
    for j in reversed(range(8)):
        out = F.when(u32 < F.lit(GEOM_HALF_CDF_U32[j]), F.lit(j)).otherwise(out)
    return out


def pseudo_dp_noised_counts(
    df: DataFrame, group_col: str, seed: str
) -> DataFrame:
    """REPRODUCIBLE PSEUDO-DP FOR PIPELINE TESTING ONLY -- NOT A PRIVACY
    GUARANTEE (output contract; ADVICE r9).  The noise is a DETERMINISTIC
    function of (seed, group key): anyone holding the seed inverts it and
    recovers exact counts, and even with a secret seed the fixed-per-key,
    truncated (+/-8), zero-clamped noise carries no formal epsilon.  Use
    this to test that a pipeline PLUMBS noised counts correctly and that
    two engines reproduce the same noised output; for real privacy,
    swap in a cryptographic RNG mechanism with an accounted budget.

    Shape of the noise: the geometric mechanism (Ghosh, Roughgarden &
    Sundararajan 2009, public) at eps = 0.5 -- noise = G1 - G2, each a
    truncated Geometric(1 - e^-eps) draw, the discrete analogue of
    Laplace noise, integer end-to-end.  Draws come from seeded md5 of
    the group key (two independent 8-hex slices of one digest), so a
    second engine reproduces the noise EXACTLY.  ``seed`` is REQUIRED
    (no default): a hardcoded public seed would invite treating the
    output as private.

    Output: ``(group_col, n_noised)`` -- the true count never leaves the
    operator.  Scale shape: ONE combinable count agg; the noise attaches
    map-side to the groups-sized relation.
    """
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    digest = F.md5(F.concat(F.lit(f"{seed}|"), F.col(group_col).cast("string")))
    u_a = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    u_b = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    noise = _geometric_draw(u_a) - _geometric_draw(u_b)
    return cnt.select(
        group_col,
        F.greatest(F.col("__n") + noise, F.lit(0)).cast("long").alias("n_noised"),
    )


def poisson_bootstrap_weights(
    df: DataFrame, id_col: str, b: int = 32, seed: str = "boot"
) -> DataFrame:
    """Deterministic Poisson bootstrap (Chamandy 2012, public): replicate
    each row into ``b`` resamples with an integer weight drawn as
    Poisson(1) from seeded md5 -- the single-pass,
    partitioning-independent way to bootstrap a dataset too large to
    resample by index.  Every engine that can md5 derives the SAME
    weights, so resample statistics are exactly reproducible (no RNG
    state, no order dependence).

    One md5 feeds FOUR replicas (the minhash-signature discipline: a
    128-bit digest carries four independent 8-hex u32 slices), so the
    hash cost is b/4 digests per row, not b -- measured 3.9 s -> ~1.6 s
    on the sf0.1 headline readout.  ``b`` must be a multiple of 4.
    Replica ``b``'s uniform = slice ``b % 4`` of digest
    ``md5(seed | b div 4 | id)``.

    Output: the input columns plus ``b`` (replica index) and ``w``
    (int weight 0..4, truncated Poisson(1)).

    Scale shape: map-only explode x b/4 then x4 slices; downstream
    per-replica aggregates combine map-side, so the b-fold blow-up
    never survives past the first partial agg.  No join, no shuffle.
    """
    if b % 4 != 0:
        raise ValueError(f"b must be a multiple of 4, got {b}")
    # spread() before the x(b/4) explode: a single-file parquet scan
    # arrives in 1-2 partitions, and without the rebalance the entire
    # b-fold expansion + hashing serializes onto those tasks (measured:
    # the whole 3.9 s sf0.1 readout was ONE task doing 800k digests).
    from kcl_akka_stream_spark.plans.hygiene import spread

    grp = spread(df).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(b // 4 - 1))).alias("__j")
    )
    # The digest MUST land in its own child projection: inlined into the
    # four slice structs below, Catalyst re-evaluates it per reference
    # (no CSE across struct fields -- the rolling-fingerprint lesson),
    # which costs MORE than the b-md5 form it replaces.
    grp = grp.withColumn(
        "__dg",
        F.md5(
            F.concat(
                F.lit(f"{seed}|"),
                F.col("__j").cast("string"),
                F.lit("|"),
                F.col(id_col).cast("string"),
            )
        ),
    )
    t0, t1, t2, t3 = POISSON1_CDF_U32

    def _w(u32):
        return (
            F.when(u32 < t0, F.lit(0))
            .when(u32 < t1, F.lit(1))
            .when(u32 < t2, F.lit(2))
            .when(u32 < t3, F.lit(3))
            .otherwise(F.lit(4))
        )

    slices = F.array(
        *[
            F.struct(
                (F.col("__j") * 4 + s).cast("long").alias("b"),
                _w(
                    F.conv(
                        F.substring(F.col("__dg"), s * 8 + 1, 8), 16, 10
                    ).cast("long")
                )
                .cast("long")
                .alias("w"),
            )
            for s in range(4)
        ]
    )
    return (
        grp.withColumn("__bw", F.explode(slices))
        .select(*df.columns, F.col("__bw.b").alias("b"), F.col("__bw.w").alias("w"))
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR -- Xie et al. 2023,
    public): score every corpus document by how much more likely its
    hashed-bigram feature counts are under the TARGET distribution than
    under the raw corpus distribution, and keep the top ``k`` -- the
    principled "make the pretraining mix look like the high-quality
    target" selector (the paper hashes into 10k buckets; the fixture
    uses 64).

    Cross-engine-exact recipe: bucket = md5(word-2-gram) first 6 hex
    digits mod ``n_buckets``; both distributions Laplace-smoothed
    ((c+1)/(total+B)); per-bucket log-ratio frozen to integer micro-nats
    BEFORE the per-doc sum (the unigram_logprob convention), so a doc's
    weight is an EXACT int64 dot product of its bucket counts with the
    frozen delta vector, and partial-agg order cannot move a rank.

    Scale shape: both bucket distributions are B-sized combinable aggs
    (the target side is small by contract -- same posture as
    decontaminate's eval side); the delta relation (B rows) BROADCASTS
    onto the per-(doc, bucket) counts, the weight fold rides ONE
    doc-keyed exchange, and the final top-k is orderBy+limit
    (TakeOrderedAndProject -- per-partition heads, never a global
    sort).  Deterministic tiebreak on ``id_col``."""
    from kcl_akka_stream_spark.operators.dedup import shingles
    from kcl_akka_stream_spark.plans.hygiene import spread

    def bucketed(df: DataFrame, with_id: bool) -> DataFrame:
        # spread() only on the corpus side (the with_id consumer): its
        # bigram explode is data-sized and needs the parallelism floor;
        # the target side is benchmark-sized by contract (the
        # decontaminate eval-side rule)
        src = spread(df.select(id_col, text_col)) if with_id else df
        grams = src.select(
            F.col(id_col),
            F.explode(shingles(F.col(text_col), 2)).alias("__g"),
        )
        b = F.pmod(
            F.conv(F.substring(F.md5("__g"), 1, 6), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket")
        if with_id:
            return grams.select(F.col(id_col), b)
        return grams.select(b)

    # tgt feeds delta AND tt: checkpoint the <=B-row output once so the
    # target explode neither replays nor rides an unspread scan
    tgt = (
        bucketed(target, with_id=False)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        .localCheckpoint(eager=True)
    )
    # doc_b feeds cq, tq AND the weight fold -- without the checkpoint
    # the corpus bigram explode replays 4x (the boolean-retrieval
    # bounded-intermediate lesson); the relation is docs x <=B rows,
    # far smaller than the gram stream it collapses
    doc_b = (
        bucketed(corpus, with_id=True)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    cq = doc_b.groupBy("bucket").agg(F.sum("c").cast("long").alias("cq"))
    tt = tgt.agg(F.sum("ct").alias("tt"))
    tq = cq.agg(F.sum("cq").alias("tq"))
    delta = (
        cq.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tq))
        .select(
            "bucket",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("tt") + n_buckets).cast("double")
                    )
                    * 1e6,
                    0,
                ).cast("long")
                - F.round(
                    F.log(
                        (F.col("cq") + 1).cast("double")
                        / (F.col("tq") + n_buckets).cast("double")
                    )
                    * 1e6,
                    0,
                ).cast("long")
            ).alias("delta_micro"),
        )
    )
    weights = (
        doc_b.join(F.broadcast(delta), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.col("delta_micro"))
            .cast("long")
            .alias("weight_micro")
        )
    )
    topk = weights.orderBy(
        F.col("weight_micro").desc(), F.col(id_col)
    ).limit(k)
    w = Window.orderBy(F.col("weight_micro").desc(), F.col(id_col))
    return topk.select(
        id_col,
        "weight_micro",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[Column] | None = None,
    sensitive_col: str = "user_id",
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity release gate (Sweeney 2002; Machanavajjhala
    et al. 2007, public): before a derived dataset ships, audit whether any
    quasi-identifier combination isolates fewer than ``k`` rows (re-
    identification risk) or carries fewer than ``l_div`` distinct sensitive
    values (attribute disclosure -- a group can be k-large yet reveal the
    sensitive value if every row shares it).  The single-row report is the
    ship-gate: viol_* columns must be 0 for a clean release; risk_rows_*
    quantify the affected mass when they are not.

    Scale shape: ONE combinable (QI-group) agg with count + count-distinct
    (partial-distinct + final, 2 exchanges), then a single-row fold riding
    the group relation.  No joins, no windows."""
    qis = quasi_cols if quasi_cols is not None else [F.col("event_type")]
    groups = df.groupBy(*qis).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.countDistinct(sensitive_col).cast("long").alias("__nd"),
    )
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.min("__n").cast("long").alias("min_group_size"),
        F.sum((F.col("__n") < k).cast("long"))
        .cast("long")
        .alias("viol_k_anonymity"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("risk_rows_k"),
        F.sum((F.col("__nd") < l_div).cast("long"))
        .cast("long")
        .alias("viol_l_diversity"),
        F.sum(F.when(F.col("__nd") < l_div, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("risk_rows_l"),
    )
