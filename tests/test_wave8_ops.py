"""Round-8 wave-8 operators: robust MAD outliers, label propagation,
neighbor-Jaccard link prediction, HRW sharding, perplexity buckets,
keep-best representative selection."""

from pyspark.sql import functions as F


def test_mad_outlier_report_matches_bruteforce(spark):
    from kcl_akka_stream_spark.operators.aggregations import mad_outlier_report

    vals = [1.0, 1.5, 2.0, 2.5, 3.0, 100.0]  # one wild point
    df = spark.createDataFrame([("a", v) for v in vals], ["g", "v"])
    out = {r.g: r for r in mad_outlier_report(df, "g", "v").collect()}
    r = out["a"]
    units = sorted(int(v * 1_000_000 + 0.5) for v in vals)
    n = len(units)
    med = units[(n + 1) // 2 - 1]  # lower median
    devs = sorted(abs(u - med) for u in units)
    mad = devs[(n + 1) // 2 - 1]
    assert r.n == n
    assert r.med_units == med
    assert r.mad_units == mad
    assert r.n_outliers == sum(1 for u in units if abs(u - med) > 3 * mad)
    # the wild point IS caught (the z-score would have been diluted)
    assert r.n_outliers >= 1


def test_mad_outlier_report_handles_constant_group(spark):
    from kcl_akka_stream_spark.operators.aggregations import mad_outlier_report

    df = spark.createDataFrame([("c", 5.0)] * 4, ["g", "v"])
    r = mad_outlier_report(df, "g", "v").collect()[0]
    assert r.mad_units == 0 and r.n_outliers == 0


def test_label_propagation_separates_cliques(spark):
    from kcl_akka_stream_spark.operators.graph import label_propagation

    def clique(nodes):
        return [
            (a, b, 1)
            for a in nodes
            for b in nodes
            if a != b
        ]

    edges = spark.createDataFrame(
        clique([1, 2, 3]) + clique([10, 11, 12]),
        ["src", "dst", "w"],
    )
    labels = {r.node: r.label for r in label_propagation(edges, 2).collect()}
    # each clique converges to its min node id in two synchronous rounds
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == labels[12] == 10


def test_label_propagation_weight_beats_min_label_tiebreak(spark):
    from kcl_akka_stream_spark.operators.graph import label_propagation

    # node 5 hears label 1 with weight 1 and label 9 with weight 10:
    # the heavier vote wins even though 1 < 9
    edges = spark.createDataFrame(
        [(5, 1, 1), (1, 5, 1), (5, 9, 10), (9, 5, 10)],
        ["src", "dst", "w"],
    )
    labels = {r.node: r.label for r in label_propagation(edges, 1).collect()}
    assert labels[5] == 9


def test_neighbor_jaccard_matches_bruteforce(spark):
    from kcl_akka_stream_spark.operators.graph import neighbor_jaccard

    # path 1-2-3-4 plus edge 1-3: canonical src < dst
    e = [(1, 2), (2, 3), (3, 4), (1, 3)]
    edges = spark.createDataFrame(e, ["src", "dst"])
    out = {(r.u, r.v): r for r in neighbor_jaccard(edges).collect()}
    nbrs = {}
    for a, b in e:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expected = {}
    for u in nbrs:
        for v in nbrs:
            if u < v and (u, v) not in e:
                common = nbrs[u] & nbrs[v]
                if common:
                    expected[(u, v)] = (
                        len(common),
                        len(nbrs[u] | nbrs[v]) - 0,
                    )
    assert set(out) == set(expected)
    for (u, v), r in out.items():
        common = nbrs[u] & nbrs[v]
        union = nbrs[u] | nbrs[v]
        assert r.n_common == len(common)
        assert r.jaccard_micro == (len(common) * 1_000_000) // len(union)


def test_rendezvous_shard_moves_only_into_new_shard(spark, sf_dir):
    from kcl_akka_stream_spark.operators.layout import rendezvous_shard
    from kcl_akka_stream_spark.queries.registry import tbl

    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    d = docs.select(
        rendezvous_shard("cast(doc_id as string)", 8, "hrw8").alias("s8"),
        rendezvous_shard("cast(doc_id as string)", 9, "hrw8").alias("s9"),
    ).collect()
    assert all(0 <= r.s8 <= 7 and 0 <= r.s9 <= 8 for r in d)
    # the HRW contract: a row either keeps its shard or moves INTO the
    # new shard 8 -- never between surviving shards
    assert all(r.s8 == r.s9 or r.s9 == 8 for r in d)
    moved = sum(1 for r in d if r.s8 != r.s9)
    # ~1/9 expected; generous envelope for the fixture's size
    assert 0 < moved < len(d) // 3


def test_perplexity_buckets_are_balanced_terciles(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    out = QUERIES["pipeline_perplexity_buckets"](spark, sf_dir).collect()
    by_lang = {}
    for r in out:
        assert r.ppl_bucket in (0, 1, 2)
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        counts = [
            sum(1 for r in rows if r.ppl_bucket == b) for b in (0, 1, 2)
        ]
        assert max(counts) - min(counts) <= 1, (lang, counts)
        # head bucket holds the LOWEST nll (most fluent) docs
        head = max(r.avg_nll_micro for r in rows if r.ppl_bucket == 0)
        tail = min(r.avg_nll_micro for r in rows if r.ppl_bucket == 2)
        assert head <= tail


def test_keep_best_selects_one_longest_per_cluster(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    out = QUERIES["pipeline_dedup_keep_best"](spark, sf_dir).collect()
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, rows in clusters.items():
        kept = [r for r in rows if r.kept == 1]
        assert len(kept) == 1, cid
        best = max(rows, key=lambda r: (r.n_chars, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
