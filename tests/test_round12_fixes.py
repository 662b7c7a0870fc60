"""Round-12 ADVICE-r11 degenerate-case pins: single-row strata must
yield NULL (both engines), never inf -> Long.MaxValue divergence."""

from __future__ import annotations

import duckdb


def test_single_row_stratum_agrees_cross_engine(spark):
    # The guarded expression shape shared by agg_welch_ttest /
    # sample_neyman_allocation / agg_simpson_diversity: variance-like
    # divisor nullif(n-1, 0).  With n=1 DuckDB used to error on
    # CAST(inf AS BIGINT) while Spark non-ANSI cast saturated to
    # Long.MaxValue; with the guard BOTH yield NULL.
    expr = (
        "cast(floor(n * sqrt((cast(s2 as double) - cast(s1 as double)"
        " * s1 / n) / nullif(n - 1, 0))) as bigint)"
    )
    df = spark.createDataFrame([(1, 7, 49)], "n long, s1 long, s2 long")
    got_spark = df.selectExpr(f"{expr} as w").collect()[0].w
    got_duck = duckdb.sql(
        f"SELECT {expr.replace('floor', 'floor')} AS w"
        " FROM (SELECT 1::BIGINT n, 7::BIGINT s1, 49::BIGINT s2)"
    ).fetchone()[0]
    assert got_spark is None and got_duck is None
    # and a 2-row stratum still produces the real weight in both
    df2 = spark.createDataFrame([(2, 10, 52)], "n long, s1 long, s2 long")
    w_spark = df2.selectExpr(f"{expr} as w").collect()[0].w
    w_duck = duckdb.sql(
        f"SELECT {expr} AS w"
        " FROM (SELECT 2::BIGINT n, 10::BIGINT s1, 52::BIGINT s2)"
    ).fetchone()[0]
    assert w_spark == w_duck == 2  # sd = sqrt(2/1) ~ 1.414; floor(2*1.414)


def test_scd2_consistency_report_all_zero_on_sound_build(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["scd2_consistency_report"](spark, sf_dir).collect()[0]
    assert r.n_keys > 0 and r.n_rows > r.n_keys  # non-vacuous: multi-version keys
    for c in (
        "viol_current_per_key",
        "viol_open_with_end",
        "viol_closed_without_end",
        "viol_contiguity",
        "viol_nonpositive_span",
        "viol_version_numbering",
        "viol_adjacent_same_state",
    ):
        assert getattr(r, c) == 0, c


def test_scd2_consistency_reds_engineered_violations(spark):
    # The acceptance contract must go RED on a broken table by
    # construction: one engineered violation per invariant.
    import datetime

    from kcl_akka_stream_spark.operators.cdc import scd2_consistency

    t = lambda s: datetime.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # key 1: duplicated current + open row carrying valid_to
        (1, "a", 1, t(0), t(10), 1),
        (1, "b", 2, t(10), None, 1),
        # key 2: contiguity violation (gap 10..20 -> 25) + closed w/o end
        (2, "a", 1, t(0), t(10), 0),
        (2, "b", 2, t(10), None, 0),
        (2, "c", 3, t(25), None, 1),
        # key 3: nonpositive span + version gap (2,3) + adjacent same state
        (3, "x", 2, t(0), t(0), 0),
        (3, "x", 3, t(0), None, 1),
    ]
    scd2 = spark.createDataFrame(
        rows,
        "user_id long, state string, version long, valid_from timestamp,"
        " valid_to timestamp, is_current int",
    )
    r = scd2_consistency(scd2).collect()[0]
    assert r.viol_current_per_key == 1  # key 1 carries TWO current rows
    assert r.viol_open_with_end == 1
    assert r.viol_closed_without_end == 1
    assert r.viol_contiguity >= 1
    assert r.viol_nonpositive_span == 1
    assert r.viol_version_numbering == 1
    assert r.viol_adjacent_same_state == 1


def test_wav_header_parser_byte_exact_vs_struct(spark):
    # The parser must agree with struct-packed REAL headers, including
    # the corrupt-blob path (riff_ok=0, NULL fields, no poisoning).
    import struct

    from kcl_akka_stream_spark.operators.multimodal import parse_wav_header

    def wav(sr, ch, bits, data_sz):
        ba = ch * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 36 + data_sz) + b"WAVE" + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ba, ba, bits)
            + b"data" + struct.pack("<I", data_sz)
        )

    rows = [
        (1, bytearray(wav(44100, 2, 16, 176400))),  # exactly 1 s stereo
        (2, bytearray(wav(8000, 1, 16, 24000))),    # 1.5 s mono
        (3, bytearray(b"NOTAWAVFILE" * 8)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in parse_wav_header(df).collect()}
    assert (got[1].sample_rate, got[1].channels, got[1].duration_us) == (
        44100, 2, 1_000_000,
    )
    assert (got[2].byte_rate, got[2].duration_us) == (16000, 1_500_000)
    assert got[3].riff_ok == 0 and got[3].sample_rate is None


def test_mp4_header_parser_walks_boxes(spark):
    # The moov offset must come from the ftyp SIZE FIELD: an oversized
    # ftyp (extra compatible brands) still parses, proving this is a
    # box walk and not a fixed-offset template.
    import struct

    from kcl_akka_stream_spark.operators.multimodal import parse_mp4_header

    def mp4(brand, ts, dur, extra_brands=0):
        pad = b"mp41" * extra_brands
        ftyp = (
            struct.pack(">I", 16 + len(pad)) + b"ftyp" + brand
            + struct.pack(">I", 0) + pad
        )
        mvhd = (
            struct.pack(">I", 108) + b"mvhd"
            + struct.pack(">IIIII", 0, 0, 0, ts, dur) + b"\x00" * 80
        )
        return ftyp + struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd

    rows = [
        (1, bytearray(mp4(b"isom", 600, 1800))),
        (2, bytearray(mp4(b"mp42", 90000, 450000, extra_brands=3))),
        (3, bytearray(b"\x00" * 64)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in parse_mp4_header(df).collect()}
    assert (got[1].brand, got[1].timescale, got[1].duration_ms) == (
        "isom", 600, 3000,
    )
    assert (got[2].brand, got[2].duration_ms) == ("mp42", 5000)  # walked past pad
    assert got[3].mp4_ok == 0 and got[3].brand is None


def test_wav_mp4_header_queries_nonvacuous(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    wav = QUERIES["multimodal_wav_header"](spark, sf_dir).collect()
    bad = [r for r in wav if r.sample_rate is None]
    good = [r for r in wav if r.sample_rate is not None]
    assert len(good) >= 3 and sum(r.n_files for r in good) > 0
    assert len(bad) == 1 and bad[0].n_bad == bad[0].n_files > 0
    assert all(r.n_bad == 0 for r in good)
    mp4 = QUERIES["multimodal_mp4_header"](spark, sf_dir).collect()
    good4 = [r for r in mp4 if r.brand is not None]
    assert {r.brand for r in good4} == {"isom", "mp42"}
    assert all(r.total_duration_ms > 0 for r in good4)


def test_decontaminate_fuzzy_catches_paraphrase_exact_misses(spark):
    # The reason the fuzzy path exists: a doc paraphrased so that EVERY
    # 5-token window contains an edit shares ZERO word 5-grams with the
    # eval item (exact path silent) but keeps high 3-shingle Jaccard
    # (LSH+verify catches it).  Also pin: verbatim subset caught by
    # both; unrelated doc by neither.
    from kcl_akka_stream_spark.operators.corpus import (
        decontaminate,
        decontaminate_fuzzy,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "one two three four five six seven eight nine ten").split()
    eval_text = " ".join(base)
    # paraphrase: swap every 5th token -> no shared 5-gram, many 3-grams
    para = [
        (w.upper() + "x") if i % 5 == 0 else w for i, w in enumerate(base)
    ]
    paraphrase = " ".join(para)
    verbatim = " ".join(base[10:25])  # contiguous 15-token excerpt
    unrelated = " ".join(f"tok{i}m" for i in range(40))
    eval_df = spark.createDataFrame(
        [(1000, eval_text)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, paraphrase), (2, verbatim), (3, unrelated)],
        "doc_id long, text string",
    )
    exact_ids = {
        r.doc_id for r in decontaminate(corpus, eval_df, k=5).collect()
    }
    # bands=8 (1 row/band): decontamination wants RECALL -- at the
    # j ~ 0.26 a max-density paraphrase leaves on 3-shingles, 4x2
    # banding catches ~32% of pairs while 8x1 catches ~91%
    fuzzy_ids = {
        r.doc_id
        for r in decontaminate_fuzzy(
            corpus, eval_df, bands=8, threshold=0.25
        ).collect()
    }
    assert 2 in exact_ids and 1 not in exact_ids  # gram path blind to paraphrase
    assert 1 in fuzzy_ids                         # fuzzy catches it
    assert 3 not in exact_ids and 3 not in fuzzy_ids


def test_decontaminate_fuzzy_bucket_cap_is_loud_recall_trade(spark):
    # max_bucket_size caps the CORPUS side of a colliding bucket: with a
    # cap of 1, a 3-copy near-dup family exceeds the bucket and drops
    # out (recall trade), while a unique match survives.
    from kcl_akka_stream_spark.operators.corpus import decontaminate_fuzzy

    text = " ".join(f"w{i} common phrase here" for i in range(12))
    eval_df = spark.createDataFrame(
        [(100, text)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, text), (2, text), (3, text)], "doc_id long, text string"
    )
    uncapped = decontaminate_fuzzy(corpus, eval_df, threshold=0.5)
    capped = decontaminate_fuzzy(
        corpus, eval_df, threshold=0.5, max_bucket_size=1
    )
    assert uncapped.count() == 3
    assert capped.count() == 0


def test_png_parser_byte_exact_vs_struct(spark):
    import struct
    import zlib

    from kcl_akka_stream_spark.operators.multimodal import parse_png_header

    def png(w, h, depth, ctype):
        ihdr = struct.pack(">II", w, h) + bytes([depth, ctype, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

    rows = [
        (1, bytearray(png(1920, 1080, 8, 2))),
        (2, bytearray(png(64, 64, 16, 6))),
        (3, bytearray(b"GIF89a" + b"\x00" * 30)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in parse_png_header(df).collect()}
    assert (got[1].width, got[1].height, got[1].n_pixels) == (
        1920, 1080, 2_073_600,
    )
    assert (got[2].bit_depth, got[2].color_type) == (16, 6)
    assert got[3].png_ok == 0 and got[3].width is None


def test_dsir_prefers_target_like_docs(spark):
    # The selector's contract: documents sharing the target's bigram
    # distribution must outrank documents that don't.  Corpus = 3
    # target-styled docs + 3 alien docs; all 6 must rank with the
    # target-styled strictly first.
    from kcl_akka_stream_spark.operators.sampling import dsir_select

    tstyle = "the quick brown fox jumps over the lazy dog again and again"
    alien = "zzq wvx qqj xjz vvk jxq kqv zwz xqx jjw"
    target = spark.createDataFrame(
        [(1000 + i, tstyle) for i in range(3)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, tstyle + f" extra{i}") for i in range(3)]
        + [(10 + i, alien + f" extra{i}") for i in range(3)],
        "doc_id long, text string",
    )
    got = dsir_select(corpus, target, k=6).collect()
    ranked = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
    assert set(ranked[:3]) == {0, 1, 2}, ranked
    assert got[0].weight_micro > 0  # target-like docs score positive
    weights = {r.doc_id: r.weight_micro for r in got}
    assert all(weights[i] > weights[j] for i in (0, 1, 2) for j in (10, 11, 12))


def test_chain_audit_reds_engineered_chain(spark):
    # The contract: a transitive merge whose endpoints never verified
    # must surface as n_chained with density < 1e6; a clique stays 1e6.
    from kcl_akka_stream_spark.operators.dedup import chain_audit

    ver = spark.createDataFrame(
        # chain: 1-2, 2-3 verified, 1-3 NOT -> one size-3 cluster, e=2
        # clique: 10-11, 11-12, 10-12 all verified -> size-3, e=3
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    got = {r.cluster_size: r for r in chain_audit(ver).collect()}
    assert got[3].n_clusters == 2
    assert got[3].n_chained == 1
    assert got[3].min_density_ppm == 666666  # floor(2e6/3)
    assert got[3].total_edges == 5


def test_chain_audit_fixture_clusters_are_cliques(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["dedup_chain_audit"](spark, sf_dir).collect()
    assert len(rows) >= 1 and all(r.n_chained == 0 for r in rows)
    assert all(r.min_density_ppm == 1_000_000 for r in rows)


def test_span_coverage_catches_quoted_boilerplate(spark):
    # The signal doc-level MinHash misses: a unique article quoting one
    # shared 10-token paragraph gets coverage == the quote's interval
    # union, while fully-unique docs get exactly 0.  Also pins the
    # interval-union math: two OVERLAPPING dup windows must not double
    # count.
    from kcl_akka_stream_spark.operators.dedup import duplicate_span_coverage

    quote = "shared boilerplate sentence that appears verbatim in both documents exactly"
    a = "unique alpha words here " + quote + " trailing alpha unique tail"
    b = "different beta opening text " + quote + " and a beta specific end"
    c = "entirely unique gamma document with no overlap at all anywhere"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in duplicate_span_coverage(df, k=8).collect()}
    assert got[3].covered_tokens == 0 and got[3].coverage_ppm == 0
    # the 10-token quote yields 3 consecutive dup 8-windows in each doc
    # (plus boundary windows differ) -> interval union == 10 tokens
    assert got[1].covered_tokens == 10, got[1]
    assert got[2].covered_tokens == 10, got[2]
    assert got[1].n_dup_windows == 3  # overlapping, but union counts once
    assert 0 < got[1].coverage_ppm < 1_000_000


def test_minhash_signature_min_lattice_split_invariant(spark):
    # min(sig(A), sig(B)) == sig(A ∪ B) over EVERY 2-way split of 5 docs,
    # and a replayed batch (A ∪ A-again) is absorbed (idempotence) --
    # the lattice law behind stream_minhash_merge.
    from itertools import combinations

    from kcl_akka_stream_spark.operators.dedup import minhash_signatures

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "alpha beta gamma different tail here",
        "completely other content in this doc",
        "five six seven eight nine ten eleven",
    ]

    def sig(idx):
        df = spark.createDataFrame(
            [("en", texts[i]) for i in idx], "lang string, text string"
        )
        r = minhash_signatures(df, text_col="text", id_col="lang").collect()
        return tuple(r[0][f"mh_{s}"] for s in range(8)) if r else None

    full = sig(range(5))
    ids = list(range(5))
    for k in range(1, 5):
        for left in combinations(ids, k):
            right = [i for i in ids if i not in left]
            a, b = sig(left), sig(right)
            merged = tuple(min(x, y) for x, y in zip(a, b))
            assert merged == full, (left, merged, full)
    # idempotence: replaying the whole corpus leaves the signature fixed
    assert tuple(min(x, y) for x, y in zip(full, full)) == full


def test_min_k_prob_separates_boilerplate_from_novel(spark):
    # The signal's contract: a doc made ONLY of corpus-common tokens has
    # no surprising tail (low Min-K% NLL); a doc with rare tokens scores
    # high.  Average NLL would blur this less sharply.
    from kcl_akka_stream_spark.operators.text import min_k_prob

    common = "the quick brown fox " * 10
    rows = [(i, common) for i in range(8)]
    rows.append((100, common + " zyqx wvvk qqjz"))  # rare-token tail
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in min_k_prob(df, k_pct=20).collect()}
    assert got[100].mink_nll_micro > got[0].mink_nll_micro
    assert got[0].k_used == max(1, got[0].n_tokens * 20 // 100)


def test_k_anonymity_reds_engineered_violations(spark):
    # A QI group of 2 rows (< k=5) and a 6-row group all from ONE user
    # (k-anonymous but l-diversity violating) must both surface.
    import pyspark.sql.functions as F

    from kcl_akka_stream_spark.operators.sampling import k_anonymity_report

    rows = (
        [("a", u) for u in (1, 2, 3, 4, 5, 6)]   # clean: 6 rows, 6 users
        + [("b", 7), ("b", 8)]                   # k violation: 2 rows
        + [("c", 9)] * 6                         # l violation: 1 user
    )
    df = spark.createDataFrame(rows, "qi string, user_id long")
    r = k_anonymity_report(
        df, quasi_cols=[F.col("qi")], k=5, l_div=2
    ).collect()[0]
    assert r.n_groups == 3 and r.n_rows == 14
    assert r.viol_k_anonymity == 1 and r.risk_rows_k == 2
    assert r.viol_l_diversity == 1 and r.risk_rows_l == 6
    assert r.min_group_size == 2


def test_ivf_delta_serving_sees_fresh_vectors(spark, sf_dir):
    # Freshness contract: delta vectors (vec_id % 10 == 0) MUST be
    # servable -- at least one appears in some query's merged top-5
    # (they are 10% of the corpus; with 5 queries x 5 ranks the fixture
    # always surfaces some), and every rank list is dense 1..5.
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["sim_ivf_delta_serving"](spark, sf_dir).collect()
    assert len(rows) == 25  # 5 queries x top-5
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    assert any(r.n_id % 10 == 0 for r in rows), "no delta vector served"


def test_backoff_lm_separates_in_domain_from_ood(spark):
    # Contract: an in-domain doc scores near the LM, an out-of-domain
    # doc backs off (n_backoff_uni + floor hits) and scores WORSE; the
    # three branches (pair hit / unigram backoff / OOV floor) are all
    # exercised and accounted.
    from kcl_akka_stream_spark.operators.text import backoff_lm_score

    lm = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat and the dog ran")
         for i in range(3)],
        "doc_id long, text string",
    )
    score_df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),        # all pairs seen
            (2, "the mat sat on the cat dog"),    # seen words, new pairs
            (3, "zzq wvx kqj totally unseen"),    # OOV floor
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in backoff_lm_score(score_df, lm).collect()}
    assert got[1].n_pair_hits == got[1].n_bigrams      # fully in-domain
    assert got[2].n_backoff_uni > 0                    # unigram branch
    assert got[3].n_pair_hits == 0 and got[3].n_backoff_uni == 0  # floor
    assert got[1].avg_nll_micro < got[2].avg_nll_micro < got[3].avg_nll_micro


def test_cohens_kappa_hand_values(spark, sf_dir):
    # Hand-check: perfect agreement -> kappa = 1e6; the engineered 20%
    # md5 flip keeps fixture kappa strictly between chance and perfect.
    import pyspark.sql.functions as F

    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["agg_cohens_kappa"](spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        # ~20% disagreement, 4 classes: kappa lands well inside (0, 1)
        assert 0 < r.kappa_micro < 1_000_000, r
        assert r.n_agree < r.n  # the flip is real
        # exact identity: kappa = (agree*n - chance)*1e6 div (n^2 - chance)
        num = r.n_agree * r.n - r.chance_prod_sum
        den = r.n * r.n - r.chance_prod_sum
        assert r.kappa_micro == num * 1_000_000 // den if num >= 0 else True


def test_mmr_prefers_diversity_over_redundant_clones(spark):
    # Engineered: the 3 most relevant candidates are near-clones; pure
    # relevance would return clones at steps 1-3, MMR must break to the
    # diverse candidate by step 2 or 3.
    from kcl_akka_stream_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # query
        (1, [0.99, 0.14, 0.0, 0.0]),        # clone family, rel ~.99
        (2, [0.99, 0.141, 0.0, 0.0]),
        (3, [0.99, 0.142, 0.0, 0.0]),
        (4, [0.7, 0.0, 0.71, 0.0]),         # diverse, rel ~.70
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # lambda=0.5: the clone's redundancy penalty (~sim 0.9999) exceeds
    # its relevance edge over the diverse candidate
    out = mmr_rerank(
        emb, emb.filter("vec_id = 0"), n_candidates=4, k=3,
        lambda_tenths=5,
    ).collect()
    steps = {r.step: r.n_id for r in out}
    assert steps[1] in (1, 2, 3)            # top relevance first
    assert steps[2] == 4, steps             # diversity beats the clones
    assert len(set(steps.values())) == 3    # no repeats
    # and at lambda=1.0 MMR degenerates to pure relevance (all clones)
    pure = mmr_rerank(
        emb, emb.filter("vec_id = 0"), n_candidates=4, k=3,
        lambda_tenths=10,
    ).collect()
    assert {r.n_id for r in pure} == {1, 2, 3}


def test_decontaminate_spans_quantifies_quotes(spark):
    # A corpus doc quoting a 10-token eval span shows EXACTLY 10 covered
    # tokens; an untouched doc shows 0 -- the quantification the flag
    # paths cannot give.
    from kcl_akka_stream_spark.operators.corpus import (
        decontaminate_span_coverage,
    )

    quote = ("benchmark item text that must never leak into training "
             "data at all")
    eval_df = spark.createDataFrame(
        [(100, quote)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro words here " + quote + " closing words follow now"),
            (2, "completely unrelated document content with zero overlap"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in decontaminate_span_coverage(corpus, eval_df, k=8).collect()
    }
    n_quote = len(quote.split())
    assert got[1].covered_tokens == n_quote
    assert got[2].covered_tokens == 0 and got[2].coverage_ppm == 0
    assert 0 < got[1].coverage_ppm < 1_000_000
