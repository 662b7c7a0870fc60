"""Property-based tests (hypothesis) for the round-13 operators with
paper-stated guarantees: winnowing's shared-run theorem and int8
quantization's margin-conditional rank preservation.  Each property runs
against a pure-python REPLICA of the operator's exact integer math (the
tokenizer bpe_merge_step precedent); one Spark example per operator pins
the replica to the real DataFrame implementation bit-for-bit."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

# --- winnowing: the Schleimer-Wilkerson-Aiken guarantee ---------------------
# Any two documents sharing a token run of length >= w + k - 1 share at
# least one selected fingerprint.  Replica mirrors
# operators/dedup.py::winnowing_fingerprints exactly: 7-hex-digit md5
# prefix of the space-joined k-gram, packed key = h * 2^32 + pos, min per
# w-window of consecutive positions (pack widened 2^20 -> 2^32 per
# ADVICE r13 so position bits cannot bleed into fp_hash below a
# physically impossible 4.29-billion-token single document).

K, W = 4, 5


def _winnow(tokens: list[str]) -> set[int]:
    if len(tokens) < K:
        return set()
    keys = []
    for pos in range(len(tokens) - K + 1):
        gram = " ".join(tokens[pos : pos + K])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:7], 16)
        keys.append(h * 4294967296 + pos)
    fps = set()
    for start in range(len(keys) - W + 1):
        fps.add(min(keys[start : start + W]) // 4294967296)
    return fps


_word = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@given(
    st.lists(_word, min_size=0, max_size=12),
    st.lists(_word, min_size=0, max_size=12),
    st.lists(_word, min_size=W + K - 1, max_size=W + K + 4),  # shared run
    st.lists(_word, min_size=0, max_size=12),
    st.lists(_word, min_size=0, max_size=12),
)
@settings(max_examples=200, deadline=None)
def test_winnowing_shared_run_guarantee(pre_a, post_a, run, pre_b, post_b):
    doc_a = pre_a + run + post_a
    doc_b = pre_b + run + post_b
    fa, fb = _winnow(doc_a), _winnow(doc_b)
    # the guarantee needs the run's k-grams; the run itself has
    # len(run) - K + 1 >= W positions, so some window lies wholly inside
    assert fa & fb, (doc_a, doc_b)


@given(st.lists(_word, min_size=K, max_size=20))
@settings(max_examples=200, deadline=None)
def test_winnowing_density_bound(tokens):
    # fingerprints come one per window start, deduped: never more than
    # n_grams, never zero when at least one full window exists
    fps = _winnow(tokens)
    n_keys = len(tokens) - K + 1
    if n_keys >= W:
        assert 1 <= len(fps) <= n_keys - W + 1


def test_winnowing_replica_matches_spark(spark):
    from kcl_akka_stream_spark.operators.dedup import winnowing_fingerprints

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add(r.fp_hash)
    for doc_id, text in docs:
        assert got[doc_id] == _winnow(text.split()), doc_id


# --- int8 prefilter: margin-conditional rank preservation -------------------
# With ONE global scale s, |s^2 * dot(qa, qb) - dot(a, b)| is bounded by
# s * (||a||_1 + ||b||_1) / 2 + s^2 * d / 4 (each component off by at most
# s/2).  If the exact top-1's margin over the runner-up exceeds twice that
# bound, the int8 ranking must keep it at rank 1.


def _quant(v, s):
    return [round(x / s) for x in v]


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=8,
            max_size=8,
        ),
        min_size=3,
        max_size=8,
    ),
    st.lists(
        st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
        min_size=8,
        max_size=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_int8_margin_conditional_top1(corpus, q):
    mx = max(
        (abs(x) for v in corpus + [q] for x in v), default=0.0
    )
    if mx == 0:
        return
    s = mx / 127.0
    exact = sorted(
        ((sum(a * b for a, b in zip(v, q)), i) for i, v in enumerate(corpus)),
        reverse=True,
    )
    top, second = exact[0], exact[1]
    qq = _quant(q, s)
    bound = lambda v: (  # noqa: E731
        s * (sum(abs(x) for x in v) + sum(abs(x) for x in q)) / 2.0
        + s * s * len(v) / 4.0
    )
    eps = max(bound(corpus[top[1]]), bound(corpus[second[1]]))
    if top[0] - second[0] <= 2 * eps + 1e-12:
        return  # margin too small: the theorem makes no claim
    ints = sorted(
        (
            (sum(a * b for a, b in zip(_quant(v, s), qq)), i)
            for i, v in enumerate(corpus)
        ),
        reverse=True,
    )
    assert ints[0][1] == top[1]
