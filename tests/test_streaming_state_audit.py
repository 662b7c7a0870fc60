"""VERDICT r12 #2: the streaming-twin state-cardinality audit must be
COMPLETE (every _collect_state call site classified, no stale entries)
and SOUND (no data-dependent state folds through the driver list)."""

from __future__ import annotations

import ast
import inspect


def _collect_state_calls():
    """Every _collect_state call in streaming_q.py as (what-tag,
    domain_bound-or-None), extracted from the AST (not regex) so
    multi-line calls count."""
    from kcl_akka_stream_spark.queries import streaming_q

    tree = ast.parse(inspect.getsource(streaming_q))
    calls = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        name = fn.id if isinstance(fn, ast.Name) else getattr(fn, "attr", "")
        if name != "_collect_state":
            continue
        if isinstance(fn, ast.Name) and isinstance(
            node.args[0] if node.args else None, ast.arg
        ):
            continue  # the def itself never parses as a Call; belt+braces
        if len(node.args) >= 2 and isinstance(node.args[1], ast.Constant):
            bound = None
            for kw in node.keywords:
                if kw.arg == "domain_bound" and isinstance(
                    kw.value, ast.Constant
                ):
                    bound = kw.value.value
            calls.append((node.args[1].value, bound))
    return calls


def _collect_state_tags():
    return [tag for tag, _b in _collect_state_calls()]


def test_audit_table_matches_call_sites_exactly():
    from kcl_akka_stream_spark.queries.streaming_q import STATE_CARDINALITY

    actual = _collect_state_tags()
    # no duplicate tags: each call site must be individually attributable
    assert len(actual) == len(set(actual)), sorted(actual)
    declared = [t for *_x, folds in STATE_CARDINALITY.values() for t in folds]
    assert sorted(declared) == sorted(actual), (
        "STATE_CARDINALITY.folds out of sync with _collect_state call "
        f"sites: declared-not-actual={sorted(set(declared) - set(actual))} "
        f"actual-not-declared={sorted(set(actual) - set(declared))}"
    )


def test_every_driver_fold_declares_a_domain_bound():
    # VERDICT r13 #4: MAX_STATE_ROWS alone let a group-bounded family
    # whose DOMAIN grows (value-range bins, time-span bars) drift toward
    # the 100k cliff.  Every registry call site must pass an explicit
    # per-family domain_bound, a literal int well under MAX_STATE_ROWS.
    from kcl_akka_stream_spark.queries.streaming_q import MAX_STATE_ROWS

    calls = _collect_state_calls()
    assert calls, "no _collect_state call sites found"
    for tag, bound in calls:
        assert isinstance(bound, int), (
            f"{tag}: _collect_state call missing a literal domain_bound"
        )
        assert 0 < bound < MAX_STATE_ROWS, (tag, bound)


def test_domain_bound_violation_raises_with_family_name(spark):
    # engineered red: a state relation that outgrows its declared domain
    # (here 10 rows vs domain_bound=5) raises loudly, naming the family
    # and the bound that tripped -- BEFORE the generic max_state_rows cap
    import pytest

    from kcl_akka_stream_spark.queries.streaming_q import (
        StateCardinalityExceeded,
        _collect_state,
    )

    df = spark.range(10)
    with pytest.raises(
        StateCardinalityExceeded, match="fam-x.*domain_bound=5"
    ):
        _collect_state(df, "fam-x", domain_bound=5)
    # and within-bound passes untouched
    assert len(_collect_state(df, "fam-ok", domain_bound=10)) == 10


def test_no_data_dependent_driver_fold():
    from kcl_akka_stream_spark.queries.streaming_q import STATE_CARDINALITY

    assert len(STATE_CARDINALITY) == 23  # all 23 mergeable-state families
    for fam, (mech, card, _bound, folds) in STATE_CARDINALITY.items():
        assert mech in ("driver-fold", "epoch-union", "checkpoint-fold"), fam
        assert card in ("constant", "group-bounded", "data-dependent"), fam
        if mech == "driver-fold":
            assert folds, f"{fam}: driver-fold must list its fold tags"
            assert card != "data-dependent", (
                f"{fam}: data-dependent state must use the executor-side "
                "epoch-union pattern (stream_session_merge, "
                "stream_bitmap_merge), never a driver fold"
            )
        else:
            assert folds == (), f"{fam}: non-driver mechanism has no tags"


def test_epoch_union_families_never_touch_collect_state():
    # Epoch-union families must not regress to a driver fold: their
    # function bodies may not reference _collect_state at all and must
    # detach via eager localCheckpoint.  The set covers the two
    # data-dependent families AND the four former largest-bound driver
    # folds migrated in r15 (VERDICT r14 #5).
    from kcl_akka_stream_spark.queries import streaming_q
    from kcl_akka_stream_spark.queries.streaming_q import STATE_CARDINALITY

    epoch_union = sorted(
        fam
        for fam, (mech, *_rest) in STATE_CARDINALITY.items()
        if mech == "epoch-union"
    )
    assert epoch_union == [
        "stream_bitmap_merge",
        "stream_bloom_merge",
        "stream_kl_drift_merge",
        "stream_ks_merge",
        "stream_ohlc_merge",
        "stream_session_merge",
    ]
    for fam in epoch_union:
        src = inspect.getsource(getattr(streaming_q, fam))
        assert "_collect_state(" not in src, fam
        assert "localCheckpoint" in src, fam
        assert 'mode("append").parquet' in src, fam
