"""VERDICT r12 #2: the streaming-twin state-cardinality audit must be
COMPLETE (every _collect_state call site classified, no stale entries)
and SOUND (no data-dependent state folds through the driver list)."""

from __future__ import annotations

import ast
import inspect


def _collect_state_tags():
    """Every what-tag passed to _collect_state in streaming_q.py,
    extracted from the AST (not regex) so multi-line calls count."""
    from kcl_akka_stream_spark.queries import streaming_q

    tree = ast.parse(inspect.getsource(streaming_q))
    tags = []
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
            tags.append(node.args[1].value)
    return tags


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


def test_no_data_dependent_driver_fold():
    from kcl_akka_stream_spark.queries.streaming_q import STATE_CARDINALITY

    assert len(STATE_CARDINALITY) == 20  # all 20 mergeable-state families
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
    # The two data-dependent families must not regress to a driver fold:
    # their function bodies may not reference _collect_state at all and
    # must detach via eager localCheckpoint.
    from kcl_akka_stream_spark.queries import streaming_q

    for fam in ("stream_session_merge", "stream_bitmap_merge"):
        src = inspect.getsource(getattr(streaming_q, fam))
        assert "_collect_state(" not in src, fam
        assert "localCheckpoint" in src, fam
        assert 'mode("append").parquet' in src, fam
