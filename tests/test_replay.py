"""remove_reprocessed golden tests -- the exact behavior matrix of the
reference's IT/MessageUtilTest.scala:15-95 (FIXTURES.md §2)."""

from __future__ import annotations

import pytest

from kcl_akka_stream_spark.operators.replay import (
    UnexpectedMessageSequence,
    remove_reprocessed,
    remove_reprocessed_list,
)

ACCEPT = [
    # (received, expected) -- from MessageUtilTest
    (["m1", "m2", "m3"], ["m1", "m2", "m3"]),
    (["m1", "m1", "m1", "m2", "m3"], ["m1", "m2", "m3"]),  # repeated leading message
    (["m1", "m2", "m2", "m2", "m3"], ["m1", "m2", "m3"]),  # repeated middle message
    (["m1", "m2", "m3", "m3", "m3"], ["m1", "m2", "m3"]),  # repeated trailing message
    (["m1", "m2", "m1", "m2", "m3"], ["m1", "m2", "m3"]),  # repeated leading sequence
    (["m1", "m2", "m3", "m2", "m3", "m4"], ["m1", "m2", "m3", "m4"]),  # middle sequence
    (["m1", "m2", "m3", "m2", "m3"], ["m1", "m2", "m3"]),  # trailing sequence
    (["m1", "m2", "m3", "m2", "m2", "m3", "m4"], ["m1", "m2", "m3", "m4"]),  # nested retries
]

REJECT = [
    ["m1", "m2", "m1", "m3"],  # replay mismatch at beginning
    ["m1", "m2", "m3", "m2", "m4", "m5"],  # replay mismatch in middle
    ["m1", "m2", "m3", "m2", "m4"],  # replay mismatch at end
    ["m1", "m2", "m2", "m1", "m3"],  # reorder at beginning
    ["m1", "m2", "m3", "m3", "m2", "m4"],  # reorder in middle
    ["m1", "m2", "m3", "m3", "m2"],  # reorder at end
]


@pytest.mark.parametrize("received,expected", ACCEPT)
def test_accepts_and_strips(received, expected):
    assert remove_reprocessed_list("k", received) == expected


@pytest.mark.parametrize("received", REJECT)
def test_rejects(received):
    with pytest.raises(UnexpectedMessageSequence):
        remove_reprocessed_list("k", received)


def test_dataframe_operator_accepts(spark):
    rows = [("k1", m, i) for i, m in enumerate(["m1", "m2", "m3", "m2", "m3", "m4"])]
    rows += [("k2", m, i) for i, m in enumerate(["m1", "m1", "m2"])]
    df = spark.createDataFrame(rows, "key string, msg string, arrival long")
    out = remove_reprocessed(df, "key", "msg", "arrival")
    got = {(r.key, r.position): r.msg for r in out.collect()}
    assert got == {
        ("k1", 0): "m1",
        ("k1", 1): "m2",
        ("k1", 2): "m3",
        ("k1", 3): "m4",
        ("k2", 0): "m1",
        ("k2", 1): "m2",
    }


def test_dataframe_operator_rejects(spark):
    df = spark.createDataFrame(
        [("k1", m, i) for i, m in enumerate(["m1", "m2", "m2", "m1", "m3"])],
        "key string, msg string, arrival long",
    )
    with pytest.raises(Exception, match="out of order"):
        remove_reprocessed(df, "key", "msg", "arrival").collect()
