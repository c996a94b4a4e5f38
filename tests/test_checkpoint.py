"""checkpoint.py contracts: persist ownership + reliable-dir stability.

ADVICE r10 #2 repro: persist_if_uncached's skip path (an identical
canonicalized plan is already cached) must not let the SECOND caller's
cleanup evict the FIRST caller's live cache — that was silently
recomputing session-memo subtrees. unpersist_if_owned is the only
sanctioned release path for frames obtained from persist_if_uncached.
"""

from __future__ import annotations

from kafka_denormalization_spark.checkpoint import (
    persist_if_uncached,
    unpersist_if_owned,
)


def _cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk or lvl.useOffHeap


def test_skip_path_borrows_does_not_own(spark):
    owner = persist_if_uncached(
        spark.range(64).selectExpr("id", "id * 3 AS v")
    )
    owner.count()
    assert owner._sg_persist_owned is True

    # a DIFFERENT DataFrame object with an identical canonicalized plan
    borrower = persist_if_uncached(
        spark.range(64).selectExpr("id", "id * 3 AS v")
    )
    assert borrower._sg_persist_owned is False, (
        "skip path fired (plan already cached) but claimed ownership"
    )

    # the borrower's cleanup must NOT evict the owner's cache
    unpersist_if_owned(borrower)
    assert _cached(owner), "borrower cleanup evicted the owner's cache"

    # the owner's cleanup does release it
    unpersist_if_owned(owner)
    assert not _cached(owner)


def test_same_object_twice_keeps_ownership(spark):
    df = spark.range(32).selectExpr("id", "id + 7 AS w")
    a = persist_if_uncached(df)
    assert a._sg_persist_owned is True
    # persist() returns self, so the second pass sees the SAME object
    # already cached — it must not demote the owner to borrower
    b = persist_if_uncached(a)
    assert b._sg_persist_owned is True
    unpersist_if_owned(b)
    assert not _cached(a)


def test_unmarked_frames_are_treated_as_owned(spark):
    df = spark.range(16).persist()
    df.count()
    assert _cached(df)
    unpersist_if_owned(df)
    assert not _cached(df)
