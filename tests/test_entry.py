"""Smoke the driver contract: entry() + every queries() entry at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["key", "item", "order"]


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # non-SQL-expressible exceptions are known and deliberate:
    # nested-struct output and sketch internals (simhash_pairs and
    # multimodal_decode graduated to hash-checked in r09 via the
    # portable md5 family / FAKB integer replay; ann_lsh_topk and
    # ann_ivf_topk graduated in r11 via precomputed plane constants +
    # the floor-scaled exact-integer centroid)
    assert set(qs) - set(oracles) == {
        "denorm_nested",
        "approx_stats",
    }


def test_all_queries_run_smoke(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_correctness_full_artifact_is_fresh():
    """CORRECTNESS_FULL.json must cover the ENTIRE current registry —
    a query registered after the last tools/ci_gate.sh run reddens the
    suite until the artifact is regenerated (closes the round-6 ADVICE
    gap where two late registrations shipped with no oracle evidence
    in any committed artifact)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_FULL.json")
    rows = json.load(open(path))
    names = {r["name"] for r in rows} if isinstance(rows, list) else set(rows)
    registry = set(entry_mod.queries())
    missing = registry - names
    assert not missing, (
        f"CORRECTNESS_FULL.json is stale: {sorted(missing)} registered but "
        "never oracle-checked — rerun tools/ci_gate.sh"
    )


def test_driver_head_rotation_policy():
    """Self-enforcing rotation invariant (VERDICT r09 #1's cadence,
    pinned): treating the CURRENT head as checked next round, no
    registry name's freshest driver check may be more than 4 rounds
    old, and every never-driver-checked name must sit in the current
    head. When the next round's CORRECTNESS_r{N}.json lands, names
    deliberately skipped this round redden this test until the head
    rotates onto them — the freshness-test philosophy applied to the
    rotation itself.

    COUPLING (ADVICE r10 #5): committing a round's CORRECTNESS
    artifact advances current_round, so the _DRIVER_HEAD rotation for
    the NEW round must land in the same commit as (or before) the
    artifact. This is deliberate — the red test is the forcing
    function that makes the rotation the first task of every round,
    so the window stays 4 rounds rather than being widened."""
    import glob
    import json
    import os
    import re

    from kafka_denormalization_spark.queries import _DRIVER_HEAD

    root = os.path.join(os.path.dirname(__file__), "..")
    fresh: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        for name in json.load(open(path)):
            fresh[name] = max(fresh.get(name, 0), rnd)
    assert rounds, "no driver artifacts found"
    current_round = max(rounds) + 1
    for name in _DRIVER_HEAD:
        fresh[name] = current_round

    registry = set(entry_mod.queries())
    never = sorted(n for n in registry if n not in fresh)
    assert not never, (
        f"never driver-checked and not in the current head: {never} — "
        "rotate them into queries.py _DRIVER_HEAD"
    )
    stale = sorted(
        (fresh[n], n) for n in registry if current_round - fresh[n] > 4
    )
    assert not stale, (
        f"stale beyond 4 rounds at round {current_round}: {stale} — "
        "rotate them into queries.py _DRIVER_HEAD"
    )
