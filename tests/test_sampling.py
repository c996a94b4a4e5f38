"""Deterministic hash sampling (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.sampling import (
    fraction_threshold,
    hash_sample,
    stratified_sample,
)


def test_fraction_threshold_hex():
    assert fraction_threshold(0.5) == "80000000"
    assert fraction_threshold(0.25) == "40000000"
    assert fraction_threshold(0.0) == "00000000"
    assert len(fraction_threshold(0.999)) == 8


def test_hash_sample_rate_and_determinism(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    s1 = hash_sample(df, "k", 0.3, salt="a")
    n1 = s1.count()
    assert abs(n1 / 20_000 - 0.3) < 0.02  # ~binomial(20k, .3) tolerance
    # identical draw on re-run and after repartitioning (partition-independent)
    assert hash_sample(df.repartition(7), "k", 0.3, salt="a").count() == n1
    ids1 = {r["k"] for r in s1.collect()}
    ids2 = {r["k"] for r in hash_sample(df.repartition(3), "k", 0.3, salt="a").collect()}
    assert ids1 == ids2
    # a different salt draws an independent sample
    ids3 = {r["k"] for r in hash_sample(df, "k", 0.3, salt="b").collect()}
    assert ids3 != ids1
    # membership is monotone in the fraction (a doc kept at 30% stays at 60%)
    ids60 = {r["k"] for r in hash_sample(df, "k", 0.6, salt="a").collect()}
    assert ids1 <= ids60


def test_hash_sample_full_fraction(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert hash_sample(df, "k", 1.0).count() == 100


def test_stratified_rates(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b").otherwise("c").alias("src"),
    )
    out = stratified_sample(df, "src", {"a": 0.8, "b": 0.2}, "k", default_fraction=0.05)
    rates = {
        r["src"]: r["n"] / 10_000
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(rates["a"] - 0.8) < 0.03
    assert abs(rates["b"] - 0.2) < 0.03
    assert abs(rates.get("c", 0.0) - 0.05) < 0.03


def test_temperature_fractions_rebalance(spark):
    from kafka_denormalization_spark.operators.sampling import temperature_fractions

    # stratum "big" has 16x the weight of "small": sqrt-tempering gives
    # small a 4x larger share of the budget relative to its size
    df = spark.createDataFrame(
        [("big", 1600) for _ in range(10)] + [("small", 100) for _ in range(10)],
        "lang string, w long",
    )
    fr = {
        r["lang"]: r["keep_frac"]
        for r in temperature_fractions(df, "lang", "w", budget_frac=0.4).collect()
    }
    # sqrt shares: 4/5 vs 1/5 of budget 0.4*17000=6800 -> big 5440/16000=0.34,
    # small 1360/1000 -> capped at 1.0
    assert abs(fr["big"] - 0.34) < 1e-6
    assert fr["small"] == 1.0


def test_temperature_sample_deterministic_and_rebalanced(spark):
    from kafka_denormalization_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 9000 else "small", 10) for i in range(10_000)]
    df = spark.createDataFrame(rows, "k long, lang string, w long")
    out = temperature_sample(df, "lang", "w", "k", budget_frac=0.3)
    again = temperature_sample(df.repartition(13), "lang", "w", "k", budget_frac=0.3)
    ids = {r["k"] for r in out.collect()}
    assert ids == {r["k"] for r in again.collect()}
    n_small = sum(1 for i in ids if i >= 9000)
    n_big = len(ids) - n_small
    # tempered: the small stratum keeps a ~3x larger fraction of itself
    assert n_small / 1000 > 2.5 * (n_big / 9000)


def test_temperature_sample_arg_validation(spark):
    import pytest

    from kafka_denormalization_spark.operators.sampling import temperature_fractions

    df = spark.createDataFrame([("a", 1)], "lang string, w long")
    with pytest.raises(ValueError, match="exactly one"):
        temperature_fractions(df, "lang", "w")
    with pytest.raises(ValueError, match="exactly one"):
        temperature_fractions(df, "lang", "w", budget=10, budget_frac=0.5)
    with pytest.raises(ValueError, match="alpha"):
        temperature_fractions(df, "lang", "w", budget=10, alpha=0.0)


def test_epoch_mixture_repeats_low_resource_strata(spark):
    """UniMax-style epoch mixture: a stratum whose budget share exceeds its
    corpus weight repeats (epoch > 0), capped at max_epochs; shares absent
    from the target map drop; tail membership is deterministic."""
    from kafka_denormalization_spark.operators.sampling import (
        epoch_mixture_plan,
        epoch_mixture_sample,
    )

    rows = [(i, "big", 100) for i in range(90)] + [(100 + i, "small", 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    # budget = 1x corpus (10_000 chars), 50/50 target: big needs 5000/9000
    # (fractional), small needs 5000/1000 = 5 epochs -> capped at 3
    plan = {r["lang"]: r.asDict() for r in epoch_mixture_plan(
        df, "lang", "n_chars", {"big": 0.5, "small": 0.5}, 1.0, max_epochs=3.0
    ).collect()}
    assert plan["big"]["full_epochs"] == 0
    assert abs(plan["big"]["tail_frac"] - 5000 / 9000) < 1e-4
    assert plan["small"]["full_epochs"] == 3
    assert plan["small"]["tail_frac"] == 0.0

    out = epoch_mixture_sample(
        df, "lang", "n_chars", "doc_id", {"big": 0.5, "small": 0.5}, 1.0, max_epochs=3.0
    )
    small = out.filter("lang = 'small'")
    assert small.count() == 30  # 10 docs x 3 full epochs, zero tail
    assert small.groupBy("epoch").count().count() == 3
    big_frac = out.filter("lang = 'big'").count() / 90
    assert 0.35 < big_frac < 0.75  # ~5/9 fractional epoch, hash-drawn

    # determinism: the same call returns the identical kept set
    a = {(r["doc_id"], r["epoch"]) for r in out.collect()}
    b = {(r["doc_id"], r["epoch"]) for r in epoch_mixture_sample(
        df, "lang", "n_chars", "doc_id", {"big": 0.5, "small": 0.5}, 1.0, max_epochs=3.0
    ).collect()}
    assert a == b

    # unlisted stratum drops entirely
    out2 = epoch_mixture_sample(
        df, "lang", "n_chars", "doc_id", {"small": 1.0}, 1.0, max_epochs=3.0
    )
    assert out2.filter("lang = 'big'").count() == 0


def test_dsir_log_weights_semantics(spark):
    """Docs resembling the target domain weigh higher; tokenless docs
    weigh exactly 0; one row per input doc."""
    from pyspark.sql import functions as F
    from kafka_denormalization_spark.operators.sampling import dsir_log_weights

    rows = [
        # target domain (tgt=1): chemistry-flavored
        (1, "acid base reaction acid molecule", "tgt"),
        (2, "molecule bond acid reaction bond", "tgt"),
        # raw-only: sports-flavored
        (3, "goal match player goal team", "raw"),
        (4, "team player match goal score", "raw"),
        # candidates: one chemistry-like, one sports-like, one empty
        (5, "acid molecule bond reaction", "raw"),
        (6, "score team match player", "raw"),
        (7, "", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        r["doc_id"]: r["logw_r"]
        for r in dsir_log_weights(
            df, "doc_id", "text", F.col("src") == "tgt", num_buckets=32
        ).collect()
    }
    assert len(out) == 7
    assert out[5] > out[6]  # chemistry candidate beats sports candidate
    assert out[1] > 0 and out[2] > 0  # target docs score positive
    # doc 7 is empty: its lone '' split token is filtered before
    # bucketing, so it contributes no features and weighs exactly 0.0
    assert out[7] == 0.0


def test_dsir_resample_topk(spark):
    """Gumbel top-k: k rows out, deterministic across invocations, and
    high-weight docs selected before low-weight ones in aggregate."""
    from pyspark.sql import functions as F
    from kafka_denormalization_spark.operators.sampling import dsir_resample

    rows = [(i, "acid molecule bond reaction acid", "tgt") for i in range(10)] + [
        (i, "goal team player match score goal", "raw") for i in range(10, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    sel = dsir_resample(
        df, "doc_id", "text", F.col("src") == "tgt", k=12, num_buckets=32
    )
    got = sorted(r["doc_id"] for r in sel.collect())
    again = sorted(r["doc_id"] for r in sel.collect())
    assert got == again and len(got) == 12
    # chemistry docs (ids 0-9, exp(logw) far larger) should dominate
    assert sum(1 for i in got if i < 10) >= 8


def test_leakage_safe_split_clusters_travel_together(spark):
    """No near-dup cluster straddles splits; proportions are hash-fair;
    deterministic across invocations."""
    from kafka_denormalization_spark.queries import q_leakage_safe_split

    rows = q_leakage_safe_split(spark, "/root/testdata/sf0.01").collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())
    # at least one real multi-doc cluster exists in the fixture
    from collections import Counter
    sizes = Counter()
    for r in rows:
        sizes[r["group_id"]] += 1
    assert max(sizes.values()) >= 2
    counts = Counter(r["split"] for r in rows)
    n = len(rows)
    assert 0.7 < counts["train"] / n < 0.9
    assert counts["val"] > 0 and counts["test"] > 0


# ---------------------------------------------------------------------------
# unimax_plan
# ---------------------------------------------------------------------------


def _weights_df(spark, rows):
    return spark.createDataFrame(rows, "lang string, n_chars long")


def test_unimax_plan_waterfill_split(spark):
    """Hand-computed fixture: sizes 10/20/30/100, cap 2 epochs, budget
    1.0x corpus (160): the two smallest strata are cap-bound, the two
    largest split the remaining budget evenly (50 each)."""
    from kafka_denormalization_spark.operators.sampling import unimax_plan

    df = _weights_df(
        spark,
        [("a", 10), ("b", 20), ("c", 30), ("d", 100)],
    )
    out = {
        r["lang"]: r
        for r in unimax_plan(df, "lang", "n_chars", 1.0, 2).collect()
    }
    assert out["a"]["capped"] and out["a"]["alloc_weight_r"] == 20.0
    assert out["b"]["capped"] and out["b"]["alloc_weight_r"] == 40.0
    assert not out["c"]["capped"] and out["c"]["alloc_weight_r"] == 50.0
    assert not out["d"]["capped"] and out["d"]["alloc_weight_r"] == 50.0
    assert out["a"]["epochs_r"] == 2.0
    assert out["c"]["epochs_r"] == 1.666666667
    assert out["d"]["epochs_r"] == 0.5
    # allocations exhaust the budget exactly
    assert sum(r["alloc_weight_r"] for r in out.values()) == 160.0


def test_unimax_plan_all_capped(spark):
    """Budget >= total caps: every stratum runs the full epoch cap and
    the budget-bound branch never fires (k* is NULL end-to-end)."""
    from kafka_denormalization_spark.operators.sampling import unimax_plan

    df = _weights_df(
        spark,
        [("a", 10), ("b", 20), ("c", 30), ("d", 100)],
    )
    rows = unimax_plan(df, "lang", "n_chars", 2.0, 2).collect()
    assert all(r["capped"] for r in rows)
    assert all(r["epochs_r"] == 2.0 for r in rows)


def test_unimax_plan_arg_validation(spark):
    from kafka_denormalization_spark.operators.sampling import unimax_plan

    import pytest

    df = _weights_df(spark, [("a", 10)])
    with pytest.raises(ValueError):
        unimax_plan(df, "lang", "n_chars", 0.0, 2)
    with pytest.raises(ValueError):
        unimax_plan(df, "lang", "n_chars", 3.0, 2)  # frac > max_epochs
    with pytest.raises(ValueError):
        unimax_plan(df, "lang", "n_chars", 0.5, 0)


# ---------------------------------------------------------------------------
# doremi_weights
# ---------------------------------------------------------------------------


def test_doremi_weights_one_step(spark):
    """Hand-computed: domain x (mean nll 1.5) is up-weighted over
    domain y (mean nll 0.5, the baseline) by exactly e^1 over the
    equal token-share prior; a NULL-nll doc counts toward the share
    but not the mean."""
    import math

    from kafka_denormalization_spark.operators.sampling import doremi_weights

    per_doc = spark.createDataFrame(
        [
            (1, "x", 10, 1.0),
            (2, "x", 10, 2.0),
            (3, "y", 10, 0.5),
            (4, "y", 10, None),  # <2-token doc: share yes, mean no
        ],
        "doc_id long, source string, n_chars long, nll_r double",
    )
    out = {
        r["source"]: r
        for r in doremi_weights(
            per_doc, "source", "n_chars", "nll_r", eta=1.0
        ).collect()
    }
    assert out["x"]["mean_nll_r"] == 1.5
    assert out["y"]["mean_nll_r"] == 0.5
    assert out["x"]["excess_r"] == 1.0
    assert out["y"]["excess_r"] == 0.0
    assert out["x"]["share_r"] == 0.5 and out["y"]["share_r"] == 0.5
    expected_x = round(
        round(0.5 * math.exp(1.0), 9)
        / (round(0.5 * math.exp(1.0), 9) + 0.5),
        9,
    )
    assert out["x"]["weight_r"] == expected_x
    assert out["y"]["weight_r"] == round(1.0 - expected_x, 9) or (
        abs(out["x"]["weight_r"] + out["y"]["weight_r"] - 1.0) < 1e-8
    )
    # harder domain strictly up-weighted over its prior
    assert out["x"]["weight_r"] > out["x"]["share_r"]
    assert out["y"]["weight_r"] < out["y"]["share_r"]


def test_unimax_sample_expansion(spark):
    """Cap-bound strata replicate exactly max_epochs times; the
    budget-bound stratum (epochs 0.5) keeps each doc 0 or 1 times via
    the deterministic tail draw; partition-independent."""
    from kafka_denormalization_spark.operators.sampling import unimax_sample

    rows = [("a", 1, 10), ("b", 2, 10), ("b", 3, 10)]
    rows += [("c", 10 + i, 10) for i in range(3)]
    rows += [("d", 20 + i, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_chars long")
    out = unimax_sample(df, "lang", "n_chars", "doc_id", 1.0, 2).collect()
    from collections import Counter

    per_doc = Counter((r["lang"], r["doc_id"]) for r in out)
    # a, b: epochs_r = 2.0 exactly -> every doc exactly twice, tail never
    for lang in ("a", "b"):
        docs = {d for (l, d) in per_doc if l == lang}
        assert all(per_doc[(lang, d)] == 2 for d in docs)
    # c: epochs 1.666667 -> each doc 1 or 2 times
    assert all(per_doc[("c", 10 + i)] in (1, 2) for i in range(3))
    # d: epochs 0.5 -> each doc at most once, and the tail kept SOME
    d_counts = [per_doc.get(("d", 20 + i), 0) for i in range(10)]
    assert all(c in (0, 1) for c in d_counts)
    assert 0 < sum(d_counts) < 10
    # epoch ids are dense from 0 per stratum
    assert {r["epoch"] for r in out if r["lang"] == "a"} == {0, 1}
    # deterministic across partitionings
    out2 = unimax_sample(
        df.repartition(7), "lang", "n_chars", "doc_id", 1.0, 2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_weighted_sample_matches_hash_arithmetic(spark):
    """Per-row keep decision = draw < hex(round(weight*fraction, 6)):
    replicated bit-for-bit in plain Python, incl. clamping (w=0 drops
    everything, w>=2 at fraction 0.5 clamps to ~1)."""
    import hashlib

    from kafka_denormalization_spark.operators.sampling import weighted_sample

    rows = [(1, 1.0), (2, 0.5), (3, 0.25), (4, 0.0), (5, 2.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_sample(df, "w", "id", 0.5, "s").collect()}

    def keep(i: int, w: float) -> bool:
        eff = round(min(1.0, max(0.0, w * 0.5)), 6)
        thr = format(min(int(eff * 16**8), 16**8 - 1), "08x")
        return hashlib.md5(f"s|{i}".encode()).hexdigest()[:8] < thr

    assert got == {i for i, w in rows if keep(i, w)}
    assert 4 not in got  # zero weight -> zero keep probability
