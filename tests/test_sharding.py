"""Deterministic training-shard layout (operators/sharding.py)."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.sharding import (
    shard_plan,
    shard_stats,
    write_shards,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
    )


def test_shard_plan_layout_invariants(spark):
    plan = shard_plan(_docs(spark), "doc_id", n_shards=8, salt="s").collect()
    assert len(plan) == 500
    by_shard = collections.defaultdict(list)
    for r in plan:
        assert 0 <= r["shard_id"] < 8
        by_shard[r["shard_id"]].append(r["pos"])
    # every shard's positions are dense 0..n-1 (the loader read order)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # hash sharding is roughly balanced
    sizes = [len(v) for v in by_shard.values()]
    assert len(sizes) == 8 and min(sizes) > 500 / 8 / 2


def test_shard_plan_partition_independent(spark):
    base = _docs(spark)
    a = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan(base, "doc_id", 8, salt="s").collect()
    }
    b = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan(
            base.repartition(13).sortWithinPartitions(F.col("doc_id").desc()),
            "doc_id",
            8,
            salt="s",
        ).collect()
    }
    assert a == b
    # a different salt re-deals the layout
    c = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan(base, "doc_id", 8, salt="other").collect()
    }
    assert a != c


def test_shard_stats_totals(spark):
    plan = shard_plan(_docs(spark, 200), "doc_id", 4, salt="s")
    stats = shard_stats(plan, F.size(F.split(F.trim("text"), r"\s+"))).collect()
    assert sum(r["n_docs"] for r in stats) == 200
    assert sum(r["n_tokens"] for r in stats) == 400  # 2 tokens per doc


def test_write_shards_read_order(spark, tmp_path):
    plan = shard_plan(_docs(spark, 120), "doc_id", 4, salt="s")
    out = str(tmp_path / "shards")
    write_shards(plan, out, "doc_id")
    back = spark.read.parquet(out)
    # partitionBy layout: one directory per shard, pos column intact
    assert sorted(
        r["shard_id"] for r in back.select("shard_id").distinct().collect()
    ) == [0, 1, 2, 3]
    expect = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in plan.select("doc_id", "shard_id", "pos").collect()
    }
    got = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in back.select("doc_id", "shard_id", "pos").collect()
    }
    assert got == expect
    # within each shard file, physical row order IS the pos order
    for shard_dir in (tmp_path / "shards").glob("shard_id=*"):
        rows = (
            spark.read.parquet(str(shard_dir))
            .select("pos")
            .toPandas()["pos"]
            .tolist()
        )
        assert rows == sorted(rows)
