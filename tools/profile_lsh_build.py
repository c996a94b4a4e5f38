"""Phase-level profile of one cold minhash_lsh_dedup family build.

Replays q_minhash_lsh_dedup's build exactly (same helpers, same params)
but with a perf_counter around every driver-visible phase: plan
construction, the auto-cap probe collect, and the verified-pair count.
Usage: python tools/profile_lsh_build.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAST = time.perf_counter()


def mark(what: str) -> None:
    global LAST
    now = time.perf_counter()
    print(f"PHASE {what}: {now - LAST:.3f}s", flush=True)
    LAST = now


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from kafka_denormalization_spark.checkpoint import persist_if_uncached
    from kafka_denormalization_spark.engine import get_spark, table
    from kafka_denormalization_spark.functions import similarity as sim

    global LAST
    t_start = time.perf_counter()
    spark = get_spark("profile-lsh")
    mark("session boot")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    mark("warmup job")

    docs = table(spark, sf_dir, "documents")
    mark("scan plan")

    # --- q_minhash_lsh_dedup params: n=3, num_hashes=64, bands=32, t=0.5
    grams_all = sim.word_gram_rows(docs, "doc_id", "text", 3)
    grams_all = persist_if_uncached(grams_all)
    buckets = sim.minhash_band_buckets(
        grams_all, 64, 32, "auto", persist=True
    )
    mark("buckets plan construction (incl. auto-cap probe collect)")

    if not buckets.is_cached:
        buckets = persist_if_uncached(buckets)
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._h") == F.col("b._h"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates()
    )
    cand_ids = candidates.select(F.col("id_a").alias("_id")).unionByName(
        candidates.select(F.col("id_b").alias("_id"))
    )
    gram_src = grams_all.join(F.broadcast(cand_ids), ["_id"], "left_semi")
    grams = persist_if_uncached(gram_src.dropDuplicates(["_id", "_g"]))
    verified = sim.exact_jaccard_pairs(candidates, grams, all_pairs=False).filter(
        F.col("jaccard_sim") >= 0.5
    )
    mark("verify plan construction")

    verified = persist_if_uncached(verified)
    n = verified.count()
    mark(f"verified.count() -> {n}")

    print(f"TOTAL {time.perf_counter() - t_start:.3f}s", flush=True)


if __name__ == "__main__":
    main()
