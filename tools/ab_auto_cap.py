"""A/B the hot-bucket auto-cap eager probe across the LSH family.

VERDICT r08 item 1: the common-subset bench total drifted +14.5% r07→r08,
and the suspected new cost is ``resolve_auto_bucket_cap``'s eager 1-row
aggregate (one extra job per guarded pair operator). This script times
the four guarded headline queries' underlying pipelines at
$SPARK_GRAFT_SF_DIR with ``max_bucket="auto"`` vs ``max_bucket=None``,
alternating A/B/A/B within one session so JIT warmup amortizes equally.

Usage: python tools/ab_auto_cap.py [reps]
Prints one JSON line: {query: {"auto": [s, ...], "none": [s, ...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_denormalization_spark.functions import similarity as sim_fns
from kafka_denormalization_spark.queries import table


def run_minhash(spark, sf_dir, mb):
    docs = table(spark, sf_dir, "documents")
    pairs = sim_fns.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=32, threshold=0.5,
        eager_cleanup=True, max_bucket=mb,
    )
    n = pairs.count()
    pairs.unpersist()
    return n


def run_phash(spark, sf_dir, mb):
    import pandas as pd

    from kafka_denormalization_spark.functions.multimodal import (
        image_phash_dedup, make_image_blob,
    )
    from kafka_denormalization_spark.queries import PHASH_H, PHASH_W, _phash_pixels

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            rows = [
                (int(d), make_image_blob(PHASH_W, PHASH_H, _phash_pixels(int(d))))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["id", "blob"])

    blobs = docs.mapInPandas(encode, "id long, blob binary")
    out = image_phash_dedup(blobs, "id", "blob", hamming_max=3, max_bucket=mb)
    return out.count()


def run_audio(spark, sf_dir, mb):
    from kafka_denormalization_spark.functions.multimodal import audio_fp_dedup
    from kafka_denormalization_spark.queries import _audio_blobs

    out = audio_fp_dedup(_audio_blobs(spark, sf_dir), "id", hamming_max=3, max_bucket=mb)
    return out.count()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("ab_auto_cap")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    runners = {"minhash": run_minhash, "phash": run_phash, "audio": run_audio}
    results = {q: {"auto": [], "none": []} for q in runners}
    rows = {}
    # warmup pass (JIT) not recorded
    for q, fn in runners.items():
        fn(spark, sf_dir, None)
    for _ in range(reps):
        for q, fn in runners.items():
            for label, mb in (("auto", "auto"), ("none", None)):
                spark.catalog.clearCache()
                t0 = time.time()
                n = fn(spark, sf_dir, mb)
                results[q][label].append(round(time.time() - t0, 3))
                rows.setdefault(q, {})[label] = n
    print(json.dumps({"times": results, "rows": rows, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
