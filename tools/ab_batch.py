"""Batched A/B timing: one fresh session, several queries, cold + 2 reps.

Usage: python tools/ab_batch.py <query> [query ...]
Prints one line per rep: "AB <name> rep<k> build=<s> exec=<s>".
Memoized families report build≈0 on warm reps — use fresh runs per code
variant and compare rep-wise (the SCALE_NOTES protocol).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_denormalization_spark.engine import get_spark
    from kafka_denormalization_spark.queries import QUERIES

    spark = get_spark("ab-batch")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        for rep in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"AB {name} rep{rep} build={t1 - t0:.3f} "
                f"exec={t2 - t1:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
