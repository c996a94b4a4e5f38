"""Fresh-session A/B timing for single queries.

Runs ONE query in a new SparkSession subprocess (cold build + noop exec),
prints one line: "<name> build=<s> exec=<s> total=<s>". The caller
alternates runs across two code states (or flags) so box-load drift
cancels; session memos never survive between runs (SCALE_NOTES
fresh-session protocol).

Usage: python tools/ab_query.py <query> [sf_dir]
Env: SPARK_GRAFT_AB_FLAG — exported to the child for code branches that
     want a temporary A/B switch (grep for it; none are committed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from kafka_denormalization_spark.engine import get_spark
    from kafka_denormalization_spark.queries import QUERIES

    spark = get_spark(f"ab-{name}")
    # same warmup as bench.py so JIT/session startup is excluded
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(
        f"AB {name} build={t1 - t0:.3f} exec={t2 - t1:.3f} "
        f"total={t2 - t0:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
