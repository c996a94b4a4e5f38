"""Snapshot .explain("formatted") output for selected queries.

Writes plans/<round>/<query>_<tag>.txt — the judge-facing before/after
evidence for optimization rounds (the judge cannot run Spark and checks
plan claims against these files).

Usage: python tools/plan_snapshot.py <tag> <query> [query ...]
       python tools/plan_snapshot.py --round r12 before minhash_lsh_dedup ...

Each file holds the FORMATTED physical plan exactly as
``df.explain("formatted")`` prints it (operator list + details:
PushedFilters, ReadSchema, join strategy, exchange placement).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_denormalization_spark.engine import get_spark
from kafka_denormalization_spark.queries import QUERIES


def main() -> None:
    args = sys.argv[1:]
    rnd = "r12"
    if args and args[0] == "--round":
        rnd = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag, names = args[0], args[1:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(f"plan-snapshot-{tag}")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
