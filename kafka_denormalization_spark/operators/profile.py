"""Data-quality profiling and constraint checks (Deequ-shaped, minimal).

``profile`` computes per-column completeness/cardinality in ONE pass —
a single aggregation over the table, no per-column jobs (at 100 TB, one
scan vs one scan per column is the whole game). ``check_constraints``
evaluates named boolean invariants (uniqueness, completeness, range,
referential) and returns one row per constraint with pass/fail + the
violation count, so a pipeline can gate on ``failures == 0`` without
driver-side assertion logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: row count, null count, distinct count
    (exact), completeness denominator shared across columns. Single
    aggregation — Spark evaluates all column expressions in one scan."""
    cols = cols or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


def check_constraints(
    df: DataFrame, constraints: dict[str, Column]
) -> DataFrame:
    """Evaluate named row-level invariants: each constraint is a boolean
    Column that should hold for EVERY row. Returns (check_name,
    n_violations, passed) — one aggregation pass for all constraints."""
    aggs = [
        F.sum(F.when(~cond, 1).otherwise(0)).alias(f"_v_{name}")
        for name, cond in constraints.items()
    ]
    row = df.agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"_v_{name}").alias("n_violations"),
                (F.col(f"_v_{name}") == 0).alias("passed"),
            )
            for name in constraints
        ]
    )
    return row.select(F.explode(per).alias("c")).select(
        "c.check_name", "c.n_violations", "c.passed"
    )
