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


def percentile_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact per-group quantiles (linear interpolation) of an integer
    column — length/size distribution profiling for corpus curation.

    Uses the EXACT ``percentile`` aggregate, not ``approx_percentile``:
    the oracle comparison needs bit-identical values, and with integer
    inputs at dyadic quantiles (k/4, k/2) the interpolated result
    ``a + (b - a) * frac`` is exactly representable in double, so Spark
    and DuckDB's ``quantile_cont`` agree bit-for-bit. (At 100 TB you'd
    flip to ``approx_percentile`` — same single-aggregation shape, sketch
    mergeable map-side; the exact variant holds per-group sorted buffers.)
    """
    for q in quantiles:
        if (q * 4) != int(q * 4):
            raise ValueError(
                f"quantile {q} is not dyadic (k/4): exact cross-engine "
                "float equality is only guaranteed at k/4 grid points"
            )
    aggs = [
        F.expr(f"percentile({value_col}, {q})").alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
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
