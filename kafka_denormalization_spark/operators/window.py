"""Window-function operators: top-k per group, running aggregates,
sessionization — north-star coverage (absent from the reference, SURVEY
§2.3).

Scale notes: each of these is a single hash-partitioned window shuffle;
top-k additionally benefits from rank-pushdown (Spark 3.5+ inserts a
per-partition top-k filter below the final sort when limits are static).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group (deterministic: include a unique tiebreaker in
    order_by)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    agg: Column,
    name: str,
) -> DataFrame:
    """Cumulative aggregate over an ordered per-key window."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(name, agg.over(w))


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: Column,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap`` (same units as ts_col).

    Classic lag + cumulative-sum-of-boundaries formulation — two window
    passes over ONE partitioning (single shuffle)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(prev.isNull() | ((F.col(ts_col) - prev) > gap), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
