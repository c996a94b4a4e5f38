"""Skyline (Pareto-front) operator: the rows not dominated on a
(minimize, maximize) criteria pair (north-star extension; SURVEY §2.3 —
multi-criteria curation: "shortest doc at every quality level",
"cheapest part at every size", best cost/quality trade-off sets).

Dominance (classic skyline, Börzsönyi et al., ICDE 2001): q dominates p
iff q.min_col <= p.min_col AND q.max_col >= p.max_col, strictly better
in at least one. The front is every row no other row dominates.
Duplicate criteria points never dominate each other — ALL copies of a
front point are returned.

Scale design (100 TB) — the naive formulation is an all-pairs NOT
EXISTS (the DuckDB oracle does exactly that at sf0.01); this
implementation is the sort-based skyline decomposed to avoid any
unpartitioned global window:

1. The criteria pair is deduplicated first (exact dedup — the skyline
   only depends on distinct points, and this bounds everything below
   by |distinct pairs|, typically orders of magnitude below row count).
2. Points are range-bucketed on ``min_col`` (pure expression off a
   1-row min/max broadcast). A point can only be dominated from its
   own bucket or a strictly lower one (lower bucket => strictly lower
   min_col by construction of value-range buckets).
3. Within a bucket: running max of ``max_col`` in (min_col asc,
   max_col desc) order over the PRECEDING rows — a partitioned window.
   On distinct points this running max >= own max_col is exactly
   within-bucket dominance (same-value min_col ties carry distinct
   max_col, so desc order puts dominators first).
4. Across buckets: per-bucket max(max_col) — a table bounded by
   ``num_buckets`` — prefix-maxed over strictly lower buckets (the one
   unpartitioned window runs on that bounded summary table, the same
   documented pattern as shard_plan_bytes' distinct-size table) and
   broadcast back.
5. Front points semi-join the input on the criteria pair, returning
   every original row (duplicates included).

One distinct-aggregation shuffle + one bucket-partitioned window + a
broadcast join: no global sort, no pair join, skew-bounded by the
bucket width (pathological single-value min_col degrades to one
bucket = the classic sorted skyline, still O(n log n)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.window import global_ordered_window


def pareto_front(
    df: DataFrame,
    min_col: str,
    max_col: str,
    num_buckets: int = 256,
) -> DataFrame:
    """All rows of ``df`` on the (minimize ``min_col``, maximize
    ``max_col``) Pareto front. Output: the input rows, unmodified.

    NULL contract: rows with a NULL in EITHER criterion are excluded —
    they are never part of the front and never dominate anything
    (SQL three-valued comparison semantics; matches the NOT EXISTS
    oracle, where a NULL criterion can satisfy neither dominance arm).
    Without the explicit filter a NULL row would poison the bucketed
    running max (``F.least`` skips NULLs, landing NULL-min rows in the
    top bucket where a non-NULL ``max_col`` wrongly eliminates
    legitimate front points — ADVICE r07 #2)."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    pts = (
        df.select(
            F.col(min_col).cast("double").alias("_x"),
            F.col(max_col).cast("double").alias("_y"),
        )
        .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .distinct()
    )

    # the 1-row bounds and the <=num_buckets summary below are eagerly
    # checkpointed: they are re-referenced by multiple consumers, and
    # without a LogicalRDD leaf each consumer would replay the full
    # corpus lineage (plan-audited: 10 scans -> 3 passes)
    bounds = pts.agg(
        F.min("_x").alias("_mn"), F.max("_x").alias("_mx")
    ).localCheckpoint(eager=True)
    # value-range bucket: pure function of _x, so equal _x => equal
    # bucket, and bucket i-1's _x upper edge is strictly below every _x
    # in bucket i (the cross-bucket strictness step 2 relies on)
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(num_buckets))
    bucket = F.when(F.col("_mx") > F.col("_mn"), F.least(
        F.floor((F.col("_x") - F.col("_mn")) / width).cast("long"),
        F.lit(num_buckets - 1),
    )).otherwise(F.lit(0))
    bpts = pts.crossJoin(F.broadcast(bounds)).select(
        "_x", "_y", bucket.alias("_b")
    )

    w_in = (
        Window.partitionBy("_b")
        .orderBy(F.col("_x").asc(), F.col("_y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = bpts.withColumn("_m_in", F.max("_y").over(w_in))

    bsum = bpts.groupBy("_b").agg(F.max("_y").alias("_bmax"))
    # metadata-sized frame (one row per band) — see
    # window.global_ordered_window for why the single task is pinned
    w_pre = global_ordered_window(F.col("_b"), "_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = bsum.select(
        "_b", F.max("_bmax").over(w_pre).alias("_m_pre")
    ).localCheckpoint(eager=True)

    front = (
        scored.join(F.broadcast(prefix), "_b")
        .filter(
            (F.col("_m_in").isNull() | (F.col("_m_in") < F.col("_y")))
            & (F.col("_m_pre").isNull() | (F.col("_m_pre") < F.col("_y")))
        )
        .select("_x", "_y")
    )
    return df.join(
        front,
        (F.col(min_col).cast("double") == F.col("_x"))
        & (F.col(max_col).cast("double") == F.col("_y")),
        "left_semi",
    )
