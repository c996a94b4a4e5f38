"""As-of (temporal) join — north-star extension (absent from the reference,
SURVEY §2.3; listed in the guide's OLAP patterns as a gap in Spark itself).

Spark-first design: the union-and-window formulation, not per-group
``pd.merge_asof``:

1. tag left rows (probe) and right rows (build) and union them;
2. one window over (key) ordered by (ts, side) carries the most recent right
   row forward with ``last(..., ignorenulls=True)``;
3. keep probe rows; the carried struct is the as-of match.

Scale notes (100 TB):
- exactly ONE shuffle (the window partitioning on key) and no join blowup:
  the naive equi-join+filter+max_by materializes |matching pairs| rows
  (every earlier right per left) before reducing; this never materializes
  more than |left| + |right| rows.
- skewed keys degrade to a single-task sort per hot key — same as any
  window; salt by time-bucket if one key dominates.
- JVM-only (no Python): window + struct ops stay in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' = the next
    right row with ``right.ts >= left.ts``).

    Output: all left columns + right columns (null when no match), right's
    ``on``/ts columns under their original names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    rcols = right.columns
    overlap = set(lcols) & set(rcols)
    if overlap - {on}:
        raise ValueError(f"column overlap not supported: {sorted(overlap - {on})}")

    rstruct = F.struct(*[F.col(c) for c in rcols])
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # rights sort before lefts at equal ts
        rstruct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_r", ignorenulls=True).over(w)

    matched = unioned.withColumn("_match", carried).filter(F.col("_side") == 1)
    out_cols = [F.col(c) for c in lcols] + [
        F.col(f"_match.{c}").alias(c) for c in rcols if c != on
    ]
    return matched.select(*out_cols)
