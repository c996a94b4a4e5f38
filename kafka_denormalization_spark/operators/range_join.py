"""Range (interval) join — north-star extension (absent from the reference
and from Spark's native operator set; the guide's prescription is
bucketize + equi-join + exact filter, implemented here).

Semantics: pair (l, r) on the same key when
``r.ts ∈ [l.ts + lower, l.ts + upper]``.

Scale notes (100 TB):
- a naive theta-join on the inequality degenerates to a per-key cross join
  before filtering. Bucketizing by the window width turns it into an
  EQUI-join on (key, bucket): each left row probes at most
  ``ceil((upper-lower)/width)+1`` buckets, so Catalyst plans a hash join,
  not a nested-loop;
- the bucket replication happens on the LEFT side only (explode of a small
  int array); the right side is written once per bucket;
- skew: a hot (key, bucket) pair splits via AQE like any equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-bucketized range join. ``lower``/``upper`` are inclusive offsets
    in the ts unit (e.g. microseconds). Output: all left columns + all
    right columns except the duplicated key.
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    width = max(upper - lower, 1)
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(f"column overlap not supported: {sorted(overlap)}")

    def bucket(ts: Column) -> Column:
        return F.floor(ts / F.lit(width)).cast("long")

    # a left row's window [ts+lower, ts+upper] spans at most 2 buckets of
    # size `width`; probe both
    l = left.withColumn(
        "_b",
        F.explode(
            F.array_distinct(
                F.array(
                    bucket(F.col(left_ts) + F.lit(lower)),
                    bucket(F.col(left_ts) + F.lit(upper)),
                )
            )
        ),
    )
    r = right.withColumn("_b", bucket(F.col(right_ts)))
    cond = (
        (l[on] == r[on])
        & (l["_b"] == r["_b"])
        & (r[right_ts] >= l[left_ts] + F.lit(lower))
        & (r[right_ts] <= l[left_ts] + F.lit(upper))
    )
    joined = l.join(r, cond, how)
    return joined.drop(r[on]).drop(l["_b"]).drop(r["_b"])
