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

import functools

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

    ``how``: ``inner`` or ``left_outer``. The bucket explosion copies each
    left row into up to 2 buckets, so outer flavors CANNOT ride the joined
    plan directly (an unmatched copy would emit a spurious null-extended
    row per bucket). ``left_outer`` is therefore inner ∪ (left rows with no
    match), where "no match" is a null-safe all-column anti-join against the
    inner result's left projection — exact for duplicate left rows too,
    since identical rows have identical match sets. Right-preserving
    flavors are rejected (swap the sides and negate the window instead).
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"range_join supports how='inner'|'left_outer', got {how!r}; "
            "for right-preserving joins swap left/right and use "
            "[-upper, -lower] as the window"
        )
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
    inner = l.join(r, cond, "inner").drop(r[on]).drop(l["_b"]).drop(r["_b"])
    if how == "inner":
        return inner

    # left_outer: union the inner result with one null-extended row per
    # unmatched ORIGINAL left row (never per exploded bucket copy)
    matched = inner.select(*left.columns).distinct()
    anti_cond = functools.reduce(
        lambda a, b: a & b,
        [left[c].eqNullSafe(matched[c]) for c in left.columns],
    )
    unmatched = left.join(matched, anti_cond, "left_anti")
    null_right = [
        F.lit(None).cast(right.schema[c].dataType).alias(c)
        for c in right.columns
        if c != on
    ]
    return inner.unionByName(unmatched.select(*left.columns, *null_right))
