"""Foreign-key denormalization join — the reference's core operator.

Reference parity: ``JoinTransformer`` (transform/JoinTransformer.java:72-200)
implements an N:1 FK equi-join over a shared index store: a left update does a
point lookup of the right side by FK digest (:152); a right update prefix-scans
and re-emits every matching left (:168-186). Flavors: inner (:72-85),
leftOuter (:87-100), rightOuter (:102-115), fullOuter (:117-130).

Spark-first design: the whole index-topic + prefix-scan machinery collapses
into a single Catalyst equi-join on the FK *value*:

- both directions at once — a join visits every (left, right) pair regardless
  of which side "arrived" first, so arrival-order invariance (SURVEY §3.5) is
  structural, not implemented;
- we join on values, not 8-byte Blake2b digests (schema/JoinKey.java:28-43).
  The reference can silently join wrong rows on digest collision; we cannot.
  Intentional deviation, strictly more correct;
- the custom FK partitioner (transform/JoinKeyPartitioner.java:20-22) is
  subsumed by Catalyst's EnsureRequirements, which hash-partitions both sides
  on the join key automatically.

Scale notes (100 TB):
- N:1 joins with a small right side should broadcast — pass
  ``broadcast_right=True`` (or rely on AQE's runtime conversion when the
  right side's post-filter size is under the threshold). Broadcasting removes
  the shuffle of the *large* left side entirely.
- For repeated joins on the same FK at huge scale, pre-bucketing both sides
  on the key (``df.write.bucketBy(n, key)``) removes the exchange; the
  operator itself stays a plain equi-join so that optimization composes.
- Skewed FKs (hot stories with millions of comments) are handled by AQE
  skew-join splitting (enabled in engine.get_spark); no manual salting needed
  for equi-joins on Spark 3.2+.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOW = {
    "inner": "inner",
    "left_outer": "left_outer",
    "right_outer": "right_outer",
    "full_outer": "full_outer",
}


def fk_denormalize(
    left: DataFrame,
    right: DataFrame,
    left_fk: str | Column,
    right_key: str | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Join ``left`` (N side) to ``right`` (1 side) on ``left_fk == right_key``.

    Returns ``(joined, left_aliased, right_aliased)`` where the frames are
    aliased ``l`` / ``r`` so callers can disambiguate columns
    (``F.col("l.x")`` / ``F.col("r.y")``) when assembling output.
    """
    if how not in _HOW:
        raise ValueError(f"unknown join flavor {how!r}; one of {sorted(_HOW)}")
    l = left.alias("l")
    r = right.alias("r")
    if broadcast_right:
        r = F.broadcast(r)
    lfk = F.col(f"l.{left_fk}") if isinstance(left_fk, str) else left_fk
    rk = F.col(f"r.{right_key}") if isinstance(right_key, str) else right_key
    joined = l.join(r, lfk == rk, _HOW[how])
    return joined, l, r
