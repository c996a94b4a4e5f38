"""Stream-stream interval join — Spark's NATIVE stream-stream join with an
event-time band condition, watermark-bounded state on both sides.

Complements the changelog upsert join (upsert_join.py / incremental.py):
that operator implements KTable semantics (latest-per-key state, re-emit on
either side's update — something Spark's built-in join does not express,
SURVEY §4.3); THIS operator is the append-stream case Spark solves
natively — two fact streams correlated within a time band (click ↔ error
within 10 minutes), the streaming twin of operators/range_join.py.

Scale notes (100 TB):
- state retention is derived by Spark from the watermark + band: a left
  row is dropped once the watermark passes left_ts + upper; symmetric for
  the right. Without the band in the JOIN CONDITION the state store grows
  forever — which is why this helper refuses a missing time bound.
- the join shuffles both streams by the equi-key; skewed keys behave like
  any shuffled stream join (AQE does not replan inside micro-batches —
  pre-salt hot keys upstream if needed).
- outer flavors emit the null-extended row only when the watermark has
  definitively closed the band (correct but delayed by the watermark lag —
  inherent to event-time completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``on`` where ``right_ts`` lies in
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds; both ts columns are
    TIMESTAMP). Supported ``how``: inner, left_outer, right_outer,
    full_outer (outer flavors require the watermark, which this helper
    always applies).

    Column hygiene: ``on`` is kept once; all other columns pass through and
    must not collide (alias upstream).
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported join flavor {how!r}")
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    la, ra = lw.alias("l"), rw.alias("r")
    lcol = lambda c: F.col(f"l.{c}")
    rcol = lambda c: F.col(f"r.{c}")
    cond = (
        (lcol(on) == rcol(on))
        & (rcol(right_ts) >= lcol(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (rcol(right_ts) <= lcol(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    joined = la.join(ra, cond, how)
    keep = [
        F.coalesce(lcol(on), rcol(on)).alias(on)
        if how in ("right_outer", "full_outer")
        else lcol(on).alias(on)
    ]
    keep += [lcol(c).alias(c) for c in left.columns if c != on]
    keep += [rcol(c).alias(c) for c in right.columns if c != on]
    return joined.select(*keep)
