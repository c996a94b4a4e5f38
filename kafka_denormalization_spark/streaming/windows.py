"""Event-time windowed aggregation over streams — watermarks, tumbling /
sliding / session windows, and watermark-bounded deduplication.

The reference has no event-time windowing (its only temporal notion is
Kafka log order — SURVEY §2.3 "window/session aggregation: ABSENT"); this
module is part of the north-star extension surface, built directly on
Structured Streaming's native operators so ALL state (window panes,
session merges, seen-keys for dedup) lives in the JVM state store —
no Python in the loop.

Scale notes (100 TB):
- `F.window` / `F.session_window` aggregation state is partitioned by
  (group keys, window); the shuffle is the same one the aggregation needs
  anyway — no extra exchange.
- the watermark bounds state: panes older than (max event time - delay)
  are finalized and evicted. Without it, streaming agg state grows
  unboundedly — so `watermark` is a required argument here, not an
  option.
- `drop_duplicates_within_watermark` keeps one state row per key only
  until the watermark passes its event time — bounded-state streaming
  twin of the batch exact-dedup (operators/dedup.py); contrast with plain
  `dropDuplicates` on a stream, whose state never ages out.
- all four helpers work identically on BATCH frames (Spark evaluates
  `window`/`session_window` in batch mode and ignores watermarks), which
  is how the oracle-checked batch twins in queries.py reuse them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    """Apply the watermark on streams; batch frames pass through (Spark
    rejects withWatermark on batch plans only in old versions — guard
    anyway so helpers stay batch/stream polymorphic)."""
    if df.isStreaming and watermark is not None:
        return df.withWatermark(ts_col, watermark)
    return df


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    window: str,
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (``slide`` None) or sliding event-time window aggregation.

    Output columns: window_start, window_end, *keys, *aggs. On a stream,
    use output mode "append" — panes emit once, when the watermark passes
    ``window_end`` (finalized results, late data within the delay folded
    in); "update" emits refinements per trigger.
    """
    df = _with_watermark(df, ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide is not None
        else F.window(F.col(ts_col), window)
    )
    return (
        df.groupBy(win.alias("_w"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *[F.col(k) for k in keys],
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    gap: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session aggregation via the native ``session_window``
    operator (state-store session merge; batch mode computes the same
    sessions as the lag+cumsum formulation in operators/window.py
    `sessionize` — the oracle-checked equivalence is `session_window_agg`
    in queries.py).

    Output: session_start, session_end, *keys, *aggs.
    """
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("_s"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("_s.start").alias("session_start"),
            F.col("_s.end").alias("session_end"),
            *[F.col(k) for k in keys],
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def drop_duplicates_within_watermark(
    df: DataFrame, keys: Sequence[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: one state row per key,
    evicted when the watermark passes its event time. Batch frames fall
    back to plain dropDuplicates (same observable result on a finite
    input).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


def _agg_names(aggs: Sequence[Column]) -> list[str]:
    """Output names of aggregate columns (requires every agg to carry an
    explicit .alias — enforced so streaming sinks and oracle comparison
    get stable names)."""
    names = []
    for c in aggs:
        # Column juggling: the JVM-side expression knows its alias; sql()
        # round-trips "x AS name" / "name" forms
        s = c._jc.toString()
        if " AS " not in s:
            raise ValueError(
                f"aggregate expression {s!r} needs an explicit .alias(...)"
            )
        names.append(s.rsplit(" AS ", 1)[1].strip("`"))
    return names
