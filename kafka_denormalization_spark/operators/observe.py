"""In-job pipeline observability via ``DataFrame.observe``.

Metrics (row counts, byte totals, null rates) are accumulated inside the
job that already runs — no second scan of the input, which at 100 TB is
the difference between free telemetry and doubling the bill. Works in
batch (read via ``Observation.get`` after the action) and streaming
(surfaced per-batch in ``StreamingQueryProgress.observedMetrics``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_metrics(
    df: DataFrame, name: str, **aggs: Column
) -> tuple[DataFrame, Observation | None]:
    """Attach named aggregate metrics to a DataFrame without changing its
    rows. Batch: returns (df, observation) — read ``observation.get``
    after an action. Streaming: ``Observation`` is unsupported (one value
    per micro-batch), so metrics register under ``name`` and surface in
    ``query.recentProgress[i]["observedMetrics"][name]``; returns
    (df, None)."""
    exprs = [c.alias(n) for n, c in aggs.items()]
    if df.isStreaming:
        return df.observe(name, *exprs), None
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def observe_corpus_metrics(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, Observation]:
    """Standard corpus-ingest metrics: document count, total/avg chars,
    empty-text count — the numbers an ingest dashboard wants per batch."""
    t = F.col(text_col)
    return observe_metrics(
        df,
        "corpus_metrics",
        n_docs=F.count(F.lit(1)),
        total_chars=F.sum(F.length(t)),
        n_empty=F.sum(F.when(F.length(F.trim(t)) == 0, 1).otherwise(0)),
        n_null=F.sum(F.when(t.isNull(), 1).otherwise(0)),
    )
