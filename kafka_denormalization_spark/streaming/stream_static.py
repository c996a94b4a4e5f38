"""Stream-static denormalization — SURVEY §4.3.2 option (c).

The N side flows as a stream; the 1 side is a *static* (batch) table,
compacted to latest-per-key at plan time. Right-side updates do NOT fan out
(the static side is fixed for the query's lifetime — refresh by restarting
the query or using a format with refreshable file listings); left updates
join against the snapshot. This is the cheapest mode when the dimension
changes rarely relative to the stream (the HackerNews stories-vs-comments
ratio), and it broadcasts the dimension — no stateful shuffle at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.latest import latest_per_key


def stream_static_denormalize(
    stream: DataFrame,
    static_dim: DataFrame,
    fk: str,
    dim_key: str,
    dim_version: Sequence[str] | None = None,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming N side to a static latest-per-key dimension.

    ``how`` is inner or left_outer (right/full outer are not defined for
    stream-static joins in Spark — the static side can't observe absent
    stream rows).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("stream-static supports inner / left_outer only")
    dim = static_dim
    if dim_version:
        dim = latest_per_key(dim, [dim_key], dim_version)
    if broadcast_dim:
        dim = F.broadcast(dim)
    return stream.join(dim, stream[fk] == dim[dim_key], how)
