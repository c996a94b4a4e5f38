"""Parse ``df.explain`` output into assertable facts."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (excludes broadcast
    exchanges, which don't move the big side). Uses simple-mode explain,
    where exchange args print inline."""
    plan = explain_str(df, mode="simple")
    return len(re.findall(r"\bExchange (hash|range|SinglePartition)", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings from every scan node (column-pruning check)."""
    plan = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]
