"""Deterministic (hash-based) sampling — training-mix construction for
LLM-data pipelines (north-star extension; SURVEY §2.3 — the reference has
no sampling surface at all).

Why not ``df.sample()``: Bernoulli sampling is seeded per-partition, so the
kept set changes whenever partitioning changes (file splits, AQE, cluster
size) and cannot be reproduced across engines. Hashing a stable KEY makes
the decision a pure function of the row — re-runs, backfills, and the
DuckDB oracle all agree row-for-row, and a document keeps/loses membership
consistently across every pipeline stage that re-derives the mix.

Mechanism: md5 over (salt | key) is uniform; keeping rows whose first 8 hex
chars compare below ``hex(fraction * 16^8)`` keeps ~fraction of rows. The
string comparison is equivalent to the numeric one (fixed-width lowercase
hex) and works identically in any engine with md5 — no engine-specific
hash needed (cf. join_key_digest's md5-vs-xxhash64 split).

Scale notes (100 TB): pure narrow expression — no shuffle, fully pipelined
with the scan, pushdown-friendly (the filter sits directly on scan output).
Changing ``salt`` draws an independent sample; stratified rates are a CASE
over the strata column, still one pass.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # compare 32 bits of the digest: granularity 1/2^32


def fraction_threshold(fraction: float) -> str:
    """Fixed-width lowercase-hex threshold for a keep-fraction in [0, 1]."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * 16**_HEX_WIDTH), 16**_HEX_WIDTH - 1), f"0{_HEX_WIDTH}x")


def sample_hash(key: Column, salt: str) -> Column:
    """The stable per-row draw: first 8 hex chars of md5(salt | key)."""
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, _HEX_WIDTH)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by hash(key) — deterministic
    across partitionings, engines, and re-runs."""
    if fraction >= 1.0:
        return df
    return df.filter(sample_hash(F.col(key_col), salt) < F.lit(fraction_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix primitive
    ("webtext at 30%, books at 90%, ..."). One narrow pass; strata absent
    from ``fractions`` fall back to ``default_fraction``."""
    thr: Column = F.lit(fraction_threshold(default_fraction))
    for stratum, frac in fractions.items():
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_hash(F.col(key_col), salt) < thr)
