"""Batch source/sink helpers — multi-format IO (SURVEY §2 O1/O3 batch twins).

parquet is the engine default (columnar, pushdown); csv/json/orc cover
ingest interop. Schema is explicit everywhere — ``inferSchema`` scans data
twice and guesses types, both wrong at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "json", "csv")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} requires an explicit schema (no inferSchema at scale)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """Ingest with bad-record isolation: PERMISSIVE parse where malformed
    rows land in a ``_corrupt`` column instead of failing the job (the
    only sane default at 100 TB — one bad row must not kill a 6-hour
    ingest). Returns (good, quarantined): good rows with the declared
    schema, quarantined rows as raw strings for a dead-letter sink.
    """
    if fmt not in ("json", "csv"):
        raise ValueError(f"quarantine read supports json/csv, got {fmt!r}")
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    # StructType.add mutates in place — copy so the caller's schema object
    # doesn't grow a spurious _corrupt field.
    full = StructType(list(schema.fields)).add("_corrupt", "string")
    df = read_batch(
        spark,
        path,
        fmt,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
        **options,
    )
    # Spark requires caching (or a separate scan) before filtering on the
    # corrupt-record column — the parser short-circuits otherwise
    df = df.cache()
    good = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
    return good, bad


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.options(**options).save(path)
