"""Streaming latest-per-key — the continuous twin of
``operators.latest.latest_per_key`` (O2: the reference's KTable
materialization, dsl/StreamDenormalize.java:67-70).

Emits one record per key per micro-batch in which that key's latest value
changed; out-of-order stragglers (version <= stored) are suppressed, which
is exactly compacted-topic latest-wins semantics rather than Kafka Streams'
arrival-order-wins (strictly saner under replays/retries).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

LATEST_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("version", LongType()),
        StructField("payload", StringType()),
    ]
)

LATEST_STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("payload", StringType()),
    ]
)


def _updater(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
    k = key[0]
    version, payload = state.get if state.exists else (None, None)
    changed = False
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            v = int(row.version)
            if version is None or v > version:
                version, payload, changed = v, row.payload, True
    if changed:
        state.update((version, payload))
        yield pd.DataFrame([(k, version, payload)], columns=["key", "version", "payload"])


def streaming_latest_per_key(updates: DataFrame) -> DataFrame:
    """Continuous latest-per-key over a (key, version, payload) stream.

    Returns the changelog stream: (key, version, payload) whenever a key's
    latest value advances.
    """
    return updates.groupBy(F.col("key")).applyInPandasWithState(
        _updater,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
