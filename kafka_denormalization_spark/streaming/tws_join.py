"""Continuous changelog FK denormalization on the Spark 4
``transformWithStateInPandas`` API — the successor to the
``applyInPandasWithState`` implementation in ``upsert_join.py``.

Same observable semantics (transform/JoinTransformer.java:138-200 parity —
left update: point lookup + emit, JoinTransformer.java:152-158; right
update: fan-out re-emit of every indexed left, :168-186; per-batch emit-once,
:210-222; tombstone retraction beyond the reference), different state
encoding:

- the lefts index is a **MapState** (one store entry per left key) instead
  of a single packed-array ValueState. A left upsert touches ONE RocksDB
  key — the applyInPandasWithState encoding rewrites the whole
  {keys[], values[]} array per update, which is O(lefts-per-FK) on every
  touch and is the dominant cost on hot FKs.
- the latest right is a one-column **ValueState**.
- state TTL rides the API's native per-state ``ttlDurationMs`` (requires
  ``timeMode="ProcessingTime"``) instead of hand-rolled timeout timers.

Scale notes: identical topology to upsert_join.py (state partitioned by
FK; a hot FK's lefts still live under one grouping key, but updates no
longer repack them). RocksDB state store required
(``spark.sql.streaming.stateStore.providerClass`` ->
RocksDBStateStoreProvider); the incremental mode remains the skew-safe
backfill path.

Protocol runtime: Spark's transformWithState Python protocol speaks
protobuf (pyspark/sql/streaming/proto/StateMessage_pb2). When the real
``google.protobuf`` runtime is absent (as in this container), the engine
substitutes the vendored miniproto shim (vendor/state_message_shim.py —
a pure-python implementation of the public wire format), activated in
every worker flavor via vendor/pb_daemon.py + the repo-root sitecustomize
meta-path finder. ``tws_available()`` reports whether EITHER runtime is
usable; the end-to-end tests (tests/test_streaming.py) run the full
arrival-order / fan-out / tombstone matrix against the real JVM state
server over the shim.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from kafka_denormalization_spark.streaming.upsert_join import OUTPUT_SCHEMA

_OUT_COLS = ["key", "fk", "left_value", "right_value"]


def tws_available() -> bool:
    """True when the runtime can actually execute transformWithStateInPandas.

    The state-server protocol needs a protobuf runtime: either the real
    ``google.protobuf``, or the vendored miniproto shim
    (vendor/state_message_shim.py) that re-implements the public wire
    format for the StateMessage protocol. ``engine.get_spark`` routes
    Python workers through vendor/pb_daemon.py so the shim is active on
    the executor side too."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    try:
        from kafka_denormalization_spark.vendor import state_message_shim

        return state_message_shim.install()
    except Exception:  # pragma: no cover - malformed pyspark install
        return False


class UpsertJoinProcessor(StatefulProcessor):
    """Per-FK changelog joiner. State: MapState lefts + ValueState right."""

    def __init__(self, how: str, ttl_ms: int | None = None, tombstones: bool = True):
        if how not in ("inner", "left_outer", "right_outer", "full_outer"):
            raise ValueError(f"unknown join flavor {how!r}")
        self.how = how
        self.ttl_ms = ttl_ms
        self.tombstones = tombstones

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._right = handle.getValueState(
            "right", "value string", ttlDurationMs=self.ttl_ms
        )
        self._lefts = handle.getMapState(
            "lefts", "key string", "value string", ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        fk = key[0]
        left_outer = self.how in ("left_outer", "full_outer")
        right_outer = self.how in ("right_outer", "full_outer")

        right_value = self._right.get()[0] if self._right.exists() else None
        right_existed = right_value is not None

        affected: set[str] = set()
        deleted_lefts: set[str] = set()
        right_updated = False
        right_deleted = False

        # one global sort across ALL Arrow chunks (same fix as
        # upsert_join.py: per-chunk order must not decide last-write-wins)
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                "seq", kind="stable"
            )
            for row in batch.itertuples(index=False):
                is_tombstone = self.tombstones and (
                    row.payload is None or row.payload != row.payload  # None/NaN
                )
                if row.side == "left":
                    if is_tombstone:
                        if self._lefts.containsKey((row.key,)):
                            self._lefts.removeKey((row.key,))
                            deleted_lefts.add(row.key)
                        affected.discard(row.key)
                    else:
                        # ONE store entry per left key — no array repack
                        self._lefts.updateValue((row.key,), (row.payload,))
                        affected.add(row.key)
                        deleted_lefts.discard(row.key)
                else:
                    right_value = None if is_tombstone else row.payload
                    right_updated = True
                    right_deleted = is_tombstone
                    right_existed = right_existed or not is_tombstone
            if right_updated:
                if right_value is None:
                    self._right.clear()
                else:
                    self._right.update((right_value,))

        out: list[tuple] = []
        if right_updated:
            # fan-out: iterate the whole index for this FK (the reference's
            # prefix scan, JoinTransformer.java:168-186)
            pairs = sorted((k[0], v[0]) for k, v in self._lefts.iterator())
        else:
            pairs = sorted(
                (k, self._lefts.getValue((k,))[0]) for k in affected
            )
        for k, v in pairs:
            if right_value is not None or left_outer:
                out.append((k, fk, v, right_value))
            elif right_deleted and right_existed:
                out.append((k, fk, None, None))
        for k in sorted(deleted_lefts):
            out.append((k, fk, None, None))
        if (
            right_updated
            and right_outer
            and right_value is not None
            and not pairs
        ):
            out.append((None, fk, None, right_value))
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    def close(self) -> None:
        pass


def upsert_join_tws(
    updates: DataFrame,
    how: str = "inner",
    ttl_ms: int | None = None,
    tombstones: bool = True,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``upsert_join`` — same input
    (UPDATE_SCHEMA) and output (OUTPUT_SCHEMA) contracts, MapState-backed
    left index. Requires the RocksDB state store provider."""
    from pyspark.sql import functions as F

    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires a protobuf runtime "
            "(google.protobuf or the vendored miniproto shim), neither of "
            "which is usable here — use streaming.upsert_join.upsert_join "
            "(applyInPandasWithState) instead"
        )

    return updates.groupBy(F.col("fk")).transformWithStateInPandas(
        statefulProcessor=UpsertJoinProcessor(how, ttl_ms, tombstones),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
