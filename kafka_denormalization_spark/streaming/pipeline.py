"""End-to-end streaming denormalization pipeline — the streaming twin of the
``Denormalize`` batch builder, mirroring the reference's wiring
(hackernews/HackerNewsPipeline.java:41-54: two topics in, one joined topic
out).

``stream_denormalize`` accepts two *typed* streams (e.g. from
``sources.kafka.read_kafka_stream`` or file sources), projects them into the
side-tagged update shape (the reference's selectKey+index hop,
dsl/StreamDenormalize.java:43-60), unions them — Spark's union of streams is
the analog of both topics landing in the index topic — and runs the stateful
changelog join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_denormalization_spark.streaming.upsert_join import tag_side, upsert_join


def stream_denormalize(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_fk: str,
    right_key: str,
    left_payload: list[str],
    right_payload: list[str],
    left_seq: str,
    right_seq: str,
    how: str = "inner",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuous changelog join of two typed streams.

    Returns the OUTPUT_SCHEMA changelog stream; sink it with
    ``writeStream`` (e.g. ``sources.kafka.write_kafka_stream``, memory, or
    ``foreachBatch``).
    """
    tagged_left = tag_side(
        left, "left", key=left_key, fk=left_fk, payload_cols=left_payload, seq=left_seq
    )
    tagged_right = tag_side(
        right, "right", key=right_key, fk=None, payload_cols=right_payload, seq=right_seq
    )
    updates = tagged_left.unionByName(tagged_right)
    return upsert_join(updates, how=how, ttl_ms=ttl_ms)
