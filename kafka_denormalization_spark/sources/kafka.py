"""Kafka source/sink wrappers (SURVEY §2 O1/O3).

Reference parity: ``builder.stream(topic, Consumed.with(kSerde, vSerde))``
(dsl/StreamDenormalize.java:44, :48, :58) and ``.to(topic,
Produced.with(...))`` (:46, :50, :60; HackerNewsPipeline.java:54).

The Kafka connector jar (spark-sql-kafka-0-10) and a broker are not present
in this container, so these wrappers are exercised by tests only through
``probe_kafka_available`` gating; the transformation topology they wrap is
covered by the memory/file-source streaming tests. On a real deployment:
``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def probe_kafka_available(spark: SparkSession) -> bool:
    """True if the Kafka connector classes are on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: StructType | str | None = None,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Subscribe to a topic as a keyed record stream.

    Returns columns: key (string), value (struct if schema given, else
    string), topic, partition, offset, timestamp — the deserialized twin of
    the reference's ``Consumed.with(keySerde, valueSerde)``.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    value: Column = F.col("value").cast("string")
    if value_schema is not None:
        value = F.from_json(value, value_schema)
    return raw.select(
        F.col("key").cast("string").alias("key"),
        value.alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    key: Column | str = "key",
    value: Column | str = "value",
    output_mode: str = "update",
):
    """Produce a stream to a topic (key/value serialized to string/JSON).

    The reference's custom FK partitioner (Produced.withStreamPartitioner,
    JoinKeyPartitioner.java:20-22) is intentionally not reproduced: Kafka's
    default key-hash partitioning plus Spark's own shuffle placement covers
    co-location, and downstream Spark consumers repartition by join key
    anyway.
    """
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    v = F.when(v.cast("string").isNotNull(), v.cast("string"))
    payload = df.select(k.cast("string").alias("key"), v.alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
        .start()
    )
