"""kafka_denormalization_spark — a PySpark-native engine with the query and
data-processing capabilities of aramperes/kafka-denormalization.

The reference (read-only at /root/reference) is a Kafka Streams library that
continuously maintains a many-to-one foreign-key equi-join between two keyed
upsert streams and emits the denormalized nested result
(reference: README.md:3-8, dsl/StreamDenormalize.java:36-77).

This engine re-expresses that capability Spark-first:

- keyed upsert streams  -> DataFrames (batch) / Structured Streaming frames
- KTable latest-per-key -> ``operators.latest.latest_per_key`` (max_by agg)
- composite JoinKey + index topic + prefix scan
                        -> a plain Catalyst equi-join on the FK *value*
                           (strictly more correct than the reference's
                           truncated-digest join, schema/JoinKey.java:28-43)
- JoinTransformer inner/leftOuter/rightOuter/fullOuter
                        -> ``operators.join.fk_denormalize`` join flavors
- ValueJoiner struct assembly -> ``operators.assemble.nested``
- custom FK partitioner -> Catalyst EnsureRequirements (automatic)

Beyond the reference, the engine ships the LLM-data-pipeline operators the
north-star requires: exact/near dedup, similarity search, text analysis, and
multimodal column plumbing — see ``operators.dedup``, ``functions.similarity``,
``functions.text``, ``functions.multimodal``.
"""

from kafka_denormalization_spark.dsl import Denormalize

__all__ = ["Denormalize"]
__version__ = "0.1.0"
