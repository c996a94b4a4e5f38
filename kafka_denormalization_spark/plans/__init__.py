"""Physical-plan inspection helpers.

The reference's only "planner" knobs are a custom partitioner and a topology
flag (SURVEY §4.1); in Spark the plan IS the performance story, so these
helpers make plan shape assertable in tests and reviewable in benchmarks:
broadcast placement, filter pushdown, column pruning, exchange counts —
the properties that decide whether a query survives a 100x scale-up.
"""

from kafka_denormalization_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "read_schemas",
]
