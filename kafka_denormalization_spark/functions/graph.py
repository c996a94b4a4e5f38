"""Distributed connected components — the transitive-closure step a
near-duplicate pipeline needs between "similar pairs" and "keep one doc
per group" (greedy pairwise retention under-merges: a~b, b~c with a!~c
splits one group in two; components don't).

Hash-min label propagation: every node's label converges to the MINIMUM
node id reachable from it (components are identified by their smallest
member). Each round is one join + one aggregation — pure DataFrame ops,
state bounded by (node, label) pairs.

Scale notes (100 TB):
- rounds needed = graph diameter. Near-dup graphs are dense clumps with
  tiny diameters (2-4 rounds typical); the `max_iter` guard catches
  pathological chains.
- each round shuffles (node, label) pairs keyed by node — same partitioning
  every round, so AQE/exchange reuse keeps it one stable shuffle key.
- lineage is truncated every round (eager localCheckpoint): without it the
  plan doubles per iteration and the job dies on planning long before it
  dies on data.
- convergence is detected by the sum of labels (strictly decreasing until
  fixpoint) — one scalar aggregate per round, no row-level comparison join.
  The scalar is an aggregate METADATA read, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the node's connected
    component. Node ids must be orderable (long/string both work; the sum
    convergence check hashes labels, so strings are fine)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .dropDuplicates()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    def _fingerprint(lab: DataFrame) -> int:
        # xxhash64(node, label) summed: equal multisets always give equal
        # sums, so a converged state is always detected. A hash-sum
        # collision across DIFFERENT label states could stop one round
        # early (p ~ 2^-64 per round) — accepted; an exact check would
        # cost a full join per round
        row = lab.select(
            F.sum(
                F.xxhash64(F.col("node"), F.col("label")).cast("decimal(38,0)")
            ).alias("s")
        ).first()
        return row["s"]

    fp = _fingerprint(labels)
    for _ in range(max_iter):
        # every node tells its neighbors its label; each node keeps the
        # min of its own label and everything it heard
        msgs = sym.join(labels, sym["v"] == labels["node"]).select(
            F.col("u").alias("node"), F.col("label")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_fp = _fingerprint(new_labels)
        labels = new_labels
        if new_fp == fp:
            break
        fp = new_fp
    return labels.select("node", F.col("label").alias("component"))
