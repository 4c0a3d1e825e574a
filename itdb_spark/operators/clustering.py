"""Near-duplicate clustering: connected components over the candidate-pair
graph, then keeper election per cluster — the step after LSH/Jaccard that
turns pairs into a dedup decision (drop all but the canonical doc).

Algorithm: iterative min-label propagation over the undirected pair graph
— each round joins every node's label with its neighbors' labels and takes
the min; converges in O(component diameter) rounds. Each round is one
shuffle on node id; near-dup components are tiny (diameter ≤ 3-4 in
practice), so the loop exits after a few rounds. This is the standard
large-graph CC pattern without needing GraphFrames/GraphX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, id1: str = "id1", id2: str = "id2", max_iter: int = 10
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id reachable. Converges when a full round changes no label
    (checked with a count — one action per round, each round one shuffle).
    """
    # The edge union scans `pairs` twice (forward + reversed) — cache
    # pairs so the candidate pipeline runs once. No distinct() anywhere:
    # pairs carry id1 < id2, so the two union directions cannot overlap,
    # and min-label propagation is duplicate-insensitive (min is
    # idempotent) — callers may even pass band-duplicated candidate pairs
    # (minhash_candidates(distinct_pairs=False)), trading a few duplicate
    # edge rows for one less full shuffle upstream.
    pairs = pairs.cache()
    edges = (
        pairs.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
        .unionByName(pairs.select(F.col(id2).alias("a"), F.col(id1).alias("b")))
        .cache()  # reused every round
    )
    # Initial labels fold the would-be first propagation round into a plain
    # groupBy: with identity labels, "min neighbor label" IS min(b) — no
    # join needed, and the loop starts one round further along.
    labels = (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("nmin"))
        .select("node", F.least(F.col("node"), F.col("nmin")).alias("component"))
    )
    # Iterative algorithms must truncate lineage each round — otherwise
    # round N recomputes rounds 1..N-1 from scratch and the plan grows
    # exponentially. localCheckpoint materializes to executor storage
    # (on a cluster with an unreliable executor set, use checkpoint()).
    # LAZY checkpoints: the round's single count() action both materializes
    # the checkpoint and returns the convergence signal — one job per round
    # instead of eager-checkpoint + count (two full passes).
    labels = labels.localCheckpoint(eager=False)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nmin", F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        ).localCheckpoint(eager=False)
        changed = new_labels.where(F.col("new_component") < F.col("component")).count()
        labels = new_labels.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            break
    # The convergence count just materialized the final round's (lazy)
    # checkpoint, so the returned frame reads checkpoint blocks — the edge
    # caches are no longer on its lineage and can be released here rather
    # than leaking into the caller's long-lived session.
    pairs.unpersist()
    edges.unpersist()
    return labels


def elect_keepers(components: DataFrame) -> DataFrame:
    """(component, keeper, n_members, drop_count): the dedup decision —
    keep the min-id member, drop the rest (the reference keeps the first
    path in each checksum group, dupes/dedup.py:157-171)."""
    return components.groupBy("component").agg(
        F.min("node").alias("keeper"),
        F.count("*").alias("n_members"),
        (F.count("*") - 1).alias("drop_count"),
    )
