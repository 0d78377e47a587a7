"""Connected components — the clustering step of near-duplicate dedup.

A training-data dedup pipeline is candidates → verify → CLUSTER →
canonical-select: LSH surfaces pairs, but near-duplication is transitive
(A~B, B~C ⇒ one cluster {A,B,C}), so the keep/drop decision needs the
component, not the pair list. The reference has no graph operator (its
dedup is pandas drop_duplicates, reference: dags/idh_etl.py:214-221);
this is a beyond-reference operator the 100 TB brief requires.

Algorithm: min-label propagation. Every node starts labeled with itself;
each round a node adopts the minimum label among itself and its
neighbors; the fixpoint labels every node with the smallest node id in
its component. Converges in O(component diameter) rounds — near-dup
clusters are dense (diameter 2-3), so 3-5 rounds in practice.

Scale shape per round: one shuffle-join (labels onto the edge list, both
sides keyed by node id — AQE/bucketing can co-locate) + one map-side
combined min-aggregate. The driver performs ONE count per round for the
convergence check — that is inherent to any fixpoint loop (GraphX's
Pregel does the same); the count rides the labels aggregate, not the
data. ``localCheckpoint`` truncates the lineage each round so the plan
does not grow with iterations (a growing plan re-executes every prior
round at each action — the classic iterative-Spark trap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _release_checkpoint(df: DataFrame) -> None:
    """Best-effort eager release of a localCheckpoint's storage blocks.

    ``DataFrame.unpersist`` goes through the CacheManager and does NOT
    free checkpoint blocks (verified empirically); the blocks otherwise
    linger until the driver GCs the RDD reference and the ContextCleaner
    notices. A fixpoint loop creates one checkpoint per round, so on a
    real cluster the superseded rounds would pin executor storage memory
    for an unbounded while. Reaches through the LogicalRDD (internal
    API) — failure is harmless, the ContextCleaner remains the backstop.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Components of the undirected graph given as an edge list.

    Returns ``(id, component)`` — one row per node that appears in any
    edge, ``component`` = min node id in the node's component. Node ids
    may be any orderable type; isolated nodes (no edges) are the caller's
    concern (they are their own singleton component by definition).

    Raises ``RuntimeError`` if the loop does not converge within
    ``max_iterations`` (a near-dup graph that deep means the candidate
    generator is broken — fail loudly rather than publish wrong
    clusters).
    """
    # undirected: send labels both ways across every edge
    fwd = edges.select(F.col(src).alias("id"), F.col(dst).alias("nb"))
    rev = edges.select(F.col(dst).alias("id"), F.col(src).alias("nb"))
    bi = fwd.unionByName(rev).distinct()
    # the edge list is reused every round — materialize it once
    bi = bi.localCheckpoint(eager=True)

    # distinct column names (node/label vs id/nb) keep every round's join
    # unambiguous even though labels' lineage starts from bi
    labels = (
        bi.select(F.col("id").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_labels = bi.join(labels, bi["nb"] == labels["node"]).select(
            bi["id"].alias("node"), F.col("label")
        )
        proposed = (
            labels.select("node", "label")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        proposed = proposed.localCheckpoint(eager=True)
        changed = (
            proposed.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the superseded round's checkpoint blocks pin executor storage
        # memory until driver GC — release them eagerly (the convergence
        # count above was the last reader of the old labels)
        _release_checkpoint(labels)
        labels = proposed
        if changed == 0:
            _release_checkpoint(bi)
            return labels.select(
                F.col("node").alias("id"), F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
