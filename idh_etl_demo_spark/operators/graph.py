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
combined min-aggregate. The driver performs ONE count per
``check_every``-round batch for the convergence check — a fixpoint loop
needs some action to know when to stop (GraphX's Pregel counts every
round); micro-batching the checks halves the job count at
check_every=2, and the count rides the labels aggregate, not the data.
``localCheckpoint`` truncates the lineage each batch so the plan does
not grow with iterations (a growing plan re-executes every prior round
at each action — the classic iterative-Spark trap).
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
    Walks to the plan's LogicalRDD LEAVES, so it also works for frames
    that project/filter over a checkpoint (a root-only reach silently
    no-ops on anything but a bare ``.localCheckpoint()`` result).
    """
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    check_every: int = 1,
) -> DataFrame:
    """Components of the undirected graph given as an edge list.

    Returns ``(id, component)`` — one row per node that appears in any
    edge, ``component`` = min node id in the node's component. Node ids
    may be any orderable type; isolated nodes (no edges) are the caller's
    concern (they are their own singleton component by definition).

    ``check_every`` micro-batches the convergence checks (round-6
    verdict ask #7): the loop runs that many propagation rounds inside
    ONE lazily-checkpointed plan before materializing + counting, so a
    diameter-d graph costs ⌈d/check_every⌉ + 1 Spark jobs instead of
    d + 1. Correctness is unaffected: labels are monotone
    non-increasing, so "no label changed across the whole batch" is
    exactly the fixpoint test — the only cost is up to check_every - 1
    redundant propagation rounds after the fixpoint is reached.
    MEASURED (round 7, interleaved A/B on doc_incremental_curation's
    shared fixpoint at sf0.1): check_every=2 is NOT a win — medians
    5.3 s vs 5.0 s for per-round checks — because the curation graphs
    converge in few rounds, so the batched variant's redundant
    post-fixpoint round costs more shuffle than the saved count-job's
    scheduling. Default stays 1; the knob exists for genuinely
    deep-diameter graphs where many sub-second rounds make scheduling
    the bottleneck.

    Raises ``RuntimeError`` if the loop does not converge within
    ``max_iterations`` propagation rounds (a near-dup graph that deep
    means the candidate generator is broken — fail loudly rather than
    publish wrong clusters).
    """
    # each batched round references the previous labels frame TWICE
    # (self-union + neighbor join), so the un-checkpointed batch plan
    # doubles per round — 2^check_every subtrees. Catalyst handles 2-4;
    # beyond that analysis time explodes, so the bound is hard.
    if not (1 <= check_every <= 4):
        raise ValueError("check_every must be in 1..4 (plan doubles per round)")
    # undirected: send labels both ways across every edge
    fwd = edges.select(F.col(src).alias("id"), F.col(dst).alias("nb"))
    rev = edges.select(F.col(dst).alias("id"), F.col(src).alias("nb"))
    bi = fwd.unionByName(rev).distinct()
    # the edge list is reused every round — materialize it once
    bi = bi.localCheckpoint(eager=True)

    # Label init folds the FIRST propagation round in: with labels=self,
    # round 1's neighbor_labels join degenerates to bi itself, so
    # min(node, min neighbor) per node — one aggregation, no join —
    # starts the loop one round ahead. (Distinct column names node/label
    # vs id/nb keep every later round's join unambiguous.)
    labels = (
        bi.groupBy("id")
        .agg(F.min("nb").alias("_mn"))
        .select(
            F.col("id").alias("node"),
            F.least("id", "_mn").alias("label"),
        )
    )
    labels = labels.localCheckpoint(eager=True)

    rounds_done = 0
    while rounds_done < max_iterations:
        batch = min(check_every, max_iterations - rounds_done)
        proposed = labels
        for _ in range(batch):
            neighbor_labels = bi.join(
                proposed, bi["nb"] == proposed["node"]
            ).select(bi["id"].alias("node"), F.col("label"))
            proposed = (
                proposed.select("node", "label")
                .unionByName(neighbor_labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
        # LAZY checkpoint: the convergence count below is the batch's
        # single action — it materializes ALL of the batch's rounds AND
        # counts in one job (eager=True would spend a separate job per
        # batch just to materialize before counting).
        proposed = proposed.localCheckpoint(eager=False)
        changed = (
            proposed.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the superseded batch's checkpoint blocks pin executor storage
        # memory until driver GC — release them eagerly (the convergence
        # count above was the last reader of the old labels)
        _release_checkpoint(labels)
        labels = proposed
        rounds_done += batch
        if changed == 0:
            _release_checkpoint(bi)
            return labels.select(
                F.col("node").alias("id"), F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 12,
) -> DataFrame:
    """The k-core of the undirected graph: the maximal subgraph where
    every node has degree >= k. Returns ``(id, degree)`` — one row per
    surviving node with its degree *within the core*.

    Computed by iterative peeling: drop every node with degree < k,
    recount (removals cascade), repeat to fixpoint. On a near-dup graph
    the 2-core separates genuine duplicate clusters from incidental
    single-pair LSH collisions, and higher k isolates boilerplate
    cliques — the triage step between candidate pairs and bulk removal.

    Scale shape per round: one map-side-combined degree aggregate plus
    two semi-joins of the edge list against the surviving-node set, all
    hash-partitioned on node id; one count rides each round for the
    convergence check (inherent to fixpoints, same as
    ``connected_components``). localCheckpoint truncates lineage per
    round and superseded checkpoints are released eagerly.

    Multi-edges and self-loops are normalized away first (least/greatest
    + distinct), so "degree" means distinct neighbors.

    Raises ``RuntimeError`` if the peeling does not reach a fixpoint in
    ``max_iterations`` rounds — callers pairing this with a fixed-round
    oracle need the loud failure, not a silently deeper core.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # LAZY: the count below materializes the checkpoint AND counts
        # in one job (same trick as connected_components' rounds)
        .localCheckpoint(eager=False)
    )
    n_edges = e.count()
    for _ in range(max_iterations):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e2 = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
        )
        e2 = e2.localCheckpoint(eager=False)
        n2 = e2.count()
        _release_checkpoint(e)
        e, n_edges, converged = e2, n2, n2 == n_edges
        if converged:
            return (
                e.select(F.col("a").alias("node"))
                .unionByName(e.select(F.col("b").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("degree"))
                .select(F.col("node").alias("id"), "degree")
            )
    raise RuntimeError(f"k_core did not converge in {max_iterations} rounds")


def integer_pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    iterations: int = 2,
    base: int = 150_000,
    damp: int = 850,
) -> DataFrame:
    """Deterministic INTEGER PageRank over an undirected graph.

    ``nodes``: one column ``id`` (every ranked entity, isolated ones
    included). ``pairs``: columns ``id_a``/``id_b``, one row per
    undirected edge. Ranks live in millionths; each iteration is

        r'(v) = base + Σ_{u ∈ N(v)} (damp · r(u)) // (1000 · deg(u))

    with r₀ = 1_000_000. Floor-divided integer contributions make the
    per-node sums order-independent — double-precision PageRank cannot
    hash-gate across engines, this variant does (see
    catalog_r9b.doc_dup_pagerank's oracle). Output: (id, deg,
    r1..r{iterations}) with isolated nodes at ``base`` every round.

    Scale shape: the Pregel step as DataFrames — per iteration one
    equi-join of the edge list onto the current rank table plus a
    map-side-combined groupBy on the destination; iterations are
    statically unrolled by the caller's count, so the plan stays
    lazy (no checkpoint loop needed at the catalog's fixed depth).
    Per-iteration ranks ACCUMULATE as columns on the one rank frame —
    joining per-iteration snapshots back at the end would replay the
    full edge/degree lineage once per iteration (the round-9 ADVICE
    finding: ~3× recompute at iterations=2)."""
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("src").alias("id"), "deg")
    )
    ranked = (
        nodes.join(deg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
            F.lit(1_000_000).cast("long").alias("r0"),
        )
    )
    cur = "r0"
    hist: list[str] = []
    for it in range(1, iterations + 1):
        inflow = (
            edges.join(
                ranked.select(
                    F.col("id").alias("src"),
                    F.col("deg").alias("sdeg"),
                    F.col(cur).alias("sr"),
                ),
                "src",
            )
            .select(
                "dst",
                F.expr(f"({damp} * sr) div (1000 * sdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        cur = f"r{it}"
        ranked = (
            ranked.join(inflow.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "deg",
                *hist,
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias(cur),
            )
        )
        hist.append(cur)
    return ranked.select("id", "deg", *hist)
