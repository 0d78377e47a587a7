"""connected_components: min-label propagation over an edge list
(the near-dup clustering step; oracle-gated end-to-end via the
doc_dup_clusters entry in test_catalog_oracle)."""

from __future__ import annotations

import pytest

from idh_etl_demo_spark.operators.graph import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst")
    return {r.id: r.component for r in out.collect()}


def test_chain_cycle_and_separate_components(spark):
    # chain 1-2-3-4, cycle 10-11-12-10, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    got = _components(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_edge_direction_irrelevant(spark):
    assert _components(spark, [(5, 1), (1, 9)]) == {1: 1, 5: 1, 9: 1}


def test_long_chain_converges(spark):
    # diameter 12 — exercises multiple propagation rounds
    edges = [(i, i + 1) for i in range(12)]
    got = _components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "src", "dst", max_iterations=1)


def test_check_every_batched_matches_per_round(spark):
    """Micro-batched convergence checks must return the identical
    component map (labels are monotone, so the batched fixpoint test is
    exact) — on a deep chain whose diameter exercises several batches,
    and for a batch size larger than the rounds needed."""
    edges = [(i, i + 1) for i in range(12)] + [(20, 21), (21, 22)]
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {
        r.id: r.component
        for r in connected_components(df, "src", "dst", check_every=1).collect()
    }
    for ce in (2, 3):
        got = {
            r.id: r.component
            for r in connected_components(
                df, "src", "dst", check_every=ce
            ).collect()
        }
        assert got == want, ce
    for bad in (0, 50):  # 50 would build a 2^50-subtree batch plan
        with pytest.raises(ValueError):
            connected_components(df, "src", "dst", check_every=bad)


def test_checkpoints_released(spark):
    """The fixpoint must not leak its per-round localCheckpoint blocks:
    only the final labels checkpoint (which the returned DataFrame reads
    from) may remain in block-manager storage after the result is
    consumed. DataFrame.unpersist does NOT free checkpoint blocks, so
    this asserts the internal-RDD release path actually works."""
    sc = spark.sparkContext
    before = {r.id() for r in sc._jsc.sc().getRDDStorageInfo()}
    # diameter-12 chain → multiple rounds, multiple superseded checkpoints
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    out = connected_components(df, "src", "dst")
    out.count()
    after = [r for r in sc._jsc.sc().getRDDStorageInfo() if r.id() not in before]
    # final labels checkpoint only; every superseded round and the edge
    # list must have been released eagerly
    assert len(after) <= 1, [r.name() for r in after]


def test_k_core_peeling_cascade(spark):
    """Chain 1-2-3-4 hangs off a triangle 4-5-6: the 2-core is exactly the
    triangle — peeling must cascade (removing 1 drops 2's degree, etc.)."""
    from idh_etl_demo_spark.operators.graph import k_core

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.degree for r in k_core(df, k=2).collect()}
    assert got == {4: 2, 5: 2, 6: 2}


def test_k_core_whole_graph_survives(spark):
    from idh_etl_demo_spark.operators.graph import k_core

    # 4-cycle: every node has degree 2 — nothing peels at k=2
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {r.id: r.degree for r in k_core(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_k_core_empty_result(spark):
    from idh_etl_demo_spark.operators.graph import k_core

    # a tree has no 2-core
    df = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    assert k_core(df, k=2).count() == 0


def test_k_core_normalizes_multi_edges_and_loops(spark):
    from idh_etl_demo_spark.operators.graph import k_core

    # duplicate edge (both directions) and a self-loop must not inflate
    # degrees: 1-2 alone is NOT a 2-core even written four ways
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1)], "src long, dst long"
    )
    assert k_core(df, k=2).count() == 0
