"""Distributed Lloyd (KMeans) iterations in fixed-point arithmetic.

Floating-point KMeans is not reproducible across engines or even across
partitionings (float means differ in the last ulp, and a last-ulp
distance tie flips an assignment). This implementation keeps EVERY step
integral:

- vectors are integer-quantized upstream (×10⁴ — see catalog_llm);
- centroids live on a ×100 sub-grid of that quantization: the update is
  ``floor(sum · 100 / n)`` — floor of ONE double division of exact
  integers, bit-identical in every engine;
- assignment distances are integer sums (|terms| ≤ 4e12 · 64 dims
  ≈ 2.6e14 < 2^53, so even a double accumulator is exact), argmin ties
  broken by centroid id.

Per-iteration plan shape (the part that must hold at 100 TB):
- assignment: the |k| centroids collapse to ONE broadcast row of
  array<struct(cid, cv)>; per-vector argmin is array_min over a
  transform — a pure projection, so the corpus never shuffles for
  assignment (zero exchanges on the big side per iteration);
- update: posexplode to (cluster, dim, q) with map-side partial sums —
  the shuffle carries ≤ |k|·dim rows per task regardless of corpus size.

Used by the ``embedding_kmeans_2iter`` catalog entry (oracle-gated: the
unrolled DuckDB SQL reproduces the identical integers).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CENTROID_GRID = 100


def _dist_structs(grid: int = CENTROID_GRID) -> F.Column:
    """Per-centroid (dist, cid) structs for the packed broadcast row
    ``cs`` (array<struct(cid, cv)>) against the current row's ``v`` —
    the shared argmin/top-n core: distances are integer-valued doubles
    (exact, see module docstring), ties break on cid via lexicographic
    struct ordering.

    ``grid``: the centroid sub-grid factor — distances compare
    ``v·grid`` against ``cv``. The default ×100 is the embedding
    chain's layout; residual PQ codebooks (round 9) train on vectors
    ALREADY on the centroid grid and pass ``grid=1``."""

    def dist_to(cv: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(
                F.col("v"),
                cv,
                lambda x, y: (x * grid - y) * (x * grid - y),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d.cast("double"),
        )

    return F.transform(
        F.col("cs"),
        lambda c: F.struct(dist_to(c["cv"]).alias("dist"), c["cid"].alias("cid")),
    )


def _packed(cents: DataFrame) -> DataFrame:
    # Pack the |k| centroids into ONE broadcast row of
    # array<struct(cid, cv)>: the argmin then evaluates entirely
    # inside a projection (array_min over per-centroid distances), so
    # the corpus is NEVER shuffled for assignment — the earlier
    # explode-by-k + groupBy(vec_id) form re-shuffled every vector
    # (with its 64-long array) once per iteration, which is the cost
    # that would dominate at 100 TB. Ties break on centroid id via
    # lexicographic struct(dist, cid) ordering — identical to the
    # min(struct(dist, cid)) aggregate it replaces.
    return cents.agg(
        F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cs")
    )


def lloyd_assign(
    df: DataFrame, cents: DataFrame, grid: int = CENTROID_GRID
) -> DataFrame:
    """Assign every (vec_id, v) row to its nearest centroid — returns
    (vec_id, v, cluster). Broadcast + projection; zero corpus shuffles."""
    best = F.array_min(_dist_structs(grid))
    return df.join(F.broadcast(_packed(cents))).select(
        "vec_id", "v", best["cid"].alias("cluster")
    )


def lloyd_assign_topn(
    df: DataFrame, cents: DataFrame, n: int, grid: int = CENTROID_GRID
) -> DataFrame:
    """Rank the ``n`` nearest centroids per row — returns (vec_id, v,
    cluster, cell_rank 1..n). The multi-probe (nprobe>1) query-side
    primitive: same packed-broadcast projection as ``lloyd_assign``,
    then a per-row array slice of the sorted (dist, cid) structs —
    still zero shuffles; the row count fans out ×n on the (small)
    query side only.

    If ``n`` exceeds the centroid count the slice TRUNCATES: each row
    yields min(n, |cents|) ranks, not n. Checking |cents| here would
    cost an eager count job per call, so callers that require exactly
    n ranks must validate n against their (known) codebook size —
    every catalog call site passes a compile-time-constant k."""
    if n < 1:
        raise ValueError("n must be >= 1")
    ranked = F.slice(F.array_sort(_dist_structs(grid)), 1, n)
    fan = df.join(F.broadcast(_packed(cents))).select(
        "vec_id", "v", F.posexplode(ranked).alias("pos", "d")
    )
    return fan.select(
        "vec_id",
        "v",
        F.col("d.cid").alias("cluster"),
        (F.col("pos") + 1).cast("int").alias("cell_rank"),
    )


def lloyd_iterations(
    vectors: DataFrame,
    seeds: DataFrame,
    iterations: int,
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds; returns (vec_id, v, cluster).

    ``vectors``: (vec_id, v array<long>) — integer-quantized.
    ``seeds``: (cid, cv array<long>) — centroids ON THE ×100 GRID
    (multiply quantized seed vectors by CENTROID_GRID).
    """
    assigned = lloyd_assign(vectors, lloyd_centroids(vectors, seeds, iterations))
    return assigned


def lloyd_centroids(
    vectors: DataFrame,
    seeds: DataFrame,
    iterations: int,
    grid: int = CENTROID_GRID,
) -> DataFrame:
    """The TRAINED centroid table (cid, cv on the ×``grid`` sub-grid of
    the input) that the final assignment round of ``iterations`` Lloyd
    rounds uses: runs ``iterations - 1`` assign→update cycles from
    ``seeds``. Exposed so consumers that need the codebook itself (IVF
    coarse quantizers, multi-probe cell ranking) train it once and
    share it with the assignment. ``grid=1`` keeps centroids on the
    input's own grid (the residual-codebook layout: update is the floor
    of ONE double division, still bit-identical across engines)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    def update(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("cluster", F.posexplode("v").alias("p", "q"))
            .groupBy("cluster", "p")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cluster",
                "p",
                F.floor(F.col("s") * F.lit(float(grid)) / F.col("n"))
                .cast("long")
                .alias("cq"),
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "cq"))),
                    lambda x: x["cq"],
                ).alias("cv")
            )
            .select(F.col("cluster").alias("cid"), "cv")
        )

    cents = seeds
    for _ in range(iterations - 1):
        cents = update(lloyd_assign(vectors, cents, grid))
    return cents
