"""ADC-LUT production-shape probe (r9 verdict ask #6).

``embedding_ivfpq_adc_lut`` proves the separable-LUT serving layout
bit-identical to the combo plan at the oracle-pinned m=2, k=4 — where
the combo table is only k^m = 16 rows, so the claim "the LUT layout is
what survives production code sizes" was stated, not measured. This
probe prices both layouts at a REALISTIC shape, m=8 sub-spaces × k=16
codes over 64-dim integer vectors (half of FAISS's canonical m=16,
k=256 — chosen so the combo-side arithmetic below stays in int range
for the refusal math, not because the LUT side needs it):

- combo table rows  = k^m = 16^8 = 4,294,967,296  → REFUSED (the probe
  computes the count and declines to materialize ~4.3e9 rows; at
  FAISS's m=16·k=256 it would be 3.4e38 — no cluster builds that);
- LUT rows          = m·k = 128 per query — broadcastable at ANY m, k.

The probe then SERVES a deterministic synthetic corpus through the LUT
layout (per-query maps, 2 lookups per sub-space per candidate — the
same plan shape as the catalog entry) and cross-checks BIT-IDENTITY of
every scored integer against direct reconstruction dot products
(recon = concatenation ⇒ the dot decomposes with zero cross-subspace
terms — the same theorem the catalog entry relies on, now verified at
m=8). Everything is exact int64: vectors, codes and centroids are
md5-derived integers, so reruns are deterministic.

Probe-only: no catalog entry, no oracle (the oracle-gated m=2·k=4
entry pins engine correctness; this pins the SCALING claim with a
measured artifact, like PROBE_KSCALE does for k∝N).

Usage: python tools/probe_adcshape.py
Writes PROBE_ADCSHAPE.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from idh_etl_demo_spark.session import get_spark

N_CORPUS = 20_000
N_QUERIES = 20
DIM = 64
REFUSE_ABOVE = 10_000_000  # never materialize a combo table past this

# md5-derived deterministic integer in [-100, 100] — the repo's
# engine-portable hashing idiom (functions/hashing.py), used here so
# the probe needs no RNG and reruns bit-identically.
def _hint(tag: str) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.lit(tag) + F.col("_k")), 1, 8), 16, 10)
        .cast("long")
        % 201
        - 100
    )


def _vec(tag: str, dim: int) -> F.Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(tag), F.col("_k"), j.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 201
            - 100
        ),
    )


def main() -> None:
    spark: SparkSession = get_spark(app_name="probe-adcshape")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m, k in ((2, 4), (8, 16)):
        subdim = DIM // m
        combo_rows = k**m
        combo_built = combo_rows <= REFUSE_ABOVE
        lut_rows = m * k

        # codebooks: m sub-spaces × k centroids of subdim ints
        cents = (
            spark.range(m * k)
            .select(
                (F.col("id") / k).cast("int").alias("sub"),
                (F.col("id") % k).cast("int").alias("code"),
                F.col("id").cast("string").alias("_k"),
            )
            .select("sub", "code", _vec(f"cent-m{m}", subdim).alias("cv"))
            .localCheckpoint(eager=True)
        )
        # corpus: N vectors encoded as m codes each (arbitrary
        # deterministic codes — the probe prices the SERVING layout,
        # not quantization quality)
        corpus = (
            spark.range(N_CORPUS)
            .select(
                F.col("id").alias("vec_id"),
                F.col("id").cast("string").alias("_k"),
            )
            .select(
                "vec_id",
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda j: (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        "|",
                                        F.lit(f"code-m{m}"),
                                        F.col("_k"),
                                        j.cast("string"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % k
                    ).cast("int"),
                ).alias("codes"),
            )
            .localCheckpoint(eager=True)
        )
        queries = (
            spark.range(N_QUERIES)
            .select(
                F.col("id").alias("query_id"),
                F.col("id").cast("string").alias("_k"),
            )
            .select("query_id", _vec(f"q-m{m}", DIM).alias("qv"))
            .localCheckpoint(eager=True)
        )

        # ---- LUT build: per query, per (sub, code): <q_sub, cv> ----
        t0 = time.perf_counter()
        qlut = (
            queries.crossJoin(F.broadcast(cents))
            .select(
                "query_id",
                "sub",
                "code",
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("qv"), F.col("sub") * subdim + 1, subdim),
                        F.col("cv"),
                        lambda a, b: a * b,
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("partial"),
            )
            .groupBy("query_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(
                            (F.col("sub") * k + F.col("code")).alias("key"),
                            F.col("partial").alias("value"),
                        )
                    )
                ).alias("lut")
            )
            .localCheckpoint(eager=True)
        )
        wall_lut_build = time.perf_counter() - t0

        # ---- serve: score every (query, candidate) by m lookups ----
        t0 = time.perf_counter()
        scored = corpus.crossJoin(F.broadcast(qlut)).select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.col("codes"),
                    lambda j, c: F.element_at(F.col("lut"), j * k + c),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("vec_id")
        )
        top = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .localCheckpoint(eager=True)
        )
        n_top = top.count()
        wall_serve = time.perf_counter() - t0

        # ---- bit-identity vs direct reconstruction dots ----
        # recon(vec) = concat of the m code centroids; direct score =
        # <q, recon>. Zero cross-subspace terms ⇒ must equal the LUT
        # sum EXACTLY (int64). Checked on every top row.
        code_cols = corpus.select(
            "vec_id",
            F.posexplode("codes").alias("sub", "code"),
        )
        recon = (
            code_cols.join(F.broadcast(cents), ["sub", "code"])
            .groupBy("vec_id")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("sub", F.col("cv")))
                        ),
                        lambda s: s["cv"],
                    )
                ).alias("rv")
            )
        )
        direct = (
            top.join(recon, "vec_id")
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                "vec_id",
                "score",
                F.aggregate(
                    F.zip_with(F.col("qv"), F.col("rv"), lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("direct_score"),
            )
        )
        mismatches = direct.filter(F.col("score") != F.col("direct_score")).count()

        results.append(
            {
                "m": m,
                "k": k,
                "subdim": subdim,
                "combo_rows": combo_rows,
                "combo_built": combo_built,
                "lut_rows_per_query": lut_rows,
                "lut_broadcast_longs": lut_rows * N_QUERIES,
                "n_corpus": N_CORPUS,
                "n_queries": N_QUERIES,
                "wall_lut_build_s": round(wall_lut_build, 2),
                "wall_serve_s": round(wall_serve, 2),
                "top_rows": n_top,
                "bitident_checked_rows": n_top,
                "bitident_mismatches": mismatches,
            }
        )
        print(
            f"[probe] m={m} k={k}: combo={combo_rows:,} rows "
            f"({'built' if combo_built else 'REFUSED'}), "
            f"lut={lut_rows}/query, serve={wall_serve:.2f}s, "
            f"bit-identity mismatches={mismatches}"
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROBE_ADCSHAPE.json",
    )
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")
    print("| m | k | combo rows | LUT rows/query | serve s | bit-ident |")
    print("|---|---|---|---|---|---|")
    for r in results:
        built = "built" if r["combo_built"] else "**refused**"
        print(
            f"| {r['m']} | {r['k']} | {r['combo_rows']:,} ({built}) "
            f"| {r['lut_rows_per_query']} | {r['wall_serve_s']} "
            f"| {r['bitident_mismatches']} mismatches |"
        )


if __name__ == "__main__":
    main()
