"""Measure the incremental ExactSubstr walk reduction → PROBE_XSI.json.

doc_exact_substr_incremental's claim is that the Manber–Myers LCP walk
— the log(max_len) refinement join chain — processes only adjacent
pairs TOUCHING a delta position (suffix_lcp_adjacent's pair_filter),
never re-walking base-only pairs. This probe makes the reduction a
committed NUMBER per scale factor: the unfiltered pair count is
|positions| − 1 by construction; the filtered count is what the walk
actually consumes. walk_fraction should sit near the delta position
fraction (each delta position contributes its two neighbors, so the
walked fraction is bounded by ~2× the delta share — much closer on
runs of consecutive delta positions).

Usage: python tools/probe_xsi.py  (writes PROBE_XSI.json at repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from idh_etl_demo_spark.session import get_spark  # noqa: E402
from idh_etl_demo_spark.catalog_r11 import (  # noqa: E402
    _xsi_base,
    _xsi_delta,
    _xsi_parts,
)


def _timed_build(base_df):
    from idh_etl_demo_spark.operators.suffix import suffix_ranks

    t0 = time.perf_counter()
    final, history, pos = suffix_ranks(base_df)
    return round(time.perf_counter() - t0, 3), final, history, pos


def main() -> None:
    spark = get_spark(app_name="probe-xsi")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        t0 = time.perf_counter()
        final, history, posf = _xsi_parts(spark, sf_dir)
        build_s = round(time.perf_counter() - t0, 3)
        npos = final.count()

        # ------- rebuild-vs-update decomposition (r11 verdict, -------
        # ------- What's missing #4) -------
        # An incremental (merged-SA) update's cost floor is
        #   delta-only build + at least ONE global ranking pass over
        #   the combined positions (any merge must produce the
        #   combined total order),
        # plus the rank-placement machinery itself (in Spark: log(n)
        # batched binary-search join rounds — each a full stage, so
        # its cost floor is stage-overhead × log₂(n_base), data-size
        # independent). Measure every term so the crossover is a
        # number, not a guess.
        corpus = _xsi_base(spark, sf_dir)
        base_only_s, _, bh, _ = _timed_build(
            corpus.filter(~_xsi_delta(F.col("doc_id")))
        )
        delta_only_s, _, dh, _ = _timed_build(
            corpus.filter(_xsi_delta(F.col("doc_id")))
        )
        # one global ranking pass over the combined corpus = the merge
        # floor (the seed level of a fresh build is exactly that shape)
        import math

        from idh_etl_demo_spark.operators.suffix import _bucketed_rank, _NBUCKETS

        seed = history[0][1]
        t0 = time.perf_counter()
        bw = max(1, math.ceil(npos / _NBUCKETS))
        _bucketed_rank(
            seed, ["r", "doc_id", "pos"], "r", bw, dense=False
        ).localCheckpoint(eager=True)
        merge_floor_s = round(time.perf_counter() - t0, 3)
        ndelta_pos = (
            _xsi_base(spark, sf_dir)
            .filter(_xsi_delta(F.col("doc_id")))
            .select(F.sum(F.size("toks")).alias("n"))
            .collect()[0][0]
        )
        a = final.select(
            F.col("doc_id").alias("d1"), F.col("pos").alias("p1"), "sa_rank"
        )
        b = final.select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("p2"),
            (F.col("sa_rank") - 1).alias("sa_rank"),
        )
        pairs = a.join(b, "sa_rank")
        walked = pairs.filter(
            _xsi_delta(F.col("d1")) | _xsi_delta(F.col("d2"))
        ).count()
        full = npos - 1
        out[sf] = {
            "positions": npos,
            "delta_positions": int(ndelta_pos),
            "delta_position_fraction": round(ndelta_pos / npos, 4),
            "pairs_full_walk": full,
            "pairs_actually_walked": walked,
            "walk_fraction": round(walked / full, 4),
            "sa_build_sec": build_s,
            "sa_build_rounds_retained": len(history),
            "sa_build_base_only_sec": base_only_s,
            "sa_build_base_only_rounds": len(bh),
            "sa_build_delta_only_sec": delta_only_s,
            "sa_build_delta_only_rounds": len(dh),
            "merge_floor_one_ranking_pass_sec": merge_floor_s,
            # update floor = reuse the stored base build, pay the
            # delta build + >= 1 combined ranking pass + log2(n_base)
            # batched binary-search stages for rank placement
            "update_floor_sec_excl_placement": round(
                delta_only_s + merge_floor_s, 3
            ),
            "placement_stages_log2_nbase": math.ceil(
                math.log2(max(npos - ndelta_pos, 2))
            ),
        }
        print(f"[probe] {sf}: {out[sf]}")

    # ------- round-13 (r12 verdict stretch ask #8): the stored-base -------
    # ------- placement PROTOTYPE measured at a 10× corpus -------
    # One real data point above catalog SFs for the rebuild-vs-update
    # crossover: 10 shifted copies of the sf0.01 xsi corpus
    # (bench_scale's construction — ' v{i}' text variation so copies
    # aren't byte-identical), split base/delta by the LOCAL doc id.
    # Update path = delta-only build + place_delta_ranks (batched
    # binary search against the STORED base order — the base build is
    # the stored artifact and is not part of the update cost); rebuild
    # path = one combined suffix_ranks. Merged-order correctness is
    # pinned by test_sa_placement_matches_combined_rebuild.
    import math as _math

    from idh_etl_demo_spark.catalog import _read_table
    from idh_etl_demo_spark.operators.suffix import place_delta_ranks
    from idh_etl_demo_spark.operators.text import tokens

    docs = _read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    xsi = docs.unionByName(
        docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    from idh_etl_demo_spark.operators.suffix import suffix_ranks

    for n_copies in (10, 30, 100):
        copies = [xsi]
        for i in range(1, n_copies):
            copies.append(
                xsi.select(
                    (F.col("doc_id") + i * 10**7).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" v{i}")).alias("text"),
                )
            )
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        corpus_n = big.repartition(
            spark.sparkContext.defaultParallelism
        ).select("doc_id", tokens(F.col("text")).alias("toks"))
        local = F.col("doc_id") % 10**7
        is_delta = (local % 5 == 4) | (local >= 1000000)
        base_n = corpus_n.filter(~is_delta).localCheckpoint(eager=True)
        delta_n = corpus_n.filter(is_delta).localCheckpoint(eager=True)

        rebuild_s, _, _, _ = _timed_build(corpus_n)
        t0 = time.perf_counter()
        base_final_n, _, _ = suffix_ranks(base_n)
        stored_base_build_s = round(time.perf_counter() - t0, 3)
        nb = base_final_n.count()
        delta_build_s, _, _, _ = _timed_build(delta_n)
        t0 = time.perf_counter()
        ins = place_delta_ranks(base_final_n, base_n, delta_n, nb)
        nd = ins.count()  # forces the full bisection chain
        placement_s = round(time.perf_counter() - t0, 3)
        key = f"placement_{n_copies}x_sf0.01"
        out[key] = {
            "positions": nb + nd,
            "n_base_positions": nb,
            "n_delta_positions": nd,
            "placement_rounds": _math.ceil(_math.log2(nb + 1)),
            "rebuild_sec": rebuild_s,
            "stored_base_build_sec_not_in_update": stored_base_build_s,
            "delta_build_sec": delta_build_s,
            "placement_sec": placement_s,
            "update_total_sec": round(delta_build_s + placement_s, 3),
            "winner": (
                "update"
                if delta_build_s + placement_s < rebuild_s
                else "rebuild"
            ),
        }
        print(f"[probe] {key}: {out[key]}")
    spark.stop()
    with open(os.path.join(REPO, "PROBE_XSI.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
