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

Round 15 adds two legs: fold-vs-restore at 30× (r14 ask #4 — after
day-1's delta is placed, folding it into the stored artifact vs
re-storing from a combined rebuild, placed inputs excluded from both
timings since the maintenance flow already holds them) and a 300×
end-to-end point (r14 stretch ask #8 — e2e pair only; the component
story is established at 10-100× and each 300× leg costs minutes). The
e2e pair now also truly alternates within rep 2 (rebuild first), the
same ordering-bias fix the component legs got in r14.

Usage: python tools/probe_xsi.py  (writes PROBE_XSI.json at repo root)
       python tools/probe_xsi.py --scales 100   (re-run a subset of
       placement scales only; skips the sf-decomposition section and
       MERGES the re-run keys into the existing PROBE_XSI.json)

The placement scales run min-of-2 over BOTH paths at up to 100× — far
more live state than any bench rep — so the probe wants a larger
single-JVM heap than the 8g session default (the r14 run OOMed at the
100× rebuild leg under 8g): run with SPARK_DRIVER_MEMORY=48g. This is
a probe-process knob only; bench.py and the driver keep the default.
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scales",
        default=None,
        help="comma-separated placement scales to run (e.g. '100'); "
        "skips the sf decomposition section and merges results into "
        "the existing PROBE_XSI.json instead of overwriting it",
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=2,
        help="repetitions per timed leg (min-of-N, order still "
        "alternating between reps); 2 is the committed protocol, "
        "raise it to tighten a reading that sits inside the "
        "session-noise floor",
    )
    cli = ap.parse_args()
    only = (
        tuple(int(s) for s in cli.scales.split(",")) if cli.scales else None
    )
    n_reps = max(1, cli.reps)
    spark = get_spark(app_name="probe-xsi")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for sf in () if only else ("sf0.001", "sf0.01"):
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

    # ------- round-14 (r13 verdict asks #3 + #8): the PRODUCTION -------
    # ------- stored-base placement measured at 10×/30×/100× -------
    # The rank-ladder placement (operators/suffix.extend_delta_states +
    # place_delta_ranks — no token movement, no per-round driver
    # barriers) replaces the r13 binary-search prototype; this section
    # re-measures the rebuild-vs-update crossover AND, new this round,
    # the END-TO-END incremental spans pipeline (stored base + ladder
    # placement + merged order + boundary-crossing LCP walk =
    # catalog_r14.stored_base_spans) against the rebuild-path spans.
    # MIN-OF-2 per leg with ALTERNATING leg order between reps (the r13
    # ADVICE: the single-shot 3.4% crossover margin sat inside the
    # session-noise floor, and rebuild-first ordering biased it cold).
    # Corpus: N shifted copies of the sf0.01 xsi corpus (bench_scale's
    # construction — ' v{i}' text variation so copies aren't
    # byte-identical), split base/delta by the LOCAL doc id.
    from bench import _release_memo_value
    from idh_etl_demo_spark.catalog import _read_table
    from idh_etl_demo_spark.catalog_r14 import (
        merged_order_from,
        stored_base_spans,
    )
    from idh_etl_demo_spark.operators.suffix import (
        dup_len_per_position,
        extend_delta_states,
        merge_intervals,
        place_delta_ranks,
        suffix_lcp_adjacent,
        suffix_ranks,
    )
    from idh_etl_demo_spark.operators.text import tokens

    XS_T = 50

    def _spans_tail(m_frame):
        iv = (
            m_frame.filter(F.col("m") >= XS_T)
            .select(
                "doc_id",
                F.col("pos").alias("s"),
                (F.col("pos") + F.col("m")).alias("e"),
            )
        )
        return (
            merge_intervals(iv)
            .select(
                "doc_id",
                "span_start",
                "span_end",
                (F.col("span_end") - F.col("span_start"))
                .cast("long")
                .alias("span_len"),
            )
            .orderBy("doc_id", "span_start")
        )

    docs = _read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    xsi = docs.unionByName(
        docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )

    # Per-scale leg plan. 300× is the r14 stretch ask #8 — ONE point
    # past 100× to read whether the e2e update margin widens (placement
    # stays |delta|-width) or the merged-ranking floor caps it; only
    # the e2e pair runs there (the component story is established at
    # 10-100× and each 300× leg costs minutes). The fold-vs-restore
    # pair (r14 ask #4) runs at 30× — the measured break-even scale,
    # where the maintenance decision is live — and at 100×, to read
    # whether the fold's margin WIDENS with the base (restore re-ranks
    # the full corpus per level; the fold's only corpus-width work is
    # the per-level dense re-publication both paths share).
    SCALES = {
        10: {"components": True, "fold": False},
        30: {"components": True, "fold": True},
        100: {"components": True, "fold": True},
        300: {"components": False, "fold": False},
    }
    for n_copies in only or (10, 30, 100, 300):
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
        blens = base_n.select(
            "doc_id", F.size("toks").cast("long").alias("n_tokens")
        )
        maxlen = int(
            corpus_n.agg(F.max(F.size("toks"))).collect()[0][0] or 0
        )

        # stored artifact (NOT in the update cost): the base build PLUS
        # the ladder's comparison artifacts (seed vocab, per-level pair
        # maps/cumsums, top-class frame — all persisted at build time
        # in the 100 TB design, as they materialize mid-round anyway);
        # built once per scale, reused by every update leg in both reps
        from idh_etl_demo_spark.operators.suffix import (
            ladder_artifacts,
            top_class_frame,
        )

        t0 = time.perf_counter()
        cap_n: dict = {}
        bf_n, bh_n, bp_n = suffix_ranks(base_n, capture=cap_n)
        arts_n = ladder_artifacts(bh_n, bp_n, pair_levels=cap_n["pair_levels"])
        bf_top_n = top_class_frame(
            bf_n, bh_n, blens, final_top=cap_n["final_top"]
        ).localCheckpoint(eager=True)
        stored_base_build_s = round(time.perf_counter() - t0, 3)
        nb = bf_n.count()
        bparts = (
            bf_n,
            bh_n,
            bp_n,
            blens,
            arts_n,
            bf_top_n,
            {"npos": cap_n["npos"], "maxlen": cap_n["maxlen"]},
        )

        def _leg_rebuild():
            t0 = time.perf_counter()
            f, h, _p = suffix_ranks(corpus_n)
            s = round(time.perf_counter() - t0, 3)
            _release_memo_value((f, h))
            return s

        def _leg_delta_build():
            t0 = time.perf_counter()
            f, h, _p = suffix_ranks(delta_n)
            s = round(time.perf_counter() - t0, 3)
            n = f.count()  # BEFORE release — the frame is checkpoint-backed
            _release_memo_value((f, h))
            return s, n

        def _leg_placement():
            t0 = time.perf_counter()
            states = extend_delta_states(
                bh_n, bp_n, delta_n, artifacts=arts_n
            )
            ins = place_delta_ranks(
                bf_n,
                bh_n,
                bp_n,
                blens,
                delta_n,
                states=states,
                bf_top=bf_top_n,
            )
            ins.count()
            s = round(time.perf_counter() - t0, 3)
            _release_memo_value([fr for _, fr in states])
            return s

        def _leg_e2e_update():
            t0 = time.perf_counter()
            merged, dparts = merged_order_from(bparts, delta_n)
            spans = stored_base_spans(bparts, dparts, merged, maxlen)
            n = spans.count()
            s = round(time.perf_counter() - t0, 3)
            pdf = spans.toPandas()
            _release_memo_value(
                (merged, dparts[0], dparts[1], [fr for _, fr in dparts[4]])
            )
            return s, n, pdf

        def _leg_e2e_rebuild():
            t0 = time.perf_counter()
            f, h, p = suffix_ranks(corpus_n)
            lens = corpus_n.select(
                "doc_id", F.size("toks").cast("long").alias("n_tokens")
            )
            dloc = F.col("d1") % 10**7
            dloc2 = F.col("d2") % 10**7
            pairs = suffix_lcp_adjacent(
                f,
                h,
                p,
                lens,
                pair_filter=(
                    (dloc % 5 == 4)
                    | (dloc >= 1000000)
                    | (dloc2 % 5 == 4)
                    | (dloc2 >= 1000000)
                ),
            )
            lc = F.col("doc_id") % 10**7
            m_frame = dup_len_per_position(pairs).filter(
                (lc % 5 == 4) | (lc >= 1000000)
            )
            spans = _spans_tail(m_frame)
            n = spans.count()
            s = round(time.perf_counter() - t0, 3)
            pdf = spans.toPandas()
            _release_memo_value((f, h))
            return s, n, pdf

        # ------- fold vs re-store (r14 verdict ask #4), 30× only -------
        # The maintenance decision after day-1's delta is placed: FOLD
        # the placed delta into the stored artifact (fold_xsb_parts —
        # per level two |delta|-width joins + one bucketed dense rank,
        # then the shared artifact constructors) vs RE-STORE from
        # scratch (combined rebuild + the same constructors). The
        # placed inputs (merged order + delta parts) are built ONCE
        # outside the timed region — in the maintenance flow they
        # already exist as day-1's update output. Min-of-2 with
        # alternating leg order, the protocol every crossover leg uses.
        fold_fields = {}
        if SCALES[n_copies]["fold"]:
            from idh_etl_demo_spark.catalog_r14 import fold_xsb_parts

            merged1, dparts1 = merged_order_from(bparts, delta_n)
            merged1.count()

            def _leg_fold():
                t0 = time.perf_counter()
                folded = fold_xsb_parts(bparts, dparts1, merged1)
                folded[0].count()
                s = round(time.perf_counter() - t0, 3)
                f2, h2, _p2, lens2, arts2, top2, _m2 = folded
                _release_memo_value(
                    (
                        f2,
                        [fr for _, fr in h2],
                        lens2,
                        top2,
                        arts2["seed_vocab"],
                        [list(t) for t in arts2["levels"]],
                    )
                )
                return s

            def _leg_restore():
                t0 = time.perf_counter()
                cap: dict = {}
                f, h, p = suffix_ranks(corpus_n, capture=cap)
                lens = corpus_n.select(
                    "doc_id", F.size("toks").cast("long").alias("n_tokens")
                )
                arts = ladder_artifacts(h, p, pair_levels=cap["pair_levels"])
                topf = top_class_frame(
                    f, h, lens, final_top=cap["final_top"]
                ).localCheckpoint(eager=True)
                topf.count()
                s = round(time.perf_counter() - t0, 3)
                _release_memo_value(
                    (
                        f,
                        [fr for _, fr in h],
                        topf,
                        arts["seed_vocab"],
                        [list(t) for t in arts["levels"]],
                    )
                )
                return s

            fold_runs, restore_runs = [], []
            for rep in range(n_reps):
                if rep % 2 == 0:
                    fold_runs.append(_leg_fold())
                    restore_runs.append(_leg_restore())
                else:
                    restore_runs.append(_leg_restore())
                    fold_runs.append(_leg_fold())
            _release_memo_value(
                (
                    merged1,
                    dparts1[0],
                    dparts1[1],
                    [fr for _, fr in dparts1[4]],
                )
            )
            fold_fields = {
                "fold_artifact_sec": min(fold_runs),
                "restore_artifact_sec": min(restore_runs),
                "fold_winner": (
                    "fold"
                    if min(fold_runs) < min(restore_runs)
                    else "restore"
                ),
            }

        legs = {
            "rebuild": [],
            "delta_build": [],
            "placement": [],
            "e2e_update": [],
            "e2e_rebuild": [],
        }
        nd = None
        spans_match = None
        component_legs = (
            ["rebuild", "delta_build", "placement"]
            if SCALES[n_copies]["components"]
            else []
        )
        for rep in range(n_reps):
            order = (
                component_legs + ["e2e_update", "e2e_rebuild"]
                if rep % 2 == 0
                else ["e2e_rebuild", "e2e_update"] + component_legs[::-1]
            )
            rep_spans = {}
            for leg in order:
                if leg == "rebuild":
                    legs[leg].append(_leg_rebuild())
                elif leg == "delta_build":
                    s, nd = _leg_delta_build()
                    legs[leg].append(s)
                elif leg == "placement":
                    legs[leg].append(_leg_placement())
                elif leg == "e2e_update":
                    s, _n, pdf = _leg_e2e_update()
                    legs[leg].append(s)
                    rep_spans["update"] = pdf
                else:
                    s, _n, pdf = _leg_e2e_rebuild()
                    legs[leg].append(s)
                    rep_spans["rebuild"] = pdf
            if rep == 0:
                spans_match = rep_spans["update"].reset_index(
                    drop=True
                ).equals(rep_spans["rebuild"].reset_index(drop=True))

        if nd is None:
            nd = int(
                delta_n.agg(F.sum(F.size("toks"))).collect()[0][0] or 0
            )
        key = f"placement_{n_copies}x_sf0.01"
        out[key] = {
            "positions": nb + nd,
            "n_base_positions": nb,
            "n_delta_positions": nd,
            "ladder_levels": len(bh_n),
            "protocol": f"min-of-{n_reps}, alternating leg order",
            "stored_base_build_sec_not_in_update": stored_base_build_s,
            # the r13 stretch ask #8: the FULL incremental pipeline
            # (stored base + placement + merged order + span
            # extraction) against the rebuild-path spans
            "e2e_update_spans_sec": min(legs["e2e_update"]),
            "e2e_rebuild_spans_sec": min(legs["e2e_rebuild"]),
            "e2e_winner": (
                "update"
                if min(legs["e2e_update"]) < min(legs["e2e_rebuild"])
                else "rebuild"
            ),
            "e2e_spans_identical": bool(spans_match),
            **fold_fields,
        }
        if SCALES[n_copies]["components"]:
            rebuild_s = min(legs["rebuild"])
            delta_build_s = min(legs["delta_build"])
            placement_s = min(legs["placement"])
            out[key].update(
                {
                    "rebuild_sec": rebuild_s,
                    "delta_build_sec": delta_build_s,
                    "placement_sec": placement_s,
                    "update_total_sec": round(
                        delta_build_s + placement_s, 3
                    ),
                    "winner": (
                        "update"
                        if delta_build_s + placement_s < rebuild_s
                        else "rebuild"
                    ),
                }
            )
        print(f"[probe] {key}: {out[key]}")
        _release_memo_value(
            (
                bf_n,
                bh_n,
                base_n,
                delta_n,
                bf_top_n,
                arts_n["seed_vocab"],
                [list(t) for t in arts_n["levels"]],
            )
        )
    spark.stop()
    path = os.path.join(REPO, "PROBE_XSI.json")
    if only and os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        prev.update(out)
        out = prev
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
