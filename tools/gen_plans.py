"""Regenerate PLANS.md — formatted physical plans of flagship queries."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idh_etl_demo_spark.session import get_spark  # noqa: E402
from idh_etl_demo_spark.catalog import ENTRIES
import idh_etl_demo_spark.catalog_llm  # noqa: F401
import idh_etl_demo_spark.catalog_r3  # noqa: F401
import idh_etl_demo_spark.catalog_r4  # noqa: F401
import idh_etl_demo_spark.catalog_r5  # noqa: F401
import idh_etl_demo_spark.catalog_r6  # noqa: F401
import idh_etl_demo_spark.catalog_r7  # noqa: F401
import idh_etl_demo_spark.catalog_r8  # noqa: F401
import idh_etl_demo_spark.catalog_r9  # noqa: F401
import idh_etl_demo_spark.catalog_r9b  # noqa: F401
import idh_etl_demo_spark.catalog_r10  # noqa: F401
import idh_etl_demo_spark.catalog_r11  # noqa: F401
import idh_etl_demo_spark.catalog_r11b  # noqa: F401
import idh_etl_demo_spark.catalog_r11c  # noqa: F401
import idh_etl_demo_spark.catalog_r12  # noqa: F401
import idh_etl_demo_spark.catalog_r13  # noqa: F401
import idh_etl_demo_spark.catalog_r14  # noqa: F401
import idh_etl_demo_spark.catalog_r15  # noqa: F401
import idh_etl_demo_spark.catalog_ztm  # noqa: F401

SF = "/root/testdata/sf0.001"

PICKS = {
    "pricing_summary": "filter + pruning pushed to the parquet scan; partial→final hash agg; AQE",
    "revenue_by_nation": "all four dimension joins planned as BroadcastHashJoin — the fact side never shuffles for a join",
    "ztm_delay_fact": "the five-way star join of the DelayFact builder: five broadcasts incl. the computed weather key",
    "doc_minhash_candidates": "signature projection → single shuffle on band keys → in-bucket pair expansion",
    "revenue_by_nation_scale": "100 TB shape: lineitem pre-aggregated by orderkey BEFORE the joins; agg partitioning reused by the join (only orders/customer shuffle); nation/region broadcast",
    "doc_corpus_curation": "the 4-stage curation composition: quality + exact-dedup verdict tables cached (InMemoryRelation), LSH banding once, status assembly as doc_id joins",
    "doc_simhash60_neardup": "corpus-scale simhash config: one fingerprint projection, one shuffle on (block, value), in-bucket pair expansion",
    "doc_snapshot_dedup": "cross-snapshot dedup: every join keyed on the 16-byte content_hash — bodies never flow past the hash projection; batch-internal min is a map-side-combined agg",
    "doc_incremental_curation": "incremental flagship: base/delta verdict tables cached (InMemoryRelation), ONE checkpointed LSH edge list consumed by three chains (RDD-scan leaves), status assembly as doc_id joins",
    "doc_sequence_packing": "distributed prefix sum: per-shard window + ONE single-partition pass over |shards| subtotals + broadcast offsets join — the corpus never serializes through one partition",
    "doc_oov_rate": "top-K vocab as TakeOrdered + broadcast membership join — the exploded token stream never shuffles for the lookup",
    "doc_gopher_quality": "round-6 rewrite: top-word count as a sorted-array run-length fold — quality gate is a PURE PROJECTION (input spread + presentation sort are the only exchanges)",
    "multimodal_image_ppm": "real PPM decode: payload synthesis and stdlib parse are one map-only ArrowEvalPython/MapInPandas pass — no shuffle before the presentation sort",
    "embedding_int8_quantize": "int8 quantization is a pure JVM array-expression projection — the presentation sort is the plan's ONLY exchange",
    "doc_importance_weights": "DSIR weights: 256-row bucket table broadcasts back onto the token stream — tokens shuffle only into the two aggregates, never as raw text",
    "doc_dsir_sample": "DSIR resampling: the integer cross-multiply acceptance is a projection + filter ON TOP of the weights plan — zero added exchanges",
    "doc_bigram_familiarity": "bigram LM familiarity (round-7 rework): the gram stream collapses into per-doc transition counts on 60-bit long keys BEFORE the LM join — join sides bounded by distinct pairs/transitions; the LM never touches the driver",
    "multimodal_video_avi": "real AVI demux: synthesis + RIFF walk + frame fan-out in one map-only MapInPandas pass — frame bytes never shuffle",
    "embedding_ivf_int8_search": "round-7 trained-quantizer serving: the kcenter→Lloyd chain's |k|·dim-bounded aggs feed a packed-broadcast assignment projection; the probe is a cell-id equi-join over int8 codes",
    "embedding_ivf_multiprobe_search": "nprobe=2 serving: the query side fans out ×2 via a top-n slice of the SAME packed-broadcast distance structs; corpus inverted lists untouched",
    "doc_bpe_merge_steps": "BPE training: ONE corpus-sized word groupBy (exchange-reused by all three iterations); per-round pair aggs and argmax TakeOrdereds run on the |types| table",
    "embedding_semantic_dedup": "SemDeDup shape: the pair join is an equi-join on the trained cluster id — quadratic only within a cell; keeper selection is an integer min agg",
    "embedding_ivfpq_residual_search": "round-9 residual IVFPQ serving: frozen codebook tables (localCheckpoint RDD leaves) feed packed-broadcast cell+code projections; the broadcast |cells|·k² reconstruction table joins on (cell, code1, code2); the per-query top-k window is the only corpus-keyed exchange",
    "doc_bm25_multiquery": "BM25 over a query table: one token explode filtered to the union of query terms, token-partition df window, broadcast query join, per-(query, doc) fold agg, per-query ranking window",
    "embedding_nndescent_round": "NN-descent local join: md5 init draws as a projection over the broadcast max-id row; id-keyed vector joins score init edges; the U-list self-join on the shared-neighbor key generates the N·(2K)² candidate stream; per-node top-K windows — no N² product anywhere",
    "embedding_prototype_pruning": "prototype pruning: assignment + distance to the frozen trained centroids is a packed-broadcast argmin PROJECTION (checkpointed 4-row RDD leaf); only (vec_id, cluster, dist2) rows enter the per-cluster ranking window",
    "embedding_d4_curation": "D4 composition: SemDeDup's within-cell pair equi-join + the survivor ranking window over id-width rows, both serving from ONE frozen quantizer — the composition adds no exchange the halves didn't pay",
    "doc_unimax_allocation": "UniMax waterfill: one map-side-combined lang count, then every analytic window shares a single |languages|-row SinglePartition exchange — the closed form never moves corpus rows",
    "doc_leakage_safe_split": "leakage-safe split: the checkpointed near-dup component table joins the corpus id stream by doc_id; split labels are a map-side md5 projection of the cluster id; document bodies never shuffle",
    "doc_bm25_mmr": "MMR serving plan: the shortlist, token sets, Jaccard pairs, and per-step selections are frozen localCheckpoint scans (greedy unroll runs at build over broadcast joins) — the served plan is a 5-node scan + presentation sort; the corpus chain appears ZERO times",
    "embedding_matryoshka_rerank": "funnel retrieval: the prefix-16 scan ranks via ONE per-query window; the |Q|·25 shortlist broadcasts back onto the corpus vector stream for the exact-64 stage — corpus vectors never shuffle",
    "events_kmv_set_ops": "KMV set ops: member distinct + hash distinct collapse the corpus to 8-byte digests; two-phase bottom-k windows ((type, bucket) then type) bound the final sort at k·buckets rows; everything past the sketches is |types|²·k-sized on broadcasts",
    "doc_suffix_dup_audit": "SA-adjacency duplication: the prefix-doubled suffix array is a frozen checkpoint scan; gh8 hashes join it id-keyed, the sa_rank±1 neighbor joins carry 16-byte hashes — document text appears in ONE scan and never shuffles",
    "orders_zorder_layout": "Z-order layout stats: 1-row extrema agg broadcast onto the scan, the 32-term Morton interleave as a pure projection, two 64-key map-side-combined groupBys (exchange-reused scan) + presentation sort",
    "doc_exact_substr_spans": "ExactSubstr removal spans: the Manber-Myers LCP walk joins id-width pair rows against FROZEN checkpointed rank tables (log(max_len)+1 levels), per-position max agg, sparse >=50 filter, then the two per-doc gaps-and-islands windows — token arrays never shuffle",
    "doc_exact_substr_cleaned": "ExactSubstr cleaned corpus: the coverage verdict is ONE per-doc running-max window over the (doc, pos)-joined m frame — never a position-by-interval range join; the per-doc kept-token reassembly groupBy is the plan's only token-bearing shuffle and IS the output",
    "doc_kn_surprisal_rate": "held-out KN scoring: train-side count tables (three map-side-combined groupBys + 1-row discount agg) join the held-out bigram stream word-keyed; the probability is a pure projection of exact int64 rationals; per-doc summary is one groupBy",
    "doc_kn_trigram_lm": "recursive trigram KN: ONE corpus-sized trigram-type groupBy; ctx/continuation/discount rollups and the four LM joins are all bounded by distinct n-gram types; top-100 as TakeOrdered",
    "embedding_hard_negatives": "hard-negative mining: queries broadcast onto an embarrassingly parallel corpus scan; the positive-band exclusion count rides the SAME per-query window partition as the ranking — no second corpus pass",
    "doc_setsim_prefix_join": "prefix-filtered SSJoin: df groupBy + per-doc prefix window over id+hash rows; candidates expand inside rarest-shingle buckets (group-then-expand); verification joins are candidate-pair-sized; full sets never shuffle",
    "customer_scd2_history": "SCD2 build: lag (change detection), lead (interval close) and row_number all share ONE (custkey)-partitioned sort — a single id-width exchange, zero joins",
    "orders_cdc_apply": "CDC apply: last-writer-wins ranking and both audit counts share one key-partitioned window; the changelog never joins a snapshot because the full-log winner IS the snapshot",
    "doc_title_edit_neardup": "Ed-Join title near-dup: df groupBy + per-doc 25-rarest prefix window; the candidate self-join expands on a round-robin-spread probe side (parallelism survives a one-split scan); verification is ONE banded levenshtein per pair with zero fan-out — the gram stream never expands per candidate",
    "doc_bigram_heavy_hitters": "Misra-Gries heavy hitters: the bigram stream crosses ONE exchange (the candidate-filtered count groupBy); the MG kernel is a mapInPandas projection and the survivor union + 1-row total ride as broadcasts — the full vocabulary never shuffles",
    "events_user_ewma": "sequential EWMA fold: one user-keyed groupBy collects per-user (ts,id,value) arrays; the alpha=0.5 fold and last-value extraction are array projections — nothing after the groupBy exceeds |users| rows",
    "events_rolling_zscore": "rolling z-score: ONE user-partitioned sort serves count/sum/sumsq over the constant 7-row frame; the z identity is an exact-int64 projection with a single sqrt+division — state per task is constant at any corpus size",
    "doc_title_edit_entropy": "the Ed-Join kernel in its PRUNING regime: title synthesis is doc_id-arithmetic projection (text never read); the 64^3-value gram space keeps rarest-prefix buckets near-singleton, so the spread candidate join emits ~planted pairs and verification is |candidates| banded DPs",
    "doc_containment_split_audit": "containment audit on the split corpus: three union branches of one scan derive parent+pieces map-only; the shared rank-window lineage feeds the pruned prefix⋈full join where the LENGTH/POSITIONAL bounds cut ~1/3 of slots (slot_reduction 0.66) before the distinct",
    "doc_sa_placement_merged": "stored-base merged order, served: the heavy work (base+delta builds, ladder extension, placement, ONE bucketed merge ranking) freezes into an eager checkpoint at build — the served digest plan is one per-doc map-side-combined groupBy over id-width merged-rank rows + the presentation sort",
    "doc_exact_substr_stored_base": "the stored-base update path: merged rank±1 adjacency joins feed TWO |delta|-width LCP walks — the delta-only build's log(max_len) refinement chain and the mixed ladder walk (repeat-top + descend joins against checkpointed state/rank tables) — then the m(p) groupBy and the per-doc gaps-and-islands windows; base-only pairs and token arrays never enter any exchange",
    "doc_exact_substr_fold": "day-2 spans through the FOLDED artifact: day-1's fold (per level two |delta|-width joins + ONE bucketed dense rank) and the re-derived comparison artifacts freeze into eager checkpoints at build, so the served plan is the stored-base walk shape against base+day-1 — |delta2|-width joins, no rebuild stage anywhere",
    "doc_exact_substr_tombstone": "deletions via tombstones: the stored artifact is untouched — one filter on the final order inside the merge union, the surviving re-rank renumbers adjacency, and the span walk inherits the skip; otherwise the stored-base spans plan verbatim",
    "doc_setsim_split_audit": "the setsim prefix filter doing real pruning: three union branches derive parent+pieces map-only, the rarest-prefix window runs over df≥2 postings (heavy-tailed sizes), candidate expansion + verify join + closed-form slot aggregates — the base audit's plan with the split corpus's two extra scan branches",
}


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence for the flagship queries",
        "",
        "Regenerate with `python tools/gen_plans.py`. Guarded mechanically by",
        "tests/test_plan_shape.py; this file is the human-readable snapshot.",
        "",
    ]
    max_lines = 250
    for name, why in PICKS.items():
        plan = formatted(ENTRIES[name].spark(spark, SF))
        phys = plan.split("\n\n")[0]
        lines = phys.splitlines()
        if len(lines) > max_lines:
            # the static print re-expands each cached subtree once per
            # consumer; the full dump is noise, the prefix is the shape
            phys = "\n".join(lines[:max_lines]) + (
                f"\n... [truncated: {len(lines)} printed lines; cached"
                " subtrees re-expand per consumer in static explain —"
                " the DEDUPED exchange count is what"
                " tests/test_plan_shape.py budgets]"
            )
        out.append(f"## {name}\n\n*{why}*\n\n```\n{phys}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
