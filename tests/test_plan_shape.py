"""Physical-plan shape assertions — the scale guarantees, checked
mechanically so a refactor can't silently regress them:

- filters/column pruning reach the parquet scan (PushedFilters/ReadSchema);
- dimension joins are broadcast (no fact-side shuffle for joins);
- the merge sink's anti join only scans the target's key columns.
"""

from __future__ import annotations

import pytest

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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown(spark):
    df = ENTRIES["pricing_summary"].spark(spark, SF)
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 5 needed columns are read, not all 11
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    for col in ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]:
        assert col in read
    for col in ["l_partkey", "l_suppkey", "l_tax", "l_comment"]:
        assert col not in read


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(ENTRIES["revenue_by_nation"].spark(spark, SF))
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan


def test_delay_fact_broadcasts_all_five_dims(spark):
    plan = _plan(ENTRIES["ztm_delay_fact"].spark(spark, SF))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_json_filter_prunes_columns(spark):
    plan = _formatted(ENTRIES["json_extract_filter"].spark(spark, SF))
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "value" not in read and "user_id" not in read


def test_merge_scans_only_target_keys(spark, tmp_path):
    from idh_etl_demo_spark.operators.merge import merge_insert_if_absent

    target = str(tmp_path / "t")
    wide = spark.createDataFrame(
        [(1, "a", 1.0, "x"), (2, "b", 2.0, "y")], "id int, v string, d double, e string"
    )
    merge_insert_if_absent(spark, wide, target, ["id"])
    # second merge: the anti-join probe of the existing target must read
    # only the key column from parquet
    batch = spark.createDataFrame([(3, "c", 3.0, "z")], "id int, v string, d double, e string")
    existing_keys = spark.read.parquet(target).select("id")
    anti = batch.join(existing_keys, "id", "left_anti")
    plan = _formatted(anti)
    read = plan[plan.rindex("ReadSchema") :].splitlines()[0]
    assert "struct<id:int>" in read, f"target scan reads more than keys: {read}"



# per-entry shuffle budgets: tight upper bounds that catch a regression
# where a broadcast silently degrades to a shuffle join or a projection
# starts re-shuffling. Entries not listed get the default.
#
# The count is DISTINCT shuffle exchanges in the plan tree (hash / range /
# round-robin / single-partition), deduplicated two ways so it matches what
# actually executes:
#   - each cached subtree (InMemoryTableScan) is walked ONCE — at runtime a
#     persisted frame is computed once and served from cache, but the plan
#     STRING prints its child plan once per consumer (doc_incremental_
#     curation printed 238 exchanges that way for 17 real ones);
#   - exchanges are deduplicated by semantic hash — Spark's exchange reuse
#     (spark.sql.exchangeReuseEnabled, on by default) executes semantically
#     equal exchanges once and wires the rest as ReusedExchange (the seeded
#     kmeans plan repeats one corpus repartition subtree 32×; it runs once).
# The previous string-scan counter got BOTH wrong: it double-counted cache
# reprints and silently UNDER-counted large plans (toString truncates at
# spark.sql.maxPlanStringLength), and it missed RoundRobinPartitioning
# (plain .repartition(n)) entirely.
# BroadcastExchange is deliberately excluded — broadcasts are the cheap
# path we *want*, and counting them would penalize broadcast-heavy plans.
SHUFFLE_BUDGET_DEFAULT = 4


def _distinct_shuffle_count(df) -> int:
    """Distinct shuffle exchanges that would execute for this plan: tree
    walk over the executed plan, entering each cached subtree once and
    deduplicating exchanges by semantic hash (mirrors runtime exchange
    reuse). AQE plans are entered through initialPlan()."""
    jvm = df.sparkSession._jvm
    seen_caches: set[int] = set()
    seen_exchanges: set[int] = set()

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name.startswith("ReusedExchange"):
            return
        if name.startswith("ShuffleExchange"):
            seen_exchanges.add(node.canonicalized().hashCode())
        if name.startswith("InMemoryTableScan"):
            cached = node.relation().cacheBuilder().cachedPlan()
            key = jvm.java.lang.System.identityHashCode(cached)
            if key not in seen_caches:
                seen_caches.add(key)
                walk(cached)
            return
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))
        try:
            subqueries = node.subqueries()
            for i in range(subqueries.size()):
                walk(subqueries.apply(i))
        except Exception:
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return len(seen_exchanges)


SHUFFLE_BUDGETS = {
    # band groupBy + pair expand + dedup + the input round-robin spread
    "doc_minhash_candidates": 4,
    # shingle groupBy + pair agg + ordering + input spread
    "doc_ngram_jaccard": 4,
    "user_sessions": 2,
    "purchase_view_attribution": 2,
    # ztm_line_dim: two mode-rollup chains (groupBy trip[,stop] → groupBy
    # (route,stat) → route window) + final ordering. Each shuffle after the
    # first in a chain carries partially-AGGREGATED rows (map-side combine),
    # so the byte volume shrinks stage over stage — collapsing the chain
    # into one early repartition would move MORE data at 100 TB, not less.
    "ztm_line_dim": 10,
    "ztm_delay_fact": 5,           # derived dims computed inline at test SF
    "ztm_weather_dim": 2,          # two dedup windows share a partitioning
    "rollup_revenue": 2,
    "small_quantity_revenue": 3,
    "supplier_distinct_parts": 3,
    "orders_status_pivot": 3,
    # round-robin input spread + final ordering ONLY: the round-6 gopher
    # rewrite computes the top-word count as a sorted-array run-length
    # fold (pure projection), so the old word-freq agg + bigram agg +
    # doc_id joins are gone from the plan entirely (5 -> 2)
    "doc_gopher_quality": 2,
    "doc_decontamination": 5,      # two shingle pipelines + probe join
    "doc_ngram_novelty": 5,        # corpus n-gram agg + novelty join chain
    # two unrolled Lloyd iterations. Assignment is a PURE PROJECTION
    # (centroids packed into one broadcast row, argmin via array_min) —
    # zero corpus-side exchanges per iteration; the counted shuffles are
    # the tiny SinglePartition centroid-pack aggs, the (cluster,dim)
    # update aggs, the centroid array rebuilds (×2 rounds), the
    # cluster-size window, and the final sort. Every one carries
    # |clusters|·dim-bounded rows; the corpus never shuffles. (The count
    # rose 7→11 with the honest counter: the old string scan missed the
    # round-robin input spreads and truncated the plan string.)
    "embedding_kmeans_2iter": 11,
    # frozen-source retrofit (round 9, catalog_r3._KM_MODELS): the
    # Lloyd training chain runs ONCE at freeze time, so the SERVED plan
    # is input spread + the cluster-size window + ordering over the
    # 4-row checkpoint scan (the kcenter seed chain never shuffled —
    # TakeOrderedAndProject top-1s + broadcast joins only)
    "embedding_kmeans_seeded": 4,
    # round-6 audited breakdown of 5: quality+hash scan round-robin
    # spread 1 (the gopher rewrite removed its two aggs and the chq
    # join rode into the same scan via the extra= hook), exact-dedup
    # keeper groupBy 1 + keeper join 1, status assembly join 1, final
    # orderBy 1. The CC fixpoint's per-round shuffles happen inside the
    # operator's checkpointed loop and are not part of this static
    # plan. (11 in round 5; the gopher fold + one-scan fusion cut it.)
    "doc_corpus_curation": 5,
    # INCREMENTAL curation — the round-6 audited breakdown of 13 (was
    # 17 in round 5; the gopher fold, the one-scan quality+hash fusion,
    # and the fused base/delta keeper agg cut it):
    #   quality+hash scan 1 (round-robin spread; verdicts and content
    #     hash ride ONE pass via _gopher_frame's extra= hook),
    #   LSH input spread 1 (the candidate pass's round-robin),
    #   fused keeper agg 2 (one groupBy(content_hash) with two
    #     conditional mins for BOTH chains + the survivor join),
    #   base status assembly 3 (exact-surv join, neard join, persist
    #     boundary exchanges around bstatus),
    #   delta chain 5 (dbase_hit probe distinct + bkeepers semi-join,
    #     dneard distinct, delta status assembly joins),
    #   final orderBy 1 (range).
    # The single shared CC fixpoint (base+delta edges on disjoint node
    # sets) and the one LSH candidate pass run inside checkpointed
    # build-time loops (exempt below) and are NOT in this static plan;
    # the checkpoint scan is an RDD leaf. Every counted exchange past
    # the quality scan carries doc_id/hash-width rows — document bodies
    # never shuffle.
    "doc_incremental_curation": 13,
    # three user-keyed aggregates (first week, distinct weeks, cohort
    # sizes) + the cells aggregate + two joins + ordering; every shuffle
    # carries aggregated rows, volume bounded by |users| then |weeks|^2
    "user_weekly_retention": 6,
    # division rewrite: distinct over the pair set, the per-supplier
    # count agg, and ordering — pair volume bounded by |suppliers|x|types|
    "suppliers_full_type_coverage": 6,
    # audit runs BOTH the candidate generator and the shingle-join truth
    # side, then intersect + three count aggregates; every stage is the
    # already-audited LSH/jaccard shape, and the final counts are scalars
    "doc_lsh_audit": 11,
    # same audit shape on the embeddings side: brute topk + ANN topk
    # (both already budget-audited as standalone entries) + intersect
    "embedding_ann_audit": 10,
    # IVF on the TRAINED quantizer, frozen-source retrofit: training
    # left the plan (runs once at freeze time), so the SERVED shape is
    # the corpus input spread + the probe join exchange + the per-query
    # topk window + presentation sort + the checkpoint scan spread;
    # assignment stays a packed-broadcast projection
    "embedding_ann_ivf": 5,
    # round-6: quantization is a MAP-ONLY projection — the single
    # exchange is the presentation range sort; a second exchange
    # appearing here means the quantizer grew a shuffle it must not
    # have at 100 TB
    "embedding_int8_quantize": 1,
    # round-6 quantized-serving audit: truth side = cosine_topk's plan
    # (input spread + topk window), approx side = int8 topk window,
    # intersect + per-query truth/hit aggs + join + ordering — same
    # audit shape as embedding_ann_audit (10), one less because the
    # approx side has no bucket agg
    "embedding_int8_ann_recall": 9,
    # round-6 DSIR weights: bucket-table agg (broadcasts back), per-doc
    # agg, presentation sort — the token stream shuffles only into the
    # two aggregates, never as raw text
    "doc_importance_weights": 3,
    # round-6 bloom decontamination: the exact entry's 5 (two shingle
    # input spreads, bench distinct, per-doc hit agg, ordering + join)
    # plus the THREE bloom-build exchanges — the word-mask bit_or agg
    # and the SinglePartition bitmap pack, both bounded by m/32 = 2048
    # rows, plus the assembly join's exchange. The corpus side gains
    # ZERO shuffles for the membership test (one-row scalar broadcast)
    "doc_decontamination_bloom": 8,
    # round-6 relational CMS: token input spread, the d·w-bounded
    # counter groupBy (shared via exchange reuse by the exact-truth
    # freq agg), and the final TakeOrdered/estimate assembly — the
    # estimate lookups ride a ≤ d·w-row broadcast
    "doc_cms_word_counts": 3,
    # round-6 content-defined chunking: input spread + presentation
    # sort only — boundary detection and chunk hashing are per-row
    # array expressions, the explode is partition-local
    "doc_cdc_chunks": 2,
    # round-6 shared-passage discovery: CDC input spread + the
    # chunk-hash groupBy (with count_distinct expand) + presentation
    # sort — (hash, len) pairs shuffle, never passage text
    "doc_shared_passages": 4,
    # round-6 DSIR resampling: EXACTLY the weights entry's 3 — the
    # sampling decision is a projection + filter and must add ZERO
    # exchanges (a 4th appearing here means the selection grew a
    # shuffle it cannot have at 100 TB)
    "doc_dsir_sample": 3,
    # round-6 MinHash estimator audit: input spread, the candidate
    # generator's band-key exchanges, and the id_a/id_b joins that pull
    # signatures + shingle sets onto the |candidates|-bounded pair list
    # — never all-pairs; shingle arrays shuffle only into the audit
    # joins
    "doc_minhash_estimate_audit": 7,
    # IVF+int8 serving, frozen-source retrofit: the served shape is
    # the corpus spread + the assignment↔codes vec_id join + the
    # cell-id probe/topk pair — same count as the float entry because
    # the codes join rides exchange reuse with the probe side; queries
    # broadcast, corpus never re-shuffles for the probe
    "embedding_ivf_int8_search": 5,
    # round-7 multi-probe serving (nprobe=2), frozen-source retrofit:
    # the int8 entry's 5 + the query-side topn cell fan-out join's
    # exchange — all on the |queries|·nprobe side; the corpus inverted
    # lists are untouched
    "embedding_ivf_multiprobe_search": 6,
    # round-7 nprobe cost/recall audit, frozen-source retrofit: ONE
    # shared multi-probe scored frame (the 6 above) + cosine-topk truth
    # (input spread + topk window) + per-depth hit/candidate aggs and
    # the assembly joins — the same audited audit shape as
    # embedding_int8_ann_recall, one scored pass for both depths
    "embedding_ivf_nprobe_audit": 14,
    # round-7 SemDeDup, frozen-source retrofit: corpus spread + the
    # cluster-id pair join exchange + the keeper-min agg + ordering;
    # the dup verdict join rides exchange reuse — pairs exist only
    # within trained cells, never corpus-wide
    "embedding_semantic_dedup": 6,
    # round-7 CCNet split: the reworked familiarity chain's 8 + the
    # global ntile window (deliberate single-partition sort over the
    # per-doc SCORE table, the customer_revenue_pareto shape)
    "doc_ccnet_buckets": 9,
    # round-7 quality-stratified sampling: EXACTLY the buckets entry's
    # 9 — the per-bucket hash-acceptance is a projection + filter and
    # must add ZERO exchanges (the doc_dsir_sample contract)
    "doc_bucket_quality_sample": 9,
    # round-7 perceptual image hash: synthesis + decode + hash are one
    # map-only Arrow pass; the two exchanges are the ahash group-size
    # window (12-bit-hash-keyed pairs) and the presentation sort —
    # raster bytes must never shuffle
    "multimodal_image_ahash": 2,
    # round-7 audio fingerprint: same shape as the image aHash — one
    # map-only Arrow decode pass, fingerprint window + sort only
    "multimodal_audio_fingerprint": 2,
    # round-7 video fingerprint: map-only demux fan-out + the media_id
    # clip aggregate + fingerprint window + sort — only (id, hash)
    # pairs shuffle, never frame bytes
    "multimodal_video_fingerprint": 3,
    # round-7 passage decontamination: the CDC input spread + the two
    # per-doc aggregates + the assembly joins' exchanges — the bench
    # hash set BROADCASTS (semi-join), so the corpus gains no shuffle
    # for membership; only 16-byte hashes flow. +1 in round 8: the
    # size-gated membership rework chunks the bench split from its own
    # filtered scan (so the gating count job re-chunks only the 1/11
    # split), which adds the bench side's own input spread
    "doc_decontamination_passages": 6,
    # round-7 BPE training: ONE corpus-sized word groupBy (shared by
    # all three iterations via exchange reuse) + the three per-round
    # pair-count aggs — everything after the word agg carries |types|
    # rows; the per-round argmax is a TakeOrdered (no sort shuffle) and
    # the merge application is a broadcast-join projection
    "doc_bpe_merge_steps": 4,
    # the merge-steps chain + the final per-word presentation sort
    "doc_bpe_segmentation": 5,
    # round-7 tokenizer application: the training chain's 4 + the
    # corpus word-stream spread, the per-doc agg, the doc_id assembly
    # join exchange, presentation sort — the segmentation table itself
    # BROADCASTS (|types| rows), the corpus never shuffles for the join
    "doc_bpe_token_counts": 8,
    # round-6 REAL AVI demux: map-only synthesis + demux fan-out —
    # the single exchange is the presentation range sort; frame bytes
    # must never shuffle
    "multimodal_video_avi": 1,
    # round-7 rework (the r6 2.3× probe watch item): input spread, the
    # (doc_id, gh) pair-collapse agg, the gh LM agg, the pair-side gh
    # join exchange, the per-doc agg, the doc_id assembly join's two
    # exchanges, presentation sort. Two more than r6's 6 — but every
    # exchange past the collapse carries DISTINCT (doc, transition)
    # pairs on 60-bit long keys, not the raw string gram stream, which
    # is what moved the 10× probe 2.5× → ~1.5-1.8×
    "doc_bigram_familiarity": 8,
    # round-8 PQ codebooks, frozen-model retrofit (round 9): the
    # trained tables are localCheckpoint'd, so the SERVED plan is the
    # posexplode/union over two 4-row checkpoint scans + the ONE
    # presentation sort. A second exchange means codebook emission
    # grew a shuffle it cannot need
    "embedding_pq_codebooks": 1,
    # PQ-ADC search, frozen-model retrofit: corpus encode spread + the
    # per-query top-k window + presentation sort + checkpoint-scan
    # spreads; the training chains left the plan (they run once per
    # session at freeze time). Codes still join the broadcast |Q|·k²
    # score table with no corpus shuffle
    "embedding_pq_search": 8,
    # IVFPQ, frozen-model retrofit: pq_search's served shape + the
    # frozen coarse-cell scan; the serving join stays broadcast
    # (cell+code equi-join), adding ZERO corpus exchanges beyond the
    # ranking window
    "embedding_ivfpq_search": 9,
    # BM25: input spread, query-term tf groupBy, token-partition df
    # window (reuses the tf partitioning's exchange output shape),
    # per-doc fold agg, global top-20 sort. Everything after the tf
    # groupBy carries |matched docs|·|query terms| rows at most
    "doc_bm25_topk": 6,
    # contamination fraction: bench + corpus input spreads, the bench
    # gram distinct, the per-doc (doc_id, n_grams) hit agg,
    # presentation sort — same family shape as doc_decontamination
    # (gram hashes broadcast; corpus text never shuffles)
    "doc_contamination_fraction": 5,
    # round-8 PQ recall audit (budgeted round 9 — the r8 checklist
    # breach — then tightened by the frozen-model retrofit): the
    # approx side is pq_search's SERVED plan (encode spread + topk
    # window), the truth side is cosine_topk's audited plan (input
    # spread + topk window), then the audit tail shared with the
    # int8/nprobe audits: intersect, per-query truth/hit aggs, join,
    # ordering. All but the corpus spreads and the two top-k windows
    # are |Q|-bounded; the brute truth side is the cost every recall
    # audit pays by design on a SAMPLED query set
    "embedding_pq_recall_audit": 13,
    # round-9 residual IVFPQ: training is FROZEN (localCheckpoint'd
    # 4-row codebooks — see catalog_r9._RES_MODELS; the entries are in
    # EAGER_EXEMPT), so the SERVED plan is just: corpus encode spread,
    # the residual-projection broadcast join's spread, the per-query
    # top-k window, presentation sort + the checkpoint scan spreads.
    # A count above this means serving grew a corpus shuffle it must
    # not have at 100 TB
    "embedding_ivfpq_residual_search": 9,
    # multiprobe: identical serving plan — only the broadcast query
    # side fans out ×nprobe, which adds ZERO corpus exchanges
    "embedding_ivfpq_multiprobe": 9,
    # nprobe audit: the multiprobe serving plan + the brute-force truth
    # side (input spread + topk window) + probes union + per-nprobe
    # aggs + ordering; everything past the two corpus sides is
    # |probes|-bounded
    "embedding_ivfpq_nprobe_audit": 15,
    # residual recall audit: composes THREE corpus-side plans by audit
    # design — round-8's plain IVFPQ (frozen-model served shape ~9),
    # the frozen-model residual serving (~9), and the brute truth side
    # — plus the intersect/agg/join audit tail. Every exchange past
    # the corpus spreads and topk windows is |Q|-bounded
    "embedding_ivfpq_residual_recall_audit": 22,
    # exact-substring spans: input spread, the ONE gh-partition window
    # (duplication marking without an agg+join round trip), the doc_id
    # islands window over the ≥2-occurrence subset, spans/per-doc aggs
    # + presentation sort share remaining exchanges; only (doc_id,
    # start, 16-byte gh) rows ever shuffle, never text
    "doc_duplicated_spans": 4,
    # two-stage rerank: the residual serving plan's exchanges + the
    # ADC shortlist window + the exact stage's |Q|·R-row broadcast
    # joins onto the two vector streams (their input spreads) +
    # presentation sort; the exact stage adds NO corpus-keyed exchange
    "embedding_ivfpq_rerank": 11,
    # ADC-LUT serving: same frozen-model serving plan as the residual
    # search (the LUT formulation changes per-candidate WORK — 2m map
    # lookups instead of the code equi-join against k^m combos — not
    # the exchange structure)
    "embedding_ivfpq_adc_lut": 9,
    # BM25 multiquery: doc_bm25_topk's shape (input spread, tf groupBy,
    # token-partition df window, fold agg) + the per-(query, doc) agg
    # and per-query ranking window replacing the global sort; the
    # query-table join is broadcast, adding no exchange
    "doc_bm25_multiquery": 8,
    # leakage-safe split: the LSH/CC stages run inside the fixpoint's
    # checkpointed loop (EAGER_EXEMPT, same as doc_dup_clusters), so
    # the static plan is the doc_id join of the checkpointed component
    # table onto the corpus id stream, the cluster-size window, and
    # the presentation sort — id-width rows only, never text (the
    # fourth exchange is the corpus id-stream spread)
    "doc_leakage_safe_split": 4,
    # split-leakage audit: the same served assignment join + the two
    # pair↔split joins (doc_id, 2 small ints per row) + the one-row
    # final agg; the candidate pair list is |candidates|-bounded by
    # the banding equi-join, never all-pairs
    "doc_split_leakage_audit": 7,
    # prototype pruning: assignment + distance is the packed-broadcast
    # argmin PROJECTION (zero corpus shuffles — the frozen trained
    # centroids are a checkpointed 4-row table), so the four exchanges
    # are the corpus spread, the per-cluster ranking window's
    # hashpartitioning, its count-window twin, and the presentation
    # sort — all over (vec_id, cluster, dist2) id-width rows
    "embedding_prototype_pruning": 4,
    # UniMax waterfill: the lang-count groupBy (map-side combined) and
    # the SinglePartition exchange every |languages|-row analytic
    # window shares — the presentation sort rides the same single
    # partition; nothing corpus-sized moves after the count pass
    "doc_unimax_allocation": 2,
    # NN-descent round: corpus spread + max-id agg, the init-edge
    # distinct, the two id-keyed vector joins scoring init edges, the
    # per-node init top-K window, the U-list distinct, the local join's
    # v-keyed exchange, the candidate distinct, the two vector joins
    # scoring candidates, the refresh top-K window, presentation sort.
    # Everything is id-keyed and N·K²-bounded — the paper's local-join
    # cost — never an N² corpus product
    "embedding_nndescent_round": 11,
    # NN-descent recall audit: the round's full two-phase chain (above)
    # + the brute truth side (corpus spread + per-query top-K window,
    # |Q|·N by audit design on the sampled queries) + the tag-unioned
    # hits join, the per-phase count aggs, the one-row possible agg and
    # the 2-row presentation sort — all |Q|- or |phases|-bounded past
    # the graph chain and truth window
    "embedding_nndescent_recall_audit": 26,
    # D4: the SemDeDup half's exchanges (corpus spread, the
    # within-cell pair agg) + the survivor ranking window's
    # hashpartitioning, its count-window twin, the two id-keyed
    # back-joins and presentation sort — the distance side is the
    # packed-broadcast projection (zero corpus exchanges), so the
    # composition adds only id-width-row exchanges over the halves
    "embedding_d4_curation": 8,
    # winnowing: input spread, the per-doc window-min's doc_id
    # hashpartitioning (the fingerprint distinct reuses its shape),
    # the corpus-occupancy window on the fingerprint key, presentation
    # sort — text never shuffles past the gram projection; only
    # (doc_id, pos, 8-byte gh) rows move
    "doc_winnow_fingerprints": 4,
    # MMR: the BM25 shortlist, candidate tokens, Jaccard pair table,
    # AND the per-step selected set are all frozen with localCheckpoint
    # (the greedy steps run at build — EAGER_EXEMPT), so the SERVED
    # plan is one checkpointed ≤|Q|·K-row scan + the presentation
    # sort: 1 exchange, under the default budget — kept explicit so
    # a regression to the lazy-union plan (12 exchanges measured)
    # trips this line
    "doc_bm25_mmr": 2,
    # KMV set ops (measured 15): corpus-side are the member distinct
    # (+ round-robin input spread), the hash distinct, the two-phase
    # bottom-k windows ((type, bucket) then type — phase 2's input is
    # k·buckets rows however large the corpus), the per-type count agg,
    # and the exact-audit self-join on (user, day) (2 sides + pair agg)
    # — the audit columns that swap out at 100 TB per the docstring.
    # Everything after the sketches (merge, rank, estimators) is
    # |types|²·k-sized and rides broadcasts; the tail is the
    # presentation sort.
    "events_kmv_set_ops": 15,
    # SA-adjacency duplication audit (measured 7): the suffix array is
    # a frozen checkpoint scan (the doubling rounds' shuffles run at
    # build, each round localCheckpointed — EAGER_EXEMPT); the SERVED
    # plan pays the gh8 projection's input spread, the (doc_id, pos)
    # join of the array onto the gram hashes, the two sa_rank±1
    # neighbor joins (id-width rows + 16-byte hashes — text never
    # shuffles), the per-doc count agg, and the presentation sort
    "doc_suffix_dup_audit": 7,
    # Z-order layout stats (measured 7): the input spread + the 1-row
    # extrema agg (SinglePartition pack, broadcast back), then each of
    # the two layouts pays one 64-key map-side-combined groupBy; the
    # union's branches re-derive the keyed projection from the same
    # scan (exchange-reused at runtime), and the tail is the
    # presentation sort. Nothing is keyed wider than 64 buckets.
    "orders_zorder_layout": 7,
    # integer PageRank (served plan measured 6): the pair chain
    # (fingerprint projection + one (block, value) bucket shuffle +
    # pair dedup — doc_simhash60_neardup's audited shape) runs at
    # BUILD time and is frozen per (session, sf) via _SIM60_PAIRS
    # (EAGER_EXEMPT), so the served plan is the degree agg over the
    # checkpointed pair scan, per unrolled iteration one edge→rank
    # equi-join + one dst groupBy (the Pregel step, ranks accumulated
    # as columns — no end-of-loop re-joins), and the presentation
    # sort. Every exchange carries id-width rows.
    "doc_dup_pagerank": 6,
    # longest-dup-run (measured 25): the Manber–Myers LCP walk is
    # log(max_len)+1 = 8 refinement joins of the |pairs| id-row frame
    # against the CHECKPOINTED doubling-level tables (each join pays
    # the pair-side exchange on its computed (doc, pos+acc) key; the
    # checkpointed level sides ride their own single exchange each),
    # plus the adjacent-pair self-join on sa_rank, the per-doc max
    # agg, and the presentation sort. Depth is log-bounded by MAX DOC
    # LENGTH — at 100 TB the count stays 8 while every join remains
    # id-width; suffixes and token arrays never shuffle.
    "doc_longest_dup_run": 25,
    # ExactSubstr removal spans (measured 25): the same Manber–Myers
    # LCP walk as doc_longest_dup_run (log(max_len)+1 = 8 id-width
    # refinement joins against checkpointed level tables + the
    # adjacent-pair self-join), then the per-position max groupBy, the
    # sparse threshold filter, the two gaps-and-islands windows (both
    # per-doc partitions), the merge groupBy and presentation sort.
    # Depth is log-bounded by max DOC length — corpus-size-invariant.
    "doc_exact_substr_spans": 25,
    # cleaned corpus (measured 28): spans' walk + m-frame, plus the
    # token-stream join on (doc_id, pos), the per-doc coverage window,
    # and the per-doc kept-token reassembly groupBy — the one
    # token-bearing shuffle, which IS the output.
    "doc_exact_substr_cleaned": 28,
    # Kneser-Ney bigram LM (measured 8): three map-side-combined count
    # groupBys over the train bigram stream (pair counts; the w1
    # rollup; the w2 continuation rollup), the 1-row count-of-counts
    # agg for the discount, the two word-keyed LM joins (vocabulary-
    # sized sides), and the top-100 TakeOrdered. Every exchange past
    # the pair counts carries (word, counts) rows.
    "doc_kn_bigram_lm": 8,
    # prefix-filtered set-similarity join (measured 9): the shingle
    # stream's df groupBy, the per-doc prefix window (one doc-keyed
    # exchange SHARED with the sizes rollup and its plain hash joins —
    # r11 replaced the round-10 corpus-cardinality size broadcasts; the
    # count is unchanged because the new sizes groupBy rides the same
    # doc-keyed exchange the window already paid), the prefix-bucket
    # groupBy + in-bucket pair expand + candidate distinct, the two
    # candidate-keyed verification joins' exchanges + the intersection
    # count agg, and the presentation sort. Full sets never shuffle —
    # the verification side is candidate-pair-sized.
    "doc_setsim_prefix_join": 9,
    # its work audit (measured 16): the same chain plus the two
    # slot-sum scalar aggregates and the qualifying count over the
    # composed join plan (exchange reuse covers the shared prefix
    # chain at runtime). +1 in r11: the per-doc size table is now a
    # doc-keyed groupBy over the exploded stream joined with a PLAIN
    # hash join — the broadcast of a corpus-cardinality frame it
    # replaces was the round-10 ADVICE scale hazard.
    "doc_setsim_prefix_audit": 16,
    # trigram Kneser-Ney (measured 16): one corpus-sized trigram-type
    # groupBy (map-side combined), five type-table rollups (ctx12,
    # n23, mid2 incl. its countDistinct expand, cont3), two 1-row
    # count-of-counts discount aggs, the four word-keyed LM joins
    # (every side bounded by distinct n-gram types), and the top-100
    # TakeOrdered. Nothing past the first groupBy sees the corpus.
    "doc_kn_trigram_lm": 16,
    # per-language tokenizer fertility (measured 8): doc_bpe_token_
    # counts' exact chain (the unrolled 3-merge training over the one
    # corpus word groupBy + the broadcast segmentation join) with the
    # per-doc agg swapped for a 5-row language rollup + the n_docs agg
    # and presentation sort.
    "doc_tokenizer_fertility": 8,
    # held-out KN scoring (measured 12): the LM's count chain as above,
    # plus the held-out bigram stream's three left joins against the
    # count tables (word-keyed) and the per-doc summary groupBy + the
    # doc-list join and presentation sort. Train and held-out sides
    # only meet at those word-keyed joins.
    "doc_kn_surprisal_rate": 12,
    # quantile sketch (measured 11): the input round-robin spread, the
    # sample's TakeOrdered (a SinglePartition exchange over 8-byte
    # priorities), its 256-row ranking window and 1-row count, the
    # exact-audit side's two-phase bucketed rank (bucket window + the
    # |buckets|-row offset cumsum + its broadcast-back join) over the
    # full cents stream, the 1-row extrema agg that derives the bucket
    # boundaries from the MEASURED price domain (r10: replaces the
    # hard-coded 65536 width — +1 exchange for range robustness), the
    # two 1-row count aggs, and the presentation sort. The audit side
    # swaps out at 100 TB leaving the sketch: one TakeOrdered +
    # 256-row arithmetic.
    "lineitem_quantile_sketch": 12,
    # robust MAD outlier audit (measured 11): TWO per-flag two-phase
    # bucketed ranking passes (r11 — the r10 verdict's ask #1: a plain
    # partitionBy(flag) window funnels a third of the fact table
    # through one sort task at 3 distinct flags), each paying a 3-row
    # extrema agg, the per-(flag, bucket) local window's exchange, and
    # the 3×256-row offset cumsum window; plus the 3-row n agg, the
    # final fence groupBy, and the presentation sort. Every exchange
    # past the scans carries (flag, int64) rows; no single task ever
    # sorts more than a bucket.
    "lineitem_mad_outliers": 11,
    # round-11 CCNet-over-KN buckets (measured 18): the KN count chain
    # (three word-keyed groupBys + the 1-row discount agg), the
    # all-docs scoring stream's three word-keyed left joins, the
    # per-doc summary groupBy + doc-list join, then the tercile CUT:
    # the two-phase bucketed rank over the ONE-ROW-PER-DOC score table
    # (rate-range bucket window + 256-row offset cumsum + bucket join),
    # the 1-row n agg, the 2-row boundary pick, and the presentation
    # sort. No global ntile sort anywhere — the r10 verdict's ask #2.
    "doc_ccnet_kn_buckets": 18,
    # round-11 incremental ExactSubstr (measured 47): the same
    # Manber–Myers walk as doc_exact_substr_spans, but over the
    # base+delta corpus whose VERBATIM re-crawl duplicates keep rank
    # classes tied to full depth — the prefix-doubling loop cannot
    # early-exit, so the walk carries ALL log2(max_len) rounds (the
    # spans entry's plan early-exits around half of them). Every extra
    # exchange is an id-width refinement join on the FILTERED
    # (delta-touching) pair frame, plus the plain per-doc length joins
    # (never broadcast — corpus-cardinality), the m(p) groupBy, two
    # per-doc merge windows, and the presentation sort. Depth stays
    # log-bounded by max DOC length — corpus-size-invariant.
    "doc_exact_substr_incremental": 47,
    # round-11 URL bloom dedup (measured 6): the registry's bit_or
    # word agg + its one-row pack (two tiny exchanges), the batch-side
    # union spread, the url-keyed exact-truth join's exchanges, the
    # 1-row summary agg, and the presentation sort; membership itself
    # is a one-row-broadcast projection.
    "doc_url_bloom_dedup": 6,
    # round-11 IVM aggregate maintenance (measured 3): two map-side-
    # combined per-custkey groupBys (base state stand-in + delta) and
    # the presentation sort; the state merge is a full_outer
    # SortMergeJoin that REUSES the groupBys' key partitioning (both
    # sides are |keys|-row aggregate states — a full outer join cannot
    # broadcast, and at scale co-partitioned SMJ over two state tables
    # is exactly the shape wanted).
    "orders_ivm_agg": 3,
    # round-11 IVM join maintenance (measured 1, unchanged by the
    # round-12 stored-base materialization): the base term is now a
    # parquet SCAN of the stored view (no join at all); the three
    # delta terms are broadcast hash joins against the 1,500-row
    # customer dimension at test SF (at scale ΔO⋈C terms shuffle only
    # delta rows; O₀⋈ΔC probes with a |ΔC|-row build side); the one
    # counted exchange is the presentation sort.
    "orders_ivm_join": 1,
    # round-11 LSH tuning audit (measured 11, down from 25 when each
    # config ran its own banding pass): ONE signature projection's
    # input spread feeds a single config-prefixed band-key groupBy +
    # per-config candidate distinct for all four grid points, then the
    # exact-Jaccard truth chain (shingle groupBy + pair agg), ONE
    # candidate-keyed hit join, two 4-row config rollups, and the
    # presentation sort. Everything past the scans is |pairs|-bounded;
    # the corpus is signed once, not once per config.
    "doc_lsh_tuning_audit": 11,
    # round-11 winsorization (measured 8): ONE per-flag two-phase
    # bucketed ranking pass (extrema agg + bucket-local window +
    # 3×256-row offset cumsum — lineitem_mad_outliers' shape), the
    # 3-row n agg, the clip groupBy against the broadcast bounds, and
    # the presentation sort.
    "lineitem_winsorized_stats": 8,
    # RRF hybrid fusion (measured 17): the BM25 side is
    # doc_bm25_multiquery's budgeted chain (input spread, the stats
    # pack, tf agg, token-partition df window, per-(query, doc) fold
    # agg, ranking window); the Jaccard side adds the per-doc
    # distinct-token explode+agg, the intersection agg, and its
    # ranking window; the fusion itself is one candidate-union
    # distinct + two broadcast joins + the |Q|·40-row final window
    # and presentation sort. Rankers share the matched-term rows —
    # the corpus is exploded once per side, never per query.
    "doc_bm25_rrf": 17,
    # round-11b hierarchical rollup cascade (measured 4): the hour
    # groupBy is the ONLY raw-seeing exchange (map-side combined);
    # the day and week groupBys re-shuffle the previous grain's
    # calendar-bounded partials (|hours|·|types| then |days|·|types|
    # rows), and the presentation sort sees the 3-grain union.
    "events_rollup_cascade": 4,
    # round-11b chi-square drift audit (measured 3): one map-side-
    # combined bin groupBy over the year-filtered fact scan, the
    # 15-row bin table's 1-row totals agg (attached back as a
    # broadcast), and the presentation sort — totals never re-scan raw.
    "orders_chisq_drift": 3,
    # round-11b key-skew audit (measured 6): raw crosses ONE exchange
    # (the composite (event_type, user_id) pre-agg); both per-key load
    # rollups and the per-key-name totals agg reuse those partials
    # (3 tiny exchanges), the hot filter joins the 2-row totals
    # broadcast, and the union's presentation sort closes it out.
    "events_key_skew_audit": 6,
    # round-11b containment join (measured 6, unchanged by the
    # round-12 prunes): the setsim skeleton with the probe-side-only
    # prefix — df groupBy, ONE shared per-doc rank window feeding both
    # join sides (the full side's s_b/r_b columns ride the same
    # exchange the prefix cut already paid; the LENGTH and POSITIONAL
    # prunes are join-condition arithmetic, zero new exchanges), the
    # candidate distinct, the pair-keyed intersection agg, and the
    # presentation sort.
    "doc_containment_join": 6,
    # round-12 canonical-copy selection (measured 2): the LSH/CC
    # machinery runs at build (EAGER_EXEMPT, doc_dup_clusters'
    # convention), so the SERVED plan is the per-doc token projection
    # joined to the |clustered docs|-row component table, the
    # cluster-keyed size/rank windows riding ONE exchange, and the
    # presentation sort.
    "doc_dup_canonical": 2,
    # round-12 effective tokens (measured 3): one map-side-combined
    # (lang, content-hash) groupBy over 16-byte digests + int64 token
    # counts — text never shuffles — then the |langs|-bounded rollup
    # and the presentation sort.
    "doc_effective_tokens": 3,
    # round-12 whitening stats (measured 1): all 44 sums compute in
    # ONE single-row map-side-combined aggregate over the embeddings
    # scan (no per-pair explode); the 36-row presentation table is a
    # literal explode of that row. The single exchange is the 1-row
    # partial merge; the sort is planned over 36 literal rows.
    "embedding_prefix_whitening_stats": 1,
    # round-12 watermark design (measured 4): the arrival-hour bucket
    # max groupBy (map-side combined), the |buckets|-row prefix-max
    # window (calendar-bounded frame), the bucket-local running-max
    # window's exchange, and the 1-row drop-counter aggregate; the
    # grid table is a literal explode of that row.
    "events_watermark_design": 4,
    # round-12 image near-dup census (measured 3): the per-image
    # hash window's exchange (inherited from the probed ahash entry),
    # the hash-value groupBy, and the 79-mask neighbor regroup — the
    # latter two over frames bounded by the 4096-value CODE SPACE, not
    # the corpus; no candidate pair frame exists in the plan.
    "multimodal_image_ahash_neardup": 3,
    # round-12 snapshot diff (measured 3): the two snapshot
    # projections' key exchanges feeding ONE full outer SortMergeJoin
    # + the presentation sort; the comparison filter is row-local and
    # output is change-volume-sized.
    "orders_snapshot_diff": 3,
    # round-12 retraction-aware IVM (measured 8): three per-key
    # map-side-combined aggregates (base/insert/retraction states),
    # their key-keyed state merges (co-partitioned SMJs over |keys|-row
    # frames), the key-bounded rescan term (semi-join + per-key max
    # over SURVIVING base rows of rescan keys only), and the
    # presentation sort — the only base re-read is the rescan.
    "orders_ivm_agg_retract": 8,
    # round-12 k-anonymity audit (measured 3): ONE quasi-identifier
    # groupBy (classes bounded by the attribute-domain product), the
    # 1-row totals re-aggregate attached back as a broadcast, and the
    # presentation sort.
    "customer_kanonymity_audit": 3,
    # round-13 l-diversity audit (measured 4): the k-anonymity shape
    # plus the count_distinct's two-phase partial-aggregate exchange
    # (Expand over the distinct key) inside the one quasi-identifier
    # groupBy; totals re-aggregate to 1 broadcast row; presentation
    # sort.
    "customer_ldiversity_audit": 4,
    # round-12 containment-prune audit (measured 13): re-runs the
    # entry's own 6 plus the pruned-join count and distinct-candidate
    # count (each re-deriving the rank window lineage from its side of
    # the audit) and the 1-row scalar aggs — the audit measures the
    # prunes, so it must execute the pruned join it reports on; the
    # UNPRUNED expansion is never executed (closed-form Σ(df−1) over
    # the prefix frame).
    "doc_containment_audit": 13,
    # round-13 split-corpus containment audit (measured 15): the audit
    # kernel's 13 over the derived corpus, plus the union's two extra
    # piece-branch scan spreads (the left/right slice projections each
    # re-read the documents scan through their own round-robin
    # exchange; the slice/md5 cut arithmetic itself is map-only).
    "doc_containment_split_audit": 15,
    # round-11b language-ID confusion matrix (measured 5): the
    # classifier is a pure projection; the corpus crosses ONE exchange
    # (the (true, pred) cell groupBy), the row/column totals
    # re-aggregate the ≤(|langs|+1)² cell table (two tiny exchanges,
    # joined back as bounded broadcasts), and the presentation sort.
    "doc_langid_confusion": 5,
    # round-11c per-user EWMA (measured 2): ONE user-keyed groupBy
    # (the collected per-user array is bounded by per-user activity;
    # the fold itself is a projection over it) plus the presentation
    # sort — nothing after the groupBy sees more than |users| rows.
    "events_user_ewma": 2,
    # round-11c column profile (measured 2): Spark plans the 6-column
    # exact multi-distinct as ONE scan + ONE Expand exchange (column-
    # tagged rows, map-side combined) + the final single-row agg's
    # exchange; the stack/unpivot and ppm math are pure projections
    # over the 1-row result.
    "orders_profile": 2,
    # round-11c edit-distance title join (measured 9): gram explode
    # and the 25-rarest prefix ride the title projection; one gram df
    # groupBy, the probe-side round-robin spread (the C(prefix_df,2)
    # expansion inherits its parallelism — measured 140 s single-task
    # without it), the candidate-pair distinct, and the presentation
    # sort — verification is per-pair banded DP with zero fan-out
    # (64-char keys; document bodies never shuffle). The extra 4 are
    # the DEGENERACY GUARD's second prefix-chain reference (df groupBy,
    # prefix window, gram rollup, 1-row slot agg) — every one
    # gram-cardinality, the refuse-don't-OOM price.
    "doc_title_edit_neardup": 9,
    # round-13 high-entropy edit join (measured 9): the identical
    # shared kernel (catalog_r11c._edit_relation) over the md5-derived
    # 32-char title corpus — title synthesis is a map-only projection,
    # so the shuffle set is exactly the neardup entry's; what differs
    # is the DATA regime (the prefix filter prunes instead of
    # degenerating), which the bench_scale probe measures.
    "doc_title_edit_entropy": 9,
    # round-13 TimeDim through the production builder (measured 2):
    # the hour-clock distinct (calendar-bounded output) and the
    # presentation sort; every TimeDim column is a pure expression.
    "ztm_time_dim": 2,
    # round-11c Misra-Gries heavy hitters (measured 4): the n-gram
    # stream crosses ONE corpus-sized exchange (the candidate-filtered
    # count groupBy); the MG kernel is a mapInPandas projection, the
    # survivor-union distinct and the 1-row total are bounded
    # exchanges, and the presentation sort closes it — the full
    # vocabulary never shuffles.
    # +1 in round 12: the pre-expansion round-robin spread of the
    # document scan (the §18 spread audit — a one-split parquet would
    # serialize the MG kernel and the exploded stream's map side).
    "doc_bigram_heavy_hitters": 5,
    # round-11c rolling z-score (measured 2): ONE user-keyed window
    # sort (7-row frames — constant state per task) + the presentation
    # sort; everything else is exact-int64 projection.
    "events_rolling_zscore": 2,
    # round-11c FK-integrity audit (measured 4): two anti joins (each
    # shuffles on its FK — the parent side is corpus-cardinality, no
    # broadcast hints) reduced to 1-row counts; the union's
    # presentation sort and count aggs are row-bounded.
    "orders_fk_integrity": 4,
    # round-11c per-user Gini (measured 3): two map-side-combined
    # groupBys on the corpus-cardinality user axis ((user,type) then
    # user) + the presentation sort; the impurity is a projection.
    "events_user_gini": 3,
    # round-11c freshness audit (measured 3): the within-(type,day)
    # local gap window at the natural daily grain, the per-type rollup
    # over the |types|*|days| bucket table (which also serves the
    # boundary-gap lag), and the presentation sort — NO 5-value-key
    # sort anywhere (the lineitem_mad_outliers lesson applied to
    # gaps).
    "events_freshness_audit": 3,
    # round-11c streaming dedup: the SERVED plan is the emissions
    # parquet read + presentation sort (default budget); the dedup
    # state machine runs inside the availableNow drain at build time
    # (EAGER_EXEMPT below, like the other streaming entries).
    #
    # round-14 stored-base ExactSubstr (measured 2): the merged order
    # materializes at build into an eager checkpoint (the stored-base
    # builds + ladder extension + placement are all EAGER_EXEMPT
    # fixpoint work), so the SERVED digest plan is one per-doc groupBy
    # over id-width merged-rank rows plus the presentation sort.
    "doc_sa_placement_merged": 2,
    # round-14 stored-base ExactSubstr spans (measured 55): the served
    # plan runs the |delta|-width LCP recovery — the delta-only build's
    # log(max_len) refinement chain over delta-adjacent pairs (the
    # doc_exact_substr_incremental walk shape, one id-width equi-join
    # per retained level), the mixed delta-vs-base ladder walk's
    # repeat-top + descend joins (each |pairs|-width against
    # checkpointed state/rank tables), the merged rank±1 adjacency
    # join, the m(p) groupBy, two per-doc merge windows, and the
    # presentation sort. Every exchange carries id-width rows; depth is
    # log(max_len) + ceil(max_len / L_top) — doc-length-bounded,
    # corpus-size-invariant. Base-only pairs never enter any exchange.
    "doc_exact_substr_stored_base": 55,
    # round-15 maintenance pair (measured 52 / 55): both serve the
    # stored-base spans walk (the doc_exact_substr_stored_base shape
    # above); the fold entry's day-1 fold work and the tombstone
    # entry's filtered merge all land in eager checkpoints at build, so
    # the SERVED plans are the same |delta|-width LCP recovery + merged
    # adjacency + interval algebra — doc-length-bounded join depth,
    # id-width rows in every exchange.
    "doc_exact_substr_fold": 52,
    "doc_exact_substr_tombstone": 55,
    # round-15 setsim split audit (measured 18): the base audit's 16
    # (df groupBy, prefix window, candidate expansion + verify join,
    # scalar slot aggs) plus the split corpus derivation's two extra
    # scan-branch exchanges (the piece sides' repartition spreads —
    # the same +2 the containment split audit pays over its base).
    "doc_setsim_split_audit": 18,
}


def test_shuffle_budgets(spark):
    for name, e in ENTRIES.items():
        n = _distinct_shuffle_count(e.spark(spark, SF))
        budget = SHUFFLE_BUDGETS.get(name, SHUFFLE_BUDGET_DEFAULT)
        assert n <= budget, f"{name}: {n} distinct shuffle exchanges (budget {budget})"


# Builders that RUN Spark jobs at construction time, by fixpoint nature:
# connected-components / k-core / clique mining iterate to convergence with
# per-round localCheckpoints (the loop must act to know when to stop), and
# the two curation flagships compose those fixpoints. Everything else in
# the catalog must stay action-free at build. A new entry that runs eager
# work lands in the assertion below unless it is added here DELIBERATELY.
EAGER_EXEMPT = {
    # round-10: the simhash-60 dup-graph pair table is built and
    # frozen at construction (_SIM60_PAIRS — the index build the
    # centrality entry serves from; r9 verdict ask #4)
    "doc_dup_pagerank",
    # streaming: these builders drain an availableNow stream to expose
    # their final state (result cached per session+sf)
    "doc_streaming_snapshot_curation",
    "events_stateful_running_totals",
    "events_streaming_sessions",
    "events_streaming_attribution",
    "events_streaming_dedup",
    "doc_dup_clusters",
    "doc_dup_triangles",
    "doc_dup_4cliques",
    "doc_dup_kcore",
    "embedding_dup_clusters",
    "doc_corpus_curation",
    "doc_incremental_curation",
    # round-8: the size-gated membership semi-join must COUNT the bench
    # key set to choose broadcast vs shuffle (the gate is a physical
    # decision the plan can't defer); the counted side is the 1/11
    # bench split only, and the warm in-session cost measured ~0.1 s
    # at sf0.1 (NOTES_r8)
    "doc_decontamination_passages",
    # round-9 residual-PQ family: residual training is inherently
    # SEQUENTIAL (residuals need the trained coarse quantizer, codes
    # need the trained residual codebooks), so the 4-row codebook
    # tables are trained eagerly and frozen with localCheckpoint
    # (FAISS's train→freeze→encode) — a fully-lazy plan re-expands the
    # coarse chain inside every residual reference (measured 178 s vs
    # ~10 s at sf0.001). Memoized per (session, sf); bench clears the
    # memo per rep
    "embedding_ivfpq_residual_search",
    "embedding_ivfpq_multiprobe",
    "embedding_ivfpq_residual_recall_audit",
    "embedding_ivfpq_nprobe_audit",
    "embedding_ivfpq_adc_lut",
    "embedding_ivfpq_rerank",
    # the round-8 PQ family retrofitted to the same frozen-model
    # pattern (catalog_r8._PQ_MODELS): training runs once per
    # (session, sf) instead of re-expanding inside every consumer
    # branch; checkpointing k-row tables preserves values
    "embedding_pq_codebooks",
    "embedding_pq_search",
    "embedding_ivfpq_search",
    "embedding_pq_recall_audit",
    # the coarse quantizer frozen at its SOURCE
    # (catalog_r3._KM_MODELS): every trained-quantizer consumer now
    # trains once per (session, sf, k) and serves from the frozen
    # k-row table — same pattern, same honesty rules (bench clears
    # the memo per rep)
    "embedding_kmeans_seeded",
    "embedding_semantic_dedup",
    "embedding_ann_ivf",
    "embedding_ivf_int8_search",
    "embedding_ivf_multiprobe_search",
    "embedding_ivf_nprobe_audit",
    # round-9 leakage-safe splitting: both compose the CC fixpoint
    # (checkpointed loop — the same reason doc_dup_clusters is exempt)
    "doc_leakage_safe_split",
    "doc_split_leakage_audit",
    # round-9 prototype pruning serves from the same frozen coarse
    # quantizer (_KM_MODELS) as the IVF family above
    "embedding_prototype_pruning",
    # round-9 D4 composes SemDeDup + prototype pruning over that same
    # frozen quantizer
    "embedding_d4_curation",
    # round-9 MMR rerank: the greedy unroll references the BM25
    # shortlist and the Jaccard pair table once per step — a lazy plan
    # re-expands the full BM25 corpus chain per reference (measured
    # 78 s vs ~11 s at sf0.001) — and the selected set 3× per step (a
    # lazy union chain grows the plan tree ~3^K: 1189 nodes at K=5),
    # so the ≤|Q|·R²-row frames and the per-step selection are frozen
    # with eager localCheckpoint
    "doc_bm25_mmr",
    # late round-9 suffix array: prefix doubling is a fixpoint-style
    # loop (each round's dense rank feeds the next; the early-exit
    # needs a per-round scalar), so the build runs eagerly with
    # per-round localCheckpoints like the CC/BPE loops; memoized per
    # (session, sf) in catalog_r9b._SA_MODELS, cleared per bench rep
    "doc_suffix_array",
    "doc_suffix_dup_audit",
    "doc_longest_dup_run",
    # round-10 ExactSubstr entries compose the same shared SA build
    "doc_exact_substr_spans",
    "doc_exact_substr_cleaned",
    # round-11 incremental ExactSubstr builds ITS OWN base+delta SA
    # (catalog_r11._XSI_MODELS — same eager prefix-doubling loop,
    # memoized per session+sf, cleared per bench rep)
    "doc_exact_substr_incremental",
    # round-12: the IVM join's stored base view materializes to
    # parquet on FIRST call per (session, sf) (catalog_r11._IVMJ_BASE
    # — the r11 verdict's wrong #3 fix); warm calls scan the stored
    # table with zero jobs (the memo holds the post-write read DF)
    "orders_ivm_join",
    # round-12: canonical-copy selection composes the LSH candidate +
    # CC fixpoint at build (doc_dup_clusters' convention)
    "doc_dup_canonical",
    # round-14: the stored-base path builds the base SA (memoized —
    # the stored input contract), the delta-only SA, the ladder
    # extension, placement, and the merged ranking pass eagerly at
    # build (prefix doubling and the tail-compare loop are the same
    # fixpoint class as the r9 SA build)
    "doc_sa_placement_merged",
    "doc_exact_substr_stored_base",
    # round-15: the maintenance pair runs the same eager stored-base
    # machinery (shared _XSB_MODELS memo) plus the fold's eager level
    # re-publication / the tombstone's filtered merge, and the
    # incremental entry's auto-routing counts corpus positions at
    # build (one sum aggregate — the r14 ask-#2 size-derived default)
    "doc_exact_substr_fold",
    "doc_exact_substr_tombstone",
}


def test_builders_are_lazy_no_actions(spark):
    """Catalog builders are a registry of LAZY plans: with the table cache
    warm, constructing an entry must run zero Spark jobs (the old
    dq_orders_audit ran two eager full-scan counts at build time). Covers
    EVERY catalog entry except the explicit EAGER_EXEMPT fixpoint set —
    a new eager builder cannot slip in unnoticed."""
    lazy_names = [n for n in ENTRIES if n not in EAGER_EXEMPT]
    for name in lazy_names:
        ENTRIES[name].spark(spark, SF)  # warm table/file-listing caches
    sc = spark.sparkContext
    sc.setJobGroup("lazy-builders", "")
    try:
        for name in lazy_names:
            ENTRIES[name].spark(spark, SF)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("lazy-builders")
    assert len(jobs) == 0, f"builders ran {len(jobs)} jobs at construction time"


# Round-12 spread audit (the §18 lesson, applied repo-wide): every
# candidate-expansion plan must spread its probe/kernel input off the
# raw scan — a one-split parquet (always the case for the small
# committed SFs, and common for any <128 MB file at prod defaults)
# otherwise serializes the quadratic expansion through ONE task (the
# measured edit-join failure: 140 s vs 21 s). Two structural classes:
#  - SELF-JOIN expansions must carry an explicit RoundRobinPartitioning
#    exchange upstream of the join (the _sa_base / edit-join spread);
#  - GROUP-THEN-EXPAND plans (blocked_pairs) are structurally immune:
#    the expansion runs after the block groupBy's hash exchange, so it
#    inherits shuffle parallelism — listed here as documentation, not
#    asserted.
SPREAD_REQUIRED = [
    "doc_title_edit_neardup",
    "doc_title_edit_entropy",
    "doc_containment_split_audit",
    "doc_setsim_prefix_join",
    "doc_setsim_prefix_audit",
    "doc_setsim_split_audit",
    "doc_containment_join",
    "doc_containment_audit",
    "doc_lsh_tuning_audit",
    "doc_minhash_candidates",
    "doc_simhash_neardup",
    "doc_simhash60_neardup",
    # not a self-join, but an expansion kernel: the MG sketch phase
    # and the exploded bigram stream both run pre-exchange
    "doc_bigram_heavy_hitters",
]
# group-then-expand (blocked_pairs): part_name_fuzzy_pairs


def test_candidate_expansions_spread_their_probe_side(spark):
    for name in SPREAD_REQUIRED:
        plan = _plan(ENTRIES[name].spark(spark, SF))
        assert "RoundRobinPartitioning" in plan, (
            f"{name}: candidate expansion inherits the raw scan's"
            " partitioning — a one-split file serializes it (§18)"
        )


def test_ivm_join_plan_has_no_base_base_join(spark):
    """The round-11 verdict's wrong #3: orders_ivm_join's benched plan
    must MAINTAIN against the stored base view, not recompute Ob⋈Cb.
    Assert the executed plan (a) scans the materialized base_view
    parquet and (b) contains exactly THREE join operators — the
    bilinear delta terms — so a regression that re-derives the base
    term in-plan (a fourth join) fails the suite."""
    import re

    from idh_etl_demo_spark.catalog import ENTRIES

    plan = _plan(ENTRIES["orders_ivm_join"].spark(spark, SF))
    assert "base_view.parquet" in plan, "stored base view not scanned"
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct)",
        plan,
    )
    assert len(joins) == 3, f"expected 3 delta-term joins, got {joins}"


def test_no_cartesian_products_anywhere(spark):
    """Every catalog entry must avoid unplanned cartesian joins (the one
    deliberate crossJoin — brute-force cosine — broadcasts its query side
    and is explicitly allowed)."""
    allowed_cross = {"embedding_cosine_topk"}
    for name, e in ENTRIES.items():
        plan = _plan(e.spark(spark, SF))
        if name in allowed_cross:
            continue
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
