"""Catalog round 15 — stored-base ExactSubstr MAINTENANCE (fold +
deletions) and the setsim prefix filter in its pruning regime.

- ``doc_exact_substr_fold``: multi-delta maintenance (r14 verdict ask
  #4). Day-1's delta is placed and FOLDED into the stored artifact
  (operators/suffix.fold_ladder + catalog_r14.fold_xsb_parts); day-2's
  delta then extends/places against base+delta₁ with no rebuild
  anywhere. The fold is EXACT — every folded level is pointwise equal
  to a combined rebuild's — so the relation equals the full-corpus
  ExactSubstr spans for day-2's documents, and the DuckDB oracle
  re-derives exactly that from the direct sorted-suffix-list build.
- ``doc_exact_substr_tombstone``: deletion support (r14 verdict ask
  #5). A re-crawl delta that also REMOVES documents applies a
  tombstone filter to the stored final order at merge time — the
  ladder, the placement, and the stored artifact itself are untouched
  (deleting rows never reorders survivors) — and the span walk skips
  tombstoned neighbors automatically because adjacency re-derives from
  the surviving union's ranks. The oracle rebuilds on the SURVIVING
  corpus: base − removed + added ≡ rebuild, the ask's parity spec.
- ``doc_setsim_split_audit``: the setsim prefix-filter audit
  (catalog_r10._ssim_audit_frame) over the SPLIT-re-publication corpus
  (catalog_r13._split_base), where rarest-prefix postings land on
  shingles shared with each parent's own pieces — the heavy-tailed
  regime the r14 verdict asked to instrument (ask #7), mirroring
  doc_containment_split_audit.

Reference: Lee et al. 2021 (ExactSubstr) rebuild offline per corpus
snapshot; fold/tombstone are the daily-maintenance shapes a 100 TB
corpus needs — the artifact absorbs adds exactly and masks removals
without being rewritten. PPJoin/prefix filtering per Xiao et al. 2008.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import query
from idh_etl_demo_spark.catalog_r10 import (
    _XS_SPANS_TAIL_SQL,
    _XS_T,
    _ssim_audit_frame,
    _ssim_audit_sql,
    _ssim_streams_of,
    _xs_oracle_m,
)
from idh_etl_demo_spark.catalog_r11 import (
    _XSI_CORPUS_SQL,
    _xsi_base,
    _xsi_delta,
)
from idh_etl_demo_spark.catalog_r13 import _split_base, _split_prelude
from idh_etl_demo_spark.catalog_r14 import (
    _xsb_parts,
    fold_xsb_parts,
    merged_order_from,
    stored_base_spans,
)

# ===========================================================================
# Multi-delta maintenance: fold day-1, place day-2
# ===========================================================================
#
# The r14 stored-base path handles ONE delta against a frozen base;
# production re-crawls arrive daily. The fold closes the loop: after
# placement, emit an updated stored artifact (merged final order +
# folded ladder + refreshed pair maps / cumsums / top-class frame) so
# the NEXT delta pays |delta|-width work against base+delta₁. The
# corpus split here: day-0 base = the XSI base (doc_id % 5 ≠ 4),
# day-1 delta = the fresh documents (doc_id % 5 = 4), day-2 delta =
# the verbatim re-crawls (doc_id ≥ 1e6) — together exactly the XSI
# combined corpus, so the oracle is the XSI family's with the span
# emission filtered to day-2's documents.



# The fold entry's previous build's eager frames (folded ladder, final
# order, lens, top-class, merged orders, delta builds), released at the
# start of the NEXT build — release_xsb_models only frees the shared
# BASE memo, and checkpoint blocks otherwise stay pinned until JVM GC +
# ContextCleaner notice (the round-9 ADVICE), which across bench reps
# and driver double-evaluation would stack full folded artifacts.
_LAST_FOLD_FRAMES: list = []


def _release_last_fold() -> None:
    from bench import _release_memo_value

    for v in _LAST_FOLD_FRAMES:
        _release_memo_value(v)
    _LAST_FOLD_FRAMES.clear()


def _xsi_maxlen(spark: SparkSession, sf_dir: str) -> int:
    """Max token length over the full XSI corpus — the walk's rounds
    bound (an over-estimate is exact: extra rounds find no rank rows
    at the shifted offsets and accumulate nothing)."""
    return int(
        _xsi_base(spark, sf_dir)
        .select(F.max(F.size("toks")).alias("n"))
        .collect()[0][0]
        or 0
    )


@query(
    "doc_exact_substr_fold",
    f"""
    with corpus as ({_XSI_CORPUS_SQL}),
    {_xs_oracle_m("corpus")},
    iv as (
      select doc_id, pos as s, pos + m as e from m
      where m >= {_XS_T} and doc_id >= 1000000
    ),
    {_XS_SPANS_TAIL_SQL}
    """,
)
def doc_exact_substr_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 ExactSubstr removal spans through the FOLDED stored base:
    place day-1's fresh documents against the stored day-0 artifact,
    fold the placed delta INTO the artifact (fold_xsb_parts — merged
    order becomes the new final order, fold_ladder re-publishes each
    rank level pointwise-equal to a combined rebuild's), then run the
    r14 update path for day-2's re-crawl delta against base+day-1.
    Output: maximal ≥{_XS_T}-token removal spans for day-2's documents
    over the FULL three-part corpus — the oracle re-derives them from
    the direct sorted-suffix-list build of all three parts at once.

    The fold is EXACT AT EVERY CADENCE: cumulative fold error ≡ 0 —
    each folded level is the dense rank of level-L window content over
    the combined corpus, the same function of the corpus a rebuild
    computes, so folding daily for a year ends bit-identical to one
    rebuild of the year's corpus (pointwise equality pinned by
    test_fold_ladder_matches_combined_rebuild; this entry's oracle
    hash-gates the composed day-2 relation).

    Scale shape: day-2's cost is the r14 update path against the
    folded artifact (|delta₂|-width + one merged ranking pass); the
    fold itself pays, per ladder level, two |delta₁|-width joins and
    ONE bucketed dense rank over combined id-width rows — the
    re-publication floor — and never runs the rebuild's pair-compare
    joins. tools/probe_xsi.py's fold leg prices fold-then-place
    against re-store-then-place at 30×."""
    from concurrent.futures import ThreadPoolExecutor

    from idh_etl_demo_spark.operators.suffix import suffix_ranks

    _release_last_fold()
    bparts = _xsb_parts(spark, sf_dir)
    base_all = _xsi_base(spark, sf_dir)
    d1 = base_all.filter(
        (F.col("doc_id") % 5 == 4) & (F.col("doc_id") < 1000000)
    )
    d2 = base_all.filter(F.col("doc_id") >= 1000000)

    # day-2's delta-only build depends on NOTHING day-1 produces, so it
    # runs on a driver thread concurrently with day-1's merge + fold
    # (round 16, guide §2.6 — overlap independent jobs: the build's
    # small doubling-round jobs back-fill scheduler gaps left by the
    # merge/fold stages; at cluster scale they fill straggler tails).
    def _build_d2() -> tuple:
        spark.sparkContext.setJobDescription("fold: day-2 delta build")
        cap: dict = {}
        out = suffix_ranks(d2, capture=cap)
        spark.sparkContext.setJobDescription(None)
        return (*out, cap)

    with ThreadPoolExecutor(max_workers=1) as pool:
        d2_build = pool.submit(_build_d2)
        merged1, dparts1 = merged_order_from(bparts, d1)
        folded = fold_xsb_parts(bparts, dparts1, merged1)
        merged2, dparts2 = merged_order_from(
            folded, d2, delta_build=d2_build.result()
        )
    f2, h2, _p2, lens2, arts2, top2, meta2 = folded
    _LAST_FOLD_FRAMES.extend(
        [
            merged1,
            dparts1[0],
            [fr for _, fr in dparts1[1]],
            [fr for _, fr in dparts1[4]],
            merged2,
            dparts2[0],
            [fr for _, fr in dparts2[1]],
            [fr for _, fr in dparts2[4]],
            f2,
            [fr for _, fr in h2],
            lens2,
            top2,
            arts2["seed_vocab"],
            [list(t) for t in arts2["levels"]],
        ]
    )
    # walk bound = max doc length over the full three-part corpus: the
    # folded manifest covers day-0+day-1, the day-2 build's stats the
    # rest — replaces the _xsi_maxlen tokenize+max pass (round 16)
    return stored_base_spans(
        folded, dparts2, merged2, max(meta2["maxlen"], dparts2[5]["maxlen"])
    )


# ===========================================================================
# Deletion support: tombstones on the stored final order
# ===========================================================================

# every doc_id ≡ 1 (mod 10) leaves the corpus with the re-crawl delta —
# a strict subset of the BASE (1 mod 10 ⇒ 1 mod 5 ≠ 4), and never the
# original of a re-crawl (multiples of 25 end in 0 or 5), so removals
# exercise the base-only tombstone path while the delta still
# duplicates live content.
_TOMB_SQL = "doc_id % 10 <> 1"


@query(
    "doc_exact_substr_tombstone",
    f"""
    with corpus as (
      select doc_id, text from documents where {_TOMB_SQL}
      union all
      select doc_id + 1000000 as doc_id, text from documents
      where doc_id % 25 = 0
    ),
    {_xs_oracle_m("corpus")},
    iv as (
      select doc_id, pos as s, pos + m as e from m
      where m >= {_XS_T} and (doc_id % 5 = 4 or doc_id >= 1000000)
    ),
    {_XS_SPANS_TAIL_SQL}
    """,
)
def doc_exact_substr_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal spans for the delta snapshot when the
    re-crawl also DELETES documents (every base doc_id ≡ 1 mod 10):
    base − removed + added ≡ rebuild on the surviving corpus, computed
    WITHOUT touching the stored artifact. The tombstone is one filter
    on the stored final order at merge time (merged_order_from's
    base_filter): placement and insertion counts stay in the original
    base rank space — sound because deletions never reorder survivors
    — and the single re-ranking pass renumbers the surviving union, so
    merged adjacency (hence every neighbor-LCP walk) skips tombstoned
    rows with zero new machinery. The ladder keeps the dead rows; they
    are only ever read for content comparisons of pairs that the
    surviving adjacency emits, which never reference them. The oracle
    rebuilds the sorted suffix list on the surviving corpus directly —
    the ask's parity spec as a driver-gated hash.

    Compaction (re-running the store on the surviving corpus) is an
    optimization, not a correctness step: it sheds dead ladder rows
    once tombstones outweigh the one-filter overhead — the artifact
    re-publication cost is exactly the stored-base build PROBE_XSI
    already prices, so the cadence trade is tombstone scan waste
    (|removed| extra id-width rows per level walk) vs one rebuild.

    Scale shape: identical to doc_exact_substr_stored_base plus the
    one tombstone filter — every per-update stage |delta|-width, one
    bucketed ranking pass over the SURVIVING union."""
    bparts = _xsb_parts(spark, sf_dir)
    delta = _xsi_base(spark, sf_dir).filter(_xsi_delta(F.col("doc_id")))
    merged, dparts = merged_order_from(
        bparts, delta, base_filter=F.col("doc_id") % 10 != 1
    )
    # walk bound from the manifests (round 16): max(base, delta) doc
    # length — identical to the old _xsi_maxlen corpus pass (the
    # unfiltered base maxlen can only over-estimate under tombstones,
    # and the walk's rounds bound is exact under over-estimates)
    return stored_base_spans(
        bparts, dparts, merged, max(bparts[6]["maxlen"], dparts[5]["maxlen"])
    )


# ===========================================================================
# Setsim prefix filter in its pruning regime (r14 verdict ask #7)
# ===========================================================================
#
# doc_setsim_prefix_join's 10× probe ratio has read 5.x for four
# rounds with an answer-mass attribution but no instrumented twin: on
# the base corpus every rarest prefix is near-unique, so the audit's
# slot numbers show the filter's selectivity without a heavy-tailed
# stressor. The split-re-publication corpus (catalog_r13: every doc
# plus its two pieces around an md5-derived 10-90% cut) is that
# stressor — a parent's rarest shingles are df ≥ 2 postings shared
# with its own pieces, so prefix buckets carry real mass and the
# prefix/full slot reduction is measured where it matters. Answer
# mass: a piece whose size is ≥ 70% of its parent qualifies by the
# shingle-subset property, so the brute-force oracle re-proves
# completeness on non-trivial pairs.


@query("doc_setsim_split_audit", _ssim_audit_sql(_split_prelude()))
def doc_setsim_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_setsim_prefix_audit's exact plan and columns (n_sets,
    full_pair_slots, prefix_pair_slots, n_qualifying) over the derived
    split-re-publication corpus — the setsim prefix filter measured in
    the heavy-tailed regime, mirroring doc_containment_split_audit
    (the r13 precedent this round's verdict named). The oracle is the
    shared audit SQL over the shared split prelude: Σ C(df, 2) vs
    Σ C(prefix_df, 2) re-derived in DuckDB plus the all-pairs
    brute-force qualifying count.

    Scale shape: identical to doc_setsim_prefix_audit (two gram-keyed
    groupBys + one per-doc prefix window + the candidate-verify join
    inside the qualifying count) plus the corpus derivation's map-only
    slice/md5 arithmetic; the bench_scale probe at 10× measures the
    prefix-index join doing real pruning on heavy-tailed sizes."""
    stream, sizes = _ssim_streams_of(_split_base(spark, sf_dir))
    return _ssim_audit_frame(stream, sizes)
