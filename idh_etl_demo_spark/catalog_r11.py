"""Round-11 catalog entries — the r10 verdict's compositions:

- ``doc_ccnet_kn_buckets``: the CCNet head/middle/tail corpus split
  REWIRED to the Kneser-Ney LM (r10 verdict ask #2). The r7
  ``doc_ccnet_buckets`` ranks by RAW bigram familiarity, which cannot
  price an unseen transition (the exact gap the r10 KN family was
  built to close), and cuts terciles with a GLOBAL ntile(3) sort. This
  entry scores every document under the train-split KN bigram LM
  (improbable-transition rate — the gateable stand-in for KenLM
  perplexity, catalog_r10's convention) and assigns buckets by
  THRESHOLD COMPARISON against a broadcast 1-row boundary frame found
  with the two-phase bucketed rank — no global sort anywhere. The raw
  entry stays registered for the A/B.

- ``doc_exact_substr_incremental``: the ExactSubstr cut extended to a
  base+delta corpus (r10 verdict ask #5). Real pipelines dedup an
  incoming snapshot against yesterday's corpus (the reference's own
  idempotent-merge pattern, dags/idh_etl.py:242-253, applied to
  text): removal spans are computed for DELTA documents against
  base+delta, and the Manber–Myers LCP walk — the expensive
  log(max_len) join chain — processes only adjacent pairs TOUCHING a
  delta position (operators/suffix.suffix_lcp_adjacent's pair_filter
  hook), never re-walking base-only pairs.

- ``doc_url_bloom_dedup``: approximate-membership dedup at the
  URL/document level with a COUNTING audit (r10 verdict ask #6): an
  incoming snapshot's URLs probe a bloom filter built over the seen
  registry; the bloom verdict per URL is gated against the exact
  anti-join, and the false-positive rate — genuinely-new URLs the
  filter would wrongly drop — is a measured output column, the same
  audit pattern as doc_minhash_estimate_audit.

Entry contract per repo convention: @query registration with a DuckDB
oracle, a shuffle budget with a why-comment (tests/test_plan_shape.py),
bench.py HEADLINE rows, a bench_scale probe or documented exclusion,
property tests vs pure-Python twins on planted data
(tests/test_r11_properties.py), and driver-window first-green slots.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_r10 import (
    _KN_ORACLE_PRELUDE,
    _KN_TAU,
    _XS_SPANS_TAIL_SQL,
    _XS_T,
    _bigram_stream,
    _kn_parts,
    _kn_scored_stream,
    _xs_oracle_m,
)

# ===========================================================================
# CCNet buckets over the Kneser-Ney LM — threshold-comparison terciles
# ===========================================================================
#
# CCNet (Wenzek et al. 2020) buckets CommonCrawl by KenLM perplexity
# under an LM trained on reference text. Here the LM is the repo's
# interpolated KN bigram estimator trained on the doc_id % 10 != 0
# split (catalog_r10._kn_parts), and EVERY document is scored — the
# train split under its own model, like CCNet scoring a crawl that
# overlaps the LM corpus; the per-doc signal is the improbable-
# transition rate (P_KN < tau), the engine-exact stand-in for a log-sum
# perplexity (ln() diverges in the last ulp across engines — the BM25
# idf lesson). Docs with < 2 tokens have no transitions and score 0.0
# (maximally familiar by convention; deterministic either way).
#
# The tercile CUT is where the 100 TB story changed (r10 verdict ask
# #2): the r7 entry's ntile(3) is a single global sort of the per-doc
# score table. Here the two boundary rows — the (rate, doc_id) pairs at
# ntile ranks k1 = n//3 + min(n%3, 1) and k2 = 2*(n//3) + min(n%3, 2) —
# are FOUND with the two-phase bucketed rank (rate-range buckets,
# per-bucket local windows, 256-row offset cumsum; no single-partition
# sort), broadcast as ONE row, and every document's bucket is a pure
# lexicographic threshold COMPARISON against them. Identical output
# contract to ntile because the (rate asc, doc_id asc) order is total:
# rank ≤ k  ⟺  (rate, doc_id) ≤ boundary-row-at-k.


@query(
    "doc_ccnet_kn_buckets",
    f"""
    with {_KN_ORACLE_PRELUDE},
    hg as (
      select doc_id, toks[u.i] as w1, toks[u.i + 1] as w2
      from base cross join lateral (
        select unnest(generate_series(1, greatest(len(toks) - 1, 0))) as i
      ) u
    ),
    sc as (
      select h.doc_id,
             case when c.c1 is null then coalesce(k.ncont, 0) * 1.0 / d.ntot
                  when k.ncont is null then 0.0
                  else greatest(coalesce(g.c12, 0) * d.dd - d.dn, 0) * 1.0
                         / (d.dd * c.c1)
                       + ((d.dn * c.n1p * k.ncont) * 1.0 / (d.dd * c.c1))
                         / d.ntot
             end as pkn
      from hg h
      left join c12 g on g.w1 = h.w1 and g.w2 = h.w2
      left join c1 c on c.w1 = h.w1
      left join cont k on k.w2 = h.w2
      cross join disc d
    ),
    perdoc as (
      select doc_id, count(*)::bigint as n_bigrams,
             cast(sum(case when pkn < {_KN_TAU} then 1 else 0 end) as bigint)
               as n_improbable
      from sc group by doc_id
    ),
    scored as (
      select b.doc_id,
             coalesce(p.n_bigrams, 0) as n_bigrams,
             coalesce(p.n_improbable, 0) as n_improbable,
             case when coalesce(p.n_bigrams, 0) > 0
                  then p.n_improbable * 1.0 / p.n_bigrams else 0.0 end
               as improbable_rate
      from (select doc_id from base) b
      left join perdoc p using (doc_id)
    ),
    r as (
      select *,
             row_number() over (order by improbable_rate asc, doc_id asc) as rn,
             count(*) over () as n
      from scored
    )
    select doc_id, n_bigrams, n_improbable, improbable_rate,
           case when rn <= n // 3 + least(n % 3, 1) then 'head'
                when rn <= 2 * (n // 3) + least(n % 3, 2) then 'middle'
                else 'tail' end as bucket
    from r
    order by doc_id
    """,
)
def doc_ccnet_kn_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail corpus split under the Kneser-Ney LM
    (section comment): every document scored by its improbable-
    transition rate under the train-split KN bigram model — a signal
    that, unlike raw bigram familiarity (doc_ccnet_buckets, kept for
    the A/B), prices UNSEEN transitions through the continuation
    backoff. Output: (doc_id, n_bigrams, n_improbable,
    improbable_rate, bucket), ntile-identical tercile buckets.

    Bucket assignment is a threshold COMPARISON, not a global sort
    (the r10 verdict's ask): the two ntile boundary rows are found via
    the two-phase bucketed rank over the per-doc score table and
    broadcast as one row; each document compares (rate, doc_id)
    lexicographically against them. The oracle derives the same
    buckets from an explicit row_number — two independent cuts that
    agree exactly because the order is total.

    Scale shape: the KN count chain is word-keyed (vocabulary-
    bounded); scoring is the bigram stream's three left joins + one
    per-doc groupBy; the rank pass sees ONE ROW PER DOCUMENT in
    rate-range buckets (no single-partition sort), boundary targets
    are a 1-row broadcast, and assignment is a projection. At 100 TB
    nothing sorts globally and nothing corpus-sized broadcasts."""
    from idh_etl_demo_spark.catalog_r9b import _sa_base
    from idh_etl_demo_spark.operators.suffix import _bucketed_rank

    c12, c1, cont, disc = _kn_parts(spark, sf_dir)
    base = _sa_base(spark, sf_dir)
    hg = _bigram_stream(base)
    perdoc = (
        _kn_scored_stream(hg, c12, c1, cont, disc, label="ccnet scoring")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum((F.col("pkn") < F.lit(_KN_TAU)).cast("long"))
            .cast("long")
            .alias("n_improbable"),
        )
    )
    scored = (
        base.select("doc_id")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_improbable", F.lit(0))
            .cast("long")
            .alias("n_improbable"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.col("n_improbable").cast("double")
                / F.col("n_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("improbable_rate"),
        )
    )
    ranked = _bucketed_rank(
        scored.withColumn(
            "bk", F.floor(F.col("improbable_rate") * 256).cast("long")
        ),
        ["improbable_rate", "doc_id"],
        "bk",
        1,
        dense=False,
    )
    nn = scored.agg(F.count(F.lit(1)).cast("long").alias("n"))
    targets = nn.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("which"),
                    (
                        F.expr("n div 3") + F.least(F.expr("n % 3"), F.lit(1))
                    ).cast("long").alias("k"),
                ),
                F.struct(
                    F.lit(2).alias("which"),
                    (
                        F.lit(2) * F.expr("n div 3")
                        + F.least(F.expr("n % 3"), F.lit(2))
                    ).cast("long").alias("k"),
                ),
            )
        ).alias("t")
    ).select("t.which", "t.k")
    bounds = (
        ranked.join(F.broadcast(targets), F.col("gr") == F.col("k"))
        .groupBy()
        .agg(
            F.max(
                F.when(F.col("which") == 1, F.col("improbable_rate"))
            ).alias("t1_rate"),
            F.max(F.when(F.col("which") == 1, F.col("doc_id"))).alias(
                "t1_doc"
            ),
            F.max(
                F.when(F.col("which") == 2, F.col("improbable_rate"))
            ).alias("t2_rate"),
            F.max(F.when(F.col("which") == 2, F.col("doc_id"))).alias(
                "t2_doc"
            ),
        )
    )
    rate, doc = F.col("improbable_rate"), F.col("doc_id")
    head = (rate < F.col("t1_rate")) | (
        (rate == F.col("t1_rate")) & (doc <= F.col("t1_doc"))
    )
    middle = (rate < F.col("t2_rate")) | (
        (rate == F.col("t2_rate")) & (doc <= F.col("t2_doc"))
    )
    return (
        scored.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "n_bigrams",
            "n_improbable",
            "improbable_rate",
            F.when(head, "head")
            .when(middle, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Incremental ExactSubstr — base+delta spans without re-walking base
# ===========================================================================
#
# The delta batch mirrors doc_snapshot_dedup's framing: the corpus is
# yesterday's base (doc_id % 5 != 4), today's fresh documents
# (doc_id % 5 == 4), and verbatim re-crawls of every doc_id % 25 == 0
# base document re-submitted under doc_id + 1,000,000 — so
# cross-snapshot duplication genuinely occurs at every catalog SF
# (a re-crawl of a ≥50-token doc is a full-length removal span).
# delta(d) ⟺ d % 5 == 4 or d ≥ 1,000,000.
#
# The suffix array is built over base+delta (a combined-corpus build,
# memoized per session+sf and cleared per bench rep like the r9 SA).
# A true merged-SA update was MEASURED against the rebuild rather than
# assumed away (r11 verdict, What's missing #4 — PROBE_XSI.json):
# update floor = delta-only build (2.9 s) + one combined ranking pass
# (0.34 s, any merge must emit the merged total order) + rank
# PLACEMENT of delta suffixes into the stored base order, which in
# Spark is ⌈log₂ n_base⌉ = 15 batched binary-search join stages whose
# cost floor is stage overhead (~0.3-0.5 s each, data-independent) —
# ≈ 8-10 s total vs the measured 4.8 s rebuild. Rebuild wins at
# catalog SFs because stage overhead dominates 28k-position passes.
# Round 13 prototyped the placement as a batched binary search
# (string-compare probes) and read a 3.4% single-shot crossover at
# 100×; round 14 REPLACED the prototype with the PRODUCTION shape —
# comparison through the stored rank LADDER
# (operators/suffix.extend_delta_states + place_delta_ranks +
# delta_base_lcp; the pair maps / cumsums / top-class frame persist
# WITH the base as suffix.ladder_artifacts) — and re-measured under
# min-of-2 with ALTERNATING leg order (the r13 ADVICE: the single-shot
# margin sat inside the session-noise floor). PROBE_XSI.json
# placement_{10,30,100}x_sf0.01, all with e2e_spans_identical=true:
#   10×  (286k pos): rebuild 11.0 vs update 13.5 — rebuild;
#                    end-to-end spans 18.2 vs 21.0 — rebuild;
#   30×  (858k pos): rebuild 18.6 vs update 18.0 — UPDATE;
#                    end-to-end spans 36.7 vs 28.0 — UPDATE;
#   100× (2.86M):    rebuild 41.6 vs update 28.2 — UPDATE;
#                    end-to-end spans 63.9 vs 60.0 — UPDATE.
# The crossover lands between 10× and 30× of sf0.01 (placement itself
# reads 7.2/9.7/15.5 s — |delta|-width joins against the stored
# artifacts); the honest flip side: the fair protocol REFUTED the r13
# component-level "update wins at 100×" as a cold-rebuild artifact
# (rebuild reads 41.6 there, not 47.4). Since round 15 the path choice
# is CORPUS-DERIVED (_xsi_route below): combined positions ≥
# _XSI_STORED_MIN_POS with delta share ≤ _XSI_STORED_MAX_DELTA_FRAC
# (the PROBE_XSI proven-win regime) route to the stored-base path
# automatically, SPARK_GRAFT_XSI_PATH overrides both ways, and catalog
# SFs (≈29k positions at sf0.01) keep the rebuild.
# The stored-base path also serves as its own driver-gated entries
# (catalog_r14). The build also now stops at the
# Manber–Myers FIXPOINT (operators/suffix.py stability exit): on this
# corpus the verbatim re-crawls keep classes refining to full depth,
# so the exit saves only the final redundant level, but a
# heavier-duplication corpus stabilizes early and the walk stays exact
# via the top-level identical-tail sentinel
# (test_sa_stability_exit_fires_and_walk_stays_exact).
# The INCREMENTAL claim lives in the walk: adjacent-pair LCP rows are
# filtered to pairs touching a delta position BEFORE the log(max_len)
# refinement chain, so the walk processes O(|delta positions|) pairs —
# for a delta position, BOTH its array neighbors survive the filter,
# so m(p) (the max over the two) is exact; base-only pairs are never
# re-walked. Spans then emit for delta documents only.

_XSI_MODELS: dict[tuple, tuple] = {}

_XSI_CORPUS_SQL = """
      select doc_id, text from documents
      union all
      select doc_id + 1000000 as doc_id, text from documents
      where doc_id % 25 = 0
"""


def _xsi_delta(c: F.Column) -> F.Column:
    return (c % 5 == 4) | (c >= 1000000)


def _xsi_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from idh_etl_demo_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return corpus.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )


# The stored-base path's activation regime — BOTH constants from
# measurement, and the default routes stored only INSIDE the measured
# regime (outside it a user pays the known-good rebuild, never an
# unproven artifact build):
#
# - _XSI_STORED_MIN_POS: combined positions (base + delta tokens) at
#   the PROVEN-win floor. PROBE_XSI.json (min-of-2, alternating legs)
#   measured rebuild winning at 10× of sf0.01 (286k positions) and
#   the update path winning from 30× (858k) up; the bracket between
#   is unmeasured, so the floor is 858k, not an interpolated midpoint.
# - _XSI_STORED_MAX_DELTA_FRAC: the update's win is conditional on the
#   delta being a small share of the corpus — it pays the delta-only
#   build PLUS placement PLUS the merge floor, so as delta → corpus
#   the update degenerates to "rebuild plus overhead". PROBE_XSI
#   measures wins at delta share 0.216; the r15 scale sweep supplied
#   the counterexample the day the size-only gate landed (the 10×
#   union corpus reads 2.86M positions but ~90% delta — auto-stored
#   ran 104-126 s where rebuild runs ~64 s, reproduced standalone
#   over 3 reps). The bound sits just above the measured-win share;
#   between 0.25 and 0.9 is unmeasured, so it defaults to rebuild.
_XSI_STORED_MIN_POS = 858_000
_XSI_STORED_MAX_DELTA_FRAC = 0.25


def _xsi_route(n_base_pos: int, n_delta_pos: int, flag: str | None) -> str:
    """The incremental-ExactSubstr path choice, as a pure function so
    the flips are unit-testable: explicit flag wins both ways;
    otherwise the measured regime decides ("auto") — big enough AND
    delta-dominated-enough-not."""
    if flag in ("stored", "rebuild"):
        return flag
    total = n_base_pos + n_delta_pos
    if total <= 0:
        return "rebuild"
    if total >= _XSI_STORED_MIN_POS and (
        n_delta_pos / total <= _XSI_STORED_MAX_DELTA_FRAC
    ):
        return "stored"
    return "rebuild"


def _xsi_parts(spark: SparkSession, sf_dir: str) -> tuple:
    from idh_etl_demo_spark.operators.suffix import suffix_ranks

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _XSI_MODELS:
        _XSI_MODELS[key] = suffix_ranks(_xsi_base(spark, sf_dir))
    return _XSI_MODELS[key]


@query(
    "doc_exact_substr_incremental",
    f"""
    with corpus as ({_XSI_CORPUS_SQL}),
    {_xs_oracle_m("corpus")},
    iv as (
      select doc_id, pos as s, pos + m as e from m
      where m >= {_XS_T} and (doc_id % 5 = 4 or doc_id >= 1000000)
    ),
    {_XS_SPANS_TAIL_SQL}
    """,
)
def doc_exact_substr_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ExactSubstr cut (section comment): maximal removal
    spans for the DELTA snapshot only, where a span is any ≥{T}-token
    run occurring anywhere else in base+delta — a re-crawled document
    duplicates its base original end to end, a fresh document can
    duplicate base text, other delta text, or itself. Output:
    (doc_id, span_start, span_end, span_len) over delta doc_ids;
    base documents never appear and their positions are never
    re-walked (suffix_lcp_adjacent's pair_filter drops base-only
    adjacent pairs before the refinement chain).

    The oracle re-derives the spans from the sorted-suffix-list array
    over ITS OWN combined corpus (direct list comparison) and applies
    the identical interval algebra — the independent-algorithm gate of
    the whole suffix family.

    Scale shape: the combined-corpus SA build is the r9 prefix-doubling
    chain (log(max_len) id-width rounds); the walk is the SAME
    log-bounded join chain over the FILTERED pair frame —
    O(|delta positions|) rows, the incremental claim — then one m(p)
    groupBy, a sparse ≥{T} filter, and two per-doc windows. Token
    arrays never shuffle; the per-doc length table joins plain (never
    broadcast — corpus-cardinality)."""
    import os

    # r14 verdict ask #2: the measured break-even wired in as a
    # CORPUS-DERIVED default. In "auto" (the default) the builder
    # counts base and delta positions (ONE conditional-sum aggregate
    # over the tokenizing scan — this entry is EAGER_EXEMPT) and
    # routes to the stored-base update path
    # (catalog_r14.doc_exact_substr_stored_base — same relation,
    # parity-pinned by test_xsi_stored_base_parity) only inside the
    # measured regime: total ≥ _XSI_STORED_MIN_POS AND delta share ≤
    # _XSI_STORED_MAX_DELTA_FRAC (see the constants' comment — a
    # size-only gate mis-routed the 90%-delta sweep corpus). The flag
    # still overrides BOTH ways (SPARK_GRAFT_XSI_PATH=stored|rebuild).
    # Routing logic is the pure _xsi_route
    # (test_xsi_route_flips_at_threshold pins both flips).
    flag = os.environ.get("SPARK_GRAFT_XSI_PATH")
    if flag in ("stored", "rebuild"):
        # explicit override: the counts are never consulted, so don't
        # pay the tokenizing scan for them (review r15: the flag path
        # is exactly the large-corpus escape hatch where a wasted
        # corpus-wide job per evaluation hurts most)
        n_base_pos = n_delta_pos = 0
    else:
        row = (
            _xsi_base(spark, sf_dir)
            .agg(
                F.sum(
                    F.when(
                        _xsi_delta(F.col("doc_id")), F.size("toks")
                    ).otherwise(0)
                ).alias("nd"),
                F.sum(
                    F.when(
                        ~_xsi_delta(F.col("doc_id")), F.size("toks")
                    ).otherwise(0)
                ).alias("nb"),
            )
            .collect()[0]
        )
        n_base_pos, n_delta_pos = int(row.nb or 0), int(row.nd or 0)
    if _xsi_route(n_base_pos, n_delta_pos, flag) == "stored":
        from idh_etl_demo_spark.catalog import ENTRIES as _E

        import idh_etl_demo_spark.catalog_r14  # noqa: F401 (registers)

        return _E["doc_exact_substr_stored_base"].spark(spark, sf_dir)

    from idh_etl_demo_spark.operators.suffix import (
        dup_len_per_position,
        merge_intervals,
        suffix_lcp_adjacent,
    )

    final, history, posf = _xsi_parts(spark, sf_dir)
    lens = _xsi_base(spark, sf_dir).select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    pairs = suffix_lcp_adjacent(
        final,
        history,
        posf,
        lens,
        pair_filter=_xsi_delta(F.col("d1")) | _xsi_delta(F.col("d2")),
    )
    m = dup_len_per_position(pairs).filter(_xsi_delta(F.col("doc_id")))
    iv = m.filter(F.col("m") >= _XS_T).select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.col("m")).alias("e"),
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


# ===========================================================================
# URL-level bloom dedup with a counting false-positive audit
# ===========================================================================
#
# Crawl pipelines dedup at the URL level before fetching or processing
# content: the seen-URL registry is far too large to broadcast exactly,
# so the standard shape is a bloom filter — membership says "probably
# seen, drop it", non-membership says "definitely new, keep it". The
# filter's false positives are GENUINELY NEW urls that get wrongly
# dropped: lost fresh content, the operating cost of the m-bits sizing.
# This entry makes that cost a measured output: every batch URL carries
# its bloom verdict AND the exact-join truth, and the corpus-level
# false-positive rate (FPs / exactly-new) rides every row — the same
# measured-estimate-vs-exact audit pattern as doc_minhash_estimate_audit.
#
# The filter is DELIBERATELY fixed at m = 2^14 bits (k = 2) so the
# audit shows the fill/fp trade as the registry grows: ~0.2% expected
# fp at the 500-doc catalog SFs (400 seen urls), double-digit at
# sf0.1's 4,000 — the number a production sizing review reads.
# Positions/masks are the md5-slice arithmetic of operators/bloom.py,
# replicated exactly in the DuckDB oracle ('0x' || hex-slice casts),
# so the bitmap is bit-identical in both engines and every verdict
# hash-gates.

_UB_M = 16384
_UB_K = 2
_UB_URL = "https://corpus.example/doc/"


@query(
    "doc_url_bloom_dedup",
    f"""
    with seen as (
      select distinct '{_UB_URL}' || cast(doc_id as varchar) as url
      from documents where doc_id % 5 != 4
    ),
    batch as (
      select doc_id, '{_UB_URL}' || cast(doc_id as varchar) as url
      from documents where doc_id % 5 = 4
      union all
      select doc_id + 1000000 as doc_id,
             '{_UB_URL}' || cast(doc_id as varchar) as url
      from documents where doc_id % 25 = 0
    ),
    buildpos as (
      select ('0x' || substring(md5(url), 1, 8))::bigint % {_UB_M} as p from seen
      union all
      select ('0x' || substring(md5(url), 9, 8))::bigint % {_UB_M} as p from seen
    ),
    words as (
      select p // 32 as widx,
             bit_or(cast(pow(2, p % 32) as bigint)) as bits
      from buildpos group by p // 32
    ),
    probepos as (
      select url, ('0x' || substring(md5(url), 1, 8))::bigint % {_UB_M} as p
      from (select distinct url from batch)
      union all
      select url, ('0x' || substring(md5(url), 9, 8))::bigint % {_UB_M} as p
      from (select distinct url from batch)
    ),
    member as (
      select pp.url,
             bool_and(coalesce(w.bits, 0) & cast(pow(2, pp.p % 32) as bigint)
                      != 0) as bloom_seen
      from probepos pp left join words w on w.widx = pp.p // 32
      group by pp.url
    ),
    verdicts as (
      select b.doc_id, b.url, m.bloom_seen,
             s.url is not null as exact_seen,
             m.bloom_seen and s.url is null as false_positive
      from batch b
      join member m using (url)
      left join seen s using (url)
    ),
    summary as (
      select cast(sum(case when not exact_seen then 1 else 0 end) as bigint)
               as n_new_exact,
             cast(sum(case when false_positive then 1 else 0 end) as bigint)
               as n_false_positives
      from verdicts
    )
    select v.doc_id, v.url, v.bloom_seen, v.exact_seen, v.false_positive,
           s.n_new_exact, s.n_false_positives,
           case when s.n_new_exact > 0
                then s.n_false_positives * 1.0 / s.n_new_exact
                else 0.0 end as fp_rate
    from verdicts v cross join summary s
    order by v.doc_id
    """,
)
def doc_url_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level approximate-membership dedup of an incoming snapshot
    against the seen-URL registry, with the counting audit (section
    comment): per batch document the bloom verdict, the exact truth,
    and the false-positive flag; every row also carries the measured
    corpus-level n_new_exact / n_false_positives / fp_rate. A bloom
    filter has NO false negatives, so every exact_seen row must be
    bloom_seen — the property test pins it and the oracle hash-gate
    re-proves it corpus-wide on every run.

    Output: (doc_id, url, bloom_seen, exact_seen, false_positive,
    n_new_exact, n_false_positives, fp_rate), ordered by doc_id.

    Scale shape: the registry folds into an m/32-word bitmap ONCE
    (bit_or aggregate — ≤ m/32 rows shuffle) and broadcasts ~2 KB per
    executor; the batch side evaluates membership as a pure projection
    and only the exact-truth join touches the registry again —
    URL-keyed plain hash join (never broadcast: the registry is
    corpus-cardinality). In the production shape that exact join runs
    on the bloom SURVIVORS only; the audit joins every batch row
    because measuring the fp rate IS this entry's job."""
    from idh_etl_demo_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    docs = _t(spark, sf_dir, "documents")
    url_of = lambda c: F.concat(F.lit(_UB_URL), c.cast("string"))  # noqa: E731
    seen = (
        docs.filter(F.col("doc_id") % 5 != 4)
        .select(url_of(F.col("doc_id")).alias("url"))
        .distinct()
    )
    batch = (
        docs.filter(F.col("doc_id") % 5 == 4)
        .select("doc_id", url_of(F.col("doc_id")).alias("url"))
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                url_of(F.col("doc_id")).alias("url"),
            )
        )
    )
    bf = bloom_build(seen, "url", m_bits=_UB_M, k=_UB_K)
    verdicts = (
        batch.crossJoin(F.broadcast(bf))
        .withColumn(
            "bloom_seen",
            bloom_might_contain(F.col("url"), F.col("bf"), _UB_M, _UB_K),
        )
        .drop("bf")
        .join(seen.withColumn("exact_seen", F.lit(True)), "url", "left")
        .select(
            "doc_id",
            "url",
            "bloom_seen",
            F.coalesce(F.col("exact_seen"), F.lit(False)).alias("exact_seen"),
            (
                F.col("bloom_seen")
                & ~F.coalesce(F.col("exact_seen"), F.lit(False))
            ).alias("false_positive"),
        )
    )
    summary = verdicts.agg(
        F.sum((~F.col("exact_seen")).cast("long"))
        .cast("long")
        .alias("n_new_exact"),
        F.sum(F.col("false_positive").cast("long"))
        .cast("long")
        .alias("n_false_positives"),
    )
    return (
        verdicts.crossJoin(F.broadcast(summary))
        .select(
            "doc_id",
            "url",
            "bloom_seen",
            "exact_seen",
            "false_positive",
            "n_new_exact",
            "n_false_positives",
            F.when(
                F.col("n_new_exact") > 0,
                F.col("n_false_positives").cast("double")
                / F.col("n_new_exact").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("fp_rate"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Incremental view maintenance — the delta rules that keep a 100 TB
# materialization fresh without rescanning it
# ===========================================================================
#
# The SCD2/CDC pair (catalog_r10) gates CHANGELOG semantics; this pair
# gates the other half of lakehouse table maintenance: INCREMENTAL VIEW
# MAINTENANCE (Blakeley et al. 1986; the DBSP/Materialize delta
# algebra). Two classic rules, each PROVED by the oracle being the full
# recompute — a value-hash match shows the incremental plan equals
# rescanning from scratch, which is the entire IVM contract:
#
# - AGGREGATE maintenance: new_state = merge(old_state, agg(delta)) for
#   self-mergeable aggregates (count/sum/min/max — avg derives from
#   sum/count). count(distinct) is deliberately NOT here: it is not
#   mergeable from per-batch states, which is exactly why the sketch
#   entries (events_distinct_users_hll, orderkey_distinct_kmv) exist.
# - JOIN maintenance: Δ(O ⋈ C) = ΔO⋈C₀ ∪ O₀⋈ΔC ∪ ΔO⋈ΔC — the bilinear
#   delta rule; the maintained view is the base view plus the three
#   delta terms, disjoint by construction when deltas are inserts of
#   NEW keys.
#
# Deltas derive deterministically from the tables: orders with
# o_orderkey % 7 == 0 are "today's inserts", customers with
# c_custkey % 9 == 0 are "today's new accounts" (their orders are
# backdated inserts too, else the join view would orphan them).


@query(
    "orders_ivm_agg",
    """
    select o_custkey,
           cast(count(*) as bigint) as n_orders,
           cast(sum(cast(round(o_totalprice * 100, 0) as bigint)) as bigint)
             as total_cents,
           cast(max(cast(round(o_totalprice * 100, 0) as bigint)) as bigint)
             as max_cents,
           sum(cast(round(o_totalprice * 100, 0) as bigint)) * 1.0 / count(*)
             as avg_cents
    from orders
    group by o_custkey
    order by o_custkey
    """,
)
def orders_ivm_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental AGGREGATE maintenance (section comment): the
    maintained per-customer state is merge(agg(base), agg(delta)) —
    counts and sums add, max takes the greatest, avg derives from the
    merged sum/count — while the ORACLE recomputes the aggregate over
    the full table. The driver's value-hash equality IS the IVM
    theorem instance: maintaining the state from the delta equals
    rescanning 100 TB, so you never rescan. Output: (o_custkey,
    n_orders, total_cents, max_cents, avg_cents).

    Engine parity: integer cents end to end; avg is ONE IEEE division
    of two exact int64 merges (never a running float mean).

    Scale shape: in production the base state is a STORED |keys|-row
    table (here derived in-plan from the base split — the derivation
    stands in for the stored snapshot); only the DELTA shuffles raw
    rows (one map-side-combined groupBy), and the merge is a key-keyed
    outer join of two aggregate states. Nothing rescans the base fact
    table at maintenance time."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderkey").alias("k"), cents.alias("cents")
    )

    def agg_state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.max("cents").cast("long").alias("mx"),
        )

    base_state = agg_state(orders.filter(F.col("k") % 7 != 0))
    delta_state = agg_state(orders.filter(F.col("k") % 7 == 0))
    b = base_state.select(
        "o_custkey",
        F.col("n").alias("bn"),
        F.col("s").alias("bs"),
        F.col("mx").alias("bmx"),
    )
    d = delta_state.select(
        "o_custkey",
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
        F.col("mx").alias("dmx"),
    )
    merged = b.join(d, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (F.coalesce("bs", F.lit(0)) + F.coalesce("ds", F.lit(0)))
        .cast("long")
        .alias("total_cents"),
        F.greatest(
            F.coalesce("bmx", F.lit(-(1 << 62))),
            F.coalesce("dmx", F.lit(-(1 << 62))),
        )
        .cast("long")
        .alias("max_cents"),
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        "total_cents",
        "max_cents",
        (
            F.col("total_cents").cast("double")
            / F.col("n_orders").cast("double")
        ).alias("avg_cents"),
    ).orderBy("o_custkey")


def _ivmj_splits(spark: SparkSession, sf_dir: str):
    """(o_base, o_delta, c_base, c_delta, term) for the bilinear delta
    rule. ΔO = orders with o_orderkey % 7 == 0 plus EVERY order of a
    new customer (a new account's orders arrive with it); ΔC =
    customers with c_custkey % 9 == 0."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_mktsegment",
    )
    new_cust = F.col("c_custkey") % 9 == 0
    c_base = cust.filter(~new_cust)
    c_delta = cust.filter(new_cust)
    # an order is delta if it is today's insert OR belongs to a new
    # customer (whose whole history arrives with the account)
    o_is_delta = (F.col("o_orderkey") % 7 == 0) | (
        F.col("o_custkey") % 9 == 0
    )
    o_base = orders.filter(~o_is_delta)
    o_delta = orders.filter(o_is_delta)

    def term(o: DataFrame, c: DataFrame) -> DataFrame:
        return o.join(
            c, o["o_custkey"] == c["c_custkey"], "inner"
        ).select("o_orderkey", "o_custkey", "c_nationkey", "c_mktsegment", "cents")

    return o_base, o_delta, c_base, c_delta, term


# (applicationId, sf_dir) → stored-base-view DataFrame. The round-11
# verdict's wrong #3: deriving the base view in-plan as Ob⋈Cb made the
# benched plan recompute the exact join IVM exists to avoid. The base
# view is now MATERIALIZED to parquet once per (session, sf) — the
# stored production table — and maintenance scans it; the memo holds
# the post-write read DataFrame so warm calls run zero jobs
# (test_builders_are_lazy_no_actions). Scratch dirs register with the
# r10 streaming-workdir reaper (atexit + bench cache release).
_IVMJ_BASE: dict[tuple, DataFrame] = {}


def _ivmj_stored_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVMJ_BASE:
        import os
        import tempfile

        from idh_etl_demo_spark.catalog_r10 import (
            _STREAM_MEMOS,
            _register_stream_workdir,
        )

        # IDENTITY check, not `in`: list membership compares dicts by
        # VALUE, and two empty memo dicts are equal — with any other
        # streaming memo already registered, `in` would skip this
        # registration and release_stream_workdirs() would delete the
        # parquet dir while the memo kept serving the dangling path
        # (caught by test_ivmj_stored_base_survives_cache_release run
        # after a streaming test in the same session).
        if not any(m is _IVMJ_BASE for m in _STREAM_MEMOS):
            _STREAM_MEMOS.append(_IVMJ_BASE)
        workdir = tempfile.mkdtemp(prefix="ivmj_base_")
        _register_stream_workdir(workdir)
        path = os.path.join(workdir, "base_view.parquet")
        o_base, _, c_base, _, term = _ivmj_splits(spark, sf_dir)
        term(o_base, c_base).write.mode("overwrite").parquet(path)
        _IVMJ_BASE[key] = spark.read.parquet(path)
    return _IVMJ_BASE[key]


@query(
    "orders_ivm_join",
    """
    select o.o_orderkey, o.o_custkey,
           cast(c.c_nationkey as bigint) as c_nationkey,
           c.c_mktsegment,
           cast(round(o.o_totalprice * 100, 0) as bigint) as cents
    from orders o join customer c on c.c_custkey = o.o_custkey
    order by o.o_orderkey
    """,
)
def orders_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (section comment): the
    orders⋈customer view is maintained as stored_base ∪ ΔO⋈C₀ ∪
    O₀⋈ΔC ∪ ΔO⋈ΔC — the bilinear delta rule — while the oracle
    recomputes the full join; value-hash equality proves the three
    delta terms recover every new row exactly once on top of the
    stored snapshot. Deltas: ΔO = orders with o_orderkey % 7 == 0 plus
    EVERY order of a new customer (a new account's orders arrive with
    it); ΔC = customers with c_custkey % 9 == 0. The terms are
    disjoint by construction (an order row is base or delta, never
    both; a customer key is old or new), pinned by the property test.
    Output: one row per joined order,
    (o_orderkey, o_custkey, c_nationkey, c_mktsegment, cents).

    Scale shape: the base view is STORED — materialized to parquet
    once per (session, sf) by _ivmj_stored_base (the round-11
    verdict's wrong #3: the old in-plan Ob⋈Cb derivation made the
    benched plan recompute the exact join IVM exists to avoid). The
    maintenance-time plan therefore contains NO base⋈base join
    (asserted by test_ivm_join_plan_has_no_base_base_join): it scans
    the stored view, ΔO⋈C₀ and ΔO⋈ΔC shuffle only the delta orders
    against the customer dimension, and O₀⋈ΔC probes the base orders
    with a |ΔC|-row build side. The union is append-only, the
    Delta/Iceberg incremental-refresh shape."""
    o_base, o_delta, c_base, c_delta, term = _ivmj_splits(spark, sf_dir)
    view = (
        _ivmj_stored_base(spark, sf_dir)
        .unionByName(term(o_delta, c_base))
        .unionByName(term(o_base, c_delta))
        .unionByName(term(o_delta, c_delta))
    )
    return view.orderBy("o_orderkey")


# ===========================================================================
# LSH parameter tuning — the S-curve, measured per configuration
# ===========================================================================
#
# Banded MinHash's collision probability is the S-curve
# P(candidate | jaccard j) = 1 − (1 − j^r)^b: rows-per-band r sets the
# curve's steepness (precision), band count b its left shift (recall).
# Choosing (b, r) is THE design decision of LSH dedup at 100 TB — too
# loose and the verification join drowns in candidates, too strict and
# near-dups survive. This audit MEASURES the trade on the real corpus:
# for every (b, r) split of the same 12-hash signature it counts
# candidates, hits against the exact-Jaccard truth set (the
# doc_ngram_jaccard chain, threshold 0.5), misses, and the resulting
# precision/recall — the table a production sizing review reads before
# committing a banding. Uncapped buckets: the audit measures the pure
# S-curve (the hot-bucket CAP is a separate production knob whose
# recall loss doc_lsh_audit already measures).
#
# The 12-hash grid is nested so subset relations are THEOREMS the
# property test pins: a (3,4) collision (4 aligned agreeing rows)
# always contains a complete (6,2) band, and a (2,6) collision a
# complete (4,3) band — so candidates(2,6) ⊆ candidates(4,3) ⊆
# candidates(6,2) and candidates(3,4) ⊆ candidates(6,2); candidate
# counts and recall are monotone along those chains.

_LSH_GRID = [(2, 6), (3, 4), (4, 3), (6, 2)]  # (bands, rows) · 12 hashes


def _lsh_tuning_sql() -> str:
    import idh_etl_demo_spark.catalog_llm as llm
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.functions.hashing import (
        MERSENNE_31,
        MINHASH_PARAMS,
    )

    h = llm._MD5_LONG.format(x="s")
    sig_cols = ", ".join(
        f"coalesce(list_min(list_transform(sh, s -> ({a} * ({h} % {MERSENNE_31})"
        f" + {b}) % {MERSENNE_31})), {MERSENNE_31}) as mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS[:12])
    )
    pair_cols = ", ".join(
        f"a.mh{i} as a{i}, b.mh{i} as b{i}" for i in range(12)
    )

    def collide(bands: int, rows: int) -> str:
        terms = []
        for bidx in range(bands):
            eqs = " and ".join(
                f"a{bidx * rows + r} = b{bidx * rows + r}" for r in range(rows)
            )
            terms.append(f"({eqs})")
        return " or ".join(terms)

    legs = []
    for bands, rows in _LSH_GRID:
        c = collide(bands, rows)
        legs.append(f"""
    select {bands}::bigint as bands, {rows}::bigint as rows_per_band,
           cast(sum(case when {c} then 1 else 0 end) as bigint) as n_candidates,
           (select n_true from tc) as n_true_pairs,
           cast(sum(case when ({c}) and is_true then 1 else 0 end) as bigint)
             as n_hits,
           (select n_true from tc)
             - cast(sum(case when ({c}) and is_true then 1 else 0 end) as bigint)
             as n_missed,
           case when sum(case when {c} then 1 else 0 end) > 0
                then sum(case when ({c}) and is_true then 1 else 0 end) * 1.0
                     / sum(case when {c} then 1 else 0 end)
                else 0.0 end as precision,
           case when (select n_true from tc) > 0
                then sum(case when ({c}) and is_true then 1 else 0 end) * 1.0
                     / (select n_true from tc)
                else 0.0 end as recall
    from marked""")
        # the ORACLE is the brute-force pair predicate (all doc pairs,
        # band agreement evaluated directly on the signature columns) —
        # the banding bucket-join lives only on the Spark side, so the
        # hash gate proves banding ≡ the S-curve predicate corpus-wide
    truth = ENTRIES["doc_ngram_jaccard"].oracle
    return f"""
    with truth0 as (select id_a, id_b from ({truth})),
    tc as (select count(*)::bigint as n_true from truth0),
    docs as (select doc_id, {llm._WORDS} as words from documents),
    sets as (select doc_id, {llm._SHINGLES3} as sh from docs),
    sigs as (select doc_id, {sig_cols} from sets),
    pairs as (
      select a.doc_id as id_a, b.doc_id as id_b, {pair_cols}
      from sigs a join sigs b on a.doc_id < b.doc_id
    ),
    marked as (
      select p.*, t.id_a is not null as is_true
      from pairs p left join truth0 t
        on t.id_a = p.id_a and t.id_b = p.id_b
    )
    select * from ({' union all '.join(legs)})
    order by bands
    """


@query("doc_lsh_tuning_audit", _lsh_tuning_sql())
def doc_lsh_tuning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-curve measured per (bands, rows) configuration of the
    same 12-hash MinHash signature (section comment): candidate count,
    hits against the exact-Jaccard ≥ 0.5 truth set, misses, precision
    and recall — one row per grid point, the banding-design table.
    (4, 3) is doc_minhash_candidates' production configuration, so its
    row prices the shipped choice against both neighbors.

    The Spark side generates candidates with the REAL banding machinery
    (the operator's group-then-expand shape), run as ONE pass: every
    configuration's band keys are prefixed with its config id and
    exploded from the SAME signature frame, so the corpus is signed
    once and one band-key groupBy serves all four grid points — per
    config the keys (and therefore buckets, pairs, candidates) are
    identical to a standalone minhash_lsh_candidates run, uncapped.
    The oracle evaluates band agreement as a brute-force predicate
    over all signature pairs — hash equality proves the bucket join
    realizes exactly the S-curve predicate.

    Scale shape: one signature projection over the corpus (not one
    per config), one config-prefixed band-key groupBy + in-bucket
    expand + per-config distinct, ONE candidate-keyed join against the
    truth set (the probed doc_ngram_jaccard shingle equi-join), and
    two 4-row config rollups. Counts are |pairs|-bounded;
    precision/recall are single IEEE divisions of exact int64
    counts."""
    from idh_etl_demo_spark.operators.dedup import (
        minhash_signature_cols,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    truth = ngram_jaccard_pairs(
        docs, threshold=0.5, num_partitions=par
    ).select("id_a", "id_b")
    tc = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    sigs = minhash_signature_cols(docs.repartition(par), "text", 12)
    band_cols = []
    for bands, rows in _LSH_GRID:
        for b in range(bands):
            band_cols.append(
                F.concat_ws(
                    "_",
                    F.lit(f"{bands}x{rows}"),
                    F.lit(b),
                    *[F.col(f"mh{b * rows + r}") for r in range(rows)],
                )
            )
    # explode_outer + filter, like the operator: explode's implicit
    # non-empty filter would re-evaluate the signature expressions
    # below the repartition exchange
    banded = sigs.select(
        "doc_id", F.explode_outer(F.array(*band_cols)).alias("band_key")
    ).filter(F.col("band_key").isNotNull())
    grouped = (
        banded.groupBy("band_key")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids)),
                lambda y: F.struct(
                    F.get(ids, i - 1).alias("id_a"), y.alias("id_b")
                ),
            ),
        )
    )
    cand = (
        grouped.select(
            F.split(F.col("band_key"), "_").getItem(0).alias("cfg"),
            F.explode(combos).alias("p"),
        )
        .select("cfg", "p.id_a", "p.id_b")
        .distinct()
    )
    counts = cand.groupBy("cfg").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    hits = (
        cand.join(truth, ["id_a", "id_b"])
        .groupBy("cfg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    grid = spark.createDataFrame(
        [(f"{b}x{r}", b, r) for b, r in _LSH_GRID],
        "cfg string, bands long, rows_per_band long",
    )
    return (
        grid.join(F.broadcast(counts), "cfg", "left")
        .join(F.broadcast(hits), "cfg", "left")
        .select(
            "bands",
            "rows_per_band",
            F.coalesce("n_candidates", F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
        .crossJoin(F.broadcast(tc))
        .select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_true_pairs",
            "n_hits",
            (F.col("n_true_pairs") - F.col("n_hits"))
            .cast("long")
            .alias("n_missed"),
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_candidates").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("precision"),
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_true_pairs").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
        )
        .orderBy("bands")
    )


# ===========================================================================
# Robust winsorization — nearest-rank percentile clipping per group
# ===========================================================================
#
# The MAD entry flags outliers; feature PREPROCESSING usually clips
# them instead (winsorization at p01/p99) so a fat tail cannot dominate
# a normalization or a loss. Exact nearest-rank percentiles — integer
# ranks lo = (n−1)//100 + 1 and hi = (99·(n−1))//100 + 1 over sorted
# cents, pure int64 arithmetic in both engines — found with the same
# per-flag two-phase bucketed rank as lineitem_mad_outliers (no
# 3-value partition key ever funnels a sort).


@query(
    "lineitem_winsorized_stats",
    """
    with src as (
      select l_returnflag as flag,
             cast(round(l_extendedprice * 100, 0) as bigint) as cents
      from lineitem
    ),
    r as (
      select flag, cents,
             row_number() over (partition by flag order by cents) as rn,
             count(*) over (partition by flag) as n
      from src
    ),
    bounds as (
      select flag, max(n) as n,
             max(case when rn = (n - 1) // 100 + 1 then cents end) as lo,
             max(case when rn = (99 * (n - 1)) // 100 + 1 then cents end) as hi
      from r group by flag
    )
    select s.flag,
           cast(b.n as bigint) as n,
           cast(b.lo as bigint) as p01_cents,
           cast(b.hi as bigint) as p99_cents,
           cast(sum(case when s.cents < b.lo then 1 else 0 end) as bigint)
             as n_clipped_low,
           cast(sum(case when s.cents > b.hi then 1 else 0 end) as bigint)
             as n_clipped_high,
           cast(sum(s.cents) as bigint) as sum_cents,
           cast(sum(least(greatest(s.cents, b.lo), b.hi)) as bigint)
             as sum_winsorized_cents
    from src s join bounds b using (flag)
    group by s.flag, b.n, b.lo, b.hi
    order by s.flag
    """,
)
def lineitem_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag winsorization audit (section comment): exact
    nearest-rank p01/p99 price-cents bounds, the clip counts on each
    side, and the raw vs winsorized sums — the before/after a feature
    pipeline records when it clips a fat tail. Output: (flag, n,
    p01_cents, p99_cents, n_clipped_low, n_clipped_high, sum_cents,
    sum_winsorized_cents), all int64.

    Scale shape: ONE per-flag two-phase bucketed ranking pass
    (lineitem_mad_outliers' shape — extrema-derived buckets,
    per-(flag, bucket) local windows, 3×256-row offset cumsum) finds
    both bounds; the clip pass is a projection + one map-side-combined
    groupBy against the 3-row broadcast bounds. The oracle ranks with
    a plain per-flag window — the independent (single-sort) derivation
    of the same nearest-rank values."""
    from idh_etl_demo_spark.catalog_r10 import _flag_bucketed_rank

    src = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    n_tab = src.groupBy("flag").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = _flag_bucketed_rank(src, "cents").join(F.broadcast(n_tab), "flag")
    bounds = (
        ranked.filter(
            (F.col("gr") == F.expr("(n - 1) div 100 + 1"))
            | (F.col("gr") == F.expr("(99 * (n - 1)) div 100 + 1"))
        )
        .groupBy("flag")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(
                F.when(
                    F.col("gr") == F.expr("(n - 1) div 100 + 1"),
                    F.col("cents"),
                )
            ).cast("long").alias("lo"),
            F.max(
                F.when(
                    F.col("gr") == F.expr("(99 * (n - 1)) div 100 + 1"),
                    F.col("cents"),
                )
            ).cast("long").alias("hi"),
        )
    )
    w = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        src.join(F.broadcast(bounds), "flag")
        .groupBy("flag", "n", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_high"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum(w).cast("long").alias("sum_winsorized_cents"),
        )
        .select(
            "flag",
            "n",
            F.col("lo").alias("p01_cents"),
            F.col("hi").alias("p99_cents"),
            "n_clipped_low",
            "n_clipped_high",
            "sum_cents",
            "sum_winsorized_cents",
        )
        .orderBy("flag")
    )
