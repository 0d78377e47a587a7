"""Catalog round 14 — the stored-base incremental ExactSubstr path as
driver-gated entries (the r13 verdict's asks #3/#4/#8 as queries).

- ``doc_exact_substr_stored_base``: the UPDATE path end-to-end — stored
  base suffix array + rank-ladder placement of the delta
  (operators/suffix.extend_delta_states / place_delta_ranks) + merged-
  order neighbor LCPs across the base/delta boundary
  (operators/suffix.delta_base_lcp) — producing EXACTLY the relation
  doc_exact_substr_incremental computes by combined rebuild. Shares the
  incremental entry's DuckDB oracle verbatim: one output spec, two
  independent Spark code routes, both hash-gated against the direct
  sorted-suffix-list re-derivation.
- ``doc_sa_placement_merged``: the merged total order itself, digested
  per document (count / sum / min / max / position-weighted checksum of
  merged ranks), so ANY single misplaced suffix flips the hash. The
  oracle re-derives merged ranks by sorting every combined-corpus
  suffix directly.

Reference: Lee et al. 2021 (ExactSubstr) builds and REBUILDS offline;
the stored-base path is the maintenance shape a 100 TB corpus needs —
the base order and its rank ladder are the persisted artifacts, a
daily delta pays |delta|-width joins only (plus the unavoidable one
merged ranking pass), never a base re-rank.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import query
from idh_etl_demo_spark.catalog_r9b import _SA_TOKS_SQL
from idh_etl_demo_spark.catalog_r10 import (
    _XS_SPANS_TAIL_SQL,
    _XS_T,
    _xs_oracle_m,
)
from idh_etl_demo_spark.catalog_r11 import (
    _XSI_CORPUS_SQL,
    _xsi_base,
    _xsi_delta,
)

# ===========================================================================
# Stored-base incremental ExactSubstr — the update path as a query
# ===========================================================================
#
# The r13 crossover measurement (PROBE_XSI.json) made the stored-base
# design's activation threshold a number; this round builds the design
# itself. The STORED ARTIFACT is the base build — final order + rank
# ladder (suffix_ranks' history IS the ladder; at 100 TB the per-level
# pair maps would be persisted alongside, as they materialize mid-round
# during the build anyway). The memo below is that artifact's
# stand-in, and it is deliberately NOT cleared per bench rep (the
# orders_ivm_join precedent: a stored input contract, not a flattered
# computation) — rep 1 pays the one-time base build + store, rep 2
# measures the UPDATE path the entry claims: delta-only build, ladder
# extension, placement, one merged ranking pass, |delta|-width walks.

_XSB_MODELS: dict[tuple, tuple] = {}


def _xsb_parts(spark: SparkSession, sf_dir: str) -> tuple:
    """Stored base artifacts per (session, sf): final order, rank
    ladder, position projection, per-doc lengths, the ladder's
    comparison artifacts (seed vocab + per-level pair maps/cumsums),
    the top-class frame, and the MANIFEST — driver scalars (position
    count, max document length) the build's own stats aggregate
    already collected, so no consumer ever re-counts the corpus to
    size buckets or bound walk loops (round 16, r15 verdict ask #6).
    Everything the 100 TB design persists at build time, so every
    per-update stage stays |delta|-width."""
    from idh_etl_demo_spark.operators.suffix import (
        ladder_artifacts,
        suffix_ranks,
        top_class_frame,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _XSB_MODELS:
        base_toks = _xsi_base(spark, sf_dir).filter(
            ~_xsi_delta(F.col("doc_id"))
        )
        # capture the build's byproducts (pair-map triples, final order
        # with its top class) so the artifact constructors below run
        # join-free over the build's own checkpoints (round 15 — the
        # values are identical, ladder_artifacts/top_class_frame
        # docstrings carry the equivalence argument)
        cap: dict = {}
        bf, bh, bp = suffix_ranks(base_toks, capture=cap)
        blens = base_toks.select(
            "doc_id", F.size("toks").cast("long").alias("n_tokens")
        )
        arts = ladder_artifacts(bh, bp, pair_levels=cap["pair_levels"])
        bf_top = top_class_frame(
            bf, bh, blens, final_top=cap["final_top"]
        ).localCheckpoint(eager=True)
        meta = {"npos": cap["npos"], "maxlen": cap["maxlen"]}
        _XSB_MODELS[key] = (bf, bh, bp, blens, arts, bf_top, meta)
    return _XSB_MODELS[key]


def merged_order_from(
    bparts: tuple,
    delta_toks: DataFrame,
    base_filter=None,
    delta_build: tuple | None = None,
) -> tuple[DataFrame, tuple]:
    """(merged, delta_parts): the merged total order over a stored base
    and an arbitrary delta — the delta-only build, the ladder
    extension + placement, one union and ONE bucketed ranking pass
    (the unavoidable merge floor; every other stage is |delta|-width).
    ``merged``: (doc_id, pos, tag, mr) with tag 1 on delta rows and mr
    the 1-based merged rank. Corpus-parameterized so the scale probe
    (tools/probe_xsi.py) runs the identical pipeline at 10×/30×/100×.

    ``base_filter``: optional TOMBSTONE predicate over the stored final
    order's columns — re-crawl deltas also REMOVE documents, and the
    removal must not touch the stored artifact (that is its point).
    Rows failing the filter are dropped from the merge UNION only; the
    ladder, the placement, and the insertion counts all stay in the
    ORIGINAL base rank space, which is sound because deleting rows
    never reorders survivors: a delta suffix with insertion count I
    still sorts before exactly the surviving base rows whose original
    rank exceeds I. The re-ranking pass then renumbers the SURVIVING
    union, so merged-adjacency (and hence the LCP span walk) skips
    tombstoned neighbors automatically. Compaction — re-running the
    store on the surviving corpus — is only an optimization to shed
    dead ladder rows; parity is exact without it
    (test_tombstone_merged_order_matches_surviving_rebuild,
    test_tombstone_whole_class_removed, and the driver-gated
    doc_exact_substr_tombstone). On a FOLDING cadence even that
    optimization is free: pass the same predicate to
    ``fold_xsb_parts`` and the fold's per-level dense re-rank sheds
    the dead rows itself, so tombstones never outlive the next fold
    (test_tombstone_fold_then_place_matches_surviving_rebuild).
    base_filter must be DOC-LEVEL (a predicate over doc_id) — the
    ladder machinery's dense-positions invariant (positions 0..n−1 per
    doc) survives whole-doc removals only; a position-level filter
    would silently mis-rank (operators/suffix._doubling_loop).

    ``delta_build``: optional pre-built (d_final, d_hist, d_pos, dcap)
    from ``suffix_ranks(delta_toks, capture=dcap)`` — the fold entry
    overlaps day-2's delta build with day-1's merge+fold on a driver
    thread (guide §2.6); passing it here avoids building twice."""
    from idh_etl_demo_spark.operators.suffix import (
        _NBUCKETS,
        _ranked_ckpt,
        extend_delta_states,
        place_delta_ranks,
        suffix_ranks,
    )

    bf, bh, bp, blens, arts, bf_top, bmeta = bparts
    if delta_build is None:
        dcap: dict = {}
        d_final, d_hist, d_pos = suffix_ranks(delta_toks, capture=dcap)
    else:
        d_final, d_hist, d_pos, dcap = delta_build
    dmeta = {"npos": dcap["npos"], "maxlen": dcap["maxlen"]}
    states = extend_delta_states(bh, bp, delta_toks, artifacts=arts)
    ins = place_delta_ranks(
        bf,
        bh,
        bp,
        blens,
        delta_toks,
        states=states,
        bf_top=bf_top,
        max_delta_len=dmeta["maxlen"],
    )
    b_side = bf if base_filter is None else bf.filter(base_filter)
    u = b_side.select(
        "doc_id",
        "pos",
        F.col("sa_rank").alias("k1"),
        F.lit(0).alias("tag"),
        F.lit(0).cast("long").alias("k2"),
    ).unionByName(
        d_final.join(ins, ["doc_id", "pos"]).select(
            "doc_id",
            "pos",
            F.col("ins").alias("k1"),
            F.lit(1).alias("tag"),
            F.col("sa_rank").alias("k2"),
        )
    )
    # bucket sizing needs only |union| — a DRIVER-KNOWN scalar since
    # round 16 (r15 verdict ask #6): the stored artifact's manifest
    # carries the base position count and the delta build's own stats
    # collect carries the delta's, so the unfiltered case runs ZERO
    # sizing jobs (round 15 paid one checkpointed-union count per
    # merge). Under a tombstone filter the surviving count comes from
    # the DOC-cardinality lens table (filter is doc-level, so
    # Σ n_tokens over surviving docs = surviving positions) — a tiny
    # aggregate instead of a corpus-width checkpoint scan.
    if base_filter is None:
        n_total = bmeta["npos"] + dmeta["npos"]
    else:
        n_total = int(
            blens.filter(base_filter)
            .agg(F.sum("n_tokens").cast("long").alias("n"))
            .collect()[0][0]
            or 0
        ) + dmeta["npos"]
    # _ranked_ckpt materializes the ranking pass itself (one windowed
    # pass + driver-side offsets — round 15); ``merged`` is a narrow
    # projection over that checkpoint, so the former second eager
    # localCheckpoint of the same rows is gone.
    ranked, _ = _ranked_ckpt(
        u,
        ["k1", "tag", "k2"],
        "k1",
        max(1, math.ceil(n_total / _NBUCKETS)),
        dense=False,
    )
    merged = ranked.select("doc_id", "pos", "tag", F.col("gr").alias("mr"))
    return merged, (d_final, d_hist, d_pos, delta_toks, states, dmeta)


def stored_base_spans(
    bparts: tuple, dparts: tuple, merged: DataFrame, maxlen: int
) -> DataFrame:
    """Delta-snapshot removal spans from the stored-base update path —
    the LCP-recovery + interval tail shared by the catalog entry and
    the scale probe. ``bparts``/``dparts``/``merged`` from
    ``_xsb_parts``-shaped tuples and ``merged_order_from``."""
    from idh_etl_demo_spark.operators.suffix import (
        delta_base_lcp,
        merge_intervals,
        suffix_lcp_adjacent,
    )

    bf, bh, bp, blens, _arts, _bf_top, _bmeta = bparts
    d_final, d_hist, d_pos, delta_toks, states, _dmeta = dparts
    dlens = delta_toks.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    a = merged.select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("p1"),
        F.col("tag").alias("t1"),
        "mr",
    )
    b = merged.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("tag").alias("t2"),
        (F.col("mr") - 1).alias("mr"),
    )
    adj = a.join(b, "mr").filter((F.col("t1") == 1) | (F.col("t2") == 1))
    # delta–delta: same-slot neighbors are delta-internal-adjacent
    dd = adj.filter((F.col("t1") == 1) & (F.col("t2") == 1)).select(
        "d1", "p1", "d2", "p2"
    )
    d_pairs = suffix_lcp_adjacent(d_final, d_hist, d_pos, dlens)
    ddl = dd.join(d_pairs, ["d1", "p1", "d2", "p2"])
    m1 = adj.filter((F.col("t1") == 1) & (F.col("t2") == 0)).select(
        "d1", "p1", "d2", "p2"
    )
    m2 = adj.filter((F.col("t1") == 0) & (F.col("t2") == 1)).select(
        F.col("d2").alias("d1"),
        F.col("p2").alias("p1"),
        F.col("d1").alias("d2"),
        F.col("p1").alias("p2"),
    )
    mixed = delta_base_lcp(
        m1.unionByName(m2), states, bh, bp, d_pos, blens, dlens, maxlen
    )
    sides = (
        ddl.select(
            F.col("d1").alias("doc_id"), F.col("p1").alias("pos"), "lcp"
        )
        .unionByName(
            ddl.select(
                F.col("d2").alias("doc_id"), F.col("p2").alias("pos"), "lcp"
            )
        )
        .unionByName(
            mixed.select(
                F.col("d1").alias("doc_id"), F.col("p1").alias("pos"), "lcp"
            )
        )
    )
    m = sides.groupBy("doc_id", "pos").agg(F.max("lcp").alias("m"))
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


def fold_xsb_parts(
    bparts: tuple, dparts: tuple, merged: DataFrame, base_filter=None
) -> tuple:
    """FOLD a placed delta into the stored-base artifact (r14 verdict
    ask #4 — multi-delta maintenance): returns a ``_xsb_parts``-shaped
    tuple for the COMBINED corpus, so day-2's delta extends/places
    against base+delta₁ with no rebuild anywhere. Components:

      - final order: the merged ranks ARE it (placement already paid
        the one ranking pass — fold never re-derives an order);
      - rank ladder: ``operators/suffix.fold_ladder`` — per level, two
        |delta|-width joins + one bucketed dense rank, POINTWISE equal
        to a combined rebuild's level (the fold is EXACT at every
        cadence; pinned by test_fold_ladder_matches_combined_rebuild
        and, catalog-level, by doc_exact_substr_fold's oracle);
      - positions / lengths: lazy unions of the stored projections;
      - comparison artifacts + top-class frame: re-derived from the
        folded ladder by the SAME build-time constructors
        (ladder_artifacts / top_class_frame) — the re-store floor of
        any fold, measured against the full rebuild alternative by
        tools/probe_xsi.py's fold leg.

    ``base_filter``: when the merge ran under a tombstone predicate
    (doc-level — document removals are doc-level by nature), pass the
    SAME predicate here so every component is rebuilt over SURVIVORS:
    the fold's per-level dense re-rank sheds dead rows for free, which
    makes the fold itself the compaction step — tombstones never
    outlive the next fold, and day-2 placement runs in one consistent
    survivor rank space. Without it, a tombstoned merge would hand
    day-2 a survivor-ranked final order against a dead-inclusive
    ladder: a delta row keyed into an all-dead class would silently
    mis-place (gap → ins 0, exact → dropped by the class join).
    Pinned by test_tombstone_fold_then_place_matches_surviving_rebuild
    (both failure shapes planted, plus a second-day tombstone over a
    folded-in day-1 doc)."""
    from idh_etl_demo_spark.operators.suffix import (
        fold_ladder,
        ladder_artifacts,
        top_class_frame,
    )

    bf, bh, bp, blens, _arts, _bf_top, bmeta = bparts
    d_final, d_hist, d_pos, delta_toks, states, dmeta = dparts
    b_lens = blens if base_filter is None else blens.filter(base_filter)
    b_pos = bp if base_filter is None else bp.filter(base_filter)
    f2 = merged.select(
        "doc_id", "pos", F.col("mr").cast("long").alias("sa_rank")
    ).localCheckpoint(eager=True)
    lens2 = b_lens.unionByName(
        delta_toks.select(
            "doc_id", F.size("toks").cast("long").alias("n_tokens")
        )
    ).localCheckpoint(eager=True)
    pos2 = b_pos.unionByName(d_pos)
    # combined-corpus scalars: free from the manifests when nothing is
    # tombstoned (round 16); under a filter, one DOC-cardinality
    # aggregate over the just-checkpointed lens table (never a
    # corpus-width pass).
    if base_filter is None:
        np2 = bmeta["npos"] + dmeta["npos"]
        ml2 = max(bmeta["maxlen"], dmeta["maxlen"])
    else:
        row = lens2.agg(
            F.sum("n_tokens").alias("np"), F.max("n_tokens").alias("ml")
        ).collect()[0]
        np2, ml2 = int(row.np or 0), int(row.ml or 0)
    h2 = fold_ladder(
        bh,
        states,
        d_hist,
        ml2,
        np2,
        base_filter=base_filter,
        # bucket widths must size to the ORIGINAL class-id span (the
        # fold ranks pre-tombstone ids) — r15 ADVICE; without a filter
        # this equals np2 exactly
        key_npos=bmeta["npos"] + dmeta["npos"],
    )
    # the re-derived artifacts are consumed exactly once (by the next
    # delta's extension/placement), so their checkpoints are LAZY —
    # computed inside the consumer's first action instead of ~2·levels
    # separate materialization jobs here (round 15; the stored-base
    # memo keeps eager artifacts — that one is served across entries)
    arts2 = ladder_artifacts(h2, pos2, eager=False)
    top2 = top_class_frame(f2, h2, lens2).localCheckpoint(eager=False)
    return (f2, h2, pos2, lens2, arts2, top2, {"npos": np2, "maxlen": ml2})


def store_xsb_parts(path: str, bparts: tuple) -> None:
    """Persist the stored-base artifact as REAL parquet tables (r14
    verdict ask #6): ladder_artifacts' docstring claims "at 100 TB
    these are parquet tables", and until this round the artifact lived
    as session localCheckpoint blocks that die with the JVM. One
    directory per component under ``path`` (warehouse-scoped by the
    caller — the ivmj_base/bucketed-merge naming pattern):
    final_order, rank_L{L} per retained level, positions, lens,
    seed_vocab, pair_map_{i}/fx_{i} per artifact level, top_class,
    plus a _manifest.json recording the level lengths (the ladder's
    only non-relational state). Bit-identity of the checkpointed and
    reloaded artifacts is pinned by test_xsb_store_roundtrip."""
    import json
    import os

    bf, bh, bp, blens, arts, bf_top, meta = bparts
    bf.write.mode("overwrite").parquet(os.path.join(path, "final_order"))
    for L, fr in bh:
        fr.write.mode("overwrite").parquet(os.path.join(path, f"rank_L{L}"))
    bp.write.mode("overwrite").parquet(os.path.join(path, "positions"))
    blens.write.mode("overwrite").parquet(os.path.join(path, "lens"))
    arts["seed_vocab"].write.mode("overwrite").parquet(
        os.path.join(path, "seed_vocab")
    )
    for i, (pmap, fx) in enumerate(arts["levels"]):
        pmap.write.mode("overwrite").parquet(
            os.path.join(path, f"pair_map_{i}")
        )
        fx.write.mode("overwrite").parquet(os.path.join(path, f"fx_{i}"))
    bf_top.write.mode("overwrite").parquet(os.path.join(path, "top_class"))
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(
            {
                "levels": [L for L, _ in bh],
                "n_artifact_levels": len(arts["levels"]),
                # driver scalars of the artifact (round 16): consumers
                # size rank buckets / bound walk loops from these
                # instead of re-counting the corpus per merge
                "npos": meta["npos"],
                "maxlen": meta["maxlen"],
            },
            fh,
        )


def load_xsb_parts(spark: SparkSession, path: str) -> tuple:
    """Reload a ``store_xsb_parts`` directory into the exact
    ``_xsb_parts`` tuple shape — every consumer (placement, ladder
    extension, fold, the span walk) runs unmodified against the
    reloaded artifact, so the persisted form is the SAME contract as
    the session memo, not a parallel code path."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json")) as fh:
        man = json.load(fh)
    rd = lambda name: spark.read.parquet(os.path.join(path, name))  # noqa: E731
    bh = [(L, rd(f"rank_L{L}")) for L in man["levels"]]
    arts = {
        "seed_vocab": rd("seed_vocab"),
        "levels": [
            (rd(f"pair_map_{i}"), rd(f"fx_{i}"))
            for i in range(man["n_artifact_levels"])
        ],
    }
    return (
        rd("final_order"),
        bh,
        rd("positions"),
        rd("lens"),
        arts,
        rd("top_class"),
        {"npos": man["npos"], "maxlen": man["maxlen"]},
    )


def _merged_order(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, tuple, tuple]:
    """The catalog corpus's merged order via the stored-base memo."""
    bparts = _xsb_parts(spark, sf_dir)
    delta_toks = _xsi_base(spark, sf_dir).filter(_xsi_delta(F.col("doc_id")))
    merged, dparts = merged_order_from(bparts, delta_toks)
    return merged, bparts, dparts


@query(
    "doc_sa_placement_merged",
    f"""
    with corpus as ({_XSI_CORPUS_SQL}),
    base as (select doc_id, {_SA_TOKS_SQL} as toks from corpus),
    pos as (
      select doc_id, u.i - 1 as pos, list_slice(toks, u.i, len(toks)) as suffix
      from base cross join lateral (
        select unnest(generate_series(1, len(toks))) as i
      ) u
    ),
    ranked as (
      select doc_id, pos,
             row_number() over (order by suffix, doc_id, pos) as rk
      from pos
    )
    select doc_id,
           cast(count(*) as bigint) as n_pos,
           cast(sum(rk) as bigint) as rank_sum,
           cast(min(rk) as bigint) as rank_min,
           cast(max(rk) as bigint) as rank_max,
           cast(sum(rk * (pos + 1)) as bigint) as rank_posdot
    from ranked group by doc_id order by doc_id
    """,
)
def doc_sa_placement_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document digest of the MERGED suffix order produced by the
    stored-base path (stored base order + rank-ladder placement +
    delta-internal ranks — no combined rebuild anywhere): count, sum,
    min, max, and the position-weighted checksum Σ mr·(pos+1) of merged
    ranks. Any single misplaced suffix shifts at least one document's
    checksum, so the driver's value-hash gates the ENTIRE placement
    machinery against the oracle's direct sorted-suffix-list ranks.

    Scale shape: the stored base is the persisted artifact (memoized —
    the input contract, as with orders_ivm_join's stored view); the
    update pays the delta-only build, the |delta|-width ladder
    extension + placement, ONE bucketed ranking pass over the union
    (the merge floor any incremental maintenance must pay), and a
    per-doc groupBy of id-width rows."""
    merged, _, _ = _merged_order(spark, sf_dir)
    return (
        merged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pos"),
            F.sum("mr").cast("long").alias("rank_sum"),
            F.min("mr").cast("long").alias("rank_min"),
            F.max("mr").cast("long").alias("rank_max"),
            F.sum(F.col("mr") * (F.col("pos") + 1))
            .cast("long")
            .alias("rank_posdot"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_exact_substr_stored_base",
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
def doc_exact_substr_stored_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_exact_substr_incremental's EXACT relation — maximal ≥{T}-token
    removal spans for the delta snapshot — computed by the STORED-BASE
    update path instead of the combined rebuild: the base suffix array
    and its rank ladder are the persisted artifacts; the update runs
    the delta-only build, extends the ladder to the delta
    (|delta|-width keyed joins), places every delta suffix
    (place_delta_ranks), emits the merged order with ONE bucketed
    ranking pass, and recovers each delta position's neighbor LCPs
    without re-walking any base-only pair:

      - delta–delta merged-adjacent pairs are delta-internal-adjacent
        (insertion points are monotone in suffix order), so their LCPs
        come from the delta-only build's own Manber–Myers walk;
      - delta–base pairs walk the EXTENDED ladder
        (operators/suffix.delta_base_lcp) — class-vs-rank equality per
        level, no suffix materialization, no token shuffles.

    m(p) = max neighbor LCP, then the shared interval algebra. The
    oracle is doc_exact_substr_incremental's verbatim (one output
    spec, two independent routes); parity of the two Spark paths is
    additionally pinned by test_xsi_stored_base_parity.

    Scale shape: base-width work is CONFINED to the stored artifact's
    one-time build (memoized; the bench's rep-2 measures the update
    alone — the orders_ivm_join stored-contract convention). Every
    per-update stage is |delta|-width except the single merged ranking
    pass — the floor ANY merge must pay, and exactly the term the r13
    crossover measurement (PROBE_XSI) priced against the rebuild."""
    merged, bparts, dparts = _merged_order(spark, sf_dir)
    # walk rounds bound: max doc length over base ∪ delta — both are
    # manifest scalars (round 16), replacing the full tokenize+max
    # corpus pass _xsi_maxlen paid here; identical value by definition
    maxlen = max(bparts[6]["maxlen"], dparts[5]["maxlen"])
    return stored_base_spans(bparts, dparts, merged, maxlen)


def release_xsb_models() -> None:
    """Free the stored-base artifacts' checkpoint blocks (bench memo
    hygiene — the round-9 ADVICE pattern)."""
    from idh_etl_demo_spark.operators.graph import _release_checkpoint

    for v in _XSB_MODELS.values():
        bf, bh, bp, _blens, arts, bf_top, _meta = v
        _release_checkpoint(bf)
        _release_checkpoint(bf_top)
        _release_checkpoint(arts["seed_vocab"])
        for pmap, fx in arts["levels"]:
            _release_checkpoint(pmap)
            _release_checkpoint(fx)
        for _, fr in bh:
            _release_checkpoint(fr)
    _XSB_MODELS.clear()
