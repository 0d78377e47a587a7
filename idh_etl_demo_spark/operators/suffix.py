"""Distributed suffix array construction by PREFIX DOUBLING
(Manber & Myers 1990; the Larsson–Sadakane rank-doubling variant).

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") build suffix arrays to find every verbatim duplicated
substring in a training corpus. Their reference implementation is a
single-node external-memory build; this operator is the Spark-native
equivalent over TOKEN-level suffixes of every document:

    round 0:  rank(p) = dense rank of token at p        (vocab join)
    round j:  rank(p) = dense rank of the PAIR
              (rank(p), rank(p + 2^j) or -1)            (id-keyed join
                                                         + windows)

After ceil(log2(max_len)) rounds, equal ranks mean genuinely equal
suffixes (cross-document duplicates); a final positional tie-break
produces a total order identical to sorting the suffix strings — which
is exactly what the DuckDB oracle does, so the two independent
algorithms must agree row for row.

Scale shape — the reason to build it this way:
- suffixes are never materialized: only (doc_id, pos, rank) id-width
  rows flow through every round; document text stays in the scan.
- each round is one equi-join on (doc_id, pos) plus the TWO-PHASE
  global dense rank: rows bucket by `rank div B` (equal pairs can
  never straddle buckets because the bucket key is the pair's first
  component), a per-bucket window ranks locally, and per-bucket
  offsets come from a |buckets|-row cumulative sum — the
  `customer_dense_ids` pattern, so no round ever funnels the corpus
  through one partition.
- rounds are log(max_len), not log(corpus): 100-token documents cost
  7 rounds at ANY corpus size.
- each round's output is frozen with an eager localCheckpoint (the
  BPE/CC fixpoint convention): plan depth stays bounded and a round
  is computed exactly once. Driver-side per-round work is two scalar
  aggregates (the distinct-rank early-exit and nothing else).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

_NBUCKETS = 256


def _bucketed_rank(
    paired: DataFrame,
    order_cols: list[str],
    bucket_src: str,
    bucket_width: int,
    dense: bool,
) -> DataFrame:
    """Global dense_rank (dense=True) or row_number (dense=False) over
    ``order_cols`` without a single-partition sort: bucket by
    ``bucket_src div bucket_width`` (bucket_src must be the leading
    order column, so bucket order refines into row order), rank within
    buckets, then add |buckets|-row cumulative offsets back. Output:
    the input columns plus ``gr`` (0-based for dense, 1-based for
    row_number — matching dense_rank-1 / row_number semantics)."""
    b = paired.withColumn(
        "bucket", F.floor(F.col(bucket_src) / bucket_width).cast("long")
    )
    w = Window.partitionBy("bucket").orderBy(*[F.asc(c) for c in order_cols])
    rk = (F.dense_rank() if dense else F.row_number()).over(w)
    ranked = b.withColumn("lr", rk.cast("long"))
    counts = ranked.groupBy("bucket").agg(F.max("lr").alias("n"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("n").over(woff), F.lit(0)).cast("long").alias("off"),
    )
    out_rank = (
        (F.col("off") + F.col("lr") - 1)
        if dense
        else (F.col("off") + F.col("lr"))
    )
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .withColumn("gr", out_rank)
        .drop("bucket", "lr", "off")
    )


def _ranked_ckpt(
    paired: DataFrame,
    order_cols: list[str],
    bucket_src: str,
    bucket_width: int,
    dense: bool,
) -> tuple[DataFrame, int]:
    """``_bucketed_rank`` restructured around an EAGER materialization
    (optimization guide §1.2/§2.4 — fewer passes over the same rows):
    the bucketed window frame is localCheckpointed FIRST, the
    |buckets|-row count table is collected to the driver (bounded at
    ~``_NBUCKETS`` rows by the callers' bucket_width choice), and the
    global rank publishes as a NARROW PROJECTION over the checkpoint.

    What this removes vs ``_bucketed_rank`` + a separate checkpoint:
    the offsets DIAMOND (the windowed subtree used to execute twice —
    once under the groupBy that fed the broadcast offsets, once under
    the output join), the broadcast hash join per round, and the
    separate per-round scalar job the doubling loop paid for its
    early-exit test (``agg(max(r))``) — the returned ``total`` carries
    it for free (Σ per-bucket class counts; classes never straddle
    buckets because the bucket key is the leading order column).

    Output values are IDENTICAL to ``_bucketed_rank``'s ``gr`` (0-based
    dense rank / 1-based row_number). Returns (frame, total): the input
    columns plus ``gr``, and the driver-side global class count (dense)
    or row count (row_number)."""
    b = paired.withColumn(
        "bucket", F.floor(F.col(bucket_src) / bucket_width).cast("long")
    )
    w = Window.partitionBy("bucket").orderBy(*[F.asc(c) for c in order_cols])
    rk = (F.dense_rank() if dense else F.row_number()).over(w)
    ranked = b.withColumn("lr", rk.cast("long")).localCheckpoint(eager=True)
    counts = sorted(
        ranked.groupBy("bucket").agg(F.max("lr").alias("n")).collect(),
        key=lambda r: r["bucket"],
    )
    # publish offsets as a DENSE ARRAY literal indexed by bucket (O(1)
    # per-row lookup — a map literal's element_at is a linear scan of
    # all ~_NBUCKETS entries PER ROW, and this projection re-evaluates
    # in every downstream consumer of the level). Buckets are dense
    # integers from floor(min_key / width); absent buckets carry the
    # running offset (harmless: no row has that bucket).
    acc = 0
    if counts:
        lo = int(counts[0]["bucket"])
        hi = int(counts[-1]["bucket"])
        arr = [0] * (hi - lo + 1)
        for r in counts:
            arr[int(r["bucket"]) - lo] = acc
            acc += int(r["n"])
        off = F.element_at(
            F.array(*[F.lit(v) for v in arr]),
            (F.col("bucket") - lo + 1).cast("int"),
        )
    else:
        off = F.lit(0).cast("long")
    gr = off + F.col("lr") - (1 if dense else 0)
    out = ranked.select(*paired.columns, gr.cast("long").alias("gr"))
    return out, acc


def _bucketed_cumsum(g: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """(key, cum) — EXCLUSIVE cumulative sum of ``val_col`` over rows
    with a strictly smaller ``key_col``, without a single-partition
    window: bucket by key div 2^16 (equal keys can't straddle), run an
    exclusive within-bucket sum, then add |buckets|-row offsets back —
    the `_bucketed_rank` offset pattern applied to sums. Keys must be
    distinct non-negative longs."""
    width = 1 << 16
    b = g.withColumn("_ck", F.floor(F.col(key_col) / width).cast("long"))
    win = (
        Window.partitionBy("_ck")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_lc", F.coalesce(F.sum(val_col).over(win), F.lit(0)).cast("long")
    )
    tot = b.groupBy("_ck").agg(F.sum(val_col).cast("long").alias("_n"))
    woff = Window.orderBy("_ck").rowsBetween(Window.unboundedPreceding, -1)
    offs = tot.select(
        "_ck",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).cast("long").alias("_off"),
    )
    return local.join(F.broadcast(offs), "_ck").select(
        F.col(key_col), (F.col("_lc") + F.col("_off")).alias("cum")
    )


def _pos2(pos: DataFrame) -> DataFrame:
    """(doc_id, pos, token, end, t2v) — the build's bigram view of a
    (doc_id, pos, token) position stream: ``end`` flags the
    suffix-final position, ``t2v`` carries the next token ('' at end)
    so the vocab join stays an equi-join (NULL keys never match)."""
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    return pos.withColumn("t2", F.lead("token").over(wdoc)).select(
        "doc_id",
        "pos",
        "token",
        F.col("t2").isNull().alias("end"),
        F.coalesce(F.col("t2"), F.lit("")).alias("t2v"),
    )


def _seed_vocab(pos2: DataFrame) -> DataFrame:
    """(token, end, t2v, r) — the build's bigram vocabulary with its
    0-based content-order rank (token asc, suffix-final before every
    real continuation, continuation asc). Deterministic, so a rebuild
    from the same corpus reproduces the seed level's class ids."""
    vocab = pos2.select("token", "end", "t2v").distinct()
    return vocab.withColumn(
        "r",
        (
            F.row_number().over(
                Window.orderBy(F.asc("token"), F.desc("end"), F.asc("t2v"))
            )
            - 1
        ).cast("long"),
    )


def _doubling_loop(
    cur: DataFrame,
    h: int,
    npos: int,
    maxlen: int,
    bwidth: int,
    history: list[tuple[int, DataFrame]],
    prev_top: int,
    pair_levels: list[DataFrame] | None = None,
) -> DataFrame:
    """The prefix-doubling loop body shared by ``suffix_ranks`` (the
    from-scratch build) and ``fold_ladder`` (continuation past a folded
    top level): starting from rank table ``cur`` at prefix length
    ``h``, double until depth (h ≥ maxlen), all-distinct, or the
    Manber–Myers stability fixpoint; append each retained level to
    ``history`` and return the final rank table. Exit semantics are
    documented inline (round-12); they are the build's correctness
    contract with every ladder consumer.

    Round shape (optimization round 15 — guide §2.4, remove shuffles
    outright): the pair (r(p), r(p+h)) comes from ONE ``lead(r, h)``
    window over the per-document position stream — positions are dense
    0..n−1 per doc by construction (``posexplode``; folds drop whole
    docs only), so the row h ahead IS position p+h. This replaces the
    former (doc_id, pos)-keyed self-join: one exchange instead of two
    plus the join itself. The rank then runs through ``_ranked_ckpt``
    (one windowed pass, driver-side offsets — see there), whose
    returned class count serves both exit tests with no extra job.
    Net per round: 2 exchanges + 2 sorts in one action + one bounded
    collect, versus 3 exchanges + 4 sorts + a broadcast join across
    two actions before.

    ``pair_levels``: optional capture list — receives, per RETAINED
    level, the ranked checkpoint carrying (r, r2, gr), i.e. exactly
    the (r1, r2, r12) pair-map triples ``ladder_artifacts`` otherwise
    re-derives with two corpus-width joins per level."""
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    while h < maxlen:
        paired = cur.select(
            "doc_id",
            "pos",
            "r",
            F.coalesce(F.lead("r", h).over(wdoc), F.lit(-1)).alias("r2"),
        )
        ranked, ncls = _ranked_ckpt(paired, ["r", "r2"], "r", bwidth, dense=True)
        top = ncls - 1
        # STABILITY exit (round-12): doubling only refines, so equal
        # class count ⟺ equal partition; and a round with no split is
        # the Manber–Myers fixpoint — if p ≡₂ₕ q then p+h ≡ₕ q+h (the
        # second key component), stability lifts that to p+h ≡₂ₕ q+h,
        # whose second component gives p+2h ≡ₕ q+2h, so by induction
        # every later level equals this one. Remaining tied classes
        # are IDENTICAL TAILS (verbatim re-crawls), which full-depth
        # doubling could never separate anyway — the walk resolves
        # them via the top-level sentinel (suffix_lcp_adjacent). The
        # level just computed duplicates the previous partition
        # POINTWISE (no split means every r-class has one (r, r2)
        # value, so the dense rank over (r, r2) is r itself), so it is
        # never appended: the stable level is the walk's top. Release
        # the redundant checkpoint eagerly — its storage blocks
        # otherwise stay pinned until the ContextCleaner notices.
        if top == prev_top:
            from idh_etl_demo_spark.operators.graph import _release_checkpoint

            _release_checkpoint(ranked)
            break
        cur = ranked.select("doc_id", "pos", F.col("gr").alias("r"))
        h *= 2
        history.append((h, cur))
        if pair_levels is not None:
            pair_levels.append(ranked)
        # early exit: all ranks distinct → no pair can refine further
        if top == npos - 1:
            break
        prev_top = top
    return cur


def suffix_ranks(
    base: DataFrame,
    capture: dict | None = None,
) -> tuple[DataFrame, list[tuple[int, DataFrame]], DataFrame]:
    """Token-level suffix array of the corpus.

    ``base``: (doc_id, toks array<string>). Returns (final, history,
    pos):

    - final: (doc_id, pos, sa_rank) — pos 0-based, sa_rank the 1-based
      position of suffix toks[pos:] in the lexicographic order of ALL
      corpus suffixes, ties between identical suffixes broken by
      (doc_id, pos);
    - history: [(L, frame(doc_id, pos, r))] — every doubling round's
      CHECKPOINTED dense-rank table, L the prefix length it resolves
      (2, 4, 8, …). Two suffixes share ``r`` at level L iff their
      first L tokens agree (end-of-doc included in the class). This is
      the Manber–Myers LCP structure: lcp(u, v) is recovered greedily
      from the highest L down plus one single-token step — the
      ``suffix_lcp_adjacent`` consumer;
    - pos: the lazy (doc_id, pos, token) projection for that final
      single-token step.

    Runs the prefix-doubling loop EAGERLY (each round localCheckpoints
    its rank table — the CC-fixpoint convention); callers should
    memoize per (session, sf).

    ``capture``: optional dict that receives build BYPRODUCTS the
    stored-base artifact constructors otherwise re-derive with
    corpus-width joins (optimization round 15):
      - ``pair_levels``: per retained level ≥ 1, the ranked checkpoint
        carrying (r, r2, gr) = the (r1, r2, r12) pair-map triples
        (consumed by ``ladder_artifacts``);
      - ``final_top``: the final order WITH its top-level class column
        (doc_id, pos, sa_rank, r) — consumed by ``top_class_frame``;
      - ``npos`` / ``maxlen``: the corpus position count and max
        document length — DRIVER SCALARS the build's own stats
        aggregate already collected (round 16: callers that used to
        re-count the corpus to size rank buckets or bound walk loops
        read them here for free — one action per merge removed).
    The returned (final, history, pos) shapes are unchanged."""
    pos = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")

    # round 0 seeds with the BIGRAM rank — dense rank of (token, next
    # token), i.e. the state a single-token seed reaches after its
    # first doubling round, so the loop starts at h=2 with one fewer
    # corpus pass. The bigram vocabulary is |vocab|²-bounded (tiny),
    # ranks broadcast back onto the position stream; a missing next
    # token sorts FIRST (nulls-first = the −1 sentinel = DuckDB's
    # prefix-first list order).
    # NULL join keys never match — _pos2 carries (end, t2v) with end
    # flagging the suffix-final position so the bigram join stays an
    # equi-join; _seed_vocab ranks suffix-final (end=true) before every
    # real continuation — the −1 sentinel / prefix-first order. Both
    # are shared with the delta-side ladder extension
    # (extend_delta_states), which must reproduce these class ids.
    pos2 = _pos2(pos)
    vr = _seed_vocab(pos2)
    cur = (
        pos2.join(F.broadcast(vr), ["token", "end", "t2v"])
        .select("doc_id", "pos", "r")
        .localCheckpoint(eager=True)
    )

    # corpus stats off the checkpointed rank table — no second
    # tokenizing scan
    stats = cur.agg(
        F.count(F.lit(1)).alias("npos"),
        F.max("pos").alias("maxpos"),
        F.max("r").alias("topr"),
    ).collect()[0]
    npos, maxlen = int(stats.npos or 0), int(stats.maxpos or -1) + 1
    prev_top = int(stats.topr) if stats.topr is not None else -1
    if capture is not None:
        capture["npos"] = npos
        capture["maxlen"] = maxlen
    if npos == 0:
        empty = cur.select(
            "doc_id", "pos", F.lit(0).cast("long").alias("sa_rank")
        )
        if capture is not None:
            capture["pair_levels"] = []
            capture["final_top"] = empty.withColumn(
                "r", F.lit(0).cast("long")
            )
        return empty, [], pos
    bwidth = max(1, math.ceil(npos / _NBUCKETS))
    history: list[tuple[int, DataFrame]] = [(2, cur)]
    pair_levels: list[DataFrame] | None = (
        [] if capture is not None else None
    )
    cur = _doubling_loop(
        cur, 2, npos, maxlen, bwidth, history, prev_top, pair_levels
    )

    # total order: identical cross-document suffixes share a rank class
    # after the loop; break ties positionally (the oracle's
    # ORDER BY suffix, doc_id, pos). The ranked checkpoint retains the
    # top-level class column, so ``final`` is a narrow projection and
    # ``final_top`` costs nothing extra.
    fr, _ = _ranked_ckpt(cur, ["r", "doc_id", "pos"], "r", bwidth, dense=False)
    final = fr.select("doc_id", "pos", F.col("gr").alias("sa_rank"))
    if capture is not None:
        capture["pair_levels"] = pair_levels
        capture["final_top"] = fr.select(
            "doc_id", "pos", F.col("gr").alias("sa_rank"), "r"
        )
    return final, history, pos


def ladder_artifacts(
    base_history: list[tuple[int, DataFrame]],
    base_pos: DataFrame,
    pair_levels: list[DataFrame] | None = None,
    eager: bool = True,
) -> dict:
    """The stored-base design's PERSISTED comparison structures, built
    once alongside the base suffix array (they materialize mid-round
    during the build anyway — at 100 TB these are parquet tables next
    to the rank ladder):

    - ``seed_vocab``: the bigram vocabulary with content-order ranks;
    - per level i ≥ 1: the PAIR MAP (r1, r2, r12) — distinct level-i
      pairs with their stored dense rank — and the exclusive
      pairs-before-first-class cumsum ``fx`` (r1, cum).

    Everything is eagerly checkpointed (it is the artifact). Passing
    this to ``extend_delta_states`` / ``place_delta_ranks`` makes every
    per-update stage |delta|-width: without it they re-derive the same
    tables lazily per call (correct, but charges base-corpus passes to
    the update — the r14 probe measured that as the placement term's
    only scale-dependent cost).

    ``pair_levels``: the build's captured ranked checkpoints
    (``suffix_ranks(..., capture=...)``) — each already carries the
    (r1, r2, r12) triples, so the per-level pair map collapses to ONE
    distinct over the checkpoint instead of two corpus-width joins
    (optimization round 15; values identical either way). Without it,
    the derivation pairs (r1, r2) via one ``lead`` window per level —
    the same join-elimination the doubling loop itself uses — then
    joins the level above for r12 (one join instead of the former
    two).

    ``eager``: the stored-base memo wants eager checkpoints (the
    artifact is served across entries and bench reps); a FOLD's
    re-derived artifacts are consumed exactly once by the next
    update's extension, so the fold path passes eager=False — the
    lazy checkpoints still compute once (first action caches them)
    but the ~2·levels separate materialization jobs disappear
    (round 15; values identical)."""
    vr = _seed_vocab(_pos2(base_pos)).localCheckpoint(eager=eager)
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    levels = []
    for i in range(1, len(base_history)):
        if pair_levels is not None:
            pmap = (
                pair_levels[i - 1]
                .select(
                    F.col("r").alias("r1"),
                    F.col("r2").cast("long").alias("r2"),
                    F.col("gr").alias("r12"),
                )
                .distinct()
                .localCheckpoint(eager=eager)
            )
        else:
            shift = base_history[i - 1][0]
            h_prev = base_history[i - 1][1]
            h_cur = base_history[i][1]
            pr = h_prev.select(
                "doc_id",
                "pos",
                F.col("r").alias("r1"),
                F.coalesce(F.lead("r", shift).over(wdoc), F.lit(-1))
                .cast("long")
                .alias("r2"),
            )
            pmap = (
                h_cur.select("doc_id", "pos", F.col("r").alias("r12"))
                .join(pr, ["doc_id", "pos"])
                .select("r1", "r2", "r12")
                .distinct()
                .localCheckpoint(eager=eager)
            )
        grp = pmap.groupBy("r1").agg(F.count(F.lit(1)).alias("n"))
        fx = _bucketed_cumsum(grp, "r1", "n").localCheckpoint(eager=eager)
        levels.append((pmap, fx))
    return {"seed_vocab": vr, "levels": levels}


def fold_ladder(
    base_history: list[tuple[int, DataFrame]],
    states: list[tuple[int, DataFrame]],
    delta_history: list[tuple[int, DataFrame]],
    maxlen: int,
    npos: int,
    base_filter=None,
    key_npos: int | None = None,
) -> list[tuple[int, DataFrame]]:
    """FOLD a placed delta INTO the stored rank ladder — multi-delta
    maintenance: after day-1's delta is placed, emit the COMBINED
    corpus's rank ladder so day-2's delta extends/places against
    base+delta₁ without any rebuild. The fold is EXACT at every
    cadence (no approximation accumulates): each folded level is
    POINTWISE equal to the level a combined ``suffix_ranks`` rebuild
    would produce, because both are the dense rank of level-L window
    content over the same corpus in the same content order (pinned by
    test_fold_ladder_matches_combined_rebuild).

    Per retained base level L, the folded class id is the dense rank
    over a three-part key that is content-ordered by construction:

      - base positions: (base class r, 0, −1) — base classes order
        content, the build's invariant;
      - delta positions with EXACT state e: (e, 0, −1) — the content
        EQUALS class e's, so the row merges into the base class;
      - delta positions with GAP state g: (g, 1, delta class at L) —
        content strictly between base classes g and g+1, and distinct
        gap contents in the same bracket are separated AND ordered by
        the delta-internal level-L class (delta classes order delta
        content — the same invariant on the delta's own build).

    The delta's level-L class comes from ``delta_history`` at L when
    retained, else from the delta's top level — valid in every exit
    regime (depth: the top level covers whole tails; stability: tied
    classes are identical tails, equal at every larger L; distinct:
    singletons stay singletons).

    After the base's levels, the standard doubling loop continues from
    the folded top (``_doubling_loop``) — non-trivial only when the
    combined corpus needs depth the base never did (a delta doc longer
    than every base doc, or base/delta identical tails re-tying a
    stability-exited top), and exiting exactly as a rebuild would,
    since exits depend only on class counts, which match pointwise.

    Scale shape: per level, two |delta|-width keyed joins (state +
    delta class) and ONE bucketed dense rank over the combined
    id-width rows — the rank floor any level re-publication pays; the
    base pair-compare joins of a rebuild never run. log(max_len)
    levels; each folded level eagerly checkpoints (it IS the new
    stored artifact). ``maxlen``/``npos`` are the combined corpus's
    (driver scalars the caller already holds).

    ``base_filter``: optional TOMBSTONE predicate (doc-level, the same
    one the merge ran under) — deletions COMPOSE with folds because
    the fold already pays a dense re-rank per level, so shedding
    tombstoned rows there is FREE: the folded ladder contains
    SURVIVORS only, i.e. every fold doubles as the compaction step.
    Exactness carries over unchanged: original class ids still order
    content when restricted to survivors (a subsequence of a
    content-ordered sequence), dense rank re-compresses the gaps, and
    a delta row keyed into an ALL-tombstoned class/bracket still
    orders correctly because the dead class id survives as a key
    VALUE. With a filter, ``maxlen``/``npos`` must be the SURVIVING
    corpus's. The folded ladder may retain levels DEEPER than a fresh
    survivors-rebuild would (deletions can make an exit fire earlier);
    those levels are still the genuine level-L content partitions, so
    every ladder consumer stays sound — only the retained-level list
    differs, never a class id (placement parity is the pin:
    test_tombstone_fold_then_place_matches_surviving_rebuild).

    ``key_npos``: the ORIGINAL (pre-tombstone) combined position count,
    used only to size rank buckets. The fold ranks ORIGINAL class ids
    (k1), whose span is bounded by the original corpus, not by the
    surviving row count — deriving the width from surviving ``npos``
    under heavy deletion ratios would grow the bucket count (and the
    driver-collected offsets array) as original/surviving, unbounded by
    ``_NBUCKETS`` (r15 ADVICE). Defaults to ``npos`` (exactly the old
    behavior when nothing is tombstoned).

    Per-level re-publications are INDEPENDENT (each folds base level i
    with state level i — never a previous folded level), so they are
    submitted from a small driver thread pool (optimization round 16,
    guide §2.6 — overlap independent jobs): at bench scale the ~levels
    serial rank jobs each underutilize the cores; at 100 TB the next
    level's tasks back-fill executors freed by the current level's
    straggler tail. Pool size via $SPARK_GRAFT_FOLD_POOL (default 4 —
    2-3 jobs in flight is the guide's fill-the-tail guidance, +1 for
    the bounded level count; values are unchanged at any pool size
    because each level's rank is a pure function of its own inputs).

    Returns the folded history; the combined final order is the
    caller's merged order (``place_delta_ranks`` + one ranking pass),
    so fold never re-derives it."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    bwidth = max(1, math.ceil((key_npos or npos) / _NBUCKETS))
    workers = max(1, int(os.environ.get("SPARK_GRAFT_FOLD_POOL", "4")))

    def _pmap(fn, items):
        items = list(items)
        if workers == 1 or len(items) <= 1:
            return [fn(x) for x in items]
        with ThreadPoolExecutor(max_workers=min(workers, len(items))) as p:
            return list(p.map(fn, items))

    if not delta_history:
        # empty delta: the combined corpus IS the (surviving) base. A
        # pure-removal day still re-publishes each level so the folded
        # artifact is dense over survivors — the compaction contract.
        if base_filter is None:
            # zero delta rows leave every dense rank unchanged
            return list(base_history)

        def _republish(item):
            L, bfr = item
            return (
                L,
                _ranked_ckpt(
                    bfr.filter(base_filter).select(
                        "doc_id", "pos", F.col("r").alias("k1")
                    ),
                    ["k1"],
                    "k1",
                    bwidth,
                    dense=True,
                )[0].select("doc_id", "pos", F.col("gr").alias("r")),
            )

        return _pmap(_republish, base_history)
    if not base_history:
        # empty day-0 base: the combined corpus IS the delta, whose own
        # build already produced exactly the rebuild's ladder
        return list(delta_history)

    def _delta_level(L: int) -> DataFrame:
        for dl, fr in delta_history:
            if dl == L:
                return fr
        return delta_history[-1][1]

    def _fold_level(item):
        i, (L, bfr) = item
        st = states[i][1]
        dfr = _delta_level(L).select(
            "doc_id", "pos", F.col("r").alias("dr")
        )
        drows = st.join(dfr, ["doc_id", "pos"]).select(
            "doc_id",
            "pos",
            F.coalesce("e", "g").cast("long").alias("k1"),
            F.when(F.col("e").isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("k2"),
            F.when(F.col("e").isNotNull(), F.lit(-1))
            .otherwise(F.col("dr"))
            .cast("long")
            .alias("k3"),
        )
        bsrc = bfr if base_filter is None else bfr.filter(base_filter)
        brows = bsrc.select(
            "doc_id",
            "pos",
            F.col("r").cast("long").alias("k1"),
            F.lit(0).alias("k2"),
            F.lit(-1).cast("long").alias("k3"),
        )
        return L, _ranked_ckpt(
            brows.unionByName(drows), ["k1", "k2", "k3"], "k1", bwidth, dense=True
        )

    results = _pmap(_fold_level, enumerate(base_history))
    folded: list[tuple[int, DataFrame]] = [
        (L, ranked.select("doc_id", "pos", F.col("gr").alias("r")))
        for L, (ranked, _ncls) in results
    ]
    top = results[-1][1][1] - 1
    # continue doubling past the folded top exactly as a rebuild would
    # (usually zero rounds: the base's exits already covered maxlen).
    # The last level's class count came back with its ranking pass, so
    # no separate agg(max(r)) job runs here (optimization round 15).
    cur = folded[-1][1]
    if top < npos - 1:
        _doubling_loop(cur, folded[-1][0], npos, maxlen, bwidth, folded, top)
    return folded


def extend_delta_states(
    base_history: list[tuple[int, DataFrame]],
    base_pos: DataFrame,
    delta_toks: DataFrame,
    artifacts: dict | None = None,
) -> list[tuple[int, DataFrame]]:
    """Extend the STORED base rank ladder to every DELTA suffix — the
    comparison structure of the production stored-base incremental-SA
    design (r13 verdict ask #3: comparisons through stored ranks,
    never token movement).

    Per retained base level L, every delta position gets a STATE over
    the base's level-L class ids (which order classes by L-prefix
    content, prefix-first — the build's invariant):

      - ``e`` non-null: the delta suffix's first-L tokens (end-padded)
        EQUAL base class ``e``'s content;
      - ``g`` non-null: the content sorts STRICTLY BETWEEN classes
        ``g`` and ``g + 1`` (g = −1 → before class 0, g = top → after
        every class) — unseen-in-base content keeps an exact bracket.

    Recurrence (mirrors the build): the seed state joins the delta's
    bigram keys against the base seed vocabulary (misses bracket via
    ONE vocab-bounded as-of window — the same frame class the build
    broadcasts); level 2L combines (state_L(p), state_L(p + L)) against
    the base's level-2L PAIR MAP: an exact×exact pair that exists in
    the base maps to its stored rank, anything else brackets by
    pairs-before counts (an exclusive bucketed cumsum per first class
    plus a per-(class, threshold) conditional count — keyed joins, no
    base-corpus window). Gap states stay gapped with O(1) keyed-join
    updates. Every frame that flows is |delta|-width; the base-width
    pair maps are DERIVED from the stored history here (one join +
    distinct per level — at 100 TB they would be persisted at build
    time, as they materialize mid-round anyway).

    Levels are EAGERLY localCheckpointed (round 15): the chain stays
    one node deep for the optimizer, and the |delta|-width jobs run
    here instead of inside the first downstream action — see the
    inline comment at the seed for the measured plan-analysis blowup
    the lazy form paid.

    Preconditions: (doc_id, pos) keys disjoint between base and delta;
    base_history from ``suffix_ranks``; ``base_pos`` its position
    projection."""
    d_pos = delta_toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    dp2 = _pos2(d_pos)
    vr = (
        artifacts["seed_vocab"]
        if artifacts is not None
        else _seed_vocab(_pos2(base_pos))
    )
    hit = dp2.join(F.broadcast(vr), ["token", "end", "t2v"], "left")
    miss_keys = (
        hit.filter(F.col("r").isNull())
        .select("token", "end", "t2v")
        .distinct()
    )
    # vocab-bounded as-of: pred base rank of each unseen bigram key
    # under the seed content order (one window over vocab ∪ misses —
    # the vocabulary is the frame the build itself broadcasts)
    u = vr.select(
        "token", "end", "t2v", "r", F.lit(0).alias("tag")
    ).unionByName(
        miss_keys.select(
            "token",
            "end",
            "t2v",
            F.lit(None).cast("long").alias("r"),
            F.lit(1).alias("tag"),
        )
    )
    wv = Window.orderBy(
        F.asc("token"), F.desc("end"), F.asc("t2v"), F.asc("tag")
    ).rowsBetween(Window.unboundedPreceding, 0)
    mk = (
        u.withColumn("pred", F.max("r").over(wv))
        .filter(F.col("tag") == 1)
        .select(
            "token",
            "end",
            "t2v",
            F.coalesce("pred", F.lit(-1)).cast("long").alias("gmiss"),
        )
    )
    # Per-level checkpoints are EAGER (round 15): a level's plan embeds
    # several copies of the previous level's plan (the exact/bracket
    # branches each re-reference ``st``), so with lazy checkpoints the
    # LOGICAL plan grows multiplicatively with levels — measured ~7 s
    # of pure driver-side analysis per call at sf0.1 while the actual
    # execution was ~1 s. Eager |delta|-width checkpoints keep every
    # level's plan one node deep; the jobs they run are exactly the
    # work the first downstream action paid anyway. (Callers are the
    # EAGER_EXEMPT stored-base entries, the probe, and tests.)
    seed = (
        hit.join(F.broadcast(mk), ["token", "end", "t2v"], "left")
        .select(
            "doc_id",
            "pos",
            F.col("r").alias("e"),
            F.when(F.col("r").isNull(), F.col("gmiss")).alias("g"),
        )
        .localCheckpoint(eager=True)
    )
    out: list[tuple[int, DataFrame]] = [(base_history[0][0], seed)]
    cur = seed
    for i in range(1, len(base_history)):
        shift = base_history[i - 1][0]  # content length of level i-1
        if artifacts is not None:
            pmap, fx = artifacts["levels"][i - 1]
        else:
            # no stored artifact: derive the pair map / cumsum lazily —
            # correct, but charges base-corpus passes to this call
            # (r12 is the DENSE RANK of pairs under (r1, r2) order by
            # construction, so pairs-before counts translate directly
            # to bracket ids). The (r1, r2) pair comes from one lead
            # window instead of a second join (round 15, same
            # equivalence as ladder_artifacts' fallback).
            h_prev = base_history[i - 1][1]
            h_cur = base_history[i][1]
            wdoc = Window.partitionBy("doc_id").orderBy("pos")
            pr = h_prev.select(
                "doc_id",
                "pos",
                F.col("r").alias("r1"),
                F.coalesce(F.lead("r", shift).over(wdoc), F.lit(-1))
                .cast("long")
                .alias("r2"),
            )
            pmap = (
                h_cur.select("doc_id", "pos", F.col("r").alias("r12"))
                .join(pr, ["doc_id", "pos"])
                .select("r1", "r2", "r12")
                .distinct()
                .localCheckpoint(eager=False)
            )
            grp = pmap.groupBy("r1").agg(F.count(F.lit(1)).alias("n"))
            fx = _bucketed_cumsum(grp, "r1", "n")  # #pairs first < r1
        tot = pmap.agg(F.count(F.lit(1)).cast("long").alias("_ptot"))
        # the shifted self-lookup as ONE lead window (round 15 — the
        # doubling loop's join elimination): delta positions are dense
        # 0..n−1 per doc, so the row ``shift`` ahead IS pos+shift;
        # lead(True) reproduces the old left-join's presence flag
        wdoc2 = Window.partitionBy("doc_id").orderBy("pos")
        # LAZY checkpoint (round 16, guide §1.2 — don't compute twice):
        # ``st`` is referenced by the exact branch (twice — once for the
        # output, once under the needs→cnt2 bracket-count aggregation)
        # and by the gap branch, so without it the lead window over the
        # level's state executed three times inside the level's job.
        # eager=False keeps the builder action-free; the |delta|-width
        # frame materializes once inside the level's own checkpoint job.
        st = cur.select(
            "doc_id",
            "pos",
            "e",
            "g",
            F.lead("e", shift).over(wdoc2).alias("e2"),
            F.lead("g", shift).over(wdoc2).alias("g2"),
            F.lead(F.lit(True), shift).over(wdoc2).alias("_has2"),
        ).localCheckpoint(eager=False)
        # --- first block exact: pair lookup, else bracket by counts ---
        ex = st.filter(F.col("e").isNotNull()).withColumn(
            # second-block exact key: stored class, or −1 past-end;
            # null when the second block is itself a gap state
            "k2",
            F.when(F.col("_has2").isNull(), F.lit(-1)).otherwise(
                F.col("e2")
            ),
        )
        ex = ex.withColumn("thr", F.coalesce(F.col("k2"), F.col("g2") + 1))
        ex = ex.join(
            pmap.select(
                F.col("r1").alias("e"), F.col("r2").alias("k2"), "r12"
            ),
            ["e", "k2"],
            "left",
        )
        # pairs (first = e, second < thr) for the bracket: a gap second
        # block (content strictly inside (g2, g2+1)) counts seconds
        # ≤ g2, i.e. < g2 + 1 — one uniform strict threshold
        needs = (
            ex.filter(F.col("r12").isNull()).select("e", "thr").distinct()
        )
        cnt2 = (
            needs.join(pmap.select(F.col("r1").alias("e"), "r2"), "e", "left")
            .groupBy("e", "thr")
            .agg(
                F.sum(F.when(F.col("r2") < F.col("thr"), 1).otherwise(0))
                .cast("long")
                .alias("c2")
            )
        )
        ex = ex.join(cnt2, ["e", "thr"], "left").join(
            fx.select(F.col(
                "r1").alias("e"), F.col("cum").alias("f1")),
            "e",
            "left",
        )
        exact_out = ex.select(
            "doc_id",
            "pos",
            F.col("r12").alias("e"),
            F.when(
                F.col("r12").isNull(),
                F.coalesce(F.col("f1"), F.lit(0))
                + F.coalesce(F.col("c2"), F.lit(0))
                - 1,
            ).alias("g"),
        )
        # --- first block gap: every pair with first ≤ g precedes ---
        gp = (
            st.filter(F.col("e").isNull())
            .withColumn("gk", F.col("g") + 1)
            .join(
                fx.select(F.col("r1").alias("gk"), F.col("cum").alias("fg")),
                "gk",
                "left",
            )
            .crossJoin(F.broadcast(tot))
            .select(
                "doc_id",
                "pos",
                F.lit(None).cast("long").alias("e"),
                (F.coalesce("fg", F.col("_ptot")) - 1).alias("g"),
            )
        )
        cur = exact_out.unionByName(gp).localCheckpoint(eager=True)
        out.append((base_history[i][0], cur))
    return out


def top_class_frame(
    base_final: DataFrame,
    base_history: list[tuple[int, DataFrame]],
    base_lens: DataFrame,
    final_top: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, pos, sa_rank, r, rem) — the stored order joined with
    its top-level class and per-position tail length; the base of the
    per-class table ``place_delta_ranks`` locates against. Storable
    alongside the ladder (one corpus pass at build time).

    ``final_top``: the build's captured (doc_id, pos, sa_rank, r)
    frame (``suffix_ranks(..., capture=...)``) — the final ranking
    pass orders by (top class, doc_id, pos), so the class column is a
    free byproduct and the corpus-width join with the top level
    disappears (optimization round 15; values identical)."""
    src = (
        final_top
        if final_top is not None
        else base_final.join(base_history[-1][1], ["doc_id", "pos"])
    )
    return (
        src.join(base_lens, "doc_id")
        .select(
            "doc_id",
            "pos",
            "sa_rank",
            "r",
            (F.col("n_tokens") - F.col("pos")).cast("long").alias("rem"),
        )
    )


def place_delta_ranks(
    base_final: DataFrame,
    base_history: list[tuple[int, DataFrame]],
    base_pos: DataFrame,
    base_lens: DataFrame,
    delta_toks: DataFrame,
    states: list[tuple[int, DataFrame]] | None = None,
    bf_top: DataFrame | None = None,
    max_delta_len: int | None = None,
) -> DataFrame:
    """Insertion ranks of every DELTA suffix into a STORED base suffix
    order — the placement stage of the stored-base incremental-SA
    design, production shape (r13 verdict ask #3): every comparison
    goes through the stored rank LADDER via ``extend_delta_states``;
    no suffix is ever materialized and no token array moves.

    Output: (doc_id, pos, ins) per delta position, ins = the count of
    base suffixes sorting STRICTLY before the delta suffix under the
    build's total order (suffix tokens, then (doc_id, pos)) — the
    delta suffix slots between base ranks ins and ins + 1, so the
    merged total order is base_rank + |{ins < base_rank}| on the base
    side and ins + delta-internal rank on the delta side (pinned by
    test_sa_placement_matches_combined_rebuild).

    How the top level resolves (the base final order IS (top class,
    doc_id, pos) by construction, so placement reduces to locating
    each delta suffix among the ordered top-level classes):

      - gap state g → ins = positions in classes ≤ g (one keyed join
        against the per-class cumulative table);
      - exact state e with the delta tail ending within the top level
        → the suffixes are IDENTICAL (level classes encode ends), so
        ins adds the class members strictly before by (doc_id, pos) —
        one class-partitioned as-of window, never a member fan-out;
      - exact state e with content beyond the top level → a bounded
        tail-compare loop (⌈max_len / L_top⌉ rounds, ZERO under the
        depth exit where L_top ≥ max_len) walks both sides forward
        L_top tokens at a time through the SAME ladder states against
        the class representative — sound because a top-level class's
        members share their tails in every exit regime (depth: whole
        suffix inside the level; stability: the fixpoint argument;
        distinct: singleton).

    Scale shape: everything that flows is |delta|-width and keyed
    (class-id hash joins, one class-partitioned window for ties); the
    per-class table is one groupBy over the stored base order. The
    only driver-side value is max delta tail length (one 1-row
    aggregate, the loop bound).

    Preconditions: (doc_id, pos) keys disjoint between base and delta
    (the build's own tie-break domain); ``base_lens`` =
    (doc_id, n_tokens) for base docs."""
    import math

    if states is None:
        states = extend_delta_states(base_history, base_pos, delta_toks)
    top_len, d_top = states[-1]
    h_top = base_history[-1][1]
    # per-class table over the stored order: rank offset, size, the
    # representative member, and the members' (shared) tail length —
    # storable at build time (top_class_frame); derived lazily when no
    # stored artifact is passed
    bf = (
        bf_top
        if bf_top is not None
        else top_class_frame(base_final, base_history, base_lens)
    )
    cls = (
        bf.groupBy("r")
        .agg(
            (F.min("sa_rank") - 1).cast("long").alias("kk"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min(F.struct("doc_id", "pos")).alias("rep"),
            F.max("rem").cast("long").alias("brem"),
        )
        .select(
            "r",
            "kk",
            "cnt",
            F.col("rep.doc_id").alias("rep_d"),
            F.col("rep.pos").alias("rep_p"),
            "brem",
        )
        .localCheckpoint(eager=False)
    )
    dlens = delta_toks.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    st = d_top.join(dlens, "doc_id").select(
        "doc_id",
        "pos",
        "e",
        "g",
        (F.col("n_tokens") - F.col("pos")).cast("long").alias("rem"),
    )
    gaps = (
        st.filter(F.col("e").isNull())
        .join(cls.select(F.col("r").alias("g"), "kk", "cnt"), "g", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce(F.col("kk") + F.col("cnt"), F.lit(0)).alias("ins"),
        )
    )
    eq = st.filter(F.col("e").isNotNull()).join(
        cls.select(
            F.col("r").alias("e"), "kk", "cnt", "rep_d", "rep_p", "brem"
        ),
        "e",
    )
    # A level class encodes a document end only STRICTLY INSIDE its
    # window: a tail ending exactly at the boundary (rem == L_top)
    # shares its class with longer tails. Resolve boundaries against
    # the members' shared tail length brem (well-defined: depth exit —
    # ends inside the window are encoded, so one class = one rem;
    # stability exit — tied classes have identical tails; distinct
    # exit — singleton):
    #   rem <  L_top           → identical suffixes (tie path)
    #   rem == L_top == brem   → identical suffixes (tie path)
    #   rem == L_top <  brem   → delta is a proper prefix → before all
    #   rem >  L_top == brem   → members are proper prefixes → after
    #   rem >  L_top <  brem   → both continue → tail-compare loop
    fin_eq = eq.filter(
        (F.col("rem") < top_len)
        | ((F.col("rem") == top_len) & (F.col("brem") == top_len))
    )
    pre_lt = eq.filter(
        (F.col("rem") == top_len) & (F.col("brem") > top_len)
    ).select("doc_id", "pos", F.col("kk").alias("ins"))
    pre_gt = eq.filter(
        (F.col("rem") > top_len) & (F.col("brem") == top_len)
    ).select("doc_id", "pos", (F.col("kk") + F.col("cnt")).alias("ins"))
    amb = eq.filter((F.col("rem") > top_len) & (F.col("brem") > top_len))
    # tail-compare loop: ⌈max tail / L_top⌉ fixed rounds, built lazily.
    # ``max_delta_len`` (the delta build's own stats scalar, passed by
    # merged_order_from since round 16) skips the 1-row aggregate job
    # this loop bound used to pay per merge — same value either way.
    maxrem = (
        max_delta_len
        if max_delta_len is not None
        else (dlens.agg(F.max("n_tokens")).collect()[0][0] or 0)
    )
    rounds = max(0, math.ceil(maxrem / top_len) if maxrem > top_len else 0)
    cur = amb.select(
        "doc_id",
        "pos",
        "e",
        "kk",
        "cnt",
        "rep_d",
        "rep_p",
        "rem",
        "brem",
        F.lit(None).cast("string").alias("v"),
    )
    off = top_len
    for _ in range(rounds):
        sd = d_top.select(
            "doc_id",
            (F.col("pos") - off).alias("pos"),
            F.col("e").alias("de"),
            F.col("g").alias("dg"),
        )
        rb = h_top.select(
            F.col("doc_id").alias("rep_d"),
            (F.col("pos") - off).alias("rep_p"),
            F.col("r").alias("br"),
        )
        rd = F.col("rem") - off  # delta tokens left at this offset
        rb2 = F.col("brem") - off  # member tokens left (shared tail)
        cur = (
            cur.join(sd, ["doc_id", "pos"], "left")
            .join(rb, ["rep_d", "rep_p"], "left")
            .withColumn(
                "v",
                F.when(F.col("v").isNotNull(), F.col("v"))
                # the same boundary table as the pre-loop gate: equal
                # shifted classes decide by remaining lengths — ends
                # strictly inside a window are class-encoded, a
                # boundary end is not
                .when(
                    F.col("de").isNotNull() & (F.col("de") == F.col("br")),
                    F.when(rd < top_len, F.lit("eq"))
                    .when((rd == top_len) & (rb2 == top_len), F.lit("eq"))
                    .when(rd == top_len, F.lit("lt"))
                    .when(rb2 == top_len, F.lit("gt"))
                    .otherwise(F.lit(None).cast("string")),  # advance
                )
                .when(
                    F.col("de").isNotNull() & F.col("br").isNotNull(),
                    F.when(F.col("de") < F.col("br"), "lt").otherwise("gt"),
                )
                .when(
                    F.col("dg").isNotNull() & F.col("br").isNotNull(),
                    F.when(F.col("br") <= F.col("dg"), "gt").otherwise("lt"),
                ),
            )
            .drop("de", "dg", "br")
            .localCheckpoint(eager=False)
        )
        off += top_len
    resolved = cur.filter(F.col("v").isin("lt", "gt")).select(
        "doc_id",
        "pos",
        F.when(F.col("v") == "lt", F.col("kk"))
        .otherwise(F.col("kk") + F.col("cnt"))
        .alias("ins"),
    )
    # identical-suffix ties: base members of the class sorted by
    # (doc_id, pos) ARE consecutive sa_ranks, so one class-partitioned
    # as-of window reads the insertion rank directly.
    # GUARD (r14 ADVICE): the rounds bound makes a post-loop null v
    # unreachable — both sides advance L_top per round and every
    # boundary row resolves via the rem/brem table — but that
    # invariant lives in reasoning, not structure. Route any null-v
    # row into this branch behind a row-level assert_true (free when
    # the invariant holds; a LOUD failure, never a silently dropped
    # insertion rank, if a future rounds change breaks it).
    loop_eq = cur.filter(
        (F.col("v") == "eq") | F.col("v").isNull()
    ).select(
        "doc_id",
        "pos",
        "e",
        (
            F.col("kk")
            + F.coalesce(
                F.assert_true(
                    F.col("v").isNotNull(),
                    F.lit(
                        "place_delta_ranks: tail-compare loop ended with an "
                        "unresolved row — the ceil(max_rem / L_top) rounds "
                        "bound no longer covers every ambiguous pair"
                    ),
                ).cast("long"),
                F.lit(0),
            )
        ).alias("kk"),
    )
    ties = fin_eq.select("doc_id", "pos", "e", "kk").unionByName(loop_eq)
    members = bf.join(
        ties.select(F.col("e").alias("r")).distinct(), "r"
    ).select(
        F.col("r").alias("e"),
        "doc_id",
        "pos",
        "sa_rank",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("kk"),
    )
    uu = members.unionByName(
        ties.select(
            "e",
            "doc_id",
            "pos",
            F.lit(None).cast("long").alias("sa_rank"),
            F.lit(1).alias("tag"),
            "kk",
        )
    )
    wt = (
        Window.partitionBy("e")
        .orderBy(F.struct("doc_id", "pos"), "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tie_ins = (
        uu.withColumn("mx", F.max("sa_rank").over(wt))
        .filter(F.col("tag") == 1)
        .select(
            "doc_id", "pos", F.coalesce("mx", "kk").cast("long").alias("ins")
        )
    )
    return (
        gaps.unionByName(pre_lt)
        .unionByName(pre_gt)
        .unionByName(resolved)
        .unionByName(tie_ins)
    )


def delta_base_lcp(
    pairs: DataFrame,
    states: list[tuple[int, DataFrame]],
    base_history: list[tuple[int, DataFrame]],
    base_pos: DataFrame,
    delta_pos: DataFrame,
    base_lens: DataFrame,
    delta_lens: DataFrame,
    max_len: int,
) -> DataFrame:
    """LCP of MIXED (delta suffix, base suffix) pairs through the
    extended ladder — the suffix_lcp_adjacent walk generalized across
    the base/delta boundary, so the stored-base incremental path can
    recover merged-order neighbor LCPs without ever materializing a
    suffix or re-ranking the base.

    ``pairs``: (d1, p1, d2, p2) with side 1 a DELTA position and side 2
    a BASE position. Equality at level L = the delta side's EXACT state
    class equals the base side's stored rank at the shifted offsets (a
    GAP state means the window is unseen in base, hence unequal —
    exact, not approximate). The walk: a repeat-top loop
    (⌈max_len / L_top⌉ rounds — identical runs longer than the retained
    top level advance L_top per round; ZERO extra rounds under the
    depth exit), one pass down the remaining levels, the single-token
    step, then the least(acc, remaining lengths) cap that makes every
    boundary overshoot exact (the base-base walk's own convention).

    Output: (d1, p1, d2, p2, lcp). All flowing rows are |pairs|-width;
    every join is a keyed hash join against checkpointed rank/state
    tables."""
    import math

    top_len, d_top = states[-1]
    h_top = base_history[-1][1]
    cur = pairs.select(
        "d1", "p1", "d2", "p2", F.lit(0).cast("long").alias("acc")
    )
    rounds = max(1, math.ceil(max_len / top_len))
    for _ in range(rounds):
        s1 = d_top.select(
            F.col("doc_id").alias("d1"),
            F.col("pos").alias("q1"),
            F.col("e").alias("de"),
        )
        s2 = h_top.select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("q2"),
            F.col("r").alias("br"),
        )
        cur = (
            cur.withColumn("q1", F.col("p1") + F.col("acc"))
            .withColumn("q2", F.col("p2") + F.col("acc"))
            .join(s1, ["d1", "q1"], "left")
            .join(s2, ["d2", "q2"], "left")
            .withColumn(
                "acc",
                F.when(
                    F.col("de").isNotNull() & (F.col("de") == F.col("br")),
                    F.col("acc") + top_len,
                ).otherwise(F.col("acc")),
            )
            .drop("q1", "q2", "de", "br")
            .localCheckpoint(eager=False)
        )
    for (L, dfr), (_, bfr) in zip(states[-2::-1], base_history[-2::-1]):
        s1 = dfr.select(
            F.col("doc_id").alias("d1"),
            F.col("pos").alias("q1"),
            F.col("e").alias("de"),
        )
        s2 = bfr.select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("q2"),
            F.col("r").alias("br"),
        )
        cur = (
            cur.withColumn("q1", F.col("p1") + F.col("acc"))
            .withColumn("q2", F.col("p2") + F.col("acc"))
            .join(s1, ["d1", "q1"], "left")
            .join(s2, ["d2", "q2"], "left")
            .withColumn(
                "acc",
                F.when(
                    F.col("de").isNotNull() & (F.col("de") == F.col("br")),
                    F.col("acc") + L,
                ).otherwise(F.col("acc")),
            )
            .drop("q1", "q2", "de", "br")
        )
    t1 = delta_pos.select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("q1"),
        F.col("token").alias("ta"),
    )
    t2 = base_pos.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("q2"),
        F.col("token").alias("tb"),
    )
    cur = (
        cur.withColumn("q1", F.col("p1") + F.col("acc"))
        .withColumn("q2", F.col("p2") + F.col("acc"))
        .join(t1, ["d1", "q1"], "left")
        .join(t2, ["d2", "q2"], "left")
        .withColumn(
            "acc",
            F.when(
                F.col("ta").isNotNull() & (F.col("ta") == F.col("tb")),
                F.col("acc") + 1,
            ).otherwise(F.col("acc")),
        )
        .drop("q1", "q2", "ta", "tb")
    )
    l1 = delta_lens.select(
        F.col("doc_id").alias("d1"), F.col("n_tokens").alias("n1")
    )
    l2 = base_lens.select(
        F.col("doc_id").alias("d2"), F.col("n_tokens").alias("n2")
    )
    return (
        cur.join(l1, "d1")
        .join(l2, "d2")
        .select(
            "d1",
            "p1",
            "d2",
            "p2",
            F.least(
                F.col("acc"),
                F.col("n1") - F.col("p1"),
                F.col("n2") - F.col("p2"),
            )
            .cast("long")
            .alias("lcp"),
        )
    )


def dup_len_per_position(pairs: DataFrame) -> DataFrame:
    """Per-position duplicated-prefix length from the adjacent-pair LCP
    table: m(doc, pos) = max LCP against the previous- and next-rank
    neighbor. Because suffixes sharing a prefix are CONTIGUOUS in the
    array, this equals the longest prefix of the suffix occurring
    anywhere else in the corpus (Lee et al. 2021 §4.1's per-position
    match length). Input: ``suffix_lcp_adjacent`` output. Output:
    (doc_id, pos, m) — one map-side-combined groupBy over id-width
    rows."""
    sides = pairs.select(
        F.col("d1").alias("doc_id"), F.col("p1").alias("pos"), "lcp"
    ).unionAll(
        pairs.select(F.col("d2").alias("doc_id"), F.col("p2").alias("pos"), "lcp")
    )
    return sides.groupBy("doc_id", "pos").agg(F.max("lcp").alias("m"))


def merge_intervals(iv: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Merge overlapping or ADJACENT half-open intervals [s, e) into
    maximal spans per ``id_col`` — the gaps-and-islands operator over
    interval algebra: order by (s, e), break an island where a start
    strictly clears the running max of every preceding end, number
    islands by the running break count, then min/max per island.

    Scale shape: two windows and one groupBy, all partitioned by the
    id — interval rows are id-width and per-document interval counts
    are bounded by document length, so no partition ever holds more
    than one document's intervals times its ordering window."""
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy(id_col)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "brk",
        (F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)))
        .cast("long"),
    )
    return (
        flagged.withColumn("g", F.sum("brk").over(wrun))
        .groupBy(id_col, "g")
        .agg(
            F.min("s").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
        )
        .drop("g")
    )


def covered_positions(tok: DataFrame, m: DataFrame, threshold: int) -> DataFrame:
    """Mark every token position covered by SOME qualifying duplicated
    interval: position q is removed iff a p ≤ q exists with
    m(p) ≥ threshold and p + m(p) > q. One running-max window over the
    per-document position stream — linear, no range join: cum(q) =
    max over p ≤ q of (p + m(p) when m(p) ≥ threshold), removed ⇔
    cum(q) > q.

    ``tok``: (doc_id, pos, token); ``m``: ``dup_len_per_position``
    output. Output: tok's columns plus boolean ``removed``."""
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = tok.join(m, ["doc_id", "pos"], "left")
    cum = F.max(
        F.when(F.col("m") >= threshold, F.col("pos") + F.col("m"))
    ).over(wcum)
    return (
        j.withColumn("cum", cum)
        .withColumn(
            "removed",
            F.col("cum").isNotNull() & (F.col("cum") > F.col("pos")),
        )
        .drop("m", "cum")
    )


def suffix_lcp_adjacent(
    final: DataFrame,
    history: list[tuple[int, DataFrame]],
    pos: DataFrame,
    lens: DataFrame,
    pair_filter=None,
) -> DataFrame:
    """LCP of every ADJACENT suffix pair in the array — the
    Manber–Myers companion structure, recovered from the doubling
    rounds instead of comparing token arrays (suffixes are never
    materialized; every refinement join carries id-width rows).

    For the pair at ranks (k, k+1): walk the rank history from the
    highest prefix length L down — if both sides share the level-L
    class at their current offset, the suffixes agree on L more
    tokens, so advance the accumulator by L (every integer is a sum
    of distinct available Ls plus the final single-token step, so the
    greedy walk is exact). A level-L class can also mean "both tails
    end identically within L", which may overshoot — the final
    least(acc, remaining lengths) cap restores the true value (the
    identical-cross-document-suffix case, where lcp = the full tail).

    ``lens``: (doc_id, n_tokens). Output: (d1, p1, d2, p2, lcp) — one
    row per adjacent pair, both orientations available by reading
    either side.

    ``pair_filter``: optional column predicate over (d1, p1, d2, p2),
    applied to the adjacent-pair frame BEFORE the refinement walk —
    the incremental-dedup hook: a base+delta caller that only needs
    m(p) for delta positions keeps just the pairs touching a delta
    side, so the log(max_len) join chain processes O(|delta|) rows
    instead of re-walking every base-only pair.

    Scale shape: log(max_len) + 1 equi-joins per pair row against the
    CHECKPOINTED rank tables (keys (doc_id, pos + acc) — computed,
    still hash equi-joins), then the single-token step against the
    position projection; |pairs| = |positions| − 1 (before any
    pair_filter). The per-doc length table joins as a PLAIN hash join
    — it is corpus-cardinality, the frame class the round-10 setsim
    ADVICE bans from broadcast. No token arrays shuffle anywhere."""
    a = final.select(
        F.col("doc_id").alias("d1"), F.col("pos").alias("p1"), "sa_rank"
    )
    b = final.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        (F.col("sa_rank") - 1).alias("sa_rank"),
    )
    cur = a.join(b, "sa_rank").select(
        "d1", "p1", "d2", "p2", F.lit(0).cast("long").alias("acc")
    )
    if pair_filter is not None:
        cur = cur.filter(pair_filter)
    levels = sorted(history, key=lambda t: -t[0])
    for i, (L, fr) in enumerate(levels):
        r1 = fr.select(
            F.col("doc_id").alias("d1"),
            F.col("pos").alias("q1"),
            F.col("r").alias("ra"),
        )
        r2 = fr.select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("q2"),
            F.col("r").alias("rb"),
        )
        # TOP level (round-12): sharing the top retained class means
        # IDENTICAL TAILS in both exit regimes — depth exit: the top
        # level L ≥ max doc length, so an L-class holds suffixes whose
        # entire tails agree; stability exit: the top level is the
        # doubling FIXPOINT, whose classes agree at every larger
        # length too. Bump by a sentinel far past any doc length: the
        # later (smaller) level joins find no rank rows at the shifted
        # offsets (left-join nulls, acc unchanged) and the final
        # least(acc, remaining lengths) cap lands on the exact common
        # tail. Without the sentinel a stability-exited history could
        # under-accumulate: Σ retained levels + 1 < tail length.
        bump = F.lit((1 << 40) if i == 0 else L).cast("long")
        cur = (
            cur.withColumn("q1", F.col("p1") + F.col("acc"))
            .withColumn("q2", F.col("p2") + F.col("acc"))
            .join(r1, ["d1", "q1"], "left")
            .join(r2, ["d2", "q2"], "left")
            .withColumn(
                "acc",
                F.when(
                    F.col("ra").isNotNull() & (F.col("ra") == F.col("rb")),
                    F.col("acc") + bump,
                ).otherwise(F.col("acc")),
            )
            .drop("q1", "q2", "ra", "rb")
        )
    t1 = pos.select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("q1"),
        F.col("token").alias("ta"),
    )
    t2 = pos.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("q2"),
        F.col("token").alias("tb"),
    )
    cur = (
        cur.withColumn("q1", F.col("p1") + F.col("acc"))
        .withColumn("q2", F.col("p2") + F.col("acc"))
        .join(t1, ["d1", "q1"], "left")
        .join(t2, ["d2", "q2"], "left")
        .withColumn(
            "acc",
            F.when(
                F.col("ta").isNotNull() & (F.col("ta") == F.col("tb")),
                F.col("acc") + 1,
            ).otherwise(F.col("acc")),
        )
        .drop("q1", "q2", "ta", "tb")
    )
    l1 = lens.select(F.col("doc_id").alias("d1"), F.col("n_tokens").alias("n1"))
    l2 = lens.select(F.col("doc_id").alias("d2"), F.col("n_tokens").alias("n2"))
    return (
        cur.join(l1, "d1")
        .join(l2, "d2")
        .select(
            "d1",
            "p1",
            "d2",
            "p2",
            F.least(
                F.col("acc"),
                F.col("n1") - F.col("p1"),
                F.col("n2") - F.col("p2"),
            )
            .cast("long")
            .alias("lcp"),
        )
    )
