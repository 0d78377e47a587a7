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


def suffix_ranks(
    base: DataFrame,
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
    memoize per (session, sf)."""
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
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # NULL join keys never match — carry (end, t2v) with end flagging
    # the suffix-final position so the bigram join stays an equi-join
    pos2 = pos.withColumn("t2", F.lead("token").over(wdoc)).select(
        "doc_id",
        "pos",
        "token",
        F.col("t2").isNull().alias("end"),
        F.coalesce(F.col("t2"), F.lit("")).alias("t2v"),
    )
    vocab = pos2.select("token", "end", "t2v").distinct()
    vr = vocab.withColumn(
        "r",
        (
            F.row_number().over(
                # suffix-final (end=true) sorts before every real
                # continuation — the −1 sentinel / prefix-first order
                Window.orderBy(
                    F.asc("token"), F.desc("end"), F.asc("t2v")
                )
            )
            - 1
        ).cast("long"),
    )
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
    if npos == 0:
        empty = cur.select(
            "doc_id", "pos", F.lit(0).cast("long").alias("sa_rank")
        )
        return empty, [], pos
    bwidth = max(1, math.ceil(npos / _NBUCKETS))
    history: list[tuple[int, DataFrame]] = [(2, cur)]

    h = 2
    while h < maxlen:
        nxt = cur.select(
            "doc_id", (F.col("pos") - h).alias("pos"), F.col("r").alias("r2")
        )
        paired = (
            cur.join(nxt, ["doc_id", "pos"], "left")
            .select(
                "doc_id",
                "pos",
                "r",
                F.coalesce(F.col("r2"), F.lit(-1)).alias("r2"),
            )
        )
        ranked = _bucketed_rank(paired, ["r", "r2"], "r", bwidth, dense=True)
        cur = ranked.select(
            "doc_id", "pos", F.col("gr").alias("r")
        ).localCheckpoint(eager=True)
        h *= 2
        history.append((h, cur))
        # early exit: all ranks distinct → no pair can refine further
        top = cur.agg(F.max("r")).collect()[0][0]
        if top == npos - 1:
            break
        # STABILITY exit (round-12): doubling only refines, so equal
        # class count ⟺ equal partition; and a round with no split is
        # the Manber–Myers fixpoint — if p ≡₂ₕ q then p+h ≡ₕ q+h (the
        # second key component), stability lifts that to p+h ≡₂ₕ q+h,
        # whose second component gives p+2h ≡ₕ q+2h, so by induction
        # every later level equals this one. Remaining tied classes
        # are IDENTICAL TAILS (verbatim re-crawls), which full-depth
        # doubling could never separate anyway — the walk resolves
        # them via the top-level sentinel (suffix_lcp_adjacent). The
        # level just appended duplicates the previous partition, so
        # drop it: the stable level is the walk's top.
        if top == prev_top:
            # The dropped level is POINTWISE equal to the retained one,
            # not just partition-equal: no split means every r-class has
            # one (r, r2) value, so the dense rank over (r, r2) ordered
            # lexicographically is r itself. Rebind cur to the retained
            # top so the final tie-break reads the stable level, then
            # release the redundant frame's eager localCheckpoint —
            # otherwise its storage blocks stay pinned until the
            # ContextCleaner notices (bench memo clearing can't reach a
            # frame that left history).
            from idh_etl_demo_spark.operators.graph import _release_checkpoint

            _release_checkpoint(history.pop()[1])
            cur = history[-1][1]
            break
        prev_top = top

    # total order: identical cross-document suffixes share a rank class
    # after the loop; break ties positionally (the oracle's
    # ORDER BY suffix, doc_id, pos)
    final = _bucketed_rank(
        cur, ["r", "doc_id", "pos"], "r", bwidth, dense=False
    )
    final = final.select(
        "doc_id", "pos", F.col("gr").alias("sa_rank")
    ).localCheckpoint(eager=True)
    return final, history, pos


def place_delta_ranks(
    base_final: DataFrame,
    base_toks: DataFrame,
    delta_toks: DataFrame,
    n_base: int,
) -> DataFrame:
    """Insertion ranks of every DELTA suffix into a STORED base suffix
    order by batched binary search — the placement stage of the
    stored-base incremental-SA design (catalog_r11.py section comment;
    prototyped for the r12 verdict's stretch ask #8).

    Inputs: ``base_final`` (doc_id, pos, sa_rank 1..n_base) — the
    stored base order; ``base_toks`` / ``delta_toks`` (doc_id, toks).
    Output: (doc_id, pos, ins) per delta position, where ins = the
    count of base suffixes sorting STRICTLY before the delta suffix
    under the build's total order (suffix tokens, then (doc_id, pos))
    — the delta suffix slots between base ranks ins and ins + 1, so
    the merged total order is base_rank + |{ins < base_rank}| on the
    base side and ins + delta-internal rank on the delta side (pinned
    by test_sa_placement_matches_combined_rebuild).

    Shape: ⌈log₂(n_base + 1)⌉ rounds; each round ALL delta positions
    probe their bisection midpoint with one plain hash join against
    the stored rank table (|delta| rows out — never the base corpus),
    one doc-keyed join to slice the probed base suffix, and a struct
    comparison; the state frame localCheckpoints per round (the
    doubling loop's convention) and the superseded round is released.

    Prototype shortcuts, stated: suffixes compare as space-joined
    strings (order-equivalent to element-wise token order for
    whitespace-split tokens) and each probed base suffix is sliced
    from the token arrays per round. A production 100 TB placement
    would compare through the stored rank LADDER (the build's history
    levels) — O(log L) rank lookups per comparison with no token
    movement — and bucket the |delta| state by probe rank so each
    round is one co-partitioned join."""
    import math

    d = delta_toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(toks)), i ->"
                " concat_ws(' ', slice(toks, i, size(toks) - i + 1)))"
            )
        ).alias("p0", "suf"),
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("p0").cast("long").alias("pos"),
        "suf",
    )
    brank = base_final.select(
        F.col("sa_rank").alias("_mid"),
        F.col("doc_id").cast("long").alias("bd"),
        F.col("pos").cast("long").alias("bp"),
    )
    btk = base_toks.select(
        F.col("doc_id").cast("long").alias("bd"), F.col("toks").alias("btoks")
    )
    st = d.select(
        "doc_id",
        "pos",
        "suf",
        F.lit(0).cast("long").alias("lo"),
        F.lit(int(n_base)).cast("long").alias("hi"),
    ).localCheckpoint(eager=True)
    bsuf = F.expr(
        "concat_ws(' ', slice(btoks, cast(bp + 1 as int),"
        " cast(size(btoks) - bp as int)))"
    )
    base_lt = F.struct(
        bsuf.alias("s"), F.col("bd").alias("d"), F.col("bp").alias("p")
    ) < F.struct(
        F.col("suf").alias("s"),
        F.col("doc_id").alias("d"),
        F.col("pos").alias("p"),
    )
    for _ in range(math.ceil(math.log2(n_base + 1))):
        probe = (
            st.withColumn(
                "_mid",
                F.when(
                    F.col("lo") < F.col("hi"),
                    F.expr("(lo + hi + 1) div 2"),
                ),
            )
            .join(brank, "_mid", "left")
            .join(btk, "bd", "left")
        )
        nxt = probe.select(
            "doc_id",
            "pos",
            "suf",
            F.when(F.col("_mid").isNull() | ~base_lt, F.col("lo"))
            .otherwise(F.col("_mid"))
            .alias("lo"),
            F.when(F.col("_mid").isNull(), F.col("hi"))
            .when(base_lt, F.col("hi"))
            .otherwise(F.col("_mid") - 1)
            .alias("hi"),
        ).localCheckpoint(eager=True)
        from idh_etl_demo_spark.operators.graph import _release_checkpoint

        _release_checkpoint(st)
        st = nxt
    return st.select("doc_id", "pos", F.col("lo").alias("ins"))


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
