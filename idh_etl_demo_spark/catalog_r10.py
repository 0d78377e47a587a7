"""Round-10 catalog entries: the Lee et al. 2021 ExactSubstr CUT made
whole — per-document REMOVAL SPANS from the suffix-array LCP walk, and
the CLEANED CORPUS that drops every maximal duplicated run of at least
50 tokens ("Deduplicating Training Data Makes Language Models Better",
§4.1; their threshold is 50 BPE tokens — this corpus's unit is the
whitespace token the rest of the suffix family uses).

``doc_suffix_dup_audit`` flags fixed-length-8 duplicated windows and
``doc_longest_dup_run`` recovers per-doc maxima; the paper's actual
dedup removes EVERY maximal duplicated substring ≥ the threshold. The
missing composition is interval algebra over the LCP structure:

  1. per position p: m(p) = max(LCP with the previous-rank suffix, LCP
     with the next-rank suffix). Suffixes sharing a prefix are
     CONTIGUOUS in the array, so the two neighbors realize the max
     over ALL other corpus suffixes — m(p) is the longest prefix of
     suffix p occurring anywhere else (another document or the same
     document at another position).
  2. every p with m(p) ≥ 50 contributes the half-open interval
     [p, p + m(p)) of duplicated tokens.
  3. per document, overlapping/adjacent intervals merge into maximal
     REMOVAL SPANS (operators/suffix.merge_intervals — gaps-and-
     islands: running max of preceding ends, break where a start
     clears it).
  4. the cleaned corpus keeps exactly the uncovered tokens
     (operators/suffix.covered_positions — one running-max window per
     document, never a range join).

Oracles re-derive everything from the SORTED-SUFFIX-LIST suffix array
(DuckDB list comparison, the same independent-algorithm gate the rest
of the family uses): explode suffixes, rank by direct list sort,
adjacent LCP as the first elementwise mismatch, then the identical
interval algebra in SQL windows. Engine parity is exact integers end
to end.

Scale shape: everything here is id-width composition over the shared
memoized prefix-doubling build (catalog_r9b._SA_MODELS) — the LCP walk
is log(max_len)+1 equi-joins against CHECKPOINTED rank tables, the
interval merge is two per-document windows, and the coverage mask is
one per-document running max. Token arrays shuffle exactly once (the
cleaned entry's final per-doc reassembly, which is output-sized by
definition); text never does.

Entry contract per repo convention: @query registration with a DuckDB
oracle, a shuffle budget in tests/test_plan_shape.py with a
why-comment, bench.py HEADLINE rows, a bench_scale probe or documented
exclusion, and property tests vs a pure-Python reference on a PLANTED
≥50-token duplicate (tests/test_r10_properties.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_r9b import _SA_TOKS_SQL, _sa_base, _sa_parts

_XS_T = 50  # Lee et al. 2021's ExactSubstr length threshold


def _bigram_stream(base: DataFrame) -> DataFrame:
    """(…, w1, w2) — one row per adjacent token pair per document;
    documents shorter than 2 tokens contribute nothing. A map-side
    transform+explode over the token arrays (the sequence is guarded:
    Spark's sequence(1, 0) counts DOWN, so short docs must short-
    circuit to an empty array)."""
    pairs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i).alias("w1"),
                F.element_at(F.col("toks"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return base.select("doc_id", F.explode(pairs).alias("g")).select(
        "doc_id", "g.w1", "g.w2"
    )

# Shared oracle prelude: suffix array by direct list sort, adjacent
# LCPs by first elementwise mismatch, per-position max — the
# independent re-derivation the round-9 verdict's ask #5 requires.
# Parametrized over the corpus source so the round-11 incremental
# (base+delta) entry re-derives against ITS combined corpus.
def _xs_oracle_m(src: str) -> str:
    return f"""
    base as (select doc_id, {_SA_TOKS_SQL} as toks from {src}),
    tot as (select doc_id, len(toks) as n_tokens from base),
    pos as (
      select doc_id, u.i - 1 as pos, list_slice(toks, u.i, len(toks)) as suffix
      from base cross join lateral (
        select unnest(generate_series(1, len(toks))) as i
      ) u
    ),
    ranked as (
      select doc_id, pos, suffix,
             row_number() over (order by suffix, doc_id, pos) as rk
      from pos
    ),
    adj as (
      select a.doc_id, a.pos, a.suffix as s1, b.suffix as s2
      from ranked a join ranked b on b.rk = a.rk + 1
      union all
      select a.doc_id, a.pos, a.suffix, c.suffix
      from ranked a join ranked c on c.rk = a.rk - 1
    ),
    lcps as (
      select doc_id, pos,
             coalesce(
               nullif(
                 list_position(
                   list_transform(generate_series(1, least(len(s1), len(s2))),
                                  i -> s1[i] = s2[i]),
                   false),
                 0) - 1,
               least(len(s1), len(s2))
             ) as lcp
      from adj
    ),
    m as (select doc_id, pos, max(lcp) as m from lcps group by doc_id, pos)
"""


_XS_ORACLE_M = _xs_oracle_m("documents")

# The gaps-and-islands span-merge tail shared by every ExactSubstr
# oracle (spans, incremental, stored-base, fold, tombstone): consumes
# an ``iv(doc_id, s, e)`` CTE, emits the merged
# (doc_id, span_start, span_end, span_len) relation — ONE definition so
# a fix to the interval algebra lands everywhere (r15 review).
_XS_SPANS_TAIL_SQL = """
    flagged as (
      select doc_id, s, e,
             case when s > coalesce(max(e) over (
                    partition by doc_id order by s, e
                    rows between unbounded preceding and 1 preceding), -1)
                  then 1 else 0 end as brk
      from iv
    ),
    isl as (
      select doc_id, s, e,
             sum(brk) over (partition by doc_id order by s, e
                            rows between unbounded preceding and current row) as g
      from flagged
    )
    select doc_id,
           cast(min(s) as bigint) as span_start,
           cast(max(e) as bigint) as span_end,
           cast(max(e) - min(s) as bigint) as span_len
    from isl group by doc_id, g
    order by doc_id, span_start
"""


def _xs_m_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, m) over the shared memoized suffix-array build."""
    from idh_etl_demo_spark.operators.suffix import (
        dup_len_per_position,
        suffix_lcp_adjacent,
    )

    final, history, posf = _sa_parts(spark, sf_dir)
    lens = _sa_base(spark, sf_dir).select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    return dup_len_per_position(
        suffix_lcp_adjacent(final, history, posf, lens)
    )


@query(
    "doc_exact_substr_spans",
    f"""
    with {_XS_ORACLE_M},
    iv as (
      select doc_id, pos as s, pos + m as e from m where m >= {_XS_T}
    ),
    {_XS_SPANS_TAIL_SQL}
    """,
)
def doc_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal REMOVAL SPANS per document — the Lee et al. 2021
    ExactSubstr cut's target set: every token range covered by a
    duplicated run of ≥ {T} tokens, with overlapping/adjacent runs
    merged (a doc whose positions p and p+10 both start 60-token
    duplicated runs yields ONE [p, p+70) span, not two). Output:
    (doc_id, span_start, span_end, span_len), span_end exclusive,
    token units.

    The Spark side recovers m(p) from the prefix-doubling rank-history
    walk (operators/suffix: suffix_lcp_adjacent → dup_len_per_position)
    and merges with the gaps-and-islands interval operator
    (merge_intervals); the oracle re-derives the same spans from the
    sorted-suffix-list array by direct list comparison — two
    independent algorithms, exact integer agreement.

    Scale shape: |positions|−1 id-width LCP rows through log(max_len)+1
    checkpointed-table joins (the shared SA build), one groupBy for
    m(p), a threshold filter that leaves only qualifying interval rows
    (sparse by construction), and two per-document windows + one
    groupBy for the merge. Nothing here ever shuffles token arrays."""
    from idh_etl_demo_spark.operators.suffix import merge_intervals

    iv = (
        _xs_m_frame(spark, sf_dir)
        .filter(F.col("m") >= _XS_T)
        .select("doc_id", F.col("pos").alias("s"), (F.col("pos") + F.col("m")).alias("e"))
    )
    return (
        merge_intervals(iv)
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).cast("long").alias("span_len"),
        )
        .orderBy("doc_id", "span_start")
    )


@query(
    "doc_exact_substr_cleaned",
    f"""
    with {_XS_ORACLE_M},
    tok as (
      select doc_id, u.i - 1 as pos, toks[u.i] as token
      from base cross join lateral (
        select unnest(generate_series(1, len(toks))) as i
      ) u
    ),
    cov as (
      select t.doc_id, t.pos, t.token,
             max(case when mm.m >= {_XS_T} then t.pos + mm.m end) over (
               partition by t.doc_id order by t.pos
               rows between unbounded preceding and current row) as cum
      from tok t left join m mm on mm.doc_id = t.doc_id and mm.pos = t.pos
    ),
    perdoc as (
      select doc_id,
             sum(case when cum is not null and cum > pos then 1 else 0 end) as removed,
             coalesce(string_agg(token, ' ' order by pos)
                      filter (where cum is null or cum <= pos), '') as cleaned_text
      from cov group by doc_id
    )
    select t.doc_id,
           cast(t.n_tokens as bigint) as n_tokens,
           cast(coalesce(p.removed, 0) as bigint) as removed_tokens,
           coalesce(p.cleaned_text, '') as cleaned_text
    from tot t left join perdoc p on p.doc_id = t.doc_id
    order by t.doc_id
    """,
)
def doc_exact_substr_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLEANED CORPUS after the ExactSubstr cut: per document the
    normalized token stream with every removal-span token dropped —
    what Lee et al. 2021 actually train on after dedup (every
    occurrence goes; the paper found refitting one survivor changes
    perplexity negligibly, §4.1). Output: (doc_id, n_tokens,
    removed_tokens, cleaned_text); docs fully covered by duplicated
    runs come back with cleaned_text = ''.

    Coverage is ONE running-max window per document over the position
    stream (operators/suffix.covered_positions): position q is removed
    iff max over p ≤ q of (p + m(p) when m(p) ≥ {T}) exceeds q — never
    a position×interval range join. Reassembly sorts each document's
    kept (pos, token) structs locally (array_sort over the collected
    list — per-doc data, output-sized).

    Scale shape: the token stream joins the id-width m frame on
    (doc_id, pos) — both sides hash-partition by the same key — then
    one window + one groupBy, all per-document. The only token-bearing
    shuffle is the final per-doc collect of KEPT tokens, which is the
    entry's output. The oracle re-derives coverage from the
    sorted-suffix-list array with the identical window algebra."""
    from idh_etl_demo_spark.operators.suffix import covered_positions

    base = _sa_base(spark, sf_dir)
    lens = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    tok = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    cov = covered_positions(tok, _xs_m_frame(spark, sf_dir), _XS_T)
    kept_struct = F.when(
        ~F.col("removed"), F.struct(F.col("pos"), F.col("token"))
    )
    perdoc = cov.groupBy("doc_id").agg(
        F.sum(F.col("removed").cast("long")).alias("removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["token"]
            ),
        ).alias("cleaned_text"),
    )
    return (
        lens.join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("removed"), F.lit(0)).cast("long").alias("removed_tokens"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Interpolated Kneser-Ney bigram LM — the KenLM/CCNet estimator
# ===========================================================================
#
# CCNet (Wenzek et al. 2020) filters CommonCrawl by KenLM perplexity; the
# repo's doc_bigram_familiarity approximates that signal with RAW corpus
# frequencies, which cannot price an UNSEEN transition at all. This
# section estimates the real thing at bigram order: interpolated
# Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1999 §2.7), the
# smoothing KenLM defaults to —
#
#     P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1)
#              + (D · N1+(w1 ·) / c(w1)) · (N1+(· w2) / N1+(· ·))
#
# with the count-of-counts discount D = n1 / (n1 + 2·n2). The LM is
# trained on the doc_id % 10 != 0 split and scored on the held-out 10%,
# so unseen bigrams — the case smoothing exists for — genuinely occur
# and back off through the CONTINUATION term (how many distinct left
# contexts a word has, not how often it occurs: "francisco" is frequent
# but nearly always follows "san", so its continuation mass is tiny).
#
# Engine parity: with D = Dn/Dd kept RATIONAL, every term clears to
# exact int64 —
#     a  = max(c12·Dd − Dn, 0)      (discounted count, cleared by Dd)
#     b  = Dn · N1+(w1 ·) · N1+(· w2)
#     dc = Dd · c(w1)
#     P  = a/dc + (b/dc)/Ntot
# three IEEE double divisions and one add, evaluated in the identical
# tree shape by both engines, so scores hash-gate bit-for-bit. The
# BM25-style exactness guard (catalog_r8._bm25_term_score) enforces the
# <2^52 operand bound on Spark's wrapping int64 products; DuckDB raises
# on int64 overflow natively. At 100 TB the counts need the disclosed
# rescale (divide c12/c1 by a common sample rate) or 128-bit sums.

_KN_TAU = 0.025  # improbable-transition threshold, ~p10 of held-out P
_KN_TOP = 100

_KN_ORACLE_PRELUDE = f"""
    base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    tr as (select * from base where doc_id % 10 != 0),
    ho as (select * from base where doc_id % 10 = 0),
    tg as (
      select toks[u.i] as w1, toks[u.i + 1] as w2
      from tr cross join lateral (
        select unnest(generate_series(1, greatest(len(toks) - 1, 0))) as i
      ) u
    ),
    c12 as (select w1, w2, count(*)::bigint as c12 from tg group by w1, w2),
    c1 as (select w1, sum(c12)::bigint as c1, count(*)::bigint as n1p
           from c12 group by w1),
    cont as (select w2, count(*)::bigint as ncont from c12 group by w2),
    tot as (select count(*)::bigint as ntot,
                   coalesce(sum(case when c12 = 1 then 1 else 0 end), 0)::bigint as nn1,
                   coalesce(sum(case when c12 = 2 then 1 else 0 end), 0)::bigint as nn2
            from c12),
    disc as (select case when nn1 + 2 * nn2 = 0 then 1 else nn1 end as dn,
                    case when nn1 + 2 * nn2 = 0 then 2 else nn1 + 2 * nn2 end as dd,
                    ntot from tot)
"""


def _kn_parts(spark: SparkSession, sf_dir: str):
    """(c12, c1, cont, disc) count tables of the train-split bigram LM;
    disc is the 1-row (dn, dd, ntot) discount frame."""
    base = _sa_base(spark, sf_dir)
    tr = base.filter(F.col("doc_id") % 10 != 0)
    c12 = (
        _bigram_stream(tr)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("ncont"))
    tot = c12.agg(
        F.count(F.lit(1)).cast("long").alias("ntot"),
        F.coalesce(
            F.sum(F.when(F.col("c12") == 1, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("nn1"),
        F.coalesce(
            F.sum(F.when(F.col("c12") == 2, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("nn2"),
    )
    disc = tot.select(
        F.when(F.col("nn1") + 2 * F.col("nn2") == 0, F.lit(1))
        .otherwise(F.col("nn1"))
        .cast("long")
        .alias("dn"),
        F.when(F.col("nn1") + 2 * F.col("nn2") == 0, F.lit(2))
        .otherwise(F.col("nn1") + 2 * F.col("nn2"))
        .cast("long")
        .alias("dd"),
        "ntot",
    )
    return c12, c1, cont, disc


def _kn_guarded_p() -> F.Column:
    """P(w2|w1) for a SEEN context: a/dc + (b/dc)/ntot over exact int64
    a, b, dc, ntot columns, with the BM25-style wrap guard — Spark long
    products wrap silently past int64 and the double divisions are only
    bit-identical across engines while operands stay < 2^52."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    bound = F.lit(float(2**52))
    return F.when(
        (d("a") < bound) & (d("b") < bound) & (d("dc") < bound),
        d("a") / d("dc") + (d("b") / d("dc")) / d("ntot"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "kneser-ney exactness bound exceeded: an operand reached "
                "2^52; rescale the cleared-discount counts (catalog_r10)"
            )
        ).cast("double")
    )


@query(
    "doc_kn_bigram_lm",
    f"""
    with {_KN_ORACLE_PRELUDE},
    lm as (
      select g.w1, g.w2, g.c12, c.c1, c.n1p, k.ncont,
             greatest(g.c12 * d.dd - d.dn, 0) as a,
             d.dn * c.n1p * k.ncont as b,
             d.dd * c.c1 as dc,
             d.ntot as ntot
      from c12 g join c1 c using (w1) join cont k using (w2) cross join disc d
    )
    select w1, w2, c12, c1, n1p, ncont,
           a * 1.0 / dc + (b * 1.0 / dc) / ntot as pkn
    from lm
    order by c12 desc, w1, w2
    limit {_KN_TOP}
    """,
)
def doc_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM over the train split — the
    KenLM estimator CCNet filters CommonCrawl with, as count tables +
    smoothed probabilities (section comment: the cleared-rational form
    that hash-gates across engines). Output: the {top} most frequent
    bigrams (ties by words) with c(w1 w2), c(w1), the two continuation
    counts and P_KN(w2|w1).

    Scale shape: three map-side-combined groupBys over the bigram
    stream (pair counts, left-context rollup, right-continuation
    rollup) + one 1-row count-of-counts aggregate for the discount;
    the probability is a projection over the joined count tables (both
    joins keyed on a word — vocabulary-sized, far below the token
    stream on repetitive text); the top-{top} is a TakeOrdered. The
    property test pins Σ_w2 P(w2|w1) = 1 per context against a
    pure-Python KN twin — the normalization smoothing exists to
    preserve."""
    c12, c1, cont, disc = _kn_parts(spark, sf_dir)
    lm = (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(disc))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1p",
            "ncont",
            F.greatest(
                F.col("c12") * F.col("dd") - F.col("dn"), F.lit(0)
            ).cast("long").alias("a"),
            (F.col("dn") * F.col("n1p") * F.col("ncont")).alias("b"),
            (F.col("dd") * F.col("c1")).alias("dc"),
            "ntot",
        )
    )
    return (
        lm.select(
            "w1", "w2", "c12", "c1", "n1p", "ncont",
            _kn_guarded_p().alias("pkn"),
        )
        .orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(_KN_TOP)
    )


def _kn_scored_stream(
    hg: DataFrame, c12, c1, cont, disc, label: str = "scoring"
) -> DataFrame:
    """(doc_id, unseen, pkn) for a bigram stream ``hg`` under the
    trained KN count tables — the three-branch backoff case (seen
    context+word / unseen word / unseen context) with the 2^52
    exactness guard, shared by the held-out surprisal entry and the
    round-11 all-docs CCNet scorer so both price transitions through
    the IDENTICAL expression tree."""
    bound = F.lit(float(2**52))
    return (
        hg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(disc))
        .select(
            "doc_id",
            F.col("c12").isNull().alias("unseen"),
            F.when(
                F.col("c1").isNull(),
                F.coalesce(F.col("ncont"), F.lit(0)).cast("double")
                / F.col("ntot").cast("double"),
            )
            .when(F.col("ncont").isNull(), F.lit(0.0))
            .otherwise(
                F.when(
                    (
                        F.greatest(
                            F.coalesce(F.col("c12"), F.lit(0)) * F.col("dd")
                            - F.col("dn"),
                            F.lit(0),
                        ).cast("double")
                        < bound
                    )
                    & (
                        (F.col("dn") * F.col("n1p") * F.col("ncont")).cast(
                            "double"
                        )
                        < bound
                    )
                    & ((F.col("dd") * F.col("c1")).cast("double") < bound),
                    F.greatest(
                        F.coalesce(F.col("c12"), F.lit(0)) * F.col("dd")
                        - F.col("dn"),
                        F.lit(0),
                    ).cast("double")
                    / (F.col("dd") * F.col("c1")).cast("double")
                    + (
                        (F.col("dn") * F.col("n1p") * F.col("ncont")).cast(
                            "double"
                        )
                        / (F.col("dd") * F.col("c1")).cast("double")
                    )
                    / F.col("ntot").cast("double"),
                ).otherwise(
                    F.raise_error(
                        F.lit(
                            f"kneser-ney exactness bound exceeded ({label}): "
                            "rescale the cleared-discount counts"
                        )
                    ).cast("double")
                )
            )
            .alias("pkn"),
        )
    )


@query(
    "doc_kn_surprisal_rate",
    f"""
    with {_KN_ORACLE_PRELUDE},
    hg as (
      select doc_id, toks[u.i] as w1, toks[u.i + 1] as w2
      from ho cross join lateral (
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
             end as pkn,
             g.c12 is null as unseen
      from hg h
      left join c12 g on g.w1 = h.w1 and g.w2 = h.w2
      left join c1 c on c.w1 = h.w1
      left join cont k on k.w2 = h.w2
      cross join disc d
    ),
    perdoc as (
      select doc_id, count(*)::bigint as n_bigrams,
             cast(sum(case when unseen then 1 else 0 end) as bigint) as n_unseen,
             cast(sum(case when pkn < {_KN_TAU} then 1 else 0 end) as bigint)
               as n_improbable
      from sc group by doc_id
    )
    select h.doc_id,
           coalesce(p.n_bigrams, 0) as n_bigrams,
           coalesce(p.n_unseen, 0) as n_unseen,
           coalesce(p.n_improbable, 0) as n_improbable,
           case when coalesce(p.n_bigrams, 0) > 0
                then p.n_improbable * 1.0 / p.n_bigrams else 0.0 end
             as improbable_rate
    from (select doc_id from ho) h
    left join perdoc p using (doc_id)
    order by h.doc_id
    """,
)
def doc_kn_surprisal_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM scoring — the CCNet quality signal from a properly
    SMOOTHED model: every doc_id % 10 == 0 document's transitions are
    priced under the train-split Kneser-Ney LM, and the doc is
    summarized by its improbable-transition rate (P_KN < {tau}, ~the
    held-out 10th percentile). Unseen bigrams back off through the
    continuation term: unseen (w1, w2) with a known context prices at
    λ(w1)·P_cont(w2); an unseen CONTEXT prices at the continuation
    unigram N1+(·w2)/N1+(··); an unseen word at 0 — the three-branch
    case both engines evaluate in the same order. A true perplexity
    needs ln() (last-ulp engine divergence — the BM25 idf lesson), so
    the gate-able summary is the threshold RATE, not the log-sum; the
    property test computes real perplexity in the pure-Python twin and
    pins the rate ordering against it on a planted corpus.

    Scale shape: the held-out stream left-joins the three count tables
    (word-keyed, vocabulary-bounded) + the broadcast 1-row discount;
    scoring is a projection; the summary is one per-doc groupBy. Train
    and held-out sides never cross-shuffle beyond those joins."""
    c12, c1, cont, disc = _kn_parts(spark, sf_dir)
    base = _sa_base(spark, sf_dir)
    ho = base.filter(F.col("doc_id") % 10 == 0)
    hg = _bigram_stream(ho)
    scored = _kn_scored_stream(hg, c12, c1, cont, disc)
    perdoc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.col("unseen").cast("long")).cast("long").alias("n_unseen"),
        F.sum((F.col("pkn") < F.lit(_KN_TAU)).cast("long"))
        .cast("long")
        .alias("n_improbable"),
    )
    return (
        ho.select("doc_id")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_unseen"), F.lit(0)).cast("long").alias("n_unseen"),
            F.coalesce(F.col("n_improbable"), F.lit(0))
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
        .orderBy("doc_id")
    )


# ===========================================================================
# Contrastive hard-negative mining — embedding-training data op
# ===========================================================================
#
# Contrastive/embedding-model training (SimCSE, E5, GTE recipes) needs
# HARD negatives: the highest-similarity candidates that are NOT
# positives — mining them is a corpus-scale retrieval pass, and mining
# them WRONG (letting an unlabeled near-duplicate through as a
# "negative") is the classic false-negative failure that collapses
# contrastive training. This entry composes the repo's exact-cosine
# retrieval with the SemDeDup near-dup threshold as the positive
# filter: per query, candidates at cosine ≥ 0.40 (the corpus's
# near-duplicate band, catalog_r7._SEMDEDUP_THRESHOLD) are EXCLUDED —
# and counted, so the exclusion is auditable — and the top-5 below the
# band are the mined hard negatives.

_HN_POS = 0.40  # = catalog_r7._SEMDEDUP_THRESHOLD: the near-dup band
_HN_K = 5


@query(
    "embedding_hard_negatives",
    """
    with q as (
      select vec_id as query_id, {quant} as qv from embeddings where vec_id % 25 = 0
    ),
    c as (select vec_id as neighbor_id, {quant} as cv from embeddings),
    scored as (
      select query_id, neighbor_id,
             list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv))
               * sqrt(list_dot_product(cv, cv))) as cosine_sim
      from q, c
      where neighbor_id != query_id
    ),
    marked as (
      select *,
             cast(sum(case when cosine_sim >= {pos} then 1 else 0 end)
                  over (partition by query_id) as bigint) as n_excluded
      from scored
    )
    select query_id, neighbor_id, cosine_sim, rank, n_excluded from (
      select *, row_number() over (partition by query_id
                                   order by cosine_sim desc, neighbor_id asc) as rank
      from marked where cosine_sim < {pos}
    ) where rank <= {k}
    order by query_id, rank
    """.format(
        quant="list_transform(embedding, x -> cast(round(cast(x as double) * 10000, 0) as bigint))",
        pos=_HN_POS,
        k=_HN_K,
    ),
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    (vec_id % 25 == 0), the top-{k} most-similar corpus vectors BELOW
    the near-duplicate band (cosine < {pos} — candidates at or above it
    are presumed unlabeled positives and excluded, with the per-query
    exclusion count emitted for audit). Output: (query_id, neighbor_id,
    cosine_sim, rank, n_excluded).

    Engine parity: the integer-quantized exact dot products and the
    identical sqrt/division tree as embedding_cosine_topk; the
    positive-band cut compares the SAME double in both engines, so the
    boundary is deterministic. The property test plants a synthetic
    near-duplicate (must be excluded and counted) and a just-below-band
    hard negative (must surface at rank 1), with full oracle parity on
    the planted table.

    Scale shape: |Q| queries broadcast against an embarrassingly
    parallel corpus scan (the brute-force baseline — swap the candidate
    generator for the IVF/PQ serving entries at 100 TB and keep this
    entry's exclusion/rank tail verbatim); the band count rides the
    same per-query window partition as the ranking, so no second
    corpus pass."""
    from idh_etl_demo_spark.catalog_llm import _spark_int_dot, _spark_quant

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        _spark_quant(F.col("embedding")).alias("qv"),
    )
    c = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("neighbor_id"),
        _spark_quant(F.col("embedding")).alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _spark_int_dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_spark_int_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_spark_int_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("cosine_sim"),
        )
    )
    wq = Window.partitionBy("query_id")
    marked = scored.withColumn(
        "n_excluded",
        F.sum(
            F.when(F.col("cosine_sim") >= F.lit(_HN_POS), 1).otherwise(0)
        )
        .over(wq)
        .cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        marked.filter(F.col("cosine_sim") < F.lit(_HN_POS))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _HN_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rank", "n_excluded")
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# Streaming session_window aggregation — the engine's merging session
# state, oracle-gated end to end
# ===========================================================================
#
# The repo's streaming surface so far exercises watermark dedup +
# foreachBatch merges (doc_streaming_snapshot_curation) and CUSTOM
# per-key state (events_stateful_running_totals); the engine's NATIVE
# merging-session operator — groupBy(session_window(ts, gap)) under a
# watermark, append mode — is a distinct state-store machine (partial
# sessions MERGE when a bridging event arrives) and gets its own
# oracle-gated entry. The replay feeds 3 real micro-batches split by
# TIME RANGE (a watermark operator requires the replay to arrive in
# rough event-time order, exactly as a real stream does — the
# running-totals entry's event_id % 3 split would land batches 2 and 3
# entirely BEHIND the watermark, and the engine would drop them as
# late data; measured: 642 of 946 sessions survive that split).
# Sessions straddling a time cut still arrive partially in one batch
# and finish in the next, so cross-batch session MERGING is genuinely
# exercised. After the real batches, land TWO far-future sentinel
# batches. Batch 4's sentinel advances the
# watermark past every real session's close; batch 5 triggers the
# emission pass that flushes them (watermark updates at batch END and
# evictions run in the NEXT batch). The sentinel's own open session
# never emits in append mode, and is filtered by user_id anyway.
#
# The oracle is the batch gaps-and-islands sessionization with the
# session_window BOUNDARY convention measured from the engine: a gap
# of EXACTLY the 30-minute timeout still MERGES (touching windows
# [t, t+30m) and [t+30m, …) coalesce — verified identically in batch
# and streaming session_window on a planted boundary pair, and pinned
# by the property test), so a new session starts only at gap > 30m —
# the same strict > as user_sessions' lag-based oracle — and
# session_end is last_event + gap (the window's end, not max(ts)).

_SSW_RESULTS: dict[tuple, str] = {}
_SSW_SENTINEL_USER = 10**12

# Replay/emission scratch dirs created by the streaming entries. The
# memo maps above cache PATHS, so dict.clear() alone would strand full
# parquet copies of the events table under /tmp across sessions
# (round-10 ADVICE) — every work dir registers here, an atexit hook
# removes them at interpreter exit, and release_stream_workdirs() lets
# bench.py's cache clearing free them (with the memos) mid-process.
_STREAM_WORKDIRS: list[str] = []

# Path-caching memo dicts owned by OTHER modules' streaming entries
# (e.g. catalog_r11c's _SDD_RESULTS) register here so
# release_stream_workdirs() clears them together with the dirs their
# values point into — a cleared dir with a live memo entry would serve
# a dangling path on the next call.
_STREAM_MEMOS: list[dict] = []


def _register_stream_workdir(path: str) -> None:
    import atexit

    if not _STREAM_WORKDIRS:
        atexit.register(release_stream_workdirs)
    _STREAM_WORKDIRS.append(path)


def release_stream_workdirs() -> None:
    """Remove every registered streaming scratch dir and drop the memo
    entries that point into them."""
    import shutil

    for d in _STREAM_WORKDIRS:
        shutil.rmtree(d, ignore_errors=True)
    _STREAM_WORKDIRS.clear()
    _SSW_RESULTS.clear()
    _SSJ_RESULTS.clear()
    for memo in _STREAM_MEMOS:
        memo.clear()


@query(
    "events_streaming_sessions",
    """
    with ordered as (
      select user_id, ts, event_id,
             cast(round(value * 1000000, 0) as bigint) as value_micros,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w) > 1800000000
                  then 1 else 0 end as new_session
      from events
      window w as (partition by user_id order by ts asc, event_id asc)
    ),
    sessions as (
      select user_id, ts, value_micros,
             sum(new_session) over (partition by user_id
                                    order by ts asc, event_id asc
                                    rows unbounded preceding) as sno
      from ordered
    )
    select user_id,
           min(ts) as session_start,
           max(ts) + interval 30 minutes as session_end,
           cast(count(*) as bigint) as n_events,
           cast(sum(value_micros) as bigint) as sum_value_micros
    from sessions
    group by user_id, sno
    order by user_id, session_start
    """,
)
def events_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Structured Streaming SESSION WINDOWS, oracle-gated: the
    events table replayed as 3 event_id-split micro-batches through
    groupBy(session_window(ts, '30 minutes')) with a 1-minute watermark
    in APPEND mode, flushed by the two-sentinel-batch trick (section
    comment), then compared against the batch gaps-and-islands
    sessionization. Equality proves the merging session state store
    neither splits a session that a later batch bridges, double-emits,
    nor leaks events across users — final sessions are invariant to
    how the stream was batched.

    Values are quantized to integer MICROS before summing (the repo's
    exact-integer parity recipe): the state store merges partial sums
    in arrival order, the oracle in scan order — int64 addition is
    associative where rounding a differently-associated double sum is
    not (a 0.00005-straddling residual flake, round-10 ADVICE).

    EAGER by streaming nature (cached per session+sf, like the other
    streaming entries; EAGER_EXEMPT). At 100 TB the session state
    shards by grouping key across executors (RocksDB provider), and
    the watermark bounds state: closed sessions leave the store — the
    unbounded-batch alternative (a global sort per refresh) is exactly
    what this operator exists to avoid."""
    import os
    import shutil
    import tempfile

    import pyspark.sql.types as T

    key = (spark.sparkContext.applicationId, sf_dir)
    out = _SSW_RESULTS.get(key)
    if out is None:
        work = tempfile.mkdtemp(prefix="ssw_replay_")
        _register_stream_workdir(work)
        landing = os.path.join(work, "landing")
        out = os.path.join(work, "emissions")
        events = _t(spark, sf_dir, "events")
        os.makedirs(landing, exist_ok=True)
        # 3 real batches split by equal TIME RANGE (module comment: a
        # watermark replay must arrive in rough event-time order)
        lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
        span_us = int((hi - lo).total_seconds() * 1_000_000) + 1
        cuts = [lo] + [
            lo + __import__("datetime").timedelta(microseconds=span_us * i // 3)
            for i in (1, 2)
        ]
        for b in range(3):
            lo_b = cuts[b]
            cond = F.col("ts") >= F.lit(lo_b)
            if b < 2:
                cond = cond & (F.col("ts") < F.lit(cuts[b + 1]))
            part_df = events.filter(cond).select(
                "user_id",
                "ts",
                F.round(F.col("value") * 1000000, 0)
                .cast("long")
                .alias("value_micros"),
            )
            tmp = os.path.join(landing, f"_stage_{b}")
            part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                f
                for f in os.listdir(tmp)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            dest = os.path.join(landing, f"batch-{b}.parquet")
            shutil.move(os.path.join(tmp, part), dest)
            shutil.rmtree(tmp, ignore_errors=True)
            os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))
        # two sentinel batches: the first advances the watermark past
        # every real session, the second triggers the eviction pass
        max_ts = hi
        for b, days in ((3, 30), (4, 31)):
            sent = spark.createDataFrame(
                [(_SSW_SENTINEL_USER, max_ts, 0)],
                "user_id long, ts timestamp, value_micros long",
            ).select(
                "user_id",
                (F.col("ts") + F.expr(f"interval {days} days")).alias("ts"),
                "value_micros",
            )
            tmp = os.path.join(landing, f"_stage_{b}")
            sent.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                f
                for f in os.listdir(tmp)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            dest = os.path.join(landing, f"batch-{b}.parquet")
            shutil.move(os.path.join(tmp, part), dest)
            shutil.rmtree(tmp, ignore_errors=True)
            os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))

        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("value_micros", T.LongType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        sessions = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(
                F.session_window(F.col("ts"), "30 minutes").alias("sw"),
                F.col("user_id"),
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("value_micros").cast("long").alias("sum_value_micros"),
            )
        )

        def sink(batch: DataFrame, batch_id: int) -> None:
            batch.write.mode("append").parquet(out)

        q = (
            sessions.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _SSW_RESULTS[key] = out

    emitted = spark.read.parquet(out)
    return (
        emitted.filter(F.col("user_id") != _SSW_SENTINEL_USER)
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value_micros",
        )
        .orderBy("user_id", "session_start")
    )


# ===========================================================================
# Per-language tokenizer fertility — the multilingual-equity audit
# ===========================================================================
#
# A tokenizer trained on a mixed corpus segments some languages into
# more pieces per word than others; FERTILITY (BPE tokens per word) and
# its inverse compression (characters per token) are the standard
# equity metrics (the XLM-R/BLOOM tokenizer analyses; NLLB §8.1.2) —
# and the unit that converts doc_unimax_allocation's per-language doc
# budgets into actual TOKEN budgets. This entry prices the repo's own
# trained BPE (the doc_bpe_* chain, 3 merge rounds — shallow by
# parameter choice, the depth claim carries PROBE_BPE_DEEP.json) per
# language over the documents table.


def _fertility_sql() -> str:
    from idh_etl_demo_spark.catalog_llm import _WORDS
    from idh_etl_demo_spark.catalog_r7 import _BPE_STEPS, _bpe_ctes

    return f"""
    with {','.join(_bpe_ctes())},
    seg as (select word, len(syms) as n_syms, length(word) as n_chars
            from w{_BPE_STEPS}),
    doc_words as (
      select lang, word
      from (select lang, unnest({_WORDS}) as word from documents)
      where word <> ''
    ),
    per_lang as (
      select dw.lang,
             count(*) as n_words,
             sum(seg.n_syms) as n_bpe_tokens,
             sum(seg.n_chars) as n_chars
      from doc_words dw join seg using (word)
      group by dw.lang
    ),
    langs as (select lang, count(*) as n_docs from documents group by lang)
    select l.lang,
           cast(l.n_docs as bigint) as n_docs,
           cast(coalesce(p.n_words, 0) as bigint) as n_words,
           cast(coalesce(p.n_bpe_tokens, 0) as bigint) as n_bpe_tokens,
           cast(coalesce(p.n_chars, 0) as bigint) as n_chars,
           case when coalesce(p.n_words, 0) > 0
                then p.n_bpe_tokens * 1.0 / p.n_words else 0.0 end as fertility,
           case when coalesce(p.n_bpe_tokens, 0) > 0
                then p.n_chars * 1.0 / p.n_bpe_tokens else 0.0 end
             as chars_per_token
    from langs l left join per_lang p using (lang)
    order by l.lang
    """


@query("doc_tokenizer_fertility", _fertility_sql())
def doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility of the trained BPE tokenizer: BPE tokens
    per word and characters per token, weighted by actual word
    occurrences — the multilingual-equity audit (a language whose
    fertility runs high pays more sequence budget per sentence, and a
    doc-count mixture like doc_unimax_allocation's under-allocates it
    in TOKEN terms). Composes doc_bpe_segmentation's symbol table
    verbatim; both ratios are single IEEE divisions of exact int64
    sums, so the frame hash-gates.

    Scale shape: identical to doc_bpe_token_counts — one corpus word
    explode + one broadcast join against the |types|-row segmentation
    table + one 5-row language rollup (map-side combined); the
    tokenizer artifact never shuffles the corpus."""
    from idh_etl_demo_spark.catalog_r7 import _bpe_frames
    from idh_etl_demo_spark.operators.text import tokens

    _, words = _bpe_frames(spark, sf_dir)
    seg = words.select(
        "word",
        F.size("syms").alias("n_syms"),
        F.length("word").alias("n_chars"),
    )
    docs = _t(spark, sf_dir, "documents")
    dw = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    per_lang = (
        dw.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    langs = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        langs.join(per_lang, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.when(
                F.coalesce(F.col("n_words"), F.lit(0)) > 0,
                d("n_bpe_tokens") / d("n_words"),
            ).otherwise(F.lit(0.0)).alias("fertility"),
            F.when(
                F.coalesce(F.col("n_bpe_tokens"), F.lit(0)) > 0,
                d("n_chars") / d("n_bpe_tokens"),
            ).otherwise(F.lit(0.0)).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Stream-stream interval join — the third streaming state machine
# ===========================================================================
#
# The repo's streaming surface now covers watermark dedup + foreachBatch
# merges, custom per-key state, and merging session windows; the
# remaining native state machine is the STREAM-STREAM JOIN — a
# symmetric hash join whose two state stores buffer each side until the
# watermark plus the join's time bound prove no further match can
# arrive. This entry runs the canonical attribution shape (every view
# within 6 hours BEFORE a purchase, per user) as a genuine two-source
# stream-stream inner join over the time-range replay, and gates the
# emitted match set against the plain batch interval join: inner
# stream-stream joins emit eagerly on match, and the matched SET is
# invariant to how the two streams were micro-batched — which is
# exactly what oracle equality proves (no match lost to premature
# state eviction, none duplicated across batches).
#
# The batch twin of this shape is purchase_view_attribution's AS-OF
# join (top-1 most recent view); the streaming state machine has no
# native as-of, so the entry keeps the full interval-match semantics —
# the as-of reduction is a per-purchase max over THIS output.

_SSJ_HOURS = 6
_SSJ_RESULTS: dict[tuple, str] = {}


@query(
    "events_streaming_attribution",
    f"""
    with p as (
      select event_id, user_id, ts from events where event_type = 'purchase'
    ),
    v as (
      select event_id as view_event_id, user_id, ts as view_ts
      from events where event_type = 'view'
    )
    select p.event_id, p.user_id, p.ts, v.view_event_id, v.view_ts
    from p join v
      on p.user_id = v.user_id
     and v.view_ts between p.ts - interval {_SSJ_HOURS} hours and p.ts
    order by p.event_id, v.view_event_id
    """,
)
def events_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase↔view attribution as a NATIVE stream-stream inner join:
    two file streams over the same time-range replay (the session-
    window entry's landing layout without the sentinels — inner joins
    emit on match, no eviction pass needed), watermarked 1 minute each,
    joined on user_id with the view bounded to the 6 hours before the
    purchase. The time bound plus both watermarks let the engine PRUNE
    buffered state (a view older than watermark − 6h can never match a
    future purchase); without them the symmetric hash join's stores
    grow forever — the property the docstring exists to teach.

    Oracle: the identical interval join in batch SQL — the matched set
    is micro-batching-invariant for an inner join, so equality proves
    no match was lost to state cleanup or duplicated across batches.
    The property test plants a purchase whose qualifying views arrive
    in an EARLIER batch than the purchase (the buffered-state path) and
    a view outside the 6-hour bound (must not match).

    Scale shape: both state stores shard by the join key across
    executors; state is bounded by (watermark + 6h) of per-user
    events. EAGER by streaming nature (cached per session+sf,
    EAGER_EXEMPT; excluded from HEADLINE/probes like the other
    streaming entries — wall time is stream startup + file landing)."""
    import os
    import shutil
    import tempfile

    import pyspark.sql.types as T

    key = (spark.sparkContext.applicationId, sf_dir)
    out = _SSJ_RESULTS.get(key)
    if out is None:
        work = tempfile.mkdtemp(prefix="ssj_replay_")
        _register_stream_workdir(work)
        landing = os.path.join(work, "landing")
        out = os.path.join(work, "emissions")
        events = _t(spark, sf_dir, "events")
        os.makedirs(landing, exist_ok=True)
        lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
        span_us = int((hi - lo).total_seconds() * 1_000_000) + 1
        cuts = [lo] + [
            lo + __import__("datetime").timedelta(microseconds=span_us * i // 3)
            for i in (1, 2)
        ]
        for b in range(3):
            cond = F.col("ts") >= F.lit(cuts[b])
            if b < 2:
                cond = cond & (F.col("ts") < F.lit(cuts[b + 1]))
            part_df = events.filter(cond).select(
                "event_id", "user_id", "ts", "event_type"
            )
            tmp = os.path.join(landing, f"_stage_{b}")
            part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                f
                for f in os.listdir(tmp)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            dest = os.path.join(landing, f"batch-{b}.parquet")
            shutil.move(os.path.join(tmp, part), dest)
            shutil.rmtree(tmp, ignore_errors=True)
            os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_type", T.StringType()),
            ]
        )

        def src() -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(landing)
            )

        purchases = (
            src()
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts")
            .withWatermark("ts", "1 minute")
        )
        views = (
            src()
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_event_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "1 minute")
        )
        joined = purchases.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("ts"))
            & (
                F.col("view_ts")
                >= F.col("ts") - F.expr(f"interval {_SSJ_HOURS} hours")
            ),
            "inner",
        ).select("event_id", "user_id", "ts", "view_event_id", "view_ts")

        def sink(batch: DataFrame, batch_id: int) -> None:
            batch.write.mode("append").parquet(out)

        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _SSJ_RESULTS[key] = out

    return (
        spark.read.parquet(out)
        .select("event_id", "user_id", "ts", "view_event_id", "view_ts")
        .orderBy("event_id", "view_event_id")
    )


# ===========================================================================
# Trigram Kneser-Ney — the RECURSIVE interpolation (Chen & Goodman §2.7)
# ===========================================================================
#
# The bigram entry demonstrates the estimator; real KenLM models are
# order-3..5, where the defining structure is RECURSION: the trigram
# distribution interpolates toward a bigram distribution built from
# CONTINUATION counts (how many distinct left contexts extend a
# bigram), which itself interpolates toward the continuation unigram —
#
#   P3(w3|w1w2) = max(c(w1w2w3) − D3, 0)/c(w1w2·)
#               + (D3·N1+(w1w2·)/c(w1w2·)) · P2(w3|w2)
#   P2(w3|w2)   = max(N1+(·w2w3) − D2, 0)/N1+(·w2·)
#               + (D2·N1+tri(w2·)/N1+(·w2·)) · P1(w3)
#   P1(w3)      = N1+(·2 w3)/N1+(·2 ·)          (distinct-w2 counts)
#
# with each level's discount from ITS OWN count-of-counts (D3 over raw
# trigram counts, D2 over the bigram continuation counts). All counts
# derive from the distinct-trigram TYPE table: N1+(·w2w3) is the
# per-(w2,w3) row count (rows are distinct triples), N1+(·w2·) the
# per-w2 row count, and the lower-order fan-outs N1+tri(w2·) /
# N1+(·2 w3) use the trigram-derived definitions so each level's
# distribution sums EXACTLY to 1 over its continuation vocabulary
# (the property test pins this; the doc-final-bigram difference from
# raw-bigram fan-outs is the standard Chen & Goodman construction).
# Probabilities are the cleared-rational chains of the bigram entry,
# evaluated in the identical tree shape by both engines.

_KN3_TOP = 100


def _kn3_parts(spark: SparkSession, sf_dir: str):
    """Count tables of the train-split trigram KN: (tri type table t,
    ctx12, mid2, cont3, disc3, disc2) — see section comment."""
    base = _sa_base(spark, sf_dir)
    tr = base.filter(F.col("doc_id") % 10 != 0)
    grams = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i).alias("w1"),
                F.element_at(F.col("toks"), i + 1).alias("w2"),
                F.element_at(F.col("toks"), i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    t = (
        tr.select(F.explode(grams).alias("g"))
        .select("g.w1", "g.w2", "g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ctx12 = t.groupBy("w1", "w2").agg(
        F.sum("c").cast("long").alias("c12"),
        F.count(F.lit(1)).cast("long").alias("n1p12"),
    )
    # continuation counts: rows of t are distinct triples, so per-group
    # row counts ARE distinct-extension counts
    n23 = t.groupBy("w2", "w3").agg(F.count(F.lit(1)).cast("long").alias("n23"))
    mid2 = t.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("nmid2"),
        F.countDistinct("w3").cast("long").alias("n1pw2"),
    )
    cont3 = n23.groupBy("w3").agg(
        F.count(F.lit(1)).cast("long").alias("ncont3")
    )
    def disc(frame: DataFrame, col: str, dn_name: str, dd_name: str) -> DataFrame:
        tot = frame.agg(
            F.coalesce(F.sum(F.when(F.col(col) == 1, 1).otherwise(0)), F.lit(0))
            .cast("long").alias("nn1"),
            F.coalesce(F.sum(F.when(F.col(col) == 2, 1).otherwise(0)), F.lit(0))
            .cast("long").alias("nn2"),
            F.count(F.lit(1)).cast("long").alias("ntot"),
        )
        return tot.select(
            F.when(F.col("nn1") + 2 * F.col("nn2") == 0, F.lit(1))
            .otherwise(F.col("nn1")).cast("long").alias(dn_name),
            F.when(F.col("nn1") + 2 * F.col("nn2") == 0, F.lit(2))
            .otherwise(F.col("nn1") + 2 * F.col("nn2")).cast("long").alias(dd_name),
            F.col("ntot").alias(dd_name + "_ntot"),
        )
    disc3 = disc(t, "c", "dn3", "dd3")
    disc2 = disc(n23, "n23", "dn2", "dd2")
    return t, ctx12, n23, mid2, cont3, disc3, disc2


_KN3_ORACLE = f"""
    with base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    tr as (select * from base where doc_id % 10 != 0),
    tg as (
      select toks[u.i] as w1, toks[u.i + 1] as w2, toks[u.i + 2] as w3
      from tr cross join lateral (
        select unnest(generate_series(1, greatest(len(toks) - 2, 0))) as i
      ) u
    ),
    t as (select w1, w2, w3, count(*)::bigint as c from tg group by w1, w2, w3),
    ctx12 as (select w1, w2, sum(c)::bigint as c12, count(*)::bigint as n1p12
              from t group by w1, w2),
    n23 as (select w2, w3, count(*)::bigint as n23 from t group by w2, w3),
    mid2 as (select w2, count(*)::bigint as nmid2,
                    count(distinct w3)::bigint as n1pw2
             from t group by w2),
    cont3 as (select w3, count(*)::bigint as ncont3 from n23 group by w3),
    d3 as (select case when sum(case when c = 1 then 1 else 0 end)
                         + 2 * sum(case when c = 2 then 1 else 0 end) = 0
                       then 1 else sum(case when c = 1 then 1 else 0 end) end::bigint as dn3,
                  case when sum(case when c = 1 then 1 else 0 end)
                         + 2 * sum(case when c = 2 then 1 else 0 end) = 0
                       then 2 else sum(case when c = 1 then 1 else 0 end)
                         + 2 * sum(case when c = 2 then 1 else 0 end) end::bigint as dd3
           from t),
    d2 as (select case when sum(case when n23 = 1 then 1 else 0 end)
                         + 2 * sum(case when n23 = 2 then 1 else 0 end) = 0
                       then 1 else sum(case when n23 = 1 then 1 else 0 end) end::bigint as dn2,
                  case when sum(case when n23 = 1 then 1 else 0 end)
                         + 2 * sum(case when n23 = 2 then 1 else 0 end) = 0
                       then 2 else sum(case when n23 = 1 then 1 else 0 end)
                         + 2 * sum(case when n23 = 2 then 1 else 0 end) end::bigint as dd2,
                  count(*)::bigint as ntot2
           from n23)
    select g.w1, g.w2, g.w3, g.c, x.c12, n.n23, m.nmid2, k.ncont3,
           greatest(g.c * d3.dd3 - d3.dn3, 0) * 1.0 / (d3.dd3 * x.c12)
           + ((d3.dn3 * x.n1p12) * 1.0 / (d3.dd3 * x.c12))
             * (greatest(n.n23 * d2.dd2 - d2.dn2, 0) * 1.0 / (d2.dd2 * m.nmid2)
                + ((d2.dn2 * m.n1pw2) * 1.0 / (d2.dd2 * m.nmid2))
                  * (k.ncont3 * 1.0 / d2.ntot2)) as pkn3
    from t g
    join ctx12 x using (w1, w2)
    join n23 n using (w2, w3)
    join mid2 m using (w2)
    join cont3 k using (w3)
    cross join d3 cross join d2
    order by g.c desc, g.w1, g.w2, g.w3
    limit {_KN3_TOP}
"""


@query("doc_kn_trigram_lm", _KN3_ORACLE)
def doc_kn_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated trigram Kneser-Ney over the train split — the
    RECURSIVE backoff that makes KN an n-gram estimator rather than a
    bigram trick (section comment): the trigram level discounts raw
    counts, the bigram level discounts CONTINUATION counts, the
    unigram level is pure continuation mass. Output: the {top} most
    frequent trigrams with every count the recursion consumes and
    P_KN3(w3|w1w2).

    Engine parity: the nested cleared-rational chain evaluated in the
    identical tree shape, with every int64 operand behind the same
    guarded-when/raise_error exactness bound as the bigram entries
    (past 2^52 the entry ERRORS instead of emitting silently-wrapped
    pkn3 — round-10 ADVICE; counts here are sums over DISTINCT type
    tables, an order of magnitude smaller than the bigram entry's raw
    counts); the pure-Python twin matches pkn3 bit-for-bit and pins
    per-context normalization Σ_w3 P3 = 1.

    Scale shape: one trigram-type groupBy over the token stream (the
    only corpus-sized exchange — map-side combined), five type-table
    rollups, two 1-row discount aggregates, and word-keyed joins whose
    sides are all bounded by distinct n-gram types; the top-{top} is a
    TakeOrdered."""
    t, ctx12, n23, mid2, cont3, disc3, disc2 = _kn3_parts(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # cleared-rational operands as named columns so the exactness guard
    # can test every int64 product before the division tree consumes it
    # (round-10 ADVICE: the bigram entries guard via _kn_guarded_p; the
    # trigram products wrapped silently past 2^52 instead of raising)
    ops = (
        t.join(ctx12, ["w1", "w2"])
        .join(n23, ["w2", "w3"])
        .join(mid2, "w2")
        .join(cont3, "w3")
        .crossJoin(F.broadcast(disc3))
        .crossJoin(F.broadcast(disc2))
        .select(
            "w1", "w2", "w3", "c", "c12", "n23", "nmid2", "ncont3",
            F.greatest(F.col("c") * F.col("dd3") - F.col("dn3"), F.lit(0))
            .cast("long")
            .alias("a3"),
            (F.col("dn3") * F.col("n1p12")).alias("l3"),
            (F.col("dd3") * F.col("c12")).alias("dc3"),
            F.greatest(F.col("n23") * F.col("dd2") - F.col("dn2"), F.lit(0))
            .cast("long")
            .alias("a2"),
            (F.col("dn2") * F.col("n1pw2")).alias("l2"),
            (F.col("dd2") * F.col("nmid2")).alias("dc2"),
            "dd2_ntot",
        )
    )
    bound = F.lit(float(2**52))
    guard = (
        (d("a3") < bound)
        & (d("l3") < bound)
        & (d("dc3") < bound)
        & (d("a2") < bound)
        & (d("l2") < bound)
        & (d("dc2") < bound)
    )
    pkn3 = F.when(
        guard,
        d("a3") / d("dc3")
        + (d("l3") / d("dc3"))
        * (
            d("a2") / d("dc2")
            + (d("l2") / d("dc2")) * (d("ncont3") / d("dd2_ntot"))
        ),
    ).otherwise(
        F.raise_error(
            F.lit(
                "kneser-ney exactness bound exceeded (trigram): an operand "
                "reached 2^52; rescale the cleared-discount counts "
                "(catalog_r10)"
            )
        ).cast("double")
    )
    lm = ops.select(
        "w1", "w2", "w3", "c", "c12", "n23", "nmid2", "ncont3",
        pkn3.alias("pkn3"),
    )
    return lm.orderBy(
        F.desc("c"), F.asc("w1"), F.asc("w2"), F.asc("w3")
    ).limit(_KN3_TOP)


# ===========================================================================
# Slowly Changing Dimension Type 2 + CDC changelog apply — the lakehouse
# table-maintenance pair
# ===========================================================================
#
# Two classic warehouse/lakehouse maintenance operators the catalog did
# not yet cover as first-class gated entries:
#
# - SCD TYPE 2: turn an ordered stream of attribute observations into
#   VALIDITY INTERVALS — compact consecutive repeats, open a new
#   version at every change, close it at the next change's timestamp
#   (lag for change detection, lead for interval close; the
#   consecutive-dedup is what separates SCD2 from a raw snapshot log).
# - CDC APPLY: reconstruct final table state from an ordered
#   insert/update/delete changelog — last-writer-wins per key with
#   DELETE tombstones (a delete as the last op removes the key; any
#   later upsert resurrects it). This is the semantic core of Delta/
#   Iceberg MERGE pipelines and of applying Debezium streams.
#
# Both derive their change streams deterministically from orders, so
# the oracles are plain SQL over the same table.


@query(
    "customer_scd2_history",
    """
    with obs as (
      select o_custkey, o_orderdate as ts, o_orderkey, o_orderpriority as attr
      from orders
    ),
    marked as (
      select o_custkey, ts, o_orderkey, attr,
             case when lag(attr) over w is null or lag(attr) over w != attr
                  then 1 else 0 end as chg
      from obs
      window w as (partition by o_custkey order by ts asc, o_orderkey asc)
    ),
    changes as (
      select o_custkey, ts, o_orderkey, attr from marked where chg = 1
    ),
    versioned as (
      select o_custkey,
             cast(row_number() over w as bigint) as version,
             attr,
             ts as valid_from,
             lead(ts) over w as valid_to,
             lead(ts) over w is null as is_current
      from changes
      window w as (partition by o_custkey order by ts asc, o_orderkey asc)
    )
    select o_custkey, version, attr, valid_from, valid_to, is_current
    from versioned
    order by o_custkey, version
    """,
)
def customer_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension build: each customer's order stream is an
    ordered feed of priority observations; consecutive repeats compact
    away (no spurious versions), every CHANGE opens a version row with
    [valid_from, valid_to) and the open version carries is_current —
    the standard warehouse history table, built with two windows over
    one partitioning (lag detects the change, lead closes the
    interval) and zero joins.

    Scale shape: both windows and the row_number share ONE
    (o_custkey)-partitioned sort — a single exchange over id-width
    rows; compaction happens before versioning, so the versioned frame
    is bounded by actual changes, not observations. Deterministic
    same-day ordering via the o_orderkey tie-break."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("ts"), F.asc("o_orderkey")
    )
    obs = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        F.col("o_orderpriority").alias("attr"),
    )
    changes = obs.withColumn(
        "chg",
        F.when(
            F.lag("attr").over(w).isNull()
            | (F.lag("attr").over(w) != F.col("attr")),
            1,
        ).otherwise(0),
    ).filter(F.col("chg") == 1)
    wv = Window.partitionBy("o_custkey").orderBy(
        F.asc("ts"), F.asc("o_orderkey")
    )
    return (
        changes.select(
            "o_custkey",
            F.row_number().over(wv).cast("long").alias("version"),
            "attr",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wv).alias("valid_to"),
            F.lead("ts").over(wv).isNull().alias("is_current"),
        )
        .orderBy("o_custkey", "version")
    )


@query(
    "orders_cdc_apply",
    """
    with log as (
      select o_custkey as key,
             o_orderdate as ts,
             o_orderkey as seq,
             case when o_orderkey % 7 = 0 then 'delete' else 'upsert' end as op,
             cast(round(o_totalprice * 100, 0) as bigint) as payload_cents
      from orders
    ),
    latest as (
      select key, ts, seq, op, payload_cents,
             row_number() over (partition by key
                                order by ts desc, seq desc) as rn,
             cast(count(*) over (partition by key) as bigint) as n_ops,
             cast(sum(case when op = 'delete' then 1 else 0 end)
                  over (partition by key) as bigint) as n_deletes
      from log
    )
    select key, payload_cents, ts as last_ts, n_ops, n_deletes
    from latest
    where rn = 1 and op != 'delete'
    order by key
    """,
)
def orders_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: orders become a per-customer ordered
    insert/update/delete log (op derived from the order key, payload
    the order's cents); final state is LAST-WRITER-WINS per key with
    DELETE tombstones — a key whose newest op is a delete is absent
    from the result, while older deletes are overridden by later
    upserts (resurrection, the semantics Debezium→MERGE pipelines must
    preserve and a naive "filter deletes then dedup" gets wrong).
    Output: surviving keys with final payload, last change ts, and
    per-key op/delete audit counts.

    Scale shape: one (key)-partitioned window shared by the ranking
    and both audit counts — a single id-width exchange; the changelog
    never joins the snapshot because last-writer-wins over the full
    log IS the snapshot (the incremental form is the repo's keyed
    merge sink; this entry gates the REPLAY semantics that make that
    sink idempotent)."""
    log = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, "delete")
        .otherwise("upsert")
        .alias("op"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("payload_cents"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("ts"), F.desc("seq"))
    wk = Window.partitionBy("key")
    latest = log.select(
        "key",
        "ts",
        "op",
        "payload_cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wk).cast("long").alias("n_ops"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
        .over(wk)
        .cast("long")
        .alias("n_deletes"),
    )
    return (
        latest.filter((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select(
            "key",
            "payload_cents",
            F.col("ts").alias("last_ts"),
            "n_ops",
            "n_deletes",
        )
        .orderBy("key")
    )


# ===========================================================================
# Temperature-scaled language mixture — the smooth counterpart to UniMax
# ===========================================================================
#
# The other standard multilingual mixing rule: sample language l with
# probability ∝ n_l^α (mBERT/XLM-R exponential smoothing; mT5 uses the
# same family) — a smooth power-law reweighting, versus UniMax's
# epoch-capped waterfill (doc_unimax_allocation). α is pinned at 1/2
# because n^0.5 = sqrt(n) is the one fractional power with bit-exact
# cross-engine evaluation (IEEE-754 requires correctly-rounded sqrt;
# pow(x, 0.3) may differ in the last ulp between libm builds — the
# same determinism reasoning as the BM25 log-free idf). The share
# denominator is a SEQUENTIAL fold of the per-language sqrt terms in
# language order (Spark F.aggregate over the sorted collect_list;
# DuckDB list_reduce over list(... order by lang)) — an unordered
# SUM() of doubles would be association-order-dependent and could not
# hash-gate.


@query(
    "doc_temperature_mixture",
    """
    with c as (select lang, count(*)::bigint as n_docs from documents group by lang),
    w as (select lang, n_docs, sqrt(n_docs) as s from c),
    tot as (select sum(n_docs)::bigint as n_total from c),
    d as (select list_reduce(list(s order by lang), (a, b) -> a + b) as den from w)
    select lang, n_docs,
           s / den as p,
           cast(floor(s / den * 1000000) as bigint) as share_ppm,
           cast(floor(n_docs * 1000000.0 / n_total) as bigint) as prop_ppm
    from w cross join d cross join tot
    order by lang
    """,
)
def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling shares per language: p_l =
    sqrt(n_l) / Σ_m sqrt(n_m) (α = 1/2 — section comment on why that
    exponent is the deterministic one), with the plain proportional
    share alongside so the smoothing is auditable in one frame: the
    power law compresses the head and lifts the tail, so for every
    language pair the share ratio sits strictly between proportional
    and uniform (the property test pins this against a pure-Python
    twin computing the identical fold).

    Scale shape: one 5-row language count (map-side combined), a 5-row
    sqrt projection, the ordered 5-element fold, and a broadcast of
    the 1-row denominator — nothing past the count sees the corpus."""
    c = _t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = c.withColumn("s", F.sqrt(F.col("n_docs").cast("double")))
    den = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("den"),
        F.sum("n_docs").cast("long").alias("n_total"),
    )
    return (
        w.crossJoin(F.broadcast(den))
        .select(
            "lang",
            "n_docs",
            (F.col("s") / F.col("den")).alias("p"),
            F.floor(F.col("s") / F.col("den") * 1000000)
            .cast("long")
            .alias("share_ppm"),
            F.floor(
                F.col("n_docs").cast("double")
                * 1000000.0
                / F.col("n_total").cast("double")
            )
            .cast("long")
            .alias("prop_ppm"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Prefix-filtered set-similarity self-join (SSJoin / PPJoin family)
# ===========================================================================
#
# The exact Jaccard-threshold join is the workhorse of near-dup mining,
# and the PREFIX FILTER (Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008
# PPJoin) is what makes it feasible without MinHash's approximation:
# order every set's elements by one GLOBAL order (rarest-first: df asc,
# value asc) and index only each set's first p = s − ⌈t·s⌉ + 1
# elements. Two sets with Jaccard ≥ t must share ≥ ⌈t·s⌉ elements of
# the smaller, so by pigeonhole they must collide on at least one
# PREFIX element — candidates come from tiny rarest-element buckets,
# COMPLETE by theorem (the oracle is the all-pairs brute force, so the
# gate verifies completeness corpus-wide every run, and the audit
# entry prices the candidate-work reduction vs the naive inverted
# index). Sets here are the distinct 5-token shingles per document
# (raw token VOCABULARIES are degenerate on templated text: measured
# 54k of 125k all-pairs at Jaccard ≥ 0.7 on token sets at sf0.001,
# vs 28 pairs on shingle sets — sequences, not vocabularies, carry
# near-duplication).

_SSIM_T_NUM, _SSIM_T_DEN = 7, 10  # Jaccard threshold t = 0.7, rational
_SSIM_W = 5  # shingle width, = doc_ngram_jaccard's family convention

_SSIM_SETS_SQL = f"""
    base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    sets as (
      select doc_id, list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - {_SSIM_W - 1}, 0)),
        i -> md5(array_to_string(list_slice(toks, i, i + {_SSIM_W - 1}), ' ')))) as ts
      from base
    ),
    ne as (select doc_id, ts, len(ts) as s from sets where len(ts) > 0)
"""


def _ssim_streams(spark: SparkSession, sf_dir: str):
    """(gh stream (doc_id, gh) distinct per doc, sizes (doc_id, s)).

    Sizes are DERIVED from the exploded stream (one doc-keyed groupBy
    count) instead of re-evaluating the md5 shingle transform in a
    second corpus-cardinality frame — and callers join them with plain
    hash joins, never broadcast hints: a per-document table is
    corpus-sized, so broadcasting it contradicts the documented scale
    shape and risks broadcast-size failures at 100 TB (round-10
    ADVICE)."""
    return _ssim_streams_of(_sa_base(spark, sf_dir))


def _ssim_streams_of(base: DataFrame):
    """_ssim_streams over an arbitrary (doc_id, toks) frame — the
    shingle transform parameterized by corpus so derived corpora
    (catalog_r13's SPLIT-re-publication corpus) reuse the identical
    kernel. (A prefix-TRUNCATION corpus was measured and rejected in
    r13 — nested prefix sets can't prune; see catalog_r13's section
    comment.)"""
    sh = F.when(
        F.size("toks") >= _SSIM_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (_SSIM_W - 1)),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("toks"), i, _SSIM_W))
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    stream = base.select("doc_id", F.explode(sh).alias("gh"))
    sizes = stream.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    return stream, sizes


def _ssim_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct candidate pairs from the prefix index: per doc keep the
    p = s − ⌈t·s⌉ + 1 rarest shingles (global (df, gh) order — ties on
    df broken by the hash value so both engines pick identical
    prefixes), bucket by shingle, expand in-bucket pairs."""
    stream, sizes = _ssim_streams(spark, sf_dir)
    return _ssim_candidates_of(stream, sizes)


def _ssim_candidates_of(stream: DataFrame, sizes: DataFrame) -> DataFrame:
    """_ssim_candidates over an arbitrary (stream, sizes) pair — the
    prefix-index candidate generation parameterized by corpus so the
    split-re-publication probe (catalog_r15.doc_setsim_split_audit)
    reuses the identical kernel."""
    from idh_etl_demo_spark.operators.dedup import blocked_pairs

    df_tab = stream.groupBy("gh").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    ranked = (
        stream.join(df_tab, "gh")
        .join(sizes, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gh"))
            ),
        )
        .withColumn(
            "p",
            F.col("s")
            - F.expr(f"({_SSIM_T_NUM} * s + {_SSIM_T_DEN - 1}) div {_SSIM_T_DEN}")
            + 1,
        )
        .filter(F.col("rn") <= F.col("p"))
    )
    return (
        blocked_pairs(ranked.select("doc_id", "gh"), "doc_id", "gh")
        .select(
            F.col("value_a").alias("id_a"), F.col("value_b").alias("id_b")
        )
        .distinct()
    )


@query(
    "doc_setsim_prefix_join",
    f"""
    with {_SSIM_SETS_SQL},
    pairs as (
      select a.doc_id as id_a, b.doc_id as id_b,
             cast(len(list_intersect(a.ts, b.ts)) as bigint) as inter,
             cast(a.s + b.s - len(list_intersect(a.ts, b.ts)) as bigint) as union_sz
      from ne a join ne b on a.doc_id < b.doc_id
    )
    select id_a, id_b, inter, union_sz,
           inter * 1.0 / union_sz as jaccard
    from pairs
    where {_SSIM_T_DEN} * inter >= {_SSIM_T_NUM} * union_sz
    order by id_a, id_b
    """,
)
def doc_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.7 self-join over 5-shingle sets via PREFIX
    FILTERING (section comment): candidates from rarest-shingle prefix
    buckets, verified by exact intersection counting on candidate
    pairs only; the threshold test is the INTEGER cross-multiplication
    10·inter ≥ 7·union (no float boundary), jaccard emitted as one
    exact division. The oracle is the ALL-PAIRS brute force, so every
    run re-proves the prefix filter's completeness theorem on the real
    corpus — the same independent-algorithm gating as the banding
    entries.

    Scale shape: the df table and prefix selection are one groupBy +
    one per-doc window over id+16-byte-hash rows; candidate expansion
    is Σ B²/2 over PREFIX-bucket sizes (rarest-first makes buckets
    small by construction — the audit entry measures the reduction vs
    the naive inverted index); verification joins only candidate pairs
    against the shingle stream (two hash joins + one count agg). The
    per-doc size table is derived from the exploded stream and joined
    with PLAIN hash joins — it is corpus-cardinality, so broadcasting
    it would cap the operator at driver memory (round-10 ADVICE). Full
    sets never shuffle; text never leaves the scan."""
    stream, sizes = _ssim_streams(spark, sf_dir)
    return _ssim_join_frame(stream, sizes)


def _ssim_join_frame(stream: DataFrame, sizes: DataFrame) -> DataFrame:
    """doc_setsim_prefix_join's exact plan over an arbitrary
    (stream, sizes) pair — candidates from the prefix index, verified
    by exact intersection counting; the corpus-parameterized kernel the
    split-re-publication entries/probe compose."""
    cand = _ssim_candidates_of(stream, sizes)
    ta = stream.select(F.col("doc_id").alias("id_a"), "gh")
    tb = stream.select(F.col("doc_id").alias("id_b"), "gh")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "gh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "union_sz", (F.col("sa") + F.col("sb") - F.col("inter")).cast("long")
        )
        .filter(
            _SSIM_T_DEN * F.col("inter") >= _SSIM_T_NUM * F.col("union_sz")
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            "union_sz",
            (F.col("inter").cast("double") / F.col("union_sz").cast("double")).alias(
                "jaccard"
            ),
        )
        .orderBy("id_a", "id_b")
    )


def _ssim_audit_sql(sets_sql: str) -> str:
    """The setsim prefix-filter audit's DuckDB oracle, parameterized by
    the corpus prelude (any CTE chain ending in
    ``ne(doc_id, ts, s)``) — shared verbatim by the base-corpus entry
    and catalog_r15's split-re-publication twin, the
    catalog_r11b._cont_audit_sql convention."""
    return f"""
    with {sets_sql},
    stream as (select doc_id, unnest(ts) as gh from ne),
    dft as (select gh, count(*)::bigint as df from stream group by gh),
    ranked as (
      select s.doc_id, s.gh, d.df, n.s,
             row_number() over (partition by s.doc_id order by d.df asc, s.gh asc) as rn,
             n.s - ({_SSIM_T_NUM} * n.s + {_SSIM_T_DEN - 1}) // {_SSIM_T_DEN} + 1 as p
      from stream s join dft d using (gh) join ne n on n.doc_id = s.doc_id
    ),
    pdf as (select gh, count(*)::bigint as pdf from ranked where rn <= p group by gh),
    pairs as (
      select cast(len(list_intersect(a.ts, b.ts)) as bigint) as inter,
             cast(a.s + b.s - len(list_intersect(a.ts, b.ts)) as bigint) as union_sz
      from ne a join ne b on a.doc_id < b.doc_id
    )
    select (select count(*) from ne) as n_sets,
           cast((select coalesce(sum(df * (df - 1) // 2), 0) from dft) as bigint)
             as full_pair_slots,
           cast((select coalesce(sum(pdf * (pdf - 1) // 2), 0) from pdf) as bigint)
             as prefix_pair_slots,
           cast((select count(*) from pairs
                 where {_SSIM_T_DEN} * inter >= {_SSIM_T_NUM} * union_sz) as bigint)
             as n_qualifying
    """


@query("doc_setsim_prefix_audit", _ssim_audit_sql(_SSIM_SETS_SQL))
def doc_setsim_prefix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix filter's work reduction, MEASURED (1 row):
    full_pair_slots = Σ C(df, 2) over all shingles (the in-bucket pair
    expansions a naive shared-element inverted index performs) vs
    prefix_pair_slots = Σ C(prefix_df, 2) over prefix postings only,
    alongside the set count and the number of qualifying pairs. The
    reduction IS the algorithm's value; emitting it per corpus makes a
    hot-bucket regression (a prefix landing on a common shingle)
    visible as a number instead of a slow run.

    Scale shape: two token-keyed groupBys and four scalar aggregates;
    the oracle re-derives the same slots in SQL and the brute-force
    qualifying count."""
    stream, sizes = _ssim_streams(spark, sf_dir)
    return _ssim_audit_frame(stream, sizes)


def _ssim_audit_frame(stream: DataFrame, sizes: DataFrame) -> DataFrame:
    """doc_setsim_prefix_audit's exact plan and columns over an
    arbitrary (stream, sizes) pair — full vs prefix pair slots, set
    count, qualifying count — so the split-re-publication corpus
    (catalog_r15.doc_setsim_split_audit) measures the SAME reduction
    the base-corpus audit measures."""
    df_tab = stream.groupBy("gh").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    full_slots = df_tab.agg(
        F.coalesce(
            F.sum(F.expr("df * (df - 1) div 2")), F.lit(0)
        ).cast("long").alias("full_pair_slots")
    )
    ranked = (
        stream.join(df_tab, "gh")
        .join(sizes, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gh"))
            ),
        )
        .withColumn(
            "p",
            F.col("s")
            - F.expr(f"({_SSIM_T_NUM} * s + {_SSIM_T_DEN - 1}) div {_SSIM_T_DEN}")
            + 1,
        )
        .filter(F.col("rn") <= F.col("p"))
    )
    prefix_slots = (
        ranked.groupBy("gh")
        .agg(F.count(F.lit(1)).cast("long").alias("pdf"))
        .agg(
            F.coalesce(
                F.sum(F.expr("pdf * (pdf - 1) div 2")), F.lit(0)
            ).cast("long").alias("prefix_pair_slots")
        )
    )
    n_sets = sizes.agg(F.count(F.lit(1)).cast("long").alias("n_sets"))
    n_q = _ssim_join_frame(stream, sizes).agg(
        F.count(F.lit(1)).cast("long").alias("n_qualifying")
    )
    return (
        n_sets.crossJoin(F.broadcast(full_slots))
        .crossJoin(F.broadcast(prefix_slots))
        .crossJoin(F.broadcast(n_q))
        .select("n_sets", "full_pair_slots", "prefix_pair_slots", "n_qualifying")
    )


# ===========================================================================
# Median-absolute-deviation outlier audit — robust data-quality stats
# ===========================================================================
#
# events_hourly_anomalies z-scores against mean/std — both of which an
# outlier itself corrupts (masking). The robust pair is the MEDIAN and
# the MAD (median absolute deviation), with the standard |x − med| >
# 3·MAD cut. Exact nearest-rank medians (index (n+1)//2 of the sorted
# group, the lower median — a VALUE from the data, so it hash-gates
# where interpolated percentiles cannot) over integer cents; the flag
# test is the integer comparison |dev| > 3·mad. Two ranking passes per
# group (values, then deviations), each a per-flag two-phase bucketed
# rank so no flag ever funnels through a single sort task.


def _flag_bucketed_rank(df: DataFrame, val: str) -> DataFrame:
    """Per-flag row_number over ``val`` (1-based, column ``gr``) without
    a per-flag single-partition sort: operators/suffix._bucketed_rank
    generalized to a grouped key. Buckets derive from each flag's
    MEASURED extrema (a |flags|-row broadcast — the quantile-sketch
    convention, r9 ADVICE): the key floor((v − min)·256/range) is
    monotone in ``v`` and equal values never straddle buckets, so
    per-(flag, bucket) local row_numbers plus a per-flag cumulative
    bucket-count offset reproduce the exact per-flag rank. Phase-2
    state is |flags|×256 offset rows; the value stream shuffles once
    (the bucket-local window)."""
    ext = df.groupBy("flag").agg(
        F.min(val).alias("_minv"), F.max(val).alias("_maxv")
    )
    b = (
        df.join(F.broadcast(ext), "flag")
        .withColumn(
            "_bk",
            F.floor(
                (F.col(val) - F.col("_minv"))
                * 256
                / (F.col("_maxv") - F.col("_minv") + 1)
            ).cast("long"),
        )
        .drop("_minv", "_maxv")
    )
    wloc = Window.partitionBy("flag", "_bk").orderBy(F.asc(val))
    ranked = b.withColumn("_lr", F.row_number().over(wloc).cast("long"))
    counts = ranked.groupBy("flag", "_bk").agg(F.max("_lr").alias("_n"))
    woff = Window.partitionBy("flag").orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "flag",
        "_bk",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).cast("long").alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), ["flag", "_bk"])
        .withColumn("gr", (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_bk", "_lr", "_off")
    )


@query(
    "lineitem_mad_outliers",
    """
    with src as (
      select l_returnflag as flag,
             cast(round(l_extendedprice * 100, 0) as bigint) as cents
      from lineitem
    ),
    r1 as (
      select flag, cents,
             row_number() over (partition by flag order by cents) as rn,
             count(*) over (partition by flag) as n
      from src
    ),
    med as (select flag, cents as med, n from r1 where rn = (n + 1) // 2),
    dev as (
      select s.flag, abs(s.cents - m.med) as dev, m.med, m.n
      from src s join med m using (flag)
    ),
    r2 as (
      select flag, dev, med, n,
             row_number() over (partition by flag order by dev) as rn
      from dev
    ),
    mad as (select flag, dev as mad, med, n from r2 where rn = (n + 1) // 2)
    select d.flag,
           cast(a.n as bigint) as n,
           cast(a.med as bigint) as median_cents,
           cast(a.mad as bigint) as mad_cents,
           cast(sum(case when d.dev > 3 * a.mad then 1 else 0 end) as bigint)
             as n_outliers
    from dev d join mad a using (flag)
    group by d.flag, a.n, a.med, a.mad
    order by d.flag
    """,
)
def lineitem_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier audit: exact lower-median of price
    cents per return flag, MAD about it, and the count beyond the
    3·MAD fence — the estimator breakdown point is 50%, so unlike the
    mean/std z-score (events_hourly_anomalies) the fence itself cannot
    be dragged by the outliers it hunts. Output: (flag, n,
    median_cents, mad_cents, n_outliers).

    Engine parity: nearest-rank medians are integer VALUES from the
    data (no interpolation), the fence test is an integer comparison —
    the whole frame is int64. Ties need no tie-break: equal values are
    adjacent under any rank order, so the value AT a rank is unique.

    Scale shape: both ranking passes use the per-flag TWO-PHASE
    bucketed rank (r10 verdict ask #1 — `l_returnflag` has 3 distinct
    values, so a plain partitionBy(flag) window funnels a third of a
    100 TB fact table through ONE task's sort): value-range buckets
    within flag from the measured extrema (3-row broadcast),
    per-(flag, bucket) local windows, and a 3×256-row offset cumsum
    added back — the same invariant as operators/suffix._bucketed_rank
    with a grouped key. The 3-row median/MAD tables broadcast back
    onto the value stream."""
    src = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    n_tab = src.groupBy("flag").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # lower median: rank (n + 1) // 2, integer div in both engines
    med = (
        _flag_bucketed_rank(src, "cents")
        .join(F.broadcast(n_tab), "flag")
        .filter(F.col("gr") == F.expr("(n + 1) div 2"))
        .select("flag", F.col("cents").alias("med"), "n")
    )
    dev = src.join(F.broadcast(med), "flag").select(
        "flag", F.abs(F.col("cents") - F.col("med")).alias("dev"), "med", "n"
    )
    mad = (
        _flag_bucketed_rank(dev.select("flag", "dev"), "dev")
        .join(F.broadcast(n_tab), "flag")
        .filter(F.col("gr") == F.expr("(n + 1) div 2"))
        .select("flag", F.col("dev").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "flag")
        .groupBy("flag", "n", "med", "mad")
        .agg(
            F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "flag",
            F.col("n").cast("long").alias("n"),
            F.col("med").cast("long").alias("median_cents"),
            F.col("mad").cast("long").alias("mad_cents"),
            "n_outliers",
        )
        .orderBy("flag")
    )
