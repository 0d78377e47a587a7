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
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_r9b import _SA_TOKS_SQL, _sa_base, _sa_parts

_XS_T = 50  # Lee et al. 2021's ExactSubstr length threshold

# Shared oracle prelude: suffix array by direct list sort, adjacent
# LCPs by first elementwise mismatch, per-position max — the
# independent re-derivation the round-9 verdict's ask #5 requires.
_XS_ORACLE_M = f"""
    base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
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
