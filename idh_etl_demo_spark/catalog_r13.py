"""Catalog round 13 — the round-12 verdict's named asks as entries.

- ``ztm_time_dim``: the reference's TimeDim driver-gated as its own
  entry (r12 verdict ask #6) — the hour clock derived from the events
  table, run through the PRODUCTION builder
  (plans/inputs.build_time_dim), including the day-grain id quirk
  (SURVEY §1.3; reference dags/idh_etl.py:74-89, src/queries.py:119-133).
- ``doc_title_edit_entropy``: the edit join's PRUNING path on a
  HIGH-ENTROPY corpus (the dropped r11 ask #8) — md5-derived 32-char
  base64-alphabet titles with planted 4-edit mutants, so
  the Ed-Join prefix filter actually prunes (the degenerate templated
  corpus passes ~all pairs) and the banded-levenshtein verification
  stage gets a non-degenerate scale measurement (bench_scale probe).
- ``doc_containment_split_audit``: the containment audit over a
  HEAVY-TAILED derived corpus (r12 verdict ask #4) — every document
  plus its two pieces around an md5-derived 10-90% cut (split
  re-publication), so the LENGTH and POSITIONAL prunes fire on a
  benched corpus and slot_reduction reads < 1 (a naive prefix
  truncation measures 1.0 — see the section comment).
- ``customer_ldiversity_audit``: l-diversity companion to
  customer_kanonymity_audit — k-anonymity bounds re-identification,
  l-diversity bounds ATTRIBUTE disclosure (a k-anonymous class whose
  sensitive value is constant still leaks it; Machanavajjhala et al.
  2007).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import ENTRIES, _t, query
from idh_etl_demo_spark.catalog_llm import _MD5_LONG

# ===========================================================================
# TimeDim, driver-gated through the production builder
# ===========================================================================
#
# The other ztm entries exercise plans/star.py builders; TimeDim's
# builder (plans/inputs.build_time_dim) was gated only by
# tests/test_star_oracle.py and the sweep's time_dim_from_events (which
# inlines its own expressions). This entry runs the PRODUCTION builder
# over the events clock, sharing the sweep entry's oracle verbatim —
# same TimeDim relation, different Spark code path under the gate.


@query("ztm_time_dim", ENTRIES["time_dim_from_events"].oracle)
def ztm_time_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference TimeDim (day-grain id quirk included — SURVEY
    §1.3) built by the production builder plans/inputs.build_time_dim
    over the events-table hour clock (reference: dags/idh_etl.py:74-89
    synthesizes one row per hourly DAG run; src/queries.py:119-133 is
    the projection). Shares time_dim_from_events' oracle: the relation
    is identical, the gated CODE PATH is the production builder the
    star pipeline ships, not the catalog's inline expressions.

    Scale shape: one distinct over hour-truncated timestamps (calendar-
    bounded output — |hours in the data's span|, not row count) and the
    presentation sort; every TimeDim column is a pure expression."""
    from idh_etl_demo_spark.catalog_ztm import _event_hours
    from idh_etl_demo_spark.plans.inputs import build_time_dim

    return build_time_dim(_event_hours(spark, sf_dir)).orderBy(
        "full_timestamp"
    )


# ===========================================================================
# Edit join — the PRUNING path, on a high-entropy corpus (r11 ask #8)
# ===========================================================================
#
# doc_title_edit_neardup's corpus is templated text: ~377 distinct
# 3-grams at sf0.1, so the Ed-Join prefix filter degrades toward
# all-pairs and what its budget/probe story measures is the
# REFUSE-don't-OOM boundary. The filter's pruning regime — the one it
# exists for — needs gram entropy. This entry derives it
# deterministically: each doc's title is 32 characters over the
# 64-character base64 alphabet — substr(base64(md5 bytes), 1, 16) of
# two salted md5s, engine-exact both sides — and every doc_id ≡ 4
# (mod 5) doc carries a planted mutant of its predecessor's title with
# positions 9-12 overwritten by '~~~~' ('~' is outside the base64
# alphabet, so the edit distance is exactly 4). Random 32-char titles
# over a 64-char alphabet sit at distance ~25+, so the true relation
# is (almost surely) exactly the planted pairs — while the gram space
# (64³ ≈ 262k values vs the templated corpus's few hundred) keeps
# rarest-prefix buckets near-singleton and the candidate set
# near-linear. The synthesis is deliberately LAMBDA-FREE (plain
# md5/unhex/base64/substring expressions): a first draft built each
# character with a higher-order transform(), which Spark evaluates
# INTERPRETED and the optimizer inlines into the downstream gram
# explode — measured 8.4 s for the 150k-row gram aggregate at sf0.1
# (~64 interpreted md5 evaluations per gram row) vs sub-second with
# the flat expression. The kernel is SHARED code
# (catalog_r11c._edit_relation): same prefix theorem, same lazy slot
# budget, same banded-levenshtein verification — this entry gates and
# probes its PRUNING path, the neardup entry its degenerate boundary.

_ENT_MUT_MOD = 5  # every 5th doc is a 4-edit mutant of its predecessor


def _ent_title_duck(e: str) -> str:
    """32-char high-entropy title for integer id expression ``e``."""
    return (
        f"substr(to_base64(unhex(md5(({e})::varchar))), 1, 16)"
        f" || substr(to_base64(unhex(md5(({e})::varchar || 'x'))), 1, 16)"
    )


def _ent_title_spark(e: str) -> str:
    return (
        f"concat(substring(base64(unhex(md5(cast({e} as string)))), 1, 16),"
        f" substring(base64(unhex(md5(concat(cast({e} as string), 'x')))),"
        " 1, 16))"
    )


def _ent_oracle_sql() -> str:
    from idh_etl_demo_spark.catalog_r11c import _ED_K, _ED_Q

    return f"""
    with tt as (
      select doc_id, {_ent_title_duck("doc_id")} as bt,
             {_ent_title_duck("doc_id - 1")} as pt
      from documents
    ),
    t as (
      select doc_id,
             case when doc_id % {_ENT_MUT_MOD} = {_ENT_MUT_MOD - 1}
                  then substr(pt, 1, 8) || '~~~~' || substr(pt, 13, 20)
                  else bt end as title
      from tt
    ),
    g as (
      select doc_id, title,
             list_distinct(list_transform(
               generate_series(1, len(title) - {_ED_Q - 1}),
               i -> substr(title, i, {_ED_Q}))) as gs
      from t
    )
    select a.doc_id as id_a, b.doc_id as id_b,
           len(a.title)::bigint as len_a, len(b.title)::bigint as len_b,
           len(list_intersect(a.gs, b.gs))::bigint as shared_grams,
           levenshtein(a.title, b.title)::bigint as ed
    from g a join g b on a.doc_id < b.doc_id
    where levenshtein(a.title, b.title) <= {_ED_K}
    order by id_a, id_b
    """


@query("doc_title_edit_entropy", _ent_oracle_sql())
def doc_title_edit_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Levenshtein ≤ 8 self-join on the derived HIGH-ENTROPY
    title corpus (section comment): the identical Ed-Join kernel as
    doc_title_edit_neardup (catalog_r11c._edit_relation — rarest-prefix
    candidates, lazy linear slot budget, banded-levenshtein
    verification), gated here in its PRUNING regime. The oracle is the
    all-pairs brute force, so the run re-proves the prefix theorem's
    completeness on a corpus where the filter actually prunes; the
    expected relation is the planted 4-edit mutant pairs
    (doc_id ≡ 4 mod 5 → (doc_id − 1, doc_id)).

    Scale shape: titles are fixed 32-char strings synthesized from
    doc_id arithmetic (map-only; document text never read); the gram
    space is ~262k values, so rarest-prefix buckets stay near-singleton
    and candidate slots grow near-linearly at catalog scales
    (collision-pair mass ≈ slots²/(2·|space|) — the quadratic term is
    visible only as the bench_scale probe's measured overhead). Same
    shared-kernel shuffle set as the neardup entry; verification cost
    is |candidates| banded DPs with zero per-pair fan-out."""
    from idh_etl_demo_spark.catalog_r11c import _edit_grams, _edit_relation

    title = (
        f"case when doc_id % {_ENT_MUT_MOD} = {_ENT_MUT_MOD - 1}"
        f" then concat(substring({_ent_title_spark('doc_id - 1')}, 1, 8),"
        f" '~~~~', substring({_ent_title_spark('doc_id - 1')}, 13, 20))"
        f" else {_ent_title_spark('doc_id')} end"
    )
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{title} as title"
    )
    return _edit_relation(
        spark, _edit_grams(d), "doc_title_edit_entropy"
    )


# ===========================================================================
# Containment audit on a heavy-tailed split corpus (r12 ask #4)
# ===========================================================================
#
# On the base corpus the containment prunes have nothing to cut:
# document sizes are uniform at each SF, so slot_reduction reads 1.0
# and the prunes' value lived only in a planted unit test. A naive
# prefix-truncation corpus does NOT fix this (measured: reduction
# still 1.0) — with nested prefix sets, a parent's RAREST shingles are
# exactly the ones its truncation lacks (df = 1 tail shingles sort
# first), so no prunable slot ever forms. The geometry the prunes
# exist for is a document sharing RARE shingles with a SMALLER
# document — split re-publication: every document plus its TWO pieces
# around an md5-derived 10-90% cut (ids offset by 1e9 / 2e9). A
# parent's rarest prefix is then mostly df = 2 shingles shared with
# one of its own pieces, whose sizes run 10-90% of the parent's —
# the LENGTH prune (5·s_b ≥ 4·s_a) cuts every parent-probe slot whose
# piece posting is under 80% of the parent, so slot_reduction reads
# meaningfully < 1 on a benched, probed corpus. Qualifying pairs
# contain every (piece → parent) row by the sub-sequence shingle
# subset property — real answer mass for the completeness re-proof.

_SPLIT_OFFSET = 10**9


def _split_prelude() -> str:
    from idh_etl_demo_spark.catalog_r9b import _SA_TOKS_SQL
    from idh_etl_demo_spark.catalog_r10 import _SSIM_W

    md5l = _MD5_LONG.format(x="cast(doc_id as varchar)")
    return f"""
    base0 as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    cutp as (
      select doc_id, toks,
             (len(toks) * (10 + {md5l} % 81)) // 100 as cut
      from base0
    ),
    pieces as (
      select doc_id + {_SPLIT_OFFSET} as doc_id,
             list_slice(toks, 1, cut) as toks
      from cutp
      union all
      select doc_id + {2 * _SPLIT_OFFSET} as doc_id,
             list_slice(toks, cut + 1, len(toks)) as toks
      from cutp
    ),
    allb as (
      select doc_id, toks from base0
      union all select doc_id, toks from pieces
    ),
    sets as (
      select doc_id, list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - {_SSIM_W - 1}, 0)),
        i -> md5(array_to_string(
               list_slice(toks, i, i + {_SSIM_W - 1}), ' ')))) as ts
      from allb
    ),
    ne as (select doc_id, ts, len(ts) as s from sets where len(ts) > 0)
    """


def _split_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from idh_etl_demo_spark.catalog_r9b import _sa_base

    base = _sa_base(spark, sf_dir)
    pct = (
        "10 + cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
        " 16, 10) as bigint) % 81"
    )
    cutp = base.select(
        "doc_id", "toks", F.expr(f"(size(toks) * ({pct})) div 100").alias("cut")
    )
    left = cutp.select(
        (F.col("doc_id") + _SPLIT_OFFSET).alias("doc_id"),
        F.expr("slice(toks, 1, cast(cut as int))").alias("toks"),
    )
    right = cutp.select(
        (F.col("doc_id") + 2 * _SPLIT_OFFSET).alias("doc_id"),
        F.expr(
            "slice(toks, cast(cut + 1 as int),"
            " cast(size(toks) - cut as int))"
        ).alias("toks"),
    )
    return base.unionByName(left).unionByName(right)


def _split_audit_sql() -> str:
    from idh_etl_demo_spark.catalog_r11b import _cont_audit_sql

    return _cont_audit_sql(_split_prelude())


@query("doc_containment_split_audit", _split_audit_sql())
def doc_containment_split_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """doc_containment_audit's exact plan and columns over the derived
    split-re-publication corpus (section comment): 1 row with n_sets,
    unpruned_slots (closed form — never expanded), pruned_slots,
    n_candidates, n_qualifying, slot_reduction. On this corpus the
    prunes do REAL work — slot_reduction measured 0.66 at sf0.001 and
    0.67 at sf0.01 — because a parent's
    rarest prefix shingles live in its own pieces, whose sizes run
    10-90% of the parent's; the qualifying relation contains every
    (piece → parent) pair by the shingle-subset property, giving the
    brute-force oracle non-trivial answer mass to re-prove
    completeness against.

    Scale shape: identical to doc_containment_audit (shared kernel
    catalog_r11b._cont_audit_frame) plus the corpus derivation — two
    extra scan branches (the union's piece sides) whose slice/md5
    arithmetic is map-only. The bench_scale probe at 10× measures the
    PRUNED join on a corpus where pruning fires, completing the r12
    verdict's ask #4."""
    from idh_etl_demo_spark.catalog_r10 import _ssim_streams_of
    from idh_etl_demo_spark.catalog_r11b import _cont_audit_frame

    stream, sizes = _ssim_streams_of(_split_base(spark, sf_dir))
    return _cont_audit_frame(stream, sizes)


# ===========================================================================
# l-diversity audit — attribute disclosure, the k-anonymity companion
# ===========================================================================
#
# k-anonymity (customer_kanonymity_audit) bounds re-identification by
# class size; a class of 1000 rows that all share one market segment
# still discloses the segment to anyone who can place a person in the
# class. l-diversity requires ≥ l DISTINCT sensitive values per
# quasi-identifier class (Machanavajjhala et al. 2007, the
# distinct-l form). Quasi-identifiers here are (nation, balance band)
# — the segment moves from quasi-identifier to SENSITIVE attribute,
# which is why the class grid differs from the k-anonymity entry's.

_LDIV_L = 3


@query(
    "customer_ldiversity_audit",
    f"""
    with cls as (
      select cast(c_nationkey as bigint) as c_nationkey,
             cast(floor(c_acctbal / 1000) as bigint) as balance_band,
             count(*)::bigint as class_size,
             count(distinct c_mktsegment)::bigint as n_sensitive
      from customer
      group by 1, 2
    ),
    tot as (
      select cast(sum(class_size) as bigint) as n_rows,
             cast(sum(case when n_sensitive < {_LDIV_L}
                           then class_size else 0 end) as bigint)
               as n_risky_rows
      from cls
    )
    select c_nationkey, balance_band, class_size, n_sensitive,
           (n_sensitive < {_LDIV_L}) as at_risk,
           cast(n_risky_rows as double) / cast(n_rows as double)
             as risky_row_share
    from cls cross join tot
    order by c_nationkey, balance_band
    """,
)
def customer_ldiversity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct-l-diversity audit (section comment): one row per
    (nation, balance band) equivalence class with its size, the count
    of distinct sensitive values (market segment), the l = 3 risk
    flag, and the corpus share of rows in classes failing it. Output:
    (c_nationkey, balance_band, class_size, n_sensitive, at_risk,
    risky_row_share).

    Scale shape: ONE map-side-combined groupBy over the two
    quasi-identifier columns carrying a distinct-count (classes
    bounded by the attribute-domain product); the totals re-aggregate
    the class table into one broadcast row — customer_kanonymity_audit's
    exact shape with count_distinct in place of the plain count."""
    cls = (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.floor(F.col("c_acctbal") / 1000)
            .cast("long")
            .alias("balance_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "balance_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.count_distinct(F.col("c_mktsegment"))
            .cast("long")
            .alias("n_sensitive"),
        )
    )
    tot = cls.agg(
        F.sum("class_size").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("n_sensitive") < _LDIV_L, F.col("class_size"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_risky_rows"),
    )
    return (
        cls.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "balance_band",
            "class_size",
            "n_sensitive",
            (F.col("n_sensitive") < _LDIV_L).alias("at_risk"),
            (
                F.col("n_risky_rows").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("risky_row_share"),
        )
        .orderBy("c_nationkey", "balance_band")
    )
