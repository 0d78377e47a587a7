"""Catalog part 5 — round-4 additions: the incremental shape of the
curation flagship (base corpus + delta batch with status stability),
cross-snapshot dedup against a published keeper table, and the
engine-native HLL sketch beside the engine-portable KMV one.

Same oracle-parity rules as the other catalog modules: md5-derived
hashes, explicit tie-breaks, identical normalize→hash pipelines on both
engines, decimal-exact or integral arithmetic wherever a value crosses
the typed driver hash.

The two incremental entries derive their delta batch from the benchmark
corpus itself (the catalog_ztm derived-input technique): the synthetic
documents table contains ZERO exact-duplicate texts, so an organic
split would never exercise the dup_of_snapshot / dup_in_batch /
registry-exact-dup verdicts — the replica legs make every status branch
fire at the driver's sf0.01 gate instead of green-by-vacuity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _NORM
from idh_etl_demo_spark.catalog_r3 import (
    _CURATION_CACHE,
    _CURATION_KEEP_THRESHOLD,
    _CURATION_RESULTS,
    _gopher_frame,
)

# ===========================================================================
# Cross-snapshot dedup: classify a batch against a published keeper table
# ===========================================================================

# batch = the organic delta slice + two replica legs derived from the
# corpus: +1e6 ids re-submit a BASE doc's text (dup_of_snapshot), +2e6
# ids re-submit an organic-DELTA doc's text (dup_in_batch)
_SNAP_BATCH_SQL = f"""
      select doc_id, text from documents where doc_id % 5 = 4
      union all
      select doc_id + 1000000 as doc_id, text from documents where doc_id % 25 = 0
      union all
      select doc_id + 2000000 as doc_id, text from documents where doc_id % 25 = 9
"""


def _snap_batch_frame(docs: DataFrame) -> DataFrame:
    return (
        docs.filter(F.col("doc_id") % 5 == 4)
        .select("doc_id", "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 9).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
    )


@query(
    "doc_snapshot_dedup",
    f"""
    with base as (
      select doc_id, md5({_NORM}) as content_hash
      from documents where doc_id % 5 != 4
    ),
    snapshot as (
      select content_hash, min(doc_id) as snap_keeper
      from base group by content_hash
    ),
    batch0 as ({_SNAP_BATCH_SQL}),
    batch as (select doc_id, md5({_NORM}) as content_hash from batch0),
    batch_min as (
      select content_hash, min(doc_id) as batch_keeper
      from batch group by content_hash
    )
    select b.doc_id,
           case when s.snap_keeper is not null then 'dup_of_snapshot'
                when b.doc_id != m.batch_keeper then 'dup_in_batch'
                else 'new' end as status,
           case when s.snap_keeper is not null then s.snap_keeper
                when b.doc_id != m.batch_keeper then m.batch_keeper
           end as keeper_id
    from batch b
    left join snapshot s on s.content_hash = b.content_hash
    left join batch_min m on m.content_hash = b.content_hash
    order by b.doc_id
    """,
)
def doc_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch against an EXISTING published snapshot —
    the production shape once a corpus ships: the snapshot is immutable
    (keeper ids never reassigned), only the new batch gets verdicts
    (dup_of_snapshot / dup_in_batch / new, each carrying its keeper).
    The derived batch makes all three verdicts fire at sf0.01 (20
    snapshot dups, 20 in-batch dups, 100 new — see module docstring).

    This entry states the SEMANTICS on parquet inputs; the physical
    100 TB layout — snapshot stored as a table BUCKETED by
    content_hash so the probe shuffles only the batch while the
    snapshot is read pre-clustered, no re-shuffle — is the same
    operator (operators/dedup.py:snapshot_dedup_status) driven through
    a bucketed table and plan-asserted shuffle-free on the snapshot
    side in tests/test_bucketing.py. Only 16-byte digests flow past the
    hash projection, never document bodies."""
    from idh_etl_demo_spark.operators.dedup import (
        normalize_text,
        snapshot_dedup_status,
    )

    docs = _t(spark, sf_dir, "documents")
    ch = F.md5(normalize_text(F.col("text"))).alias("content_hash")
    snapshot = (
        docs.filter(F.col("doc_id") % 5 != 4)
        .select("doc_id", ch)
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("snap_keeper"))
    )
    batch = _snap_batch_frame(docs).select("doc_id", ch)
    return snapshot_dedup_status(batch, snapshot).orderBy("doc_id")


# ===========================================================================
# Incremental curation: base corpus + delta batch, base statuses stable
# ===========================================================================

# corpus = originals + two derived delta legs: +1e6 re-submits a base
# doc's text verbatim (registry exact-dup), +2e6 re-submits a base
# doc's text with one appended token (near-dup of a base keeper: the
# hash differs but most 3-gram shingles — hence most minhash band keys
# — survive)
_INC_CORPUS_SQL = """
      select doc_id, text from documents
      union all
      select doc_id + 1000000 as doc_id, text from documents where doc_id % 25 = 0
      union all
      select doc_id + 2000000 as doc_id, text || ' zq' as text from documents where doc_id % 25 = 5
"""
_INC_BASE = "doc_id < 1000000 and doc_id % 5 != 4"
_INC_DELTA = "(doc_id % 5 = 4 or doc_id >= 1000000)"


def _inc_corpus_frame(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 5).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zq")).alias("text"),
            )
        )
    )


def _incremental_curation_sql() -> str:
    from idh_etl_demo_spark.catalog_llm import _minhash_cte

    return f"""
    with recursive corpus as ({_INC_CORPUS_SQL}),
    {_minhash_cte(source="corpus")},
    q0 as (select doc_id, list_filter(words, w -> w != '') as toks from docs),
    qw as (select doc_id, unnest(toks) as word from q0),
    qf as (select doc_id, word, count(*) as cnt from qw group by doc_id, word),
    qt as (select doc_id, max(cnt) as top_cnt from qf group by doc_id),
    qg as (
      select doc_id, len(toks) as n_tokens,
             list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                            i -> toks[i] || ' ' || toks[i + 1]) as g2
      from q0
    ),
    qual as materialized (
      select g.doc_id,
             (g.n_tokens >= 20
              and (case when g.n_tokens > 0
                        then cast(coalesce(t.top_cnt, 0) as double) / g.n_tokens
                        else 0.0 end) <= 0.2
              and (case when len(g.g2) > 0
                        then 1.0 - cast(len(list_distinct(g.g2)) as double) / len(g.g2)
                        else 0.0 end) <= 0.4) as passes
      from qg g left join qt t on g.doc_id = t.doc_id
    ),
    bi0 as (
      select id_a as a, id_b as b from cand
      union
      select id_b as a, id_a as b from cand
    ),
    hv as (
      select doc_id,
             ('0x' || substring(md5(cast(doc_id as varchar)), 1, 15))::bigint as h
      from corpus
    ),
    -- ---- base chain: exactly doc_corpus_curation restricted to base ----
    bchq as materialized (
      select d.doc_id, md5({_NORM}) as content_hash
      from corpus d join qual q on q.doc_id = d.doc_id and q.passes
      where d.doc_id < 1000000 and d.doc_id % 5 != 4
    ),
    bmin as (
      select content_hash, min(doc_id) as keeper from bchq group by content_hash
    ),
    bsurv as materialized (
      select bchq.doc_id from bchq
      join bmin m on m.content_hash = bchq.content_hash and bchq.doc_id = m.keeper
    ),
    bbi as materialized (
      select bi0.a, bi0.b from bi0
      join bsurv s1 on s1.doc_id = bi0.a
      join bsurv s2 on s2.doc_id = bi0.b
    ),
    bnodes as (select distinct a as id from bbi),
    breach as (
      select id, id as r from bnodes
      union
      select bbi.a as id, breach.r from bbi join breach on breach.id = bbi.b
    ),
    bcomp as (select id, min(r) as component from breach group by id),
    bneard as (select id as doc_id from bcomp where id != component),
    bstatus as materialized (
      select d.doc_id,
             case when not coalesce(q.passes, false) then 'quality_fail'
                  when e.doc_id is null then 'exact_dup'
                  when nd.doc_id is not null then 'near_dup'
                  when h.h >= {_CURATION_KEEP_THRESHOLD} then 'sampled_out'
                  else 'kept' end as status
      from (select doc_id from corpus where {_INC_BASE}) d
      left join qual q on q.doc_id = d.doc_id
      left join bsurv e on e.doc_id = d.doc_id
      left join bneard nd on nd.doc_id = d.doc_id
      left join hv h on h.doc_id = d.doc_id
    ),
    bkeepers as (
      select doc_id from bstatus where status in ('kept', 'sampled_out')
    ),
    -- ---- delta chain: verdicts against the published base state ----
    dchq as materialized (
      select d.doc_id, md5({_NORM}) as content_hash
      from corpus d join qual q on q.doc_id = d.doc_id and q.passes
      where {_INC_DELTA.replace('doc_id', 'd.doc_id')}
    ),
    dmin as (
      select content_hash, min(doc_id) as keeper from dchq
      where content_hash not in (select content_hash from bchq)
      group by content_hash
    ),
    dsurv as materialized (
      select dchq.doc_id from dchq
      join dmin m on m.content_hash = dchq.content_hash and dchq.doc_id = m.keeper
    ),
    dbase_hit as (
      select distinct s.doc_id from dsurv s
      join bi0 e on e.a = s.doc_id
      join bkeepers k on k.doc_id = e.b
    ),
    dbi as materialized (
      select bi0.a, bi0.b from bi0
      join dsurv s1 on s1.doc_id = bi0.a
      join dsurv s2 on s2.doc_id = bi0.b
    ),
    dnodes as (select distinct a as id from dbi),
    dreach as (
      select id, id as r from dnodes
      union
      select dbi.a as id, dreach.r from dbi join dreach on dreach.id = dbi.b
    ),
    dcomp as (select id, min(r) as component from dreach group by id),
    dneard as (
      select doc_id from dbase_hit
      union
      select id as doc_id from dcomp where id != component
    ),
    dstatus as (
      select d.doc_id,
             case when not coalesce(q.passes, false) then 'quality_fail'
                  when e.doc_id is null then 'exact_dup'
                  when nd.doc_id is not null then 'near_dup'
                  when h.h >= {_CURATION_KEEP_THRESHOLD} then 'sampled_out'
                  else 'kept' end as status
      from (select doc_id from corpus where {_INC_DELTA}) d
      left join qual q on q.doc_id = d.doc_id
      left join dsurv e on e.doc_id = d.doc_id
      left join dneard nd on nd.doc_id = d.doc_id
      left join hv h on h.doc_id = d.doc_id
    )
    select doc_id, 'base' as origin, status from bstatus
    union all
    select doc_id, 'delta' as origin, status from dstatus
    order by doc_id
    """


@query("doc_incremental_curation", _incremental_curation_sql())
def doc_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus curation — the real production cadence: a base
    corpus was curated and published; a delta batch arrives and must be
    curated AGAINST that published state without touching it.

    Status stability by construction: the base chain consumes only base
    inputs (quality gate, exact keepers, near-dup CC all restricted to
    base docs), so adding a delta batch cannot flip any published base
    status — the property a re-run-from-scratch pipeline violates (a
    delta doc with a smaller hash would steal keepership;
    tests/test_catalog_oracle.py::test_incremental_base_statuses_stable
    asserts base rows equal the batchless run). Delta verdicts:

    - quality_fail: same per-doc Gopher gate (delta-only decision);
    - exact_dup: content hash already in the base REGISTRY (any base
      quality-passer's hash — published hashes never re-keeper), or an
      earlier delta doc owns the hash;
    - near_dup: LSH candidate edge to a base keeper (kept/sampled_out),
      or non-min member of a delta-internal near-dup component;
    - sampled_out / kept: same deterministic hash threshold.

    The derived delta legs (module docstring) guarantee the registry
    and near-dup-to-base branches actually fire at the sf0.01 gate.

    Scale shape: the candidate generator runs ONCE over old+new (at
    100 TB you'd persist band keys and probe them incrementally — the
    bucketed-join layout of tests/test_bucketing.py; semantic parity is
    what's gated here). Base/delta edge sets are endpoint semi-joins on
    the one checkpointed edge list; both CC fixpoints run on edges only
    — document bodies never flow past the signature stage. All
    materialized frames share doc_corpus_curation's one-generation
    lifetime registry (test_curation_cache_bounded pattern)."""
    key = ("doc_incremental_curation", spark.sparkContext.applicationId, sf_dir)
    cached = _CURATION_RESULTS.get(key)
    if cached is not None:
        return cached
    result = _incremental_status_frame(
        spark, _inc_corpus_frame(_t(spark, sf_dir, "documents"))
    )
    _CURATION_RESULTS[key] = result
    return result


def _incremental_status_frame(spark: SparkSession, corpus: DataFrame) -> DataFrame:
    """The incremental pipeline over an explicit (doc_id, text) corpus —
    factored out so tests can run it BATCHLESS (base docs only) and
    assert base-status stability against the full run."""
    from idh_etl_demo_spark.operators.dedup import (
        minhash_lsh_candidates,
        normalize_text,
    )
    from idh_etl_demo_spark.operators.graph import (
        _release_checkpoint,
        connected_components,
    )

    # release the previous generation (shared registry with
    # doc_corpus_curation — see catalog_r3._CURATION_CACHE)
    for _old, _release in _CURATION_CACHE:
        try:
            _release(_old)
        except Exception:
            pass
    _CURATION_CACHE.clear()
    _CURATION_RESULTS.clear()

    # per-doc quality verdicts AND content hash in ONE corpus scan
    # (round-6: _gopher_frame's extra= hook — see doc_corpus_curation);
    # the persist is the pushdown barrier AND the multi-consumer
    # materialization point
    passes = (
        _gopher_frame(
            spark,
            corpus,
            extra={"content_hash": F.md5(normalize_text(F.col("text")))},
        )
        .select("doc_id", "passes_quality", "content_hash")
        .persist()
    )
    _CURATION_CACHE.append((passes, DataFrame.unpersist))

    # every quality-passer hashed once; base/delta are filters over it
    chq = passes.filter(F.col("passes_quality")).select(
        "doc_id", "content_hash"
    )

    # ONE candidate pass over old+new; endpoint semi-joins carve the
    # base and delta edge sets out of it. Checkpointed because it is
    # consumed three times (the shared CC's two edge legs, delta→base probe) —
    # lineage would otherwise re-run the LSH pipeline per consumer. The
    # CC loop already runs eager jobs at build, so the eager checkpoint
    # costs no additional laziness (this entry, like
    # doc_corpus_curation, is exempt from the lazy-builder contract by
    # its fixpoint nature).
    cand = minhash_lsh_candidates(
        corpus,
        num_hashes=12,
        bands=4,
        num_partitions=spark.sparkContext.defaultParallelism,
        max_bucket=64,
    ).localCheckpoint(eager=True)
    _CURATION_CACHE.append((cand, _release_checkpoint))
    edges = cand.unionByName(
        cand.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )

    # ---- exact-dedup keepers, BOTH chains in one shuffle (round-6) ----
    # The base chain keeps min(base doc_id) per hash; the delta chain
    # keeps min(delta doc_id) per hash but only for hashes absent from
    # the base registry. One groupBy with two conditional mins replaces
    # the previous two groupBys plus a left-anti registry probe: bkeeper
    # IS NULL encodes "hash not in base registry" exactly (the bkeeper
    # min aggregates only chq's base rows), so dsurv = delta rows whose
    # id == dkeeper with no bkeeper. Survivor identity is unchanged; stability holds
    # because bkeeper aggregates base rows only.
    keepers = chq.groupBy("content_hash").agg(
        F.min(F.when(F.expr(_INC_BASE), F.col("doc_id"))).alias("bkeeper"),
        F.min(F.when(F.expr(_INC_DELTA), F.col("doc_id"))).alias("dkeeper"),
    )
    surv = (
        chq.join(keepers, "content_hash")
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("bkeeper")).alias("is_bsurv"),
            (
                F.col("bkeeper").isNull()
                & (F.col("doc_id") == F.col("dkeeper"))
            ).alias("is_dsurv"),
        )
        .filter(F.col("is_bsurv") | F.col("is_dsurv"))
        .persist()
    )
    _CURATION_CACHE.append((surv, DataFrame.unpersist))
    bsurv = surv.filter("is_bsurv").select("doc_id")
    dsurv = surv.filter("is_dsurv").select("doc_id")
    bedges = edges.join(
        bsurv.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
    ).join(bsurv.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
    dedges = edges.join(
        dsurv.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
    ).join(dsurv.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")

    # ONE min-label fixpoint for both chains (round-6): bsurv and dsurv
    # are DISJOINT node sets (_INC_BASE ∧ _INC_DELTA is unsatisfiable),
    # so no edge can connect a base survivor to a delta survivor in
    # bedges ∪ dedges — components of the union graph are exactly the
    # components of the two graphs run separately, min labels included.
    # Halves the fixpoint-loop jobs (each CC round is a join + agg +
    # checkpoint + convergence count); semantics byte-identical, and
    # the batchless-stability test still holds because base components
    # see only base edges either way.
    cc = connected_components(bedges.unionByName(dedges), "id_a", "id_b")
    _CURATION_CACHE.append((cc, _release_checkpoint))
    bneard = (
        cc.filter(F.col("id") != F.col("component"))
        .filter(F.expr(_INC_BASE.replace("doc_id", "id")))
        .select(F.col("id").alias("doc_id"))
        .withColumn("near_dropped", F.lit(True))
    )

    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")

    # the status side rides the persisted verdict table (it carries
    # every doc_id + passes_quality) — no re-scan of the corpus text
    # per chain, no extra join on passes
    def status_frame(
        side_pred: str, exact_surv: DataFrame, neard: DataFrame
    ) -> DataFrame:
        return (
            passes.filter(F.expr(side_pred))
            .select("doc_id", "passes_quality", hv.alias("h"))
            .join(exact_surv.withColumn("in_exact", F.lit(True)), "doc_id", "left")
            .join(neard, "doc_id", "left")
            .select(
                "doc_id",
                F.when(
                    ~F.coalesce(F.col("passes_quality"), F.lit(False)),
                    "quality_fail",
                )
                .when(F.col("in_exact").isNull(), "exact_dup")
                .when(F.col("near_dropped").isNotNull(), "near_dup")
                .when(F.col("h") >= _CURATION_KEEP_THRESHOLD, "sampled_out")
                .otherwise("kept")
                .alias("status"),
            )
        )

    bstatus = status_frame(_INC_BASE, bsurv, bneard).persist()
    _CURATION_CACHE.append((bstatus, DataFrame.unpersist))
    bkeepers = bstatus.filter(
        F.col("status").isin("kept", "sampled_out")
    ).select("doc_id")

    # ---- delta near-dup verdicts (against the published base state) ----
    dbase_hit = (
        dsurv.join(edges, dsurv["doc_id"] == edges["id_a"])
        .join(
            bkeepers.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi"
        )
        .select(dsurv["doc_id"])
        .distinct()
    )
    dneard = (
        dbase_hit.unionByName(
            cc.filter(F.col("id") != F.col("component"))
            .filter(F.expr(_INC_DELTA.replace("doc_id", "id")))
            .select(F.col("id").alias("doc_id"))
        )
        .distinct()
        .withColumn("near_dropped", F.lit(True))
    )
    dstatus = status_frame(_INC_DELTA, dsurv, dneard)

    return (
        bstatus.withColumn("origin", F.lit("base"))
        .unionByName(dstatus.withColumn("origin", F.lit("delta")))
        .select("doc_id", "origin", "status")
        .orderBy("doc_id")
    )


# ===========================================================================
# Engine-native sketch: HyperLogLog approx_count_distinct with a gated
# error bound (the scale-path sibling of the portable KMV entry)
# ===========================================================================


@query(
    "events_distinct_users_hll",
    """
    select event_type,
           count(distinct user_id) as exact_users,
           true as within_bound
    from events
    group by event_type
    order by event_type
    """,
)
def events_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-NATIVE distinct sketch: ``approx_count_distinct`` (Spark's
    HyperLogLog++) per event_type, gated by asserting the estimate lands
    within the documented error bound of the exact count. The estimate
    itself is engine-specific (DuckDB cannot reproduce Spark's HLL
    registers), so the hash-gated columns are the EXACT count plus the
    boolean ``within_bound`` = |est − exact| ≤ 3·rsd·exact (rsd 0.05;
    3σ of the HLL++ standard error) — the oracle pins it ``true``, so a
    misbehaving sketch flips the driver row red. Beside
    ``orderkey_distinct_kmv`` (the engine-PORTABLE md5 bottom-k sketch,
    exactly reproduced cross-engine) this closes both halves of the
    sketch family: portable-and-exact-gated vs native-and-bound-gated.

    Scale shape: partial HLL buffers merge map-side — a fixed-size
    sketch per (task, group) flows to the reducer regardless of row
    count, unlike count(distinct) whose expand shuffle carries every
    distinct (group, user) pair. At 100 TB the exact audit column drops
    out and the sketch stands alone."""
    rsd = 0.05
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct(F.col("user_id")).alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("est"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 3 * rsd * F.col("exact_users")
            ).alias("within_bound"),
        )
        .orderBy("event_type")
    )
