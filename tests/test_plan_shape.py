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



# per-entry shuffle budgets: loose upper bounds that still catch a
# regression where a broadcast silently degrades to a shuffle join or a
# projection starts re-shuffling. Entries not listed get the default.
# Budgets count SHUFFLE exchanges only (hash/range/single-partition);
# BroadcastExchange is deliberately excluded — broadcasts are the cheap
# path we *want*, and counting them would penalize broadcast-heavy plans.
SHUFFLE_BUDGET_DEFAULT = 4


def _shuffle_count(plan: str) -> int:
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )
SHUFFLE_BUDGETS = {
    "doc_minhash_candidates": 3,   # band groupBy + pair expand + dedup
    "doc_ngram_jaccard": 3,        # shingle groupBy + pair agg + ordering
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
    # two unrolled Lloyd iterations. Assignment is now a PURE PROJECTION
    # (centroids packed into one broadcast row, argmin via array_min) —
    # zero corpus-side exchanges per iteration; the counted shuffles are
    # the tiny SinglePartition centroid-pack aggs (printed once per
    # consumer in the static plan), the (cluster,dim) update agg, the
    # centroid array rebuild, the cluster-size window, and the final
    # sort. Every one of them carries |clusters|·dim-bounded rows; the
    # corpus never shuffles.
    "embedding_kmeans_2iter": 7,
    # same two Lloyd rounds; the kcenter seed chain adds ZERO shuffles
    # (TakeOrderedAndProject top-1s + broadcast joins only)
    "embedding_kmeans_seeded": 6,
    # four composed stages, each already individually plan-audited:
    # gopher quality (word-freq agg + bigram agg join), exact-dedup
    # grouping, LSH banding chain, and the status assembly joins on
    # doc_id. The CC fixpoint's per-round shuffles happen inside the
    # operator's checkpointed loop and are not part of this static plan.
    # NOTE the static count double-counts: the two persisted verdict
    # tables (passes, exact_surv) print their full child plan once PER
    # CONSUMER in explain output, but at runtime each is computed once
    # and served from cache — the real shuffle count is ~14.
    "doc_corpus_curation": 30,
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
    "doc_lsh_audit": 12,
    # same audit shape on the embeddings side: brute topk + ANN topk
    # (both already budget-audited as standalone entries) + intersect
    "embedding_ann_audit": 10,
}


def test_shuffle_budgets(spark):
    for name, e in ENTRIES.items():
        plan = _plan(e.spark(spark, SF))
        n = _shuffle_count(plan)
        budget = SHUFFLE_BUDGETS.get(name, SHUFFLE_BUDGET_DEFAULT)
        assert n <= budget, f"{name}: {n} shuffle exchanges (budget {budget})"


def test_builders_are_lazy_no_actions(spark):
    """Catalog builders are a registry of LAZY plans: with the table cache
    warm, constructing an entry must run zero Spark jobs (the old
    dq_orders_audit ran two eager full-scan counts at build time)."""
    for name in ["dq_orders_audit", "pricing_summary", "user_sessions"]:
        ENTRIES[name].spark(spark, SF)  # warm table cache
    sc = spark.sparkContext
    sc.setJobGroup("lazy-builders", "")
    try:
        for name in ["dq_orders_audit", "pricing_summary", "user_sessions"]:
            ENTRIES[name].spark(spark, SF)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("lazy-builders")
    assert len(jobs) == 0, f"builders ran {len(jobs)} jobs at construction time"


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
