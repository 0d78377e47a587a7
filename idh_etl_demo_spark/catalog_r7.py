"""Round-7 catalog entries: the vector-serving path on a TRAINED coarse
quantizer, multi-probe search, and tokenizer-training primitives.

Everything here follows the repo's entry contract: a ``@query(name,
duckdb_sql)`` registration whose SQL reproduces the Spark result
engine-exactly (integer arithmetic where floats would drift), a shuffle
budget in tests/test_plan_shape.py, a bench HEADLINE row, and property
tests against pure-Python references.

This module may import catalog_llm / catalog_r3 / catalog_r6 helpers at
module level — nothing imports catalog_r7 back, so there is no cycle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _spark_int_dot
from idh_etl_demo_spark.catalog_r3 import _km_trained_ctes, _km_trained_frames

# Trained coarse-quantizer size: the seeded-KMeans entry's k. At 100 TB
# the centroid count grows with N (cells stay constant-sized); the plan
# shape below is unchanged — only the broadcast centroid row widens.
_TRAINED_CELLS = 4


# ===========================================================================
# IVF-flat ANN on the TRAINED coarse quantizer
# ===========================================================================


def _trained_ivf_sql() -> str:
    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    q as (select vec_id as query_id, v as qv, cluster from a2 where vec_id % 25 = 0),
    c as (select vec_id as neighbor_id, v as cv, cluster from a2),
    scored as (
      select query_id, neighbor_id,
             list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) as cosine_sim
      from q join c using (cluster)
      where neighbor_id != query_id
    )
    select query_id, neighbor_id, cosine_sim, rank from (
      select *, row_number() over (partition by query_id
                                   order by cosine_sim desc, neighbor_id asc) as rank
      from scored
    ) where rank <= 5
    order by query_id, rank
    """


@query("embedding_ann_ivf", _trained_ivf_sql())
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN serving from a TRAINED coarse quantizer: the cell
    table is the seeded-KMeans pipeline's own output (kcenter
    farthest-first seeding → two fixed-point Lloyd rounds — the exact
    composition ``embedding_kmeans_seeded`` gates), and the search is an
    equi-join on the trained cell id with exact cosine ranking inside
    the cell. Until round 7 the quantizer was a first-8-vectors fixture;
    now the serving pipeline eats its own dog food — the codebook it
    probes is the clustering the catalog audits.

    Engine-exactness: the whole training chain is integer arithmetic
    (quantized vectors, integer squared-L2, floor-requantized centroid
    updates), so both engines derive the IDENTICAL cells before the
    in-cell cosine — the driver hash gates every (query, neighbor,
    rank) row with no float tolerance.

    Scale shape: training shuffles ≤ |k|·dim rows per Lloyd round (the
    corpus never re-partitions — see operators/kmeans.py); assignment
    is a packed-broadcast projection; the probe is a cell-id equi-join
    (queries explode only into their own cell). No all-pairs stage.
    At 100 TB: more cells (k grows with N), same plan."""
    assigned, _ = _km_trained_frames(spark, sf_dir, _TRAINED_CELLS)
    q = assigned.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cluster"
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cluster"
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
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
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# Multi-probe IVF+int8 serving (nprobe > 1) and the audit that prices it
# ===========================================================================


def _ivf_int8_scored_frames(
    spark: SparkSession, sf_dir: str, nprobe: int
) -> DataFrame:
    """Shared candidate-scoring stage of the IVF+int8 serving path:
    (query_id, neighbor_id, cell_rank, sim) for every in-cell candidate
    across each query's ``nprobe`` nearest trained cells — BEFORE the
    per-query top-k. ``cell_rank`` is the probed cell's rank for that
    query, so nprobe=1 results are the ``cell_rank = 1`` subset (the
    audit entry uses exactly that to price probe depth)."""
    from idh_etl_demo_spark.operators.kmeans import lloyd_assign_topn
    from idh_etl_demo_spark.operators.similarity import quantize_int8

    assigned, cents = _km_trained_frames(spark, sf_dir, _TRAINED_CELLS)
    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    codes = quantize_int8(emb, "embedding").select(
        "vec_id", F.col("q_int8").alias("iv")
    )
    cand = (
        assigned.select("vec_id", "cluster")
        .join(codes, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("iv").alias("cv"),
            "cluster",
        )
    )
    qcells = lloyd_assign_topn(
        assigned.filter(F.col("vec_id") % 25 == 0).select("vec_id", "v"),
        cents,
        nprobe,
    )
    q = (
        qcells.select("vec_id", "cluster", "cell_rank")
        .join(codes, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("iv").alias("qv"),
            "cluster",
            "cell_rank",
        )
    )
    return (
        cand.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell_rank",
            (
                _spark_int_dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_spark_int_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_spark_int_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("sim"),
        )
    )


def _multiprobe_scored_ctes(nprobe: int) -> str:
    """Oracle twin of ``_ivf_int8_scored_frames``: CTEs ``qc`` (each
    query's top-``nprobe`` trained cells from the km chain's ranked
    ``r2``), ``cand`` and ``scored`` — appended after the km chain +
    int8 codes CTEs."""
    return f"""
    qc as (select vec_id as query_id, cid as cluster, rn as cell_rank
           from r2 where vec_id % 25 = 0 and rn <= {nprobe}),
    q as (
      select qc.query_id, c.v as qv, qc.cluster, qc.cell_rank
      from qc join codes c on c.vec_id = qc.query_id
    ),
    cand as (
      select a.vec_id as neighbor_id, c.v as cv, a.cluster
      from a2 a join codes c using (vec_id)
    ),
    scored as (
      select query_id, neighbor_id, cell_rank,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))) as sim
      from q join cand using (cluster)
      where neighbor_id != query_id
    )"""


def _multiprobe_sql() -> str:
    from idh_etl_demo_spark.catalog_r6 import _INT8_CODES_CTE

    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    {_INT8_CODES_CTE},
    {_multiprobe_scored_ctes(2)}
    select query_id, neighbor_id,
           round(sim, 6) as int8_cosine, rank
    from (
      select query_id, neighbor_id, sim,
             row_number() over (partition by query_id
                                order by sim desc, neighbor_id asc) as rank
      from scored
    ) where rank <= 5
    order by query_id, rank
    """


@query("embedding_ivf_multiprobe_search", _multiprobe_sql())
def embedding_ivf_multiprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF+int8 serving (nprobe=2): each query scans the
    inverted lists of its TWO nearest trained cells instead of one —
    the standard recall lever when the true neighbor straddles a cell
    boundary (the single-probe entry's known failure mode). Ranking is
    the same engine-exact integer int8 cosine as
    ``embedding_ivf_int8_search``; the only change is the query-side
    cell set, ranked by the same integer L2 the assignment argmin uses
    (ties (dist, cid) — the km chain's ``r2`` CTE verbatim).

    Scale shape: the query side fans out ×nprobe (queries are the SMALL
    side, broadcast); the corpus side is untouched — still one cell per
    vector, still an equi-join on the cell id, no all-pairs stage. Cost
    grows linearly in nprobe on candidate count only;
    ``embedding_ivf_nprobe_audit`` prices exactly that trade."""
    scored = _ivf_int8_scored_frames(spark, sf_dir, 2)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", "sim")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("int8_cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _nprobe_audit_sql() -> str:
    import idh_etl_demo_spark.catalog_llm  # noqa: F401  (registers topk)
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r6 import _INT8_CODES_CTE

    topk = ENTRIES["embedding_cosine_topk"].oracle
    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    {_INT8_CODES_CTE},
    {_multiprobe_scored_ctes(2)},
    truth as materialized (
      select query_id, neighbor_id from ({topk})
    ),
    probes as (
      select 1 as nprobe, query_id, neighbor_id, sim
      from scored where cell_rank = 1
      union all
      select 2 as nprobe, query_id, neighbor_id, sim from scored
    ),
    approx as (
      select nprobe, query_id, neighbor_id
      from (
        select nprobe, query_id, neighbor_id,
               row_number() over (partition by nprobe, query_id
                                  order by sim desc, neighbor_id asc) as rank
        from probes
      ) where rank <= 5
    ),
    hits as (
      select a.nprobe, count(*) as n_hits
      from approx a join truth t
        on t.query_id = a.query_id and t.neighbor_id = a.neighbor_id
      group by a.nprobe
    ),
    cands as (
      select nprobe, count(*) as n_candidates from probes group by nprobe
    )
    select c.nprobe,
           cast((select count(*) from truth) as bigint) as n_truth,
           cast(coalesce(h.n_hits, 0) as bigint) as n_hits,
           coalesce(h.n_hits, 0) * 1.0
             / (select count(*) from truth) as recall_at_5,
           cast(c.n_candidates as bigint) as n_candidates
    from cands c left join hits h on h.nprobe = c.nprobe
    order by c.nprobe
    """


@query("embedding_ivf_nprobe_audit", _nprobe_audit_sql())
def embedding_ivf_nprobe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe COST/RECALL curve, one row per probe depth: recall@5
    of the IVF+int8 serving path against exact fixed-point cosine truth
    (``embedding_cosine_topk`` composed verbatim — the established
    technique) beside the candidate count the probe depth paid for.
    This is the number a production deployment tunes: at sf0.01 probing
    the 2nd trained cell lifts recall while roughly doubling in-list
    work — whether that trade is worth it IS this table.

    Both depths share ONE scored frame (nprobe=1 is the cell_rank=1
    subset of the nprobe=2 scan), so the audit costs one multi-probe
    pass, not two. All counts are integers; the single recall division
    is deterministic IEEE — hash-gated exactly.

    Scale shape: the truth side is quadratic by parameter choice (fixed
    query fraction × brute-force scan) exactly like the sibling audits
    (embedding_ann_audit, embedding_int8_ann_recall) — at prod scale it
    runs on a sampled query set; the approx side is the serving plan
    itself. Excluded from the 10× probe set under the same documented
    policy."""
    from idh_etl_demo_spark.catalog_llm import embedding_cosine_topk

    scored = _ivf_int8_scored_frames(spark, sf_dir, 2)
    probes = (
        scored.filter(F.col("cell_rank") == 1)
        .select(F.lit(1).alias("nprobe"), "query_id", "neighbor_id", "sim")
        .unionByName(
            scored.select(
                F.lit(2).alias("nprobe"), "query_id", "neighbor_id", "sim"
            )
        )
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    approx = (
        probes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("nprobe", "query_id", "neighbor_id")
    )
    truth = embedding_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    cands = probes.groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        cands.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_truth))
        .select(
            "nprobe",
            "n_truth",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_truth")
            ).alias("recall_at_5"),
            "n_candidates",
        )
        .orderBy("nprobe")
    )


# ===========================================================================
# BPE merge-pair training: the distributed tokenizer-training primitive
# ===========================================================================

_BPE_STEPS = 3


def _bpe_merge_step(acc: F.Column, s: F.Column) -> F.Column:
    """One left-fold step of the BPE merge application: append ``s``
    unless the accumulator's last symbol is the chosen pair's left and
    ``s`` its right — then replace the last symbol with the merged
    token. Left-to-right non-overlap falls out of the fold naturally:
    the merged token ``ba||bb`` can never equal ``ba`` (``bb`` is
    non-empty), so a freshly-merged symbol cannot be consumed as the
    left side again within the same pass ("aaaa" + (a,a) → aa, aa)."""
    do_merge = (
        (F.size(acc) > 0)
        & (F.element_at(acc, -1) == F.col("ba"))
        & (s == F.col("bb"))
    )
    return F.when(
        do_merge,
        F.concat(
            F.slice(acc, F.lit(1), F.size(acc) - 1),
            F.array(F.concat(F.col("ba"), F.col("bb"))),
        ),
    ).otherwise(F.concat(acc, F.array(s)))


def _bpe_frames(spark: SparkSession, sf_dir: str) -> tuple[list, DataFrame]:
    """Shared BPE training chain: returns (steps, words) where steps is
    the list of per-iteration best-pair frames [(ba, bb, c)] and words
    is the word table after applying all ``_BPE_STEPS`` merges —
    (word, cnt, syms).

    This is the REAL structure of BPE trainers (Sennrich et al. 2016):
    the corpus collapses ONCE into a word-frequency table (the only
    corpus-sized aggregation), and every merge iteration runs over
    |vocab| rows — pair counting is an adjacency aggregate weighted by
    word counts, the argmax is a deterministic TakeOrdered top-1
    ((count desc, pair asc) ties), and the merge application is a
    per-row fold. At 100 TB the token explode + word groupBy is the
    scan-shaped cost; iterations touch only the type table, which is
    why tokenizer training is feasible at corpus scale at all."""
    from idh_etl_demo_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)),
    )
    words = wc.select("word", "cnt", chars.alias("syms"))
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of returning [] —
    # guard single-symbol words explicitly (DuckDB's generate_series is
    # empty there, so an unguarded mirror would diverge)
    adj = F.when(
        F.size("syms") > 1,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    steps = []
    for _ in range(_BPE_STEPS):
        best = (
            words.select("cnt", F.explode(adj).alias("p"))
            .groupBy(F.col("p.a").alias("ba"), F.col("p.b").alias("bb"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "ba", "bb")
            .limit(1)
        )
        steps.append(best)
        words = words.crossJoin(F.broadcast(best)).select(
            "word",
            "cnt",
            F.aggregate(
                F.col("syms"),
                F.array().cast("array<string>"),
                _bpe_merge_step,
            ).alias("syms"),
        )
    return steps, words


def _bpe_ctes(n: int = _BPE_STEPS) -> list[str]:
    """Oracle twin of ``_bpe_frames``: CTE chain wc, w0, then per step
    p{i} (pair counts), b{i} (argmax pair as ba/bb/c), w{i} (merged
    word table). The merge application is the same left fold via
    ``list_reduce`` (first element seeds the accumulator — identical
    to the Spark empty-init fold, whose first step appends)."""
    from idh_etl_demo_spark.catalog_llm import _WORDS

    ctes = [
        f"""wc as (
          select word, count(*) as cnt
          from (select unnest({_WORDS}) as word from documents)
          where word <> '' group by word
        )""",
        """w0 as (
          select word, cnt,
                 list_transform(generate_series(1, length(word)),
                                i -> substring(word, i, 1)) as syms
          from wc
        )""",
    ]
    for i in range(1, n + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"""p{i} as (
              select s.a, s.b, sum(cnt) as c
              from (select unnest(list_transform(
                             generate_series(1, len(syms) - 1),
                             j -> {{'a': syms[j], 'b': syms[j + 1]}})) as s,
                           cnt
                    from {prev})
              group by s.a, s.b
            )"""
        )
        ctes.append(
            f"b{i} as (select a as ba, b as bb, c from p{i} "
            f"order by c desc, a, b limit 1)"
        )
        ctes.append(
            f"""w{i} as (
              select word, cnt,
                     list_reduce(
                       list_transform(syms, s -> [s]),
                       (acc, x) -> case
                         when len(acc) > 0 and acc[-1] = ba and x[1] = bb
                         then list_append(acc[1:len(acc) - 1], ba || bb)
                         else list_append(acc, x[1]) end) as syms
              from {prev} cross join b{i}
            )"""
        )
    return ctes


def _bpe_steps_sql() -> str:
    selects = " union all ".join(
        f"select cast({i} as bigint) as step, ba as left_sym, bb as right_sym, "
        f"cast(c as bigint) as pair_count from b{i}"
        for i in range(1, _BPE_STEPS + 1)
    )
    return f"with {','.join(_bpe_ctes())}\n{selects}\norder by step"


@query("doc_bpe_merge_steps", _bpe_steps_sql())
def doc_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: {_BPE_STEPS} distributed merge-pair
    iterations over the corpus — each row is one iteration's
    highest-frequency adjacent symbol pair (count-weighted over word
    types, ties broken (count desc, pair asc) so the training run is
    deterministic and engine-exact). This is the missing piece between
    ``doc_vocab_topk`` (vocabulary head) / ``doc_oov_rate`` (vocab
    evaluation) and an actual trained tokenizer: the merge table IS the
    tokenizer artifact a BPE segmenter executes.

    Scale shape: ONE corpus-sized aggregation (token explode → word
    groupBy, map-side combined) collapses the corpus to its type table;
    every iteration then aggregates |types| rows of adjacent pairs and
    broadcasts back a single argmax row — corpus cost is paid once, the
    merge loop is vocabulary-sized, exactly the structure that makes
    tokenizer training feasible on a 100 TB corpus."""
    steps, _ = _bpe_frames(spark, sf_dir)
    out = None
    for i, best in enumerate(steps, start=1):
        row = best.select(
            F.lit(i).cast("long").alias("step"),
            F.col("ba").alias("left_sym"),
            F.col("bb").alias("right_sym"),
            F.col("c").cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step")


# ===========================================================================
# Semantic dedup (SemDeDup-style): within-cluster embedding near-dups
# ===========================================================================

_SEMDEDUP_THRESHOLD = 0.40


def _semantic_dedup_sql() -> str:
    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    pairs as (
      select a.vec_id as u, b.vec_id as v
      from a2 a join a2 b using (cluster)
      where a.vec_id < b.vec_id
        and list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= {_SEMDEDUP_THRESHOLD}
    ),
    dups as (select v as vec_id, min(u) as dup_of from pairs group by v)
    select a2.vec_id, a2.cluster,
           d.dup_of is null as keep, d.dup_of
    from a2 left join dups d using (vec_id)
    order by a2.vec_id
    """


@query("embedding_semantic_dedup", _semantic_dedup_sql())
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication in the SemDeDup shape (Abbas et al. 2023):
    cluster the embedding space with the trained coarse quantizer (the
    seeded kcenter→Lloyd chain the catalog audits), then find near-dup
    pairs ONLY within each cluster and keep one representative per
    duplicate relation. The keep rule is the catalog's deterministic
    keep-first convention: a vector is dropped iff a LOWER-id vector in
    its cluster is within cosine ≥ {_SEMDEDUP_THRESHOLD} (``dup_of``
    names that keeper, enabling the same cross-snapshot verdict joins
    the exact-dedup family uses). At this corpus the threshold drops
    ~6% of vectors — real semantic redundancy, not vacuous.

    Engine-exactness: cosine is exact integer dot products divided by
    IEEE sqrt/mul — both engines compare the identical double to the
    threshold, and keeper selection is an integer min. The driver hash
    gates every (vec_id, cluster, keep, dup_of) row.

    Scale shape: the pair join is an equi-join on the cluster id —
    quadratic ONLY within a cluster, the published SemDeDup design
    (clusters bound the pair explosion; k grows with N to keep cluster
    size constant, trained by the same pipeline). No global all-pairs
    stage exists. Excluded from the 10× probe set: cells are pinned at
    {_TRAINED_CELLS} for oracle determinism, so a 10× ratio would
    measure the pinned parameter, not the plan — the documented IVF
    exclusion policy."""
    assigned, _ = _km_trained_frames(spark, sf_dir, _TRAINED_CELLS)
    a = assigned.select(
        F.col("vec_id").alias("u"), F.col("v").alias("uv"), "cluster"
    )
    b = assigned.select(
        F.col("vec_id").alias("v_id"), F.col("v").alias("vv"), "cluster"
    )
    sim = _spark_int_dot(F.col("uv"), F.col("vv")) / (
        F.sqrt(_spark_int_dot(F.col("uv"), F.col("uv")))
        * F.sqrt(_spark_int_dot(F.col("vv"), F.col("vv")))
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("u") < F.col("v_id"))
        .filter(sim >= _SEMDEDUP_THRESHOLD)
        .groupBy(F.col("v_id").alias("vec_id"))
        .agg(F.min("u").alias("dup_of"))
    )
    return (
        assigned.select("vec_id", "cluster")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
        .orderBy("vec_id")
    )


# ===========================================================================
# CCNet-style familiarity buckets: head / middle / tail corpus split
# ===========================================================================


def _ccnet_buckets_sql() -> str:
    import idh_etl_demo_spark.catalog_r6  # noqa: F401  (registers entry)
    from idh_etl_demo_spark.catalog import ENTRIES

    fam = ENTRIES["doc_bigram_familiarity"].oracle
    return f"""
    with fam as materialized ({fam})
    select doc_id, n_bigrams, familiarity_num, familiarity,
           case ntile(3) over (order by familiarity desc, doc_id)
             when 1 then 'head' when 2 then 'middle' else 'tail' end as bucket
    from fam
    order by doc_id
    """


@query("doc_ccnet_buckets", _ccnet_buckets_sql())
def doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet corpus split (Wenzek et al. 2020): rank every document
    by its LM familiarity score and cut the corpus into head / middle /
    tail terciles — the standard recipe for quality-stratified sampling
    (train mostly on head+middle, keep tail for diversity). Composes
    ``doc_bigram_familiarity`` VERBATIM as the LM signal; the tercile is
    an ntile(3) over (familiarity desc, doc_id) — the doc_id tie-break
    makes bucket boundaries deterministic, so both engines cut
    identically and the driver hash gates every row.

    Scale shape: the input is the per-document SCORE table (one row per
    doc — the corpus-sized work happens inside the composed familiarity
    plan), so the global ntile window sorts |docs| scored rows, the
    same deliberate presentation-sort shape as customer_revenue_pareto.
    At 100 TB replace the exact tercile with approx_percentile
    thresholds and assign by comparison — same output contract."""
    from idh_etl_demo_spark.catalog_r6 import doc_bigram_familiarity

    fam = doc_bigram_familiarity(spark, sf_dir)
    w = Window.orderBy(F.desc("familiarity"), F.asc("doc_id"))
    bucket = (
        F.when(F.ntile(3).over(w) == 1, "head")
        .when(F.ntile(3).over(w) == 2, "middle")
        .otherwise("tail")
    )
    return fam.select(
        "doc_id",
        "n_bigrams",
        "familiarity_num",
        "familiarity",
        bucket.alias("bucket"),
    ).orderBy("doc_id")


def _bpe_seg_sql() -> str:
    return f"""
    with {','.join(_bpe_ctes())}
    select word, cast(cnt as bigint) as word_count,
           cast(len(syms) as bigint) as n_symbols,
           array_to_string(syms, ' ') as segmentation
    from w{_BPE_STEPS}
    order by word
    """


# ===========================================================================
# Perceptual image hashing: the dedup family's image-modality signature
# ===========================================================================


def _image_ahash_ctes() -> str:
    """The ahash oracle's CTE chain (m → vals → tot → hashed), exposed
    as a fragment so downstream oracles (catalog_r12's neardup census)
    can extend it with their own CTEs instead of string-splitting the
    composed SQL. ``hashed`` is the contract: one row per media_id with
    (media_id, width, height, ahash)."""
    # oracle reproduces the whole kernel from doc_id arithmetic + the
    # md5 string: value j of the 12 = cell j//3 (row-major over the 2×2
    # NN grid: sy = (cell//2)·h//2, sx = (cell%2)·w//2), channel j%3;
    # bit set iff sample·4 > channel total (integer, strict)
    return """m as (
      select doc_id as media_id, 1 + doc_id % 3 as w, 1 + doc_id % 2 as h,
             md5(text) as mh
      from documents
    ),
    vals as (
      select media_id, w, h,
             list_transform(generate_series(0, 11), j ->
               ascii(substring(mh,
                 (((j // 3) // 2 * h // 2) * w + ((j // 3) % 2 * w // 2)) * 3
                   + (j % 3) + 1, 1))) as v
      from m
    ),
    tot as (
      select media_id, w, h, v,
             list_transform(generate_series(0, 2), c ->
               v[c + 1] + v[c + 4] + v[c + 7] + v[c + 10]) as ct
      from vals
    ),
    hashed as (
      select media_id, cast(w as bigint) as width, cast(h as bigint) as height,
             cast(list_sum(list_transform(generate_series(0, 11), j ->
               case when v[j + 1] * 4 > ct[j % 3 + 1]
                    then 1 << (11 - j) else 0 end)) as bigint) as ahash
      from tot
    )"""


def _image_ahash_sql() -> str:
    return f"""
    with {_image_ahash_ctes()}
    select media_id, width, height, ahash,
           count(ahash) over (partition by ahash) as hash_group_size
    from hashed
    order by media_id
    """


@query("multimodal_image_ahash", _image_ahash_sql())
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup family extended to the IMAGE modality: a per-channel
    average-hash (aHash) computed from REAL binary-PPM decodes — the
    perceptual near-dup signature production pipelines group on to
    catch re-encoded / resized copies that byte-level hashing misses.
    Payload synthesis is ``multimodal_image_ppm``'s (valid P6 headers +
    md5-derived rasters, w ∈ {1,2,3}, h ∈ {1,2}); the kernel
    NN-downsamples to a 2×2 grid and sets one bit per (cell, channel)
    iff the sample exceeds its channel mean — an integer cross-multiply
    (sample·4 > channel_total), so the 12-bit hash is engine-exact and
    the oracle rebuilds every bit from doc_id arithmetic.
    ``hash_group_size`` is the bucket occupancy — equal hashes are the
    near-dup candidate groups, exactly how the text side groups MinHash
    bands (at sf0.01: 199 distinct hashes, 335 docs in ≥2-groups — a
    real grouping signal on this corpus's tiny rasters).

    Scale shape: synthesis + decode + hash are ONE map-only Arrow pass
    (raster bytes never shuffle); the group-size window shuffles only
    (media_id, 12-bit hash) pairs. A Pillow decoder for JPEG/PNG drops
    into the identical audited batch contract."""
    from idh_etl_demo_spark.operators.multimodal import image_ahash

    docs = _t(spark, sf_dir, "documents")
    w = (F.lit(1) + F.col("doc_id") % 3).cast("int")
    h = (F.lit(1) + F.col("doc_id") % 2).cast("int")
    header = F.concat_ws(
        "",
        F.lit("P6\n"),
        w.cast("string"),
        F.lit(" "),
        h.cast("string"),
        F.lit("\n255\n"),
    )
    raster = F.left(F.md5(F.col("text")), (w * h * 3).cast("int"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.encode(header, "utf-8"), F.encode(raster, "utf-8")
        ).alias("payload"),
    )
    # count(ahash), not count(*): a NULL signature (missing/undecodable
    # payload) must NOT share an inflated group size with every other
    # null row — window partitioning pools NULLs into one partition, so
    # the null-skipping count reports occupancy 0 for them (ADVICE r8)
    grp = Window.partitionBy("ahash")
    return (
        image_ahash(media, grid=2)
        .withColumn("hash_group_size", F.count("ahash").over(grp))
        .orderBy("media_id")
    )


# ===========================================================================
# Audio fingerprinting: the dedup family's audio-modality signature
# ===========================================================================


def _audio_fp_sql() -> str:
    # bit i (1-based, MSB first, weight 2^(15-i)) set iff sample i+1
    # strictly exceeds sample i — samples are the ASCII md5 chars the
    # synthesis wrote (every clip has ≥ 16 samples, so no padding path)
    return """
    with m as (
      select doc_id as media_id,
             8 + (1 + doc_id % 3) * 8 as n,
             md5(text) as mh
      from documents
    ),
    fp as (
      select media_id, cast(n as bigint) as n_samples,
             cast(list_sum(list_transform(generate_series(1, 15), i ->
               case when ascii(substring(mh, i + 1, 1))
                         > ascii(substring(mh, i, 1))
                    then 1 << (15 - i) else 0 end)) as bigint) as fingerprint
      from m
    )
    select media_id, n_samples, fingerprint,
           count(fingerprint) over (partition by fingerprint) as fp_group_size
    from fp
    order by media_id
    """


@query("multimodal_audio_fingerprint", _audio_fp_sql())
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup family extended to the AUDIO modality: a
    sign-of-difference fingerprint (the Haitsma-Kalkman bit derivation
    reduced to raw samples for uncompressed PCM) computed from REAL
    stdlib WAV decodes — bit i set iff decoded sample i+1 strictly
    exceeds sample i over the first 15 transitions, a pure integer
    comparison chain, so the 15-bit fingerprint is engine-exact and the
    oracle rebuilds every bit from the md5 synthesis arithmetic.
    Payloads are ``multimodal_audio_wav``'s valid RIFF/WAVE clips;
    ``fp_group_size`` is the near-dup candidate-group occupancy, the
    audio twin of ``multimodal_image_ahash``'s grouping (and of MinHash
    band buckets on the text side) — with this entry all three
    modalities have BOTH a decode path and a dedup signature under the
    driver gate.

    Scale shape: synthesis + decode + fingerprint are one map-only
    Arrow pass (sample bytes never shuffle); the group window shuffles
    (media_id, 15-bit fingerprint) pairs only."""
    from idh_etl_demo_spark.operators.multimodal import audio_fingerprint

    docs = _t(spark, sf_dir, "documents")
    n = (F.lit(8) + (F.lit(1) + F.col("doc_id") % 3) * 8).cast("int")
    le32 = lambda col: F.concat(  # noqa: E731  (x < 128 → 3 zero bytes)
        F.encode(F.char(col), "utf-8"), F.lit(bytes([0, 0, 0]))
    )
    header = F.concat(
        F.lit(b"RIFF"),
        le32(F.lit(36) + n),
        F.lit(b"WAVEfmt "),
        F.lit(bytes([16, 0, 0, 0])),
        F.lit(bytes([1, 0])),
        F.lit(bytes([1, 0])),
        F.lit(bytes([0x40, 0x1F, 0, 0])),
        F.lit(bytes([0x40, 0x1F, 0, 0])),
        F.lit(bytes([1, 0])),
        F.lit(bytes([8, 0])),
        F.lit(b"data"),
        le32(n),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            header, F.encode(F.left(F.md5(F.col("text")), n), "utf-8")
        ).alias("payload"),
    )
    # count(fingerprint), not count(*): NULL signatures stay out of
    # dedup groups (see multimodal_image_ahash)
    grp = Window.partitionBy("fingerprint")
    return (
        audio_fingerprint(media, n_bits=15)
        .withColumn("fp_group_size", F.count("fingerprint").over(grp))
        .orderBy("media_id")
    )


# ===========================================================================
# Passage-level decontamination via content-defined chunks
# ===========================================================================


def _passage_decontam_sql() -> str:
    import idh_etl_demo_spark.catalog_r6  # noqa: F401  (registers cdc entry)
    from idh_etl_demo_spark.catalog import ENTRIES

    return f"""
    with chunks as materialized ({ENTRIES["doc_cdc_chunks"].oracle}),
    longc as (
      select doc_id, chunk_hash from chunks where chunk_len >= 16
    ),
    bh as (select distinct chunk_hash from longc where doc_id % 11 = 0),
    corp as (select doc_id, chunk_hash from longc where doc_id % 11 <> 0),
    nch as (select doc_id, count(*) as n_chunks from corp group by doc_id),
    hits as (
      select c.doc_id, count(*) as n_bench_shared
      from corp c join bh using (chunk_hash)
      group by c.doc_id
    )
    select d.doc_id,
           cast(coalesce(nch.n_chunks, 0) as bigint) as n_chunks,
           cast(coalesce(h.n_bench_shared, 0) as bigint) as n_bench_shared,
           coalesce(h.n_bench_shared, 0) > 0 as contaminated
    from (select doc_id from documents where doc_id % 11 <> 0) d
    left join nch using (doc_id)
    left join hits h using (doc_id)
    order by d.doc_id
    """


@query("doc_decontamination_passages", _passage_decontam_sql())
def doc_decontamination_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASSAGE-LEVEL decontamination — the sub-document complement of
    the n-gram entries (`doc_decontamination`/`_bloom` catch gram
    overlap; this catches verbatim PASSAGES): chunk every document with
    content-defined chunking (``doc_cdc_chunks`` composed verbatim —
    boundaries follow content, so a benchmark passage embedded anywhere
    inside a training document still yields the identical chunk hashes,
    the property fixed-width windows lack), then flag every corpus
    document sharing a ≥16-char chunk with the held-out benchmark split
    (doc_id % 11 = 0, the family's standing split). Output per corpus
    doc: long-chunk count, shared-chunk count, contaminated verdict.

    Scale shape: chunking is the map-only Arrow kernel; the benchmark
    hash set is DISTINCT chunk hashes of the small split. The
    membership step is SIZE-GATED (``membership_semi_join``): a
    benchmark-suite-sized hash set broadcasts (the corpus side gains
    no shuffle for membership — the path this entry takes, and the
    gating count job re-chunks only the 1/11 bench split because each
    side chunks its own filtered scan); a held-out set too large to
    broadcast falls back to a shuffle semi-join on chunk_hash, moving
    only 16-byte hashes. Per-doc counts are two doc_id aggregates;
    passage text never joins. At 100 TB this is exactly how you sweep
    a corpus against a benchmark suite without materializing any text
    joins."""
    from idh_etl_demo_spark.catalog_r6 import _CDC_BASE, _CDC_MOD, _CDC_W
    from idh_etl_demo_spark.operators.dedup import membership_semi_join
    from idh_etl_demo_spark.operators.text import cdc_chunks_arrow

    docs = _t(spark, sf_dir, "documents")

    def long_chunks(side: DataFrame) -> DataFrame:
        return cdc_chunks_arrow(
            side.repartition(spark.sparkContext.defaultParallelism),
            window=_CDC_W,
            boundary_mod=_CDC_MOD,
            base=_CDC_BASE,
        ).filter(F.col("chunk_len") >= 16)

    bench_h = (
        long_chunks(docs.filter(F.col("doc_id") % 11 == 0))
        .select("chunk_hash")
        .distinct()
    )
    corp = long_chunks(docs.filter(F.col("doc_id") % 11 != 0)).select(
        "doc_id", "chunk_hash"
    )
    nch = corp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    hits = (
        membership_semi_join(corp, bench_h, "chunk_hash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bench_shared"))
    )
    return (
        docs.filter(F.col("doc_id") % 11 != 0)
        .select("doc_id")
        .join(nch, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_bench_shared", F.lit(0))
            .cast("long")
            .alias("n_bench_shared"),
            (F.coalesce("n_bench_shared", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Video fingerprinting: the dedup family's video-modality signature
# ===========================================================================


def _video_fp_sql() -> str:
    # the clip fingerprint is md5 over the ordered sampled-frame md5s —
    # frames are ASCII, so DuckDB's string md5 equals the kernel's byte
    # md5 exactly as in the demux entry's oracle
    return """
    with m as (
      select doc_id as media_id,
             2 + doc_id % 4 as n,
             md5(text) as mh
      from documents
    ),
    fp as (
      select media_id, cast(n as bigint) as n_frames,
             cast(len(list_filter(generate_series(0, n - 1),
                                  i -> i % 2 = 0)) as bigint) as n_sampled,
             md5(list_aggregate(
               list_transform(
                 list_filter(generate_series(0, n - 1), i -> i % 2 = 0),
                 i -> md5(substring(mh, i * 4 + 1, 4))),
               'string_agg', '')) as fingerprint
      from m
    )
    select media_id, n_frames, n_sampled, fingerprint,
           count(fingerprint) over (partition by fingerprint) as fp_group_size
    from fp
    order by media_id
    """


@query("multimodal_video_fingerprint", _video_fp_sql())
def multimodal_video_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup family extended to the VIDEO modality: the standard
    frame-sampling signature — demux the container (the REAL stdlib
    RIFF/AVI walker), hash every sampled frame, and fingerprint the
    clip as the md5 of the ORDERED sampled-frame hashes. Two clips
    collide iff their sampled content matches, which is how cheap
    video dedup works in practice (sample → per-frame hash → clip
    signature), robust to container-level byte differences the way a
    whole-file hash is not. With ``multimodal_image_ahash`` and
    ``multimodal_audio_fingerprint`` every modality now carries decode
    + features + a DEDUP SIGNATURE under the oracle gate.

    Engine-exactness: frames are ASCII md5 chars, so the per-frame and
    clip-level md5s are identical strings in both engines; ordering is
    pinned by frame_idx. Scale shape: the demux fan-out is map-only;
    the per-clip aggregate groups ⌈n/2⌉ hash rows by media_id
    (map-side combined via sorted collect_list), and the group window
    shuffles (media_id, 32-char hash) pairs only."""
    from idh_etl_demo_spark.catalog_r6 import _avi_media
    from idh_etl_demo_spark.operators.multimodal import demux_sample_frames

    frames = demux_sample_frames(
        _avi_media(_t(spark, sf_dir, "documents")), every_k=2
    )
    per_clip = (
        frames.groupBy("media_id")
        .agg(
            F.first("n_frames").alias("n_frames"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("frame_idx", "frame_md5")
                            )
                        ),
                        lambda s: s["frame_md5"],
                    ),
                )
            ).alias("fingerprint"),
        )
    )
    # count(fingerprint), not count(*): NULL signatures stay out of
    # dedup groups (see multimodal_image_ahash)
    grp = Window.partitionBy("fingerprint")
    return (
        per_clip.withColumn("fp_group_size", F.count("fingerprint").over(grp))
        .select(
            "media_id", "n_frames", "n_sampled", "fingerprint", "fp_group_size"
        )
        .orderBy("media_id")
    )


# ===========================================================================
# Quality-stratified corpus sampling over the CCNet buckets
# ===========================================================================

# per-bucket acceptance thresholds over the 32-bit uniform: head keeps
# everything, middle 1/2, tail 1/8 — integer powers of two so the
# accept test is a pure integer comparison (no float ever enters)
_BUCKET_KEEP_NUM = {"head": 2**32, "middle": 2**31, "tail": 2**29}


def _bucket_sample_sql() -> str:
    from idh_etl_demo_spark.catalog import ENTRIES

    buckets = ENTRIES["doc_ccnet_buckets"].oracle
    cases = " ".join(
        f"when '{b}' then {n}" for b, n in _BUCKET_KEEP_NUM.items()
    )
    return f"""
    with b as materialized ({buckets}),
    scored as (
      select doc_id, bucket,
             ('0x' || substring(md5('mix:' || cast(doc_id as varchar)), 1, 8))::bigint as u,
             case bucket {cases} end as keep_num
      from b
    )
    select doc_id, bucket, cast(u as bigint) as u_sample
    from scored
    where u < keep_num
    order by doc_id
    """


@query("doc_bucket_quality_sample", _bucket_sample_sql())
def doc_bucket_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified corpus construction — the step CCNet's
    bucketing exists FOR: keep the head entirely, sample the middle at
    1/2 and the tail at 1/8 (down-weighting low-LM-familiarity text
    without discarding its diversity outright). Composes
    ``doc_ccnet_buckets`` verbatim; the per-document uniform is a
    seeded 32-bit md5 prefix and every per-bucket rate is a power of
    two, so the accept test is a PURE INTEGER comparison — both engines
    keep the identical set, no float in the decision (the
    ``doc_dsir_sample`` technique with exactly-representable rates).

    Scale shape: a projection + filter over the composed bucket plan —
    the sampling adds ZERO exchanges (pinned by the shuffle budget);
    at 100 TB the mixture rates come from the data-mixture config and
    the same hash-acceptance runs embarrassingly parallel."""
    from idh_etl_demo_spark.catalog_r7 import doc_ccnet_buckets

    b = doc_ccnet_buckets(spark, sf_dir)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    keep_num = F.when(
        F.col("bucket") == "head", F.lit(_BUCKET_KEEP_NUM["head"])
    ).when(
        F.col("bucket") == "middle", F.lit(_BUCKET_KEEP_NUM["middle"])
    ).otherwise(F.lit(_BUCKET_KEEP_NUM["tail"]))
    return (
        b.select("doc_id", "bucket", u.alias("u_sample"), keep_num.alias("kn"))
        .filter(F.col("u_sample") < F.col("kn"))
        .select("doc_id", "bucket", "u_sample")
        .orderBy("doc_id")
    )


def _bpe_token_counts_sql() -> str:
    from idh_etl_demo_spark.catalog_llm import _WORDS

    return f"""
    with {','.join(_bpe_ctes())},
    seg as (select word, len(syms) as n_syms from w{_BPE_STEPS}),
    doc_words as (
      select doc_id, word
      from (select doc_id, unnest({_WORDS}) as word from documents)
      where word <> ''
    ),
    per_doc as (
      select dw.doc_id,
             count(*) as n_words,
             sum(seg.n_syms) as n_bpe_tokens
      from doc_words dw join seg using (word)
      group by dw.doc_id
    )
    select d.doc_id,
           cast(coalesce(p.n_words, 0) as bigint) as n_words,
           cast(coalesce(p.n_bpe_tokens, 0) as bigint) as n_bpe_tokens
    from (select doc_id from documents) d
    left join per_doc p using (doc_id)
    order by d.doc_id
    """


@query("doc_bpe_token_counts", _bpe_token_counts_sql())
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer APPLIED at corpus scale: per-document
    token counts under the learned BPE merges — the number every
    training-data budget (sequence packing, epoch sizing, mixture
    weighting) actually needs, as opposed to whitespace token counts.
    Composes ``doc_bpe_segmentation``'s symbol table verbatim: the
    corpus word stream joins the |types|-row segmentation table
    (broadcast — the tokenizer artifact is small by construction) and
    sums n_symbols per document.

    Scale shape: one corpus explode + one broadcast join + one doc_id
    aggregate — the tokenizer never shuffles the corpus; the training
    chain's cost is shared via the composed plan. Sweep-gated this
    round (the 50-slot window is fully committed to the rotation —
    round-8 window candidate)."""
    from idh_etl_demo_spark.operators.text import tokens

    _, words = _bpe_frames(spark, sf_dir)
    seg = words.select("word", F.size("syms").alias("n_syms"))
    docs = _t(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    per_doc = (
        dw.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@query("doc_bpe_segmentation", _bpe_seg_sql())
def doc_bpe_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every corpus word type segmented by the trained BPE merges — the
    tokenizer's OUTPUT applied back to its training vocabulary: after
    {_BPE_STEPS} merge rounds each word's symbol sequence reflects all
    learned merges applied left-to-right (the fold in
    ``_bpe_merge_step``; non-overlap pinned by a property test against
    a pure-Python reference). ``n_symbols`` is the per-word token count
    a downstream packing/budgeting step consumes.

    Same scale shape as ``doc_bpe_merge_steps`` (one corpus aggregate,
    then type-table-sized work); the segmentation itself is a per-row
    projection."""
    _, words = _bpe_frames(spark, sf_dir)
    return words.select(
        "word",
        F.col("cnt").cast("long").alias("word_count"),
        F.size("syms").cast("long").alias("n_symbols"),
        F.array_join("syms", " ").alias("segmentation"),
    ).orderBy("word")
