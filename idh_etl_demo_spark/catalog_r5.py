"""Catalog part 6 — round-5 addition: STREAMING incremental curation.

Round 4 added the two batch halves (cross-snapshot dedup, incremental
curation); this entry composes them with the streaming layer into the
real production cadence: document batches land as files, a Structured
Streaming query drains them one micro-batch per file through
watermark dedup → snapshot classification → idempotent merges
(streaming/curate.py), and the VERDICT LOG after the stream drains is
the gated result.

Oracle parity: the landing order is deterministic (batch_no =
doc_id % 3; files named and mtime-stamped in batch order, one file per
trigger), so the final verdict state is SQL-expressible: a hash's
snapshot keeper is the min doc_id within its EARLIEST batch; later
batches see dup_of_snapshot, same-batch non-keepers see dup_in_batch.

The derived replica legs (the catalog_r4 technique — the synthetic
corpus has zero organic exact dups) make every verdict branch fire at
the driver's sf0.01 gate:

- +999999 leg (doc_id % 25 = 0): 999999 % 3 == 0 keeps the replica in
  the SAME batch as its original → dup_in_batch (original is keeper);
- +1000001 leg (doc_id % 25 = 9): shifts the batch by 2 mod 3 → lands
  in an EARLIER or LATER batch than the original depending on
  doc_id % 3, so dup_of_snapshot fires in BOTH directions (sometimes
  the replica is first and the ORIGINAL gets the verdict).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from pyspark.sql import Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _NORM, _WORDS

_STREAM_SQL = f"""
    with corpus as (
      select doc_id, text from documents
      union all
      select doc_id + 999999 as doc_id, text from documents where doc_id % 25 = 0
      union all
      select doc_id + 1000001 as doc_id, text from documents where doc_id % 25 = 9
    ),
    hashed as (
      select doc_id, doc_id % 3 as batch_no, md5({_NORM}) as content_hash
      from corpus
    ),
    fb as (
      select content_hash, min(batch_no) as first_batch
      from hashed group by content_hash
    ),
    bk as (
      select content_hash, batch_no, min(doc_id) as batch_keeper
      from hashed group by content_hash, batch_no
    ),
    snapk as (
      select h.content_hash, min(h.doc_id) as snap_keeper
      from hashed h
      join fb on fb.content_hash = h.content_hash and h.batch_no = fb.first_batch
      group by h.content_hash
    )
    select h.doc_id, cast(h.batch_no as integer) as batch_no,
           case when h.batch_no > f.first_batch then 'dup_of_snapshot'
                when h.doc_id != k.batch_keeper then 'dup_in_batch'
                else 'new' end as status,
           case when h.batch_no > f.first_batch then s.snap_keeper
                when h.doc_id != k.batch_keeper then k.batch_keeper
           end as keeper_id
    from hashed h
    join fb f on f.content_hash = h.content_hash
    join bk k on k.content_hash = h.content_hash and k.batch_no = h.batch_no
    join snapk s on s.content_hash = h.content_hash
    order by h.doc_id
"""

# (applicationId, sf_dir) → verdict parquet path. The stream is run once
# per session+sf; repeat builder calls (the driver compares the entry
# several times) reuse the drained verdict table. The temp tree lives for
# the session; one bounded generation, same policy as _CURATION_CACHE.
_STREAM_RESULTS: dict[tuple, str] = {}


def _stream_corpus_frame(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 999999).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 25 == 9).select(
                (F.col("doc_id") + 1000001).alias("doc_id"), "text"
            )
        )
    )


def _land_batches(spark: SparkSession, corpus: DataFrame, landing: str) -> None:
    """Write one parquet file per batch_no into the landing dir, named
    AND mtime-stamped in batch order so the file stream (which orders by
    modification time, path as tiebreak) processes them as micro-batches
    0, 1, 2. Every row of batch b carries event_ts = T0 + b minutes; the
    doc_id % 10 = 7 slice of each batch is shipped TWICE (identical
    rows) to exercise dropDuplicatesWithinWatermark in-stream."""
    staged = corpus.withColumn(
        "batch_no", (F.col("doc_id") % 3).cast("int")
    ).withColumn(
        "event_ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(mins=(F.col("doc_id") % 3).cast("int")),
    )
    redelivered = staged.filter(F.col("doc_id") % 10 == 7)
    staged = staged.unionByName(redelivered)
    os.makedirs(landing, exist_ok=True)
    for b in range(3):
        tmp = os.path.join(landing, f"_stage_{b}")
        (
            staged.filter(F.col("batch_no") == b)
            .select("doc_id", "text", "event_ts")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        dest = os.path.join(landing, f"batch-{b}.parquet")
        shutil.move(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))


@query("doc_streaming_snapshot_curation", _STREAM_SQL)
def doc_streaming_snapshot_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental curation, end to end through the REAL
    engine: lands 3 document batches as files, drains them with an
    availableNow Structured Streaming query (one file per micro-batch,
    watermark-deduped redeliveries), classifies each batch against the
    published keeper snapshot and advances snapshot + verdict log via
    idempotent insert-if-absent merges — then returns the drained
    verdict log (streaming/curate.py for the composition; the replay /
    crash-idempotency contract is pytest-gated in
    tests/test_streaming_curation.py).

    EAGER by streaming nature (the builder must drain the stream to
    expose its final state; exempt from the lazy-builder contract like
    the fixpoint entries). Result cached per session+sf.

    Scale shape: per micro-batch the snapshot probe joins on
    content_hash only — 16-byte digests, never bodies; at 100 TB the
    snapshot is a content_hash-BUCKETED table so only the (small) batch
    shuffles (tests/test_bucketing.py asserts that plan). The verdict
    log is append-only and keyed by doc_id, so replay of any drained
    file is a no-op (reference's merge contract, dags/idh_etl.py:214).
    """
    from idh_etl_demo_spark.streaming.curate import stream_documents_to_snapshot

    key = (spark.sparkContext.applicationId, sf_dir)
    verdict_path = _STREAM_RESULTS.get(key)
    if verdict_path is None:
        # replica-leg alias guard: the derived legs shift doc_id by
        # 999999/1000001; if any shifted id collides with an ORGANIC
        # doc_id, the stream's doc_id-keyed watermark dedup + verdict
        # merge would silently drop a distinct document while the
        # oracle's UNION ALL keeps both rows. Assert the EXACT property
        # (replica-id set ∩ organic-id set = ∅) rather than a blanket
        # max-id bound: sparse large-id corpora — e.g. the 10× scale
        # probe's stride-shifted copies — are alias-free and must not
        # trip it. One id-width semi-join at build time; this builder
        # is already EAGER by streaming nature, so no laziness
        # violation. (Round-5 advice item.)
        ids = _t(spark, sf_dir, "documents").select("doc_id")
        replicas = (
            ids.filter(F.col("doc_id") % 25 == 0)
            .select((F.col("doc_id") + 999999).alias("doc_id"))
            .unionByName(
                ids.filter(F.col("doc_id") % 25 == 9).select(
                    (F.col("doc_id") + 1000001).alias("doc_id")
                )
            )
        )
        n_alias = ids.join(replicas, "doc_id", "left_semi").count()
        if n_alias:
            raise ValueError(
                f"{n_alias} replica-leg ids alias organic doc_ids; "
                "the derived stream batches would silently merge "
                "distinct documents — use larger shifts for this corpus"
            )
        work = tempfile.mkdtemp(prefix="stream_curate_")
        landing = os.path.join(work, "landing")
        snapshot_path = os.path.join(work, "snapshot")
        verdict_path = os.path.join(work, "verdicts")
        checkpoint = os.path.join(work, "checkpoint")
        _land_batches(
            spark, _stream_corpus_frame(_t(spark, sf_dir, "documents")), landing
        )
        q = stream_documents_to_snapshot(
            spark, landing, snapshot_path, verdict_path, checkpoint
        )
        q.awaitTermination()
        _STREAM_RESULTS[key] = verdict_path
    return (
        spark.read.parquet(verdict_path)
        .select(
            "doc_id",
            (F.col("doc_id") % 3).cast("int").alias("batch_no"),
            "status",
            "keeper_id",
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Sequence packing: concat-and-split context assembly (distributed prefix
# sum — the op every pretraining pipeline runs between curation and the
# data loader)
# ===========================================================================

_PACK_CTX = 512  # tokens per training sequence
_PACK_SHARD = 32  # doc_ids per prefix-sum shard (order-preserving ranges)


@query(
    "doc_sequence_packing",
    f"""
    with toks as (
      select doc_id, len(list_filter({_WORDS}, w -> w != '')) as n_tokens
      from documents
    ),
    cum as (
      select doc_id, n_tokens,
             cast(coalesce(sum(n_tokens) over (
               order by doc_id rows between unbounded preceding and 1 preceding
             ), 0) as bigint) as tokens_before
      from toks
    )
    select doc_id, n_tokens, tokens_before,
           tokens_before // {_PACK_CTX} as first_seq,
           (tokens_before + greatest(n_tokens, 1) - 1) // {_PACK_CTX} as last_seq,
           (tokens_before + greatest(n_tokens, 1) - 1) // {_PACK_CTX}
             - tokens_before // {_PACK_CTX} + 1 as n_seqs
    from cum
    order by doc_id
    """,
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: documents are laid end to end
    in doc_id order as one token stream and cut into fixed
    {ctx}-token training sequences; each doc reports the sequence
    range it lands in (a doc may span sequences — the standard
    pretraining packing, not bin-packing).

    The global prefix sum is the scale problem: a single
    `Window.orderBy` serializes 100 TB through one partition. This
    builder runs the classic DISTRIBUTED prefix sum instead — (1)
    per-shard cumulative sums (shards are order-preserving doc_id
    ranges, so intra-shard windows parallelize), (2) one tiny
    single-partition pass over |shards| SUBTOTALS (scalars, not rows),
    (3) broadcast the shard offsets back. The only serialized data is
    one row per shard; the corpus itself never leaves its partitions
    except for the final presentation sort. The oracle states the same
    semantics as the naive global window — equality IS the proof the
    decomposition is exact.
    """
    return _packing_frame(spark, _t(spark, sf_dir, "documents"))


def _packing_frame(
    spark: SparkSession, docs: DataFrame, shard_width: int = _PACK_SHARD
) -> DataFrame:
    """The distributed prefix sum over an explicit corpus — factored out
    so tests can assert the result is INVARIANT to shard_width (the
    correctness property of the decomposition)."""
    from idh_etl_demo_spark.operators.text import token_count

    toks = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.floor(F.col("doc_id") / shard_width).alias("shard"),
    )
    w_intra = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = toks.withColumn(
        "intra_before", F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
    )
    w_shard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        toks.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_total"))
        .withColumn(
            "shard_before", F.coalesce(F.sum("shard_total").over(w_shard), F.lit(0))
        )
        .select("shard", "shard_before")
    )
    return (
        intra.join(F.broadcast(offsets), "shard")
        .withColumn(
            "tokens_before",
            (F.col("shard_before") + F.col("intra_before")).cast("long"),
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "tokens_before",
            f"tokens_before div {_PACK_CTX} as first_seq",
            f"(tokens_before + greatest(n_tokens, 1) - 1) div {_PACK_CTX} as last_seq",
            f"(tokens_before + greatest(n_tokens, 1) - 1) div {_PACK_CTX}"
            f" - tokens_before div {_PACK_CTX} + 1 as n_seqs",
        )
        .orderBy("doc_id")
    )


doc_sequence_packing.__doc__ = doc_sequence_packing.__doc__.format(ctx=_PACK_CTX)


# ===========================================================================
# PII scrubbing: regex redaction + audit counts (training-data hygiene)
# ===========================================================================

# Conservative patterns that behave identically under Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no backreferences.
_PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_PHONE = r"\+?[0-9]{2,3}([- ][0-9]{3,4}){2,3}"


@query(
    "doc_pii_scrub",
    f"""
    with injected as (
      select doc_id,
             case when doc_id % 7 = 0
                    then text || ' Contact user' || doc_id
                         || '@example.com or +48 123 456 789.'
                  when doc_id % 11 = 3
                    then text || ' Tel: 555-123-4567 now.'
                  else text end as text
      from documents
    )
    select doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) as n_emails,
           len(regexp_extract_all(text, '{_PII_PHONE}')) as n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g')) as scrubbed_hash
    from injected
    order by doc_id
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: count and replace email addresses
    and phone numbers (\"<EMAIL>\"/\"<PHONE>\" placeholders), gating both
    the audit counts and the md5 of the scrubbed text. The synthetic
    corpus carries no organic PII, so deterministic PII is INJECTED
    into two doc_id slices first (the catalog_r4 derived-input
    technique) — the email branch (with an embedded phone) fires on
    doc_id % 7, the phone-only branch on doc_id % 11 = 3, everything
    else must scrub to identity.

    Patterns are the RE2∩Java-regex dialect (no lookaround /
    backreferences) so both engines match identically — the same
    constraint a real pipeline faces keeping its Spark pass consistent
    with, e.g., a Go or C++ serving-side scrubber. Pure projection:
    whole-stage codegen, zero shuffles except the presentation sort;
    at 100 TB this is a map-only pass."""
    docs = _t(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +48 123 456 789."),
        ),
    ).when(
        F.col("doc_id") % 11 == 3,
        F.concat(F.col("text"), F.lit(" Tel: 555-123-4567 now.")),
    ).otherwise(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(injected, _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(injected, F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(injected, F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_hash"),
    ).orderBy("doc_id")


# ===========================================================================
# Language-mix temperature sampling weights (multilingual corpus balance)
# ===========================================================================

_MIX_ALPHA_SQRT = True  # alpha = 0.5 → sqrt; exact-ish cross-engine


@query(
    "doc_lang_mix_weights",
    """
    with c as (
      select lang, count(*) as n_docs from documents group by lang
    ),
    t as (
      select cast(sum(n_docs) as bigint) as total, sum(sqrt(n_docs)) as z
      from c
    )
    select lang, n_docs,
           round(sqrt(n_docs) / z, 6) as weight,
           cast(round(sqrt(n_docs) / z * total, 0) as bigint) as expected_docs
    from c cross join t
    order by lang
    """,
)
def doc_lang_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based sampling weights per language (alpha = 0.5, the
    multilingual-mixing rebalance): w_l ∝ p_l^α, reported with the
    expected per-language document budget at the current corpus size.
    Up-weights tail languages against the head — the standard knob for
    multilingual pretraining mixes.

    Scale shape: one map-side-combined count per language, then all
    arithmetic happens against a ONE-ROW broadcast of the two corpus
    scalars (total, z) — a BroadcastNestedLoopJoin over |languages|
    rows, never a cartesian over data. At 100 TB the per-language
    count is the only pass over the corpus."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = c.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.sum(F.sqrt("n_docs")).alias("z"),
    )
    w = F.sqrt(F.col("n_docs")) / F.col("z")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_docs",
            F.round(w, 6).alias("weight"),
            F.round(w * F.col("total"), 0).cast("long").alias("expected_docs"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Overlapping token-window chunking (retrieval / context-window prep)
# ===========================================================================

_CHUNK_W = 64  # tokens per chunk
_CHUNK_S = 48  # stride (overlap = W - S = 16)


@query(
    "doc_chunk_overlap",
    f"""
    with base as (
      select doc_id, list_filter({_WORDS}, w -> w != '') as words
      from documents
    ),
    k as (
      select doc_id, words,
             1 + greatest(0, (len(words) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S})
               as n_chunks
      from base
    )
    select doc_id, i as chunk_idx,
           len(list_slice(words, i*{_CHUNK_S} + 1, i*{_CHUNK_S} + {_CHUNK_W}))
             as chunk_tokens,
           md5(array_to_string(
                 list_slice(words, i*{_CHUNK_S} + 1, i*{_CHUNK_S} + {_CHUNK_W}), ' '))
             as chunk_hash
    from k cross join unnest(generate_series(0, n_chunks - 1)) as t(i)
    order by doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({w}-token windows, stride
    {s}, {o}-token overlap) — the retrieval-indexing / long-context
    prep that sits between curation and embedding. Emits one row per
    (doc, chunk) with the chunk's token count and content hash.

    Scale shape: pure partition-local row EXPLOSION — the words array,
    chunk index sequence, slice, and hash are all codegen'd column
    expressions; no shuffle anywhere except the presentation sort. The
    ~{w}/{s}× output growth happens inside each task, which is exactly
    where you want it at 100 TB (the downstream embedding pass
    repartitions anyway). DuckDB's integer `//` is floor-division and
    Spark's `div` truncates toward zero — they disagree only below
    zero, which the greatest(0, ·) clamp makes unreachable."""
    from idh_etl_demo_spark.operators.dedup import normalize_text

    docs = _t(spark, sf_dir, "documents")
    words = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda w: w != ""
    )
    base = docs.select("doc_id", words.alias("words"))
    k = base.selectExpr(
        "doc_id",
        "words",
        f"1 + greatest(0, (size(words) - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S})"
        " as n_chunks",
    )
    chunk = F.slice(
        F.col("words"),
        F.col("chunk_idx") * _CHUNK_S + 1,
        F.lit(_CHUNK_W),
    )
    return (
        k.select(
            "doc_id",
            "words",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


doc_chunk_overlap.__doc__ = doc_chunk_overlap.__doc__.format(
    w=_CHUNK_W, s=_CHUNK_S, o=_CHUNK_W - _CHUNK_S
)


# ===========================================================================
# Balanced (equal-allocation) stratified sampling across skewed strata
# ===========================================================================

_BAL_TARGET = 10  # docs per stratum
_HASH56 = 72057594037927936  # 2^56 — 14 hex chars; TARGET * 2^56 fits int64


@query(
    "doc_balanced_sample",
    f"""
    with strata as (
      select source, count(*) as stratum_n from documents group by source
    ),
    h as (
      select d.doc_id, d.source, s.stratum_n,
             ('0x' || substring(md5(cast(d.doc_id as varchar)), 1, 14))::bigint as hv
      from documents d join strata s on s.source = d.source
    )
    select doc_id, source, stratum_n
    from h
    where hv < ({_BAL_TARGET} * {_HASH56}) // stratum_n
    order by doc_id
    """,
)
def doc_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BALANCED stratified sampling: each stratum (source) is sampled at
    its own rate target/|stratum|, so skewed strata come out equally
    represented — the corpus-mixing complement of ``doc_hash_sample``
    (which audits one global rate per stratum). The decision stays a
    pure function of (doc_id, stratum size): md5(doc_id)'s 56-bit
    prefix under the integer threshold (target·2^56) // stratum_n —
    integer-exact cross-engine (no float rate, no rounding-mode trap),
    reproducible across runs, engines and partitionings.

    Scale shape: stratum sizes are a map-side-combined count joined
    back as a BROADCAST (|strata| rows); the sample predicate is then a
    pure projection over the corpus — one aggregate pass plus a
    map-only filter at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(F.count(F.lit(1)).alias("stratum_n"))
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(strata), "source")
        .select("doc_id", "source", "stratum_n", hv.alias("hv"))
        .filter(
            F.col("hv")
            < F.expr(f"({_BAL_TARGET} * {_HASH56}L) div stratum_n")
        )
        .select("doc_id", "source", "stratum_n")
        .orderBy("doc_id")
    )


# ===========================================================================
# OOV rate against the corpus top-K vocabulary (tokenizer-fit signal)
# ===========================================================================

_OOV_VOCAB_K = 20  # the synthetic corpus has only 31 word types — 20 leaves real OOV mass


@query(
    "doc_oov_rate",
    f"""
    with words as (
      select doc_id, unnest(list_filter({_WORDS}, w -> w != '')) as word
      from documents
    ),
    freq as (
      select word, count(*) as cnt from words group by word
    ),
    vocab as (
      select word from freq order by cnt desc, word limit {_OOV_VOCAB_K}
    ),
    per_doc as (
      select w.doc_id,
             count(*) as n_tokens,
             cast(sum(case when v.word is null then 1 else 0 end) as bigint)
               as n_oov
      from words w left join vocab v on v.word = w.word
      group by w.doc_id
    )
    select doc_id, n_tokens, n_oov,
           round(n_oov * 1.0 / n_tokens, 6) as oov_rate
    from per_doc
    order by doc_id
    """,
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-{k} vocabulary (count-desc, word-asc tie-break — deterministic
    cutoff): the cheap tokenizer-fit signal — documents with a high OOV
    rate against the training vocabulary are the ones a subword
    tokenizer will shred into long sequences.

    Scale shape: the vocabulary is a top-K over word counts
    (map-side-combined agg + TakeOrdered) and joins back as a
    BROADCAST — the exploded token stream never shuffles for the
    membership test, only for the two keyed aggregates (word counts,
    per-doc rollup), both carrying aggregated rows."""
    docs = _t(spark, sf_dir, "documents")
    from idh_etl_demo_spark.operators.text import tokens

    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        freq.orderBy(F.desc("cnt"), "word")
        .limit(_OOV_VOCAB_K)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") * 1.0 / F.col("n_tokens"), 6).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


doc_oov_rate.__doc__ = doc_oov_rate.__doc__.format(k=_OOV_VOCAB_K)


# ===========================================================================
# Custom stateful operator, oracle-gated: applyInPandasWithState running
# totals replayed over a micro-batched stream must equal the batch SQL
# aggregate (final state is batch-split INVARIANT)
# ===========================================================================


def _land_event_batches(spark: SparkSession, events: DataFrame, landing: str) -> None:
    """Split the events table into 3 parquet files (event_id % 3), named
    and mtime-stamped in batch order — the replay feed for the stateful
    operator. The SPLIT ITSELF is arbitrary: the final state is
    invariant to how the stream is batched, which is exactly what the
    oracle equality proves."""
    os.makedirs(landing, exist_ok=True)
    for b in range(3):
        tmp = os.path.join(landing, f"_stage_{b}")
        (
            events.filter(F.col("event_id") % 3 == b)
            .select("user_id", "ts", "value")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        dest = os.path.join(landing, f"batch-{b}.parquet")
        shutil.move(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))


_STATEFUL_RESULTS: dict[tuple, str] = {}


@query(
    "events_stateful_running_totals",
    """
    select user_id,
           count(*) as n_events,
           round(sum(value), 4) as sum_value,
           max(ts) as last_ts
    from events
    group by user_id
    order by user_id
    """,
)
def events_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom STATEFUL streaming operator, oracle-gated end to end:
    replay the events table as 3 file-landed micro-batches through
    ``streaming/stateful.py:user_running_totals`` (applyInPandasWithState
    — engine-managed per-key state, Arrow-batched Python, one snapshot
    emission per key per appearing batch), capture every emission, and
    return each user's FINAL snapshot. n_events strictly increases per
    emission, so the final row is the max-n_events row per user.

    The oracle is the plain batch aggregate: running-total state is
    INVARIANT to how the stream is micro-batched, so stream-end state
    == batch GROUP BY — the strongest cheap proof that the stateful
    operator neither drops, double-counts, nor leaks rows across key
    boundaries. (sum_value rounds to 4 dp on both sides: the stream
    accumulates doubles in batch order, the oracle in scan order.)

    EAGER by streaming nature (cached per session+sf, like the
    streaming curation entry). At 100 TB the state store shards by
    user_id across executors (RocksDB provider for unbounded state);
    the Python function only ever sees one key's Arrow batches."""
    from idh_etl_demo_spark.streaming.stateful import user_running_totals

    key = (spark.sparkContext.applicationId, sf_dir)
    out = _STATEFUL_RESULTS.get(key)
    if out is None:
        import pyspark.sql.types as T

        work = tempfile.mkdtemp(prefix="stateful_replay_")
        landing = os.path.join(work, "landing")
        out = os.path.join(work, "emissions")
        _land_event_batches(spark, _t(spark, sf_dir, "events"), landing)
        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        totals = user_running_totals(stream)

        def sink(batch: DataFrame, batch_id: int) -> None:
            batch.write.mode("append").parquet(out)

        q = (
            totals.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _STATEFUL_RESULTS[key] = out
    from pyspark.sql import Window as W

    emissions = spark.read.parquet(out)
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    return (
        emissions.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("sum_value", 4).alias("sum_value"),
            "last_ts",
        )
        .orderBy("user_id")
    )


# ===========================================================================
# Multimodal kernels, oracle-gated: the Arrow mapInPandas plumbing runs
# for real; the payload is synthesized as the ASCII md5 content key so
# the fake decoder's byte arithmetic is SQL-expressible
# ===========================================================================


@query(
    "multimodal_image_features",
    """
    with m as (select doc_id as media_id, md5(text) as mh from documents)
    select media_id,
           cast(1 + ascii(substring(mh, 1, 1)) % 64 as bigint) as width,
           cast(1 + ascii(substring(mh, 32, 1)) % 64 as bigint) as height,
           round(list_sum(list_transform(generate_series(1, 32),
                                         i -> ascii(substring(mh, i, 1))))
                 / 32.0 / 255.0, 6) as mean_intensity
    from m
    order by media_id
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image feature-extraction kernel DRIVER-GATED end to end: the
    real Arrow ``mapInPandas`` path (operators/multimodal.py:
    image_features — batch iteration, schema contract, binary column
    transfer) runs with the deterministic fake decoder over payloads
    synthesized as the utf-8 md5 content key. Because the payload is
    pure ASCII hex, the fake's byte arithmetic (width/height from
    first/last byte, mean over the prefix) is exactly expressible in
    the oracle — so the gate verifies the PLUMBING with real values,
    not just row counts. Swapping ``fake=False`` plugs a real
    Pillow/opencv decoder into the same audited batch shape (the libs
    are absent in this container — SURVEY §2.10 multimodal row).

    Scale shape: map-only Arrow pass (one Python worker round-trip per
    partition batch), no shuffle before the presentation sort."""
    from idh_etl_demo_spark.operators.multimodal import image_features

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.md5(F.col("text")), "utf-8").alias("payload"),
    )
    return (
        image_features(media, fake=True)
        .select(
            "media_id",
            "width",
            "height",
            F.round("mean_intensity", 6).alias("mean_intensity"),
        )
        .orderBy("media_id")
    )


@query(
    "multimodal_frame_sample",
    """
    with m as (select doc_id as media_id, md5(text) as mh from documents)
    select media_id, cast(i as bigint) as frame_no,
           md5(substring(mh, i * 8 + 1, 8)) as frame_md5
    from m cross join unnest(generate_series(0, 3)) as t(i)
    order by media_id, frame_no
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video frame-sampling kernel driver-gated: the real
    ``mapInPandas`` fan-out path (operators/multimodal.py:sample_frames
    — one media row in, N frame rows out, binary frame payloads) over
    the 32-byte ASCII content-key payload at an 8-byte stride → exactly
    4 "frames" per media, each gated by its content md5 against the
    oracle's string-slice equivalent. The fan-out SHAPE is the part
    that matters at 100 TB (frame explosion stays partition-local,
    feeding the same per-frame feature/dedup pipeline as images);
    a real pyav demuxer drops into the identical batch contract."""
    from idh_etl_demo_spark.operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.md5(F.col("text")), "utf-8").alias("payload"),
    )
    return (
        sample_frames(media, every_n_bytes=8, fake=True)
        .select("media_id", "frame_no", F.md5("frame_bytes").alias("frame_md5"))
        .orderBy("media_id", "frame_no")
    )
