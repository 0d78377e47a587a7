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

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _NORM

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
