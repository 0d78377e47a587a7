"""Streaming corpus curation — the production cadence of the 100 TB
brief: document batches land continuously; each micro-batch is
watermark-deduped in-stream, classified against the PUBLISHED keeper
snapshot (operators/dedup.py:snapshot_dedup_status), and the snapshot +
verdict log are advanced through the same idempotent insert-if-absent
merge the batch loop uses — so failure replay and batch backfill share
one code path and one set of semantics.

Composition (each piece individually audited elsewhere):

    file stream → dropDuplicatesWithinWatermark → foreachBatch(
        snapshot_dedup_status → merge verdicts (by doc_id)
                              → merge new keepers (by content_hash))

The snapshot is immutable per published row: keeper ids are never
reassigned (the cross-snapshot dedup contract, catalog_r4's
doc_snapshot_dedup). At 100 TB the snapshot lives as a table BUCKETED
by content_hash so each micro-batch probe shuffles only the batch while
the snapshot is read pre-clustered (plan-asserted in
tests/test_bucketing.py); only 16-byte digests flow past the hash
projection, never document bodies.

The reference's closest shape is the hourly merge loop
(dags/idh_etl.py:161-233: fetch → clean → insert-if-absent); this module
is its continuous equivalent with dedup verdicts as a first-class
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

from idh_etl_demo_spark.operators.dedup import (
    normalize_text,
    snapshot_dedup_status,
)
from idh_etl_demo_spark.operators.merge import merge_insert_if_absent

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def read_document_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File stream over landed document batches. One file per trigger by
    default so each landed batch becomes exactly one micro-batch (the
    deterministic replay grain the oracle models)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def deduped_document_stream(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """In-stream redelivery suppression: duplicate doc_ids arriving
    within the watermark horizon are dropped by the engine's state store
    BEFORE the snapshot probe, so redelivered rows never even reach the
    merge. State stays bounded — the watermark expires old doc_ids, and
    anything later than that is caught by the idempotent merges instead
    (defense in depth, same split as the delays pipeline's
    dropDuplicatesWithinWatermark + keyed merge)."""
    return stream.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )


def curate_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    verdict_path: str,
) -> None:
    """The foreachBatch body, factored out so tests can REPLAY a batch
    directly (simulating redelivery after checkpoint loss) and assert
    the snapshot and verdict log are unchanged.

    Idempotency: verdicts merge by doc_id, new keepers merge by
    content_hash — both insert-if-absent, so re-processing any batch
    (or any interleaving of a crashed partial run and its retry) is a
    no-op. Verdicts are materialized (localCheckpoint) BEFORE the
    snapshot advances: the classification is lazy over the snapshot
    scan, and advancing the snapshot first would reclassify the whole
    batch as dup_of_snapshot.
    """
    hashed = batch.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    if _has_parquet(snapshot_path):
        snapshot = spark.read.parquet(snapshot_path)
    else:
        snapshot = spark.createDataFrame(
            [], "content_hash string, snap_keeper long"
        )
    # micro-batches are bounded (maxFilesPerTrigger); the checkpoint pins
    # the classification result so both merges read one materialization
    verdicts = (
        hashed.join(snapshot_dedup_status(hashed, snapshot), "doc_id")
        .select("doc_id", "content_hash", "status", "keeper_id")
        .localCheckpoint()
    )
    try:
        merge_insert_if_absent(
            spark,
            verdicts.select("doc_id", "status", "keeper_id"),
            verdict_path,
            ["doc_id"],
        )
        merge_insert_if_absent(
            spark,
            verdicts.filter(F.col("status") == "new").select(
                "content_hash", F.col("doc_id").alias("snap_keeper")
            ),
            snapshot_path,
            ["content_hash"],
        )
    finally:
        # best-effort release of the checkpoint blocks (bounded anyway)
        try:
            from idh_etl_demo_spark.operators.graph import _release_checkpoint

            _release_checkpoint(verdicts)
        except Exception:
            pass


def stream_documents_to_snapshot(
    spark: SparkSession,
    landing_dir: str,
    snapshot_path: str,
    verdict_path: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Continuous snapshot curation: availableNow drains everything
    landed so far, one file per micro-batch, then stops — the hourly
    catch-up shape (streaming/runner.py) expressed as a stream. Restart
    with the same checkpoint resumes where it left off; restart WITHOUT
    the checkpoint replays everything and the merges absorb it."""
    stream = deduped_document_stream(
        read_document_stream(spark, landing_dir), watermark
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        curate_batch(spark, batch, snapshot_path, verdict_path)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _has_parquet(path: str) -> bool:
    import os

    if not os.path.isdir(path):
        return False
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
