"""Streaming incremental curation (streaming/curate.py): verdict
semantics of the drained stream, in-stream watermark dedup, and the
idempotent replay / restart-without-checkpoint contract — the
production failure modes of a continuous curation pipeline.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyspark.sql.functions as F

from idh_etl_demo_spark.streaming.curate import (
    curate_batch,
    deduped_document_stream,
    read_document_stream,
    stream_documents_to_snapshot,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

# batch 0: three distinct docs; doc 7 redelivered (identical row twice)
# batch 1: doc 11 re-submits doc 1's text (dup_of_snapshot), docs 12/13
#          share new text (12 keeper, 13 dup_in_batch)
BATCHES = [
    [
        (1, "alpha one text", T0),
        (2, "bravo two text", T0),
        (7, "golf seven text", T0),
        (7, "golf seven text", T0),
    ],
    [
        (11, "Alpha   ONE text", T0 + dt.timedelta(minutes=1)),  # normalizes to doc 1's
        (12, "charlie three text", T0 + dt.timedelta(minutes=1)),
        (13, "charlie three text", T0 + dt.timedelta(minutes=1)),
    ],
]

EXPECTED = {
    1: ("new", None),
    2: ("new", None),
    7: ("new", None),
    11: ("dup_of_snapshot", 1),
    12: ("new", None),
    13: ("dup_in_batch", 12),
}


def _land(spark, landing: str, batches) -> None:
    """One parquet file per batch, named and mtime-stamped in batch order
    (the file stream processes by modification time)."""
    os.makedirs(landing, exist_ok=True)
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, event_ts timestamp"
        )
        tmp = os.path.join(landing, f"_s{b}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dest = os.path.join(landing, f"batch-{b}.parquet")
        os.rename(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))


def _paths(tmp_path):
    return (
        str(tmp_path / "landing"),
        str(tmp_path / "snapshot"),
        str(tmp_path / "verdicts"),
        str(tmp_path / "ckpt"),
    )


def _drain(spark, landing, snapshot, verdicts, ckpt):
    q = stream_documents_to_snapshot(spark, landing, snapshot, verdicts, ckpt)
    q.awaitTermination()


def _verdict_map(spark, verdicts):
    return {
        r.doc_id: (r.status, r.keeper_id)
        for r in spark.read.parquet(verdicts).collect()
    }


def test_stream_verdicts(spark, tmp_path):
    landing, snapshot, verdicts, ckpt = _paths(tmp_path)
    _land(spark, landing, BATCHES)
    _drain(spark, landing, snapshot, verdicts, ckpt)

    assert _verdict_map(spark, verdicts) == EXPECTED
    # exactly one verdict row per doc (the redelivered doc 7 included)
    assert spark.read.parquet(verdicts).count() == len(EXPECTED)
    # snapshot holds one keeper per distinct content, never reassigned
    snap = {
        r.snap_keeper for r in spark.read.parquet(snapshot).collect()
    }
    assert snap == {1, 2, 7, 12}


def test_in_stream_watermark_dedup(spark, tmp_path):
    """The redelivered row is dropped by dropDuplicatesWithinWatermark
    BEFORE the snapshot probe — asserted on the deduped stream itself
    (memory sink), not via the merge's suppression."""
    landing, *_ = _paths(tmp_path)
    _land(spark, landing, BATCHES)
    stream = deduped_document_stream(read_document_stream(spark, landing))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select doc_id, count(*) as n from dedup_probe group by doc_id")
    assert {r.doc_id: r.n for r in rows.collect()} == {d: 1 for d in EXPECTED}


def test_replay_single_batch_is_noop(spark, tmp_path):
    """Redelivery of an already-drained micro-batch (checkpoint loss on
    ONE file) must leave snapshot and verdict log unchanged."""
    landing, snapshot, verdicts, ckpt = _paths(tmp_path)
    _land(spark, landing, BATCHES)
    _drain(spark, landing, snapshot, verdicts, ckpt)

    before_v = _verdict_map(spark, verdicts)
    before_s = sorted(
        (r.content_hash, r.snap_keeper)
        for r in spark.read.parquet(snapshot).collect()
    )
    replay = spark.read.parquet(os.path.join(landing, "batch-1.parquet"))
    curate_batch(spark, replay, snapshot, verdicts)

    assert _verdict_map(spark, verdicts) == before_v
    assert (
        sorted(
            (r.content_hash, r.snap_keeper)
            for r in spark.read.parquet(snapshot).collect()
        )
        == before_s
    )


def test_restart_without_checkpoint_is_noop(spark, tmp_path):
    """Losing the WHOLE checkpoint replays every landed file; the keyed
    merges absorb the full replay — same end state, keepers stable."""
    landing, snapshot, verdicts, ckpt = _paths(tmp_path)
    _land(spark, landing, BATCHES)
    _drain(spark, landing, snapshot, verdicts, ckpt)
    before = _verdict_map(spark, verdicts)

    _drain(spark, landing, snapshot, verdicts, str(tmp_path / "ckpt2"))
    assert _verdict_map(spark, verdicts) == before


def test_crash_between_merges_recovers(spark, tmp_path):
    """Crash AFTER the verdict merge but BEFORE the snapshot advance
    (the one non-atomic seam inside curate_batch): replaying the batch
    must finish the snapshot without duplicating verdicts."""
    landing, snapshot, verdicts, ckpt = _paths(tmp_path)
    _land(spark, landing, [BATCHES[0]])
    _drain(spark, landing, snapshot, verdicts, ckpt)

    # simulate the torn state for a second batch: verdicts written,
    # snapshot not yet advanced
    from idh_etl_demo_spark.operators.dedup import (
        normalize_text,
        snapshot_dedup_status,
    )
    from idh_etl_demo_spark.operators.merge import merge_insert_if_absent

    batch = spark.createDataFrame(
        BATCHES[1], "doc_id long, text string, event_ts timestamp"
    )
    hashed = batch.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    snap = spark.read.parquet(snapshot)
    torn = snapshot_dedup_status(hashed, snap).localCheckpoint()
    merge_insert_if_absent(
        spark, torn.select("doc_id", "status", "keeper_id"), verdicts, ["doc_id"]
    )
    # ...crash here: doc 12's keeper row never reached the snapshot

    curate_batch(spark, batch, snapshot, verdicts)  # the retry
    assert _verdict_map(spark, verdicts) == EXPECTED
    assert {
        r.snap_keeper for r in spark.read.parquet(snapshot).collect()
    } == {1, 2, 7, 12}
