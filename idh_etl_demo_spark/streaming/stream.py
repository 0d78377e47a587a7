"""Structured Streaming ingest — the continuous-processing equivalent of
the hourly batch loop (SURVEY §2.8; optional stretch in §7 phase 6).

``stream_delays_to_fact`` watches the delays landing directory as a file
stream, applies the same cleansing expressions as the batch path (one code
path for both via plans.inputs.clean_delays), windows late data with a
watermark, and upserts each micro-batch through the same keyed left-anti
merge in ``foreachBatch`` — so batch replay and streaming ingest share
identical idempotency semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.merge import merge_insert_if_absent
from idh_etl_demo_spark.plans.inputs import clean_delays
from idh_etl_demo_spark.schemas import DELAYS_RAW_SCHEMA


def read_delay_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    raw = (
        spark.readStream.schema(DELAYS_RAW_SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", 16)
        .csv(landing_dir)
    )
    return clean_delays(raw)


def hourly_delay_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window aggregation with late-data watermark — the
    streaming analogue of the reference's hourly micro-batch grain."""
    return (
        stream.withWatermark("Timestamp", watermark)
        .groupBy(F.window("Timestamp", "1 hour").alias("w"), F.col("Route"))
        .agg(
            F.count(F.lit(1)).alias("n_delays"),
            F.avg("Delay").alias("avg_delay_mins"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "Route",
            "n_delays",
            "avg_delay_mins",
        )
    )


def deduped_delay_stream(
    stream: DataFrame,
    keys: list[str] = ("Timestamp", "Route", "Stop Name", "Vehicle No"),
    watermark: str = "2 hours",
) -> DataFrame:
    """In-stream duplicate suppression: duplicates arriving within the
    watermark horizon are dropped by the engine's state store, so the
    downstream merge only re-checks LATE duplicates (state stays bounded —
    the watermark is what makes streaming dedup feasible at scale)."""
    return stream.withWatermark("Timestamp", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def delay_weather_stream_join(
    delays: DataFrame,
    weather: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each delay row enriched with the weather
    observation of its hour, both sides unbounded streams.

    Both sides carry watermarks and the join condition includes an hour
    EQUALITY on event time, so the state store can expire rows once the
    watermark passes — bounded state, the requirement for an unbounded
    stream-stream join at scale.

    ``weather`` is the cleansed hourly frame (plans.inputs.clean_weather
    applied to a weather file stream) extended with ``weather_hour``
    (timestamp of the observation hour).
    """
    d = delays.withWatermark("Timestamp", watermark).alias("d")
    w = weather.withWatermark("weather_hour", watermark).alias("w")
    return d.join(
        w,
        F.expr('d.Timestamp = w.weather_hour'),
        "inner",
    ).select(
        "d.Timestamp",
        "d.Delay",
        "d.Route",
        "w.temperature",
        "w.general_circumstances",
    )


def stream_delays_to_table(
    spark: SparkSession,
    landing_dir: str,
    target_path: str,
    checkpoint_dir: str,
    keys: list[str] = ("Timestamp", "Route", "Stop Name", "Vehicle No"),
):
    """Continuous idempotent ingest: every micro-batch goes through the
    same insert-if-absent merge as the batch loop."""
    stream = read_delay_stream(spark, landing_dir)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        merge_insert_if_absent(spark, batch, target_path, list(keys))

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
