"""Structured Streaming ingest: file-stream cleansing shares the batch code
path; foreachBatch upsert keeps the keyed idempotency; windowed agg with
watermark handles the hourly grain (SURVEY §2.8)."""

from __future__ import annotations

import os

from idh_etl_demo_spark.streaming.stream import (
    hourly_delay_counts,
    read_delay_stream,
    stream_delays_to_table,
)

HEADER = "Timestamp,Delay,Route,Stop Name,Vehicle No\n"
BATCH_1 = HEADER + (
    "2024-12-25T07:14:05,7 min,1,Plac,v100\n"
    "2024-12-25T07:40:00,3 min przed czasem,1,Brama,v101\n"
    "2024-12-25T08:02:30,0 min,2,Dworzec,v103\n"
)
BATCH_2 = HEADER + (
    "2024-12-25T08:02:30,0 min,2,Dworzec,v103\n"  # duplicate re-delivery
    "2024-12-25T08:30:00,5 min,2,Dworzec,v109\n"
)


def test_stream_ingest_idempotent(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "delays_table")
    ckpt = str(tmp_path / "ckpt")

    (landing / "b1.csv").write_text(BATCH_1)
    q = stream_delays_to_table(spark, str(landing), target, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 3

    # second file: one duplicate row + one new → exactly one appended
    (landing / "b2.csv").write_text(BATCH_2)
    q = stream_delays_to_table(spark, str(landing), target, ckpt)
    q.awaitTermination(120)
    df = spark.read.parquet(target)
    assert df.count() == 4
    # cleansing ran inside the stream: signed minutes, hour-floored ts
    rows = {(str(r["Timestamp"]), r["Delay"]) for r in df.collect()}
    assert ("2024-12-25 07:00:00", -3) in rows
    assert ("2024-12-25 08:00:00", 5) in rows


def test_stream_dedup_within_watermark(spark, tmp_path):
    from idh_etl_demo_spark.streaming.stream import deduped_delay_stream

    landing = tmp_path / "landing3"
    landing.mkdir()
    # one batch containing the same row three times + two distinct rows
    (landing / "b.csv").write_text(
        HEADER
        + "2024-12-25T07:14:05,7 min,1,Plac,v100\n" * 3
        + "2024-12-25T07:40:00,3 min przed czasem,1,Brama,v101\n"
    )
    stream = deduped_delay_stream(read_delay_stream(spark, str(landing)))
    q = (
        stream.writeStream.format("memory")
        .queryName("deduped_delays")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from deduped_delays").collect()
    assert len(rows) == 2  # triplicate collapsed in-stream


def test_stream_stream_join(spark, tmp_path, ztm_root):
    from idh_etl_demo_spark.plans.inputs import clean_weather
    from idh_etl_demo_spark.schemas import WEATHER_RAW_SCHEMA
    from idh_etl_demo_spark.streaming.stream import delay_weather_stream_join
    import pyspark.sql.functions as F

    delays_landing = tmp_path / "d_landing"
    delays_landing.mkdir()
    (delays_landing / "b.csv").write_text(BATCH_1)
    delays = read_delay_stream(spark, str(delays_landing))

    # weather stream from the shared ZTM fixture day (covers hours 7/8)
    weather_raw = (
        spark.readStream.schema(WEATHER_RAW_SCHEMA)
        .option("header", True)
        .csv(f"{ztm_root}/weather/2024/12/25")
    )
    weather = clean_weather(weather_raw, streaming=True).withColumn(
        "weather_hour",
        F.to_timestamp(F.substring(F.col("id"), 7, 13), "yyyy-MM-dd-HH"),
    )
    joined = delay_weather_stream_join(delays, weather)
    q = (
        joined.writeStream.format("memory")
        .queryName("delay_weather")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from delay_weather").collect()
    assert len(rows) == 3  # all three delay rows have a weather hour
    by_route = {(str(r.Timestamp), r.Route): r.temperature for r in rows}
    assert ("2024-12-25 07:00:00", "1") in by_route
    assert all(r.general_circumstances is not None for r in rows)


def test_windowed_aggregation_shape(spark, tmp_path):
    landing = tmp_path / "landing2"
    landing.mkdir()
    (landing / "b1.csv").write_text(BATCH_1)
    stream = read_delay_stream(spark, str(landing))
    agg = hourly_delay_counts(stream)
    out_dir = str(tmp_path / "agg_out")
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.hour_start), r.Route): (r.n_delays, r.avg_delay_mins)
        for r in spark.sql("select * from hourly_counts").collect()
    }
    assert got[("2024-12-25 07:00:00", "1")][0] == 2
    assert got[("2024-12-25 07:00:00", "1")][1] == 2.0  # (7 + -3) / 2
    assert got[("2024-12-25 08:00:00", "2")] == (1, 0.0)
