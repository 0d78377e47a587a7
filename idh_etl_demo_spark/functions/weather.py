"""Weather-feed business expressions.

Replaces the reference's pandas transformations and row-wise classifiers
(reference: src/weather.py:11-48, 67-106) with column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def weather_id(station_id: Column, measurement_date: Column, hour: Column) -> Column:
    """``<station>-<YYYY-MM-DD>-<HH>`` with zero-padded hour
    (reference: src/weather.py:67-74)."""
    return F.concat_ws(
        "-",
        station_id.cast("string"),
        measurement_date.cast("string"),
        F.lpad(hour.cast("long").cast("string"), 2, "0"),
    )


def fall_type(temperature: Column) -> Column:
    """snow below 2.0 °C, else rain (reference: src/weather.py:11-12)."""
    return F.when(temperature < 2.0, "snow").otherwise("rain")


def comfort_score(temp: Column, wind: Column, humidity: Column, precip: Column) -> Column:
    """Additive comfort score over weather bands
    (reference: src/weather.py:15-38). Pure integer arithmetic — a single
    codegen'd projection, no UDF."""
    temp_pts = (
        F.when((temp >= 10) & (temp <= 25), 2)
        .when((temp >= 2) & (temp < 10), 1)
        .when((temp < 2) | (temp > 35), -1)
        .otherwise(0)
    )
    wind_pts = (
        F.when(wind < 5, 2).when(wind < 10, 1).when(wind > 15, -1).otherwise(0)
    )
    hum_pts = F.when(humidity < 70, 1).when(humidity > 90, -1).otherwise(0)
    precip_pts = F.when(precip == 0, 2).when(precip > 5, -1).otherwise(0)
    return (temp_pts + wind_pts + hum_pts + precip_pts).cast("long")


def general_circumstances(score: Column) -> Column:
    """Score → label bands (reference: src/weather.py:39-48)."""
    return (
        F.when(score >= 6, "ludicrously-divine")
        .when(score >= 4, "titanically-passable")
        .when(score >= 2, "nobly-sufficient")
        .when(score >= 0, "courageously-subpar")
        .otherwise("opera-level-atrocious")
    )
