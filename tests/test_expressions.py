"""Unit tests for the scalar expression library — the band edges and
Polish-string cases SURVEY §5 calls out."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from idh_etl_demo_spark.functions.delays import hour_floor, normalized_delay_minutes
from idh_etl_demo_spark.functions.timeutils import season, time_of_day
from idh_etl_demo_spark.functions.weather import (
    comfort_score,
    fall_type,
    general_circumstances,
    weather_id,
)


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_delay_parsing(spark):
    rows = [("7 min",), ("3 min przed czasem",), ("0 min",), ("12 min",), ("1 min przed czasem",)]
    out = _eval(spark, normalized_delay_minutes(F.col("d")), rows, "d string")
    assert out == [7, -3, 0, 12, -1]


def test_hour_floor(spark):
    rows = [("2024-12-25T07:14:05",), ("2024-12-25 23:59:59",), ("2024-12-25T00:00:00",)]
    out = _eval(spark, hour_floor(F.col("t")), rows, "t string")
    assert [str(x) for x in out] == [
        "2024-12-25 07:00:00",
        "2024-12-25 23:00:00",
        "2024-12-25 00:00:00",
    ]


def test_season_boundaries(spark):
    rows = [(m,) for m in range(1, 13)]
    out = _eval(spark, season(F.col("m")), rows, "m int")
    assert out == ["winter", "winter", "spring", "spring", "spring", "summer",
                   "summer", "summer", "autumn", "autumn", "autumn", "winter"]


def test_time_of_day_boundaries(spark):
    rows = [(h,) for h in [5, 6, 9, 10, 13, 14, 17, 18, 22, 23, 0]]
    out = _eval(spark, time_of_day(F.col("h")), rows, "h int")
    assert out == ["night", "morning", "morning", "midday", "midday", "afternoon",
                   "afternoon", "evening", "evening", "night", "night"]


def test_fall_type_edge(spark):
    rows = [(1.9,), (2.0,), (2.1,), (-5.0,)]
    out = _eval(spark, fall_type(F.col("t")), rows, "t double")
    assert out == ["snow", "rain", "rain", "snow"]


@pytest.mark.parametrize(
    "temp,wind,hum,precip,label",
    [
        (15.0, 1.0, 50.0, 0, "ludicrously-divine"),       # 2+2+1+2 = 7
        (15.0, 7.0, 50.0, 0, "ludicrously-divine"),       # 2+1+1+2 = 6
        (5.0, 7.0, 50.0, 0, "titanically-passable"),      # 1+1+1+2 = 5
        (5.0, 12.0, 80.0, 0, "nobly-sufficient"),         # 1+0+0+2 = 3
        (2.0, 12.0, 80.0, 1, "courageously-subpar"),      # 1+0+0+0 = 1
        (1.0, 16.0, 95.0, 9, "opera-level-atrocious"),    # -1-1-1-1 = -4
        (36.0, 16.0, 95.0, 9, "opera-level-atrocious"),   # hot counts against
    ],
)
def test_general_circumstances_bands(spark, temp, wind, hum, precip, label):
    rows = [(temp, float(wind), hum, precip)]
    col = general_circumstances(
        comfort_score(F.col("t"), F.col("w"), F.col("h"), F.col("p"))
    )
    out = _eval(spark, col, rows, "t double, w double, h double, p int")
    assert out == [label]


def test_weather_id_zero_pad(spark):
    rows = [("12375", "2024-12-25", 3), ("12375", "2024-12-25", 15)]
    col = weather_id(F.col("s"), F.col("d"), F.col("h"))
    out = _eval(spark, col, rows, "s string, d string, h int")
    assert out == ["12375-2024-12-25-03", "12375-2024-12-25-15"]


def test_weekday_month_names_locale_independent(spark):
    """Names come from CASE maps over weekday()/month(), not
    date_format under the JVM locale — every weekday and month emits the
    reference's fixed English strings (reference: src/time_utils.py:3-16)."""
    from idh_etl_demo_spark.functions.timeutils import month_name, weekday_name

    # 2024-01-01 is a Monday; first of each month covers all 12 months
    days = [(f"2024-01-{d:02d}",) for d in range(1, 8)]
    out = _eval(
        spark, weekday_name(F.to_timestamp(F.col("d"))), days, "d string"
    )
    assert out == [
        "MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY", "SATURDAY", "SUNDAY",
    ]
    months = [(f"2024-{m:02d}-01",) for m in range(1, 13)]
    out = _eval(spark, month_name(F.to_timestamp(F.col("d"))), months, "d string")
    assert out == [
        "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November", "December",
    ]


def test_session_pins_jvm_locale(spark):
    """Defense for any remaining date_format name pattern: the session
    factory pins user.language/user.country on driver and executors."""
    from idh_etl_demo_spark.session import get_spark

    s = get_spark()
    for key in ("spark.driver.extraJavaOptions", "spark.executor.extraJavaOptions"):
        opts = s.conf.get(key, "")
        assert "-Duser.language=en" in opts, f"{key} missing locale pin: {opts!r}"
