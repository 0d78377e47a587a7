"""Scalar column-expression library.

Every row-at-a-time Python function in the reference (pd.Series.apply /
df.apply) is re-expressed here as a native Catalyst column expression —
JVM-side, whole-stage-codegen friendly, no Python in the hot path
(SURVEY §2.9). A ``pandas_udf`` escape hatch exists only in
``operators.multimodal`` where Python is genuinely unavoidable.
"""

from idh_etl_demo_spark.functions.delays import normalized_delay_minutes, hour_floor
from idh_etl_demo_spark.functions.timeutils import (
    month_name,
    season,
    time_of_day,
    weekday_name,
    weekday_num,
    is_business_day,
    time_dim_id,
)
from idh_etl_demo_spark.functions.weather import (
    weather_id,
    fall_type,
    comfort_score,
    general_circumstances,
)
from idh_etl_demo_spark.functions.hashing import md5_long, minhash_signature

__all__ = [
    "normalized_delay_minutes",
    "hour_floor",
    "month_name",
    "season",
    "time_of_day",
    "weekday_name",
    "weekday_num",
    "is_business_day",
    "time_dim_id",
    "weather_id",
    "fall_type",
    "comfort_score",
    "general_circumstances",
    "md5_long",
    "minhash_signature",
]
