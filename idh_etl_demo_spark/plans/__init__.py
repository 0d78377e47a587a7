from idh_etl_demo_spark.plans.inputs import (
    clean_delays,
    clean_weather,
    build_time_dim_rows,
)
from idh_etl_demo_spark.plans.star import (
    build_line_dim,
    build_stop_dim,
    build_vehicle_dim,
    build_weather_dim,
    build_time_dim,
    build_delay_fact,
    TABLES,
    TableSpec,
)

__all__ = [
    "clean_delays",
    "clean_weather",
    "build_time_dim_rows",
    "build_line_dim",
    "build_stop_dim",
    "build_vehicle_dim",
    "build_weather_dim",
    "build_time_dim",
    "build_delay_fact",
    "TABLES",
    "TableSpec",
]
