from idh_etl_demo_spark.streaming.runner import run_hour, run_day

__all__ = ["run_hour", "run_day"]
