"""Calendar derivations for TimeDim.

Replaces the reference's Python month map / season / time-of-day helpers
(reference: src/time_utils.py:3-57) and the per-run time row synthesis
(reference: dags/idh_etl.py:74-89) with column expressions.

Parity notes (SURVEY §7 hard part 3):
- ``weekday`` is the UPPERCASE English day name (the reference emits
  pendulum enum names like ``WEDNESDAY``).
- ``weekday_num`` is ISO: Monday=1.
- locale: day/month names come from ``date_format`` which is locale-stable
  (English) under the JVM default we pin in tests.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def time_dim_id(ts: Column) -> Column:
    """Day-grain surrogate id int(YYYYMMDD).

    Deliberately day-grain while rows are hourly — reproduces the
    reference's grain quirk (reference: dags/idh_etl.py:77; SURVEY §1.3).
    """
    return F.date_format(ts, "yyyyMMdd").cast("long")


def weekday_name(ts: Column) -> Column:
    return F.upper(F.date_format(ts, "EEEE"))


def weekday_num(ts: Column) -> Column:
    """Monday=1 … Sunday=7 (reference: dags/idh_etl.py:81)."""
    return (F.weekday(ts) + F.lit(1)).cast("long")


def is_business_day(ts: Column) -> Column:
    return F.weekday(ts) < F.lit(5)


def month_name(ts: Column) -> Column:
    return F.date_format(ts, "MMMM")


def season(month_num: Column) -> Column:
    """12/1/2→winter, 3-5→spring, 6-8→summer, 9-11→autumn
    (reference: src/time_utils.py:26-36)."""
    return (
        F.when(month_num.isin(12, 1, 2), "winter")
        .when(month_num.isin(3, 4, 5), "spring")
        .when(month_num.isin(6, 7, 8), "summer")
        .otherwise("autumn")
    )


def time_of_day(hour: Column) -> Column:
    """6-9→morning, 10-13→midday, 14-17→afternoon, 18-22→evening, else night
    (reference: src/time_utils.py:47-57)."""
    return (
        F.when((hour >= 6) & (hour <= 9), "morning")
        .when((hour >= 10) & (hour <= 13), "midday")
        .when((hour >= 14) & (hour <= 17), "afternoon")
        .when((hour >= 18) & (hour <= 22), "evening")
        .otherwise("night")
    )
