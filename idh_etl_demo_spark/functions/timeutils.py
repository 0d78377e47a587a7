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


# fixed English names, mirroring the reference's literal maps
# (reference: src/time_utils.py:3-16) — a CASE over dayofweek/month instead
# of date_format('EEEE'/'MMMM') so a non-English default JVM locale on some
# cluster can't silently change the dimension strings.
_WEEKDAYS = ["MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY", "SATURDAY", "SUNDAY"]
_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]


def _case_map(key: Column, names: list[str], start: int = 0) -> Column:
    expr = F.when(key == F.lit(start), names[0])
    for i, n in enumerate(names[1:], 1):
        expr = expr.when(key == F.lit(start + i), n)
    return expr.otherwise(F.lit(None))


def weekday_name(ts: Column) -> Column:
    return _case_map(F.weekday(ts), _WEEKDAYS)


def weekday_num(ts: Column) -> Column:
    """Monday=1 … Sunday=7 (reference: dags/idh_etl.py:81)."""
    return (F.weekday(ts) + F.lit(1)).cast("long")


def is_business_day(ts: Column) -> Column:
    return F.weekday(ts) < F.lit(5)


def month_name(ts: Column) -> Column:
    return _case_map(F.month(ts), _MONTHS, start=1)


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
