"""Delay-feed cleansing expressions.

Replaces the reference's row-wise parsers (reference: src/delays.py:27-36)
with pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def normalized_delay_minutes(delay_str: Column) -> Column:
    """Parse the feed's Polish delay strings to signed minutes.

    ``"7 min"`` → 7; ``"3 min przed czasem"`` ("ahead of schedule") → -3;
    ``"0 min"`` → 0.  (reference: src/delays.py:27-30)
    """
    sign = F.when(delay_str.contains("min przed czasem"), F.lit(-1)).otherwise(F.lit(1))
    magnitude = F.regexp_extract(delay_str, r"(-?\d+)", 1).cast("long")
    return (sign * magnitude).alias("delay_mins")


def hour_floor(ts: Column) -> Column:
    """Truncate a timestamp (or parseable string) to the hour so delay rows
    join to hourly TimeDim / weather keys.  (reference: src/delays.py:33-36)
    """
    return F.date_trunc("hour", ts.cast("timestamp"))
