"""Property-based tests (hypothesis): each example generates a whole batch
and runs ONE Spark job comparing the column expression against a pure
Python reference implementation."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from idh_etl_demo_spark.functions.delays import normalized_delay_minutes
from idh_etl_demo_spark.functions.weather import comfort_score, general_circumstances
from idh_etl_demo_spark.operators.dedup import dedup_keep_first

SETTINGS = dict(max_examples=8, deadline=None)


def _py_circumstances(temp, wind, hum, precip):
    score = 0
    if 10 <= temp <= 25:
        score += 2
    elif 2 <= temp < 10:
        score += 1
    elif temp < 2 or temp > 35:
        score -= 1
    if wind < 5:
        score += 2
    elif wind < 10:
        score += 1
    elif wind > 15:
        score -= 1
    if hum < 70:
        score += 1
    elif hum > 90:
        score -= 1
    if precip == 0:
        score += 2
    elif precip > 5:
        score -= 1
    for bound, label in [
        (6, "ludicrously-divine"),
        (4, "titanically-passable"),
        (2, "nobly-sufficient"),
        (0, "courageously-subpar"),
    ]:
        if score >= bound:
            return label
    return "opera-level-atrocious"


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 500), st.booleans()), min_size=1, max_size=50))
def test_delay_parser_roundtrip(spark, batch):
    rows = [
        (f"{n} min przed czasem" if early else f"{n} min",) for n, early in batch
    ]
    out = [
        r[0]
        for r in spark.createDataFrame(rows, "d string")
        .select(normalized_delay_minutes(F.col("d")))
        .collect()
    ]
    want = [-n if early else n for n, early in batch]
    assert out == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(-40, 45, allow_nan=False),
            st.floats(0, 40, allow_nan=False),
            st.floats(0, 100, allow_nan=False),
            st.integers(0, 20),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_circumstances_matches_python_reference(spark, batch):
    col = general_circumstances(
        comfort_score(F.col("t"), F.col("w"), F.col("h"), F.col("p"))
    )
    out = [
        r[0]
        for r in spark.createDataFrame(batch, "t double, w double, h double, p int")
        .select(col)
        .collect()
    ]
    want = [_py_circumstances(*row) for row in batch]
    assert out == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)),
        min_size=1,
        max_size=60,
    )
)
def test_dedup_keep_first_is_deterministic_min(spark, batch):
    df = spark.createDataFrame(batch, "k int, v int")
    out = {
        r.k: r.v
        for r in dedup_keep_first(df, ["k"], order_by=[F.asc("v")]).collect()
    }
    want = {}
    for k, v in batch:
        want[k] = min(want.get(k, v), v)
    assert out == want


@settings(**SETTINGS)
@given(st.lists(st.integers(-5, 5), min_size=1, max_size=80))
def test_mode_tiebreak_highest_value(spark, values):
    from idh_etl_demo_spark.operators.mode import mode_per_group

    df = spark.createDataFrame([(1, v) for v in values], "g int, v int")
    got = mode_per_group(df, ["g"], "v", "m").collect()[0].m
    freq: dict[int, int] = {}
    for v in values:
        freq[v] = freq.get(v, 0) + 1
    top = max(freq.values())
    want = max(v for v, c in freq.items() if c == top)  # ties → highest value
    assert got == want


def test_percentile_approx_rank_error_bound(spark):
    """At production accuracy A, percentile_approx guarantees rank error
    <= n/A (Greenwald-Khanna). The sketch path must stay within that
    bound where the exact path would have sorted everything."""
    import pyspark.sql.functions as F

    n, acc = 5000, 100
    vals = [((i * 2654435761) % n) * 1.0 for i in range(n)]  # a permutation
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for p in (0.25, 0.5, 0.9):
        got = df.select(F.percentile_approx("x", p, acc)).first()[0]
        rank = sorted(vals).index(got)
        assert abs(rank - p * n) <= n / acc + 1, (p, got, rank)
