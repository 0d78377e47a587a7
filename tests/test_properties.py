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


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 3),
)
def test_k_core_matches_python_peeling(spark, edges, k):
    from idh_etl_demo_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.degree for r in k_core(df, k=k, max_iterations=40).collect()}

    # pure-python reference: normalize, then peel to fixpoint
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es2 = {(a, b) for a, b in es if a in keep and b in keep}
        if es2 == es:
            break
        es = es2
    want: dict[int, int] = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400_000)),  # (key, minutes)
        min_size=1,
        max_size=60,
    )
)
def test_gap_fill_spine_is_dense_and_filled(spark, rows):
    """Structural properties of the gap-fill shape: per key the hour
    spine is contiguous min..max, observed hours keep their value, and
    every filled row carries the most recent earlier observation."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), 1.0) for k, m in rows],
        "k int, ts timestamp, value double",
    )
    hourly = df.groupBy(
        "k", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))
    bounds = hourly.groupBy("k").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        "k",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    w = Window.partitionBy("k").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = (
        spine.join(hourly, ["k", "h"], "left")
        .select(
            "k",
            "h",
            F.last("v", ignorenulls=True).over(w).alias("filled"),
            F.col("n").isNull().alias("is_filled"),
        )
        .orderBy("k", "h")
        .collect()
    )
    per_key: dict[int, list] = {}
    for r in out:
        per_key.setdefault(r.k, []).append(r)
    for k, rs in per_key.items():
        hours = [r.h for r in rs]
        assert hours == sorted(hours)
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600  # dense spine
        assert rs[0].is_filled is False  # spine starts at an observation
        last_seen = None
        for r in rs:
            if not r.is_filled:
                last_seen = r.filled
            else:
                assert r.filled == last_seen  # forward fill carries last
