"""Round-11c property tests: the feature/validation batch pinned
against pure-Python twins on PLANTED data, plus full DuckDB-oracle
parity on the planted tables.

- EWMA: the sequential fold must match a Python twin computing the
  identical IEEE steps in the identical (ts, event_id) order —
  bit-for-bit (== on doubles, no tolerance), including a user whose
  rows are written out of time order (the sort is load-bearing) and a
  single-event user (seed-only fold).
- Profile: every cell must match a pandas twin on a frame that
  actually CONTAINS nulls and duplicate values (testdata is null-free,
  so this planted frame is the null path's only exerciser).
"""

from __future__ import annotations

import datetime as dt

import duckdb

from tests.compare import assert_frames_equal


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority) — nullable columns stay nullable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], type=pa.string()),
            "o_totalprice": pa.array(
                [r[3] for r in rows], type=pa.float64()
            ),
            "o_orderdate": pa.array(
                [r[4] for r in rows], type=pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                [r[5] for r in rows], type=pa.string()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _oracle_df(sf, table, entry):
    con = duckdb.connect()
    con.execute(
        f"create view {table} as select * from "
        f"read_parquet('{sf}/{table}.parquet')"
    )
    return con.execute(entry.oracle).df()


# ---------------------------------------------------------------------------
# Per-user EWMA
# ---------------------------------------------------------------------------


def test_user_ewma_twin_bit_exact(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    # user 1: five events WRITTEN out of time order — the fold must
    # sort, not trust file order; values chosen so every step rounds
    # (0.1 is inexact in binary: associativity errors would show)
    rows = [
        (4, base + dt.timedelta(minutes=40), 1, "view", 0.7),
        (0, base + dt.timedelta(minutes=0), 1, "view", 0.1),
        (3, base + dt.timedelta(minutes=30), 1, "click", 13.37),
        (1, base + dt.timedelta(minutes=10), 1, "view", 0.3),
        (2, base + dt.timedelta(minutes=20), 1, "view", 2.9),
        # user 2: single event — seed-only fold, ewma == value
        (5, base, 2, "view", 123.456),
        # user 3: two events at DIFFERENT ts, reversed write order
        (7, base + dt.timedelta(seconds=1), 3, "view", 1.0),
        (6, base, 3, "view", 100.0),
    ]
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_user_ewma"]
    got = (
        entry.spark(spark, sf).toPandas().set_index("user_id", drop=False)
    )
    assert_frames_equal(
        got.reset_index(drop=True), _oracle_df(sf, "events", entry)
    )

    # Python twin: identical IEEE steps in identical order
    seqs = {}
    for eid, ts, uid, _, val in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        seqs.setdefault(uid, []).append(val)
    for uid, vals in seqs.items():
        s = None
        for v in vals:
            s = v if s is None else 0.5 * v + 0.5 * s
        r = got.loc[uid]
        assert r.ewma == s, uid  # bit-for-bit, no tolerance
        assert r.last_value == vals[-1], uid
        assert r.n_events == len(vals), uid
        import math

        assert r.ewma_upm == math.floor(s * 1000000), uid

    assert got.loc[2].ewma == 123.456  # seed-only fold
    # user 3: decay must weight the LATER event: 0.5*1.0 + 0.5*100.0
    assert got.loc[3].ewma == 0.5 * 1.0 + 0.5 * 100.0


# ---------------------------------------------------------------------------
# Orders profile
# ---------------------------------------------------------------------------


def test_orders_profile_twin_with_nulls(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401
    from idh_etl_demo_spark.catalog_r11c import _PROFILE_COLS

    d = dt.datetime(1997, 6, 1)
    rows = [
        (1, 10, "O", 100.0, d, "1-URGENT"),
        (2, 10, "O", 100.0, d, "2-HIGH"),  # dup custkey, price, date
        (3, None, "F", 250.5, dt.datetime(1998, 1, 2), None),  # nulls
        (4, 11, None, None, None, "2-HIGH"),  # more nulls
        (5, None, "F", 250.5, d, "3-MEDIUM"),
    ]
    sf = _write_orders(tmp_path, rows)
    entry = ENTRIES["orders_profile"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "orders", entry))

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=_PROFILE_COLS)
    n = len(pdf)
    g = got.set_index("col_name")
    for c in _PROFILE_COLS:
        nn = int(pdf[c].isna().sum())
        nd = int(pdf[c].dropna().nunique())
        r = g.loc[c]
        assert r.n_rows == n, c
        assert r.n_nulls == nn, c
        assert r.n_distinct == nd, c
        assert r.null_ppm == nn * 1000000 // n, c
        assert r.distinct_ppm == nd * 1000000 // n, c
    # the planted frame must actually exercise the null path
    assert g.n_nulls.sum() >= 5


# ---------------------------------------------------------------------------
# Edit-distance title near-dup
# ---------------------------------------------------------------------------


def _write_documents(tmp_path, rows):
    """rows: (doc_id, text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows), type=pa.string()),
            "source": pa.array(["web"] * len(rows), type=pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in rows],
                type=pa.int64(),
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _lev(a: str, b: str) -> int:
    """Hand-rolled full DP twin (no banding — the independent route)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _norm_title(text: str) -> str:
    import re

    return re.sub(r"[ \t\n\f\r]+", " ", text.lower())[:64]


def test_title_edit_neardup_twin_and_boundary(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401
    from idh_etl_demo_spark.catalog_r11c import _ED_K, _ED_MINLEN, _ED_Q

    base = "the quick brown fox jumps over the lazy dog near the old river"
    assert len(base) == 62
    e8 = list(base)
    for idx, ch in zip((2, 9, 17, 25, 33, 41, 49, 57), "01234567"):
        e8[idx] = ch
    e9 = list(e8)
    e9[60] = "8"
    rows = [
        (1, base),
        (2, base),  # exact duplicate → ed 0
        (3, base[:30] + "x" + base[31:]),  # one substitution → ed 1
        (4, "".join(e8)),  # exactly k edits → kept at the boundary
        (5, "".join(e9)),  # k+1 edits → dropped
        (6, "completely different content about spark shuffle partitions!!"),
        (7, "tiny text"),  # below the domain length → excluded
        # normalization: tabs/newlines/case collapse to EXACTLY base
        (8, "The  QUICK\tbrown fox\n\njumps over the lazy dog near the old river"),
    ]
    sf = _write_documents(tmp_path, rows)
    entry = ENTRIES["doc_title_edit_neardup"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "documents", entry))

    # twin: brute force over the normalized domain
    titles = {i: _norm_title(t) for i, t in rows if t is not None}
    titles = {i: t for i, t in titles.items() if len(t) >= _ED_MINLEN}
    assert 7 not in titles  # the domain guard actually excluded it
    ids = sorted(titles)
    twin = {}
    for ia in ids:
        for ib in ids:
            if ia >= ib:
                continue
            ed = _lev(titles[ia], titles[ib])
            if ed <= _ED_K:
                ga = {titles[ia][p : p + _ED_Q]
                      for p in range(len(titles[ia]) - _ED_Q + 1)}
                gb = {titles[ib][p : p + _ED_Q]
                      for p in range(len(titles[ib]) - _ED_Q + 1)}
                twin[(ia, ib)] = (len(ga & gb), ed)
    got_rel = {
        (r.id_a, r.id_b): (r.shared_grams, r.ed)
        for r in got.itertuples(index=False)
    }
    assert got_rel == twin
    # the planted geometry actually happened
    assert twin[(1, 2)][1] == 0
    assert twin[(1, 8)][1] == 0  # normalization equality
    assert twin[(1, 3)][1] == 1
    assert twin[(1, 4)][1] == _ED_K  # the kept boundary
    assert (1, 5) not in twin  # k+1 dropped
    assert _lev(titles[1], titles[5]) == _ED_K + 1
    assert (1, 6) not in twin


# ---------------------------------------------------------------------------
# Streaming exactly-once dedup
# ---------------------------------------------------------------------------


def test_streaming_dedup_recovers_exactly_once(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c as r11c

    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    # ids divisible by 7 and 11 guarantee both injection patterns fire,
    # including the 77 overlap (doubled in-batch AND redelivered later)
    rows = []
    for eid in range(0, 100):
        rows.append(
            (
                eid,
                base + dt.timedelta(minutes=eid * 30),
                eid % 5,
                "view" if eid % 2 == 0 else "click",
                float(eid) + 0.25,
            )
        )
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_streaming_dedup"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "events", entry))
    assert len(got) == len(rows)  # exactly-once: nothing extra, nothing lost

    # the replay genuinely contained duplicates: inspect the landing dir
    import os

    out = r11c._SDD_RESULTS[(spark.sparkContext.applicationId, sf)]
    landing = os.path.join(os.path.dirname(out), "landing")
    landed = spark.read.parquet(landing).toPandas()
    n_doubled = sum(1 for eid, *_ in rows if eid % 11 == 0)
    n_redelivered = sum(1 for eid, *_ in rows if eid % 7 == 0)
    assert len(landed) == len(rows) + n_doubled + n_redelivered
    dup_counts = landed.groupby("event_id").size()
    assert (dup_counts[[e for e in range(100) if e % 77 == 0]] == 3).all()
    assert (
        dup_counts[[e for e in range(100) if e % 7 != 0 and e % 11 != 0]] == 1
    ).all()
    # the final landed file is all-duplicate (batch 2's redeliveries)
    batch3 = spark.read.parquet(os.path.join(landing, "batch-3.parquet"))
    b3 = batch3.toPandas()
    assert len(b3) > 0 and (b3.event_id % 7 == 0).all()


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_mg_update_undercount_bound():
    """Pure-python unit: weighted MG undercounts any item by at most
    n/(k+1), and every item with count > n/(k+1) survives."""
    from idh_etl_demo_spark.catalog_r11c import _hh_mg_update

    import random

    rng = random.Random(7)
    k = 5
    stream = []
    # skewed: two heavy items + long rare tail (forces evictions)
    for _ in range(60):
        stream.append("hot1")
    for _ in range(40):
        stream.append("hot2")
    for i in range(120):
        stream.append(f"rare{i}")
    rng.shuffle(stream)

    counters: dict = {}
    exact: dict = {}
    for w in stream:
        _hh_mg_update(counters, k, w, 1)
        exact[w] = exact.get(w, 0) + 1
    n = len(stream)
    for item, c in exact.items():
        est = counters.get(item, 0)
        assert est <= c
        assert c - est <= n // (k + 1) + 1, item
        if c > n / (k + 1):
            assert item in counters, item
    assert len(counters) <= k


def test_bigram_heavy_hitters_twin_skewed(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401
    from idh_etl_demo_spark.catalog_r11c import _HH_K

    # a hot phrase repeated far above 1/k share + >_HH_K distinct rare
    # filler bigrams so per-partition MG genuinely evicts
    hot = " ".join(["alpha beta"] * 300)  # 'alpha beta'+'beta alpha' hot
    filler = " ".join(f"w{i}" for i in range(1500))  # 1499 rare bigrams
    rows = [(1, hot), (2, filler), (3, "alpha beta gamma")]
    sf = _write_documents(tmp_path, rows)
    entry = ENTRIES["doc_bigram_heavy_hitters"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "documents", entry))

    # exact twin
    from collections import Counter

    cnt: Counter = Counter()
    for _, text in rows:
        ws = text.lower().split(" ")
        for a, b in zip(ws, ws[1:]):
            cnt[f"{a} {b}"] += 1
    n = sum(cnt.values())
    twin = {w: c for w, c in cnt.items() if c * _HH_K > n}
    assert dict(zip(got.bigram, got.cnt)) == twin
    assert "alpha beta" in twin and len(twin) < 10
    # the rare tail is genuinely wider than the counter budget
    assert len(cnt) > _HH_K


# ---------------------------------------------------------------------------
# Rolling z-score
# ---------------------------------------------------------------------------


def test_rolling_zscore_twin_bit_exact(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401
    from idh_etl_demo_spark.catalog_r11c import _RZ_W

    import math

    base = dt.datetime(2024, 4, 1)
    rows = []
    eid = 0
    # user 1: 12 events incl. a wild spike; user 2: constant values
    # (zero variance -> NULL); user 3: a single event (n=1 -> NULL)
    vals1 = [10.0, 10.5, 9.75, 10.25, 10.0, 55.5, 10.0, 9.5, 10.5, 10.0, 10.25, 9.75]
    for i, v in enumerate(vals1):
        rows.append((eid, base + dt.timedelta(minutes=5 * i), 1, "view", v))
        eid += 1
    for i in range(5):
        rows.append((eid, base + dt.timedelta(minutes=7 * i), 2, "view", 3.5))
        eid += 1
    rows.append((eid, base, 3, "view", 42.0))
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_rolling_zscore"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "events", entry))

    # python twin with the identical expression tree
    by_user: dict = {}
    for e, ts, u, _, v in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(u, []).append((e, round(v * 100)))
    twin = {}
    for u, seq in by_user.items():
        for i, (e, x) in enumerate(seq):
            win = [c for _, c in seq[max(0, i - _RZ_W) : i + 1]]
            n, s, q = len(win), sum(win), sum(c * c for c in win)
            if n > 1 and n * q - s * s > 0:
                z = (n * x - s) / math.sqrt((n * (n * q - s * s)) / (n - 1))
            else:
                z = None
            twin[e] = (n, s, q, z)
    g = got.set_index("event_id")
    for e, (n, s, q, z) in twin.items():
        r = g.loc[e]
        assert (r.win_n, r.win_sum, r.win_sumsq) == (n, s, q), e
        if z is None:
            assert r.zscore != r.zscore or r.zscore is None  # NaN/None
        else:
            assert r.zscore == z, e  # bit-for-bit
    # the spike is flagged hard
    spike_eid = 5
    assert abs(g.loc[spike_eid].zscore) > 2.0
    # zero-variance and single-event users emit NULL everywhere
    for u, lo, hi in ((2, 12, 16), (3, 17, 17)):
        for e in range(lo, hi + 1):
            assert g.loc[e].zscore != g.loc[e].zscore or g.loc[e].zscore is None


def test_rolling_zscore_bound_guard(spark, tmp_path):
    import pytest

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401

    rows = [(0, dt.datetime(2024, 4, 1), 1, "view", 2.0e6)]  # centi 2e8
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_rolling_zscore"]
    with pytest.raises(Exception, match="centi bound exceeded"):
        entry.spark(spark, sf).collect()


def test_title_edit_neardup_degeneracy_guard(spark, tmp_path):
    """The linear candidate budget refuses instead of OOMing: ~1400
    identical titles put every doc in every prefix bucket, so slots =
    C(n,2)*25 ~ 24.5M > 2^14*n ~ 22.9M — the entry must RAISE. A
    smaller identical corpus stays under budget and runs the honest
    all-pairs ed=0 relation."""
    import pytest

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401

    title = "the quick brown fox jumps over the lazy dog near the old river"
    entry = ENTRIES["doc_title_edit_neardup"]

    over = tmp_path / "over"
    over.mkdir()
    n_over = 1400  # C(n,2)*25 > 16384*n  <=>  n > 1311.5
    sf = _write_documents(over, [(i, title) for i in range(n_over)])
    with pytest.raises(Exception, match="prefix filter degenerated"):
        entry.spark(spark, sf).write.format("noop").mode("overwrite").save()

    under = tmp_path / "under"
    under.mkdir()
    n_under = 1200
    sf2 = _write_documents(under, [(i, title) for i in range(n_under)])
    got = entry.spark(spark, sf2)
    assert got.count() == n_under * (n_under - 1) // 2


# ---------------------------------------------------------------------------
# Data-quality audits
# ---------------------------------------------------------------------------


def test_fk_integrity_planted_orphans(spark, tmp_path):
    """Testdata is FK-consistent, so the orphan path lives here: plant
    dangling custkeys, a NULL custkey, and dangling lineitem orderkeys
    and pin every cell."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401

    d = dt.datetime(1997, 6, 1)
    orders = [
        (1, 10, "O", 1.0, d, "1-URGENT"),
        (2, 10, "O", 1.0, d, "1-URGENT"),
        (3, 99, "F", 1.0, d, "2-HIGH"),  # dangling custkey
        (4, None, "F", 1.0, d, "2-HIGH"),  # NULL custkey (also orphan)
        (5, 11, "O", 1.0, d, "3-MEDIUM"),
    ]
    _write_orders(tmp_path, orders)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 11], type=pa.int64()),
                "c_name": pa.array(["a", "b"]),
                "c_nationkey": pa.array([0, 0], type=pa.int64()),
                "c_acctbal": pa.array([0.0, 0.0], type=pa.float64()),
                "c_mktsegment": pa.array(["x", "x"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 77, None], type=pa.int64()),
                "l_partkey": pa.array([1] * 5, type=pa.int64()),
                "l_suppkey": pa.array([1] * 5, type=pa.int64()),
                "l_linenumber": pa.array([1, 2, 1, 1, 1], type=pa.int64()),
                "l_quantity": pa.array([1.0] * 5, type=pa.float64()),
                "l_extendedprice": pa.array([1.0] * 5, type=pa.float64()),
                "l_discount": pa.array([0.0] * 5, type=pa.float64()),
                "l_tax": pa.array([0.0] * 5, type=pa.float64()),
                "l_returnflag": pa.array(["N"] * 5),
                "l_linestatus": pa.array(["O"] * 5),
                "l_shipdate": pa.array([d] * 5, type=pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    entry = ENTRIES["orders_fk_integrity"]
    got = entry.spark(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    assert_frames_equal(got, con.execute(entry.oracle).df())

    g = got.set_index("relationship")
    o = g.loc["orders.o_custkey->customer.c_custkey"]
    assert (o.n_child, o.n_null_fk, o.n_orphans) == (5, 1, 2)
    assert o.orphan_ppm == 2 * 1000000 // 5
    li = g.loc["lineitem.l_orderkey->orders.o_orderkey"]
    assert (li.n_child, li.n_null_fk, li.n_orphans) == (5, 1, 2)


def test_user_gini_twin_and_guard(spark, tmp_path, monkeypatch):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c as r11c

    base = dt.datetime(2024, 6, 1)
    rows, eid = [], 0
    # user 1: pure (gini 0); user 2: 2+2 uniform (gini 0.5);
    # user 3: 3+1 (gini = 1 - 10/16 = 0.375)
    for uid, types in ((1, "aaaa"), (2, "aabb"), (3, "aaab")):
        for t in types:
            rows.append((eid, base + dt.timedelta(minutes=eid), uid, t, 1.0))
            eid += 1
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_user_gini"]
    got = entry.spark(spark, sf).toPandas().set_index("user_id")
    assert_frames_equal(
        got.reset_index(), _oracle_df(sf, "events", entry)
    )
    assert got.loc[1].gini == 0.0 and got.loc[1].gini_ppm == 0
    assert got.loc[2].gini == (16 - 8) / 16 and got.loc[2].gini_ppm == 500000
    assert got.loc[3].gini == (16 - 10) / 16 and got.loc[3].gini_ppm == 375000
    assert list(got.n_types) == [1, 2, 2]

    # guard: shrink the bound and replant a user that exceeds it
    import pytest

    monkeypatch.setattr(r11c, "_GINI_N_BOUND", 3)
    with pytest.raises(Exception, match="per-user bound exceeded"):
        entry.spark(spark, sf).collect()


def test_freshness_audit_day_boundary_twin(spark, tmp_path):
    """The two-phase gap decomposition must recover a maximum gap that
    straddles a day boundary (the case the bucket trick could miss),
    and an intra-day stall when that is the max."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11c  # noqa: F401

    rows = [
        # type A: max gap 26h ACROSS the midnight cut (23:00 -> next 01:00)
        (0, dt.datetime(2024, 7, 1, 10, 0), 1, "A", 1.0),
        (1, dt.datetime(2024, 7, 1, 23, 0), 1, "A", 1.0),
        (2, dt.datetime(2024, 7, 3, 1, 0), 1, "A", 1.0),
        (3, dt.datetime(2024, 7, 3, 2, 0), 1, "A", 1.0),
        # type B: max gap 5h INSIDE a single day
        (4, dt.datetime(2024, 7, 1, 0, 0), 1, "B", 1.0),
        (5, dt.datetime(2024, 7, 1, 5, 0), 1, "B", 1.0),
        (6, dt.datetime(2024, 7, 1, 6, 0), 1, "B", 1.0),
        # type C: single event -> null gaps
        (7, dt.datetime(2024, 7, 2, 12, 0), 1, "C", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_freshness_audit"]
    got = entry.spark(spark, sf).toPandas().set_index("event_type")
    assert_frames_equal(got.reset_index(), _oracle_df(sf, "events", entry))

    h = 3600 * 1_000_000
    a = got.loc["A"]
    assert a.max_gap_us == 26 * h  # the cross-day gap won
    assert a.avg_gap_us == (40 * h) // 3
    b = got.loc["B"]
    assert b.max_gap_us == 5 * h
    assert b.avg_gap_us == 3 * h
    c = got.loc["C"]
    import pandas as pd

    assert pd.isna(c.max_gap_us) and pd.isna(c.avg_gap_us)
    assert c.n_events == 1
