"""Round-11b property tests: the late-batch entries pinned against
pure-Python twins on PLANTED data, plus full DuckDB-oracle parity on
the planted tables (the per-entry checklist's hard gate).

- Rollup cascade: every grain must match a twin that aggregates each
  grain DIRECTLY from raw (merge-associativity on planted data), the
  Sunday→Monday pair must land in different week buckets, and every
  day row must equal the int64 sum of its own hour rows (internal
  cascade consistency).
- Chi-square drift: terms must match an IEEE twin with the identical
  expression tree; a vanished bin (cur = 0) contributes a full term, a
  new bin (base = 0) is flagged and contributes NULL.
- Key-skew audit: shares/salts must match an exact-integer twin; a key
  sitting EXACTLY at total/P is NOT hot (strict >), and every hot
  key's post-salt share lands back under the parallelism bound.
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
    """rows: (o_orderkey, o_orderdate, o_orderpriority, o_orderstatus)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(rows)
    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "o_custkey": pa.array([1] * n, type=pa.int64()),
            "o_orderstatus": pa.array([r[3] for r in rows], type=pa.string()),
            "o_totalprice": pa.array([100.0] * n, type=pa.float64()),
            "o_orderdate": pa.array(
                [r[1] for r in rows], type=pa.timestamp("us")
            ),
            "o_orderpriority": pa.array([r[2] for r in rows], type=pa.string()),
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
# Hierarchical rollup cascade
# ---------------------------------------------------------------------------


def test_rollup_cascade_twin_and_week_boundary(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401

    # Sunday 2024-01-07 → Monday 2024-01-08 straddles an ISO week cut;
    # two types interleave; values exact in micros (rounding parity is
    # the oracle gate's job, the twin pins the aggregation)
    rows, eid = [], 0
    for day, hour, minute, typ, val in [
        (7, 22, 10, "view", 1.25),
        (7, 22, 40, "view", 2.5),
        (7, 23, 59, "click", 10.0),
        (8, 0, 1, "click", 0.000001),
        (8, 0, 30, "view", 3.75),
        (8, 13, 0, "view", 100.5),
        (9, 13, 5, "click", 7.125),
    ]:
        rows.append(
            (eid, dt.datetime(2024, 1, day, hour, minute, 0), 1, typ, val)
        )
        eid += 1
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_rollup_cascade"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "events", entry))

    # twin: every grain aggregated DIRECTLY from raw micros
    def trunc(ts, grain):
        if grain == "hour":
            return ts.replace(minute=0, second=0, microsecond=0)
        d = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        if grain == "day":
            return d
        return d - dt.timedelta(days=d.weekday())

    twin = {}
    for _, ts, _, typ, val in rows:
        vm = round(val * 1_000_000)
        for grain in ("hour", "day", "week"):
            k = (grain, trunc(ts, grain), typ)
            n, s, lo, hi = twin.get(k, (0, 0, None, None))
            twin[k] = (
                n + 1,
                s + vm,
                vm if lo is None else min(lo, vm),
                vm if hi is None else max(hi, vm),
            )
    assert len(got) == len(twin)
    for r in got.itertuples(index=False):
        k = (r.grain, r.bucket_start.to_pydatetime(), r.event_type)
        n, s, lo, hi = twin[k]
        assert (r.n_events, r.sum_value_micros) == (n, s), k
        assert (r.min_value_micros, r.max_value_micros) == (lo, hi), k
        assert r.avg_value_micros == float(s) / float(n), k

    # the week cut: Sunday 23:59 and Monday 00:01 land in different
    # week buckets (Jan 1 vs Jan 8)
    weeks = {
        ts.to_pydatetime()
        for ts in got[got.grain == "week"].bucket_start.tolist()
    }
    assert dt.datetime(2024, 1, 1) in weeks and dt.datetime(2024, 1, 8) in weeks

    # internal cascade consistency: each day row equals the int64 sum
    # of its own hour rows
    hours = got[got.grain == "hour"]
    for r in got[got.grain == "day"].itertuples(index=False):
        mine = hours[
            (hours.bucket_start.dt.floor("D") == r.bucket_start)
            & (hours.event_type == r.event_type)
        ]
        assert int(mine.n_events.sum()) == r.n_events
        assert int(mine.sum_value_micros.sum()) == r.sum_value_micros


# ---------------------------------------------------------------------------
# Chi-square snapshot drift
# ---------------------------------------------------------------------------


def test_chisq_drift_twin_and_bin_edges(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401

    d97, d98 = dt.datetime(1997, 6, 1), dt.datetime(1998, 6, 1)
    rows, k = [], 1

    def add(year_dt, prio, status, n):
        nonlocal k
        for _ in range(n):
            rows.append((k, year_dt, prio, status))
            k += 1

    add(d97, "1-URGENT", "F", 40)   # shrinking bin
    add(d98, "1-URGENT", "F", 10)
    add(d97, "2-HIGH", "O", 30)     # growing bin
    add(d98, "2-HIGH", "O", 60)
    add(d97, "3-MEDIUM", "P", 30)   # VANISHED bin: cur = 0, full term
    add(d98, "5-LOW", "F", 30)      # NEW bin: base = 0, NULL term
    # a 1996 order must be ignored entirely (outside both snapshots)
    add(dt.datetime(1996, 1, 1), "1-URGENT", "F", 5)

    sf = _write_orders(tmp_path, rows)
    entry = ENTRIES["orders_chisq_drift"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "orders", entry))

    n_base, n_cur = 100, 100
    twin = {
        ("1-URGENT", "F"): (40, 10),
        ("2-HIGH", "O"): (30, 60),
        ("3-MEDIUM", "P"): (30, 0),
        ("5-LOW", "F"): (0, 30),
    }
    assert len(got) == len(twin)
    for r in got.itertuples(index=False):
        bi, ci = twin[(r.o_orderpriority, r.o_orderstatus)]
        assert (r.n_base_bin, r.n_cur_bin) == (bi, ci)
        assert (r.n_base, r.n_cur) == (n_base, n_cur)
        assert r.is_new_bin == (bi == 0)
        if bi == 0:
            assert r.chisq_term != r.chisq_term  # NaN/NULL
        else:
            # IEEE twin with the identical tree shape
            d = float(ci * n_base - bi * n_cur)
            expect = (d * d) / (
                float(n_base) * float(bi) * float(n_cur)
            )
            assert r.chisq_term == expect
            assert r.expected_cur == float(n_cur * bi) / float(n_base)
    # exact planted terms: the vanished bin and the doubled bin both
    # move |diff| = 3000 on the same totals → identical 30.0 terms
    # (the statistic prices displaced mass, not direction), and the
    # 40→10 bin divides by its larger base count → 22.5
    terms = {
        (r.o_orderpriority, r.o_orderstatus): r.chisq_term
        for r in got.itertuples(index=False)
        if r.n_base_bin > 0
    }
    assert terms == {
        ("3-MEDIUM", "P"): 30.0,
        ("2-HIGH", "O"): 30.0,
        ("1-URGENT", "F"): 22.5,
    }


# ---------------------------------------------------------------------------
# Key-skew audit
# ---------------------------------------------------------------------------


def test_key_skew_audit_twin_and_threshold_edge(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401
    from idh_etl_demo_spark.catalog_r11b import _SKEW_PARALLELISM as P

    # 64 events total: user 1 has EXACTLY total/P = 2 events (strict >
    # ⇒ NOT hot); user 2 has 10 (hot); the rest spread 1 each. Types:
    # 'a' takes 54 events (hot), 'b' the other 10 (hot: 10·32 > 64).
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0

    def add(user, typ, n):
        nonlocal eid
        for _ in range(n):
            rows.append(
                (eid, base + dt.timedelta(minutes=eid), user, typ, 1.0)
            )
            eid += 1

    add(1, "a", 2)
    add(2, "a", 10)
    for u in range(3, 45):
        add(u, "a", 1)
    for u in range(45, 55):
        add(u, "b", 1)
    assert eid == 64
    sf = _write_events(tmp_path, rows)
    entry = ENTRIES["events_key_skew_audit"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "events", entry))

    def salt(n, total):
        return (n * P + total - 1) // total if n * P > total else 1

    def row(kind, key_name, key_value, n, n_keys, total):
        s = salt(n, total)
        return {
            "kind": kind,
            "key_name": key_name,
            "key_value": key_value,
            "n_events_key": n,
            "n_keys": n_keys,
            "n_total": total,
            "share_ppm": n * 1_000_000 // total,
            "salt": s,
            "post_salt_share_ppm": ((n + s - 1) // s) * 1_000_000 // total,
        }

    expect = [
        row("hot_key", "event_type", "a", 54, 2, 64),
        row("hot_key", "event_type", "b", 10, 2, 64),
        row("hot_key", "user_id", "2", 10, 54, 64),
        row("summary", "event_type", None, 54, 2, 64),
        row("summary", "user_id", None, 10, 54, 64),
    ]
    assert len(got) == len(expect)
    for r, e in zip(got.itertuples(index=False), expect):
        for col, want in e.items():
            val = getattr(r, col)
            assert (val is None and want is None) or val == want, (
                col,
                val,
                e,
            )
    # user 1 sits EXACTLY at total/P and must NOT appear as hot
    assert "1" not in set(
        got[(got.kind == "hot_key") & (got.key_name == "user_id")].key_value
    )
    # every hot key's post-salt share is back under the bound
    # (ceil(n/salt) ≤ ceil(total/P) ⇒ ppm ≤ ceil(1e6/P) at the planted
    # divisibility)
    hot = got[got.kind == "hot_key"]
    assert (hot.post_salt_share_ppm <= 1_000_000 // P).all()


# ---------------------------------------------------------------------------
# Containment join
# ---------------------------------------------------------------------------


def _write_documents_lang(tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_containment_join_twin_asymmetry_and_boundary(spark, tmp_path):
    """A short doc quoted wholesale inside a long one must surface here
    (containment 1.0) while staying INVISIBLE to the symmetric Jaccard
    ≥ 0.7 join (the asymmetry theorem); a pair at EXACTLY the 0.8
    threshold is included (≥); everything matches a brute-force twin
    over python shingle sets, plus full oracle parity."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r10  # noqa: F401
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401

    big = [f"b{i}" for i in range(40)]          # doc 2: 36 shingles
    small = big[10:25]                           # doc 1: 15 toks, 11 shingles ⊂ big
    d_toks = [f"d{i}" for i in range(14)]        # doc 3: 10 shingles
    # doc 4: D's first 12 tokens (8 of D's shingles) + unique junk —
    # containment(D→E) = 8/10 = EXACTLY the threshold
    e_toks = d_toks[:12] + [f"j{i}" for i in range(10)]
    other = [f"x{i}" for i in range(20)]         # doc 5: unrelated
    texts = {
        1: " ".join(small),
        2: " ".join(big),
        3: " ".join(d_toks),
        4: " ".join(e_toks),
        5: " ".join(other),
    }
    sf = _write_documents_lang(
        tmp_path, [(k, v, "en") for k, v in sorted(texts.items())]
    )
    entry = ENTRIES["doc_containment_join"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "documents", entry))

    # twin: brute force over python 5-gram shingle sets
    W = 5

    def shingles(toks):
        return {
            tuple(toks[i : i + W]) for i in range(len(toks) - W + 1)
        }

    sets = {k: shingles(v.split()) for k, v in texts.items()}
    expect = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if 5 * inter >= 4 * len(sets[a]):
                expect[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    got_pairs = {
        (r.id_small, r.id_big): (r.inter, r.s_small, r.s_big)
        for r in got.itertuples(index=False)
    }
    assert got_pairs == expect
    # the quote pair: containment 1.0, and the boundary pair at 0.8
    assert got_pairs[(1, 2)] == (11, 11, 36)
    # the boundary pair sits EXACTLY at 5·inter == 4·s_small
    assert got_pairs[(3, 4)][0] * 5 == 4 * got_pairs[(3, 4)][1]
    assert got_pairs[(3, 4)] == (8, 10, 18)
    row = got[(got.id_small == 1) & (got.id_big == 2)].iloc[0]
    assert row.containment == 1.0

    # asymmetry: Jaccard(1,2) = 11/36 < 0.7 → the symmetric join is
    # blind to the inclusion this entry exists to catch
    jac = ENTRIES["doc_setsim_prefix_join"].spark(spark, sf).toPandas()
    assert not (
        ((jac.id_a == 1) & (jac.id_b == 2))
        | ((jac.id_a == 2) & (jac.id_b == 1))
    ).any()


# ---------------------------------------------------------------------------
# Language-ID confusion matrix
# ---------------------------------------------------------------------------


def test_langid_confusion_twin_and_shares(spark, tmp_path):
    """Planted corpus with a known confusion structure: correct en/fr
    docs, one fr-labeled doc written with English markers (an (fr, en)
    cell), one marker-free doc (an 'und' column); counts and both
    normalizations must match the hand twin, diagonal shares read as
    per-class recall/precision."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401

    rows = [
        (1, "the and of to in something", "en"),
        (2, "the and of it is for", "en"),
        (3, "le la les et est une", "fr"),
        (4, "the and of to in borrowed", "fr"),   # mislabeled → (fr, en)
        (5, "zzz qqq www eee rrr", "de"),          # no markers → und
    ]
    sf = _write_documents_lang(tmp_path, rows)
    entry = ENTRIES["doc_langid_confusion"]
    got = entry.spark(spark, sf).toPandas()
    assert_frames_equal(got, _oracle_df(sf, "documents", entry))

    twin_cells = {
        ("de", "und"): 1,
        ("en", "en"): 2,
        ("fr", "en"): 1,
        ("fr", "fr"): 1,
    }
    n_true = {"de": 1, "en": 2, "fr": 2}
    n_pred = {"und": 1, "en": 3, "fr": 1}
    assert len(got) == len(twin_cells)
    for r in got.itertuples(index=False):
        key = (r.lang_true, r.lang_pred)
        assert r.n_docs == twin_cells[key]
        assert r.n_true == n_true[r.lang_true]
        assert r.n_pred == n_pred[r.lang_pred]
        assert r.is_correct == (r.lang_true == r.lang_pred)
        assert r.recall_share == float(r.n_docs) / float(r.n_true)
        assert r.precision_share == float(r.n_docs) / float(r.n_pred)
    # diagonal reads: en recall 1.0 but en precision 2/3 (polluted by
    # the mislabeled fr doc); fr recall 0.5
    diag = {
        r.lang_true: (r.recall_share, r.precision_share)
        for r in got.itertuples(index=False)
        if r.is_correct
    }
    assert diag["en"] == (1.0, 2.0 / 3.0)
    assert diag["fr"] == (0.5, 1.0)
