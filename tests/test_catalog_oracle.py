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


@pytest.mark.parametrize("name", NAMES)
def test_catalog_matches_oracle(name, spark, oracle_con):
    from tests.compare import assert_frames_equal

    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} has no oracle"
    want = oracle_con.execute(sql).df()
    assert_frames_equal(got, want)
