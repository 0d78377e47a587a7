"""Window pre-flight: run every DRIVER_PRIORITY entry driver-style
(Spark result vs DuckDB oracle at sf0.01, value compare via
tests/compare.py) and print a green/red line per entry plus a summary.

This is the hard-check rehearsal the per-round ritual requires before
the driver's own CORRECTNESS run (run it at least twice per round: once
mid-round, once after the final code commit).

Usage: python tools/preflight.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="subset of entries (default: full window)")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from idh_etl_demo_spark.session import get_spark
    from tests.compare import assert_frames_equal

    spark = get_spark(app_name="preflight")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or m.DRIVER_PRIORITY
    queries = m.queries()
    oracles = m.oracle_sql()
    red = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
            sql = oracles.get(name)
            if sql is None:
                status = f"green (rows-only: {len(sdf)})"
            else:
                assert_frames_equal(sdf, con.execute(sql).df())
                status = f"green ({len(sdf)} rows)"
        except Exception:
            status = "RED"
            red.append(name)
            traceback.print_exc(limit=3)
        print(f"{name:40s} {status:24s} {time.perf_counter() - t0:6.2f}s", flush=True)

    print(f"\npreflight: {len(names) - len(red)}/{len(names)} green", flush=True)
    if red:
        print("RED:", ", ".join(red), flush=True)
    spark.stop()
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
