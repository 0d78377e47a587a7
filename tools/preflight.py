"""Window pre-flight: run every DRIVER_PRIORITY entry driver-style
(Spark result vs DuckDB oracle at sf0.01, value compare via
tests/compare.py) and print a green/red line per entry plus a summary.

This is the hard-check rehearsal the per-round ritual requires before
the driver's own CORRECTNESS run (run it at least twice per round: once
mid-round, once after the final code commit).

``--suite`` additionally runs the FULL pytest suite first and refuses
to proceed while it is red — the snapshot pre-condition the round-8
verdict mandated (ask #2) after a late entry shipped 2 failures: a
round's last preflight must be ``python tools/preflight.py --suite``
so an entry that skipped the checklist (shuffle budget, COVERAGE
regen) can never reach the end-of-round snapshot unnoticed.
``--suite-fast`` runs only the cheap contract layer (plan shapes +
window/COVERAGE drift) for mid-round iterations.

Usage: python tools/preflight.py [--suite|--suite-fast]
                                 [--sf /root/testdata/sf0.01] [names...]
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


def _run_suite(fast: bool) -> int:
    import subprocess

    target = (
        ["tests/test_plan_shape.py", "tests/test_catalog_oracle.py"]
        if fast
        else ["tests/"]
    )
    print(f"preflight suite gate: pytest {' '.join(target)}", flush=True)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", *target, "-q", "-p", "no:cacheprovider"],
        cwd=REPO,
    )
    if rc != 0:
        print("preflight: SUITE RED — fix before snapshot", flush=True)
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--suite", action="store_true",
        help="gate on the FULL pytest suite before the window rehearsal",
    )
    ap.add_argument(
        "--suite-fast", action="store_true",
        help="gate on plan-shape + window/COVERAGE contract tests only",
    )
    ap.add_argument(
        "--all", action="store_true",
        help="rehearse EVERY catalog entry (not just the driver "
        "window) — the pre-rotation de-risk sweep: out-of-window "
        "entries normally only see their oracles at sf0.001 via the "
        "test sweep, so this is where an sf0.01-only surprise shows "
        "up before a rotation would put it in front of the driver",
    )
    ap.add_argument("names", nargs="*", help="subset of entries (default: full window)")
    args = ap.parse_args()

    if args.suite or args.suite_fast:
        rc = _run_suite(fast=args.suite_fast and not args.suite)
        if rc != 0:
            return rc

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

    queries = m.queries()
    names = args.names or (
        sorted(queries.keys()) if args.all else m.DRIVER_PRIORITY
    )
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
