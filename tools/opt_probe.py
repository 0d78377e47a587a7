"""Per-entry measurement probe for the optimization rounds (guide §1):
times the builder call and the noop-sink action separately, counts
Spark jobs launched by each phase, and optionally dumps
``explain("formatted")`` to a file.

Usage:
    python tools/opt_probe.py [--plans-dir plans/r15 --suffix _before]
        [--reps N] entry1 entry2 ...

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py. Clears
the SESSION_CACHED memos before every rep exactly like bench.py, so a
probe rep measures the same cold execution the bench reports.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idh_etl_demo_spark.session import get_spark  # noqa: E402
from idh_etl_demo_spark.catalog import ENTRIES  # noqa: E402
import bench  # noqa: E402  (imports every catalog module, defines cache clearing)


def _n_jobs(spark) -> int:
    try:
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId().get())
    except Exception:
        return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    out: dict[str, dict] = {}
    for name in args.entries:
        rows = []
        for rep in range(args.reps):
            if name in bench.SESSION_CACHED:
                bench._clear_session_caches()
            j0 = _n_jobs(spark)
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: build rep{rep}")
            df = ENTRIES[name].spark(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _n_jobs(spark)
            spark.sparkContext.setJobDescription(f"{name}: action rep{rep}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = _n_jobs(spark)
            spark.sparkContext.setJobDescription(None)
            rows.append(
                {
                    "build_sec": round(t1 - t0, 3),
                    "action_sec": round(t2 - t1, 3),
                    "total_sec": round(t2 - t0, 3),
                    "build_jobs": j1 - j0,
                    "action_jobs": j2 - j1,
                }
            )
            if rep == 0 and args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                p = os.path.join(args.plans_dir, f"{name}{args.suffix}.txt")
                with open(p, "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        out[name] = {
            "reps": rows,
            "min_total": min(r["total_sec"] for r in rows),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
