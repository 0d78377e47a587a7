"""Focused A/B harness for the suffix-array build and walk (guide §1:
isolate the expensive operator). Times, in one process:

  - build: suffix_ranks over the XSI corpus (the heaviest builder);
  - walk:  dup_len_per_position(suffix_lcp_adjacent(...)) through a
    noop sink (the LCP recovery chain most entries pay).

Prints one JSON line per rep. Run against two git states to compare.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from idh_etl_demo_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-build")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    from idh_etl_demo_spark.catalog_r11 import _xsi_base
    from idh_etl_demo_spark.operators.suffix import (
        dup_len_per_position,
        suffix_lcp_adjacent,
        suffix_ranks,
    )
    from bench import _release_memo_value

    base = _xsi_base(spark, sf_dir)
    lens = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    for rep in range(reps):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"ab build rep{rep}")
        final, history, posf = suffix_ranks(base)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"ab walk rep{rep}")
        m = dup_len_per_position(
            suffix_lcp_adjacent(final, history, posf, lens)
        )
        m.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "rep": rep,
                    "build_sec": round(t1 - t0, 3),
                    "walk_sec": round(t2 - t1, 3),
                }
            ),
            flush=True,
        )
        _release_memo_value((final, history, posf))
    spark.stop()


if __name__ == "__main__":
    main()
