"""Measure the incremental ExactSubstr walk reduction → PROBE_XSI.json.

doc_exact_substr_incremental's claim is that the Manber–Myers LCP walk
— the log(max_len) refinement join chain — processes only adjacent
pairs TOUCHING a delta position (suffix_lcp_adjacent's pair_filter),
never re-walking base-only pairs. This probe makes the reduction a
committed NUMBER per scale factor: the unfiltered pair count is
|positions| − 1 by construction; the filtered count is what the walk
actually consumes. walk_fraction should sit near the delta position
fraction (each delta position contributes its two neighbors, so the
walked fraction is bounded by ~2× the delta share — much closer on
runs of consecutive delta positions).

Usage: python tools/probe_xsi.py  (writes PROBE_XSI.json at repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from idh_etl_demo_spark.session import get_spark  # noqa: E402
from idh_etl_demo_spark.catalog_r11 import (  # noqa: E402
    _xsi_base,
    _xsi_delta,
    _xsi_parts,
)


def main() -> None:
    spark = get_spark(app_name="probe-xsi")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        t0 = time.perf_counter()
        final, history, posf = _xsi_parts(spark, sf_dir)
        build_s = round(time.perf_counter() - t0, 3)
        npos = final.count()
        ndelta_pos = (
            _xsi_base(spark, sf_dir)
            .filter(_xsi_delta(F.col("doc_id")))
            .select(F.sum(F.size("toks")).alias("n"))
            .collect()[0][0]
        )
        a = final.select(
            F.col("doc_id").alias("d1"), F.col("pos").alias("p1"), "sa_rank"
        )
        b = final.select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("p2"),
            (F.col("sa_rank") - 1).alias("sa_rank"),
        )
        pairs = a.join(b, "sa_rank")
        walked = pairs.filter(
            _xsi_delta(F.col("d1")) | _xsi_delta(F.col("d2"))
        ).count()
        full = npos - 1
        out[sf] = {
            "positions": npos,
            "delta_positions": int(ndelta_pos),
            "delta_position_fraction": round(ndelta_pos / npos, 4),
            "pairs_full_walk": full,
            "pairs_actually_walked": walked,
            "walk_fraction": round(walked / full, 4),
            "sa_build_sec": build_s,
        }
        print(f"[probe] {sf}: {out[sf]}")
    spark.stop()
    with open(os.path.join(REPO, "PROBE_XSI.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
