"""Record the deep-BPE 10× scale artifact (round-8 verdict ask #5).

Commit d4b7e02 claimed the loop-driven BPE trainer's 10× token-scan
ratio "must hold 1.2-1.3" at depth; the bench_scale EXTRA_PROBES hook
existed but no artifact ever landed. This tool measures it directly:
train at 32 and 64 merges on the base documents table and on a 10×
key-shifted union (the bench_scale synthesis for the documents table,
reused verbatim), and write PROBE_BPE_DEEP.json with wall times,
achieved merge counts, and the 10× ratios.

Interpretation: the corpus-sized cost is the ONE word groupBy; all
per-merge argmax jobs run over the |types| table, so the ratio should
track the token scan (≈1-3× like the unrolled 3-step entry), NOT the
merge depth. A ratio scaling with depth would mean iteration cost grew
corpus-sized — the exact regression this artifact guards against.

Usage: python tools/probe_bpe_deep.py [--base /root/testdata/sf0.1]
(run on a QUIET machine — the r7 jitter protocol applies).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idh_etl_demo_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--base",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--depths", default="32,64")
    args = ap.parse_args()
    depths = [int(d) for d in args.depths.split(",")]

    from bench_scale import _scaled  # the 10x union synthesis, verbatim
    from idh_etl_demo_spark.catalog import _read_table
    from idh_etl_demo_spark.operators.bpe import bpe_train, bpe_word_table

    spark = get_spark(app_name="probe-bpe-deep")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="probe_bpe_")
    _scaled(spark, args.base, "documents").write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )

    def run(sf_dir: str, depth: int) -> tuple[float, int]:
        t0 = time.perf_counter()
        merges, _ = bpe_train(
            bpe_word_table(_read_table(spark, sf_dir, "documents")), depth
        )
        return round(time.perf_counter() - t0, 3), len(merges)

    out: dict[str, dict] = {}
    for depth in depths:
        base_s, base_m = run(args.base, depth)
        big_s, big_m = run(tmp, depth)
        out[f"merges{depth}"] = {
            "base_sec": base_s,
            "base_achieved_merges": base_m,
            "x10_sec": big_s,
            "x10_achieved_merges": big_m,
            "ratio_10x": round(big_s / base_s, 2) if base_s else None,
        }
        print(f"depth {depth}: base {base_s}s ({base_m} merges), "
              f"10x {big_s}s ({big_m} merges), ratio {out[f'merges{depth}']['ratio_10x']}",
              flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROBE_BPE_DEEP.json",
    )
    with open(path, "w") as fh:
        json.dump({"base": args.base, "copies": 10, "probes": out}, fh, indent=1)
        fh.write("\n")
    print("wrote", path, flush=True)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
