"""Maintain BENCH_HISTORY.json — the committed per-round record of
per-query bench samples that feeds bench.py's MECHANICAL noisy-row
criterion (the r14 verdict's ask #3: membership in the best-of-4 set
must be computed from the BENCH_r*.json history, not hand-kept).

The file holds, per round, every committed per-query map (builder
finals AND the driver's round-end run — both are min-rep seconds at
sf0.1 over the same code, so their spread is pure session noise).
The seed content (rounds 12-14) was extracted from this repo's own
git history of BENCH_PERQUERY_local.json; from round 15 on, the
round ritual appends the builder's final artifact before committing:

    python tools/gen_bench_history.py --append-current 15

and the next round's builder appends the driver's run (visible as the
round-commit version of BENCH_PERQUERY_local.json) with:

    python tools/gen_bench_history.py --append-git <round> <commit>
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "BENCH_HISTORY.json")
PERQUERY = os.path.join(REPO, "BENCH_PERQUERY_local.json")


def _load() -> dict:
    with open(HISTORY) as fh:
        return json.load(fh)


def _save(doc: dict) -> None:
    with open(HISTORY, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")


def _append(doc: dict, round_no: int, src: str, payload: dict) -> None:
    samples = doc["rounds"].setdefault(str(round_no), [])
    entry = {
        "src": src,
        "sf": payload.get("sf"),
        "queries": payload["queries"],
    }
    if any(s["queries"] == entry["queries"] for s in samples):
        print(f"round {round_no}: identical sample already recorded, skipping")
        return
    samples.append(entry)
    print(f"round {round_no}: appended '{src}' ({len(entry['queries'])} rows)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--append-current", type=int, metavar="ROUND",
                    help="append the working-tree BENCH_PERQUERY_local.json")
    ap.add_argument("--append-git", nargs=2, metavar=("ROUND", "COMMIT"),
                    help="append BENCH_PERQUERY_local.json from a commit")
    args = ap.parse_args()
    doc = _load()
    if args.append_current is not None:
        with open(PERQUERY) as fh:
            _append(doc, args.append_current, "builder current", json.load(fh))
    if args.append_git:
        rnd, commit = int(args.append_git[0]), args.append_git[1]
        txt = subprocess.check_output(
            ["git", "-C", REPO, "show", f"{commit}:BENCH_PERQUERY_local.json"]
        )
        _append(doc, rnd, f"driver {commit}", json.loads(txt))
    _save(doc)


if __name__ == "__main__":
    main()
