"""Committed-artifact manifest gates (r10 verdict ask #7).

Round 10 shipped a scale-probe artifact that silently OMITTED
`lineitem_mad_outliers`: bench_scale.py listed the probe, but
SCALE_PROBES_r10.json had been generated two commits earlier and was
never re-run after the entry landed — exactly the entry whose window
shape most needed the measurement. These tests make that drift class a
suite FAILURE instead of a shipped omission: every name the harnesses
declare must appear in the newest committed artifact, so adding a probe
or HEADLINE row without regenerating the artifact cannot reach the
end-of-round snapshot (tools/preflight.py --suite runs the full suite).

No Spark session needed — pure JSON/name-set comparisons.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_scale_probes_path() -> str:
    paths = glob.glob(os.path.join(REPO, "SCALE_PROBES_r*.json"))
    assert paths, "no committed SCALE_PROBES_r*.json artifact found"

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=round_no)


def test_scale_probe_artifact_covers_declared_probes():
    """Every probe bench_scale.py declares (PROBES + EXTRA_PROBES) must
    have a measured ratio in the newest committed SCALE_PROBES
    artifact."""
    from bench_scale import EXTRA_PROBES, PROBES

    path = _latest_scale_probes_path()
    with open(path) as fh:
        artifact = json.load(fh)
    measured = set(artifact["ratio_vs_sf"])
    declared = set(PROBES) | set(EXTRA_PROBES)
    missing = sorted(declared - measured)
    assert not missing, (
        f"{os.path.basename(path)} omits declared probes {missing}: "
        "regenerate it (python bench_scale.py) after changing the probe list"
    )


def test_perquery_artifact_covers_headline():
    """Every bench.py HEADLINE row must have a timing in the committed
    per-query artifact (BENCH_PERQUERY_local.json)."""
    from bench import HEADLINE

    path = os.path.join(REPO, "BENCH_PERQUERY_local.json")
    with open(path) as fh:
        artifact = json.load(fh)
    measured = set(artifact["queries"])
    missing = sorted(set(HEADLINE) - measured)
    assert not missing, (
        f"BENCH_PERQUERY_local.json omits HEADLINE rows {missing}: "
        "re-run bench.py after changing HEADLINE"
    )


def test_headline_rows_are_catalog_entries():
    """HEADLINE and probe names must resolve to real catalog entries —
    a renamed entry with a stale bench row otherwise KeyErrors only at
    bench time, after the suite is long green."""
    import __spark_entry__  # noqa: F401  (registers every catalog module)

    from bench import HEADLINE
    from bench_scale import PROBES
    from idh_etl_demo_spark.catalog import ENTRIES

    unknown = sorted((set(HEADLINE) | set(PROBES)) - set(ENTRIES))
    assert not unknown, f"bench names not in the catalog: {unknown}"
