"""Round-12 property tests.

Containment-join prunes (the round-11 verdict's ask #1): the LENGTH
filter (5·s_b ≥ 4·s_a) and the first-collision POSITIONAL bound
(5·(s_b − r_b + 1) ≥ 4·s_a) are verified on a PLANTED size-diverse
corpus where both genuinely fire — the base documents corpus has
near-uniform sizes, so slot_reduction sits at 1.0 there and only the
planted geometry proves the arithmetic:

- a big document probing a tiny one (C→D) generates prefix collisions
  that ONLY the length filter removes;
- a small document fully contained deep inside a big one (P ⊆ Q, the
  shared run sitting BEHIND 29 rarer shingles of Q) generates
  collisions where the positional bound prunes the deep slots while
  the first (rarest) collision survives — the first-collision
  completeness theorem exercised at its boundary;
- every true pair (containment ≥ 0.8 by brute force) must appear in
  the entry output, bit-for-bit against a pure-Python twin AND the
  DuckDB oracle, and the audit's five counters must equal the twin's.
"""

from __future__ import annotations

import hashlib

import duckdb

from tests.compare import assert_frames_equal
from tests.test_r10_properties import _write_documents

_W = 5
_T_NUM, _T_DEN = 4, 5


def _shingles(text: str) -> list[str]:
    toks = text.split()
    if len(toks) < _W:
        return []
    seen: list[str] = []
    have = set()
    for i in range(len(toks) - _W + 1):
        h = hashlib.md5(" ".join(toks[i : i + _W]).encode()).hexdigest()
        if h not in have:
            have.add(h)
            seen.append(h)
    return seen


def _twin(texts: dict[int, str]):
    """Pure-Python twin of _cont_parts + the pruned candidate join +
    the brute-force relation. Returns (audit dict, truth rows)."""
    sets = {d: set(_shingles(t)) for d, t in texts.items()}
    sets = {d: s for d, s in sets.items() if s}
    df: dict[str, int] = {}
    for s in sets.values():
        for gh in s:
            df[gh] = df.get(gh, 0) + 1
    ranked = {
        d: sorted(s, key=lambda gh: (df[gh], gh)) for d, s in sets.items()
    }
    size = {d: len(s) for d, s in sets.items()}

    def p_of(s: int) -> int:
        return s - (_T_NUM * s + _T_DEN - 1) // _T_DEN + 1

    prefix = {
        d: order[: p_of(size[d])] for d, order in ranked.items()
    }
    unpruned = sum(
        df[gh] - 1 for d, pre in prefix.items() for gh in pre
    )
    rank_in = {
        d: {gh: i + 1 for i, gh in enumerate(order)}
        for d, order in ranked.items()
    }
    pruned = 0
    cands = set()
    for a, pre in prefix.items():
        for gh in pre:
            for b, rk in rank_in.items():
                if b == a or gh not in rk:
                    continue
                s_a, s_b, r_b = size[a], size[b], rk[gh]
                if _T_DEN * s_b < _T_NUM * s_a:
                    continue
                if _T_DEN * (s_b - r_b + 1) < _T_NUM * s_a:
                    continue
                pruned += 1
                cands.add((a, b))
    truth = []
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if _T_DEN * inter >= _T_NUM * size[a]:
                truth.append(
                    (a, b, inter, size[a], size[b], inter / size[a])
                )
    audit = {
        "n_sets": len(sets),
        "unpruned_slots": unpruned,
        "pruned_slots": pruned,
        "n_candidates": len(cands),
        "n_qualifying": len(truth),
    }
    return audit, sorted(truth), cands


def _planted_texts() -> dict[int, str]:
    f = [f"f{i}" for i in range(1, 91)]
    v = [f"v{i}" for i in range(1, 11)]
    w = [f"w{i}" for i in range(1, 11)]
    q = [f"q{i}" for i in range(1, 30)]
    s = [f"s{i}" for i in range(1, 6)]
    return {
        1: " ".join(v),                       # A: tiny probe, A ⊆ B
        2: " ".join(v + f[:86]),              # B: big, contains A
        3: " ".join(w + f[:86]),              # C: big probe into tiny D
        4: " ".join(w),                       # D: tiny, D ⊆ C
        5: " ".join(f),                       # filler (raises filler df)
        6: " ".join(f),                       # filler twin
        7: " ".join(f[:9] + s),               # P: small, P ⊆ Q deep
        8: " ".join(q + f[:9] + s),           # Q: big, contains P's run
    }


def test_containment_prunes_fire_and_stay_complete(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401

    texts = _planted_texts()
    sf = _write_documents(tmp_path, texts)
    audit_twin, truth, cands = _twin(texts)

    # the planted geometry makes BOTH prunes bite: strictly fewer
    # surviving slots than the unpruned expansion
    assert audit_twin["pruned_slots"] < audit_twin["unpruned_slots"]
    # completeness: every true pair is a surviving candidate
    assert {(a, b) for (a, b, *_rest) in truth} <= cands
    # the big→tiny probes (C→D, B→A) are NOT candidates (length filter)
    assert (3, 4) not in cands and (2, 1) not in cands
    # the deep-inclusion pair survives via its first collision
    assert (7, 8) in cands

    sdf = ENTRIES["doc_containment_join"].spark(spark, sf).toPandas()
    got = [tuple(r) for r in sdf.itertuples(index=False)]
    assert got == truth  # bit-for-bit incl. the IEEE division
    # the three PLANTED inclusions are in the relation (the shared
    # filler runs legitimately add filler⊆B/C pairs on top — the twin
    # equality above pins the full relation)
    assert {(1, 2), (4, 3), (7, 8)} <= {(a, b) for (a, b, *_r) in truth}

    adf = ENTRIES["doc_containment_audit"].spark(spark, sf).toPandas()
    row = adf.iloc[0]
    for k, want in audit_twin.items():
        assert int(row[k]) == want, (k, int(row[k]), want)
    assert row["slot_reduction"] == (
        audit_twin["pruned_slots"] / audit_twin["unpruned_slots"]
    )

    # full DuckDB-oracle parity on the planted tables (the hard gate)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for name in ("doc_containment_join", "doc_containment_audit"):
        assert_frames_equal(
            ENTRIES[name].spark(spark, sf).toPandas(),
            con.execute(ENTRIES[name].oracle).df(),
        )


# ---------------------------------------------------------------------------
# Suffix-array stability exit + identical-tail sentinel (round 12)
# ---------------------------------------------------------------------------
#
# The prefix-doubling loop now stops when a doubling round splits no
# class (the Manber–Myers fixpoint) instead of grinding to max doc
# length — the remaining tied classes are identical tails, which the
# LCP walk resolves via the top-level sentinel. Plant the adversarial
# geometry: several VERBATIM copies of one doc whose 120 tokens are
# pairwise distinct, so the partition is content-complete at the
# BIGRAM seed already (stability fires on the first doubling round)
# while every cross-copy suffix pair is an identical tail of up to 120
# tokens — far beyond what the truncated level ladder (2 alone) can
# accumulate without the sentinel.


def test_sa_stability_exit_fires_and_walk_stays_exact(spark, tmp_path):
    import pyspark.sql.functions as F

    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    import idh_etl_demo_spark.catalog_r10  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.operators.text import tokens as tok_expr
    from idh_etl_demo_spark.operators.suffix import (
        dup_len_per_position,
        suffix_lcp_adjacent,
        suffix_ranks,
    )

    body = " ".join(f"t{i}" for i in range(1, 121))
    texts = {1: body, 2: body, 3: body, 4: body}
    sf = _write_documents(tmp_path, texts)

    base = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", tok_expr(F.col("text")).alias("toks"))
    )
    final, history, pos = suffix_ranks(base)
    # stability fired: the ladder stops far short of maxlen=120
    # (distinct tokens make the bigram seed content-complete; the
    # first doubling round splits nothing)
    assert [h for h, _ in history] == [2], history
    # every copy's suffix is an identical tail of the 3 other copies:
    # m(pos) must equal the FULL remaining length at every position
    lens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    m = dup_len_per_position(
        suffix_lcp_adjacent(final, history, pos, lens)
    ).collect()
    assert len(m) == 4 * 120
    for row in m:
        assert row.m == 120 - row.pos, (row.doc_id, row.pos, row.m)

    # the driver-gated consumers stay oracle-green on the planted
    # corpus (their DuckDB twins rebuild the SA from scratch)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for name in ("doc_exact_substr_spans", "doc_longest_dup_run"):
        assert_frames_equal(
            ENTRIES[name].spark(spark, sf).toPandas(),
            con.execute(ENTRIES[name].oracle).df(),
        )
