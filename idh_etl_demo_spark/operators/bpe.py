"""Loop-driven BPE merge-pair training at realistic depth.

The 3-step catalog entries (catalog_r7: ``doc_bpe_merge_steps`` /
``doc_bpe_segmentation``) prove the primitive with a fully-lazy unrolled
plan and an unrolled-CTE DuckDB oracle — a form that cannot stretch to
production depth: every unrolled step references the previous word
table twice (pair argmax + merge application), so the lazy plan DOUBLES
per step. This module is the production form (round-7 verdict ask #4):
a driver LOOP that

- collapses the corpus ONCE into its word-frequency type table (the
  only corpus-sized aggregation — same structure as the 3-step chain),
- per merge iteration runs ONE |types|-sized pair-count job, collects
  the single argmax ROW (one row to the driver per iteration — the
  same legitimate pattern as collecting trained KMeans centroids; the
  corpus never moves), and applies the merge as a per-row fold with
  the pair inlined as literals,
- truncates lineage every ``checkpoint_every`` iterations with a lazy
  ``localCheckpoint`` so plan depth stays bounded at any merge count
  (the CC-fixpoint lesson: un-checkpointed iterative plans double).

Iteration cost is vocabulary-sized, never corpus-sized — the property
that makes tokenizer training feasible on a 100 TB corpus: at 64
merges the corpus is scanned once, and 64 small jobs run over |types|
rows. Semantics (pair counting weighted by word counts, (count desc,
pair asc) argmax ties, left-to-right non-overlapping fold) are
identical to the 3-step entries and pinned against the pure-Python
reference trainer in tests/test_r8_properties.py.

Reference parity note: behavior matches Sennrich et al. 2016 (the
public BPE algorithm); training stops early when no adjacent pair
remains (every word fully merged).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bpe_word_table(docs: DataFrame) -> DataFrame:
    """Collapse a corpus (``text`` column) into its type table:
    (word, cnt, syms) where syms is the character-split segmentation.
    The ONE corpus-sized aggregation of a BPE training run."""
    from idh_etl_demo_spark.operators.text import tokens

    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)),
    )
    return wc.select("word", "cnt", chars.alias("syms"))


def merge_pair_fold(syms: Column, ba: str, bb: str) -> Column:
    """Left-to-right non-overlapping application of ONE merge pair as a
    literal-inlined fold (the loop-trainer twin of catalog_r7's
    column-parameterized ``_bpe_merge_step``): append each symbol
    unless the accumulator ends with ``ba`` and the symbol is ``bb`` —
    then replace the tail with the merged token. Non-overlap falls out
    of the fold: the merged token can never equal ``ba`` (``bb`` is
    non-empty), so a fresh merge is never consumed as a left side
    within the same pass."""

    def step(acc: Column, s: Column) -> Column:
        do_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(ba))
            & (s == F.lit(bb))
        )
        return F.when(
            do_merge,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(ba + bb)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _adjacent_pairs(syms: Column) -> Column:
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of returning []
    # — single-symbol words need the explicit guard (engine gotcha
    # recorded in NOTES_r7 §5)
    return F.when(
        F.size(syms) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def bpe_train(
    words: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train up to ``n_merges`` BPE merges over a (word, cnt, syms)
    type table. Returns (merge_table, final_words): merge_table is the
    ordered list of (left, right, weighted_count) — the tokenizer
    artifact — and final_words the type table under all learned merges.

    Stops early when no adjacent pair remains. ``checkpoint_every``
    bounds lazy plan depth (results are checkpoint-invariant — asserted
    in tests); it trades a small materialization job per checkpoint
    for analysis time that would otherwise grow with every fold."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")

    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        best = (
            words.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("ba"), F.col("p.b").alias("bb"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "ba", "bb")
            .limit(1)
            .collect()
        )
        if not best:
            break
        ba, bb, c = best[0].ba, best[0].bb, int(best[0].c)
        merges.append((ba, bb, c))
        words = words.select(
            "word", "cnt", merge_pair_fold(F.col("syms"), ba, bb).alias("syms")
        )
        if (i + 1) % checkpoint_every == 0:
            # lazy: the next iteration's pair-count job materializes it
            words = words.localCheckpoint(eager=False)
    return merges, words
