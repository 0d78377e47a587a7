"""Hot-bucket cap in MinHash LSH: a boilerplate-heavy corpus (many
near-identical docs → one degenerate band bucket) must expand a bounded
number of pairs, with the drops reported through the Observation — the
no-silent-caps rule."""

from __future__ import annotations

from pyspark.sql import Observation

from idh_etl_demo_spark.operators.dedup import minhash_lsh_candidates


def _boilerplate_corpus(spark, n=120):
    # identical text → identical minhash signature → one bucket per band
    rows = [(i, "terms of service apply to all users of this site") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_bucket_bounds_pair_expansion(spark):
    df = _boilerplate_corpus(spark, n=120)
    cap = 16
    obs = Observation()
    pairs = minhash_lsh_candidates(df, max_bucket=cap, observation=obs)
    n_pairs = pairs.count()
    # all docs identical → every band holds the same capped member set, so
    # distinct pairs collapse to one bucket's worth: exactly C(cap, 2)
    assert n_pairs == cap * (cap - 1) // 2, n_pairs
    # 4 bands × (120 - 16) docs dropped per bucket, reported not silent
    got = obs.get
    assert got["capped_buckets"] == 4
    assert got["dropped_docs"] == 4 * (120 - 16)


def test_uncapped_bucket_is_quadratic(spark):
    # the behavior the cap exists to prevent (kept small here)
    df = _boilerplate_corpus(spark, n=40)
    pairs = minhash_lsh_candidates(df)
    assert pairs.count() == 40 * 39 // 2


def test_cap_preserves_transitive_linkage(spark):
    """Dedup correctness under the cap: kept representatives still link
    every capped-out doc to the cluster via the kept members? No — the
    capped-out docs lose their pairs entirely; what survives is a
    consistent representative subset. Assert the surviving pair set is
    exactly over the first-cap ids (deterministic truncation)."""
    df = _boilerplate_corpus(spark, n=30)
    cap = 5
    pairs = minhash_lsh_candidates(df, max_bucket=cap)
    ids = {r.id_a for r in pairs.collect()} | {r.id_b for r in pairs.collect()}
    assert ids == set(range(cap))


def test_jaccard_hot_shingle_cap_bounds_and_reports(spark):
    """A boilerplate corpus (every doc shares one shingle set) expands
    C(n,2) pairs per shingle; the cap bounds that and reports truncation."""
    from pyspark.sql import Observation
    from idh_etl_demo_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "common boilerplate header text shared by all") for i in range(20)],
        "doc_id long, text string",
    )
    obs = Observation()
    capped = ngram_jaccard_pairs(
        docs, threshold=0.0, max_docs_per_shingle=5, observation=obs
    )
    n_pairs = capped.count()
    assert n_pairs == 10  # C(5,2): bounded, not C(20,2)=190
    assert obs.get["capped_shingles"] > 0
    assert obs.get["dropped_members"] > 0
    # uncapped baseline still produces the full expansion
    full = ngram_jaccard_pairs(docs, threshold=0.0)
    assert full.count() == 190


def test_blocked_pairs_hot_block_cap_bounds_and_reports(spark):
    """ER blocking: one degenerate block (common leading token) must not
    expand quadratically in a single task — max_block bounds the pair
    count to C(cap, 2) and the Observation reports the truncation."""
    from pyspark.sql import Observation

    from idh_etl_demo_spark.operators.dedup import blocked_pairs

    rows = [(f"the name {i:04d}", "the") for i in range(200)] + [
        ("other alpha", "other"),
        ("other beta", "other"),
    ]
    df = spark.createDataFrame(rows, "name string, block_key string")
    cap = 8
    obs = Observation()
    pairs = blocked_pairs(df, "name", "block_key", max_block=cap, observation=obs)
    rows_out = pairs.collect()
    hot = [r for r in rows_out if r.value_a.startswith("the")]
    assert len(hot) == cap * (cap - 1) // 2  # bounded, not C(200,2)=19900
    # the small block is untouched
    assert ("other alpha", "other beta") in {
        (r.value_a, r.value_b) for r in rows_out
    }
    assert obs.get["capped_blocks"] == 1
    assert obs.get["dropped_values"] == 200 - cap
    # truncation is deterministic: survivors are the cap-first sorted names
    survivors = {r.value_a for r in hot} | {r.value_b for r in hot}
    assert survivors == {f"the name {i:04d}" for i in range(cap)}


def test_blocked_pairs_uncapped_matches_oracle_shape(spark):
    from idh_etl_demo_spark.operators.dedup import blocked_pairs

    rows = [("aa", "k1"), ("ab", "k1"), ("ac", "k1"), ("zz", "k2")]
    df = spark.createDataFrame(rows, "name string, block_key string")
    got = {
        (r.value_a, r.value_b)
        for r in blocked_pairs(df, "name", "block_key").collect()
    }
    assert got == {("aa", "ab"), ("aa", "ac"), ("ab", "ac")}
