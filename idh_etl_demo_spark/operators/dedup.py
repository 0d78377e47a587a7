"""Deduplication family — exact and near-duplicate, designed for 100 TB.

Exact dedup is a hash group-by (one shuffle on the content hash, map-side
partial aggregation). Near-dup avoids the quadratic all-pairs comparison:
MinHash banding / SimHash buckets turn it into an equi-join on band keys —
a plain shuffle join Catalyst can plan, prune, and skew-split.

All hashes are md5-derived (functions/hashing.py) so results are
deterministic and reproducible against any SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from idh_etl_demo_spark.functions.hashing import MERSENNE_31, MINHASH_PARAMS, md5_long


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[Column] | None = None
) -> DataFrame:
    """Keep exactly one row per key tuple, deterministically.

    pandas ``drop_duplicates`` keeps the first row in file order
    (reference: dags/idh_etl.py:216, src/weather.py:88,141) — which is not
    reproducible on a distributed read. We impose an explicit total order:
    by default all non-key columns ascending, nulls last (SURVEY §7 hard
    part 1).
    """
    if order_by is None:
        order_by = [F.asc_nulls_last(c) for c in df.columns if c not in keys]
    if not order_by:  # key-only relation: any row of the group is identical
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Text shingling
# ---------------------------------------------------------------------------


def normalize_text(text: Column) -> Column:
    """Lowercase, collapse whitespace — the canonical form all dedup
    operators hash."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (array<string>) of a document, built with
    array expressions only — no UDF, no explode unless the caller asks."""
    words = F.split(normalize_text(text), " ")
    k = F.size(words) - F.lit(n - 1)
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty
    grams = F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized content; survivor = lowest id.

    Single shuffle on the md5 of normalized text. At 100 TB the 16-byte
    digest shuffles instead of the document bodies.
    """
    hashed = df.withColumn("content_hash", F.md5(normalize_text(F.col(text_col))))
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature_cols(
    df: DataFrame, text_col: str, num_hashes: int, shingle_n: int = 3
) -> DataFrame:
    """Attach ``mh0..mh{k-1}`` MinHash columns (portable universal-hash
    family over md5'd shingles; functions/hashing.py)."""
    base = F.transform(
        word_shingles(F.col(text_col), shingle_n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(MERSENNE_31),
    )
    # one pass over the shingle hashes with an array-of-minima
    # accumulator (same construction as simhash's counter array): all k
    # permutation minima update per element, instead of k array_min
    # scans — ~25% faster at sf0.1, identical values. The init array of
    # MERSENNE_31 doubles as the empty-shingle-set sentinel the old
    # per-column coalesce provided.
    a_params = F.array(*[F.lit(MINHASH_PARAMS[i][0]) for i in range(num_hashes)])
    b_params = F.array(*[F.lit(MINHASH_PARAMS[i][1]) for i in range(num_hashes)])
    pos = F.sequence(F.lit(1), F.lit(num_hashes))
    sig = F.aggregate(
        base,
        F.array_repeat(F.lit(MERSENNE_31).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            pos,
            lambda m, i: F.least(
                m,
                (
                    h * F.element_at(a_params, i.cast("int"))
                    + F.element_at(b_params, i.cast("int"))
                )
                % F.lit(MERSENNE_31),
            ),
        ),
    )
    out = df.withColumn("__sig", sig)
    for i in range(num_hashes):
        out = out.withColumn(f"mh{i}", F.element_at("__sig", i + 1))
    return out.drop("__sig")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    num_partitions: int | None = None,
    max_bucket: int | None = None,
    observation=None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding.

    rows × O(1) work; candidates surface through an equi-join on
    (band index, band key) — documents agreeing on ALL rows of any band
    collide. Returns distinct (id_a, id_b) with id_a < id_b.

    Scale shape: signature computation is a projection; the self-join
    shuffles only (band_key, id) pairs, never the text. Hot buckets
    (boilerplate docs) are the skew risk: a degenerate bucket of B docs
    expands B²/2 pairs inside ONE task. ``max_bucket`` bounds that —
    each bucket keeps its first ``max_bucket`` members (by sorted id,
    deterministic) so per-task work is ≤ C(max_bucket, 2). No silent
    caps: pass a ``pyspark.sql.Observation`` as ``observation`` and the
    candidate action reports ``capped_buckets``/``dropped_docs`` — at
    100 TB wire that into the run-audit. Truncation is a bounded RECALL
    LOSS, not a free pass: a capped-out member contributes no pairs from
    that bucket, so unless it collides in another band it is NOT deduped
    downstream — duplicates beyond the cap survive as keepers. The
    Observation counters exist precisely so callers can audit the loss
    and re-run the flagged buckets at a higher cap (or a finer banding)
    when the drop count is material.
    """
    rows_per_band = num_hashes // bands
    if num_partitions:
        # signature computation is the CPU-heavy narrow stage — spread it
        # before projecting (source files may be few/large splits)
        df = df.repartition(num_partitions)
    sigs = minhash_signature_cols(df, text_col, num_hashes, shingle_n)
    band_cols = [
        F.concat_ws(
            "_",
            F.lit(b),
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        F.col(id_col),
        # explode_outer: see ngram_jaccard_pairs — explode's implicit
        # non-empty filter would re-evaluate the signature expressions
        # below the repartition exchange
        F.explode_outer(F.array(*band_cols)).alias("band_key"),
    ).filter(F.col("band_key").isNotNull())
    # group-then-expand instead of a self-join: the signature pipeline runs
    # ONCE and candidates need a single shuffle (a self-join would execute
    # the whole upstream plan twice — no exchange reuse across a broadcast).
    grouped = (
        banded.groupBy("band_key")
        .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        grouped = grouped.withColumn("__n", F.size("ids")).withColumn(
            "ids", F.slice("ids", 1, max_bucket)
        )
        if observation is not None:
            grouped = grouped.observe(
                observation,
                F.sum(
                    F.when(F.col("__n") > max_bucket, 1).otherwise(0)
                ).alias("capped_buckets"),
                F.sum(F.greatest(F.col("__n") - max_bucket, F.lit(0))).alias(
                    "dropped_docs"
                ),
            )
        grouped = grouped.drop("__n")
    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids)),
                lambda y: F.struct(
                    F.get(ids, i - 1).alias("id_a"), y.alias("id_b")
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash fingerprint (bit-majority over token hashes).

    For each bit j: sign of Σ_tokens (±1 depending on bit j of md5(token)).
    Distinct tokens are used (set semantics) so the fingerprint is
    insensitive to token repetition — near-identical docs land at small
    Hamming distance. Pure array/bitwise expressions; one projection.
    """
    tokens = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    hashes = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )

    # single pass over the token hashes with an array-of-counters
    # accumulator — one F.aggregate instead of ``bits`` separate ones.
    # Bit-identical to the per-bit formulation but 4-5x faster measured
    # at sf0.1 (the multi-aggregate version re-walks the hash array once
    # per bit and pays ``bits`` codegen'd expression trees).
    # shiftright/shiftleft need literal counts, so bit j is tested with
    # a pow(2, j) mask — powers of two are exact in doubles, and the
    # long cast makes the mask exact for every j < 63.
    def mask(j: F.Column) -> F.Column:
        return F.pow(F.lit(2.0), j.cast("double")).cast("long")

    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            positions,
            lambda a, j: a + F.when(h.bitwiseAND(mask(j)) != 0, 1).otherwise(-1),
        ),
    )
    fingerprint = F.aggregate(
        F.zip_with(
            counts,
            positions,
            lambda c, j: F.when(c > 0, mask(j)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), fingerprint.alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup measure; the verifier for LSH candidates)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    num_partitions: int | None = None,
    max_docs_per_shingle: int | None = None,
    observation=None,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for all pairs sharing
    ≥1 shingle; returns pairs with similarity ≥ threshold.

    Shape: explode to (shingle, id, |set|), group by shingle, expand each
    bucket to its id pairs (set sizes ride along, so no extra joins), then
    count pair occurrences — that count IS |A∩B| and |A∪B| follows from
    the attached sizes. The whole shingle pipeline executes ONCE (a naive
    self-join + two size joins would run it four times) and the pair
    aggregation benefits from map-side partial combine. Exact but
    Σ freq²-quadratic in hot-shingle buckets — use as the VERIFY stage
    after minhash_lsh_candidates at extreme scale, or standalone on
    moderate corpora.
    """
    if num_partitions:
        df = df.repartition(num_partitions)
    shingled = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    # explode_outer, NOT explode: explode's implicit "array non-empty"
    # filter gets pushed below the repartition exchange, where it
    # re-evaluates the whole shingle expression on the un-parallelized
    # input. explode_outer adds no filter; dropping the null rows after the
    # generate is a cheap column-reference predicate.
    exploded = (
        shingled.select(
            F.col(id_col).alias("id"),
            F.size("sh").alias("sz"),
            F.explode_outer("sh").alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
        .withColumn("shingle", F.md5("shingle"))
    )
    grouped = (
        exploded.groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.struct("id", "sz"))).alias("members"))
        .filter(F.size("members") >= 2)
    )
    if max_docs_per_shingle is not None:
        # hot-shingle cap (same policy as minhash_lsh_candidates): the
        # Σ freq² term is bounded to C(cap, 2) per shingle. Dropping tail
        # members UNDERCOUNTS intersections for pairs that only co-occur
        # in capped shingles, so capped runs are a lower-bound filter —
        # position it as the approximate verify mode for boilerplate-heavy
        # corpora and report truncation via the Observation (no silent
        # caps).
        grouped = grouped.withColumn("__n", F.size("members")).withColumn(
            "members", F.slice("members", 1, max_docs_per_shingle)
        )
        if observation is not None:
            grouped = grouped.observe(
                observation,
                F.sum(
                    F.when(F.col("__n") > max_docs_per_shingle, 1).otherwise(0)
                ).alias("capped_shingles"),
                F.sum(
                    F.greatest(F.col("__n") - max_docs_per_shingle, F.lit(0))
                ).alias("dropped_members"),
            )
        grouped = grouped.drop("__n")
    members = F.col("members")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(members) - 1),
            lambda i: F.transform(
                F.slice(members, i + 1, F.size(members)),
                lambda y: F.struct(
                    F.get(members, i - 1).getField("id").alias("id_a"),
                    F.get(members, i - 1).getField("sz").alias("size_a"),
                    y.getField("id").alias("id_b"),
                    y.getField("sz").alias("size_b"),
                ),
            ),
        )
    )
    pairs = grouped.select(F.explode(combos).alias("p")).select(
        "p.id_a", "p.size_a", "p.id_b", "p.size_b"
    )
    return (
        pairs.groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    blocks: int = 4,
    max_hamming: int = 3,
    num_partitions: int | None = None,
    max_bucket: int | None = None,
    observation=None,
) -> DataFrame:
    """Near-dup pairs at Hamming distance ≤ ``max_hamming`` between
    SimHash fingerprints — the SimHash INDEX, not just the fingerprint.

    Pigeonhole banding makes it complete without an all-pairs scan: split
    the ``bits``-bit fingerprint into ``blocks`` equal blocks; two
    fingerprints within Hamming distance < ``blocks`` must agree EXACTLY
    on at least one block, so an equi-join on (block index, block value)
    surfaces every qualifying pair (requires ``max_hamming < blocks``).
    Group-then-expand carries (id, simhash) structs through the bucket
    shuffle, so the exact Hamming check runs in-bucket with no join back
    to the fingerprint table.

    Scale: candidates are bucketed by block value — work is Σ B²/2 over
    bucket sizes, not N²/2, and ``max_bucket`` bounds the hot-bucket tail
    (a 16-bit/4-block config on a templated 5k-doc corpus measured 64 s
    from one degenerate bucket; 32-bit/4-block runs in ~2 s — block
    cardinality is the lever). At corpus scale use bits=64, blocks=7-8
    (Manku et al.'s WWW'07 configuration): more blocks → smaller buckets
    and a higher complete-detection radius.
    """
    if max_hamming >= blocks:
        raise ValueError("completeness requires max_hamming < blocks")
    if bits % blocks:
        raise ValueError("bits must divide evenly into blocks")
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1
    if num_partitions:
        df = df.repartition(num_partitions)
    sigs = simhash(df, text_col, id_col, bits)
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(blocks)
        ]
    )
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode_outer(block_structs).alias("b"),
    ).select("id", "simhash", "b.blk", "b.val")
    grouped = (
        banded.groupBy("blk", "val")
        .agg(
            F.array_sort(
                F.collect_set(F.struct(F.col("id"), F.col("simhash")))
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    if max_bucket is not None:
        # same hot-bucket policy as minhash_lsh_candidates: bound per-task
        # pair expansion to C(max_bucket, 2); truncation is reported via
        # the caller's Observation (no silent caps). It is a bounded
        # recall loss: capped-out members emit no pairs from this block
        # and are only caught if another of their blocks matches — audit
        # the counters and re-run hot buckets when the drops matter.
        grouped = grouped.withColumn("__n", F.size("members")).withColumn(
            "members", F.slice("members", 1, max_bucket)
        )
        if observation is not None:
            grouped = grouped.observe(
                observation,
                F.sum(
                    F.when(F.col("__n") > max_bucket, 1).otherwise(0)
                ).alias("capped_buckets"),
                F.sum(F.greatest(F.col("__n") - max_bucket, F.lit(0))).alias(
                    "dropped_docs"
                ),
            )
        grouped = grouped.drop("__n")
    ms = F.col("members")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ms) - 1),
            lambda i: F.transform(
                F.slice(ms, i + 1, F.size(ms)),
                lambda y: F.struct(
                    F.get(ms, i - 1)["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    F.bit_count(
                        F.get(ms, i - 1)["simhash"].bitwiseXOR(y["simhash"])
                    ).alias("hamming"),
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Generic ER blocking (capped block join for fuzzy matching)
# ---------------------------------------------------------------------------


def blocked_pairs(
    df: DataFrame,
    value_col: str,
    block_col: str,
    max_block: int | None = None,
    observation=None,
) -> DataFrame:
    """Candidate ``(value_a, value_b)`` pairs within each block — the
    blocking primitive for entity resolution. Expressed as
    group-then-expand rather than a self-join, so the upstream plan runs
    ONCE and one shuffle produces the buckets; the expensive pair
    predicate (edit distance etc.) is applied by the caller to the
    expanded pairs only. Pairs are emitted with value_a < value_b
    (array_sort order), distinct across blocks.

    Scale shape: work is Σ B²/2 over block sizes, not N²/2 over the
    corpus. The skew risk is a degenerate block — a common leading token
    ("the" in a real-name corpus) expands quadratically inside ONE task.
    ``max_block`` bounds that: each block keeps its first ``max_block``
    members by sorted value (deterministic), so per-task work is
    ≤ C(max_block, 2). Truncation is a bounded RECALL LOSS — capped-out
    members emit no pairs from that block and are simply not matched;
    pass an ``Observation`` to get ``capped_blocks``/``dropped_values``
    reported at the terminal action (no silent caps), and recover
    escapes with a second blocking pass on an orthogonal key.
    """
    grouped = (
        df.groupBy(block_col)
        .agg(F.array_sort(F.collect_set(value_col)).alias("vals"))
        .filter(F.size("vals") >= 2)
    )
    if max_block is not None:
        grouped = grouped.withColumn("__n", F.size("vals")).withColumn(
            "vals", F.slice("vals", 1, max_block)
        )
        if observation is not None:
            grouped = grouped.observe(
                observation,
                F.sum(
                    F.when(F.col("__n") > max_block, 1).otherwise(0)
                ).alias("capped_blocks"),
                F.sum(F.greatest(F.col("__n") - max_block, F.lit(0))).alias(
                    "dropped_values"
                ),
            )
        grouped = grouped.drop("__n")
    vals = F.col("vals")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(vals) - 1),
            lambda i: F.transform(
                F.slice(vals, i + 1, F.size(vals)),
                lambda y: F.struct(
                    F.get(vals, i - 1).alias("value_a"), y.alias("value_b")
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(combos).alias("p"))
        .select("p.value_a", "p.value_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Cross-snapshot dedup
# ---------------------------------------------------------------------------


def snapshot_dedup_status(batch: DataFrame, snapshot: DataFrame) -> DataFrame:
    """Classify an incoming batch against an EXISTING keeper snapshot —
    the production shape of dedup once a corpus is published: the
    snapshot is immutable; only the new batch gets verdicts.

    ``batch``: (doc_id, content_hash). ``snapshot``: (content_hash,
    snap_keeper). Returns (doc_id, status, keeper_id):

    - ``dup_of_snapshot`` — hash already published; keeper_id = the
      snapshot keeper (stable across batches, never reassigned);
    - ``dup_in_batch``  — hash new to the snapshot but an earlier
      (min-doc_id) row of THIS batch owns it;
    - ``new``           — first sighting anywhere; keeper_id null.

    Scale shape: everything joins on content_hash, so only 16-byte
    digests flow — never document bodies. At 100 TB the snapshot is the
    big side and lives as a table BUCKETED by content_hash
    (operators/merge.py's bucketed-sink layout): the probe then
    shuffles ONLY the incoming batch into the snapshot's bucketing
    while the snapshot itself is read pre-clustered, no re-shuffle —
    plan-asserted in tests/test_bucketing.py. The batch-internal min is
    a map-side-combined aggregate over the (small) batch.
    """
    batch_min = batch.groupBy("content_hash").agg(
        F.min("doc_id").alias("batch_keeper")
    )
    return (
        batch.join(snapshot, "content_hash", "left")
        .join(batch_min, "content_hash", "left")
        .select(
            "doc_id",
            F.when(F.col("snap_keeper").isNotNull(), "dup_of_snapshot")
            .when(F.col("doc_id") != F.col("batch_keeper"), "dup_in_batch")
            .otherwise("new")
            .alias("status"),
            F.when(F.col("snap_keeper").isNotNull(), F.col("snap_keeper"))
            .when(
                F.col("doc_id") != F.col("batch_keeper"), F.col("batch_keeper")
            )
            .alias("keeper_id"),
        )
    )


# ~128 MB of 16-byte hashes — the point where a broadcast table stops
# being "free on every executor" and starts evicting the working set.
BROADCAST_MEMBERSHIP_MAX = 8_000_000

# Gating-count memo: (applicationId, key-plan semantic hash) -> count.
# Repeated builder constructions over the same key set (the driver's
# double evaluation, the oracle sweep, bench reps) would otherwise
# re-run the whole key-side job per build just to pick a join strategy
# (ADVICE r8). A semantic-hash collision could at worst pick the other
# STRATEGY — both strategies return identical rows, so correctness is
# unaffected. Bounded: one int per distinct key plan per session.
_GATING_COUNTS: dict[tuple[str, int], int] = {}


def membership_semi_join(
    left: DataFrame,
    keys: DataFrame,
    on: str,
    *,
    keys_count: int | None = None,
    broadcast_max_rows: int = BROADCAST_MEMBERSHIP_MAX,
) -> DataFrame:
    """Semi-join ``left`` against a distinct key set on column ``on``,
    choosing the physical strategy by key-set SIZE (round-7 verdict
    ask #6, the passage-decontamination production shape):

    - small key set (a benchmark suite's chunk/gram hashes): broadcast
      semi-join — the big corpus side gains NO shuffle for membership;
    - large key set (an entire held-out corpus): shuffle semi-join on
      the key — broadcasting it would OOM every executor, and the
      shuffle moves only the 16-byte keys plus ``left``'s key column,
      never document text.

    ``keys_count``: pass when the caller already knows the size (skips
    the gating count job). When omitted, the count is memoized per
    (session, key-plan) — repeated builds of the same entry pay the
    gating job once. The threshold is row-count-based because the
    key sets this gates are fixed-width hashes; callers with wide keys
    should lower ``broadcast_max_rows`` accordingly.
    """
    if keys_count is not None:
        n = keys_count
    else:
        memo_key = (
            keys.sparkSession.sparkContext.applicationId,
            keys.semanticHash(),
        )
        if memo_key not in _GATING_COUNTS:
            _GATING_COUNTS[memo_key] = keys.count()
        n = _GATING_COUNTS[memo_key]
    if n <= broadcast_max_rows:
        return left.join(F.broadcast(keys), on, "left_semi")
    return left.join(keys.hint("shuffle_hash"), on, "left_semi")
