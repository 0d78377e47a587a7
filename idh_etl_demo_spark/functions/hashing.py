"""Deterministic, engine-portable hashing expressions.

Spark's native ``hash``/``xxhash64`` are fast but engine-specific; queries
whose results must be reproducible against any ANSI-SQL oracle (and stable
across Spark versions) use md5-derived integers instead:

    Spark :  conv(substring(md5(s), 1, 15), 16, 10)::bigint
    DuckDB:  ('0x' || substring(md5(s), 1, 15))::bigint

Both yield the same non-negative value < 2^60. MinHash then applies the
classic universal-hash family ``(a*h + b) mod p`` with fixed constants and
p = 2^31 - 1, so every intermediate product stays < 2^63 (exact in int64)
and signatures are identical in every engine that can md5.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# Mersenne prime 2^31 - 1. Hash values are first reduced mod p, so
# a * h < 2^31 * 2^31 = 2^62 — exact in int64 arithmetic everywhere.
MERSENNE_31 = (1 << 31) - 1


def _lcg_params(n: int) -> list[tuple[int, int]]:
    """Fixed pseudo-random (a, b) pairs from a seeded LCG — deterministic
    across runs/engines, no RNG state at query time."""
    state = 0x5DEECE66D
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE_31 - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_31
        out.append((a, b))
    return out


MINHASH_PARAMS = _lcg_params(64)


def md5_long(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def md5_long_mod_p(col: Column) -> Column:
    """md5-derived hash reduced into [0, 2^31-1) — the MinHash input domain."""
    return md5_long(col) % F.lit(MERSENNE_31)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<long>) of an array-of-strings column.

    ``min over shingles of (a_i * (md5_long(s) mod p) + b_i) mod p`` per
    hash i. Empty shingle sets get p (sentinel max) so they never collide
    with real content. Evaluates as one codegen'd projection — no UDF,
    no shuffle.
    """
    base = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % F.lit(MERSENNE_31),
    )
    sig = []
    for i in range(num_hashes):
        a, b = MINHASH_PARAMS[i]
        hashed = F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_31))
        sig.append(F.coalesce(F.array_min(hashed), F.lit(MERSENNE_31)))
    return F.array(*sig)
