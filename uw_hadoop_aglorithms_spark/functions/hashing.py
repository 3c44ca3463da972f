"""Engine-neutral deterministic hashing (dedup / fingerprint foundation).

The reference repo has no hashing beyond Hadoop partitioners
(reference MapReduce/Bigram/ComputeBigramRelativeFrequency.java:112-117);
the dedup/fingerprint family is a beyond-reference capability. Spark's
built-in `hash`/`xxhash64` are Murmur3/XXH64 — DuckDB cannot reproduce
them, which would make MinHash/SimHash oracles impossible. So the engine
defines ONE portable hash — a 31-ary polynomial rolling hash mod a prime
— expressible as pure column arithmetic in BOTH Spark (Catalyst
`aggregate` over chars, whole-stage codegen) and DuckDB (`list_reduce`),
verified bit-identical in tests/test_dedup.py.

Universal family: h_i(x) = (A_i * polyhash(x) + B_i) mod P, with (A_i,
B_i) derived from fixed multiplicative constants — deterministic across
runs, engines, and partitionings. All arithmetic stays within int64:
polyhash < P ≈ 2^30, A_i < P, so A_i*ph < 2^60.

Scale note: per-char folding is O(len) JVM work inside codegen with no
Python, no shuffle, and no state — it scales linearly and partitions
trivially. At 100 TB the hash cost is dominated by the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Prime modulus (fits in int32; fold step stays < 2^36).
P = 1_000_000_007

#: Knuth multiplicative constant — seeds the universal-hash family.
_MULT = 2_654_435_761


def hash_params(i: int) -> tuple[int, int]:
    """(A_i, B_i) for family member i; A_i is never 0."""
    a = (i * _MULT + 1) % P
    b = (i * 40_503 + 17) % P
    return (a or 1, b)


def polyhash(col: Column | str) -> Column:
    """string → int64 in [0, P): fold (acc*31 + ascii(char)) % P.

    Pure Catalyst expression (split/aggregate/ascii) — JVM-side,
    codegen-friendly, zero Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(P),
    )


def uhash(col: Column, i: int) -> Column:
    """Universal-family member i applied to an already-polyhashed int64."""
    a, b = hash_params(i)
    return (col * F.lit(a) + F.lit(b)) % F.lit(P)


def polyhash_sql(expr: str) -> str:
    """DuckDB fragment computing polyhash() of a string SQL expression."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, c) -> (acc*31 + c) % {P})"
    )


def uhash_sql(expr: str, i: int) -> str:
    """DuckDB fragment for uhash(i) of an int64 SQL expression."""
    a, b = hash_params(i)
    return f"(({expr}) * {a} + {b}) % {P}"


def bucket(key: Column | str, seed: int, buckets: int) -> Column:
    """int64 key → uniform bucket in [0, buckets).

    The `% P` before the multiply keeps the product inside int64 for any
    key magnitude (A < P ≈ 2^30, so (key % P) * A < 2^60) — safe for
    100-TB-scale id spaces, not just the testdata's.
    """
    a, b = hash_params(seed)
    c = F.col(key) if isinstance(key, str) else key
    return ((c % P) * F.lit(a) + F.lit(b)) % F.lit(P) % F.lit(buckets)


def bucket_sql(expr: str, seed: int, buckets: int | str) -> str:
    """DuckDB fragment computing the identical bucket (buckets may be a
    SQL subexpression, e.g. a scalar subquery sizing a synthetic graph)."""
    a, b = hash_params(seed)
    return f"((({expr}) % {P}) * {a} + {b}) % {P} % ({buckets})"
