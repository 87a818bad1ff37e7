"""Exact-placement shard repartitioning — the range-sampling job killer.

`repartitionByRange(P, "shard")` gives perfectly contiguous, balanced
placement of the (few) shard groups onto P tasks, but RangePartitioning
runs a SEPARATE sampling job that re-executes the entire child plan
(parquet scan + docid join + projection) a second time before the real
shuffle — a full extra pass over the corpus, pure overhead at every
scale (at 10^12 turns it is an extra 10^12-row scan per build).

Hash repartitioning has no sampling pass, but `pmod(hash(shard), P)` is
a binomial scatter: with 32 shards into 8 tasks, the worst task draws
~1.5-2x the mean. This module gets BOTH properties: for each target
partition p we precompute (driver-side, closed-form) an integer key k_p
with `pmod(murmur3(k_p), P) == p`, then map each shard to the key of its
intended partition (sorted-rank * P // n_shards — the same contiguous
grouping rangepartitioning would pick) and hash-repartition on that key
column. One shuffle, zero sampling jobs, deterministic perfectly
balanced placement. Correctness never depends on placement (the shard
kernel only needs each shard's rows grouped), so a hash-function
mismatch could only ever cost balance — and the pytest pins our Python
Murmur3 to Spark's `F.hash` bit-for-bit.

Reference parity note: elasticsearch-lambda fixes placement with a
custom Partitioner over its shard routing (ESHadoopWriter's
num-reducers = num-shards contract); this is the Spark-native analog
without a private RDD partitioner.
"""
from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, functions as F

_M32 = 0xFFFFFFFF


def murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's `F.hash()` of a 4-byte int column: Murmur3_x86_32
    hashInt(value, seed) exactly (same mix/fmix constants, length 4),
    returned as a signed 32-bit int."""
    def rotl(v: int, r: int) -> int:
        return ((v << r) | (v >> (32 - r))) & _M32

    k1 = (x & _M32) * 0xCC9E2D51 & _M32
    k1 = rotl(k1, 15) * 0x1B873593 & _M32
    h1 = (seed ^ k1) & _M32
    h1 = (rotl(h1, 13) * 5 + 0xE6546B64) & _M32
    h1 ^= 4                      # fmix with byte length 4
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & _M32
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


@lru_cache(maxsize=64)
def partition_keys(p: int) -> tuple[int, ...]:
    """For each target partition id in [0, p), the smallest non-negative
    int k with pmod(murmur3(k), p) == pid. Driver-side search, expected
    O(p ln p) murmur evaluations — microseconds for any sane p."""
    keys: list[int | None] = [None] * p
    found, k = 0, 0
    while found < p:
        pid = murmur3_int32(k) % p          # python % is already pmod
        if keys[pid] is None:
            keys[pid] = k
            found += 1
        k += 1
    return tuple(keys)                       # type: ignore[arg-type]


def exact_shard_pkey(shards: list[int], p: int,
                     shard_col: str = "shard") -> Column:
    """Column expression mapping each shard id to the hash key of its
    intended partition: sorted rank r → partition r*p//n (contiguous
    groups, the rangepartition layout). Literal-map lookup — fine for
    the shard counts this engine uses (≤ thousands; vocabulary-scale
    literal blowup does not apply to shard ids)."""
    srt = sorted(shards)
    n = max(1, len(srt))
    keys = partition_keys(p)
    pairs: list[Column] = []
    for r, s in enumerate(srt):
        pairs.append(F.lit(int(s)))
        pairs.append(F.lit(int(keys[r * p // n])))
    return F.element_at(F.create_map(*pairs), F.col(shard_col))


def repartition_exact(df: DataFrame, shards: list[int], p: int,
                      shard_col: str = "shard") -> DataFrame:
    """Repartition `df` into `p` partitions with each shard's rows on
    exactly one task and contiguous shard ranks spread evenly — the
    rangepartition layout without the range-sampling pass. The helper
    key column never survives: it is dropped above the exchange."""
    p = max(1, int(p))
    return (df.withColumn("_pkey", exact_shard_pkey(shards, p, shard_col))
              .repartition(p, "_pkey")
              .drop("_pkey"))
