"""Bloom-filter semi-join reduction: build a compact bitmap of the small
side's join keys, broadcast it, and drop non-matching big-side rows
BEFORE the exact join.

This is the classic 100 TB semi-join story (Spark's own runtime row-level
filtering — `spark.sql.optimizer.runtime.bloomFilter.enabled` — does the
same thing inside Catalyst when statistics justify it; this operator
makes the reduction explicit, tunable, and available when the planner's
heuristics don't fire, e.g. a join key derived by expression). The
filter has NO false negatives, so `bloom_join` is result-identical to a
plain inner join — the bloom stage only prunes rows that cannot match,
cutting the shuffle written by the big side from |big| to
|matching| + |false positives|.

Representation: the bitmap is a DataFrame of ``(word_idx int, bits
long)`` — only the non-zero 64-bit words of an ``num_bits``-wide bitmap.
It is built with one hash aggregate over the small side's keys (k
positions per key via seeded xxhash64), so the build is a normal
map-side-combined groupBy, and the result is at most ``num_bits/64``
rows (8 KiB of longs per 2^19 bits) — always broadcastable.

Probing is pure JVM expression work: each of the k probes is a broadcast
hash join against the word table plus a bitwise-AND filter; a big-side
row survives only if every probed bit is set. No Python touches the hot
path.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the default
m = 2^16 bits / k = 2 keeps fpp < 1% up to n ≈ 4k keys. Callers with
bigger build sides should scale ``num_bits`` (the words table grows
linearly but stays tiny: 2^24 bits = 256 K longs ≈ 4 MiB broadcast).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _positions(key_col: str, num_bits: int, num_hashes: int) -> list:
    """k bit positions for a key: pmod(xxhash64(key, seed_i), m)."""
    return [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 2,
) -> DataFrame:
    """Aggregate the distinct non-null keys of ``keys[key_col]`` into a
    sparse bitmap table ``(word_idx, bits)``; one hash aggregate, at most
    ``num_bits // 64`` output rows."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError("bloom_build: num_bits must be a positive multiple of 64")
    if num_hashes < 1:
        raise ValueError("bloom_build: num_hashes must be >= 1")
    nn = keys.select(key_col).filter(F.col(key_col).isNotNull())
    pos = reduce(
        DataFrame.union,
        [nn.select(p.alias("pos")) for p in _positions(key_col, num_bits, num_hashes)],
    )
    return (
        pos.groupBy(F.expr("pos div 64").cast("int").alias("word_idx"))
        .agg(
            F.bit_or(F.expr("shiftleft(1L, cast(pos % 64 as int))")).alias("bits")
        )
    )


def bloom_semi_filter(
    df: DataFrame,
    key_col: str,
    bloom_words: DataFrame,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 2,
) -> DataFrame:
    """Keep only rows of ``df`` whose ``key_col`` is *probably* in the
    bloom set (plus all null-key rows are dropped — they cannot match an
    inner join anyway). k broadcast hash joins + bitwise AND; columns of
    ``df`` pass through unchanged."""
    out = df.filter(F.col(key_col).isNotNull())
    for i in range(num_hashes):
        w = bloom_words.select(
            F.col("word_idx").alias(f"__bw{i}"), F.col("bits").alias(f"__bb{i}")
        )
        pos = f"pmod(xxhash64({key_col}, {i}), {num_bits})"
        mask = F.expr(f"shiftleft(1L, cast({pos} % 64 as int))")
        out = (
            out.join(
                broadcast(w),
                F.expr(f"cast({pos} div 64 as int)") == F.col(f"__bw{i}"),
                "inner",
            )
            .filter(F.col(f"__bb{i}").bitwiseAND(mask) != 0)
            .drop(f"__bw{i}", f"__bb{i}")
        )
    return out


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    num_bits: int = 1 << 16,
    num_hashes: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Exact ``big ⋈ small`` on column ``on`` with a bloom pre-filter on
    the big side. Result-identical to ``big.join(small, on, how)`` for
    ``how='inner'``/``'leftsemi'`` (no false negatives; false positives
    are removed by the exact join)."""
    if how not in ("inner", "leftsemi"):
        raise ValueError("bloom_join: only inner/leftsemi keep exact-join parity")
    words = bloom_build(small, on, num_bits=num_bits, num_hashes=num_hashes)
    pruned = bloom_semi_filter(
        big, on, words, num_bits=num_bits, num_hashes=num_hashes
    )
    return pruned.join(small, on, how)
