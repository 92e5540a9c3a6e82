"""Distributed Bloom-filter build and probe for semi-join prefiltering.

The 100 TB problem this solves: decontamination/dedup joins (q106/q139)
broadcast a DISTINCT key set whose size is the eval benchmark's gram count
times ~32 bytes per digest. A Bloom filter compresses that to m bits
REGARDLESS of key width — 1% FPR at ~9.6 bits/key — so the thing shipped
to every executor shrinks ~25x, and the (rare) false positives are killed
by an exact join that now touches only the prefiltered survivors. The
candidate-then-verify discipline (q163's sketch shape): the sketch routes,
the exact pass decides, so results are bit-identical to the plain join.

Layout (round 12): SPLIT-BLOCK bloom — the cache-local variant parquet's
own bloom filters use (parquet-format BloomFilter.md; Putze et al.,
"Cache-, Hash- and Space-Efficient Bloom Filters"). One xxhash64 picks a
256-bit block; the key's 8 bits all live inside that block, one per
32-bit lane, at positions derived from a second 32-bit hash times the
spec's 8 odd SALT constants (>> 27 keeps the top 5 bits — a lane-local
position). Every build/probe therefore touches exactly ONE cache line
regardless of filter size. The classic scattered-k-bit layout went
super-linear in WALL TIME the moment the bitmap outgrew the CPU cache
(measured on the 6.4x same-session lever: q190's sf3.2->sf6.4 leg read
a=1.38 while every stage's row counts scaled linearly — the bitmap
crossed ~1 MB between those points and each of the k probes became a
cache miss). Blocked probes cost one potential miss per KEY, not per
bit, at any scale — the same reason parquet chose this layout. The price
is ~25% more bits per key at equal FPR (sized in optimal_params, audited
by q190's 3x-margin oracle and the pytest FPR property).

Build is one Arrow pass: block index + lane hash computed JVM-side
(xxhash64 — vectorized, engine-deterministic), partitions OR their local
bitmaps, and the per-partition bitmaps fold elementwise to the final
bitmap — the kmeans/second_moments reduce shape. The bitmap is bounded
model state (m bits by construction, ceiling-checked against
MAX_M_BITS), so holding it driver-side is the centroid/codebook pattern,
not a corpus-sized collect; the probe pass receives it as a
torrent-broadcast variable — fetched once per executor, never serialized
into task closures.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Driver-memory ceiling for the folded bitmap — the recorded bound in the
# BROADCAST_ALLOWLIST style: the bitmap is model state BY CONSTRUCTION
# (m bits, set when the filter is sized, independent of corpus row count),
# and this constant pins how large that construction may get. 2^33 bits =
# 1 GiB of driver heap, ~900M keys at 1% FPR. Beyond it, shard the filter
# (split the key space, one filter per shard) instead of raising the cap —
# a single larger bitmap also costs every executor that much resident
# memory, so sharding is the correct scale path, not bigger broadcasts.
MAX_M_BITS = 1 << 33


# The 8 odd salt constants from the parquet-format bloom spec: lane i's
# bit position is the top 5 bits of (h32 * SALT[i]) mod 2^32.
_SBBF_SALT = np.array(
    [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
     0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
    dtype=np.uint32,
)
_LANES = 8
_BLOCK_BITS = 256


def optimal_params(n_keys: int, fpr: float) -> tuple[int, int]:
    """Split-block sizing (parquet-format BloomFilter.md):
    m = -8n / ln(1 - fpr^(1/8)) bits for the 8-lane block layout, plus
    25% headroom for block-load Poisson variance (the spec formula holds
    at the MEAN block load; convexity pushes realized FPR above it), m
    rounded up to whole 256-bit blocks. Returns (m_bits, 8) — the lane
    count is fixed by the layout. Raises once the bitmap would exceed
    the documented driver/executor ceiling (MAX_M_BITS) — the caller
    should shard the key space instead."""
    n_keys = max(n_keys, 1)
    m = -_LANES * n_keys / math.log(1.0 - fpr ** (1.0 / _LANES))
    m = int(math.ceil(m * 1.25))
    m = ((m + _BLOCK_BITS - 1) // _BLOCK_BITS) * _BLOCK_BITS
    if m > MAX_M_BITS:
        raise ValueError(
            f"bloom filter of {m} bits exceeds MAX_M_BITS={MAX_M_BITS} "
            f"(~{MAX_M_BITS >> 33} GiB); shard the key space into "
            f"{math.ceil(m / MAX_M_BITS)} filters instead"
        )
    return m, _LANES


def _check_params(m_bits: int, k: int) -> None:
    """Contract guard shared by build_bloom/probe_bloom: the split-block
    layout only supports whole 256-bit blocks (a silent max(1, m//256)
    remap would hand back a filter of a DIFFERENT size than requested)
    and exactly 8 hash lanes (the salt table's length)."""
    if m_bits <= 0 or m_bits % _BLOCK_BITS != 0:
        raise ValueError(
            f"m_bits={m_bits} is not a positive multiple of "
            f"{_BLOCK_BITS}; size the filter with optimal_params()"
        )
    if k != _LANES:
        raise ValueError(
            f"split-block bloom filters have exactly {_LANES} lanes; "
            f"got k={k}"
        )


def _hash_cols(col: Column, n_blocks: int) -> Column:
    """[block index, 32-bit lane hash] per value — computed JVM-side
    (xxhash64, vectorized, no Python in the hash path) and identical for
    build and probe by construction."""
    return F.array(
        F.pmod(F.xxhash64(col, F.lit(0)), F.lit(n_blocks)),
        F.pmod(F.xxhash64(col, F.lit(1)), F.lit(1 << 32)),
    )


def _lane_words_and_bits(pos: "np.ndarray") -> tuple:
    """(n, 2) [block, h32] -> per-lane word indices (n, 8) into the
    uint32 bitmap and bit positions (n, 8). Pure uint32 arithmetic —
    wraparound multiply is the spec's behavior."""
    blk = pos[:, 0].astype(np.int64)
    h = pos[:, 1].astype(np.uint32)
    bitpos = ((h[:, None] * _SBBF_SALT[None, :]) >> np.uint32(27)).astype(np.uint32)
    words = blk[:, None] * _LANES + np.arange(_LANES, dtype=np.int64)[None, :]
    return words, bitpos


def build_bloom(df: DataFrame, col: str, m_bits: int, k: int) -> np.ndarray:
    """One pass over df[col]: returns the filter as a uint32 bitmap array
    of length m_bits/32 (8 lane words per 256-bit block). Nulls are
    skipped (a null key joins nothing).

    The per-partition bitmaps fold by NUMPY OR over raw binary buffers in
    two stages (coalesced Arrow pass, then a <=8-row driver fold of m-bit
    model state — annotated bounded collect). The previous fold — an
    interpreted F.aggregate/zip_with over collect_list — evaluated
    O(partitions x m/64) lambdas in ONE task; since m grows with the key
    count, the three-point scale measurement caught it super-linear
    (q190 exponent 1.41 on the sf1->sf3.2 leg, ~15 s of interpreted ORs
    at m~10^8 bits). Vectorized buffers make the fold cost the data
    movement alone.

    m_bits must be a whole number of 256-bit blocks (optimal_params
    guarantees this); k is accepted for signature parity with classic
    Bloom APIs but the split-block layout fixes it at 8 lanes — a
    mismatched k would silently change nothing, so it is validated."""
    _check_params(m_bits, k)
    n_blocks = m_bits // _BLOCK_BITS
    words = n_blocks * _LANES
    hashed = df.filter(F.col(col).isNotNull()).select(
        _hash_cols(F.col(col), n_blocks).alias("pos")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(words, dtype=np.uint32)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            pos = np.stack(pdf["pos"].to_numpy())  # (n, 2): block, h32
            widx, bitpos = _lane_words_and_bits(pos)
            np.bitwise_or.at(
                bm, widx.ravel(), np.uint32(1) << bitpos.ravel()
            )
        if seen:
            yield pd.DataFrame({"w": [bm.tobytes()]})

    part = hashed.mapInPandas(partials, "w binary")

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            for w in pdf["w"]:
                a = np.frombuffer(w, dtype=np.uint32)
                acc = a.copy() if acc is None else np.bitwise_or(acc, a, out=acc)
        if acc is not None:
            yield pd.DataFrame({"w": [acc.tobytes()]})

    rows = part.coalesce(8).mapInPandas(or_fold, "w binary").collect()
    # <=8 rows of m-bit model state — the pass's single (bounded) action
    acc = np.zeros(words, dtype=np.uint32)
    for r in rows:
        np.bitwise_or(acc, np.frombuffer(r["w"], dtype=np.uint32), out=acc)
    return acc


# bitmap id -> live Broadcast; entries evict (and unpersist executor-side
# blocks) via weakref finalizer when the owning ndarray is collected
_BITMAP_BROADCASTS: dict[int, object] = {}


def _bitmap_broadcast(sc, bitmap: np.ndarray):
    """Broadcast `bitmap` once per array object and cache the variable.
    The cache key is the array's identity; a weakref finalizer on the
    array unpersists the broadcast and evicts the entry, so a long-lived
    session probing many filters holds executor memory only for bitmaps
    the driver still references."""
    import weakref

    key = id(bitmap)
    bc = _BITMAP_BROADCASTS.get(key)
    if bc is None:
        bc = sc.broadcast(np.ascontiguousarray(bitmap))
        _BITMAP_BROADCASTS[key] = bc

        def _evict(k: int = key) -> None:
            var = _BITMAP_BROADCASTS.pop(k, None)
            if var is not None:
                try:
                    var.unpersist()
                except Exception:
                    pass  # context already stopped; blocks died with it

        weakref.finalize(bitmap, _evict)
    return bc


def probe_bloom(
    df: DataFrame, col: str, bitmap: np.ndarray, m_bits: int, k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Adds a boolean `out_col`: True iff all k bits for df[col] are set.
    Guaranteed True for every key the filter was built from (no false
    negatives); False positives occur at the configured rate and MUST be
    killed by an exact join downstream when exactness matters.

    The bitmap ships as a TorrentBroadcast variable, not a task closure:
    a closure is serialized into EVERY task (at the MAX_M_BITS ceiling
    that is 1 GiB per task through the scheduler, over
    spark.rpc.message.maxSize), while a broadcast is fetched once per
    executor in 4 MB chunks and shared by all its tasks. ONE broadcast per
    bitmap object, not per probe call: repeated probes against the same
    filter reuse the cached variable (re-broadcasting a 1 GiB bitmap per
    call would accumulate block-manager memory for the session's
    lifetime), and the broadcast's lifetime is tied to the bitmap's — a
    weakref finalizer unpersists it when the caller drops the array."""
    _check_params(m_bits, k)
    bc = _bitmap_broadcast(df.sparkSession.sparkContext, bitmap)

    n_blocks = m_bits // _BLOCK_BITS

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words = bc.value
        for pdf in batches:
            if not len(pdf):
                # same shape as the non-empty path: __pos dropped here too,
                # not left for Arrow's name-based pruning to discard
                yield pdf.drop(columns=["__pos"]).assign(
                    **{out_col: pd.Series([], dtype=bool)}
                )
                continue
            pos = np.stack(pdf["__pos"].to_numpy())  # (n, 2): block, h32
            widx, bitpos = _lane_words_and_bits(pos)
            bits = (words[widx] >> bitpos) & np.uint32(1)
            out = pdf.drop(columns=["__pos"]).assign(
                **{out_col: bits.all(axis=1)}
            )
            yield out

    with_pos = df.withColumn("__pos", _hash_cols(F.col(col), n_blocks))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} boolean"
    return with_pos.mapInPandas(probe, schema)
