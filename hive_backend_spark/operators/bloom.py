"""Distributed Bloom-filter build and probe for semi-join prefiltering.

The 100 TB problem this solves: decontamination/dedup joins (q106/q139)
broadcast a DISTINCT key set whose size is the eval benchmark's gram count
times ~32 bytes per digest. A Bloom filter compresses that to m bits
REGARDLESS of key width — 1% FPR at ~9.6 bits/key — so the thing shipped
to every executor shrinks ~25x, and the (rare) false positives are killed
by an exact join that now touches only the prefiltered survivors. The
candidate-then-verify discipline (q163's sketch shape): the sketch routes,
the exact pass decides, so results are bit-identical to the plain join.

Build is one Arrow pass: keys are hashed JVM-side (xxhash64 with k seeds —
vectorized, engine-deterministic), partitions OR their local bitmaps, and
the per-partition bitmaps (m/64-long arrays, partition-bounded rows) fold
elementwise to the final bitmap — the kmeans/second_moments reduce shape.
The bitmap is bounded model state (m bits by construction, ceiling-checked
against MAX_M_BITS), so holding it driver-side is the centroid/codebook
pattern, not a corpus-sized collect; the probe pass receives it as a
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


def optimal_params(n_keys: int, fpr: float) -> tuple[int, int]:
    """Textbook sizing: m = -n ln(p) / ln(2)^2 bits, k = (m/n) ln 2 hashes
    (rounded, clamped to >= 1; m rounded up to a multiple of 64). Raises
    once the bitmap would exceed the documented driver/executor ceiling
    (MAX_M_BITS) — the caller should shard the key space instead."""
    n_keys = max(n_keys, 1)
    m = int(math.ceil(-n_keys * math.log(fpr) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    if m > MAX_M_BITS:
        raise ValueError(
            f"bloom filter of {m} bits exceeds MAX_M_BITS={MAX_M_BITS} "
            f"(~{MAX_M_BITS >> 33} GiB); shard the key space into "
            f"{math.ceil(m / MAX_M_BITS)} filters instead"
        )
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _hash_positions(col: Column, m_bits: int, k: int) -> Column:
    """k bit positions per value: xxhash64(value, seed=i) mod m — computed
    JVM-side (vectorized, no Python in the hash path) and identical for
    build and probe by construction. pmod keeps positions nonnegative."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def build_bloom(df: DataFrame, col: str, m_bits: int, k: int) -> np.ndarray:
    """One pass over df[col]: returns the filter as a uint64 bitmap array
    of length m_bits/64. Nulls are skipped (a null key joins nothing).

    The per-partition bitmaps fold by NUMPY OR over raw binary buffers in
    two stages (coalesced Arrow pass, then a <=8-row driver fold of m-bit
    model state — annotated bounded collect). The previous fold — an
    interpreted F.aggregate/zip_with over collect_list — evaluated
    O(partitions x m/64) lambdas in ONE task; since m grows with the key
    count, the three-point scale measurement caught it super-linear
    (q190 exponent 1.41 on the sf1->sf3.2 leg, ~15 s of interpreted ORs
    at m~10^8 bits). Vectorized buffers make the fold cost the data
    movement alone."""
    words = m_bits // 64
    hashed = df.filter(F.col(col).isNotNull()).select(
        _hash_positions(F.col(col), m_bits, k).alias("pos")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            pos = np.concatenate(pdf["pos"].to_numpy()).astype(np.int64)
            np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        if seen:
            yield pd.DataFrame({"w": [bm.tobytes()]})

    part = hashed.mapInPandas(partials, "w binary")

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            for w in pdf["w"]:
                a = np.frombuffer(w, dtype=np.uint64)
                acc = a.copy() if acc is None else np.bitwise_or(acc, a, out=acc)
        if acc is not None:
            yield pd.DataFrame({"w": [acc.tobytes()]})

    rows = part.coalesce(8).mapInPandas(or_fold, "w binary").collect()
    # <=8 rows of m-bit model state — the pass's single (bounded) action
    acc = np.zeros(words, dtype=np.uint64)
    for r in rows:
        np.bitwise_or(acc, np.frombuffer(r["w"], dtype=np.uint64), out=acc)
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
    bc = _bitmap_broadcast(df.sparkSession.sparkContext, bitmap)

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
            pos = np.stack(pdf["__pos"].to_numpy()).astype(np.int64)  # (n, k)
            bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
            out = pdf.drop(columns=["__pos"]).assign(
                **{out_col: bits.all(axis=1)}
            )
            yield out

    with_pos = df.withColumn("__pos", _hash_positions(F.col(col), m_bits, k))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} boolean"
    return with_pos.mapInPandas(probe, schema)
