"""Multi-dimensional data layout (SURVEY §7 100 TB posture): Z-order
clustering for write-time file organization.

A table sorted on one column prunes scans only for predicates on that
column; a Z-order (Morton) sort interleaves the bits of several columns so
files stay selective for box predicates on ANY of them — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, built here from pure column
expressions (shift/mask/or are all codegen'd; no UDF).

The key quantizes each column to `bits` levels between its min and max
(stats supplied by the caller or computed in one tiny aggregate), then
interleaves bit i of every column into position i*n_cols+j. Files written
in key order carry tight parquet min/max footers on every dimension; the
engine's ordinary stats pruning does the rest — no reader-side change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Map col from [lo, hi] onto integer levels spanning [0, 2^bits - 1].

    Both directions matter for the interleave to work: wide ranges are
    COMPRESSED (integer-divide by ceil(span/2^bits)) and narrow ranges are
    STRETCHED (multiply by floor(2^bits/span)) so every dimension's most
    significant level bits participate — without the stretch, a low-
    cardinality column (15 users vs 8 quantization bits) leaves its high
    bits permanently zero and the Morton order degenerates into a plain
    sort on the wider column. All arithmetic is exact integer (the stretch
    factor is at most 2^bits, the compressed offset at most the span), so
    it is monotone and overflow-free at nanosecond spans for bits <= 16."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span1 = (hi_c - lo_c + F.lit(1)).cast("long")
    n_levels = F.lit(1 << bits).cast("long")
    off = col.cast("long") - lo_c
    # wide span: bucket = ceil(span/2^bits) via (a - a % b) / b exactness
    raw_bucket = (span1 + n_levels - 1).cast("long")
    bucket = F.greatest(
        ((raw_bucket - raw_bucket % n_levels) / n_levels).cast("long"), F.lit(1)
    )
    compressed = F.least(
        F.floor(off / bucket).cast("long"), n_levels - 1
    )
    # narrow span: stretch by an exact integer factor
    stretch = F.greatest(
        ((n_levels - n_levels % span1) / span1).cast("long"), F.lit(1)
    )
    stretched = off * stretch
    return F.when(span1 >= n_levels, compressed).otherwise(stretched)


def zorder_key(quantized: list[Column], bits: int = 16) -> Column:
    """Interleave the low `bits` bits of each already-quantized column into
    one Morton key: bit i of column j lands at position i*len(cols)+j.
    Pure shift/mask/add expressions — whole-stage codegen, no UDF."""
    n = len(quantized)
    terms = []
    for j, c in enumerate(quantized):
        for i in range(bits):
            terms.append(((F.shiftright(c, i) % 2) * F.lit(1 << (i * n + j))).cast("long"))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    records_per_file: int = 10_000,
) -> None:
    """Sort by the Z-order key of `cols` (min/max computed in one aggregate)
    and write parquet in bounded-size files, so every file's footer carries
    a tight min/max box over all `cols`.

    Scale posture: the stats aggregate is one tiny job; the sort is a range
    exchange (Spark samples split points) — the same cost as any write-time
    ordering; pruning afterwards is free forever. records_per_file bounds
    file size the way a table format's target-file-size does."""
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__hi_{c}") for c in cols],
    )
    with_key = df.crossJoin(F.broadcast(stats)).withColumn(
        "__zkey",
        zorder_key(
            [
                quantize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
                for c in cols
            ],
            bits,
        ),
    )
    (
        with_key.orderBy("__zkey")
        .drop("__zkey", *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
        .write.option("maxRecordsPerFile", records_per_file)
        .mode("overwrite")
        .parquet(path)
    )
