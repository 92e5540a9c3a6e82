"""Mergeable frequency sketches for candidate-then-verify heavy hitters.

The 100 TB pattern: an exact global term count is one corpus-wide shuffle
over EVERY token; a heavy-hitter report only needs the few terms whose
count clears a support threshold. Misra-Gries gives the map-side shortcut:
each partition keeps at most `capacity` counters (an Arrow-batched pass,
Counter arithmetic at C speed), and the classic guarantee transfers
through the union — any term with global count > N/capacity survives in at
least one partition's summary (pigeonhole over per-partition thresholds).
The tiny union of summaries (<= partitions x capacity rows) then drives an
EXACT re-count restricted to candidates: a semi-join filter that rides the
scan, so the one real shuffle only carries candidate terms. Output is
exact counts, so the result is deterministic and oracle-checkable even
though the intermediate sketch is partitioning-dependent.

Reference has no sketch surface (SURVEY §2.4 A5 absent); this is §7
Phase-3 extension surface alongside q36/q134/q136/q145's
exact-beside-estimate audits.
"""

from __future__ import annotations

import heapq
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SUMMARY_SCHEMA = "term string, lb bigint"


def _mg_compress(acc: Counter, capacity: int) -> None:
    """Classic MG decrement step, applied in bulk (Agarwal et al., the
    mergeable-summaries form): subtract the (capacity+1)-th largest count
    from every counter and drop the non-positive ones, leaving at most
    `capacity` survivors. Error added per compress <= the subtracted
    value, preserving count >= true - n_p/capacity per partition."""
    if len(acc) <= capacity:
        return
    kth = heapq.nlargest(capacity + 1, acc.values())[-1]
    for term in [t for t, c in acc.items() if c <= kth]:
        del acc[term]
    for term in acc:
        acc[term] -= kth


def misra_gries_terms(terms: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of a single string column
    `term`: returns (term, lb) rows, at most `capacity` per partition,
    where lb is the surviving counter (a lower bound on the partition
    count). Arrow-batched: each batch is counted with Counter (C-speed
    hash aggregation), merged into the running summary, and compressed
    only when it overflows — never a per-row Python loop."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: Counter = Counter()
        for pdf in batches:
            acc.update(Counter(pdf["term"].tolist()))
            _mg_compress(acc, capacity)
        if acc:
            items = sorted(acc.items())
            yield pd.DataFrame(
                {"term": [t for t, _ in items], "lb": [c for _, c in items]}
            )

    return terms.select("term").mapInPandas(gen, _SUMMARY_SCHEMA)


# --- Count-Min sketch -------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_position(row, token) -> "Column":
    """Counter position of `token` in CMS row `row` (both Columns): the
    first 8 hex chars of md5(row || '|' || token) mod width. md5-derived
    (not xxhash64) so the DuckDB oracle replays the identical placement —
    the same portability rule the MinHash signatures follow."""
    from pyspark.sql import functions as F

    digest = F.md5(F.concat(row.cast("string"), F.lit("|"), token))
    return F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint"), F.lit(CMS_WIDTH)
    )


def cms_build(counts: DataFrame, key_col: str, cnt_col: str) -> DataFrame:
    """Count-Min sketch as a RELATION (cms_row, pos, total) from a
    pre-aggregated (key, count) table: each key adds its count at one
    position per row. The classic array form is this relation pivoted;
    keeping it relational makes the sketch a first-class mergeable table —
    union two sketches and re-aggregate to merge, exactly the
    slice-and-merge contract the HLL audit (q192) pins.

    Scale note: expanding AFTER the per-key aggregation means the x-depth
    blow-up applies to VOCABULARY rows (Heaps-sublinear), not the token
    stream."""
    from pyspark.sql import functions as F

    rows = F.explode(
        F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
    ).alias("cms_row")
    return (
        counts.select(F.col(key_col).alias("k"), F.col(cnt_col).alias("c"), rows)
        .select("cms_row", cms_position(F.col("cms_row"), F.col("k")).alias("pos"), "c")
        .groupBy("cms_row", "pos")
        .agg(F.sum("c").alias("total"))
    )


def cms_estimate(cms: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates: est(key) = min over rows of the counter
    at that key's position — joined per (row, pos), never collected. The
    relation form stores only NONZERO counters, so a probe position absent
    from the sketch relation means counter value 0: the join is a LEFT
    join with coalesce(total, 0), which keeps the point-estimate contract
    exact — a key hitting an empty counter contributes 0 to the min
    (estimate 0, correctly, since CMS never underestimates), and a key the
    stream never saw still gets a row with estimate ~0 instead of
    vanishing. The estimate NEVER underestimates (every counter the key
    touches contains its full count plus collisions); the q36 discipline
    applies: report beside exact values with a bound flag, and let an
    exact pass decide when exactness matters."""
    from pyspark.sql import functions as F

    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("cms_row")
    placed = probes.select(F.col(key_col), rows).select(
        key_col, "cms_row", cms_position(F.col("cms_row"), F.col(key_col)).alias("pos")
    )
    return (
        placed.join(cms, ["cms_row", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("total"), F.lit(0))).alias("cms_estimate"))
    )
