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
