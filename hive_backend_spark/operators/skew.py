"""Skew mitigation (SURVEY §7 100 TB posture): AQE's skew-join handling
covers joins automatically (session.py enables it); these helpers cover the
cases AQE does not — skewed AGGREGATION keys and skewed join keys when AQE
is unavailable (e.g. inside a foreachBatch sink where plans are per-batch).

The pattern is two-phase salting: explode the hot key across N salt
buckets, partially aggregate per (key, salt), then combine per key. The
first shuffle spreads the hot key over N reducers; the second shuffle
carries one row per (key, salt) — negligible."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    aggs maps output column -> (input column, op) with op in
    {'sum','count','min','max'} — the ops with a trivial combine phase
    (avg = sum/count composed by the caller).

    salted_agg(events, ['event_type'], {'n': ('event_id','count'),
                                        'v': ('value','sum')})
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in key_cols], F.monotonically_increasing_id())) % n_salts).alias(
        "__salt"
    )
    partial_exprs = []
    combine_exprs = []
    for out, (col, op) in aggs.items():
        if op == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{out}"))
            combine_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            combine_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            combine_exprs.append(F.min(f"__p_{out}").alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            combine_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported op {op!r}")
    return (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*partial_exprs)
        .groupBy(*key_cols)
        .agg(*combine_exprs)
    )


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Skewed-key equi-join without AQE: salt the big side's key, replicate
    the small side across all salts, join on (key, salt). Row multiplication
    happens only on the (small) broadcast side."""
    salted_big = big.withColumn(
        "__salt", (F.abs(F.hash(F.col(key), F.monotonically_increasing_id())) % n_salts)
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated = small.select("*", salts)
    return (
        salted_big.join(F.broadcast(replicated), [key, "__salt"]).drop("__salt")
    )
