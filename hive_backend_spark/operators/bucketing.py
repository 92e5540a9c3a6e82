"""Bucketed (co-located) joins — SURVEY §4 / 100 TB posture.

A big-big equi-join (orders x lineitem at full scale) shuffles both sides on
every query. Bucketing pre-shuffles ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and saved
as managed tables; Catalyst then plans the join with zero Exchange — each
task reads matching bucket files from both sides.

This is the write-amortized analog of the reference's B-tree indexes
(db.mjs:92-98): pay at ingest, win on every read. Use for the dimension-fact
keys queried constantly (o_orderkey, l_orderkey); leave ad-hoc keys to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int = 16
) -> None:
    """Save as a managed bucketed table (sorted within buckets on the key so
    merge-style reads stay sequential)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst elides both Exchanges (verify with
    plans.assert_plan(df, forbids=['Exchange']))."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
