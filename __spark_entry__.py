"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``hive_backend_spark``; this module just adapts the
registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_backend_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the prioritized bounded
    dequeue (SURVEY §2.5 O1 / §2.9 Q3 — reference db.mjs:285-293), the most
    frequently executed query in the reference system."""
    from hive_backend_spark.queries.relational import q01_priority_dequeue

    return q01_priority_dequeue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return {name: spec.fn for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; queries with
    non-SQL-expressible semantics are omitted (driver does rows-only)."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }
