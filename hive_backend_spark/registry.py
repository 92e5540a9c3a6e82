"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (and the §7 Phase-3 extensions)
registers here as a named query:

    @register("q_name", oracle="SELECT ... FROM events ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

``__spark_entry__.queries()`` / ``oracle_sql()`` read this registry. Oracle
SQL must be DuckDB-runnable over the same parquet tables (pre-registered
views region nation customer supplier part orders lineitem events documents
embeddings) and produce identical column NAMES (driver compares sorted-by-
column-name value hashes). Queries whose semantics are not SQL-expressible
register with ``oracle=None`` and get a rows-only check.

Determinism rules (SURVEY §7 hard part 4) every registered query follows:
  - no wall clock: time horizons use the fixed literal ``NOW`` below;
  - no random/sequence ids: keys derive from input columns;
  - every LIMIT/top-k carries a total tie-break order (unique key last);
  - float aggregates are rounded in BOTH engines to absorb summation-order
    differences between Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# Fixed "now" for relative-time predicates (events span 2024-01). The
# reference uses datetime('now', '-N minutes') (db.mjs:369,392,397); we thread
# a fixed literal instead so the DuckDB oracle hash-matches (SURVEY §7.4).
NOW = "2024-01-31 00:00:00"

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules lazily so registration happens exactly once.
    from . import queries  # noqa: F401

    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
