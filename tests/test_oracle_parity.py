"""The core correctness gate, mirrored locally: every registered query with
an oracle must match DuckDB exactly (columns, row count, values) at the test
scale factor. This is the same comparison the driver runs at sf=0.01."""

from __future__ import annotations

import pytest

from hive_backend_spark.registry import all_queries

from .conftest import assert_matches_oracle

SPECS = sorted(all_queries().items())


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is not None])
def test_oracle_parity(name, spark, sf_dir, oracle):
    spec = all_queries()[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, oracle, spec.oracle, name=name)


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is None])
def test_rows_only_queries_run(name, spark, sf_dir):
    spec = all_queries()[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


# DuckDB widens integer sum() to HUGEINT (and exposes unsigned types Spark
# lacks). The local fetchall() comparator coerces these to Python ints — so
# values match locally — but the driver's hash renders a HUGEINT column
# differently from Spark's BIGINT (pandas: float64 vs int64), failing the
# query even when every value is equal (round-2 q103 postmortem). Forbid the
# types outright so the drift can't reappear.
_ENGINE_TYPED = {"HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is not None])
def test_oracle_output_types_are_spark_representable(name, oracle):
    spec = all_queries()[name]
    rel = oracle.sql(spec.oracle)
    offenders = {
        c: str(t) for c, t in zip(rel.columns, rel.types) if str(t) in _ENGINE_TYPED
    }
    assert not offenders, (
        f"{name}: oracle output columns {offenders} use DuckDB-only integer "
        "types; CAST(... AS BIGINT) in the oracle SQL"
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10


def test_sql_surface_matches_dataframe_api(spark, sf_dir):
    """The engine is usable as a pure SQL surface: for queries whose oracle
    text is engine-portable ANSI, spark.sql(<same text>) over the registered
    views returns exactly what the DataFrame implementation returns."""
    from hive_backend_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    portable = [
        "q40_pricing_summary",
        "q41_shipping_priority",
        "q44_order_priority_check",
        "q48_returned_item_revenue",
        "q49_large_volume_customers",
    ]
    for name in portable:
        spec = all_queries()[name]
        df_api = spec.fn(spark, sf_dir)
        sql_api = spark.sql(spec.oracle)
        assert sorted(df_api.columns) == sorted(sql_api.columns), name
        a = sorted(map(repr, df_api.collect()))
        b = sorted(map(repr, sql_api.select(*df_api.columns).collect()))
        assert a == b, name
